package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps
import graft.sources.Tables

/** Invariant pins for the round-5 session-13 operators. */
class Round5mOpsSpec extends AnyFunSuite {
  import TestSpark._

  // ---- events_shapley -------------------------------------------------

  test("events_shapley: efficiency, nonnegativity, dummy, determinism") {
    val out = EventOps.eventsShapley.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(out.keySet == Set("click", "error", "signup", "view", "direct"))
    // nonnegativity: v is monotone (subset-sum characteristic fn), so
    // every marginal contribution — hence every credit — is >= 0
    out.values.foreach(c => assert(c >= 0.0))
    // efficiency axiom: channel credits sum to v(full set) = total
    // purchase value with >= 1 prior touch; direct gets the rest.
    // Recompute both totals independently from the raw events table.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val touched = Tables.events(spark, sf)
      .withColumn("n_prior",
        coalesce(count(when(col("event_type") =!= "purchase", 1)).over(w), lit(0L)))
      .filter(col("event_type") === "purchase")
      .agg(
        sum(when(col("n_prior") > 0, col("value")).otherwise(0.0)).as("touched"),
        sum(when(col("n_prior") === 0, col("value")).otherwise(0.0)).as("direct"))
      .collect()(0)
    val channelSum = out.filterKeys(_ != "direct").values.sum
    assert(math.abs(channelSum - touched.getDouble(0)) < 0.05,
      s"efficiency: $channelSum vs ${touched.getDouble(0)}")
    assert(math.abs(out("direct") - touched.getDouble(1)) < 0.05)
    // determinism
    val again = EventOps.eventsShapley.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(out == again)
  }
}
