package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventOps, Linkage}
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

  // ---- mining_gbt -----------------------------------------------------

  test("mining_gbt: SSE recurrence, monotone RMSE, noise feature unused") {
    val out = Linkage.miningGbt.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.length == 5)
    assert(out.map(_._1).toSeq == (1 to 5))
    // qty is independent of revenue by construction — the split
    // search must never pick the noise feature
    out.foreach { case (_, f, _, _, _) => assert(f != "qty", s"noise split: $f") }
    // training RMSE strictly decreases (every round had gain > 0)
    out.map(_._5).sliding(2).foreach { case Array(a, b) =>
      assert(b < a, s"RMSE not decreasing: ${out.map(_._5).toSeq}")
    }
    // the exact squared-loss recurrence SSE_{t+1} = SSE_t - (2γ-γ²)·gain_t
    // with γ = 0.5 (residuals stay centered, leaves are exact means)
    val n = Tables.lineitem(spark, sf).count().toDouble
    out.sliding(2).foreach { case Array((_, _, _, g, r1), (_, _, _, _, r2)) =>
      val lhs = r2 * r2 * n
      val rhs = r1 * r1 * n - 0.75 * g
      assert(math.abs(lhs - rhs) / rhs < 1e-4,
        s"recurrence: $lhs vs $rhs (gain $g)")
    }
    // determinism
    val again = Linkage.miningGbt.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.sameElements(again))
  }
}
