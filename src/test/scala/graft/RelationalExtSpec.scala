package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Relational, RelationalExt}
import graft.sources.Tables

class RelationalExtSpec extends AnyFunSuite {
  import TestSpark._

  test("approx distinct within 5% of exact") {
    val approx = RelationalExt.qApproxDistinct.fn(spark, sf).collect()(0)
    val exact = Relational.qDistinct.fn(spark, sf).collect()(0)
    (0 until 3).foreach { i =>
      val rel = math.abs(approx.getLong(i).toDouble - exact.getLong(i)) /
        exact.getLong(i).toDouble
      assert(rel < 0.05, s"col $i: approx=${approx.getLong(i)} exact=${exact.getLong(i)}")
    }
  }

  test("approx percentiles are ordered and within the value range") {
    val r = RelationalExt.qApproxPercentile.fn(spark, sf).collect()(0)
    val (p50, p95, p99) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(p50 <= p95 && p95 <= p99)
    val mm = Tables.orders(spark, sf)
      .agg(min("o_totalprice"), max("o_totalprice")).collect()(0)
    assert(p50 >= mm.getDouble(0) && p99 <= mm.getDouble(1))
  }

  test("asof join: every purchase with a prior click gets the max prior click id") {
    val rows = RelationalExt.qAsofJoin.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    // click_id (when present) must reference a click event of the same user
    val clicks = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select("event_id", "user_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.filter(!_.isNullAt(2)).foreach { r =>
      assert(clicks(r.getLong(2)) == r.getLong(1))
    }
  }

  test("salted join equals plain join") {
    val salted = RelationalExt.qSkewSaltedJoin.fn(spark, sf).collect()
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus")).collect()
    assert(salted.map(_.toString).toSeq == plain.map(_.toString).toSeq)
  }

  test("bucketed join plan has no shuffle exchange") {
    val df = RelationalExt.qBucketedJoin.fn(spark, sf)
    val joinPlan = df.queryExecution.executedPlan.toString
    // the join itself must consume bucket-aligned scans: no
    // ShuffleExchange between the scans and the SortMergeJoin
    val beforeAgg = joinPlan.split("HashAggregate").last
    assert(beforeAgg.contains("SortMergeJoin"))
    assert(!beforeAgg.contains("Exchange hashpartitioning"),
      s"unexpected shuffle under the join:\n$joinPlan")
  }

  test("pivot columns match explicit value list") {
    val df = RelationalExt.qPivot.fn(spark, sf)
    assert(df.columns.toSeq == Seq("l_returnflag", "F", "O", "P"))
  }
}
