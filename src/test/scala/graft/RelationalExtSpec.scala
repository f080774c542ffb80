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

  test("scd2: one current version per key; history closes at the effective date") {
    val rows = RelationalExt.qScd2.fn(spark, sf).collect()
    val nOrders = Tables.orders(spark, sf).count()
    val nUpdated = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 97 === 0).count()
    // every target row survives, plus one new version per update
    assert(rows.length == nOrders + nUpdated)
    val byKey = rows.groupBy(_.getLong(0))
    byKey.foreach { case (k, vs) =>
      assert(vs.count(_.getBoolean(4)) == 1, s"key $k: not exactly one current")
      vs.filter(!_.getBoolean(4)).foreach { r =>
        assert(r.getString(3) == "1998-06-01", s"key $k: closed row bad valid_to")
      }
      // intervals chain: a closed row's valid_to is the opened row's valid_from
      if (vs.length == 2) {
        val closed = vs.find(!_.getBoolean(4)).get
        val opened = vs.find(_.getBoolean(4)).get
        assert(closed.getString(3) == opened.getString(2))
      }
    }
  }

  test("bloom join equals plain join; filter kills most fact rows pre-join") {
    val dim = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val plain = Tables.lineitem(spark, sf)
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("total"))
      .orderBy(col("o_orderpriority")).collect()
    val bloomed = RelationalExt.qBloomJoin.fn(spark, sf).collect()
    assert(bloomed.map(_.toString).toSeq == plain.map(_.toString).toSeq)

    // the sketch itself must be selective: most of lineitem dies at the scan
    val sketch = RelationalExt.bloomOf(dim, col("o_orderkey"), 100000L)
    val li = Tables.lineitem(spark, sf)
    val kept = li.filter(org.apache.spark.sql.graft.BloomBridge
      .mightContain(sketch, col("l_orderkey"))).count()
    assert(kept < li.count() / 5, s"bloom kept $kept of ${li.count()}")
  }

  test("snapshot diff recovers exactly the planted change feed") {
    val rows = RelationalExt.qSnapshotDiff.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = Tables.orders(spark, sf)
    val nDel = o.filter(col("o_orderkey") % 89 === 0).count()
    val nIns = o.filter(col("o_orderkey") % 101 === 0).count()
    val nUpd = o.filter(col("o_orderkey") % 97 === 0 && col("o_orderkey") % 89 =!= 0).count()
    val nAll = o.count()
    assert(rows("delete") == nDel)
    assert(rows("insert") == nIns)
    assert(rows("update") == nUpd)
    assert(rows("unchanged") == nAll - nDel - nUpd)
  }
}
