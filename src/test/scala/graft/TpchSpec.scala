package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan locks + semantic pins for the TPC-H completion suite
  * (operators/Tpch.scala). Row-level correctness is the DuckDB
  * oracle's job; these tests lock the SCALE properties of each plan
  * shape so refactors can't silently regress them.
  */
class TpchSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  test("q6_forecast pushes every range predicate into the scan and prunes columns") {
    val p = formatted("q6_forecast")
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"))
    assert(p.contains("GreaterThanOrEqual(l_discount") && p.contains("LessThanOrEqual(l_discount"))
    assert(p.contains("LessThan(l_quantity"))
    // only the 4 referenced columns are read
    assert(!p.contains("l_orderkey") && !p.contains("l_tax") && !p.contains("l_returnflag"))
  }

  test("q19_disjunctive pushes the conjunctive hulls into both scans; part side broadcasts") {
    val p = formatted("q19_disjunctive")
    assert(p.contains("In(p_brand"), "brand IN hull must reach the part scan")
    assert(p.contains("GreaterThanOrEqual(l_quantity") && p.contains("LessThanOrEqual(l_quantity"),
      "quantity hull must reach the lineitem scan")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q4_priority plans the EXISTS as one left-semi join, no extra corpus shuffle") {
    val p = plan("q4_priority")
    assert(p.contains("LeftSemi"), s"expected left-semi in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q21_waiting collapses the triple self-join into one orderkey exchange") {
    val p = plan("q21_waiting")
    // lineitem appears once: exactly one hashpartitioning exchange may
    // carry corpus-sized data (the l_orderkey window shuffle); the
    // post-filter supplier join broadcasts and the final group-by is
    // |suppliers|-sized.
    val corpusExchanges = "Exchange hashpartitioning\\(l_orderkey".r.findAllIn(p).length
    assert(corpusExchanges == 1, s"expected exactly 1 orderkey exchange, plan:\n$p")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q10_returns aggregates before enriching: join inputs are group-sized") {
    val p = plan("q10_returns")
    // the customer join must sit ABOVE the revenue aggregate: in the
    // physical plan string, the aggregate on o_custkey appears deeper
    // (later) than the first join with customer columns.
    val aggIdx = p.indexOf("Exchange hashpartitioning(o_custkey")
    val custJoinIdx = p.indexOf("c_custkey")
    assert(aggIdx >= 0, s"no per-custkey aggregate exchange in:\n$p")
    assert(custJoinIdx >= 0 && custJoinIdx < aggIdx,
      "customer enrichment must consume the aggregated relation")
    assert(p.contains("TakeOrderedAndProject"), "top-20 must not global-sort")
  }

  test("q15_topsupp computes the max over the aggregate, never a second corpus pass") {
    val p = plan("q15_topsupp")
    // lineitem is scanned exactly once
    val scans = "Scan parquet".r.findAllIn(p).length
    val liScans = "lineitem".r.findAllIn(p).length
    assert(scans >= 2, s"expected supplier + lineitem scans in:\n$p")
    assert(liScans <= 2, s"lineitem must be scanned once (1 scan + ReadSchema mention), got $liScans in:\n$p")
  }

  test("q22_inactive anti-join + single-row threshold broadcast") {
    val p = plan("q22_inactive")
    assert(p.contains("LeftAnti"), s"expected left-anti in:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "the single-row avg threshold must broadcast")
  }

  test("q13_custdist preserves zero-order customers through the outer join") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q13_custdist")(spark, sf)
    val zero = out.filter(col("c_count") === 0).collect()
    // customers whose every order is 5-LOW (or none) must appear as c_count=0
    val direct = graft.sources.Tables.customer(spark, sf).select("c_custkey")
      .join(graft.sources.Tables.orders(spark, sf)
          .filter(col("o_orderpriority") =!= "5-LOW").select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti").count()
    if (direct > 0) {
      assert(zero.length == 1 && zero.head.getLong(1) == direct)
    } else assert(zero.isEmpty)
  }

  test("q12_shiplag buckets partition every joined row exactly once") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q12_shiplag")(spark, sf)
      .agg(sum(col("high_line_count") + col("low_line_count"))).collect()(0).getLong(0)
    val direct = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(graft.sources.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(out == direct)
  }
}
