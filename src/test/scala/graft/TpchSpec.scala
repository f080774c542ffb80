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

  // ---- partsupp-derived completions (Q2/Q9/Q11/Q16/Q20) --------------

  test("q2_mincost: dims broadcast, zero corpus exchanges (supply staged), rows are per-part minima") {
    val p = plan("q2_mincost")
    // r8: the derived supply relation is STAGED (Warehouse artifact),
    // so the (l_partkey, l_suppkey) corpus shuffle is paid once at
    // ingest — the query plan itself must carry NO corpus exchange
    val corpusExchanges =
      "Exchange hashpartitioning\\(l_partkey#\\d+L?, l_suppkey".r.findAllIn(p).length
    assert(corpusExchanges == 0,
      s"supply is staged; expected zero corpus shuffles, got $corpusExchanges in:\n$p")
    assert(p.contains("BroadcastHashJoin"))
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q2_mincost")(spark, sf)
    // at most one winning supplier row per (part, cost) minimum and the
    // cost is genuinely that part's minimum over the eligible pairs
    val perPart = out.groupBy(col("p_partkey"))
      .agg(countDistinct(col("supplycost")).as("c")).filter(col("c") > 1).count()
    assert(perPart == 0, "a part surfaced with two distinct 'minimum' costs")
  }

  test("q9_profit reuses the (part,supp) partitioning between the supply agg and the join") {
    val p = plan("q9_profit")
    // lineitem⋈ps must hash-join on the pair key; dims broadcast
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // r9: supply is a BUCKETED warehouse table on (l_partkey,
    // l_suppkey) — the plan must read that layout, not re-derive the
    // aggregate from lineitem
    assert(p.contains("graft_supply_b_"),
      s"q9 must scan the bucketed supply table:\n$p")
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q9_profit")(spark, sf)
    assert(out.count() > 0)
    // every (nation, year) group key is unique — the agg really grouped
    assert(out.groupBy(col("nation"), col("o_year")).count()
      .filter(col("count") > 1).count() == 0)
  }

  test("q9_profit's supply side is exchange-free when the join shuffles (bucketed layout)") {
    // at the test SF the supply side broadcasts; at scale AQE flips
    // the join to shuffle (r8: 120 MB at sf1). Force that regime by
    // disabling broadcast: the bucketed (l_partkey, l_suppkey) layout
    // must satisfy the join's distribution with NO supply-side
    // exchange — only the lineitem side shuffles into the buckets.
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val p = plan("q9_profit")
      // every exchange keyed by the supply aggregate's output would
      // carry ps_supplycost; the bucketed scan must make that
      // unnecessary
      val supplyExchanges = p.linesIterator
        .filter(_.contains("Exchange"))
        .count(_.contains("ps_supplycost"))
      assert(supplyExchanges == 0,
        s"bucketed supply must not re-shuffle; got $supplyExchanges in:\n$p")
      assert(p.contains("graft_supply_b_"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
  }

  test("q11_important: single-row total broadcasts; value threshold holds on every row") {
    val p = plan("q11_important")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "the scalar total must broadcast")
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q11_important")(spark, sf).collect()
    val total = out.map(_.getDouble(1)).sum
    // each surviving row individually exceeds 0.1% of the full total, so
    // the sum of survivors cannot exceed the total yet each is > 0
    assert(out.forall(_.getDouble(1) > 0))
    assert(out.length <= 1000, s"threshold admits at most 1/0.001 rows, got ${out.length}; total=$total")
  }

  test("q16_supptype: exclusion is a broadcast anti-join and counts never exceed the supplier pool") {
    val p = plan("q16_supptype")
    assert(p.contains("LeftAnti"), s"expected left-anti exclusion in:\n$p")
    assert(p.contains("BroadcastHashJoin"))
    import org.apache.spark.sql.functions._
    val eligible = graft.sources.Tables.supplier(spark, sf)
      .filter(col("s_acctbal") >= 0).count()
    val out = SparkEntry.queries("q16_supptype")(spark, sf)
    assert(out.filter(col("supplier_cnt") > eligible).count() == 0)
  }

  test("q20_promotion: dominance is exclusive — at most one dominant supplier per part") {
    import org.apache.spark.sql.functions._
    // re-derive the dominant pairs and check > 1/2 exclusivity directly
    val li = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    val dominants = li.withColumn("pq", sum(col("qty")).over(w))
      .filter(col("qty") > lit(0.5) * col("pq"))
      .groupBy(col("l_partkey")).count().filter(col("count") > 1).count()
    assert(dominants == 0, "two suppliers can't both exceed half a part's quantity")
    val out = SparkEntry.queries("q20_promotion")(spark, sf)
    val names = out.collect().map(_.getString(0)).toSeq
    assert(names == names.sorted, "output must be ordered by s_name")
  }
}
