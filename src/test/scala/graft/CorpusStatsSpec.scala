package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Graph, Profile, RelationalMore, TextAnalysis}
import graft.sources.Tables

/** Invariant pins for the round-5 corpus-statistics operators (their
  * exact values are covered by the DuckDB oracle gate; these pin the
  * structural properties that must hold at ANY scale factor).
  */
class CorpusStatsSpec extends AnyFunSuite {
  import TestSpark._

  test("graph_cc components partition the thresholded co-purchase node set") {
    val comps = Graph.graphCc.fn(spark, sf).collect()
    assert(comps.nonEmpty)
    // a component exists only because of at least one edge, so every
    // component has >= 2 nodes and its label is a real part key
    assert(comps.forall(_.getLong(1) >= 2))
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nNodes = items.select(col("l_orderkey").as("ok"), col("l_partkey").as("p1"))
      .join(items.select(col("l_orderkey").as("ok2"), col("l_partkey").as("p2")),
        col("ok") === col("ok2") && col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 3)
      .select(explode(array(col("p1"), col("p2"))).as("p"))
      .distinct().count()
    assert(comps.map(_.getLong(1)).sum === nNodes)
  }

  test("profile_drift TVD is a bounded distance and halves cover each type") {
    val rows = Profile.profileDrift.fn(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val tvd = r.getDouble(3)
      assert(tvd >= 0.0 && tvd <= 1.0, s"tvd out of range: $r")
      assert(r.getLong(1) > 0 && r.getLong(2) > 0, s"empty half: $r")
    }
    val perType = Tables.events(spark, sf).groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === perType(r.getString(0)))
    }
  }

  test("q_histogram_equiwidth bins cover every row exactly once") {
    val rows = RelationalMore.qHistogramEquiwidth.fn(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq === rows.map(_.getInt(0)).toSeq.sorted)
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 7))
    assert(rows.map(_.getLong(1)).sum === Tables.lineitem(spark, sf).count())
  }

  test("text_collocations lift scores are supported and positive") {
    val rows = TextAnalysis.textCollocations.fn(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getLong(2) >= 5, s"support floor violated: $r")
      assert(r.getDouble(3) > 0.0, s"non-positive lift: $r")
    }
    // descending by lift with (w1, w2) tiebreak
    val lifts = rows.map(_.getDouble(3)).toSeq
    assert(lifts === lifts.sorted.reverse)
  }
}
