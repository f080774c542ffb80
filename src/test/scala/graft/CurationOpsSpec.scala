package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Curation, EventOps}

/** Pins for the round-3 second-half curation/events additions:
  * session path mining, incremental hourly merge, language-budget
  * rebalancing, and the model-based quality classifier.
  */
class CurationOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("session trigrams never cross a session boundary") {
    import spark.implicits._
    def t(min: Int) = new java.sql.Timestamp(min * 60000L)
    // u1: one session a b c d, then a >30-min gap, then e f g;
    // u2: too short for any trigram
    val ev = Seq(
      (1L, 1L, "a", t(0)), (1L, 2L, "b", t(5)), (1L, 3L, "c", t(10)), (1L, 4L, "d", t(15)),
      (1L, 5L, "e", t(60)), (1L, 6L, "f", t(65)), (1L, 7L, "g", t(70)),
      (2L, 8L, "x", t(0)), (2L, 9L, "y", t(5)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val tri = EventOps.sessionTrigrams(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(tri == Set(("a", "b", "c"), ("b", "c", "d"), ("e", "f", "g")))
  }

  test("merged hourly partials equal the direct hourly aggregate") {
    val direct = EventOps.eventsHourly.fn(spark, sf).collect()
    val merged = EventOps.eventsHourlyMerge.fn(spark, sf).collect()
    assert(merged.length == direct.length)
    direct.zip(merged).foreach { case (a, b) =>
      assert(a.get(0) == b.get(0) && a.get(1) == b.get(1) && a.getLong(2) == b.getLong(2))
      assert(math.abs(a.getDouble(3) - b.getDouble(3)) <= 0.01)
    }
  }

  test("language budgets cap every language's kept tokens") {
    val rows = Curation.pipelineLangBudget.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val budget = if (r.getString(0) == "en") 2000L else 1500L
      assert(r.getLong(2) <= budget, s"${r.getString(0)} over budget: ${r.getLong(2)}")
      assert(r.getLong(1) > 0)
    }
  }

  test("stream-static enrichment equals the batch join aggregate") {
    import graft.sources.Tables
    val batch = Tables.events(spark, sf)
      .join(Tables.customer(spark, sf), col("user_id") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .orderBy(col("nationkey")).collect()
    val stream = EventOps.streamEnrich.fn(spark, sf).collect()
    assert(stream.map(_.toString).toSeq == batch.map(_.toString).toSeq)
  }

  test("quality classifier recovers the weak labels on the holdout split") {
    val scored = Curation.qualityModelScores(spark, sf)
    val holdout = scored.filter(col("hx") >= "8")
    val n = holdout.count()
    val agree = holdout.filter(col("label") === col("prediction")).count()
    assert(n > 0)
    assert(agree.toDouble / n >= 0.9, s"holdout agreement $agree/$n")
  }

  test("dataset card invariants: dup rate in [0,1), entropy ≤ log2(langs), median sane") {
    val r = Curation.pipelineDatasetCard.fn(spark, sf).collect()(0)
    val (nDocs, dupRate) = (r.getLong(0), r.getDouble(4))
    assert(nDocs > 0)
    assert(dupRate >= 0.0 && dupRate < 1.0)
    val (nLangs, entropy) = (r.getLong(5), r.getDouble(6))
    assert(entropy >= 0 && entropy <= math.log(nLangs.toDouble) / math.log(2) + 1e-9,
      s"entropy $entropy exceeds log2($nLangs)")
    assert(r.getDouble(3) <= r.getLong(1), "median chars bounded by total")
  }

  test("observed metrics equal the recomputed counters (no second scan needed)") {
    val r = Curation.pipelineObserved.fn(spark, sf).collect()(0)
    val docs = graft.sources.Tables.documents(spark, sf)
    val kept = docs.filter(col("n_chars") >= 64)
    assert(r.getLong(0) == docs.count())
    assert(r.getLong(1) == kept.count())
    assert(r.getLong(2) == kept.agg(sum(col("n_chars"))).collect()(0).getLong(0))
    assert(r.getLong(3) == kept.select("lang").distinct().count())
  }

  test("epoch shuffle: independent permutations per epoch, deterministic") {
    val rows = Curation.pipelineEpochShuffle.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(rows.count(_._1 == 0) == 20 && rows.count(_._1 == 1) == 20)
    val e0 = rows.filter(_._1 == 0).sortBy(_._2).map(_._3).toSeq
    val e1 = rows.filter(_._1 == 1).sortBy(_._2).map(_._3).toSeq
    assert(e0 != e1, "epoch orders must be independent permutations")
    assert(e0.distinct.size == 20 && e1.distinct.size == 20)
    val again = Curation.pipelineEpochShuffle.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq, "order must be run-deterministic")
  }

  test("interleave honors source weights in the output prefix") {
    val rows = Curation.pipelineInterleave.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(rows.map(_._1).toSeq == (1 to 30), "positions contiguous from 1")
    def w(src: String) = 1 + src.drop(3).toInt % 3
    val byW = rows.groupBy(r => w(r._2)).view.mapValues(_.length).toMap
    assert(byW.getOrElse(3, 0) >= 12, s"weight-3 underrepresented: $byW")
    assert(byW.getOrElse(3, 0) > byW.getOrElse(1, 0),
      s"weight-3 sources must outnumber weight-1 in any prefix: $byW")
  }
}
