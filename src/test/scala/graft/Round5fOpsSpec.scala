package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventOps, Profile, Similarity, TimeSeries}
import graft.sources.{SourceOps, Tables}

/** Invariant pins for the round-5 session-6 operators (exact values
  * are covered by the DuckDB oracle gate where one exists; these pin
  * the structural properties that must hold at ANY scale factor).
  */
class Round5fOpsSpec extends AnyFunSuite {
  import TestSpark._

  // ---- events_survival ----------------------------------------------

  test("events_survival: KM estimator invariants (telescoping risk set, monotone survival)") {
    val rows = EventOps.eventsSurvival.fn(spark, sf)
      .collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    // population conservation: risk set at t0 = all users = Σ(d+c)
    val total = rows.map(r => r.getLong(2) + r.getLong(3)).sum
    assert(rows.head.getLong(1) == total)
    // telescoping: n_{i+1} = n_i − d_i − c_i
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(1) == a.getLong(1) - a.getLong(2) - a.getLong(3))
      case _ =>
    }
    // survival is a product of factors ≤ 1: non-increasing, in [0,1]
    val surv = rows.map(_.getDouble(5))
    assert(surv.forall(v => v >= 0.0 && v <= 1.0))
    surv.sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-9)
      case _ =>
    }
    // hazard consistency: floor-rounded d/n
    rows.foreach { r =>
      val expect = math.floor(r.getLong(2) * 10000.0 / r.getLong(1) + 0.5) / 10000
      assert(r.getDouble(4) == expect)
    }
  }

  test("events_survival: censoring reduces deaths, never the risk-set total") {
    // every user appears exactly once, as a death or a censoring
    val ev = Tables.events(spark, sf)
    val nUsers = ev.select("user_id").distinct().count()
    val rows = EventOps.eventsSurvival.fn(spark, sf).collect()
    assert(rows.map(r => r.getLong(2) + r.getLong(3)).sum == nUsers)
    // the corpus horizon guarantees at least one censored user (the
    // last-active user is by definition within the 14-day window)
    assert(rows.map(_.getLong(3)).sum >= 1)
  }

  // ---- ts_periodogram ------------------------------------------------

  test("ts_periodogram: planted 7-day cycle is recovered as the dominant period") {
    import spark.implicits._
    // 8 full cycles of a clean period-7 signal
    val series = (0 until 56)
      .map(t => ("planted", t.toLong, math.sin(2 * math.Pi * t / 7.0) * 10 + 50))
      .toDF("key", "t", "x")
    val top = TimeSeries.periodogramTopK(series, 2 to 14, 3)
      .filter(col("rank") === 1).collect()
    assert(top.length == 1)
    assert(top.head.getInt(2) == 7, s"expected dominant period 7, got ${top.head.getInt(2)}")
  }

  test("ts_periodogram: constant series has zero power everywhere") {
    import spark.implicits._
    val flat = (0 until 28).map(t => ("flat", t.toLong, 42.0)).toDF("key", "t", "x")
    val out = TimeSeries.periodogramTopK(flat, 2 to 14, 3).collect()
    assert(out.forall(_.getDouble(3) == 0.0))
  }

  test("ts_periodogram: corpus query emits top-3 per type, ranked by power") {
    val out = TimeSeries.tsPeriodogram.fn(spark, sf).collect()
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(out.length == types * 3)
    out.groupBy(_.getString(0)).values.foreach { rows =>
      val byRank = rows.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).sameElements(Array(1, 2, 3)))
      val powers = byRank.map(_.getDouble(3))
      assert(powers.forall(_ >= 0.0))
      assert(powers.sameElements(powers.sortBy(-_)), "power must fall with rank")
    }
  }

  // ---- profile_ldiversity -------------------------------------------

  test("profile_ldiversity: coarsening the QI can only grow l_min") {
    val rows = Profile.profileLdiversity.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val fine = rows("nation+segment")
    val coarse = rows("nation")
    // merging classes unions their sensitive-value sets
    assert(coarse.getLong(2) >= fine.getLong(2))
    // coarse partition has no more classes than the fine one
    assert(coarse.getLong(1) <= fine.getLong(1))
    // l_min ≥ 1 by construction; disclosed rows only in l=1 classes
    assert(fine.getLong(2) >= 1)
    if (fine.getLong(3) == 0) assert(fine.getLong(4) == 0)
  }

  // ---- emb_knn_classify ---------------------------------------------

  test("emb_knn_classify: confusion matrix conserves the population") {
    val out = Similarity.embKnnClassify.fn(spark, sf)
    val n = Tables.embeddings(spark, sf).count()
    assert(out.agg(sum("n")).collect()(0).getLong(0) == n)
  }

  test("emb_knn_classify core: ≥90% leave-one-out accuracy on planted Gaussian clusters") {
    import spark.implicits._
    // 3 well-separated direction clusters in 8-d; deterministic LCG noise
    def lcg(seed: Long): Long = (seed * 6364136223846793005L + 1442695040888963407L)
    val centers = Array(
      Array(10.0, 0, 0, 0, 0, 0, 0, 0),
      Array(0.0, 10, 0, 0, 0, 0, 0, 0),
      Array(0.0, 0, 10, 0, 0, 0, 0, 0))
    val pts = (0 until 90).map { i =>
      val label = i % 3
      var s = lcg(i.toLong + 7)
      val v = centers(label).map { c =>
        s = lcg(s); c + (s % 1000) / 1000.0 // noise ≪ separation
      }
      (i.toLong, label, v)
    }
    val e = pts.toDF("vec_id", "label", "v")
    val cm = Similarity.knnClassify(e, k = 5).collect()
    val total = cm.map(_.getLong(2)).sum
    val correct = cm.filter(r => r.getInt(0) == r.getInt(1)).map(_.getLong(2)).sum
    assert(total == 90)
    assert(correct >= 81, s"expected ≥90% LOO accuracy, got $correct/90")
  }

  // ---- src_bloom_filter_scan ----------------------------------------

  test("src_bloom_filter_scan: bloom filters present in the written footer") {
    // run the query once so the layout exists
    val out = SourceOps.srcBloomFilterScan.fn(spark, sf).collect()
    assert(out.nonEmpty)
    // every data file's o_custkey column chunks must carry a
    // bloom-filter offset in the parquet metadata
    val path = SourceOps.bloomOrdersLayout(spark, sf)
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try {
        reader.getFooter.getBlocks.forEach { block =>
          val cols = block.getColumns
          val custkey = (0 until cols.size).map(cols.get)
            .find(_.getPath.toDotString == "o_custkey").get
          assert(custkey.getBloomFilterOffset > 0,
            s"${f.getName}: o_custkey column chunk must carry a bloom filter")
          // the non-bloom columns must NOT pay the footprint
          val orderkey = (0 until cols.size).map(cols.get)
            .find(_.getPath.toDotString == "o_orderkey").get
          assert(orderkey.getBloomFilterOffset <= 0)
        }
      } finally reader.close()
    }
  }
}
