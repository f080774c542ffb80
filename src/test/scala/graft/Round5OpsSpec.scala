package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Graph, Multimodal, Profile, Similarity, TextAnalysis, TimeSeries}

/** Invariant pins for the round-5 session-2 operators (exact values
  * are covered by the DuckDB oracle gate; these pin structural
  * properties that must hold at ANY scale factor, plus the
  * constructed-payload semantics of the phash machinery the corpus
  * can't exercise).
  */
class Round5OpsSpec extends AnyFunSuite {
  import TestSpark._

  test("mm_phash: one index row per doc, bands derive from the hash") {
    val idx = Multimodal.mmPhash.fn(spark, sf).collect()
    val nDocs = sources.Tables.documents(spark, sf).count()
    assert(idx.length == nDocs)
    idx.foreach { r =>
      val h = r.getAs[Long]("phash")
      (0 until 4).foreach { b =>
        assert(r.getAs[Long](s"band_$b") == ((h >>> (b * 16)) & 0xffffL))
      }
    }
  }

  test("dHash is deterministic and identical payloads collide at hamming 0") {
    val p1 = Array.tabulate[Byte](1000)(i => ((i * 37 + 11) % 251).toByte)
    val p2 = p1.clone()
    assert(Multimodal.dHash(p1) == Multimodal.dHash(p2))
    import spark.implicits._
    val idx = Multimodal.phashIndex(spark,
      Seq((1L, p1), (2L, p2)).toDF("doc_id", "payload"))
    val pairs = Multimodal.phashPairs(idx, maxHamming = 6).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Int]("hamming") == 0)
  }

  test("dHash: an aligned local edit stays within banding reach") {
    val p1 = Array.tabulate[Byte](1440)(i => ((i * 37 + 11) % 251).toByte)
    val p2 = p1.clone()
    // perturb one grid cell's worth of bytes (1440/72 = 20 bytes)
    (200 until 220).foreach(i => p2(i) = (p2(i) ^ 0x7f).toByte)
    val h1 = Multimodal.dHash(p1); val h2 = Multimodal.dHash(p2)
    val hamming = java.lang.Long.bitCount(h1 ^ h2)
    assert(hamming > 0 && hamming <= 4, s"local edit moved $hamming bits")
    import spark.implicits._
    val idx = Multimodal.phashIndex(spark,
      Seq((1L, p1), (2L, p2)).toDF("doc_id", "payload"))
    assert(Multimodal.phashPairs(idx, maxHamming = 6).count() == 1)
  }

  test("emb_knn_graph: exactly k=4 ranked neighbors per source") {
    val g = Similarity.embKnnGraph.fn(spark, sf).collect()
    val bySrc = g.groupBy(_.getAs[Long]("src"))
    val nVec = sources.Tables.embeddings(spark, sf).count()
    assert(bySrc.size == nVec)
    bySrc.foreach { case (src, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to 4))
      val sims = sorted.map(_.getAs[Double]("cos_sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, s"src $src not ranked")
      assert(!rows.exists(_.getAs[Long]("dst") == src), s"src $src self-neighbor")
    }
  }

  test("graph_clustering_coeff: coeff bounded, node triangles sum to 3x global") {
    val cc = Graph.graphClusteringCoeff.fn(spark, sf).collect()
    assert(cc.nonEmpty)
    cc.foreach { r =>
      val coeff = r.getAs[Double]("coeff")
      assert(coeff >= 0.0 && coeff <= 1.0, s"coeff out of range: $r")
    }
    val triSum = cc.map(_.getAs[Long]("triangles")).sum
    val global = Graph.graphTriangles.fn(spark, sf).collect().head.getAs[Long](0)
    assert(triSum == 3 * global, s"per-node $triSum != 3 x $global")
  }

  test("graph_2hop: strict reach excludes self and direct neighbors") {
    val rows = Graph.graph2hop.fn(spark, sf).collect()
    val n = rows.length
    rows.foreach { r =>
      val deg = r.getAs[Long]("degree"); val r2 = r.getAs[Long]("reach2")
      assert(r2 >= 0 && r2 <= n - 1 - deg, s"reach2 out of bounds: $r")
    }
  }

  test("ts_ohlc bars: low <= open, close <= high and volume >= 1") {
    val bars = TimeSeries.tsOhlc.fn(spark, sf).collect()
    assert(bars.nonEmpty)
    bars.foreach { r =>
      val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"))
      assert(l <= o && o <= h && l <= c && c <= h, s"bar violates OHLC order: $r")
      assert(r.getAs[Long]("volume") >= 1)
    }
  }

  test("ts_inter_event: gaps nonnegative, median <= max") {
    val rows = TimeSeries.tsInterEvent.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_gap_s") >= 0.0)
      assert(r.getAs[Double]("median_gap_s") <= r.getAs[Long]("max_gap_s").toDouble)
    }
  }

  test("profile_fd: key-determined dependencies hold") {
    val rows = Profile.profileFd.fn(spark, sf).collect()
      .map(r => r.getAs[String]("fd") -> r.getAs[Boolean]("holds")).toMap
    assert(rows("orders.o_orderkey->o_custkey"))
    assert(rows("nation.n_nationkey->n_regionkey"))
    assert(rows("events.event_id->user_id"))
  }

  test("pipeline_curriculum: 4 phases partition the corpus, difficulty rises") {
    val rows = Curation.pipelineCurriculum.fn(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("phase")).toSeq == Seq(1, 2, 3, 4))
    val nDocs = sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    val wlens = rows.map(_.getAs[Double]("avg_wlen"))
    assert(wlens.zip(wlens.tail).forall { case (a, b) => a <= b },
      s"phase difficulty not monotone: ${wlens.toSeq}")
  }

  test("text_code_detect: flag consistent with the ratio threshold") {
    val rows = TextAnalysis.textCodeDetect.fn(spark, sf).collect()
    val nDocs = sources.Tables.documents(spark, sf).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val ratio = r.getAs[Double]("symbol_ratio")
      assert(ratio >= 0.0)
      // flag uses the unrounded ratio; the output column is rounded
      // to 6 decimals, so allow the half-ulp band around 0.01
      assert(r.getAs[Boolean]("looks_code") == (ratio > 0.01) ||
        math.abs(ratio - 0.01) <= 1e-6, s"flag inconsistent: $r")
    }
  }
}
