package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{KMeans, Similarity, TextAnalysis, TimeSeries}
import graft.sources.Tables

/** Invariant pins for the round-5 session-5 operators (exact values
  * are covered by the DuckDB oracle gate where one exists; these pin
  * structural properties that must hold at ANY scale factor).
  */
class Round5eOpsSpec extends AnyFunSuite {
  import TestSpark._

  // ---- ann_mips ------------------------------------------------------

  test("ann_mips: top-k per query, exact inner products, MIPS ≠ cosine in general") {
    val out = Similarity.annMips.fn(spark, sf).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.foreach { case (_, rows) =>
      assert(rows.length == 10)
      val ips = rows.map(_.getDouble(2))
      assert(ips.sameElements(ips.sortBy(-_)), "each query's hits ordered by ip desc")
    }
    // exactness spot-check: recompute q0's best hit on the driver
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val q0 = vecs(0L)
    def ip(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val best = vecs.collect { case (id, v) if id != 0L => (id, ip(q0, v)) }
      .maxBy { case (id, s) => (s, -id) }
    val got = out.filter(_.getLong(0) == 0L).head
    assert(got.getLong(1) == best._1)
    assert(math.abs(got.getDouble(2) - best._2) < 1e-3)
  }

  test("ann_mips: norm-augmentation reduction to cosine preserves the MIPS ranking") {
    // x→[x, √(M²−‖x‖²)], q→[q, 0] (Bachrach et al. 2014): cosine in the
    // augmented space orders candidates exactly by inner product, so any
    // cosine ANN index in Similarity.scala serves MIPS after this map.
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def ip(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val m2 = vecs.values.map(v => ip(v, v)).max
    val q = vecs(3L)
    val cands = vecs.filter(_._1 != 3L).toSeq
    val byIp = cands.sortBy { case (id, v) => (-ip(q, v), id) }.map(_._1).take(10)
    val byAug = cands.sortBy { case (id, v) =>
      // augmented cosine: dot([v,√(M²−‖v‖²)],[q,0]) / (M·‖q‖) — the
      // denominator is constant per query, so rank by dot alone with
      // the augmented build vector having norm M
      (-(ip(q, v) / (math.sqrt(m2) * math.sqrt(ip(q, q)))), id)
    }.map(_._1).take(10)
    assert(byIp == byAug, "augmented-cosine ranking must equal the ip ranking")
  }

  test("ann_mips plans one corpus scan; the query side broadcasts; no window sort") {
    val p = SparkEntry.queries("ann_mips")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query set must broadcast in:\n$p")
    assert(p.contains("TopKPerKey"), s"per-query top-k must use the native operator in:\n$p")
    assert(!p.contains("Window"), "no window-rank fallback")
  }

  // ---- cluster_dbscan ------------------------------------------------

  test("cluster_dbscan: population conserved, noise row present, cluster ids are minima") {
    val out = KMeans.clusterDbscan.fn(spark, sf).collect()
    val n = Tables.events(spark, sf).count()
    assert(out.map(r => r.getLong(1) + r.getLong(2)).sum == n,
      "core + border + noise must partition the point set")
    val noise = out.filter(_.getLong(0) == -1L)
    assert(noise.length == 1 && noise.head.getLong(1) == 0L)
    val clusters = out.filter(_.getLong(0) != -1L)
    assert(clusters.forall(_.getLong(1) >= 1), "every cluster has at least one core point")
  }

  test("cluster_dbscan: the candidate join is a cell-equality shuffle, never cartesian") {
    val p = SparkEntry.queries("cluster_dbscan")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"neighbor probing must stay cell-bucketed in:\n$p")
  }

  // ---- ts_dtw --------------------------------------------------------

  test("dtwBanded: identity, symmetry, and the Euclidean upper bound") {
    val a = Array(0.0, 1.0, 2.0, 3.0, 2.0, 1.0)
    val b = Array(0.0, 0.0, 1.0, 2.0, 3.0, 2.0) // a delayed by one step
    assert(TimeSeries.dtwBanded(a, a, 7) == 0.0)
    val ab = TimeSeries.dtwBanded(a, b, 7)
    val ba = TimeSeries.dtwBanded(b, a, 7)
    assert(math.abs(ab - ba) < 1e-12, "DTW distance is symmetric")
    val euclid = math.sqrt(a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum)
    assert(ab <= euclid + 1e-12, "warping can only shrink the aligned cost")
    assert(ab < euclid, "a pure time-shift must benefit from warping")
  }

  test("ts_dtw: full pair grid, symmetric-canonical ordering, finite distances") {
    val out = TimeSeries.tsDtw.fn(spark, sf).collect()
    val types = Tables.events(spark, sf)
      .select(col("event_type")).distinct().collect().map(_.getString(0)).sorted
    val k = types.length.toLong
    assert(out.length == k * (k - 1) / 2, "one row per unordered pair")
    assert(out.forall(r => r.getString(0) < r.getString(1)), "canonical a<b pairs")
    assert(out.forall(r => !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
  }

  // ---- text_nb_langid ------------------------------------------------

  test("text_nb_langid: confusion matrix conserves the corpus and beats the majority baseline") {
    // NOTE: the synthetic documents table draws ALL languages from one
    // shared ~31-token vocabulary, so lang is only weakly separable
    // from text — the honest pins are conservation and lift over the
    // majority-class baseline, not high absolute accuracy.
    val out = TextAnalysis.textNbLangid.fn(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.map(_.getLong(2)).sum == nDocs, "every doc classified exactly once")
    val acc = out.filter(r => r.getString(0) == r.getString(1)).map(_.getLong(2)).sum.toDouble / nDocs
    val majority = Tables.documents(spark, sf).groupBy(col("lang")).count()
      .agg(max(col("count"))).collect()(0).getLong(0).toDouble / nDocs
    assert(acc >= majority, s"self-trained NB ($acc) must at least beat always-majority ($majority)")
    // every truth language appears in the matrix
    assert(out.map(_.getString(0)).distinct.length ==
      Tables.documents(spark, sf).select(col("lang")).distinct().count())
  }

  test("text_nb_langid beats the fixed marker heuristic on overall accuracy") {
    val nb = TextAnalysis.textNbLangid.fn(spark, sf).collect()
    val nbAcc = nb.filter(r => r.getString(0) == r.getString(1)).map(_.getLong(2)).sum.toDouble /
      nb.map(_.getLong(2)).sum
    val heur = SparkEntry.queries("text_langid_eval")(spark, sf).collect()
    // text_langid_eval is (lang, pred_lang, n) shaped as well
    val hAcc = heur.filter(r => r.getString(0) == r.getString(1)).map(_.getLong(2)).sum.toDouble /
      heur.map(_.getLong(2)).sum
    assert(nbAcc >= hAcc, s"trained NB ($nbAcc) must not lose to the marker heuristic ($hAcc)")
  }
}
