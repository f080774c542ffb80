package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 additions: seasonal/trend strength diagnostics and
  * hierarchical forecast reconciliation.
  */
class Round6OpsSpec extends AnyFunSuite {
  import TestSpark._

  // ---- ts_seasonal_strength ---------------------------------------------

  test("ts_seasonal_strength: bounded scores, exact variance replay") {
    import graft.operators.TimeSeries
    import graft.sources.Tables
    val out = TimeSeries.tsSeasonalStrength.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(out.nonEmpty)
    out.values.foreach { case (n, ft, fs) =>
      assert(n > 0)
      assert(ft >= 0.0 && ft <= 1.0, s"f_trend $ft")
      assert(fs >= 0.0 && fs <= 1.0, s"f_seasonal $fs")
    }
    // replay the decomposition + variances from the collected daily series
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("n")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2)))
      .groupBy(_._1)
    daily.foreach { case (tpe, rows) =>
      val xs = rows.sortBy(_._2).map(r => (r._2, r._3))
      val n = xs.map(_._2)
      // centered 7-day MA trend (full windows only)
      val trend = n.indices.map { i =>
        if (i >= 3 && i < n.length - 3) Some(n.slice(i - 3, i + 4).sum / 7.0)
        else None
      }
      val dow = xs.map(t => ((t._1 / 86400000L + 4) % 7).toInt) // 1970-01-01 = Thursday
      val det = n.indices.collect { case i if trend(i).isDefined =>
        (dow(i), n(i) - trend(i).get)
      }
      val rawSeas = det.groupBy(_._1).map { case (d, v) => d -> v.map(_._2).sum / v.length }
      val meanSeas = rawSeas.values.sum / rawSeas.size
      val seas = rawSeas.map { case (d, v) => d -> (v - meanSeas) }
      val comp = n.indices.collect { case i if trend(i).isDefined =>
        val r = n(i) - trend(i).get - seas(dow(i))
        (r, n(i) - seas(dow(i)), n(i) - trend(i).get)
      }
      def varS(v: Seq[Double]): Double = {
        val m = v.sum / v.length
        v.map(x => (x - m) * (x - m)).sum / (v.length - 1)
      }
      val vr = varS(comp.map(_._1).toSeq)
      val ft = math.max(0.0, 1.0 - vr / varS(comp.map(_._2).toSeq))
      val fs = math.max(0.0, 1.0 - vr / varS(comp.map(_._3).toSeq))
      val (gn, gft, gfs) = out(tpe)
      assert(gn == comp.length, s"$tpe n_days $gn vs ${comp.length}")
      assert(math.abs(gft - math.floor(ft * 10000 + 0.5) / 10000) < 2e-4,
        s"$tpe f_trend $gft vs $ft")
      assert(math.abs(gfs - math.floor(fs * 10000 + 0.5) / 10000) < 2e-4,
        s"$tpe f_seasonal $gfs vs $fs")
    }
  }

  // ---- graph_node2vec -----------------------------------------------------

  test("graph_node2vec: every hop is a real edge, one walk per node, deterministic") {
    import graft.operators.Graph
    def l(r: org.apache.spark.sql.Row, i: Int): Long =
      r.getAs[Number](i).longValue()
    val out = Graph.graphNode2vec.fn(spark, sf).collect()
      .map(r => (l(r, 0), l(r, 1), l(r, 2), l(r, 3)))
    assert(out.nonEmpty)
    // symmetric edge set from the same projection
    val ue = Graph.undirectedNationEdges(spark, sf).collect()
      .map(r => (l(r, 0), l(r, 1)))
    val edges = ue.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    out.foreach { case (s0, s1, s2, s3) =>
      assert(edges((s0, s1)), s"hop1 $s0->$s1 not an edge")
      assert(edges((s1, s2)), s"hop2 $s1->$s2 not an edge")
      assert(edges((s2, s3)), s"hop3 $s2->$s3 not an edge")
    }
    // exactly one walk per node of the undirected projection
    val nodes = (ue.map(_._1) ++ ue.map(_._2)).toSet
    assert(out.map(_._1).toSet == nodes)
    assert(out.length == nodes.size)
    // hash-derived picks: exact rerun determinism
    val again = Graph.graphNode2vec.fn(spark, sf).collect()
      .map(r => (l(r, 0), l(r, 1), l(r, 2), l(r, 3)))
    assert(out.sameElements(again))
    // the return bias (w=4) dominates when prev is the only heavy
    // class: at least one walk must revisit its start at step 2
    assert(out.exists { case (s0, _, s2, _) => s2 == s0 },
      "1/p=4 return bias never fired — weighting is suspect")
  }

  // ---- dedup_minhash_weighted ----------------------------------------------

  test("dedup_minhash_weighted: verified subset of exact, recall >= 0.9, deterministic") {
    import graft.operators.Dedup
    import graft.sources.Tables
    val out = Dedup.dedupMinhashWeighted.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // exact all-pairs weighted Jaccard on the bounded range
    val tf = Tables.documents(spark, sf).filter(col("doc_id") < 300L)
      .select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("doc_id", "tok").agg(count(lit(1)).cast("double").as("w"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._1).map { case (id, xs) =>
        id -> xs.map(t => t._2 -> t._3).toMap
      }
    def jw(a: Map[String, Double], b: Map[String, Double]): Double = {
      val keys = a.keySet ++ b.keySet
      val mins = keys.toSeq.map(k => math.min(a.getOrElse(k, 0.0), b.getOrElse(k, 0.0))).sum
      val maxs = keys.toSeq.map(k => math.max(a.getOrElse(k, 0.0), b.getOrElse(k, 0.0))).sum
      mins / maxs
    }
    val ids = tf.keys.toSeq.sorted
    val exact = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      v = jw(tf(ids(i)), tf(ids(j))) if v >= 0.5
    } yield (ids(i), ids(j), v)).toVector
    val exactSet = exact.map(p => (p._1, p._2)).toSet
    // precision 1 by construction: every emitted pair is exactly re-verified
    out.foreach { case (a, b, v) =>
      assert(exactSet((a, b)), s"($a,$b) verified but not in exact truth")
      val ev = exact.find(p => p._1 == a && p._2 == b).get._3
      assert(math.abs(v - ev) < 1e-3, s"($a,$b) jw $v vs exact $ev")
    }
    // ICWS-LSH recall at 16 samples over J_w >= 0.5 truth
    if (exact.nonEmpty) {
      val got = out.map(p => (p._1, p._2)).toSet
      val recall = exact.count(p => got((p._1, p._2))).toDouble / exact.size
      assert(recall >= 0.9, s"recall $recall over ${exact.size} true pairs")
    }
    // hash-derived sampling: exact rerun determinism
    val again = Dedup.dedupMinhashWeighted.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.sameElements(again))
  }

  // ---- emb_knn_graph_ivf ----------------------------------------------------

  test("emb_knn_graph_ivf: shape, exact cosines, recall vs the exact graph") {
    import graft.operators.Similarity
    val approx = Similarity.embKnnGraphIvf.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(approx.nonEmpty)
    // per-source shape: ranks 1..k contiguous, k <= 4, sims descending
    approx.groupBy(_._1).foreach { case (src, rows) =>
      val byRank = rows.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1 to byRank.length), s"ranks at $src")
      assert(byRank.length <= 4)
      byRank.map(_._4).sliding(2).foreach {
        case Array(a, b) => assert(b <= a + 1e-9, s"sims not descending at $src")
        case _ =>
      }
    }
    // emitted cosines are EXACT (the approximation is only in which
    // candidates were scored, never in the scores)
    val exact = Similarity.embKnnGraph.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val vecs = Similarity.vectors(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    approx.take(200).foreach { case (s0, _, d0, v) =>
      assert(math.abs(v - math.floor(cos(vecs(s0), vecs(d0)) * 10000 + 0.5) / 10000) < 2e-4,
        s"cosine mismatch for ($s0,$d0)")
    }
    // recall@4 against the exact graph (probing 4 of 16 lists)
    val truth = exact.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).toSet }
    val got = approx.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).toSet }
    val recall = truth.toSeq.map { case (src, t) =>
      got.getOrElse(src, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / truth.size
    info(s"knn-graph recall@4 = $recall")
    assert(recall >= 0.9,
      s"recall $recall (measured 0.922: 8/16 probes, top-8 pool, one NN-descent round)")
    // hash-free deterministic pipeline: exact rerun equality
    val again = Similarity.embKnnGraphIvf.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(approx.sameElements(again))
  }

  // ---- dedup_weighted_exact --------------------------------------------------

  test("dedup_weighted_exact: matches a local all-pairs weighted-Jaccard recount") {
    import graft.operators.Dedup
    import graft.sources.Tables
    val out = Dedup.dedupWeightedExact.fn(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val tf = Tables.documents(spark, sf).filter(col("doc_id") < 300L)
      .select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("doc_id", "tok").agg(count(lit(1)).cast("double").as("w"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(t => t._2 -> t._3).toMap }
    val ids = tf.keys.toSeq.sorted
    val expect = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      a = tf(ids(i)); b = tf(ids(j))
      keys = a.keySet ++ b.keySet
      mins = keys.toSeq.map(k => math.min(a.getOrElse(k, 0.0), b.getOrElse(k, 0.0))).sum
      maxs = keys.toSeq.map(k => math.max(a.getOrElse(k, 0.0), b.getOrElse(k, 0.0))).sum
      v = mins / maxs if v >= 0.5
    } yield (ids(i), ids(j)) -> v).toMap
    assert(out.keySet == expect.keySet,
      s"pair sets differ: ${out.keySet.diff(expect.keySet) ++ expect.keySet.diff(out.keySet)}")
    out.foreach { case (k, v) =>
      assert(math.abs(v - expect(k)) < 1e-3, s"$k: $v vs ${expect(k)}")
    }
    assert(out.nonEmpty, "bounded truth range must contain weighted near-dups")
  }

  // ---- ann_ivf_stats -----------------------------------------------------------

  test("ann_ivf_stats: population conserved, shares sum to 1, residual bounds") {
    import graft.operators.Similarity
    val out = Similarity.annIvfStats.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.nonEmpty && out.length <= 16)
    val total = Similarity.vectors(spark, sf).count()
    assert(out.map(_._2).sum == total, "every vector lands in exactly one list")
    assert(math.abs(out.map(_._3).sum - 1.0) < 0.01, "shares must sum to ~1")
    out.foreach { case (list, n, share, mean, mx) =>
      assert(list >= 0 && list < 16)
      assert(n > 0 && share > 0)
      assert(mean >= 0 && mx >= mean - 1e-9, s"list $list: mean $mean max $mx")
      // unit vectors: residual to a near-unit centroid is < 2 always
      assert(mx < 2.0 + 1e-6)
    }
    val again = Similarity.annIvfStats.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.sameElements(again))
  }

  // ---- ts_reconcile -------------------------------------------------------

  test("ts_reconcile: ratio identity, coherence, holdout shape") {
    import graft.operators.TimeSeries
    import graft.sources.Tables
    val out = TimeSeries.tsReconcile.fn(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.length == 7, s"one row per holdout day, got ${out.length}")
    out.foreach { case (_, actual, direct, bu, ratio) =>
      assert(actual > 0 && direct > 0 && bu > 0)
      // the reconciliation ratio IS direct/bottom-up (to rounding)
      assert(math.abs(ratio - math.floor(direct / bu * 10000 + 0.5) / 10000) < 2e-4,
        s"ratio $ratio vs ${direct / bu}")
      // coherence: scaling every per-type forecast by the ratio makes
      // the bottom-up sum equal the direct total by construction
      assert(math.abs(bu * ratio - direct) < direct * 1e-3,
        s"sum(reconciled)=${bu * ratio} vs direct=$direct")
    }
    // actual totals recount from the raw corpus
    val daily = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val cut = daily.keys.map(_.getTime).max - 7L * 86400000L
    out.foreach { case (day, actual, _, _, _) =>
      assert(day.getTime > cut, s"$day inside the train window")
      assert(actual == daily(day), s"$day actual $actual vs ${daily(day)}")
    }
  }
}
