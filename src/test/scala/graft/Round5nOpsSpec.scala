package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Invariant pins for the round-5 session-14 operators. */
class Round5nOpsSpec extends AnyFunSuite {
  import TestSpark._

  // ---- graph_butterflies ----------------------------------------------

  test("graph_butterflies: brute-force recount, double-count identity, determinism") {
    // full per-supplier relation (the query is its top-20 projection)
    val got = Graph.butterflyCounts(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    // brute force on the collected sf0.001 repeat graph: butterflies
    // containing supplier s = Σ_{s'≠s} C(|N(s) ∩ N(s')|, 2)
    val edges = Graph.repeatTradeEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = edges.groupBy(_._2).map { case (s, es) => s -> es.map(_._1).toSet }
    val supps = nbrs.keys.toSeq.sorted
    val expect = supps.map { s =>
      val pairs = for {
        t <- supps if t != s
        shared = (nbrs(s) & nbrs(t)).size if shared >= 2
      } yield shared.toLong * (shared - 1) / 2
      s -> ((pairs.sum, pairs.size.toLong))
    }.filter(_._2._1 > 0).toMap
    assert(got == expect, s"got=${got.toSeq.sorted} expect=${expect.toSeq.sorted}")

    // each butterfly involves exactly 2 suppliers → Σ per-supplier = 2B
    val total = got.values.map(_._1).sum
    assert(total % 2 == 0 && total > 0)

    // determinism of the exposed top-20 query
    val q = Graph.graphButterflies.fn(spark, sf).collect().toSeq
    assert(q == Graph.graphButterflies.fn(spark, sf).collect().toSeq)
  }

  // ---- ts_croston -------------------------------------------------------

  test("ts_croston: sequential driver replay, interval bounds") {
    import graft.operators.TimeSeries
    import graft.sources.Tables
    val out = TimeSeries.tsCroston.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toMap
    assert(out.nonEmpty)
    // weeks are distinct per part → every interval ≥ 1 week, so the
    // demand-rate forecast can never exceed the size estimate
    out.values.foreach { case (n, zh, qh, rate) =>
      assert(n >= 2); assert(qh >= 1.0); assert(rate <= zh + 1e-9)
    }
    // sequential replay of the textbook recursion ẑ += α(z−ẑ),
    // q̂ += α(q−q̂) on the collected weekly series (sf0.001 is small)
    val dem = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey").as("part"),
        date_trunc("week", col("l_shipdate")).cast("date").as("week"))
      .agg(round(sum(col("l_quantity")), 6).as("z"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDouble(2)))
      .groupBy(_._1)
    val alpha = 0.1
    dem.foreach { case (part, rows) =>
      val series = rows.sortBy(_._2.toEpochDay).map(t => (t._2, t._3))
      if (series.length >= 2) {
        var zh = series.head._2
        var qh = Double.NaN
        series.sliding(2).foreach { case Array((w0, _), (w1, z1)) =>
          val gap = ((w1.toEpochDay - w0.toEpochDay) / 7).toDouble
          qh = if (qh.isNaN) gap else qh + alpha * (gap - qh)
          zh = zh + alpha * (z1 - zh)
        }
        val (n, gotZ, gotQ, gotRate) = out(part)
        assert(n == series.length)
        assert(math.abs(gotZ - zh) < 1e-3, s"part $part z: $gotZ vs $zh")
        assert(math.abs(gotQ - qh) < 1e-3, s"part $part q: $gotQ vs $qh")
        assert(math.abs(gotRate - zh / qh) < 1e-3)
      } else assert(!out.contains(part))
    }
  }

  // ---- mm_shot_detect ---------------------------------------------------

  test("mm_shot_detect: sequential replay of frames, threshold, and cuts") {
    import graft.operators.Multimodal
    import graft.sources.Tables
    val out = Multimodal.mmShotDetect.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap

    // replay: chunk each payload into 256-byte frames, mean byte
    // intensity per frame (decodeStub rounding), |Δ| between consecutive
    // frames, global mean+2σ threshold, count cuts per doc. Payloads
    // replay the reader's r10 planting rule: genuine media bytes on
    // doc_id % 100 < 5, UTF-8 text stand-ins elsewhere.
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map { r =>
        val id = r.getLong(0)
        (id, if (id % 100 < 5) Multimodal.genMedia(id)
             else r.getString(1).getBytes("UTF-8"))
      }
    def means(b: Array[Byte]): Array[Double] =
      b.grouped(Multimodal.FrameBytes).map { f =>
        math.round(f.map(_ & 0xff).sum.toDouble / f.length * 100) / 100.0
      }.toArray
    val perDoc = docs.map { case (id, b) => id -> means(b) }
    val deltas = perDoc.flatMap { case (_, m) =>
      m.sliding(2).collect { case Array(a, b) => math.abs(b - a) }
    }
    val mean = deltas.sum / deltas.length
    val sd = math.sqrt(deltas.map(x => (x - mean) * (x - mean)).sum / (deltas.length - 1))
    val thr = mean + 2 * sd
    // threshold is far from any delta at this SF, so the distributed
    // float-sum noise (1e-12) cannot flip a classification
    assert(deltas.forall(d => math.abs(d - thr) > 1e-6))
    perDoc.foreach { case (id, m) =>
      if (m.isEmpty) assert(!out.contains(id))
      else {
        val cuts = m.sliding(2).collect { case Array(a, b) => math.abs(b - a) }
          .count(_ > thr)
        val (nf, ns, _) = out(id)
        assert(nf == m.length, s"doc $id frames")
        assert(ns == cuts + 1, s"doc $id shots: $ns vs ${cuts + 1}")
      }
    }
    assert(out.keySet == perDoc.filter(_._2.nonEmpty).map(_._1).toSet)
  }

  // ---- profile_lof ------------------------------------------------------

  test("profile_lof: quadratic driver replay matches the grid plan") {
    import graft.operators.{KMeans, Profile}
    import graft.sources.Tables
    val out = Profile.profileLof.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(out.length == 20)

    // replay: same ids (from the same deterministic hash relation),
    // exact quadratic radius-h LOF
    val raw = KMeans.points(Tables.lineitem(spark, sf))
      .select(conv(substring(md5(concat_ws(",",
          col("l_orderkey"), col("l_linenumber"),
          round(col("x") * 100.0, 0).cast("long"),
          round(col("y") * 100.0, 0).cast("long"))), 1, 13), 16, 10)
        .cast("long").as("id"), col("x"), col("y"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val n = raw.length.toDouble
    val (xmin, xmax) = (raw.map(_._2).min, raw.map(_._2).max)
    val (ymin, ymax) = (raw.map(_._3).min, raw.map(_._3).max)
    val pts = raw.map { case (id, x, y) =>
      (id, (x - xmin) / math.max(xmax - xmin, 1e-12),
        (y - ymin) / math.max(ymax - ymin, 1e-12))
    }
    val h = math.sqrt(4.0 / n) // must track the operator's c
    val k = 5
    // kNN within radius h, (dist, id) tie-break
    val knn: Map[Long, Array[(Long, Double)]] = pts.map { case (a, ua, va) =>
      a -> pts.iterator
        .filter(_._1 != a)
        .map { case (b, ub, vb) =>
          (b, math.sqrt(math.pow(ua - ub, 2) + math.pow(va - vb, 2)))
        }
        .filter(_._2 <= h)
        .toArray.sortBy(t => (t._2, t._1)).take(k)
    }.toMap.filter(_._2.nonEmpty)
    val kdist = knn.map { case (a, nb) => a -> nb.map(_._2).max }
    val lrd = knn.map { case (a, nb) =>
      a -> nb.length / nb.map { case (b, d) => math.max(kdist(b), d) }.sum
    }
    val lof = knn.map { case (a, nb) =>
      a -> math.round(nb.map(t => lrd(t._1)).sum / nb.length / lrd(a) * 1e4) / 1e4
    }
    val expectTop = lof.toSeq.sortBy { case (id, l) => (-l, id) }.take(25)
    out.foreach { case (id, nn, l) =>
      assert(knn(id).length == nn, s"id $id neighbors")
      assert(math.abs(lof(id) - l) < 1e-3, s"id $id lof: $l vs ${lof(id)}")
    }
    // the returned set is the replay's head (±FP-rounding wiggle room)
    val top = expectTop.map(_._1).toSet
    assert(out.count(r => top(r._1)) >= 18, s"overlap with replay top-25 too low")
    // density-uniformity: most of the corpus sits near LOF = 1, so the
    // flagged head must be clearly above it
    assert(out.head._3 > 1.2)
  }

  // ---- mining_hmm -------------------------------------------------------

  test("mining_hmm: textbook Viterbi with backtracking matches the fold") {
    import graft.operators.Linkage
    import graft.sources.Tables
    val out = Linkage.miningHmm.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap

    val pi = Array(0.8, 0.2)
    val t = Array(Array(0.85, 0.15), Array(0.30, 0.70))
    val e = Array(Array(0.45, 0.40, 0.05, 0.05, 0.05),
      Array(0.15, 0.30, 0.05, 0.20, 0.30))
    val codeOf = Map("view" -> 0, "click" -> 1, "error" -> 2,
      "signup" -> 3, "purchase" -> 4)
    val seqs = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("tsu"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
      .map { case (u, rows) =>
        u -> rows.sortBy(r => (r._2, r._3)).map(r => codeOf(r._4))
      }
    seqs.foreach { case (u, codes) =>
      // Viterbi with explicit backpointers; ties prefer prev state 0
      val lp = Array.ofDim[Double](codes.length, 2)
      val bp = Array.ofDim[Int](codes.length, 2)
      lp(0)(0) = math.log(pi(0)) + math.log(e(0)(codes(0)))
      lp(0)(1) = math.log(pi(1)) + math.log(e(1)(codes(0)))
      for (i <- 1 until codes.length; j <- 0 to 1) {
        val f0 = lp(i - 1)(0) + math.log(t(0)(j))
        val f1 = lp(i - 1)(1) + math.log(t(1)(j))
        bp(i)(j) = if (f0 >= f1) 0 else 1
        lp(i)(j) = math.max(f0, f1) + math.log(e(j)(codes(i)))
      }
      val last = codes.length - 1
      var st = if (lp(last)(0) >= lp(last)(1)) 0 else 1
      var engaged = 0
      for (i <- last to 0 by -1) { engaged += st; if (i > 0) st = bp(i)(st) }
      val (len, nEng, ll) = out(u)
      assert(len == codes.length)
      assert(nEng == engaged, s"user $u engaged: $nEng vs $engaged")
      assert(math.abs(ll - math.max(lp(last)(0), lp(last)(1))) < 1e-3,
        s"user $u loglik")
    }
    assert(out.keySet == seqs.keySet)
  }

  // ---- graph_fastrp -----------------------------------------------------

  test("graph_fastrp: driver hop replay and edge-homophily") {
    import graft.operators.Graph
    import graft.sources.Tables
    val dims = 8
    val weights = Array(0.0, 1.0, 1.0, 2.0)
    val full = Graph.fastRpEmbeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> (1 until 1 + dims).map(r.getDouble).toArray).toMap

    // adjacency from the same namespaced undirected projection
    val raw = Graph.tradeEdges(spark, sf).collect()
      .map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1))
    val adj = (raw ++ raw.map(_.swap)).groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._2) }
    // hop-0 sign matrix via the same Spark-side hash
    import spark.implicits._
    val x0 = adj.keys.toSeq.toDF("node")
      .select(col("node") +: (0 until dims).map(j =>
        (when(conv(substring(md5(concat_ws(",", col("node"), lit(j))),
            1, 13), 16, 10).cast("long") % 2 === 0, 1.0).otherwise(-1.0) /
          math.sqrt(dims)).as(s"e$j")): _*)
      .collect().map(r => r.getLong(0) -> (1 to dims).map(r.getDouble).toArray).toMap
    var x = x0
    var acc = x0.map { case (n, v) => n -> v.map(_ * weights(0)) }
    for (k <- 1 to 3) {
      x = adj.map { case (n, nbrs) =>
        val m = Array.fill(dims)(0.0)
        nbrs.foreach(b => (0 until dims).foreach(j => m(j) += x(b)(j)))
        n -> m.map(_ / nbrs.length)
      }
      val xk = x
      acc = acc.map { case (n, v) =>
        n -> v.zip(xk(n)).map { case (a, h) => a + h * weights(k) }
      }
    }
    assert(full.keySet == acc.keySet)
    full.foreach { case (n, v) =>
      v.zip(acc(n)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"node $n: $a vs $b")
      }
    }

    // homophily: adjacent nodes more similar than hash-picked non-edges
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map(t => t._1 * t._2).sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val edgeCos = raw.map { case (u, v) => cos(acc(u), acc(v)) }
    // control group must match the edge side-mix: customer–supplier
    // pairs that do NOT trade (same-side pairs are near-identical
    // after even-hop mean propagation and would be the wrong baseline)
    val custs = acc.keys.filter(_ % 2 == 0).toArray.sorted
    val supps = acc.keys.filter(_ % 2 == 1).toArray.sorted
    val rnd = new scala.util.Random(42)
    val edgeSet = raw.toSet
    val nonEdge = Iterator.continually {
      (custs(rnd.nextInt(custs.length)), supps(rnd.nextInt(supps.length)))
    }.filter(p => !edgeSet(p))
      .take(edgeCos.length).toArray
      .map { case (u, v) => cos(acc(u), acc(v)) }
    val (em, nm) = (edgeCos.sum / edgeCos.length, nonEdge.sum / nonEdge.length)
    // the margin depends on the sign-matrix draw (0.028 under the
    // md5 matrix vs 0.06 under the old xxhash64 one); the PROPERTY is
    // edges ≻ non-edges, with a floor against noise
    assert(em > nm + 0.02, s"edge homophily: $em vs $nm")
  }

  // ---- ts_burst ---------------------------------------------------------

  test("ts_burst: min-cost recursion with backtracking matches the fold") {
    import graft.operators.TimeSeries
    import graft.sources.Tables
    val out = TimeSeries.tsBurst.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getInt(2), r.getInt(3),
        r.getDouble(4))).toMap

    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("n")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2)))
      .groupBy(_._1)
    daily.foreach { case (tpe, rows) =>
      val ns = rows.sortBy(_._2).map(_._3)
      val t = ns.length.toDouble
      val lam0 = ns.sum / t
      def em(s: Int, n: Double): Double = {
        val lam = if (s == 0) lam0 else 2 * lam0
        -(n * math.log(lam) - lam)
      }
      // Viterbi over costs with backpointers; start in q0, enter costs ln T
      val c = Array.ofDim[Double](ns.length, 2)
      val bp = Array.ofDim[Int](ns.length, 2)
      c(0)(0) = em(0, ns(0)); c(0)(1) = math.log(t) + em(1, ns(0))
      bp(0)(0) = 0; bp(0)(1) = 0
      for (i <- 1 until ns.length) {
        val to0 = Seq(c(i - 1)(0), c(i - 1)(1))
        bp(i)(0) = if (to0(0) <= to0(1)) 0 else 1
        c(i)(0) = to0.min + em(0, ns(i))
        val to1 = Seq(c(i - 1)(0) + math.log(t), c(i - 1)(1))
        bp(i)(1) = if (to1(0) <= to1(1)) 0 else 1
        c(i)(1) = to1.min + em(1, ns(i))
      }
      val last = ns.length - 1
      var st = if (c(last)(0) <= c(last)(1)) 0 else 1
      var burstDays = 0
      var entries = 0
      for (i <- last to 0 by -1) {
        burstDays += st
        val prev = if (i > 0) bp(i)(st) else 0
        if (st == 1 && prev == 0) entries += 1
        st = prev
      }
      val (nd, bd, nb, cost) = out(tpe)
      assert(nd == ns.length)
      assert(bd == burstDays, s"$tpe burst days: $bd vs $burstDays")
      assert(nb == entries, s"$tpe bursts: $nb vs $entries")
      assert(math.abs(cost - math.min(c(last)(0), c(last)(1))) < 1e-3, s"$tpe cost")
      // structural sanity: every burst episode has at least one day
      assert(bd >= nb)
    }
    assert(out.keySet == daily.keySet)
  }

  // ---- dedup_cdc_chunks ---------------------------------------------------

  test("dedup_cdc_chunks: coverage, shift resistance, and driver replay") {
    import graft.operators.Dedup
    import graft.sources.Tables
    val out = Dedup.dedupCdcChunks.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(out.length == 20)

    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))

    // partition/coverage: chunk lengths within [min, max], sum == |doc|
    docs.take(50).foreach { case (_, b) =>
      val ch = Dedup.cdcChunks(b)
      assert(ch.map(_._2).sum == b.length)
      ch.dropRight(1).foreach { case (_, len) => assert(len >= 16 && len <= 256) }
    }

    // THE CDC property: a prefix insertion leaves the chunk-hash tail
    // intact (fixed-window chunking would shift every boundary).
    // Demonstrated on a constructed 8 KiB payload — the corpus docs
    // are ≤558 bytes (2–5 chunks), too short to carry the property.
    val synth = {
      var z = 42L
      Array.fill(8192) {
        z += 0x9e3779b97f4a7c15L
        var x = z
        x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
        x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
        ((x ^ (x >>> 31)) & 0xff).toByte
      }
    }
    val orig = Dedup.cdcChunks(synth).map(_._1)
    assert(orig.length > 50, s"expected many chunks, got ${orig.length}")
    val edited = Dedup.cdcChunks("INSERTED>".getBytes("UTF-8") ++ synth).map(_._1)
    val common = orig.toSet & edited.toSet
    assert(common.size >= orig.length - 4,
      s"shift resistance: ${common.size} of ${orig.length} chunks survive")

    // full replay of the dup-share rollup
    val all = docs.flatMap { case (id, b) =>
      Dedup.cdcChunks(b).map { case (h, len) => (id, h, len) }
    }
    val occ = all.groupBy(_._2).map { case (h, c) => h -> c.length }
    val shares = all.groupBy(_._1).map { case (id, ch) =>
      val dup = ch.filter(c => occ(c._2) > 1)
      // same HALF_UP-on-decimal-string rounding as Spark's round()
      val share = BigDecimal(dup.map(_._3).sum.toDouble / ch.map(_._3).sum)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, ch.length, dup.length, share)
    }
    val expect = shares.toSeq.sortBy(t => (-t._4, t._1)).take(20)
    assert(out.toSeq == expect, s"top-20 mismatch")
  }

  // ---- ts_rolling_median / pipeline_soft_dedup / graph_powerlaw ----------

  test("ts_rolling_median: window medians match a driver sort") {
    import graft.operators.TimeSeries
    val rows = TimeSeries.tsRollingMedian.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (_, series) =>
      val s = series.sortBy(_._2)
      s.indices.foreach { i =>
        val win = s.slice(math.max(0, i - 3), math.min(s.length, i + 4)).map(_._3)
        val sorted = win.sorted.map(_.toDouble)
        val med =
          if (sorted.length % 2 == 1) sorted(sorted.length / 2)
          else (sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)) / 2
        assert(math.abs(s(i)._4 - med) < 1e-9, s"row $i: ${s(i)._4} vs $med")
      }
    }
  }

  test("pipeline_soft_dedup: every duplicate group contributes one effective doc") {
    import graft.operators.Curation
    import graft.sources.Tables
    val out = Curation.pipelineSoftDedup.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val nDocs = Tables.documents(spark, sf).count()
    val nTexts = Tables.documents(spark, sf).select("text").distinct().count()
    assert(out.length == nDocs)
    out.foreach { case (_, m, w) =>
      val expect = BigDecimal(1.0 / m)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(m >= 1 && math.abs(w - expect) < 1e-9)
    }
    // Σ weights == distinct texts (each group sums to m · 1/m = 1),
    // up to the 4dp weight rounding accumulated over n docs
    val total = out.map(_._3).sum
    assert(math.abs(total - nTexts) < nDocs * 1e-4 + 1e-6, s"$total vs $nTexts")
  }

  // ---- kmeans_spherical ---------------------------------------------------

  test("kmeans_spherical: unit centroids, monotone objective, conservation") {
    import graft.operators.KMeans
    import graft.sources.Tables
    val (cs, sizes, cos, traj) = KMeans.sphericalFit(spark, sf, 8, iters = 3)
    cs.foreach { c =>
      assert(math.abs(c.map(x => x * x).sum - 1.0) < 1e-9, "centroid not unit")
    }
    // alternating maximization: avg max-cosine never decreases
    traj.sliding(2).foreach { case Seq(a, b) => assert(b >= a - 1e-9, traj) }
    assert(sizes.sum == Tables.embeddings(spark, sf).count())
    cos.zip(sizes).foreach { case (mc, n) =>
      if (n > 0) assert(mc >= -1.0 - 1e-9 && mc <= 1.0 + 1e-9)
    }
    // determinism of the exposed query
    val q = KMeans.kmeansSpherical.fn(spark, sf).collect().toSeq
    assert(q == KMeans.kmeansSpherical.fn(spark, sf).collect().toSeq)
    assert(q.length == 8)
  }

  // ---- text_compressibility -----------------------------------------------

  test("text_compressibility: JDK replay and redundancy ordering") {
    import graft.operators.TextAnalysis
    import graft.sources.Tables
    val out = TextAnalysis.textCompressibility.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    val deflater = new java.util.zip.Deflater(6)
    val buf = new Array[Byte](1 << 16)
    docs.foreach { case (id, b) =>
      val n = TextAnalysis.deflatedSize(deflater, buf, b)
      val (raw, comp, ratio) = out(id)
      assert(raw == b.length && comp == n)
      assert(math.abs(ratio - math.round(n.toDouble / b.length * 1e4) / 1e4) < 1e-9)
    }
    assert(out.keySet == docs.map(_._1).toSet)
    // redundancy ordering on constructed payloads: pure repetition ≪
    // natural-ish text < high-entropy bytes (which deflate EXPANDS)
    def ratioOf(b: Array[Byte]) =
      TextAnalysis.deflatedSize(deflater, buf, b).toDouble / b.length
    val rep = ratioOf(Array.fill(4096)('a'.toByte))
    var z = 7L
    val rnd = Array.fill(4096) {
      z ^= z << 13; z ^= z >>> 7; z ^= z << 17; (z & 0xff).toByte
    }
    assert(rep < 0.05, s"repetitive ratio $rep")
    assert(ratioOf(rnd) > 0.9, "high-entropy payload should not compress")
  }

  // ---- mining_quantile_reg --------------------------------------------------

  test("mining_quantile_reg: coverage, ordering, loss descent, replay") {
    import graft.operators.Linkage
    import graft.sources.Tables
    val out = Linkage.miningQuantileReg.fn(spark, sf).collect()
      .map(r => r.getDouble(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(0.5, 0.9))

    val pts = Tables.lineitem(spark, sf)
      .select(col("l_quantity"), col("l_extendedprice")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    // coverage: ≈τ of the corpus lies below each fitted line
    out.foreach { case (tau, (a, b)) =>
      val below = pts.count { case (x, y) => y < a + b * x }.toDouble / pts.length
      assert(math.abs(below - tau) < 0.05, s"tau $tau coverage $below")
    }
    // the p90 line sits above the median line across the data range
    val (a5, b5) = out(0.5); val (a9, b9) = out(0.9)
    Seq(1.0, 25.0, 50.0).foreach { x =>
      assert(a9 + b9 * x > a5 + b5 * x, s"p90 below median at x=$x")
    }
    // sequential replay of the standardized subgradient trajectory
    val n = pts.length
    val mx = pts.map(_._1).sum / n
    val my = pts.map(_._2).sum / n
    val sx = math.sqrt(pts.map(p => (p._1 - mx) * (p._1 - mx)).sum / (n - 1))
    val sy = math.sqrt(pts.map(p => (p._2 - my) * (p._2 - my)).sum / (n - 1))
    val std = pts.map { case (x, y) => ((x - mx) / sx, (y - my) / sy) }
    Seq(0.5, 0.9).foreach { tau =>
      var (a, b) = (0.0, 0.0)
      var lossFirst = Double.NaN
      for (step <- 1 to 30) {
        if (step == 1) lossFirst = std.map { case (x, y) =>
          val r = y - (a + b * x); if (r >= 0) tau * r else (tau - 1) * r
        }.sum / n
        val gs = std.map { case (x, y) =>
          val g = if (y < a + b * x) 1.0 - tau else -tau
          (g, g * x)
        }
        a -= 0.5 * gs.map(_._1).sum / n
        b -= 0.5 * gs.map(_._2).sum / n
      }
      val lossLast = std.map { case (x, y) =>
        val r = y - (a + b * x); if (r >= 0) tau * r else (tau - 1) * r
      }.sum / n
      assert(lossLast < lossFirst, s"pinball loss did not improve at $tau")
      val slope = b * sy / sx
      val icept = my + sy * a - slope * mx
      val (ga, gb) = out(tau)
      assert(math.abs(ga - icept) < math.max(1.0, math.abs(icept) * 1e-3),
        s"tau $tau intercept $ga vs $icept")
      assert(math.abs(gb - slope) < math.max(0.01, math.abs(slope) * 1e-3),
        s"tau $tau slope $gb vs $slope")
    }
  }

  // ---- src_partition_overwrite -------------------------------------------

  test("src_partition_overwrite: only the backfilled partitions change") {
    import graft.sources.SourceOps
    import graft.sources.Tables
    val out = SourceOps.srcPartitionOverwrite.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val daily = Tables.events(spark, sf)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
    val expectBefore = daily.groupBy("day").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val backfilled = expectBefore.keys.toSeq.sorted.take(2).toSet
    val expectAfter = daily
      .filter(xxhash64(col("user_id")) % 10 =!= 0)
      .groupBy("day").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == expectBefore.keySet)
    out.foreach { case (day, (before, after)) =>
      assert(before == expectBefore(day), s"$day before")
      if (backfilled(day)) assert(after == expectAfter(day), s"$day after")
      else assert(after == before, s"untouched $day changed: $before -> $after")
    }
  }

  // ---- graph_landmark_dist -------------------------------------------------

  test("graph_landmark_dist: upper bound on exact BFS, exact through landmarks") {
    import graft.operators.Graph
    val out = Graph.graphLandmarkDist.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1 else r.getInt(2)))
    assert(out.length == 20)

    val raw = Graph.repeatTradeEdges(spark, sf).collect()
      .map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1))
    val adj = (raw ++ raw.map(_.swap)).groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._2).distinct }
    def bfs(src: Long): Map[Long, Int] = {
      val dist = scala.collection.mutable.Map(src -> 0)
      var frontier = List(src)
      var d = 0
      while (frontier.nonEmpty) {
        d += 1
        frontier = frontier.flatMap(n => adj.getOrElse(n, Array.empty[Long]))
          .distinct.filterNot(dist.contains)
        frontier.foreach(n => dist(n) = d)
      }
      dist.toMap
    }
    // landmarks: top-degree suppliers (degree, id) — same rule
    val landmarks = adj.toSeq.filter(_._1 % 2 == 1)
      .sortBy { case (n, nb) => (-nb.length, n) }.take(4).map(_._1)
    val lDist = landmarks.map(l => l -> bfs(l)).toMap
    out.foreach { case (u, v, est) =>
      // the engine relaxes 6 rounds: distances beyond that are null
      val viaLandmarks = landmarks.flatMap { l =>
        for (a <- lDist(l).get(u) if a <= 6;
             b <- lDist(l).get(v) if b <= 6) yield a + b
      }
      val expect = if (viaLandmarks.isEmpty) -1 else viaLandmarks.min
      assert(est == expect, s"pair ($u,$v): $est vs $expect")
      if (est >= 0) {
        val exact = bfs(u).getOrElse(v, Int.MaxValue)
        assert(est >= exact, s"estimate below true distance for ($u,$v)")
      }
    }
  }

  // ---- q_sample_estimate -----------------------------------------------------

  test("q_sample_estimate: CI brackets the exact total, deterministic") {
    import graft.operators.RelationalMore
    import graft.sources.Tables
    val r = RelationalMore.qSampleEstimate.fn(spark, sf).collect()(0)
    val (n, est, lo, hi) = (r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3))
    val exact = Tables.lineitem(spark, sf)
      .agg(sum(col("l_extendedprice"))).collect()(0).getDouble(0)
    assert(n > 0 && lo < hi)
    assert(lo <= exact && exact <= hi,
      s"CI [$lo, $hi] misses exact $exact (est $est)")
    val again = RelationalMore.qSampleEstimate.fn(spark, sf).collect()(0)
    assert(again.getDouble(1) == est)
  }

  // ---- ts_cpd_binseg --------------------------------------------------------

  test("ts_cpd_binseg: depth-1 agrees with ts_cusum, significance rule holds") {
    import graft.operators.TimeSeries
    import graft.sources.Tables
    val all = TimeSeries.tsCpdBinseg.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getInt(2), r.getDouble(3),
        r.getBoolean(4)))
    // never vacuous: every type emits at least its depth-1 best
    // candidate (accepted or rejected)
    assert(all.nonEmpty, "binseg must emit a row per type even with no change")
    all.filter(!_._5).foreach { case (_, _, depth, stat, _) =>
      assert(depth == 1, "rejected candidates are only reported at depth 1")
      assert(stat >= 0.0, s"rejected row must carry its statistic: $stat")
    }
    val out = all.filter(_._5).map(t => (t._1, t._2, t._3, t._4))
    out.foreach { case (_, _, depth, stat) =>
      assert(depth >= 1 && depth <= 3)
      assert(stat > 1.358, s"reported split below the significance bound: $stat")
    }
    // depth-1 split must be the interior argmax of |CUSUM| per type
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      .groupBy(_._1)
    daily.foreach { case (tpe, rows) =>
      val series = rows.sortBy(_._2.getTime).map(t => (t._2, t._3.toDouble))
      val xs = series.map(_._2)
      val len = xs.length
      val mu = xs.sum / len
      val sd = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / (len - 1))
      var s = 0.0
      var best = -1
      var bestAbs = 0.0
      for (i <- 0 until len - 1) {
        s += (xs(i) - mu) / sd
        if (math.abs(s) > bestAbs) { bestAbs = math.abs(s); best = i }
      }
      val firstSplit = out.filter(t => t._1 == tpe && t._3 == 1)
      if (firstSplit.nonEmpty) {
        assert(best >= 6 && best < len - 7, s"$tpe split not interior")
        assert(firstSplit.head._2 == series(best)._1,
          s"$tpe depth-1 split disagrees with the CUSUM argmax")
      } else {
        val stat = bestAbs / math.sqrt(len.toDouble)
        assert(stat <= 1.358 || best < 6 || best >= len - 7,
          s"$tpe: significant interior split exists but was not reported")
        // the rejected row still reports the argmax candidate
        val rejected = all.filter(t => t._1 == tpe && !t._5)
        assert(rejected.length == 1, s"$tpe: expected one rejected-best row")
        assert(rejected.head._2 == series(best)._1,
          s"$tpe rejected candidate disagrees with the CUSUM argmax")
      }
    }
  }

  test("ts_cpd_binseg: planted level shift found at the exact boundary; flat series rejects") {
    import graft.operators.TimeSeries
    val day0 = java.sql.Timestamp.valueOf("1995-01-01 00:00:00")
    def day(i: Int) = new java.sql.Timestamp(day0.getTime + i * 86400000L)
    // 60 days at level 10, then 60 at level 30, mild deterministic ripple
    val series = (0 until 120).map { i =>
      val level = if (i < 60) 10.0 else 30.0
      (day(i), level + (i % 5) * 0.1)
    }.toArray
    val res = TimeSeries.binsegSplits(series)
    val depth1 = res.filter(t => t._4 && t._2 == 1)
    assert(depth1.length == 1, s"planted shift must be detected once: $res")
    assert(depth1.head._1 == day(59),
      s"split at ${depth1.head._1}, want ${day(59)} (last day of regime 1)")
    assert(depth1.head._3 > 1.358)
    // a flat (rippled) series yields exactly one rejected depth-1 row
    val flat = (0 until 60).map(i => (day(i), 5.0 + (i % 3) * 0.01)).toArray
    val flatRes = TimeSeries.binsegSplits(flat)
    assert(flatRes.length == 1 && !flatRes.head._4 && flatRes.head._2 == 1,
      s"flat series must emit one rejected candidate: $flatRes")
  }

  // ---- events_attribution_markov --------------------------------------------

  test("events_attribution_markov: planted chain exact, credits conserve") {
    import graft.operators.EventOps
    // planted chain: start→A (all), A→conv 60%, A→null 40%
    val planted = Map(
      ("start", "A") -> 100L, ("A", "conv") -> 60L, ("A", "null") -> 40L)
    assert(math.abs(EventOps.convProbability(planted, Set.empty) - 0.6) < 1e-12)
    assert(EventOps.convProbability(planted, Set("A")) == 0.0)
    // a two-hop chain: start→A→B→conv; removing B kills conversion,
    // removing a non-participant changes nothing
    val chain = Map(("start", "A") -> 10L, ("A", "B") -> 10L,
      ("B", "conv") -> 5L, ("B", "null") -> 5L)
    assert(math.abs(EventOps.convProbability(chain, Set.empty) - 0.5) < 1e-12)
    assert(EventOps.convProbability(chain, Set("B")) == 0.0)
    assert(math.abs(EventOps.convProbability(chain, Set("C")) - 0.5) < 1e-12)

    val out = EventOps.eventsAttributionMarkov.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(out.map(_._1).toSeq == Seq("click", "error", "signup", "view"))
    out.foreach { case (_, re, credit) =>
      assert(re >= 0.0 && re <= 1.0)
      assert(credit >= 0.0)
    }
    // credits normalize the removal effects over total conversions
    val counts = EventOps.journeyTransitions(spark, sf)
    val conversions = counts.collect { case ((_, "conv"), n) => n }.sum
    val creditSum = out.map(_._3).sum
    assert(math.abs(creditSum - conversions) < 0.05 * conversions + 1,
      s"credit sum $creditSum vs $conversions conversions")
  }

  // ---- emb_slice_drift --------------------------------------------------------

  test("emb_slice_drift: collected replay and conservation") {
    import graft.operators.Embeddings
    import graft.sources.Tables
    val out = Embeddings.embSliceDrift.fn(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toMap
    val raw = Tables.embeddings(spark, sf)
      .select(col("label"), col("embedding").cast("array<double>")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    assert(out.values.map(_._1).sum == raw.length)
    val dim = raw.head._2.length
    val gmu = Array.tabulate(dim)(j => raw.map(_._2(j)).sum / raw.length)
    raw.groupBy(_._1).foreach { case (label, rows) =>
      val mu = Array.tabulate(dim)(j => rows.map(_._2(j)).sum / rows.length)
      val shift = math.sqrt(mu.zip(gmu).map { case (a, b) => (a - b) * (a - b) }.sum)
      val (n, gotShift, cos, _) = out(label)
      assert(n == rows.length)
      assert(math.abs(gotShift - shift) < 1e-4, s"label $label shift")
      assert(cos >= -1.0 - 1e-9 && cos <= 1.0 + 1e-9)
    }
  }

  // ---- profile_psi ------------------------------------------------------------

  test("profile_psi: nonnegative terms, share conservation") {
    import graft.operators.Profile
    val out = Profile.profilePsi.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(out.nonEmpty && out.forall(t => t._1 >= 1 && t._1 <= 10))
    // (p−q)·ln(p/q) ≥ 0 always — a negative term means a binning bug
    out.foreach { case (bin, pr, pc, term) =>
      assert(term >= -1e-9, s"bin $bin negative PSI term $term")
      assert(pr > 0 && pc > 0)
    }
    // reference deciles ⇒ each ref share ≈ 0.1 and shares sum to ~1
    assert(math.abs(out.map(_._2).sum - 1.0) < 0.01)
    assert(math.abs(out.map(_._3).sum - 1.0) < 0.01)
    out.foreach { case (_, pr, _, _) => assert(math.abs(pr - 0.1) < 0.05) }
  }

  // ---- ts_harmonic ------------------------------------------------------------

  test("ts_harmonic: residual orthogonality and variance decomposition") {
    import graft.operators.TimeSeries
    import graft.sources.Tables
    val out = TimeSeries.tsHarmonic.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("y"))
      .withColumn("t", datediff(col("day"), to_date(lit("1992-01-01"))))
      .select("event_type", "t", "y")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1)
    daily.foreach { case (tpe, rows) =>
      val (level, amp, phase, r2) = out(tpe)
      assert(amp >= 0 && phase >= -math.Pi - 1e-9 && phase <= math.Pi + 1e-9)
      assert(r2 >= 0 && r2 <= 1)
      // reconstruct β from (amp, phase): β₁ = amp·cos(φ), β₂ = amp·sin(φ)
      val b1 = amp * math.cos(phase)
      val b2 = amp * math.sin(phase)
      val resid = rows.map { case (_, t, y) =>
        val w = 2 * math.Pi * t / 7
        (y - (level + b1 * math.sin(w) + b2 * math.cos(w)), math.sin(w),
          math.cos(w))
      }
      val n = resid.length
      // OLS residuals are orthogonal to every design column
      assert(math.abs(resid.map(_._1).sum / n) < 0.05, s"$tpe intercept resid")
      assert(math.abs(resid.map(r => r._1 * r._2).sum / n) < 0.05, s"$tpe sin")
      assert(math.abs(resid.map(r => r._1 * r._3).sum / n) < 0.05, s"$tpe cos")
      // variance decomposition: R² matches the residual SSE
      val ys = rows.map(_._3)
      val mu = ys.sum / n
      val sst = ys.map(y => (y - mu) * (y - mu)).sum
      val sse = resid.map(r => r._1 * r._1).sum
      assert(math.abs((1 - sse / sst) - r2) < 1e-2, s"$tpe r2")
    }
  }

  // ---- pipeline_temperature_mix -------------------------------------------------

  test("pipeline_temperature_mix: shares normalize, upsample is monotone") {
    import graft.operators.Curation
    val out = Curation.pipelineTemperatureMix.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-3)
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-3)
    // w ∝ n^0.3 ⇒ upsample ∝ n^-0.7 — strictly decreasing in n
    out.sortBy(_._2).map(_._5).sliding(2).foreach {
      case Array(hi, lo) => assert(hi >= lo - 1e-9, "upsample not monotone")
      case _ =>
    }
  }

  // ---- pipeline_decontaminate_bloom ---------------------------------------------

  test("pipeline_decontaminate_bloom: sound, FPP-bounded, matches exact") {
    import graft.operators.Curation
    val out = Curation.pipelineDecontaminateBloom.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // the bloom stage must never LOSE a contaminated doc
    out.values.foreach { case (_, suspect, dropped) =>
      assert(suspect >= dropped)
    }
    // false suspects bounded by the per-doc union bound (grams·fpp)
    val fp = out.values.map { case (_, s, d) => s - d }.sum
    val docs = out.values.map(_._1).sum
    assert(fp <= 0.05 * docs + 2, s"$fp false suspects over $docs docs")
    // the exact drop counts equal the broadcast-exact operator's
    val exact = Curation.pipelineDecontaminate.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    out.foreach { case (src, (_, _, dropped)) =>
      assert(dropped == exact(src), s"$src: $dropped vs exact ${exact(src)}")
    }
  }

  // ---- events_synthetic_control ----------------------------------------------

  test("events_synthetic_control: null intervention stays within noise") {
    import graft.operators.EventOps
    import graft.sources.Tables
    val r = EventOps.eventsSyntheticControl.fn(spark, sf).collect()(0)
    val (nPre, nPost, beta, cum, se, z) = (r.getInt(0), r.getInt(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val days = Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "view"))
      .select(date_trunc("day", col("ts"))).distinct().count()
    assert(nPre + nPost == days)
    assert(se > 0)
    // views and purchases are both driven by daily traffic volume
    assert(beta > 0, s"control series uncorrelated: beta=$beta")
    // no intervention exists in the synthetic corpus → the effect is
    // statistical noise; |z| beyond 4 would mean the counterfactual
    // machinery is broken
    assert(math.abs(z) < 4, s"null-case z=$z (cum=$cum, se=$se)")
  }

  // ---- ts_wavelet -------------------------------------------------------------

  test("ts_wavelet: Parseval identity and driver cascade replay") {
    import graft.operators.TimeSeries
    import graft.sources.Tables
    val out = TimeSeries.tsWavelet.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getInt(1),
        (2 to 7).map(r.getDouble).toArray)).toMap
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("n")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2)))
      .groupBy(_._1)
    daily.foreach { case (tpe, rows) =>
      val xs0 = rows.sortBy(_._2).map(_._3)
      val pow2 = 1 << math.ceil(math.log(xs0.length) / math.log(2)).toInt
      var xs = xs0 ++ Array.fill(pow2 - xs0.length)(0.0)
      val (nDays, energies) = out(tpe)
      assert(nDays == xs0.length)
      var total = 0.0
      for (l <- 0 until 5) {
        val smooth = Array.tabulate(xs.length / 2)(i =>
          (xs(2 * i) + xs(2 * i + 1)) / math.sqrt(2))
        val detail = Array.tabulate(xs.length / 2)(i =>
          (xs(2 * i) - xs(2 * i + 1)) / math.sqrt(2))
        val e = detail.map(x => x * x).sum
        assert(math.abs(energies(l) - e) < 1e-2, s"$tpe level ${l + 1}")
        total += e
        xs = smooth
      }
      total += xs.map(x => x * x).sum
      assert(math.abs(energies(5) - xs.map(x => x * x).sum) < 1e-2)
      // Parseval: total coefficient energy equals the input energy
      val inputEnergy = xs0.map(x => x * x).sum
      assert(math.abs(total - inputEnergy) < 1e-4 * inputEnergy + 1e-2,
        s"$tpe Parseval: $total vs $inputEnergy")
    }
  }

  // ---- mining_conformal ---------------------------------------------------------

  test("mining_conformal: held-out coverage within binomial noise of 90%") {
    import graft.operators.Linkage
    val r = Linkage.miningConformal.fn(spark, sf).collect()(0)
    val (nTrain, nCal, nTest, q, cov) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getDouble(4), r.getDouble(5))
    import graft.sources.Tables
    val total = Tables.lineitem(spark, sf).count()
    assert(nTrain + nCal + nTest == total, "splits must partition the corpus")
    assert(q > 0)
    // split-conformal guarantee: coverage ≈ 1−α; 4σ binomial noise
    val tol = 4 * math.sqrt(0.1 * 0.9 / nTest) + 2.0 / nCal
    assert(math.abs(cov - 0.9) < tol, s"coverage $cov vs 0.9 ± $tol")
  }

  // ---- graph_adamic_adar ---------------------------------------------------------

  test("graph_adamic_adar: non-edges only, exact driver replay") {
    import graft.operators.Graph
    val out = Graph.graphAdamicAdar.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    assert(out.nonEmpty, "no non-edges to predict — graph saturated")
    val edges = Graph.strongTieEdges(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    val sym = (edges ++ edges.map(_.swap)).distinct
    val adj = sym.groupBy(_._1).map { case (u, es) => u -> es.map(_._2).toSet }
    val edgeSet = sym.toSet
    out.foreach { case (u, v, aa, nc) =>
      assert(!edgeSet((u, v)) && !edgeSet((v, u)), s"($u,$v) is an edge")
      assert(aa > 0 && nc >= 1)
      // exact recompute of the score
      val common = (adj(u) & adj(v)).filter(z => adj(z).size > 1)
      val expect = math.floor(common.toSeq.map(z =>
        1.0 / math.log(adj(z).size)).sum * 10000 + 0.5) / 10000
      assert(math.abs(aa - expect) < 1e-9, s"($u,$v): $aa vs $expect")
      assert(nc == common.size)
    }
  }

  // ---- text_burstiness --------------------------------------------------------

  test("text_burstiness: dispersion matches a collected recount") {
    import graft.operators.TextAnalysis
    import graft.sources.Tables
    val out = TextAnalysis.textBurstiness.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nd = docs.length
    val counts = docs.flatMap { case (id, t) =>
      "[a-z]+".r.findAllIn(t.toLowerCase).map(w => (w, id))
    }.groupBy(identity).toSeq.map { case ((w, _), xs) => (w, xs.length) }
      .groupBy(_._1)
    out.foreach { case (word, nDocs, nTokens, disp) =>
      val cs = counts(word).map(_._2).toArray
      assert(nDocs == cs.length && nDocs >= 20)
      assert(nTokens == cs.sum)
      val s1 = cs.sum.toDouble
      val s2 = cs.map(c => c.toDouble * c).sum
      val expect = (s2 - s1 * s1 / nd) / (nd - 1) / (s1 / nd)
      assert(math.abs(disp - expect) < 1e-3, s"$word: $disp vs $expect")
      assert(disp > 0)
    }
  }

  // ---- profile_inclusion ---------------------------------------------------------

  test("profile_inclusion: FK candidates accepted, planted negative rejected") {
    import graft.operators.Profile
    val out = Profile.profileInclusion.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    // the star schema's real foreign keys must all hold exactly
    Seq("lineitem.l_orderkey<orders.o_orderkey",
      "lineitem.l_partkey<part.p_partkey",
      "lineitem.l_suppkey<supplier.s_suppkey",
      "orders.o_custkey<customer.c_custkey",
      "events.user_id<customer.c_custkey").foreach { c =>
      val (n, m, inc) = out(c)
      assert(n > 0 && m == 0 && inc, s"$c should be an inclusion dependency")
    }
    // the planted negative: only a tenth of customers appear as users
    val (n, m, inc) = out("customer.c_custkey<events.user_id")
    assert(m > 0 && !inc, s"expected customers missing from users, $m of $n")
  }

  // ---- events_sbg_retention --------------------------------------------------------

  test("events_sbg_retention: monotone curves, grid MLE is a local optimum") {
    import graft.operators.EventOps
    val out = EventOps.eventsSbgRetention.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.map(_._1).toSeq == (0 to 14))
    assert(out.head._2 == 1.0 && out.head._3 == 1.0)
    out.map(_._2).sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-9) }
    out.map(_._3).sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-9) }
    val (alpha, beta) = (out.head._4, out.head._5)
    assert(alpha > 0 && beta > 0)
    // the fit tracks the observed curve (sBG is flexible enough for
    // a mixed-geometric streak distribution)
    val mae = out.map(t => math.abs(t._2 - t._3)).sum / out.length
    assert(mae < 0.08, s"sBG fit MAE $mae") // model-mismatch bound: daily streaks are only approximately sBG
  }

  // ---- q_join_size_estimate ---------------------------------------------------------

  test("q_join_size_estimate: both inner products within sampling tolerance") {
    import graft.operators.RelationalMore
    import graft.sources.Tables
    val out = RelationalMore.qJoinSizeEstimate.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // exact inner products
    val li = Tables.lineitem(spark, sf)
    val exactFk = li.count() // PK-FK: every line matches exactly one order
    val pc = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c"))).collect()(0).getLong(0)
    val (nk1, est1) = out("lineitem*orders/orderkey")
    val (nk2, est2) = out("lineitem*lineitem/partkey")
    assert(nk1 > 0 && nk2 > 0)
    // keyspace sampling at 1/16: relative error ~ sqrt(16/n_keys);
    // generous 3-sigma bounds for the fixed deterministic draw
    assert(math.abs(est1 - exactFk).toDouble / exactFk < 0.5,
      s"FK join: $est1 vs $exactFk")
    assert(math.abs(est2 - pc).toDouble / pc < 0.5,
      s"self join: $est2 vs $pc")
  }

  // ---- events_offpolicy_ips --------------------------------------------------------

  test("events_offpolicy_ips: logging identity and target-policy replay") {
    import graft.operators.EventOps
    import graft.sources.Tables
    val out = EventOps.eventsOffpolicyIps.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val n = ev.length.toDouble
    // identity: IPS of the logging policy IS the observed mean reward
    val observed = ev.map(_._3).sum / n
    assert(math.abs(out("logging")._1 - observed) < 1e-3)
    // replay the deterministic user-mode policy estimate
    val p = ev.groupBy(_._2).map { case (a, xs) => a -> xs.length / n }
    val rec = ev.groupBy(_._1).map { case (u, xs) =>
      u -> xs.groupBy(_._2).toSeq.map { case (a, ys) => (ys.length, a) }.max._2
    }
    val ws = ev.map { case (u, a, r) =>
      (if (rec(u) == a) 1.0 / p(a) else 0.0, r)
    }
    val ips = ws.map { case (w, r) => w * r }.sum / n
    val snips = ws.map { case (w, r) => w * r }.sum / ws.map(_._1).sum
    val ess = math.pow(ws.map(_._1).sum, 2) / ws.map(w => w._1 * w._1).sum
    val (gIps, gSnips, gEss) = out("user_mode")
    assert(math.abs(gIps - ips) < 1e-3, s"ips $gIps vs $ips")
    assert(math.abs(gSnips - snips) < 1e-3, s"snips $gSnips vs $snips")
    assert(math.abs(gEss - ess) < 0.2 + ess * 1e-3, s"ess $gEss vs $ess")
    assert(gEss > 0 && gEss <= n)
  }

  // ---- text_heaps_law ----------------------------------------------------------

  test("text_heaps_law: checkpoint recount and sublinear growth") {
    import graft.operators.TextAnalysis
    import graft.sources.Tables
    val out = TextAnalysis.textHeapsLaw.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 8)
    val beta = out.head._4
    // natural-language-ish corpora grow vocabulary sublinearly
    assert(beta > 0 && beta < 1, s"Heaps beta $beta")
    // recount one interior checkpoint exactly from the collected corpus
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (_, nDocs, vocab, _) = out(4) // the 1/8 checkpoint
    val sortedIds = docs.map(_._1).sorted
    val cutoff = sortedIds(math.min(nDocs.toInt - 1, sortedIds.length - 1))
    val prefixVocab = docs.filter(_._1 <= cutoff)
      .flatMap { d =>
        val toks = "[a-z]+".r.findAllIn(d._2.toLowerCase).toArray
        toks.sliding(3).filter(_.length == 3).map(_.mkString(" "))
      }.toSet.size
    assert(vocab == prefixVocab, s"checkpoint vocab $vocab vs $prefixVocab")
    // monotone growth in both coordinates
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2 && b._3 >= a._3)
      case _ =>
    }
  }

  // ---- ts_ljung_box ------------------------------------------------------------

  test("ts_ljung_box: statistic replay and chi-square tail identity") {
    import graft.operators.TimeSeries
    import graft.sources.Tables
    val out = TimeSeries.tsLjungBox.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4))).toMap
    // closed-form chi-square tail sanity at known points: df=2 →
    // P(X>q) = e^{−q/2}
    assert(math.abs(TimeSeries.chiSqUpperEvenDf(2.0, 2) - math.exp(-1.0)) < 1e-12)
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("n")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2)))
      .groupBy(_._1)
    daily.foreach { case (tpe, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      val n = xs.length.toDouble
      val mu = xs.sum / n
      // exact textbook sample autocorrelation on the CENTERED series
      val xc = xs.map(_ - mu)
      val s2 = xc.map(x => x * x).sum
      val q = (1 to 10).map { k =>
        val rk = xc.drop(k).zip(xc.dropRight(k)).map(t => t._1 * t._2).sum / s2
        rk * rk / (n - k)
      }.sum * n * (n + 2)
      val (nd, gq, gp, rej) = out(tpe)
      assert(nd == xs.length)
      assert(math.abs(gq - q) < 1e-2, s"$tpe Q: $gq vs $q")
      assert(math.abs(gp - TimeSeries.chiSqUpperEvenDf(q, 10)) < 1e-4)
      assert(rej == (gp < 0.05))
      assert(gp >= 0 && gp <= 1)
    }
  }

  test("graph_powerlaw: MLE replay from collected degrees") {
    import graft.operators.Graph
    val r = Graph.graphPowerlaw.fn(spark, sf).collect()(0)
    val (n, dmin, dmax, alpha, sigma) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
    val degs = Graph.tradeEdges(spark, sf).collect()
      .map(t => (t.getLong(1))).groupBy(identity).map(_._2.length)
      .filter(_ >= 5).toArray
    assert(n == degs.length && dmin == 5 && dmax == degs.max)
    val s = degs.map(d => math.log(d / 4.5)).sum
    assert(math.abs(alpha - (1.0 + n / s)) < 1e-3)
    assert(math.abs(sigma - (n / s) / math.sqrt(n.toDouble)) < 1e-3)
    assert(alpha > 1.0 && sigma > 0.0)
  }
}
