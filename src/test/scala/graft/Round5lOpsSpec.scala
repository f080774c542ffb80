package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Graph, KMeans, Retrieval, Similarity, TimeSeries}
import graft.sources.Tables

/** Invariant pins for the round-5 session-12 operators. */
class Round5lOpsSpec extends AnyFunSuite {
  import TestSpark._

  // ---- graph_matching -------------------------------------------------

  test("graph_matching: valid, maximal, subset-of-edges") {
    val m = Graph.graphMatching.fn(spark, sf)
      .select("custkey", "suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(m.nonEmpty)
    // matching validity: no endpoint appears twice on either side
    assert(m.map(_._1).distinct.length == m.length, "customer matched twice")
    assert(m.map(_._2).distinct.length == m.length, "supplier matched twice")
    // subset: every matched pair is a real trade edge
    val edges = Graph.tradeEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m.forall(edges.contains), "matched pair not an edge")
    // maximality == drain-to-empty within MatchRounds: every edge has
    // a matched endpoint (no edge could still be added)
    val mc = m.map(_._1).toSet
    val ms = m.map(_._2).toSet
    val uncovered = edges.filterNot(e => mc(e._1) || ms(e._2))
    assert(uncovered.isEmpty,
      s"${uncovered.size} edges uncovered — matching not maximal, raise MatchRounds")
  }

  test("graph_matching: deterministic rerun") {
    val a = Graph.graphMatching.fn(spark, sf).collect().map(_.toString).sorted
    val b = Graph.graphMatching.fn(spark, sf).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  // ---- ts_sax ---------------------------------------------------------

  test("ts_sax: 8-letter words over the a-d alphabet, one per series") {
    val rows = TimeSeries.tsSax.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(rows.length == types, s"${rows.length} words for $types types")
    rows.foreach { r =>
      val word = r.getAs[String]("sax_word")
      assert(word.length == 8, s"word '$word' not 8 letters")
      assert(word.forall(c => c >= 'a' && c <= 'd'), s"bad alphabet in '$word'")
      assert(r.getAs[Long]("n_days") >= 8)
    }
  }

  test("ts_sax: word replays from the daily aggregate") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val words = TimeSeries.tsSax.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[String]("sax_word")).toMap
    daily.groupBy(_._1).foreach { case (et, rows) =>
      val ns = rows.sortBy(_._2).map(_._3.toDouble)
      val d = ns.length
      val mu = ns.sum / d
      val sd = math.sqrt((ns.map(x => x * x).sum * d - ns.sum * ns.sum) / (d.toDouble * d))
      val word = (0 until 8).map { b =>
        val bucket = ns.zipWithIndex.filter { case (_, t) =>
          math.floor(t * 8.0 / d).toLong == b }.map(_._1)
        val z = (bucket.sum / bucket.length - mu) / sd
        if (z < -0.6745) 'a' else if (z < 0.0) 'b' else if (z < 0.6745) 'c' else 'd'
      }.mkString
      assert(words(et) == word, s"$et: engine ${words(et)} != replay $word")
    }
  }

  // ---- text_hybrid_rrf ------------------------------------------------

  test("text_hybrid_rrf: fused list replays exactly from the two legs") {
    val fused = Retrieval.textHybridRrf.fn(spark, sf).collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getDouble(3)))
    assert(fused.length == 10)
    val lex = Retrieval.textBm25.fn(spark, sf).collect()
      .map(_.getLong(0)).zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    val e = Similarity.vectors(spark, sf)
    val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val den = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"), round(Similarity.cosine(col("v"), col("qv")), 4).as("cs"))
      .orderBy(col("cs").desc, col("vec_id")).limit(20).collect()
      .map(_.getLong(0)).zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    val expect = (lex.keySet ++ den.keySet).toSeq.map { id =>
      val rrf = lex.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        den.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, lex.get(id), den.get(id),
        BigDecimal(rrf).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(10)
    assert(fused.toSeq == expect,
      s"fused ${fused.toSeq.take(3)}... != replay ${expect.take(3)}...")
  }

  // ---- pipeline_dsir --------------------------------------------------

  test("pipeline_dsir: smoothed target-vs-raw KL is non-negative") {
    val (model, _, bigT, bigR) = Curation.dsirModel(spark, sf)
    val b = Curation.DsirBuckets
    val rows = model.collect().map(r => (r.getLong(1), r.getLong(2)))
    // smoothed distributions over the full bucket space (unseen
    // buckets contribute the same 0.5 mass to both sides)
    val seenT = rows.map(_._1).sum; val seenR = rows.map(_._2).sum
    assert(seenT == bigT && seenR == bigR)
    val denT = bigT + 0.5 * b; val denR = bigR + 0.5 * b
    val klSeen = rows.map { case (ct, cr) =>
      val pt = (ct + 0.5) / denT; val pr = (cr + 0.5) / denR
      pt * math.log(pt / pr)
    }.sum
    val unseen = b - rows.length
    val klUnseen = unseen * (0.5 / denT) * math.log((0.5 / denT) / (0.5 / denR))
    assert(klSeen + klUnseen >= -1e-12, s"KL ${klSeen + klUnseen} < 0")
  }

  test("pipeline_dsir: selection replays exactly; deterministic") {
    val out = Curation.pipelineDsir.fn(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf)
      .filter(length(regexp_replace(lower(col("text")), "[^a-z]", "")) > 0).count()
    assert(out.length == math.min(Curation.DsirK.toLong, nDocs))
    // exact replay: recompute log-weights locally with the SAME
    // sorted-feature fold and the same Gumbel keys
    val (model, _, _, _) = Curation.dsirModel(spark, sf)
    val ratios = model.collect().map(r => r.getLong(0) -> r.getAs[Double]("r")).toMap
    val feats = Curation.dsirDocFeatures(Tables.documents(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val logw = feats.groupBy(_._1).map { case (id, fs) =>
      id -> fs.sortBy(_._2).map { case (_, f, c) => c * ratios(f) }
        .foldLeft(0.0)(_ + _)
    }
    import spark.implicits._
    val us = logw.keys.toSeq.toDF("doc_id")
      .select(col("doc_id"),
        ((shiftrightunsigned(xxhash64(col("doc_id"), lit(11)), 11) + 1L)
          .cast("double") / lit(9007199254740992.0)).as("u"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val keyed = logw.toSeq.map { case (id, w) =>
      (id, w, w - math.log(-math.log(us(id))))
    }
    val expect = keyed.sortBy { case (id, _, k) => (-k, id) }
      .take(Curation.DsirK).map(_._1).toSet
    assert(out.map(_.getLong(0)).toSet == expect)
    val again = Curation.pipelineDsir.fn(spark, sf).collect().map(_.toString)
    assert(out.map(_.toString).sameElements(again))
  }

  // ---- kmeans_parallel ------------------------------------------------

  test("kmeans_parallel: k centroids, candidate bound, beats line init") {
    val pts = KMeans.points(Tables.lineitem(spark, sf)).select("x", "y").persist()
    try {
      val l = 2 * KMeans.K
      val (init, nCands) = KMeans.parallelInit(pts, KMeans.K, l, rounds = 3)
      assert(init.length == KMeans.K)
      assert(init.distinct.length == KMeans.K, "duplicate centroids")
      assert(nCands >= KMeans.K, s"only $nCands candidates")
      assert(nCands <= 1 + 3 * 4 * l, s"$nCands candidates blows the bound")
      def costOf(cs: Array[(Double, Double)]): Double =
        pts.agg(sum(KMeans.minDistExpr(cs, col("x"), col("y")))).collect()(0).getDouble(0)
      val finPar = KMeans.iterate(pts, init, 3).toSeq.sortBy(_._1).map(_._2).toArray
      val finLine = KMeans.iterate(pts,
        KMeans.initCentroids(KMeans.points(Tables.lineitem(spark, sf))), 3)
        .toSeq.sortBy(_._1).map(_._2).toArray
      val (cp, cl) = (costOf(finPar), costOf(finLine))
      assert(cp <= cl * 1.05, s"parallel-init cost $cp vs line-init $cl")
    } finally pts.unpersist(false)
  }

  test("kmeans_parallel: deterministic rerun") {
    val a = KMeans.kmeansParallel.fn(spark, sf).collect().map(_.toString).toSeq
    val b = KMeans.kmeansParallel.fn(spark, sf).collect().map(_.toString).toSeq
    assert(a == b)
  }

  // ---- events_permtest ------------------------------------------------

  test("events_permtest: extreme-count replays exactly from per-user cents") {
    val out = graft.operators.EventOps.eventsPermtest.fn(spark, sf).collect()(0)
    val perUser = Tables.events(spark, sf)
      .groupBy(col("user_id"), (col("user_id") % 2).as("variant"))
      .agg(sum(when(col("event_type") === "purchase",
        round(col("value") * 100, 0).cast("long")).otherwise(0L)).as("rev"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = perUser.length
    val s1 = perUser.filter(_._2 == 1).map(_._3).sum
    val n1 = perUser.count(_._2 == 1)
    val stot = perUser.map(_._3).sum
    val num = BigInt(s1) * (n - n1) - BigInt(stot - s1) * n1
    val den = BigInt(n1) * (n - n1)
    // md5 parity identical to the engine via one vectorized query
    import spark.implicits._
    val pv = perUser.map(_._1).toSeq.flatMap(u => (0 until 200).map(b => (u, b)))
      .toDF("user_id", "b")
      .withColumn("pv", ascii(substring(md5(concat_ws(":", col("b").cast("string"),
        col("user_id").cast("string"))), 1, 1)) % 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    val revOf = perUser.map(r => r._1 -> r._3).toMap
    val c = (0 until 200).count { b =>
      val ones = perUser.map(_._1).filter(u => pv((u, b)) == 1)
      val n1b = ones.length; val s1b = ones.map(revOf).sum
      n1b > 0 && n1b < n && {
        val numB = (BigInt(s1b) * (n - n1b) - BigInt(stot - s1b) * n1b).abs
        numB * den >= num.abs * (BigInt(n1b) * (n - n1b))
      }
    }
    assert(out.getAs[Long]("n_extreme") == c,
      s"engine ${out.getAs[Long]("n_extreme")} != replay $c")
    assert(out.getAs[Long]("n_users") == n)
    val p = out.getAs[Double]("p_value")
    assert(p > 0.0 && p <= 1.0)
  }

  // ---- src_hilbert_scan -----------------------------------------------

  test("hilbert index: bijective and unit-step adjacent on the full grid") {
    val h = org.apache.spark.sql.graft.HilbertIndex(null, null, 4)
    val cells = for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong)
    val ds = cells.map { case (x, y) => (x, y) -> h.xy2d(x, y) }
    // bijection onto [0, 256)
    assert(ds.map(_._2).sorted.toSeq == (0L until 256L).toSeq)
    // the defining Hilbert property: consecutive d are ADJACENT cells
    val byD = ds.map { case ((x, y), d) => d -> (x, y) }.toMap
    (0L until 255L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"d=$d ($x1,$y1)->($x2,$y2) not adjacent")
    }
  }

  test("src_hilbert_scan: box probe opens a fraction of the layout's files") {
    import org.apache.spark.sql.functions.{input_file_name, max => fmax, min => fmin}
    val dir = graft.sources.SourceOps.hilbertLineitem(spark, sf)
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(fmin("l_partkey").as("pmin"), fmax("l_partkey").as("pmax"),
        fmin("l_suppkey").as("smin"), fmax("l_suppkey").as("smax"))
      .collect()
    val total = stats.length
    val touched = stats.count { r =>
      r.getLong(1) >= 400 && r.getLong(2) <= 600 ||
        !(r.getLong(2) < 400 || r.getLong(1) > 600 ||
          r.getLong(4) < 50 || r.getLong(3) > 80)
    }
    assert(total >= 2)
    assert(touched < total,
      s"box intersects all $total files - Hilbert layout gives no pruning")
  }

  // ---- events_bandit --------------------------------------------------

  test("events_bandit: per-step UCB argmax validity, conservation, determinism") {
    val out = graft.operators.EventOps.eventsBandit.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"), col("event_type").as("arm"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("cs"),
        count(lit(1)).as("n")).collect()
      .map(r => (r.getDate(0).toString, r.getString(1),
        r.getLong(2).toDouble / r.getLong(3)))
    val arms = daily.map(_._2).distinct.sorted
    val nDays = daily.map(_._1).distinct.length
    assert(out.length == nDays)
    // round-robin init covers every arm once
    assert(out.take(arms.length).map(_._2).toSeq == arms.toSeq)
    // per-step argmax validity recomputed from the output's own history
    val hist = scala.collection.mutable.Map(arms.map(_ -> (0, 0.0)): _*)
    out.zipWithIndex.foreach { case ((_, chosen, reward, _), i) =>
      val t = i + 1
      if (i >= arms.length) {
        def ucb(a: String): Double = {
          val (n, sm) = hist(a); sm / n + math.sqrt(2.0 * math.log(t) / n)
        }
        assert(ucb(chosen) >= arms.map(ucb).max - 1e-6,
          s"step $t chose $chosen with UCB ${ucb(chosen)} < max ${arms.map(ucb).max}")
      }
      val (n, sm) = hist(chosen)
      hist(chosen) = (n + 1, sm + reward)
    }
    // pull conservation
    assert(hist.values.map(_._1).sum == nDays)
    // cumulative regret replays as the running sum of per-day
    // (hindsight-best-arm reward − chosen reward); NOT monotone — a
    // near-tied chosen arm can beat the fixed best arm on a given day
    val byDay = daily.groupBy(_._1).view
      .mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val best = arms.maxBy { a =>
      val xs = daily.filter(_._2 == a).map(_._3); xs.sum / xs.length
    }
    var cum = 0.0
    out.foreach { case (day, chosen, _, cumOut) =>
      cum += byDay(day).getOrElse(best, 0.0) - byDay(day).getOrElse(chosen, 0.0)
      assert(math.abs(cum - cumOut) < 0.01, s"$day regret $cumOut != replay $cum")
    }
    val again = graft.operators.EventOps.eventsBandit.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(out.sameElements(again))
  }

  // ---- text_unigram_lm ------------------------------------------------

  test("text_unigram_lm: coverage, monotone Viterbi LL, logp consistency") {
    import graft.operators.TextAnalysis
    val (counts, logp, lls) = TextAnalysis.unigramFit(spark, sf)
    // coverage: every distinct corpus word segments under the vocab
    val words = TextAnalysis.uniWords(Tables.documents(spark, sf))
      .collect().map(_.getString(0))
    words.foreach { w =>
      val seg = TextAnalysis.uniViterbi(w, logp)
      assert(seg.mkString == w, s"'$w' segments to '${seg.mkString}'")
    }
    // hard-EM is monotone in the Viterbi objective (tolerance covers
    // the add-alpha smoothing and float summation noise)
    assert(lls.length == 3)
    lls.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - math.abs(a) * 1e-6, s"LL decreased: $lls")
    }
    // logp is exactly the smoothed log-frequency of the final counts
    val v = counts.size
    val tot = counts.values.map(_.toDouble).sum
    counts.foreach { case (p, n) =>
      val expect = math.log((n + 0.1) / (tot + 0.1 * v))
      assert(math.abs(logp(p) - expect) < 1e-12, s"logp($p)")
    }
    // output pieces are real substrings and deterministic across a
    // cache-cleared rerun
    val out = TextAnalysis.textUnigramLm.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty && out.length <= 30)
    out.foreach { case (p, n, _) =>
      assert(p.length > 1 && n > 0)
      assert(words.exists(_.contains(p)), s"piece '$p' not a corpus substring")
    }
    TextAnalysis.uniFitCache.clear()
    val again = TextAnalysis.textUnigramLm.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.sameElements(again))
  }
}
