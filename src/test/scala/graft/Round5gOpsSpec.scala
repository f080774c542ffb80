package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventOps, Profile, Similarity}
import graft.sources.Tables

/** Invariant pins for the round-5 session-7 operators. */
class Round5gOpsSpec extends AnyFunSuite {
  import TestSpark._

  // ---- events_cuped --------------------------------------------------

  test("events_cuped: adjustment is mean-preserving pooled and reduces pooled variance") {
    val rows = EventOps.eventsCuped.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(0L, 1L))
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.values.map(_.getLong(1)).sum == nUsers)
    // θ is fit pooled, so Σ(adjusted − post) over ALL users is exactly
    // −θ·Σ(x − mean x) = 0: the pooled weighted means must agree
    val pooledPost = rows.values.map(r => r.getDouble(2) * r.getLong(1)).sum
    val pooledAdj = rows.values.map(r => r.getDouble(3) * r.getLong(1)).sum
    assert(math.abs(pooledPost - pooledAdj) / math.abs(pooledPost) < 1e-3,
      s"pooled mean must be invariant: post=$pooledPost adj=$pooledAdj")
    // CUPED can only help in aggregate: at least one variant's variance
    // shrinks, and no variant's variance explodes
    val reds = rows.values.map(_.getDouble(4))
    assert(reds.max > 0.0, "pooled θ must explain some variance")
    assert(reds.min > -0.5, "adjustment must never blow up a variant's variance")
  }

  // ---- profile_dp_counts ---------------------------------------------

  test("profile_dp_counts: deterministic noise with the Laplace tail bound") {
    val out1 = Profile.profileDpCounts.fn(spark, sf).collect()
    val out2 = Profile.profileDpCounts.fn(spark, sf).collect()
    assert(out1.map(_.toString).sameElements(out2.map(_.toString)),
      "fixed seed ⇒ identical release on replay")
    assert(out1.forall(_.getDouble(3) == 1.0))
    // compare to the true (private) counts: every group's noise obeys
    // the Laplace tail (P(|noise| > t) = e^{-εt}; 15 ⇒ ~3e-7/group)
    val truth = Tables.customer(spark, sf)
      .groupBy(col("c_nationkey"), col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out1.length == truth.size, "release must cover every group exactly once")
    out1.foreach { r =>
      val noise = r.getLong(2) - truth((r.getInt(0), r.getString(1)))
      assert(math.abs(noise) <= 15, s"noise $noise outside the ε=1 Laplace tail")
    }
    // the mechanism must actually perturb: not every group unchanged
    val perturbed = out1.count { r =>
      r.getLong(2) != truth((r.getInt(0), r.getString(1)))
    }
    assert(perturbed > 0, "all-zero noise would be a broken mechanism")
  }

  // ---- ann_nsw -------------------------------------------------------

  test("ann_nsw: deterministic top-10 per query with ≥8/10 brute-force recall") {
    val out1 = Similarity.annNsw.fn(spark, sf).collect()
    val out2 = Similarity.annNsw.fn(spark, sf).collect()
    assert(out1.map(_.toString).sameElements(out2.map(_.toString)))
    val byQ = out1.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach(rows => assert(rows.length == 10))
    // exact brute-force top-10 on the driver (500 vectors at sf0.001)
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    (0L to 4L).foreach { q =>
      val exact = vecs.collect { case (id, v) if id != q => (id, cos(vecs(q), v)) }
        .toSeq.sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
      val got = byQ(q).map(_.getLong(2)).toSet
      assert(exact.intersect(got).size >= 8,
        s"q$q recall ${exact.intersect(got).size}/10")
    }
  }

  test("ann_nsw core: beam search visits a fraction of a large shard") {
    // 4000-point deterministic shard: the graph must let the beam reach
    // good neighbors while touching far fewer nodes than a scan
    def lcg(seed: Long): Long = seed * 6364136223846793005L + 1442695040888963407L
    val pts = (0 until 4000).map { i =>
      var s = lcg(i + 13)
      val v = Array.fill(16) { s = lcg(s); ((s >>> 11) % 2048) / 1024.0 - 1.0 }
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(_ / n))
    }.toArray
    val q = Array(pts(1234)._2)
    val counter = new java.util.concurrent.atomic.AtomicLong
    val res = Similarity.nswSearchShard(pts, Array((9999L, q(0))),
      m = 8, ef = 48, k = 10, visitCounter = counter)
    assert(res.length == 10)
    // the query itself is pts(1234): its own vector must come back first
    assert(res.head._2 == 1234L && res.head._3 > 0.9999)
    // the counter tallies QUERY-phase visits only: serving cost must be
    // a small fraction of the shard, not a disguised scan
    assert(counter.get > 0)
    assert(counter.get < pts.length / 2,
      s"beam visited ${counter.get}/${pts.length} nodes — that's a scan")
  }

  // ---- q_global_rank -------------------------------------------------

  test("q_global_rank: two-phase ranks equal the naive global window") {
    import org.apache.spark.sql.expressions.Window
    val out = graft.operators.RelationalMore.qGlobalRank.fn(spark, sf).collect()
    val naive = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .withColumn("global_rank", row_number().over(Window.orderBy(
        col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))))
      .filter(col("global_rank") <= 100 || col("global_rank") % 1000 === 0)
      .select(col("global_rank"), col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1), r.getInt(2))).toSet
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet == naive)
    // ranks are globally consecutive: the probe rows cover 1..100
    assert(out.map(_.getLong(0)).filter(_ <= 100).sorted.sameElements(1L to 100L))
  }

  // ---- ann_hamming ---------------------------------------------------

  test("ann_hamming: sign-agreement monotonicity and exactness of the packed codes") {
    val out = Similarity.annHamming.fn(spark, sf).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def hamming(a: Array[Double], b: Array[Double]): Long =
      a.indices.count(i => (a(i) >= 0) != (b(i) >= 0)).toLong
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.length == 10)
      // reported Hamming equals the driver-recomputed sign disagreement
      sorted.foreach { r =>
        assert(r.getLong(3) == hamming(vecs(q), vecs(r.getLong(2))),
          s"q$q cand ${r.getLong(2)}: packed-code Hamming mismatch")
      }
      // distances non-decreasing with rank
      val ds = sorted.map(_.getLong(3))
      assert(ds.sameElements(ds.sorted))
      // top-10 by code = the true 10 smallest sign disagreements
      val trueTop = vecs.toSeq
        .collect { case (id, v) if id != q => (hamming(vecs(q), v), id) }
        .sorted.take(10).map(_._1)
      assert(ds.sameElements(trueTop))
    }
  }

  // ---- text_textrank -------------------------------------------------

  test("text_textrank: rank mass conserved, hubs beat leaves, deterministic") {
    val full = graft.operators.TextAnalysis.textrankScores(spark, sf).cache()
    val n = full.count()
    val total = full.agg(sum("rank")).collect()(0).getDouble(0)
    // Σranks = N is an exact fixpoint invariant of the damped update
    assert(math.abs(total - n) / n < 1e-6, s"rank mass $total drifted from $n")
    assert(full.filter(col("rank") <= 0).count() == 0)
    val out1 = graft.operators.TextAnalysis.textTextrank.fn(spark, sf).collect()
    val out2 = graft.operators.TextAnalysis.textTextrank.fn(spark, sf).collect()
    assert(out1.map(_.toString).sameElements(out2.map(_.toString)))
    assert(out1.length == 20)
    val ranks = out1.map(_.getDouble(2))
    assert(ranks.sameElements(ranks.sortBy(-_)))
    full.unpersist()
  }

  // ---- graph_louvain -------------------------------------------------

  test("graph_louvain: planted two-clique graph recovered with high modularity") {
    import spark.implicits._
    // two 5-cliques bridged by a single edge — the canonical community
    // structure; Q of the planted partition is ≈ 0.452
    def clique(ids: Seq[Long]) =
      for (i <- ids; j <- ids if i < j) yield (i, j)
    val edges = (clique(0L to 4L) ++ clique(10L to 14L) :+ (4L, 10L))
      .toDF("a", "b")
    val out = graft.operators.Graph.louvainReadout(spark, edges).collect()
    assert(out.map(_.getLong(1)).sum == 10, "every node in exactly one community")
    val sizes = out.map(_.getLong(1)).sorted
    assert(sizes.sameElements(Array(5L, 5L)),
      s"expected the two cliques, got sizes ${sizes.mkString(",")}")
    val q = out.map(_.getDouble(4)).sum
    assert(q > 0.4, s"modularity $q below the planted partition's 0.452")
  }

  test("graph_louvain: corpus run is deterministic, conserves nodes, beats singletons") {
    val out1 = graft.operators.Graph.graphLouvain.fn(spark, sf).collect()
    val out2 = graft.operators.Graph.graphLouvain.fn(spark, sf).collect()
    assert(out1.map(_.toString).sameElements(out2.map(_.toString)))
    val q = out1.map(_.getDouble(4)).sum
    // singleton partition scores −Σ(k_i/2m)² < 0; local moves must
    // have found real structure
    assert(q > 0.0, s"learned partition Q=$q no better than singletons")
    // internal edges never exceed the total
    val m = out1.map(_.getLong(2)).sum
    assert(out1.forall(r => r.getLong(2) >= 0) && m >= 0)
  }

  // ---- profile_pii ---------------------------------------------------

  test("profile_pii: totals agree with text_redact; patterns catch planted PII") {
    val audit = Profile.profilePii.fn(spark, sf).collect()
    val redactTotal = graft.operators.TextAnalysis.textRedact.fn(spark, sf)
      .agg(sum("n_pii")).collect()(0).getLong(0)
    assert(audit.map(_.getLong(4)).sum == redactTotal,
      "audit and redaction must count the same PII")
    // planted strings: the audit patterns must actually fire
    import spark.implicits._
    val planted = Seq(
      ("contact me at jane.doe@example.com please", 1L, 0L),
      ("call 555-123-4567 or 555.987.6543", 0L, 2L),
      ("no pii here", 0L, 0L)).toDF("text", "emails", "phones")
    val checked = planted.select(
      regexp_count(col("text"),
        lit(graft.operators.TextAnalysis.emailPattern)).cast("long").as("e"),
      regexp_count(col("text"),
        lit(graft.operators.TextAnalysis.phonePattern)).cast("long").as("p"),
      col("emails"), col("phones")).collect()
    checked.foreach { r =>
      assert(r.getLong(0) == r.getLong(2) && r.getLong(1) == r.getLong(3))
    }
  }

  // ---- ts_ar2 --------------------------------------------------------

  test("ts_ar2: planted AR(2) coefficients recovered, forecast arithmetic exact") {
    import spark.implicits._
    // x_t = 5 + 0.5x₁ − 0.3x₂ + bounded deterministic perturbation
    def lcg(s: Long): Long = s * 6364136223846793005L + 1442695040888963407L
    val xs = Array.fill(120)(0.0)
    xs(0) = 10.0; xs(1) = 11.0
    var seed = 99L
    for (t <- 2 until xs.length) {
      seed = lcg(seed)
      val eps = ((seed >>> 20) % 1000) / 5000.0 - 0.1 // ±0.1
      xs(t) = 5.0 + 0.5 * xs(t - 1) - 0.3 * xs(t - 2) + eps
    }
    val series = xs.zipWithIndex
      .map { case (x, t) => ("planted", t.toLong, x) }.toSeq
      .toDF("key", "t", "x")
    val fit = graft.operators.TimeSeries.ar2Fit(spark, series).collect()
    assert(fit.length == 1)
    val r = fit.head
    assert(math.abs(r.getDouble(2) - 0.5) < 0.15, s"phi1=${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) + 0.3) < 0.15, s"phi2=${r.getDouble(3)}")
    // forecast must be the fitted recursion applied to the two newest
    val expect = r.getDouble(1) + r.getDouble(2) * xs(119) + r.getDouble(3) * xs(118)
    assert(math.abs(r.getDouble(5) - expect) < 2e-3)
    // corpus run: one row per type, r2 in [0, 1]
    val corpus = graft.operators.TimeSeries.tsAr2.fn(spark, sf).collect()
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(corpus.length == types)
    assert(corpus.forall(r => r.getDouble(4) >= -0.0001 && r.getDouble(4) <= 1.0001))
  }

  // ---- mining_iforest ------------------------------------------------

  test("mining_iforest: planted outlier isolates first, scores deterministic in (0,1)") {
    import spark.implicits._
    // dense cluster + one far joint-feature outlier the per-axis
    // z-score would need BOTH axes to flag
    def lcg(s: Long): Long = s * 6364136223846793005L + 1442695040888963407L
    var seed = 5L
    val cluster = (1 to 400).map { i =>
      seed = lcg(seed)
      val dx = ((seed >>> 20) % 1000) / 100.0
      seed = lcg(seed)
      val dy = ((seed >>> 20) % 1000) * 10.0
      (i.toLong, 1, 25.0 + dx, 50000.0 + dy)
    }
    val planted = (9999L, 1, 500.0, 990000.0)
    val pts = (cluster :+ planted).toDF("l_orderkey", "l_linenumber", "x", "y")
    val out1 = graft.operators.Linkage.iforestScores(spark, pts).collect()
    val out2 = graft.operators.Linkage.iforestScores(spark, pts).collect()
    assert(out1.map(_.toString).sameElements(out2.map(_.toString)))
    assert(out1.head.getLong(0) == 9999L,
      s"planted outlier not ranked first: ${out1.head}")
    assert(out1.head.getDouble(4) > out1(1).getDouble(4) + 0.1,
      "outlier score must clearly separate from the cluster")
    assert(out1.forall(r => r.getDouble(4) > 0.0 && r.getDouble(4) < 1.0))
  }

  test("mining_iforest: corpus run emits 20 ranked rows") {
    val out = graft.operators.Linkage.miningIforest.fn(spark, sf).collect()
    assert(out.length == 20)
    val scores = out.map(_.getDouble(4))
    assert(scores.sameElements(scores.sortBy(-(_: Double))))
  }

  // ---- ann_mmr -------------------------------------------------------

  test("ann_mmr: near-duplicate of the best hit is skipped for a diverse pick") {
    val a = Array(1.0, 0.0, 0.0, 0.0)
    val aDup = Array(0.999, 0.01, 0.0, 0.0) // ~same direction as a
    val b = Array(0.0, 1.0, 0.0, 0.0) // orthogonal
    val cands = Array((1L, a, 0.90), (2L, aDup, 0.89), (3L, b, 0.50))
    val picks = Similarity.mmrSelect(cands, lambda = 0.7, k = 2)
    assert(picks.map(_._1) == Seq(1L, 3L),
      s"MMR must pick the diverse b over the near-dup a': $picks")
    // pure relevance would have picked the duplicate
    assert(cands.sortBy(-_._3).take(2).map(_._1).toSeq == Seq(1L, 2L))
    // first pick is always the relevance argmax
    assert(picks.head._2 == 0.90)
  }

  test("ann_mmr: corpus run returns 5 ordered picks led by the top hit") {
    val out = Similarity.annMmr.fn(spark, sf).collect()
    assert(out.length == 5)
    assert(out.map(_.getInt(0)).sameElements(1 to 5))
    // position 1 must be the brute-force top-1 for query 0
    val top1 = Similarity.annBruteforce.fn(spark, sf).collect().head.getLong(0)
    assert(out.head.getLong(1) == top1)
    // mmr scores non-increasing in pick order
    val scores = out.map(_.getDouble(3))
    assert(scores.sameElements(scores.sortBy(-(_: Double))))
  }

  // ---- events_power --------------------------------------------------

  test("events_power: formula replay and monotone sample sizes") {
    val out = EventOps.eventsPower.fn(spark, sf).collect()
    assert(out.map(_.getInt(0)).sameElements(Array(1, 2, 5, 10)))
    val ns = out.map(_.getLong(2))
    // higher detectable lift ⇒ fewer users needed, ~quadratically
    assert(ns.sameElements(ns.sorted.reverse))
    assert(ns(0) > ns(1) * 3 && ns(0) < ns(1) * 5, "1% vs 2% MDE must be ~4×")
    // replay the formula from the raw per-user stats
    val st = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", col("value"))
        .otherwise(0.0)).as("rev"))
      .agg(avg(col("rev")), var_samp(col("rev"))).collect()(0)
    val (mean, v) = (st.getDouble(0), st.getDouble(1))
    val z2 = math.pow(1.959964 + 0.841621, 2)
    out.foreach { r =>
      val delta = mean * r.getInt(0) / 100.0
      assert(r.getLong(2) == math.ceil(2.0 * v * z2 / delta / delta).toLong)
    }
  }

  // ---- text_code_switch ----------------------------------------------

  test("text_code_switch: contingency table conserves docs; mixed flag consistent") {
    val out = graft.operators.TextAnalysis.textCodeSwitch.fn(spark, sf).collect()
    val n = Tables.documents(spark, sf).count()
    assert(out.map(_.getLong(2)).sum == n)
    out.foreach { r =>
      val expectMixed = if (r.getString(0) != r.getString(1)) 1 else 0
      assert(r.getInt(3) == expectMixed)
    }
  }

  // ---- mm_phash_dedup ------------------------------------------------

  test("mm_phash_dedup: planted re-encoded variants cluster with their originals") {
    val out = graft.operators.Multimodal.mmPhashDedup.fn(spark, sf).collect()
    // every planted variant pair (docs 0-19 + their +1000000 clones)
    // clusters under its original as representative. Since r10 the
    // payload reader also plants GENUINE media on doc_id % 100 < 5,
    // and some of those are real perceptual near-dups of each other
    // (e.g. two planted WAVs within Hamming 6) — additional multi-
    // member clusters are the operator WORKING, so they are allowed,
    // but never with a variant id as representative.
    val reps = out.map(_.getLong(0)).toSet
    assert((0L until 20L).forall(reps.contains),
      s"missing planted representatives: ${(0L until 20L).filterNot(reps.contains)}")
    out.foreach { r =>
      assert(r.getLong(1) >= 2, s"cluster ${r.getLong(0)} size ${r.getLong(1)}")
      assert(r.getLong(0) < 1000000L, s"variant id surfaced as representative: ${r.getLong(0)}")
      assert(r.getInt(2) >= 0 && r.getInt(2) <= 6)
    }
    val out2 = graft.operators.Multimodal.mmPhashDedup.fn(spark, sf).collect()
    assert(out.map(_.toString).sameElements(out2.map(_.toString)))
  }

  // ---- ts_twa --------------------------------------------------------

  test("ts_twa: hold-duration weighting measurably differs from the row average") {
    val out = graft.operators.TimeSeries.tsTwa.fn(spark, sf).collect()
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(out.length == types)
    // the last (open-ended) observation per type carries no duration
    val perType = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(1) == perType(r.getString(0)) - 1)
      assert(r.getDouble(2) > 0 && r.getDouble(3) > 0)
    }
    // weighting must actually reweight somewhere (values vary by gap)
    assert(out.exists(r => math.abs(r.getDouble(2) - r.getDouble(3)) > 1e-4))
  }

  // ---- emb_hubness ---------------------------------------------------

  test("emb_hubness: mean k-occurrence is exactly k; hub counts bounded") {
    val r = graft.operators.Embeddings.embHubness.fn(spark, sf).collect().head
    val n = Tables.embeddings(spark, sf).count()
    assert(r.getLong(0) == n)
    // each of n points contributes exactly k=4 neighbor slots, so the
    // N_k distribution's mean is k by double counting — exactly
    assert(r.getDouble(3) == 4.0, s"mean_nk ${r.getDouble(3)} must be exactly k")
    assert(r.getLong(1) + r.getLong(2) <= n)
    assert(r.getDouble(4) >= 0.0)
    assert(!r.getDouble(5).isNaN && !r.getDouble(5).isInfinite)
  }

  // ---- events_did ----------------------------------------------------

  test("events_did: estimate equals the difference of group deltas") {
    val r = EventOps.eventsDid.fn(spark, sf).collect().head
    val did = r.getDouble(6)
    val recomputed = (r.getDouble(3) - r.getDouble(2)) - (r.getDouble(1) - r.getDouble(0))
    assert(math.abs(did - recomputed) < 2e-4,
      s"did $did vs recomputed $recomputed")
    (0 to 3).foreach(i => assert(r.getDouble(i) > 0, s"cell mean $i must be positive"))
  }

  // ---- events_absorbing ----------------------------------------------

  test("events_absorbing: planted 2-state chain solved exactly; corpus probabilities valid") {
    // planted: from A, 30% → purchase, 20% → error, 50% stay in A.
    // P(convert|A) = 0.3 / (0.3 + 0.2) = 0.6 (geometric-series sum)
    val counts = Map(
      ("A", "A") -> 50L, ("A", "purchase") -> 30L, ("A", "error") -> 20L)
    val out = EventOps.absorbingProbabilities(spark, counts,
      absorbing = Set("purchase", "error"), target = "purchase").collect()
    assert(out.length == 1 && out.head.getString(0) == "A")
    assert(math.abs(out.head.getDouble(1) - 0.6) < 1e-9)
    // two-hop chain: B always → A, so P(B) must equal P(A)
    val counts2 = counts + (("B", "A") -> 10L)
    val out2 = EventOps.absorbingProbabilities(spark, counts2,
      absorbing = Set("purchase", "error"), target = "purchase")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out2("B") - out2("A")) < 1e-9)
    // corpus: probabilities in [0,1], one row per transient type
    val corpus = EventOps.eventsAbsorbing.fn(spark, sf).collect()
    assert(corpus.map(_.getString(0)).sorted
      .sameElements(Array("click", "signup", "view")))
    corpus.foreach(r => assert(r.getDouble(1) >= 0 && r.getDouble(1) <= 1))
  }

  // ---- ts_xcorr ------------------------------------------------------

  test("ts_xcorr: 15 lags, pair counts peak at lag 0, correlations bounded") {
    val out = graft.operators.TimeSeries.tsXcorr.fn(spark, sf).collect()
    assert(out.length == 15)
    assert(out.map(_.getInt(0)).sameElements(-7 to 7))
    val byLag = out.map(r => r.getInt(0) -> r.getLong(1)).toMap
    // overlap shrinks as |lag| grows
    assert(byLag(0) >= byLag(7) && byLag(0) >= byLag(-7))
    out.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.0001 && c <= 1.0001)
    }
  }

  // ---- graph_conductance / stream_progress_metrics -------------------

  test("graph_conductance: planted two-clique scores phi = 1/21 exactly") {
    import spark.implicits._
    def clique(ids: Seq[Long]) =
      for (i <- ids; j <- ids if i < j) yield (i, j)
    val edges = (clique(0L to 4L) ++ clique(10L to 14L) :+ (4L, 10L))
      .toDF("a", "b")
    val labels = ((0L to 4L).map(n => (n, 0L)) ++ (10L to 14L).map(n => (n, 10L)))
      .toDF("node", "c")
    val out = graft.operators.Graph.conductance(spark, edges, labels)
      .collect().map(r => r.getLong(0) -> r).toMap
    // each clique: vol = 2·10 + 1 = 21, cut = 1 ⇒ φ = 1/21 ≈ 0.0476
    Seq(0L, 10L).foreach { c =>
      assert(out(c).getLong(1) == 21 && out(c).getLong(2) == 1)
      assert(out(c).getDouble(3) == 0.0476, s"phi ${out(c).getDouble(3)}")
    }
    // corpus partition: phi bounded, isolated communities score 0
    val corpus = graft.operators.Graph.graphConductance.fn(spark, sf).collect()
    corpus.foreach(r => assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
  }

  test("stream_progress_metrics: the batch ledger conserves the corpus row count") {
    val out = EventOps.streamProgressMetrics.fn(spark, sf).collect()
    assert(out.length >= 2, "maxFilesPerTrigger=1 over 3 slices must yield multiple batches")
    val total = out.map(_.getLong(1)).sum
    assert(total == Tables.events(spark, sf).count(),
      s"progress ledger total $total must equal the corpus")
    // state rows grow monotonically in complete-mode aggregation
    val states = out.sortBy(_.getLong(0)).map(_.getLong(2))
    assert(states.sameElements(states.sorted))
  }

  // ---- text_kn_lm ----------------------------------------------------

  test("text_kn_lm: Kneser-Ney distributions normalize to exactly 1 per context") {
    val docs = Tables.documents(spark, sf)
    val (bgc, ctx, cont) = graft.operators.TextAnalysis.knModel(docs)
    val d = graft.operators.TextAnalysis.KnDiscount
    // continuation distribution itself must be a distribution
    val contSum = cont.agg(sum("p_cont")).collect()(0).getDouble(0)
    assert(math.abs(contSum - 1.0) < 1e-9, s"sum p_cont = $contSum")
    // pick the 3 highest-volume contexts and verify sum_w P(w|v) = 1:
    // seen mass (c_vw - D)/c_v plus backoff (D n1p/c_v) * 1
    val tops = ctx.orderBy(col("c_v").desc).limit(3).collect()
    val byV = bgc.collect().groupBy(_.getString(0))
    tops.foreach { t =>
      val v = t.getString(0); val cV = t.getDouble(1); val n1p = t.getDouble(2)
      val seen = byV(v).map(r => math.max(r.getDouble(2) - d, 0.0) / cV).sum
      val total = seen + d * n1p / cV * contSum
      assert(math.abs(total - 1.0) < 1e-9, s"context '$v' sums to $total")
    }
    bgc.unpersist()
    // corpus query: deterministic, finite perplexities
    val out1 = graft.operators.TextAnalysis.textKnLm.fn(spark, sf).collect()
    val out2 = graft.operators.TextAnalysis.textKnLm.fn(spark, sf).collect()
    assert(out1.map(_.toString).sameElements(out2.map(_.toString)))
    out1.foreach(r => assert(r.getDouble(3) > 1.0 && r.getDouble(3) < 1e6))
  }

  // ---- src_mor_read --------------------------------------------------

  test("src_mor_read: reader applies updates, adds inserts, and re-reads idempotently") {
    val out1 = graft.sources.SourceOps.srcMorRead.fn(spark, sf).collect()
    val out2 = graft.sources.SourceOps.srcMorRead.fn(spark, sf).collect()
    assert(out1.map(_.toString).sameElements(out2.map(_.toString)))
    val base = Tables.orders(spark, sf)
    val baseN = base.count()
    val inserts = base.filter(col("o_orderkey") % 1000 === 0).count()
    assert(out1.map(_.getLong(1)).sum == baseN + inserts,
      "merged row count = base + late inserts, no duplicates")
    // every 97th order got +10: total lifts by exactly 10 per correction
    val corrections = base.filter(col("o_orderkey") % 97 === 0).count()
    val baseTotalPlus = base
      .agg(sum(col("o_totalprice"))).collect()(0).getDouble(0) + 10.0 * corrections
    val insertTotal = base.filter(col("o_orderkey") % 1000 === 0)
      .agg(sum(col("o_totalprice"))).collect()(0).getDouble(0)
    val mergedTotal = out1.map(_.getDouble(2)).sum
    assert(math.abs(mergedTotal - (baseTotalPlus + insertTotal)) < 1.0)
  }

  // ---- pipeline_pack_bins --------------------------------------------

  test("pipeline_pack_bins: BFD respects capacity, meets the lower bound, packs tightly") {
    import spark.implicits._
    // synthetic doc sizes engineered so naive arrival-order first-fit
    // wastes bins: 30×1200 + 30×800 + 60×500 tokens
    val docs = ((1 to 30).map(i => (i.toLong, "s", 1200L)) ++
        (31 to 60).map(i => (i.toLong, "s", 800L)) ++
        (61 to 120).map(i => (i.toLong, "s", 500L)))
      .toDF("doc_id", "source", "n_tokens")
    val out = graft.operators.Curation.packBins(spark, docs).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 120 && r.getLong(3) == 0)
    val sumTokens = r.getLong(2)
    val nBins = r.getLong(4)
    val lb = math.ceil(sumTokens / 2048.0).toLong
    assert(r.getLong(5) == lb)
    assert(nBins >= lb, "bin count below the counting lower bound is impossible")
    // BFD guarantee: ≤ 11/9·OPT + 1; OPT ≥ lb
    assert(nBins <= math.ceil(11.0 * lb / 9.0).toLong + 1,
      s"BFD produced $nBins bins for lower bound $lb")
    assert(r.getDouble(6) > 0.7, s"fill ${r.getDouble(6)} too loose")
    // oversized docs get singleton bins, flagged
    val big = Seq((1L, "s", 5000L), (2L, "s", 100L)).toDF("doc_id", "source", "n_tokens")
    val r2 = graft.operators.Curation.packBins(spark, big).collect().head
    assert(r2.getLong(3) == 1 && r2.getLong(4) == 2)
  }

  test("pipeline_pack_bins: corpus run conserves documents and tokens") {
    val out = graft.operators.Curation.pipelinePackBins.fn(spark, sf).collect()
    val truth = Tables.documents(spark, sf)
      .groupBy(col("source")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.length == truth.size)
    out.foreach { r =>
      assert(r.getLong(1) == truth(r.getString(0)))
      assert(r.getLong(4) >= r.getLong(5), "bins ≥ lower bound")
    }
  }

  // ---- mining_gmm ----------------------------------------------------

  test("mining_gmm: weight simplex, population conservation, sane moments") {
    val out = graft.operators.Linkage.miningGmm.fn(spark, sf).collect()
    assert(out.length == 4)
    assert(math.abs(out.map(_.getDouble(1)).sum - 1.0) < 1e-6)
    val n = Tables.lineitem(spark, sf).count()
    assert(out.map(_.getLong(6)).sum == n)
    // means inside the data hull, variances strictly positive
    out.foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(2) < 60)
      assert(r.getDouble(3) > 0 && r.getDouble(3) < 120000)
      assert(r.getDouble(4) > 0 && r.getDouble(5) > 0)
    }
  }
}
