package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Embeddings, EventOps, RelationalMore, Similarity, TextAnalysis, TimeSeries}
import graft.sources.Tables

/** Invariant pins for the round-5 session-4 operators (exact values
  * are covered by the DuckDB oracle gate; these pin structural
  * properties that must hold at ANY scale factor).
  */
class Round5dOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q_skyline: frontier is mutually non-dominated and complete") {
    val frontier = RelationalMore.qSkyline.fn(spark, sf).collect()
      .map(r => (r.getAs[Double]("p_retailprice"), r.getAs[Int]("p_size")))
    assert(frontier.nonEmpty)
    for (a <- frontier; b <- frontier if a != b)
      assert(!(b._1 <= a._1 && b._2 >= a._2 && (b._1 < a._1 || b._2 > a._2)),
        s"$b dominates $a inside the frontier")
    // completeness: every part is dominated-or-on-frontier — spot-check
    // that nothing outside the frontier beats a frontier point
    val all = Tables.part(spark, sf)
      .select(col("p_retailprice"), col("p_size")).collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
    val fset = frontier.toSet
    for (p <- all if !fset.contains(p))
      assert(frontier.exists(f =>
        f._1 <= p._1 && f._2 >= p._2 && (f._1 < p._1 || f._2 > p._2)),
        s"non-frontier $p is not dominated by any frontier point")
  }

  test("q_division: every kept customer covers the full priority universe") {
    val kept = RelationalMore.qDivision.fn(spark, sf).collect()
    val universe = Tables.orders(spark, sf)
      .select(col("o_orderpriority")).distinct().count()
    assert(kept.nonEmpty)
    kept.foreach(r =>
      assert(r.getAs[Long]("n_priorities") == universe, r.toString))
    // recount one kept key independently
    val k = kept.head.getAs[Long]("o_custkey")
    val n = Tables.orders(spark, sf).filter(col("o_custkey") === k)
      .select(col("o_orderpriority")).distinct().count()
    assert(n == universe)
  }

  test("text_chi2: 20 rows, counts consistent, chi2 non-negative") {
    val rows = TextAnalysis.textChi2.fn(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("df") >= r.getAs[Long]("n11"), r.toString)
      assert(r.getAs[Double]("chi2") >= 0.0, r.toString)
    }
  }

  test("text_hashing_trick: bucket mass conserves the token count") {
    val rows = TextAnalysis.textHashingTrick.fn(spark, sf).collect()
    assert(rows.length <= 256)
    rows.foreach(r => assert(r.getAs[String]("bucket").matches("[0-9a-f]{2}")))
    val total = Tables.documents(spark, sf)
      .select(size(regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0)))
        .as("n")).agg(sum(col("n"))).head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == total)
  }

  test("dedup_setsim_prefix: corpus-wide prefix filter finds exact-dup pairs") {
    val docs = Tables.documents(spark, sf)
    val pairs = Dedup.setSimPrefixPairs(docs, Dedup.SetSimThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // ground truth: normalized-exact duplicate groups have Jaccard 1.0
    // and MUST be found (prefix filtering is exact, never lossy)
    val dupPair = docs
      .filter(size(regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))) >= 3)
      .groupBy(trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("k"))
      .agg(min(col("doc_id")).as("a"), max(col("doc_id")).as("b"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 2).orderBy(col("a")).limit(1)
      .collect().headOption
    dupPair.foreach { r =>
      val (a, b) = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      assert(pairs.exists(p => p._1 == a && p._2 == b && p._3 == 1.0),
        s"exact-dup pair ($a,$b) missed by prefix filter")
    }
    // every reported pair meets the threshold
    pairs.foreach(p => assert(p._3 >= Dedup.SetSimThreshold, p.toString))
  }

  test("events_bitmap_cohort: bitmap AND+popcount equals distinct intersection") {
    val bm = EventOps.eventsBitmapCohort.fn(spark, sf)
    val tu = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).distinct()
    val direct = tu.toDF("type_a", "u")
      .join(tu.toDF("type_b", "u2"),
        col("u") === col("u2") && col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_common"))
      .orderBy(col("type_a"), col("type_b"))
    assert(bm.collect().toSeq == direct.collect().toSeq)
  }

  test("ts_changepoint: one row per type, stat equals the driver recount") {
    val rows = TimeSeries.tsChangepoint.fn(spark, sf).collect()
    val types = Tables.events(spark, sf)
      .select(col("event_type")).distinct().count()
    assert(rows.length == types)
    // recount the argmax for one series on the driver
    val t0 = rows.head.getAs[String]("event_type")
    val daily = Tables.events(spark, sf).filter(col("event_type") === t0)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n")).orderBy(col("day"))
      .collect().map(r => (r.getDate(0), r.getLong(1)))
    val total = daily.map(_._2).sum
    val stats = daily.zipWithIndex.init.map { case ((_, _), i) =>
      val cum = daily.take(i + 1).map(_._2).sum
      math.abs(daily.length * cum - (i + 1) * total)
    }
    assert(rows.head.getAs[Long]("stat") == stats.max)
  }

  test("emb_whitening: unit variance, zero mean on every axis") {
    val rows = Embeddings.embWhitening.fn(spark, sf).collect()
    assert(rows.length == Embeddings.Dim)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("mean_w")) <= 0.001, r.toString)
      assert(math.abs(r.getAs[Double]("var_w") - 1.0) <= 0.01, r.toString)
    }
  }

  test("ann_range_search: equals the brute-force radius recount") {
    val got = Similarity.annRangeSearch.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    got.foreach { case (id, c) =>
      assert(id != 0L)
      assert(c >= Similarity.RangeRadius - 5e-5, s"below radius: $id $c")
    }
    val e = Similarity.vectors(spark, sf)
    val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val expect = e.filter(col("vec_id") =!= 0).crossJoin(q)
      .select(col("vec_id"),
        Similarity.cosine(col("v"), col("qv")).as("c"))
      .filter(col("c") >= Similarity.RangeRadius)
      .count()
    assert(got.length == expect)
  }

  test("stream_bitmap_cohort equals the batch bitmap cohort") {
    val st = EventOps.streamBitmapCohort.fn(spark, sf).collect().toSeq
    val ba = EventOps.eventsBitmapCohort.fn(spark, sf).collect().toSeq
    assert(st == ba)
  }

  test("mining_lda: k×5 shape, descending positive weights, vocab terms") {
    val rows = graft.operators.Linkage.miningLda.fn(spark, sf).collect()
    assert(rows.length == 20)
    val byTopic = rows.groupBy(_.getAs[Int]("topic"))
    assert(byTopic.keySet == Set(0, 1, 2, 3))
    byTopic.values.foreach { trs =>
      val sorted = trs.sortBy(_.getAs[Int]("term_rank"))
      val ws = sorted.map(_.getAs[Double]("weight"))
      assert(ws.forall(w => w > 0.0 && w <= 1.0), ws.mkString(","))
      assert(ws.zip(ws.tail).forall { case (a, b) => a >= b }, ws.mkString(","))
      val terms = sorted.map(_.getAs[String]("term"))
      assert(terms.distinct.length == terms.length)
    }
  }

  test("new ops avoid cartesian/nested-loop joins in their plans") {
    for (name <- Seq("q_skyline", "dedup_setsim_prefix", "events_bitmap_cohort",
        "q_band_join")) {
      val p = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name has a cartesian join")
      // broadcast of the single-row/tiny side is fine; a nested-loop
      // over two corpus-sized sides is not — these plans must join by
      // hash or sort-merge on their keys
      assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
        s"$name has no keyed join:\n$p")
    }
  }

  test("q_intersect_all / q_except_all: bag multiplicities are exact") {
    val li = Tables.lineitem(spark, sf)
    def cnt(flag: String) = li.filter(col("l_returnflag") === flag)
      .groupBy("l_partkey").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cr = cnt("R"); val ca = cnt("A")
    val inter = graft.operators.RelationalExt.qIntersectAll.fn(spark, sf)
      .groupBy("l_partkey").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    inter.foreach { case (k, c) =>
      assert(c == math.min(cr(k), ca.getOrElse(k, 0L)), s"key $k")
    }
    val exc = graft.operators.RelationalExt.qExceptAll.fn(spark, sf)
      .groupBy("l_partkey").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    exc.foreach { case (k, c) =>
      assert(c == cr(k) - ca.getOrElse(k, 0L), s"key $k")
    }
  }

  test("stream_sliding: every event lands in exactly 4 windows") {
    val rows = EventOps.streamSliding.fn(spark, sf)
    val total = rows.agg(sum(col("n"))).head.getLong(0)
    val nEvents = Tables.events(spark, sf).count()
    assert(total == 4 * nEvents, s"$total vs 4×$nEvents")
    // spot-check one window against a direct interval recount
    val r0 = rows.orderBy(col("ws"), col("event_type")).limit(1).head
    val (ws, et) = (r0.getTimestamp(0), r0.getString(1))
    val direct = Tables.events(spark, sf)
      .filter(col("event_type") === et &&
        col("ts") >= lit(ws) && col("ts") < lit(ws) + expr("INTERVAL 1 HOUR"))
      .count()
    assert(r0.getLong(2) == direct)
  }

  test("mining_ols: residuals are orthogonal to the design matrix") {
    val (beta, r2) = graft.operators.Linkage.olsFit(spark, sf)
    assert(r2 >= 0.0 && r2 <= 1.0, s"r2=$r2")
    val li = Tables.lineitem(spark, sf).select(
      col("l_quantity").cast("double").as("x1"),
      col("l_discount").cast("double").as("x2"),
      col("l_extendedprice").cast("double").as("y"))
    val resid = col("y") - (lit(beta(0)) + lit(beta(1)) * col("x1") +
      lit(beta(2)) * col("x2"))
    val r = li.agg(sum(resid).as("r0"), sum(resid * col("x1")).as("r1"),
      sum(resid * col("x2")).as("r2"), sum(abs(col("y"))).as("scale")).head
    val scale = r.getDouble(3)
    for (i <- 0 to 2)
      assert(math.abs(r.getDouble(i)) < 1e-6 * scale,
        s"normal equation $i violated: ${r.getDouble(i)} vs scale $scale")
    // cross-check the marginal slope magnitude against a univariate
    // regr_slope on the same data (the synthetic schema has near-zero
    // price-quantity correlation, so multivariate ≈ univariate)
    val uni = li.agg(covar_samp(col("y"), col("x1")) / var_samp(col("x1"))).head.getDouble(0)
    assert(math.abs(beta(1) - uni) < math.abs(uni) * 0.25 + 1.0,
      s"multivariate slope ${beta(1)} far from univariate $uni")
  }

  test("q_nullsafe_join: NULL keys match each other") {
    val rows = graft.operators.RelationalExt.qNullsafeJoin.fn(spark, sf).collect()
    // the NULL bucket must survive the join (a plain equi-join drops it)
    assert(rows.exists(_.isNullAt(0)), "NULL key row missing")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
    }
  }

  test("q_percentile_disc: p90 is an actual value at the right rank") {
    val rows = graft.operators.RelationalExt.qPercentileDisc.fn(spark, sf).collect()
    val flags = Tables.lineitem(spark, sf)
      .select(col("l_returnflag")).distinct().count()
    assert(rows.length == flags)
    rows.foreach { r =>
      val flag = r.getString(0)
      val p90 = r.getDouble(1)
      val vals = Tables.lineitem(spark, sf)
        .filter(col("l_returnflag") === flag)
        .select(col("l_quantity")).collect().map(_.getDouble(0)).sorted
      assert(p90 == vals(math.ceil(0.9 * vals.length).toInt - 1))
    }
  }

  test("ts_lttb: endpoints kept, points are a subset, count bounded") {
    val rows = TimeSeries.tsLttb.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").cast("string").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byType = daily.groupBy(_._1)
    val outByType = rows.groupBy(_._1)
    assert(outByType.keySet == byType.keySet)
    for ((t, pts) <- outByType) {
      val series = byType(t).sortBy(_._2)
      assert(pts.length == math.min(10, series.length), s"$t size")
      assert(pts.toSet.subsetOf(series.toSet), s"$t not a subset")
      val days = pts.map(_._2).sorted
      assert(days.head == series.head._2 && days.last == series.last._2,
        s"$t endpoints")
    }
  }

  test("emb_procrustes: recovers the planted permutation exactly") {
    val rows = Embeddings.embProcrustes.fn(spark, sf).collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val (src, tgt, w) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      assert(Embeddings.ProcrustesPerm(tgt) == src,
        s"dim $src mapped to $tgt but perm($tgt)=${Embeddings.ProcrustesPerm(tgt)}")
      assert(math.abs(math.abs(w) - 1.0) <= 1e-3, s"weight $w not ±1")
      assert(math.signum(w) == Embeddings.ProcrustesSign(tgt), s"sign at $tgt")
    }
  }

  test("dedup_eval: LSH recall is high and verified pairs are sound") {
    val rows = Dedup.dedupEval.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows("recall") >= 0.9, s"recall ${rows("recall")}")
    // post-verify precision is 1.0 by construction: every verified
    // pair must be in the exact ground truth
    assert(rows("n_recovered") == rows("n_verified"),
      s"verified ${rows("n_verified")} vs recovered ${rows("n_recovered")}")
    assert(rows("n_truth") > 0, "bounded range has no true pairs")
  }

  test("events_sequence_match: regex counts match a driver replay") {
    val rows = EventOps.eventsSequenceMatch.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    // replay one matched (user, day) on the driver
    val r0 = rows.head
    val (u, day) = (r0.getLong(0), r0.getDate(1))
    val seq = Tables.events(spark, sf)
      .filter(col("user_id") === u &&
        date_trunc("day", col("ts")).cast("date") === lit(day))
      .orderBy(col("ts"), col("event_id"))
      .select(col("event_type")).collect()
      .map(r => r.getString(0) match {
        case "view" => 'v'; case "click" => 'c'; case "purchase" => 'p'
        case "signup" => 's'; case _ => 'e'
      }).mkString
    assert("v+cp".r.findAllIn(seq).size.toLong == r0.getLong(2),
      s"user $u day $day seq=$seq")
  }

  test("q_band_join: bucketed candidates equal the quadratic recount") {
    val got = graft.operators.RelationalExt.qBandJoin.fn(spark, sf)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = Tables.events(spark, sf).filter(col("event_id") < 2000L)
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val expect = (for {
      a <- ev; b <- ev
      if a._2 == b._2 && a._1 < b._1 && math.abs(a._3 - b._3) <= 0.01
    } yield (a._1, b._1)).toSet
    assert(got == expect)
  }

  test("emb_whitening: whitened components are decorrelated") {
    val v = Similarity.vectors(spark, sf)
    val model = Embeddings.fitPca(v, k = Embeddings.Dim)
    val z = Embeddings.whiten(v, model)
    // covariance of (z0, z1) should be ~0, of (z0, z0) ~1
    val r = z.select(
      avg(col("z")(0) * col("z")(1)).as("c01"),
      avg(col("z")(0)).as("m0"), avg(col("z")(1)).as("m1"),
      avg(col("z")(0) * col("z")(0)).as("c00")).head
    val c01 = r.getDouble(0) - r.getDouble(1) * r.getDouble(2)
    val c00 = r.getDouble(3) - r.getDouble(1) * r.getDouble(1)
    assert(math.abs(c01) < 1e-6, s"cross-covariance $c01")
    assert(math.abs(c00 - 1.0) < 1e-6, s"variance $c00")
  }
}
