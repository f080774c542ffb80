package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Graph, Linkage, TextAnalysis, TimeSeries}
import graft.sources.Tables

/** Invariant pins for the round-5 session-9 operators. */
class Round5iOpsSpec extends AnyFunSuite {
  import TestSpark._

  // ---- text_jsd ------------------------------------------------------

  test("text_jsd: matches a direct replay and stays in [0, 1]") {
    val out = TextAnalysis.textJsd.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty)
    out.foreach { case (src, nw, jsd) =>
      assert(nw > 0)
      assert(jsd >= 0.0 && jsd <= 1.0, s"$src jsd=$jsd out of range")
    }
    // direct replay on the collected token multiset (tiny at test SF)
    val toks = Tables.documents(spark, sf)
      .select(col("source"),
        explode(regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0)))
          .as("word"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val corpus = toks.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val n = toks.size.toDouble
    def log2(x: Double): Double = math.log(x) / math.log(2.0)
    out.foreach { case (src, nWords, jsd) =>
      val mine = toks.filter(_._1 == src)
      val byWord = mine.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
      assert(nWords == byWord.size, s"$src distinct-word count")
      val ns = mine.size.toDouble
      var acc = 0.0; var qPresent = 0.0
      byWord.foreach { case (w, nsw) =>
        val p = nsw / ns
        val q = corpus(w) / n
        qPresent += q
        acc += 0.5 * (p * log2(2 * p / (p + q)) + q * log2(2 * q / (p + q)))
      }
      val expect = acc + 0.5 * (1 - qPresent)
      assert(math.abs(jsd - expect) < 5e-4, s"$src: $jsd vs replay $expect")
    }
  }

  // ---- text_gopher_rules ---------------------------------------------

  test("text_gopher_rules: passes is exactly the rule conjunction, one row per doc") {
    val out = TextAnalysis.textGopherRules.fn(spark, sf).collect()
    assert(out.length == Tables.documents(spark, sf).count())
    out.foreach { r =>
      val flags = Seq(2, 3, 4, 5, 6).map(r.getBoolean)
      assert(r.getBoolean(7) == flags.forall(identity),
        s"doc ${r.getLong(0)}: passes != AND(flags)")
    }
    // the synthetic corpus is prose: the battery must not reject everything
    assert(out.count(_.getBoolean(7)) > 0, "no document passes — rules miscalibrated")
  }

  // ---- dedup_source_matrix -------------------------------------------

  test("dedup_source_matrix: canonical pairs conserve the pair count") {
    val m = Dedup.dedupSourceMatrix.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    m.foreach { case (a, b, np) =>
      assert(a <= b, s"pair ($a, $b) not canonical")
      assert(np > 0)
    }
    val nPairs = Dedup.ngramPairs(Tables.documents(spark, sf), 300L, 0.8).count()
    assert(m.map(_._3).sum == nPairs,
      "matrix cells must partition the near-dup pair set")
  }

  // ---- ts_holt_winters -----------------------------------------------

  test("ts_holt_winters: closed form equals the sequential recursion") {
    val out = TimeSeries.tsHoltWinters.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(out.nonEmpty)
    val alpha = 0.2; val gamma = 0.3
    out.groupBy(_._1).foreach { case (tpe, rows) =>
      val series = rows.sortBy(_._2.getTime)
      val xs = series.map(_._3.toDouble)
      val hods = series.map(_._2.toInstant.atZone(java.time.ZoneOffset.UTC).getHour)
      val mean = xs.sum / xs.length
      val s0 = hods.distinct.map { h =>
        val lane = xs.zip(hods).filter(_._2 == h).map(_._1)
        h -> (lane.sum / lane.length - mean)
      }.toMap
      // replay: deseasonalized double EWMA + per-lane seasonal EWMA
      var s1 = 0.0; var s2 = 0.0
      val seas = scala.collection.mutable.Map.empty[Int, Double]
      series.zipWithIndex.foreach { case ((_, _, _, level, trend, se, fitted), i) =>
        val y = xs(i) - s0(hods(i))
        s1 = if (i == 0) y else alpha * y + (1 - alpha) * s1
        s2 = if (i == 0) s1 else alpha * s1 + (1 - alpha) * s2
        val lvl = 2 * s1 - s2
        val tr = alpha / (1 - alpha) * (s1 - s2)
        val d = xs(i) - lvl
        val prev = seas.getOrElse(hods(i), s0(hods(i)))
        val sNew = gamma * d + (1 - gamma) * prev
        seas(hods(i)) = sNew
        assert(math.abs(level - lvl) < 2e-3, s"$tpe level $level vs $lvl")
        assert(math.abs(trend - tr) < 2e-3, s"$tpe trend $trend vs $tr")
        assert(math.abs(se - sNew) < 2e-3, s"$tpe seas $se vs $sNew")
        assert(math.abs(fitted - (lvl + sNew)) < 4e-3)
      }
    }
  }

  // ---- graph_eccentricity --------------------------------------------

  test("graph_eccentricity: matches a driver-side BFS replay; flags consistent") {
    val out = Graph.graphEccentricity.fn(spark, sf).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getInt(1),
        r.getBoolean(2), r.getBoolean(3)))
    assert(out.nonEmpty)
    val diameter = out.map(_._2).max
    val radius = out.map(_._2).min
    out.foreach { case (node, ecc, peri, cent) =>
      assert(peri == (ecc == diameter), s"node $node peripheral flag")
      assert(cent == (ecc == radius), s"node $node central flag")
    }
    assert(radius <= diameter && diameter <= 2 * radius,
      s"graph theory bound violated: r=$radius d=$diameter")
    // cross-operator consistency: ecc(0) must equal the max hop count
    // of graph_bfs's single-source expansion from node 0
    val bfsMax = Graph.graphBfs.fn(spark, sf).collect()
      .map(r => r.getInt(1)).max
    val ecc0 = out.find(_._1 == 0L).map(_._2)
    assert(ecc0.contains(bfsMax),
      s"ecc(0)=$ecc0 disagrees with graph_bfs max hops $bfsMax")
  }

  // ---- ts_spectral_entropy -------------------------------------------

  test("ts_spectral_entropy: range, replay equality, periodogram consistency") {
    val out = TimeSeries.tsSpectralEntropy.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(out.nonEmpty)
    out.foreach { case (t, p, h) =>
      assert(h >= 0.0 && h <= 1.0, s"$t entropy $h out of range")
      assert(p >= 2 && p <= 14)
    }
    // dominant period must agree with ts_periodogram's rank-1 row
    val top = TimeSeries.tsPeriodogram.fn(spark, sf).collect()
      .filter(_.getInt(1) == 1)
      .map(r => (r.getString(0), r.getInt(2))).toMap
    out.foreach { case (t, p, _) =>
      assert(top(t) == p, s"$t dominant period $p != periodogram top ${top(t)}")
    }
    // replay: entropy from the periodogram's own (rounded) powers
    val spec = {
      import org.apache.spark.sql.functions._
      val daily = Tables.events(spark, sf)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).cast("double").as("n"))
      val bounds = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val grid = daily.select(col("event_type")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"),
          explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
      val dense = grid.join(daily, Seq("event_type", "day"), "left_outer")
        .select(col("event_type").as("key"),
          datediff(col("day"), to_date(lit("2020-01-01"))).cast("long").as("t"),
          coalesce(col("n"), lit(0.0)).as("x"))
      TimeSeries.periodogramTopK(dense, 2 to 14, 13).collect()
        .map(r => (r.getString(0), r.getDouble(3)))
    }
    def log2(x: Double): Double = math.log(x) / math.log(2.0)
    out.foreach { case (t, _, h) =>
      val powers = spec.filter(_._1 == t).map(_._2)
      val tot = powers.sum
      val expect = powers.filter(_ > 0)
        .map(p => -(p / tot) * log2(p / tot)).sum / log2(13.0)
      assert(math.abs(h - expect) < 5e-4, s"$t: $h vs replay $expect")
    }
  }

  // ---- q_reciprocal_match --------------------------------------------

  test("q_reciprocal_match: every link is mutual-best and a subset of candidates") {
    import org.apache.spark.sql.functions._
    val out = Linkage.qReciprocalMatch.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(out.nonEmpty, "no reciprocal links at test SF")
    // replay on the collected blocked name sets
    val names = Tables.part(spark, sf)
      .select(split(col("p_name"), " ").getItem(0).as("blk"),
        col("p_size"), col("p_name")).distinct()
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val byBlock = names.groupBy(n => (n._1, n._2))
    val expected = byBlock.values.flatMap { members =>
      val ns = members.map(_._3)
      if (ns.size < 2) Seq.empty
      else {
        val best = ns.map { x =>
          val cands = ns.filter(_ != x).map(y => (lev(x, y), y)).sorted
          x -> cands.head
        }.toMap
        ns.flatMap { x =>
          val (dx, y) = best(x)
          if (best(y)._2 == x && x < y)
            Seq((members.head._1, members.head._2, x, y, dx.toLong))
          else Seq.empty
        }
      }
    }.toSet
    assert(out.toSet == expected,
      s"links differ: extra=${out.toSet -- expected} missing=${expected -- out.toSet}")
  }

  // ---- mining_dtree --------------------------------------------------

  test("mining_dtree: full grid, exact counts, argmax matches brute force") {
    val out = Linkage.miningDtree.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.length == 27, "3 features x 9 deciles")
    assert(out.map(_._1).distinct.sorted.toSeq == Seq("c_en", "n_chars", "n_tokens"))
    // replay the candidate counts + gain on the collected features
    val docs = Tables.documents(spark, sf)
      .select(col("text"), col("n_chars"), col("lang")).collect()
    val feats: Map[String, Array[(Double, Int)]] = Map(
      "c_en" -> docs.map { r =>
        ("\\b(the|and|of|to|is)\\b".r.findAllIn(r.getString(0).toLowerCase).size.toDouble,
          if (r.getString(2) == "en") 1 else 0)
      },
      "n_chars" -> docs.map(r =>
        (r.getLong(1).toDouble, if (r.getString(2) == "en") 1 else 0)),
      "n_tokens" -> docs.map { r =>
        ("\\S+".r.findAllIn(r.getString(0)).size.toDouble,
          if (r.getString(2) == "en") 1 else 0)
      })
    def gini(p: Double): Double = 2 * p * (1 - p)
    var bestLocal = Double.MinValue
    out.foreach { case (f, _, thr, nl, pl, gain) =>
      val fv = feats(f)
      val n = fv.length; val pos = fv.count(_._2 == 1)
      val left = fv.filter(_._1 <= thr)
      assert(left.length == nl, s"$f thr=$thr n_left")
      assert(left.count(_._2 == 1) == pl, s"$f thr=$thr pos_left")
      val nr = n - nl; val pr = pos - pl
      val expect = gini(pos.toDouble / n) -
        (if (nl == 0) 0.0 else nl.toDouble / n * gini(pl.toDouble / nl)) -
        (if (nr == 0) 0.0 else nr.toDouble / n * gini(pr.toDouble / nr))
      assert(math.abs(gain - expect) < 1e-5, s"$f thr=$thr gain $gain vs $expect")
      assert(gain <= 0.5 + 1e-9)
      bestLocal = math.max(bestLocal, gain)
    }
    // the marker-count feature must be the winning stump for lang=en
    val best = out.maxBy(_._6)
    assert(best._6 == bestLocal)
    assert(best._1 == "c_en",
      s"expected the en-marker feature to win, got ${best._1}")
  }
}
