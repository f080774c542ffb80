package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventOps, Graph, Linkage, TimeSeries}
import graft.sources.Tables

/** Invariant pins for the round-5 session-13 operators. */
class Round5mOpsSpec extends AnyFunSuite {
  import TestSpark._

  // ---- events_shapley -------------------------------------------------

  test("events_shapley: efficiency, nonnegativity, dummy, determinism") {
    val out = EventOps.eventsShapley.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(out.keySet == Set("click", "error", "signup", "view", "direct"))
    // nonnegativity: v is monotone (subset-sum characteristic fn), so
    // every marginal contribution — hence every credit — is >= 0
    out.values.foreach(c => assert(c >= 0.0))
    // efficiency axiom: channel credits sum to v(full set) = total
    // purchase value with >= 1 prior touch; direct gets the rest.
    // Recompute both totals independently from the raw events table.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val touched = Tables.events(spark, sf)
      .withColumn("n_prior",
        coalesce(count(when(col("event_type") =!= "purchase", 1)).over(w), lit(0L)))
      .filter(col("event_type") === "purchase")
      .agg(
        sum(when(col("n_prior") > 0, col("value")).otherwise(0.0)).as("touched"),
        sum(when(col("n_prior") === 0, col("value")).otherwise(0.0)).as("direct"))
      .collect()(0)
    val channelSum = out.filterKeys(_ != "direct").values.sum
    assert(math.abs(channelSum - touched.getDouble(0)) < 0.05,
      s"efficiency: $channelSum vs ${touched.getDouble(0)}")
    assert(math.abs(out("direct") - touched.getDouble(1)) < 0.05)
    // determinism
    val again = EventOps.eventsShapley.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(out == again)
  }

  // ---- mining_gbt -----------------------------------------------------

  test("mining_gbt: SSE recurrence, monotone RMSE, noise feature unused") {
    val out = Linkage.miningGbt.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.length == 5)
    assert(out.map(_._1).toSeq == (1 to 5))
    // qty is independent of revenue by construction — the split
    // search must never pick the noise feature
    out.foreach { case (_, f, _, _, _) => assert(f != "qty", s"noise split: $f") }
    // training RMSE strictly decreases (every round had gain > 0)
    out.map(_._5).sliding(2).foreach { case Array(a, b) =>
      assert(b < a, s"RMSE not decreasing: ${out.map(_._5).toSeq}")
    }
    // the exact squared-loss recurrence SSE_{t+1} = SSE_t - (2γ-γ²)·gain_t
    // with γ = 0.5 (residuals stay centered, leaves are exact means)
    val n = Tables.lineitem(spark, sf).count().toDouble
    out.sliding(2).foreach { case Array((_, _, _, g, r1), (_, _, _, _, r2)) =>
      val lhs = r2 * r2 * n
      val rhs = r1 * r1 * n - 0.75 * g
      assert(math.abs(lhs - rhs) / rhs < 1e-4,
        s"recurrence: $lhs vs $rhs (gain $g)")
    }
    // determinism
    val again = Linkage.miningGbt.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.sameElements(again))
  }

  // ---- graph_anf ------------------------------------------------------

  test("graph_anf: monotone, plateau matches exact closure, deterministic") {
    val out = Graph.graphAnf.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(out.map(_._1).toSeq == (0 to 8))
    // masks only gain bits, so N(h) is monotone nondecreasing
    out.map(_._2).sliding(2).foreach { case Array(a, b) =>
      assert(b >= a, s"N(h) decreased: ${out.map(_._2).toSeq}")
    }
    // exact reachability closure via driver union-find on the small graph
    val edges = Graph.tradeEdges(spark, sf).collect()
      .map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val parent = scala.collection.mutable.Map(nodes.map(x => x -> x): _*)
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) => parent(find(a)) = find(b) }
    val exactPairs = nodes.groupBy(find).values
      .map(c => c.size.toDouble * c.size).sum
    val plateau = out.last._2
    assert(math.abs(plateau - exactPairs) / exactPairs < 0.2,
      s"plateau $plateau vs exact $exactPairs")
    // N(0): per-node singleton balls — FM small-set bias is bounded
    val n0 = out.head._2
    assert(n0 >= nodes.length * 0.8 && n0 <= nodes.length * 2.5,
      s"N(0)=$n0 for n=${nodes.length}")
    // plateau share column consistent
    out.foreach { case (_, est, pct) =>
      assert(math.abs(pct - math.floor(est / plateau * 10000 + 0.5) / 10000) < 1e-9)
    }
    // hashes and bitwise-OR are order-free: exact determinism
    val again = Graph.graphAnf.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(out.sameElements(again))
  }

  // ---- ts_motif -------------------------------------------------------

  test("ts_motif: bucket validity, exact distances, bucket minimality") {
    val w = 24; val paa = 6; val seg = w / paa
    val out = TimeSeries.tsMotif.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4), r.getDouble(5)))
    assert(out.nonEmpty)
    // driver replay of the subsequence/SAX machinery
    val hourly = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).cast("double").as("n"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
    val series = hourly.groupBy(_._1).view
      .mapValues(_.sortBy(_._2.getTime).map(_._3).toArray).toMap
    def znorm(xs: Array[Double]): Option[Array[Double]] = {
      val mu = xs.sum / w
      val sd = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / w)
      if (sd > 0) Some(xs.map(x => (x - mu) / sd)) else None
    }
    def word(zs: Array[Double]): String =
      (0 until paa).map { j =>
        val m = zs.slice(j * seg, (j + 1) * seg).sum / seg
        if (m < -0.6745) 'a' else if (m < 0.0) 'b'
        else if (m < 0.6745) 'c' else 'd'
      }.mkString
    def dist(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    // subsequences per type: t is 1-based over the hour-ordered rows
    val subs: Map[String, Map[Int, (String, Array[Double])]] =
      series.map { case (et, xs) =>
        et -> (1 to xs.length - w + 1).flatMap { t =>
          znorm(xs.slice(t - 1, t - 1 + w)).map(zs => t -> (word(zs), zs))
        }.toMap
      }
    out.foreach { case (et, _, t1, t2, saxWord, dd) =>
      assert(t1 + w <= t2, s"overlap: $et $t1 $t2")
      val (w1, z1) = subs(et)(t1)
      val (w2, z2) = subs(et)(t2)
      assert(w1 == saxWord && w2 == saxWord, s"bucket: $w1 $w2 vs $saxWord")
      assert(math.abs(dist(z1, z2) - dd) < 1e-3, s"dist replay: $et $t1 $t2")
    }
    // rank 1 is the within-bucket minimum for its type
    out.filter(_._2 == 1).foreach { case (et, _, t1, t2, _, dd) =>
      val best = (for {
        (ta, (wa, za)) <- subs(et).toSeq
        (tb, (wb, zb)) <- subs(et).toSeq
        if wa == wb && ta + w <= tb
      } yield dist(za, zb)).min
      assert(dd <= best + 1e-3, s"$et rank1 $dd vs bucket min $best")
    }
    val again = TimeSeries.tsMotif.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4), r.getDouble(5)))
    assert(out.sameElements(again))
  }

  // ---- ts_discord -----------------------------------------------------

  test("ts_discord: exact NN replay, rare-bucket candidates, ordering") {
    val w = 24
    val out = TimeSeries.tsDiscord.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3),
        r.getLong(4), r.getInt(5), r.getDouble(6)))
    assert(out.nonEmpty)
    // driver replay from the shared subsequence relation
    val subs = TimeSeries.saxSubs(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getSeq[Double](3).toArray))
    val byType = subs.groupBy(_._1)
    def dist(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    out.foreach { case (et, _, t, saxWord, bsz, nnT, nnD) =>
      val all = byType(et)
      val me = all.find(_._2 == t).get
      assert(me._3 == saxWord)
      // bucket size matches the word's collision count
      assert(all.count(_._3 == saxWord) == bsz)
      // exact NN over all non-overlapping same-type subsequences,
      // (dist, t) tie-break as in the operator
      val (bd, bt) = all.filter(s => math.abs(s._2 - t) >= w)
        .map(s => (dist(me._4, s._4), s._2)).min
      assert(bt == nnT, s"$et t=$t nn $bt vs $nnT")
      assert(math.abs(bd - nnD) < 1e-3, s"$et t=$t dist $bd vs $nnD")
      // candidate membership: t is among the 8 rarest-bucket
      // subsequences by the operator's (bsz, word, t) ordering
      val order = all.map { case (_, tt, ww, _) =>
        (all.count(_._3 == ww).toLong, ww, tt)
      }.sorted.take(8).map(_._3).toSet
      assert(order.contains(t), s"$et t=$t not a rare-bucket candidate")
    }
    // per type: rank 1 NN distance >= rank 2
    out.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      sorted.map(_._7).sliding(2).foreach { case Array(a, b) =>
        assert(a >= b)
      }
    }
    val again = TimeSeries.tsDiscord.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3),
        r.getLong(4), r.getInt(5), r.getDouble(6)))
    assert(out.sameElements(again))
  }

  // ---- kmeans_fuzzy ---------------------------------------------------

  test("kmeans_fuzzy: monotone J, mass conservation, driver J replay") {
    import graft.operators.KMeans
    val res = KMeans.kmeansFuzzy.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(res.length == 5 * 8)
    // objective entering each iteration is non-increasing
    val js = res.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.head._6)
    js.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + math.abs(a) * 1e-9, s"J increased: $js")
    }
    // each point's memberships sum to 1 → fuzzy masses sum to n
    val n = Tables.lineitem(spark, sf).count().toDouble
    res.groupBy(_._1).values.foreach { rows =>
      val mass = rows.map(_._5).sum
      assert(math.abs(mass - n) < 0.5, s"mass $mass vs n $n")
    }
    // driver replay of J_1: init centroids + optimal memberships
    val pts = KMeans.points(Tables.lineitem(spark, sf))
      .select(col("x"), col("y")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val cents = KMeans.initCentroids(
      KMeans.points(Tables.lineitem(spark, sf)))
    val j1 = pts.map { case (x, y) =>
      val d2 = cents.map { case (cx, cy) =>
        math.max((x - cx) * (x - cx) + (y - cy) * (y - cy), 1e-12)
      }
      val inv = d2.map(1.0 / _)
      val denom = inv.sum
      d2.zip(inv).map { case (dd, iv) =>
        val u = iv / denom; u * u * dd
      }.sum
    }.sum
    // the operator reports J in millions (corpus-float-sum headroom)
    assert(math.abs(j1 / 1e6 - js.head) / (j1 / 1e6) < 1e-6,
      s"J1 replay: ${j1 / 1e6} vs ${js.head}")
    val again = KMeans.kmeansFuzzy.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(res.sameElements(again))
  }

  // ---- text_rake ------------------------------------------------------

  test("text_rake: stopword-free phrases, positive scores, determinism") {
    import graft.operators.TextAnalysis
    val stops = Set("the", "a", "an", "of", "to", "in", "and", "is", "it", "for")
    val out = TextAnalysis.textRake.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty && out.length <= 20)
    out.foreach { case (phrase, n, score) =>
      assert(phrase.nonEmpty && n >= 1 && score > 0)
      phrase.split(" ").foreach { w =>
        assert(w.matches("[a-z]+") && !stops.contains(w), s"bad token '$w'")
      }
      // RAKE favors longer runs: every phrase scores >= its word count
      // (deg(w)/freq(w) >= 1 always, since deg counts w itself)
      assert(score >= phrase.split(" ").length - 1e-9)
    }
    // ranked by rounded score desc, then phrase
    out.sliding(2).foreach { case Array((p1, _, s1), (p2, _, s2)) =>
      assert(s1 > s2 || (s1 == s2 && p1 < p2))
    }
    val again = TextAnalysis.textRake.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.sameElements(again))
  }

  // ---- mining_isotonic ------------------------------------------------

  test("mining_isotonic: monotone, conserving, matches minimax identity") {
    val out = Linkage.miningIsotonic.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.nonEmpty)
    // monotone nondecreasing fit
    out.map(_._5).sliding(2).foreach { case Array(a, b) =>
      assert(b >= a, "fit not monotone")
    }
    // weighted-mean conservation: pooling preserves the weighted total
    val wFit = out.map(t => t._2 * t._5).sum
    val wRaw = out.map(t => t._2 * t._4).sum
    val n = out.map(_._2).sum
    assert(math.abs(wFit - wRaw) <= n * 0.011,
      s"conservation: $wFit vs $wRaw (rounded inputs)")
    // independent O(B^2) derivation: fit_i = max_{j<=i} min_{k>=i}
    // weightedAvg(y_j..y_k) must agree with the PAVA stack. Recompute
    // the same bucket stats through the identical Spark plan.
    val h = conv(substring(md5(concat_ws(",",
      col("l_orderkey"), col("l_linenumber"))), 1, 13), 16, 10).cast("long")
    val li = Tables.lineitem(spark, sf).select(
      (col("l_extendedprice")
        + (pmod(h, lit(40001L)) - lit(20000L)).cast("double")).as("x"),
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("y"))
    val bounds = li.agg(min(col("x")), max(col("x"))).collect()(0)
    val width = (bounds.getDouble(1) - bounds.getDouble(0)) / 200
    val stats = li
      .withColumn("b", least(floor((col("x") - bounds.getDouble(0)) / width),
        lit(199)).cast("int"))
      .groupBy(col("b"))
      .agg(count(lit(1)).cast("double").as("n"),
        (sum(round(col("y") * 100.0, 0).cast("long")).cast("double")
          / lit(100.0) / count(lit(1))).as("ym"))
      .orderBy(col("b"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    assert(stats.length == out.length)
    val b = stats.length
    // prefix sums for O(1) weighted averages
    val cw = stats.scanLeft(0.0)(_ + _._1)
    val cs = stats.scanLeft(0.0) { case (acc, (w, y)) => acc + w * y }
    def wavg(j: Int, k: Int): Double = (cs(k + 1) - cs(j)) / (cw(k + 1) - cw(j))
    val minimax = (0 until b).map { i =>
      (0 to i).map(j => (i until b).map(k => wavg(j, k)).min).max
    }
    out.zip(minimax).foreach { case ((bk, _, _, _, f), m) =>
      assert(math.abs(f - m) <= 0.011, s"bucket $bk: pava $f vs minimax $m")
    }
    val again = Linkage.miningIsotonic.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.sameElements(again))
  }
}
