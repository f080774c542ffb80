package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Embeddings, Graph, Linkage, Multimodal, Similarity, TimeSeries}
import graft.sources.{SourceOps, Tables}

/** Invariant pins for the round-5 session-11 operators. */
class Round5kOpsSpec extends AnyFunSuite {
  import TestSpark._

  // ---- mining_naive_bayes ---------------------------------------------

  test("mining_naive_bayes: smoothed model normalizes; confusion conserves docs") {
    val (counts, classes, vocab) = Linkage.nbModel(spark, sf)
    // Σ_tri∈V (cnt+1)/(tot+V) == 1 per class, exactly (telescoping sum)
    val norm = counts.groupBy("lang").agg(sum(col("cnt")).as("seen"),
        count(lit(1)).as("nTri"))
      .join(classes.select(col("lang"), col("tot")), "lang")
      .collect()
    norm.foreach { r =>
      val seen = r.getAs[Long]("seen"); val nTri = r.getAs[Long]("nTri")
      val tot = r.getAs[Long]("tot")
      val mass = (seen + nTri + (vocab - nTri)).toDouble / (tot + vocab)
      assert(math.abs(mass - 1.0) < 1e-12, s"class ${r.getString(0)} mass $mass")
    }
    val conf = Linkage.miningNaiveBayes.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // population conservation: every test doc with ≥3 chars is classified once
    val expected = Tables.documents(spark, sf)
      .filter(Linkage.nbIsTest && length(regexp_replace(lower(col("text")), "\\s+", " ")) >= 3)
      .count()
    assert(conf.map(_._3).sum == expected,
      s"confusion total ${conf.map(_._3).sum} != test docs $expected")
  }

  test("mining_naive_bayes: distributed pipeline equals an exact local replay") {
    val (countsDf, classesDf, vocab) = Linkage.nbModel(spark, sf)
    val counts = countsDf.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val classes = classesDf.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getAs[Double]("log_prior"))).toMap
    def tris(t: String): Seq[String] = {
      val c = t.toLowerCase.replaceAll("\\s+", " ")
      (0 until math.max(c.length - 2, 0)).map(i => c.substring(i, i + 3))
    }
    val replay = Tables.documents(spark, sf).filter(Linkage.nbIsTest)
      .select("doc_id", "lang", "text").collect()
      .flatMap { r =>
        val ts = tris(r.getString(2))
        if (ts.isEmpty) None
        else {
          val m = ts.groupBy(identity).view.mapValues(_.size).toMap
          val pred = classes.keys.toSeq.sorted.map { c =>
            val (tot, lp) = classes(c)
            val score = lp + m.map { case (tri, k) =>
              k * math.log((counts.getOrElse((c, tri), 0L) + 1.0) / (tot + vocab.toDouble))
            }.sum
            (score, c)
          }.max // same (score, lang) struct-max tie-break as the query
          Some((r.getString(1), pred._2))
        }
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val conf = Linkage.miningNaiveBayes.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(conf == replay, s"distributed confusion $conf != local replay $replay")
  }

  test("mining_naive_bayes: deterministic rerun") {
    val a = Linkage.miningNaiveBayes.fn(spark, sf).collect().map(_.toString).toSeq
    val b = Linkage.miningNaiveBayes.fn(spark, sf).collect().map(_.toString).toSeq
    assert(a == b)
  }

  // ---- graph_coloring --------------------------------------------------

  test("graph_coloring: proper, total, greedy-minimal, Delta+1-bounded") {
    val out = Graph.graphColoring.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val edges = Graph.intervalConflictEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty && out.nonEmpty)
    // totality: every endpoint colored
    edges.foreach { case (a, b) =>
      assert(out.contains(a) && out.contains(b), s"uncolored endpoint on ($a,$b)")
    }
    // proper: no monochrome edge
    edges.foreach { case (a, b) =>
      assert(out(a) != out(b), s"edge ($a,$b) monochrome color ${out(a)}")
    }
    // greedy smallest-free: node colored c sees every color 0..c-1
    val nbrs = edges.flatMap(e => Seq(e, (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    out.foreach { case (v, c) =>
      val seen = nbrs.getOrElse(v, Set.empty).map(out)
      (0 until c).foreach { lower =>
        assert(seen.contains(lower),
          s"node $v color $c but neighborhood misses color $lower")
      }
    }
    // Delta+1 bound
    val delta = nbrs.values.map(_.size).max
    assert(out.values.max <= delta, s"max color ${out.values.max} > Delta $delta")
  }

  test("graph_coloring: deterministic rerun") {
    val a = Graph.graphColoring.fn(spark, sf).collect().map(_.toString).toSeq
    val b = Graph.graphColoring.fn(spark, sf).collect().map(_.toString).toSeq
    assert(a == b)
  }

  // ---- emb_power_iteration --------------------------------------------

  test("emb_power_iteration: matches fitPca's top component and eigenvalue") {
    val (v, lambda, n) = Embeddings.lanczosTop(Similarity.vectors(spark, sf))
    val model = Embeddings.fitPca(Similarity.vectors(spark, sf))
    assert(n == model.n)
    val pc1 = model.components(0)
    val cos = v.zip(pc1).map { case (a, b) => a * b }.sum /
      (math.sqrt(v.map(x => x * x).sum) * math.sqrt(pc1.map(x => x * x).sum))
    assert(math.abs(cos) >= 0.999, s"|cos(power, PC1)| = ${math.abs(cos)}")
    val rel = math.abs(lambda - model.eigenvalues(0)) / model.eigenvalues(0)
    assert(rel < 1e-4, s"lambda1 $lambda vs exact ${model.eigenvalues(0)} (rel $rel)")
    // unit norm + sign convention
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
    assert(v(v.indices.maxBy(j => math.abs(v(j)))) > 0)
  }

  test("emb_power_iteration: query emits d loadings + lambda + n") {
    val rows = Embeddings.embPowerIteration.fn(spark, sf).collect()
    assert(rows.length == Embeddings.Dim + 2)
    val lambda = rows.find(_.getString(0) == "lambda1").get.getDouble(1)
    assert(lambda > 0)
  }

  // ---- src_time_travel -------------------------------------------------

  test("src_time_travel: snapshots fold the action log; immutable files shared") {
    val (_, logPath) = SourceOps.timeTravelTable(spark, sf)
    val v0 = SourceOps.liveFilesAsOf(spark, logPath, 0)
    val v1 = SourceOps.liveFilesAsOf(spark, logPath, 1)
    val v2 = SourceOps.liveFilesAsOf(spark, logPath, 2)
    assert(v0.size == 2 && v1.size == 3 && v2.size == 3)
    // append keeps history live; the rewrite swaps exactly one file
    assert(v0.toSet.subsetOf(v1.toSet))
    assert((v1.toSet -- v2.toSet).size == 1 && (v2.toSet -- v1.toSet).size == 1)
    val out = SourceOps.srcTimeTravel.fn(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // v1 sees strictly more rows than v0 (append), v2 strictly fewer
    // than v1 (copy-on-write delete)
    assert(out(1) > out(0) && out(2) < out(1), s"row counts $out")
    // v2 = v1 minus the deleted returnflag='R' rows of the even-key file
    val deleted = Tables.lineitem(spark, sf)
      .filter(year(col("l_shipdate")) < 1998 && col("l_orderkey") % 2 === 0
        && col("l_returnflag") === "R").count()
    assert(out(1) - out(2) == deleted)
  }

  // ---- ts_esd ----------------------------------------------------------

  test("ts_esd: R1 matches a direct replay; lambda decreasing; decision rule") {
    val rows = TimeSeries.tsEsd.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    // direct replay of R1 on the daily series
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(1).toDouble)
    val m = daily.sum / daily.length
    val sd = math.sqrt(daily.map(x => (x - m) * (x - m)).sum / (daily.length - 1))
    val r1 = daily.map(x => math.abs(x - m) / sd).max
    assert(math.abs(rows.head._4 - BigDecimal(r1).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
      s"R1 ${rows.head._4} != replay $r1")
    // lambda strictly decreasing in rank (n shrinks, quantile grows slower)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._5 > b._5, s"lambda not decreasing: $a $b")
      case _ =>
    }
    // ESD rule: outliers are exactly ranks <= last significant rank
    val lastSig = rows.filter(r => r._4 > r._5).map(_._1).sorted.lastOption.getOrElse(0)
    rows.foreach { r => assert(r._6 == (r._1 <= lastSig), s"decision rule at $r") }
  }

  test("ts_esd: t-quantile agrees with known table values") {
    // two-sided 0.975 / 0.95 quantiles, standard tables to 3 dp
    assert(math.abs(TimeSeries.tQuantile(0.975, 10) - 2.228) < 2e-3)
    assert(math.abs(TimeSeries.tQuantile(0.95, 30) - 1.697) < 2e-3)
    assert(math.abs(TimeSeries.tQuantile(0.975, 1) - 12.706) < 2e-2)
  }

  // ---- mm_audio_energy -------------------------------------------------

  test("mm_audio_energy: recovers the planted silence layout exactly") {
    val out = Multimodal.mmAudioEnergy.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(out.nonEmpty)
    val framesPerSeg = Multimodal.AudioSegMs / Multimodal.AudioFrameMs
    out.foreach { case (id, nFrames, nSilent, nBursts) =>
      assert(nFrames == Multimodal.AudioSegments * framesPerSeg)
      // planted layout from the same bit derivation
      val rms = Multimodal.wavFrameRms(Multimodal.synthWav(id))
      val silentBits = (0 until Multimodal.AudioSegments)
        .map(seg => rms(seg * framesPerSeg) < Multimodal.SilenceRms)
      // every frame of a segment shares its segment's state
      rms.zipWithIndex.foreach { case (r, i) =>
        assert((r < Multimodal.SilenceRms) == silentBits(i / framesPerSeg))
      }
      assert(nSilent == silentBits.count(identity) * framesPerSeg,
        s"doc $id silent frames $nSilent vs planted $silentBits")
      val expBursts = silentBits.foldLeft((0, true)) { case ((k, prev), sNow) =>
        (if (!sNow && prev) k + 1 else k, sNow)
      }._1
      assert(nBursts == expBursts, s"doc $id bursts $nBursts vs planted $expBursts")
    }
    // tone RMS lands where PCM16 half-amplitude sine should: ~16384/sqrt(2)
    val toneRms = Multimodal.wavFrameRms(Multimodal.synthWav(
      out.map(_._1).find(id => {
        val r = Multimodal.wavFrameRms(Multimodal.synthWav(id))
        r.exists(_ >= Multimodal.SilenceRms)
      }).get)).filter(_ >= Multimodal.SilenceRms)
    toneRms.foreach(r => assert(math.abs(r - 16384.0 / math.sqrt(2)) < 60.0))
  }
}
