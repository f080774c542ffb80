package graft

import org.scalatest.funsuite.AnyFunSuite

/** Second-point-on-the-SF-curve gate for THRESHOLD-SENSITIVE
  * operators: the r5 vacuous-gate bug class was "query returns 0
  * rows at the verify SF and the pin passes on 0 == 0" — an SF-
  * dependent failure a single scale factor can't expose. Every entry
  * here carries a fixed threshold (Jaccard/hamming/support/z-score/
  * CUSUM significance/quality cutoffs) whose row yield depends on
  * the data density, so each is asserted NON-EMPTY at BOTH sf0.001
  * (the suite's SF) and sf0.1 (the bench SF) — a silent threshold
  * inversion at either end now fails loudly instead of vacuously.
  */
class VerifySfSweepSpec extends AnyFunSuite {
  import TestSpark._

  private val sfLow = sf // sf0.001
  private val sfHigh = "/root/testdata/sf0.1"

  /** The thresholded entries: name → the SFs where a non-empty yield
    * is GUARANTEED (by planted structure or corpus density). Entries
    * whose yield is a legitimate data property at one end (the
    * bounded-window dedup pairs only exist in the small-SF id range;
    * MAD outliers only emerge at volume) still RUN at both SFs —
    * errors fail loudly — but only assert rows where guaranteed.
    */
  private val thresholded: Seq[(String, Seq[String])] = Seq(
    "dedup_minhash" -> Seq(sfLow, sfHigh),      // Jaccard ≥ 0.8 verify
    "dedup_minhash_est" -> Seq(sfLow, sfHigh),  // same candidates
    "dedup_simhash" -> Seq(sfLow, sfHigh),      // hamming ≤ 6
    "dedup_simhash_lsh" -> Seq(sfLow, sfHigh),  // banded hamming
    "dedup_incremental" -> Seq(sfLow, sfHigh),  // split + Jaccard
    "dedup_minhash_weighted" -> Seq(sfLow, sfHigh), // ICWS
    "dedup_cdc_chunks" -> Seq(sfLow, sfHigh),   // CDC boundaries
    "dedup_containment" -> Seq(sfLow),          // containment ≥ 0.9:
                                                // pairs live in the
                                                // small-SF id range
    "dedup_ngram" -> Seq(sfLow),                // 5-gram J ≥ 0.8: same
    "dedup_substring" -> Seq(sfLow, sfHigh),    // 50-char repeats
    "dedup_setsim_prefix" -> Seq(sfLow),        // prefix-filter: same
    "mining_assoc" -> Seq(sfLow, sfHigh),       // support/confidence
    "ts_cpd_binseg" -> Seq(sfLow, sfHigh),      // emits accepted=false
    "ts_esd" -> Seq(sfLow, sfHigh),             // ESD rounds
    "ts_burst" -> Seq(sfLow, sfHigh),           // Kleinberg costs
    "events_anomaly_mad" -> Seq(sfHigh),        // |mod z| ≥ 3.5 needs
                                                // volume to trip
    "events_bot_detect" -> Seq(sfLow, sfHigh),  // rate thresholds
    "pipeline_quality_filter" -> Seq(sfLow, sfHigh) // quality cutoffs
  )

  for ((name, guaranteedAt) <- thresholded) {
    test(s"$name yields rows at its guaranteed SFs and errors nowhere") {
      val fn = SparkEntry.queries(name)
      for (dir <- Seq(sfLow, sfHigh)) {
        val n = fn(spark, dir).count() // must not throw at ANY SF
        if (guaranteedAt.contains(dir))
          assert(n >= 1, s"$name vacuous at $dir: $n rows")
        else info(s"$name at $dir: $n rows (data-dependent, not asserted)")
      }
    }
  }

  // ---- the rows-only class (round-9 verdict item 5) ---------------------
  // Every queries() entry WITHOUT a DuckDB oracle: their whole driver
  // gate is pinning ScalaTests + non-empty rows at the verify SF, so
  // an empty result at another SF is a silent vacuity regression this
  // sweep exists to catch. The set is DERIVED from the registry (not
  // hardcoded), so a future oracle-less entry is gated the day it
  // lands. Entries whose yield is a data property at one SF carry an
  // explicit exemption with the reason; they still must run
  // error-free at both SFs.
  private val rowsOnlyExempt: Map[String, String] = Map(
    // (none currently — every rows-only entry is an agg/top-k/report
    // shape that is non-empty at any corpus size)
  )
  private val rowsOnly: Seq[String] =
    (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet --
      thresholded.map(_._1).toSet).toSeq.sorted

  test("rows-only registry class matches the known oracle-less surface") {
    // the class should only ever SHRINK (an entry gaining an oracle)
    // or grow deliberately — a size drift here means the gate's
    // coverage changed without review
    assert(rowsOnly.size + thresholded.count { case (n, _) =>
      !SparkEntry.oracleSql.contains(n) } == 49,
      s"oracle-less entries: ${rowsOnly.size} + thresholded overlap — " +
        "update this pin alongside the oracle change")
  }

  // ---- planted-media execution gate (round-10 verdict item 3) -----------
  // payloads() plants genuine PNG/BMP/GIF/WAV containers on 5% of doc
  // ids, so the REAL decode + resample paths must fire at every SF —
  // before r10 they executed only against a spec-planted PNG and a
  // decode regression was indistinguishable from the text-stub path.
  test("mm_resize really resamples corpus media at sf0.001 and sf0.1") {
    import org.apache.spark.sql.functions.col
    for (dir <- Seq(sfLow, sfHigh)) {
      val rs = operators.Multimodal.mmResize.fn(spark, dir)
      val real = rs.filter(col("resampled") && col("out_crc") =!= 0L).count()
      assert(real >= 1, s"no corpus payload took the real resample path at $dir")
    }
  }

  test("mm_features decodes every planted container kind at both SFs") {
    import org.apache.spark.sql.functions.col
    for (dir <- Seq(sfLow, sfHigh)) {
      val kinds = operators.Multimodal.mmFeatures.fn(spark, dir)
        .select("kind").distinct().collect().map(_.getString(0)).toSet
      for (k <- Seq("png", "bmp", "gif", "wav"))
        assert(kinds.contains(k), s"kind $k never decoded at $dir (saw $kinds)")
      // WAV rows must carry real audio metadata, not the image stub
      val wav = operators.Multimodal.mmFeatures.fn(spark, dir)
        .filter(col("kind") === "wav").collect()
      assert(wav.forall(r => r.getInt(5) == operators.Multimodal.AudioRate),
        "planted WAVs must decode their true sample rate")
    }
  }

  for (name <- rowsOnly) {
    test(s"rows-only $name is non-vacuous at sf0.001 and sf0.1") {
      val fn = SparkEntry.queries(name)
      for (dir <- Seq(sfLow, sfHigh)) {
        val n = fn(spark, dir).count() // must not throw at ANY SF
        rowsOnlyExempt.get(name) match {
          case Some(reason) if n == 0 =>
            info(s"$name at $dir: 0 rows (exempt: $reason)")
          case _ =>
            assert(n >= 1, s"$name vacuous at $dir: $n rows")
        }
      }
    }
  }
}
