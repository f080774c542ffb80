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
}
