package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partition-count invariance: the determinism claim behind every
  * oracle hash-match is that results do not depend on HOW the data
  * was partitioned — float formulas are algebraically conditioned,
  * orders are total, rounding absorbs reassociation noise. The
  * oracle gate runs at ONE fixed parallelism, so it cannot see a
  * violation; this suite reruns a float-/window-heavy sample of the
  * surface at 2 vs 17 shuffle partitions and requires identical
  * rows. A failure here is a real 1000-executor bug even when the
  * single-partitioning oracle is green.
  */
class PartitionInvarianceSpec extends AnyFunSuite {
  import TestSpark._

  private val names = Seq(
    "q1_pricing",          // grouped float sums (rounded)
    "q_running_sum",       // running window over float col
    "ts_ewma",             // closed-form cascade, claimed order-safe
    "ts_holt",             // double cascade over one window
    "graph_pagerank",      // iterative float mass propagation
    "text_entropy",        // log2 aggregation, conditioned form
    "events_user_entropy", // same family over events
    "profile_corr",        // one-scan correlation matrix
    "kmeans_lloyd",        // reference-semantics iterative means
    "emb_random_projection", // map-only: trivially invariant control
    "q_skyline",           // window-over-aggregate frontier
    "text_chi2",           // int64-exact chi-square
    "mining_ols",          // normal-equation sums (rounded to 4)
    "events_survival",     // KM windows over the duration aggregate
    "events_cuped",        // pooled θ from covar/var sums
    "graph_louvain",       // synchronous local moves + argmax ties
    "ann_nsw",             // hash-sharded graph build + beam ties
    "profile_dp_counts",   // hash-derandomized noise
    "mining_iforest",      // hash-ordered samples + float scores
    "text_textrank",       // damped power iteration over word graph
    "ts_ar2",              // per-type sufficient-stat sums
    "pipeline_pack_bins",  // bucketed BFD (hash bucket membership)
    "ann_mmr",             // greedy re-rank over an exact shortlist
    "ts_twa",              // exact int sufficient sums by construction
    "mm_phash_dedup",      // banded hamming + connected components
    "ts_kalman",           // driver gain sequence + one cum window
    "stream_two_level",    // chained stateful cascade (exact ints)
    "profile_tcloseness",  // EMD from exact contingency counts
    "profile_mi",          // log-sum over exact ≤15-cell contingency
    "ts_backtest",         // exact int OLS sufficient sums per fold
    "events_trending",     // ordered decayed cumsum per user
    "profile_bootstrap",   // exact int replicate sums + selection CI
    "graph_simrank",       // iterated pair joins over the entity graph
    "q_gini",              // banded exact rank + decimal sums
    "events_mannwhitney",  // all-int doubled-rank sums
    "events_ks_test",      // integer CDF supremum, one division
    // round-6 additions
    "graph_node2vec",      // replica-enumerated argmin-hash walks
    "dedup_minhash_weighted", // ICWS hash draws + exact verify
    "ts_reconcile",        // medians + float ratios (rounded)
    "ts_seasonal_strength", // variance ratios over MA decomposition
    "emb_knn_graph_ivf",   // cached quantizer + rounded-cosine ranks
    "dedup_weighted_exact" // fp-exact integer-valued tf sums
  )

  private def runWith(name: String, parts: String): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try SparkEntry.queries(name)(spark, sf).collect().map(_.toString).sorted.toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  for (name <- names)
    test(s"$name: identical rows at 2 vs 17 shuffle partitions") {
      assert(runWith(name, "2") == runWith(name, "17"))
    }
}
