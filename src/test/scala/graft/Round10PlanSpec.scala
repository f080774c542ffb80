package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-10 plan locks: the optimization round's plan claims, pinned
  * so a future refactor can't silently reintroduce the removed
  * shapes (single-core cross joins, full-partition window sorts,
  * interpreted n-gram lambdas).
  */
class Round10PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("exact-kNN trio cuts per-key candidates with native TopKPerKey, probe side repartitioned") {
    for (n <- Seq("emb_knn_graph", "emb_knn_classify", "emb_hubness")) {
      val p = plan(n)
      assert(p.contains("TopKPerKeyFinal"), s"$n lost the native top-k cut:\n$p")
      assert(p.contains("REPARTITION_BY_NUM"),
        s"$n lost the pinned-count probe repartition (single-split scan would serialize the O(n²) stage):\n$p")
    }
  }

  test("emb_hubness plans no window at all (the rank filter is gone)") {
    val p = plan("emb_hubness")
    assert(!p.contains("WindowGroupLimit") && !p.contains("RunningWindowFunction")
      && !p.toLowerCase.contains("window("), s"window sort crept back into:\n$p")
  }

  test("n-gram hot paths run the native expressions, not interpreted lambdas") {
    // text_heaps_law is omitted: its gram pass runs inside driver-side
    // collects and the entry's final plan is a LocalTableScan — its
    // parity is covered by the oracle hash + Round10ExprSpec instead
    val expect = Seq(
      "mining_naive_bayes" -> "graft_char_ngrams",
      "text_winnow" -> "graft_char_ngrams",
      "text_repetition" -> "graft_word_grams",
      "text_novelty" -> "graft_word_grams",
      "text_contamination" -> "graft_word_grams",
      "pipeline_decontaminate" -> "graft_word_grams")
    for ((n, fn) <- expect) {
      val p = plan(n)
      assert(p.contains(fn), s"$n lost $fn:\n${p.take(2000)}")
      assert(!p.contains("transform(sequence"),
        s"$n reintroduced an interpreted transform(sequence) lambda")
    }
    // dedup_minhash_corpus materializes its shingle stage behind a
    // checkpoint, so assert on the shingle builder's plan directly
    val sh = graft.operators.Dedup.shinglesHashed(
        graft.sources.Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(sh.contains("graft_word_gram_xxhash") && !sh.contains("transform(sequence"))
  }
}
