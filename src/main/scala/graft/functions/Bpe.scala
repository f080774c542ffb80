package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding training and application (Sennrich et al.,
  * ACL 2016 — the GPT-2 tokenizer family's shape): training runs
  * driver-side over a DISTRIBUTED word-frequency table (the standard
  * practice — BPE trains on word counts, not the raw corpus, so the
  * only corpus-wide work is one explode + count aggregation and an
  * O(vocab) top-K collect); application is map-side via the
  * BpeTokenCount expression carrying the merge ranks in its task
  * closure — the "broadcast merges table" a 100 TB token-budget
  * accounting pass actually ships.
  */
object Bpe {

  /** Greedy BPE merge count for one pre-tokenization piece: start
    * from characters, repeatedly merge the lowest-rank adjacent pair
    * until none is in the table; returns the surviving token count.
    */
  def encodePieceCount(piece: String, ranks: Map[(String, String), Int]): Int = {
    if (piece.length <= 1) return piece.length
    var word: Array[String] = piece.map(_.toString).toArray
    var done = false
    while (!done && word.length > 1) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var i = 0
      while (i < word.length - 1) {
        val r = ranks.getOrElse((word(i), word(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestI = i }
        i += 1
      }
      if (bestI < 0 || bestRank == Int.MaxValue) done = true
      else {
        val a = word(bestI)
        val b = word(bestI + 1)
        val merged = a + b
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < word.length) {
          if (j < word.length - 1 && word(j) == a && word(j + 1) == b) {
            buf += merged; j += 2
          } else { buf += word(j); j += 1 }
        }
        word = buf.toArray
      }
    }
    word.length
  }

  /** Classic BPE training over a word-frequency table: numMerges
    * rounds, each picking the most frequent adjacent symbol pair
    * (ties broken lexicographically for determinism) and merging it
    * everywhere. O(numMerges · table) driver work on an O(vocab)
    * table — never O(corpus).
    */
  def trainMerges(wordCounts: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] =
      wordCounts.map { case (w, n) => (w.map(_.toString).toArray, n) }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (w, n) =>
        var i = 0
        while (i < w.length - 1) {
          val k = (w(i), w(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val (a, b) = pairCounts.toSeq
          .maxBy { case ((x, y), n) => (n, x, y) }(
            Ordering.Tuple3(Ordering.Long, Ordering.String.reverse,
              Ordering.String.reverse))._1
        merges += ((a, b))
        val merged = a + b
        words = words.map { case (w, n) =>
          if (w.length < 2) (w, n)
          else {
            val buf = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < w.length) {
              if (j < w.length - 1 && w(j) == a && w(j + 1) == b) {
                buf += merged; j += 2
              } else { buf += w(j); j += 1 }
            }
            (buf.toArray, n)
          }
        }
      }
      round += 1
    }
    merges.toSeq
  }

  /** Merge list → rank map (earlier merge = lower rank = applied
    * first).
    */
  def ranks(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** Train merges from a corpus: ONE distributed pass builds the
    * piece-frequency table (pre-tokenized with `pattern`), the
    * deterministic top-`vocab` pieces come to the driver (O(vocab)),
    * and classic BPE training runs there.
    */
  def trainFromCorpus(docs: DataFrame, textCol: String, pattern: String,
      vocab: Int, numMerges: Int): Seq[(String, String)] = {
    val counts = docs
      .select(explode(regexp_extract_all(col(textCol), lit(pattern), lit(0)))
        .as("piece"))
      .groupBy(col("piece")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("piece"))
      .limit(vocab)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    trainMerges(counts, numMerges)
  }

  /** Column API: BPE token count of a text column under a trained
    * merges table (map-side; the ranks ride the task closure).
    */
  def bpe_token_count(text: Column, pattern: String,
      ranks: Map[(String, String), Int]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.graft.BpeTokenCount(
        org.apache.spark.sql.graft.ColumnBridge.expression(text),
        pattern, ranks))
}
