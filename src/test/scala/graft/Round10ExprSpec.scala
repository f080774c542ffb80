package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions

/** Round-10 optimization parity: the native n-gram expressions that
  * replaced interpreted transform(sequence(…), λ) spellings in the
  * hot text paths must be VALUE-IDENTICAL to the HOF forms on the
  * real corpus (plus adversarial multi-byte/short-string edges), so
  * the oracle hashes of every consumer (mining_naive_bayes,
  * text_repetition/novelty/heaps_law/winnow, the dedup shingle
  * family, the contamination/decontamination entries) are untouched.
  */
class Round10ExprSpec extends AnyFunSuite {
  import TestSpark._

  private def docs = graft.sources.Tables.documents(spark, sf).limit(200)

  test("char_ngrams(3) equals transform(sequence, substr) on corpus docs") {
    val d = docs.select(
      regexp_replace(lower(col("text")), "\\s+", " ").as("txt"))
      .filter(length(col("txt")) >= 3)
    val both = d.select(
      TextFunctions.char_ngrams(col("txt"), 3).as("native"),
      expr("transform(sequence(1, greatest(length(txt) - 2, 0)), i -> substr(txt, i, 3))")
        .as("hof")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("char_ngrams uses codepoint (SQL substring) semantics on multi-byte text") {
    import spark.implicits._
    // 2- and 3-byte codepoints; astral (4-byte) pair; exact-boundary lengths
    val rows = Seq("héllo wörld", "日本語のテキスト", "a😀b😁c",
      "ab", "abc", "", "ツ")
    val d = rows.toDF("txt")
    val both = d.select(
      TextFunctions.char_ngrams(col("txt"), 3).as("native"),
      expr("CASE WHEN length(txt) >= 3 THEN transform(sequence(1, length(txt) - 2), i -> substr(txt, i, 3)) ELSE array() END")
        .as("hof")).collect()
    both.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("char_ngrams(k) below-k strings yield empty arrays (oracle generate_series semantics)") {
    import spark.implicits._
    val d = Seq("", "a", "ab", "αβ").toDF("txt")
    d.select(TextFunctions.char_ngrams(col("txt"), 3).as("g")).collect()
      .foreach(r => assert(r.getSeq[String](0).isEmpty))
  }

  test("word_gram_xxhash(3) equals transform(sequence, xxhash64(a,b,c)) on corpus shingles") {
    val d = docs.select(
      regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0)).as("toks"))
      .filter(size(col("toks")) >= 3)
    val both = d.select(
      TextFunctions.word_gram_xxhash(col("toks"), 3).as("native"),
      expr("transform(sequence(0, size(toks) - 3), i -> xxhash64(toks[i], toks[i+1], toks[i+2]))")
        .as("hof")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("word_grams(5) equals the concat-lambda spelling on corpus docs") {
    val d = docs.select(
      regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0)).as("toks"))
      .filter(size(col("toks")) >= 5)
    val both = d.select(
      TextFunctions.word_grams(col("toks"), 5).as("native"),
      expr("transform(sequence(0, size(toks) - 5), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2], ' ', toks[i+3], ' ', toks[i+4]))")
        .as("hof")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("winnow fingerprints: posexplode+codegen md5 path matches the struct-lambda spelling") {
    val k = graft.operators.TextAnalysis.WinnowK
    val d = docs.select(col("doc_id"), lower(col("text")).as("txt"))
      .filter(length(col("txt")) >= k)
    val native = d.select(col("doc_id"),
        posexplode(TextFunctions.char_ngrams(col("txt"), k)))
      .select(col("doc_id"), (col("pos") + 1).as("i"),
        substring(md5(col("col")), 1, 16).as("h"))
    val hof = d.select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, length(txt) - ${k - 1}),
           |  i -> struct(i AS i,
           |    substring(md5(substring(txt, i, $k)), 1, 16) AS h))""".stripMargin))
        .as("x"))
      .select(col("doc_id"), col("x.i").as("i"), col("x.h").as("h"))
    assert(native.count() > 0)
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }
}
