package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Retrieval}
import graft.functions.TextFunctions
import graft.sources.Tables

class RetrievalSpec extends AnyFunSuite {
  import TestSpark._

  test("bm25: scores are positive, descending, and docs contain a query term") {
    val rows = Retrieval.textBm25.fn(spark, sf).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(_ > 0.0))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
    // every returned doc really contains at least one query term
    val ids = rows.map(_.getLong(0)).toSet
    val hits = Tables.documents(spark, sf)
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .select(col("doc_id"), lower(col("text")).as("t")).collect()
    hits.foreach { r =>
      assert(Retrieval.QueryTerms.exists(t => r.getString(1).contains(t)),
        s"doc ${r.getLong(0)} has no query term")
    }
  }

  test("bm25: a hand-scored document matches the operator's score") {
    // recompute one doc's BM25 from first principles
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), lower(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> "[a-z]+".r.findAllIn(r.getString(1)).toSeq).toMap
    val n = docs.size
    val avgdl = docs.values.map(_.size).sum.toDouble / n
    val top = Retrieval.textBm25.fn(spark, sf).head()
    val (id, got) = (top.getLong(0), top.getDouble(1))
    val manual = Retrieval.QueryTerms.map { term =>
      val tf = docs(id).count(_ == term).toDouble
      if (tf == 0) 0.0
      else {
        val df = docs.values.count(_.contains(term)).toDouble
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        idf * tf * (Retrieval.K1 + 1) /
          (tf + Retrieval.K1 * (1 - Retrieval.B + Retrieval.B * docs(id).size / avgdl))
      }
    }.sum
    assert(math.abs(got - manual) < 0.001, s"got $got manual $manual")
  }

  test("bm25 indexed path returns the identical ranking to the direct path") {
    val direct = Retrieval.textBm25.fn(spark, sf).collect().toSeq
    val indexed = Retrieval.textBm25Indexed.fn(spark, sf).collect().toSeq
    assert(direct == indexed)
  }

  test("indexed postings scan pushes the query-term filter to parquet") {
    val idx = Retrieval.invIndexDir(spark, sf)
    val plan = spark.read.parquet(s"$idx/postings")
      .filter(col("word").isin(Retrieval.QueryTerms: _*))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(word"), plan)
  }

  test("word_grams native expression matches the composed formulation") {
    val df = Tables.documents(spark, sf).limit(50)
      .select(col("doc_id"),
        regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)).as("ws"))
    val native = df.select(col("doc_id"),
      TextFunctions.word_grams(col("ws"), 8).as("g")).collect()
    val composed = df.select(col("doc_id"),
      when(size(col("ws")) >= 8,
        transform(sequence(lit(0), size(col("ws")) - 8),
          i => array_join(slice(col("ws"), i + 1, lit(8)), " ")))
        .otherwise(array().cast("array<string>")).as("g")).collect()
    val nm = native.map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    composed.foreach { r =>
      assert(nm(r.getLong(0)) == r.getSeq[String](1), s"doc ${r.getLong(0)}")
    }
  }

  test("dedup_substring: reported spans really occur in >1 document") {
    val rows = Dedup.dedupSubstring.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) >= r.getLong(2))) // spans >= distinct grams
    // recompute gram-sharing by hand for the corpus
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), lower(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> "[a-z]+".r.findAllIn(r.getString(1)).toSeq)
    val gramDocs = scala.collection.mutable.Map[String, Set[Long]]()
    docs.foreach { case (id, ws) =>
      ws.sliding(8).filter(_.size == 8).map(_.mkString(" "))
        .foreach(g => gramDocs(g) = gramDocs.getOrElse(g, Set()) + id)
    }
    val expected = docs.flatMap { case (id, ws) =>
      val gs = ws.sliding(8).filter(_.size == 8).map(_.mkString(" ")).toSeq
      val dup = gs.filter(g => gramDocs(g).size > 1)
      if (dup.nonEmpty) Some(id -> (dup.size.toLong, dup.distinct.size.toLong)) else None
    }.toMap
    assert(rows.length == expected.size)
    rows.foreach { r =>
      assert(expected(r.getLong(0)) == (r.getLong(1), r.getLong(2)), s"doc ${r.getLong(0)}")
    }
  }
}
