package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis
import graft.sources.Tables

class TextMoreSpec extends AnyFunSuite {
  import TestSpark._

  test("char entropy is in the natural-text band and matches a manual recount") {
    val rows = TextAnalysis.textEntropy.fn(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach(r => assert(r.getDouble(1) > 1.0 && r.getDouble(1) < 6.5))
    // recount one document by hand
    val doc = Tables.documents(spark, sf).orderBy(col("doc_id"))
      .select("doc_id", "text").head()
    val text = doc.getString(1)
    val n = text.length.toDouble
    val manual = math.log(n) / math.log(2) -
      text.groupBy(identity).values.map(_.length.toDouble)
        .map(c => c * math.log(c) / math.log(2)).sum / n
    val got = rows.find(_.getLong(0) == doc.getLong(0)).get.getDouble(1)
    assert(math.abs(got - manual) < 0.001, s"got $got manual $manual")
  }

  test("type-token ratio is bounded and types never exceed tokens") {
    val rows = TextAnalysis.textTtr.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2))
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("ttr is fully map-side: no exchange in the plan") {
    val plan = TextAnalysis.textTtr.fn(spark, sf)
      .queryExecution.executedPlan.toString
    // the single sort for ORDER BY is the only allowed exchange
    assert(plan.split("Exchange").length <= 2, plan)
  }

  test("novelty: the first document is fully novel, scores stay in [0,1]") {
    val rows = TextAnalysis.textNovelty.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.head.getDouble(3) == 1.0) // smallest doc_id saw nothing before it
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // n_seen <= n_grams
      val nov = r.getDouble(3)
      assert(nov >= 0.0 && nov <= 1.0)
    }
    // n_grams matches an independent distinct-5-gram count for one doc
    val docId = rows.head.getLong(0)
    val toks = Tables.documents(spark, sf).filter(col("doc_id") === docId)
      .select("text").head().getString(0).toLowerCase.split("\\s+").toSeq
    val grams = toks.sliding(5).map(_.mkString(" ")).toSet
    assert(rows.head.getLong(1) == grams.size)
  }
}
