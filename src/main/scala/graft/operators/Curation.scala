package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** End-to-end training-data curation: quality scoring → language
  * filter → exact dedup → token accounting, as ONE declarative plan.
  *
  * This is the composition the per-operator suite exists for; at
  * 100 TB the whole thing is a single scan with map-side scoring, a
  * fingerprint-keyed shuffle for dedup, and a final write — no
  * intermediate materialization. Catalyst fuses every scalar stage
  * into one codegen'd pass over the corpus.
  */
object Curation {

  val QualityMin = 0.75

  val pipelineCurate: QueryDef = QueryDef.sql(
    "pipeline_curate",
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
       |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS alpha_chars,
       |    CAST(length(regexp_extract_all(lower(text), '\\b(the|a|an|of|to|in|and|is|it|for)\\b')) AS BIGINT) AS n_stops,
       |    CAST(length(regexp_extract_all(lower(text), '\\b(the|and|of|to|is)\\b')) AS BIGINT) AS c_en,
       |    CAST(length(regexp_extract_all(lower(text), '\\b(el|la|de|que|y)\\b')) AS BIGINT) AS c_es,
       |    CAST(length(regexp_extract_all(lower(text), '\\b(der|die|das|und|ist)\\b')) AS BIGINT) AS c_de,
       |    CAST(length(regexp_extract_all(lower(text), '\\b(le|les|et|des|est)\\b')) AS BIGINT) AS c_fr,
       |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
       |  FROM documents),
       |q AS (
       |  SELECT doc_id, n_tokens, fp,
       |    round(0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 100)
       |        + 0.4 * (CAST(alpha_chars AS DOUBLE) / n_chars)
       |        + 0.3 * (1 - CAST(n_stops AS DOUBLE) / n_tokens), 4) AS quality,
       |    CASE WHEN greatest(c_en, c_es, c_de, c_fr) = 0 THEN 'und'
       |         WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
       |         WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
       |         WHEN c_de >= c_fr THEN 'de'
       |         ELSE 'fr' END AS pred_lang
       |  FROM m WHERE n_chars > 0 AND n_tokens > 0),
       |f AS (SELECT * FROM q WHERE quality >= $QualityMin AND pred_lang = 'en'),
       |d AS (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM f)
       |SELECT doc_id, n_tokens, quality FROM d WHERE rn = 1
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val stopPattern = "\\b(the|a|an|of|to|in|and|is|it|for)\\b"
    val markers = Seq(
      "en" -> "\\b(the|and|of|to|is)\\b",
      "es" -> "\\b(el|la|de|que|y)\\b",
      "de" -> "\\b(der|die|das|und|ist)\\b",
      "fr" -> "\\b(le|les|et|des|est)\\b")
    val m = Tables.documents(s, d).select(
      Seq(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("long").as("alpha_chars"),
        regexp_count(lower(col("text")), lit(stopPattern)).cast("long").as("n_stops"),
        md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp")) ++
      markers.map { case (l, p) =>
        regexp_count(lower(col("text")), lit(p)).cast("long").as(s"c_$l")
      }: _*)
    val q = m.filter(col("n_chars") > 0 && col("n_tokens") > 0)
      .select(
        col("doc_id"), col("n_tokens"), col("fp"),
        round(lit(0.3) * least(lit(1.0), col("n_tokens").cast("double") / 100)
          + lit(0.4) * (col("alpha_chars").cast("double") / col("n_chars"))
          + lit(0.3) * (lit(1) - col("n_stops").cast("double") / col("n_tokens")), 4).as("quality"),
        when(greatest(col("c_en"), col("c_es"), col("c_de"), col("c_fr")) === 0, "und")
          .when(col("c_en") >= col("c_es") && col("c_en") >= col("c_de") && col("c_en") >= col("c_fr"), "en")
          .when(col("c_es") >= col("c_de") && col("c_es") >= col("c_fr"), "es")
          .when(col("c_de") >= col("c_fr"), "de")
          .otherwise("fr").as("pred_lang"))
    val f = q.filter(col("quality") >= QualityMin && col("pred_lang") === "en")
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    f.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("doc_id", "n_tokens", "quality")
      .orderBy(col("doc_id"))
  }

  val all: Seq[QueryDef] = Seq(pipelineCurate)
}
