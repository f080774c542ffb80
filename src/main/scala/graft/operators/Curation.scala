package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** End-to-end training-data curation: quality scoring → language
  * filter → exact dedup → token accounting, as ONE declarative plan.
  *
  * All scoring formulas come from TextAnalysis (single source for
  * the markers, pred_lang argmax, and quality weights — in both
  * Column and SQL form), so this composition can't drift from the
  * per-operator suite it fuses.
  *
  * At 100 TB the whole thing is a single scan with map-side scoring,
  * a fingerprint-keyed shuffle for dedup, and a final write — no
  * intermediate materialization. Catalyst fuses every scalar stage
  * into one codegen'd pass over the corpus.
  */
object Curation {

  val QualityMin = 0.75

  import TextAnalysis._

  val pipelineCurate: QueryDef = QueryDef.sql(
    "pipeline_curate",
    s"""WITH m AS (
       |  SELECT doc_id,
       |    ${qualityInputsSql("    ")},
       |    ${markerCountsSql("    ")},
       |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
       |  FROM documents),
       |q AS (
       |  SELECT doc_id, n_tokens, fp,
       |    $qualitySql AS quality,
       |    $predLangSql AS pred_lang
       |  FROM m WHERE n_chars > 0 AND n_tokens > 0),
       |f AS (SELECT * FROM q WHERE quality >= $QualityMin AND pred_lang = 'en'),
       |d AS (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM f)
       |SELECT doc_id, n_tokens, quality FROM d WHERE rn = 1
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val m = qualityInputs(Tables.documents(s, d))
      .select(
        Seq(col("doc_id"), col("n_chars"), col("n_tokens"),
          col("alpha_chars"), col("n_stops"),
          md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp")) ++
        markerCols: _*)
    val q = m.filter(col("n_chars") > 0 && col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"), col("fp"),
        qualityCol.as("quality"), predLangCol.as("pred_lang"))
    val f = q.filter(col("quality") >= QualityMin && col("pred_lang") === "en")
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    f.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("doc_id", "n_tokens", "quality")
      .orderBy(col("doc_id"))
  }

  /** Deterministic corpus mixing: every source gets a sampling rate
    * (25/50/75/100% by source number mod 4 — stand-ins for the
    * per-source weights of a real data recipe) and rows are kept by
    * comparing a fixed-width hex prefix of md5(doc_id) against the
    * rate threshold. Hash-based sampling (rather than rand()) is the
    * production technique: the SAME rows are selected on every run,
    * any engine, any partitioning — which is also what makes it
    * oracle-checkable. Map-side filter; one tiny per-source agg.
    */
  val pipelineMix: QueryDef = QueryDef.sql(
    "pipeline_mix",
    """WITH h AS (
      |  SELECT source, n_chars,
      |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS hx,
      |    CAST(substr(source, 4) AS INT) % 4 AS band
      |  FROM documents),
      |k AS (SELECT * FROM h
      |      WHERE CASE band WHEN 0 THEN hx < '4000' WHEN 1 THEN hx < '8000'
      |            WHEN 2 THEN hx < 'c000' ELSE TRUE END)
      |SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM k GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val h = Tables.documents(s, d).select(
      col("source"), col("n_chars"),
      substring(md5(col("doc_id").cast("string")), 1, 4).as("hx"),
      expr("CAST(substr(source, 4) AS INT) % 4").as("band"))
    h.filter(
        when(col("band") === 0, col("hx") < "4000")
          .when(col("band") === 1, col("hx") < "8000")
          .when(col("band") === 2, col("hx") < "c000")
          .otherwise(lit(true)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"))
  }

  /** Per-source quality-percentile cut: keep each source's top half
    * by quality score (percent_rank over a TOTAL ordering — doc_id
    * tie-break — so both engines cut identically). The relative-cut
    * alternative to pipeline_curate's absolute threshold: sources
    * with different quality distributions each contribute.
    */
  val pipelineQualityFilter: QueryDef = QueryDef.sql(
    "pipeline_quality_filter",
    s"""WITH m AS (
       |  SELECT doc_id, source,
       |    ${qualityInputsSql("    ")}
       |  FROM documents),
       |q AS (
       |  SELECT doc_id, source, $qualitySql AS quality
       |  FROM m WHERE n_chars > 0 AND n_tokens > 0),
       |r AS (
       |  SELECT *, percent_rank() OVER (PARTITION BY source
       |              ORDER BY quality DESC, doc_id) AS pr
       |  FROM q)
       |SELECT source, count(*) AS n_kept,
       |  round(avg(quality), 4) AS avg_quality
       |FROM r WHERE pr <= 0.5
       |GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val q = qualityInputs(Tables.documents(s, d), keep = Seq("source"))
      .filter(col("n_chars") > 0 && col("n_tokens") > 0)
      .select(col("doc_id"), col("source"), qualityCol.as("quality"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
    q.withColumn("pr", percent_rank().over(w))
      .filter(col("pr") <= 0.5)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), round(avg(col("quality")), 4).as("avg_quality"))
      .orderBy(col("source"))
  }

  /** Exact-quota stratified sampling: EXACTLY 50 documents per
    * source (or all of a smaller source), chosen by ranking on a
    * fixed-width md5 prefix with a doc_id tie-break — a total,
    * engine-independent order, so the same rows are drawn every run
    * (rate-based hashing — pipeline_mix — can't hit exact quotas;
    * rand() can't be reproduced or oracle-checked). One window pass
    * per source partition.
    */
  val pipelineSampleN: QueryDef = QueryDef.sql(
    "pipeline_sample_n",
    """WITH r AS (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id) AS rn
      |  FROM documents)
      |SELECT doc_id, source FROM r WHERE rn <= 50
      |ORDER BY source, doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(substring(md5(col("doc_id").cast("string")), 1, 8), col("doc_id"))
    Tables.documents(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 50)
      .select(col("doc_id"), col("source"))
      .orderBy(col("source"), col("doc_id"))
  }

  val all: Seq[QueryDef] = Seq(pipelineCurate, pipelineMix,
    pipelineQualityFilter, pipelineSampleN)
}
