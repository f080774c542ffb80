package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** All engine operators, each a named query + (when expressible)
    * a DuckDB oracle. Registered per-domain; names must be unique.
    */
  val defs: Seq[QueryDef] =
    Relational.all ++ RelationalExt.all ++ RelationalMore.all ++ Tpch.all ++
      KMeans.all ++ TextAnalysis.all ++ Retrieval.all ++
      Dedup.all ++ Similarity.all ++ Embeddings.all ++ Multimodal.all ++
      EventOps.all ++ Curation.all ++ graft.sources.SourceOps.all ++
      Graph.all ++ TimeSeries.all ++ Profile.all ++ Linkage.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Pricing.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
