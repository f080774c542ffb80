package graft

import org.apache.spark.sql.SparkSession

/** Recommended SparkSession wiring for the graft engine: native
  * function registration (graft_dot / graft_cosine), AQE with skew
  * handling, and a sane shuffle-partition default that AQE coalesces
  * downward at runtime.
  *
  * On a real cluster, prefer configuring
  * `spark.sql.extensions=graft.functions.GraftExtensions` at submit
  * time; this builder is the programmatic equivalent.
  */
object GraftSession {

  def builder(appName: String = "graft",
      shufflePartitions: Int = 200): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")

  /** Local session for tests/benchmarks on this machine. */
  def local(cpus: Int, appName: String = "graft-local"): SparkSession =
    builder(appName, shufflePartitions = cpus)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
