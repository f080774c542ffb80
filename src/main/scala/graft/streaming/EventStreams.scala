package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the events table: the same windowed
  * aggregation as the batch `events_hourly`, driven through a real
  * micro-batch stream (file source → watermark → windowed agg →
  * memory sink). At scale the source becomes Kafka/queue and the
  * sink a parquet/Delta writer — the plan in between is unchanged.
  */
object EventStreams {

  /** Raw events schema as stored (ts = TIMESTAMP(NANOS) read as long
    * nanos; see graft.sources.Tables.events).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Hourly windowed aggregation with a 1-hour watermark. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("total"))

  /** Gap-based sessionization through Structured Streaming's native
    * session windows: watermarked state store, update-mode emission.
    * At scale the state store shards by (user_id) across executors
    * and the watermark bounds state size — the streaming analogue of
    * the batch `events_session_window` plan.
    */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_trunc("minute", col("session_window.start")).as("start_min"),
        col("n_events"))

  /** Run the session stream over the parquet file (complete mode —
    * session-window aggregation does not allow update mode).
    */
  def streamSessions(s: SparkSession, dir: String): DataFrame =
    runToMemory(s, dir, "stream_sessions_sink", "complete", sessionAgg)
      .orderBy(col("user_id"), col("start_min"))

  /** Custom streaming state: per-user running (event count, value
    * total) via mapGroupsWithState — the escape hatch for session
    * logic no built-in window expresses. State shards by user_id
    * across the state store; each micro-batch folds only its new
    * rows into the group's state.
    */
  final case class UserStat(user_id: Long, n_events: Long, total_value: Double)

  def userStatsAgg(s: SparkSession)(events: DataFrame): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    events.select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Double)], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { r => n += 1; tot += r._2 }
          val next = UserStat(uid, n, tot)
          state.update(next)
          next
      }
      .toDF()
  }

  /** Run the per-user custom-state stream over the parquet file. */
  def streamUserStats(s: SparkSession, dir: String): DataFrame =
    runToMemory(s, dir, "stream_user_stats_sink", "update", userStatsAgg(s))
      .select(col("user_id"), col("n_events"),
        round(col("total_value"), 2).as("total_value"))
      .orderBy(col("user_id"))

  /** Run the stream to completion over the parquet file and return
    * the materialized result (memory sink, complete mode).
    */
  def streamHourly(s: SparkSession, dir: String): DataFrame =
    runToMemory(s, dir, "stream_hourly_sink", "complete", hourlyAgg)
      .orderBy(col("hour"), col("event_type"))

  /** Streaming exact dedup: dropDuplicates on (source, fingerprint)
    * state, then per-source unique-document counts. At scale the
    * dedup state shards by fingerprint across the state store (with
    * dropDuplicatesWithinWatermark bounding it in time for unbounded
    * feeds).
    */
  def streamDedup(s: SparkSession, dir: String): DataFrame = {
    val name = "stream_dedup_sink"
    s.streams.active.filter(_.name == name).foreach(_.stop())
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_docs")
    java.nio.file.Files.createSymbolicLink(
      tmp.resolve("documents.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val docsSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType)))
    val src = s.readStream.schema(docsSchema).parquet(tmp.toString)
      .select(col("source"),
        md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp"))
      .dropDuplicates("source", "fp")
      .groupBy(col("source")).agg(count(lit(1)).as("n_unique"))
    val q = src.writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    s.table(name).orderBy(col("source"))
  }

  /** Stream-stream inner join: purchases matched to the same user's
    * clicks within the preceding 30 minutes. Both sides watermarked
    * so the join state is bounded — matched pairs emit eagerly
    * (append mode), old click state is evicted once the watermark
    * passes the 30-minute range condition.
    */
  def streamClickPurchaseJoin(s: SparkSession, dir: String): DataFrame = {
    val name = "stream_join_sink"
    s.streams.active.filter(_.name == name).foreach(_.stop())
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_events")
    java.nio.file.Files.createSymbolicLink(
      tmp.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    def src = s.readStream.schema(rawSchema).parquet(tmp.toString)
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
    val q = joined
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"))
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    s.table(name).orderBy(col("purchase_id"), col("click_id"))
  }

  /** Micro-batch the events parquet through `agg` into a memory
    * sink and return the sink table.
    */
  private def runToMemory(s: SparkSession, dir: String, name: String,
      mode: String, agg: DataFrame => DataFrame): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.streams.active.filter(_.name == name).foreach(_.stop())
    // The streaming file source requires a directory; expose the
    // single parquet file through a temp dir symlink.
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_events")
    java.nio.file.Files.createSymbolicLink(
      tmp.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val src = s.readStream.schema(rawSchema).parquet(tmp.toString)
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
    val q = agg(src)
      .writeStream.format("memory").queryName(name).outputMode(mode)
      .start()
    q.processAllAvailable()
    q.stop()
    s.table(name)
  }
}
