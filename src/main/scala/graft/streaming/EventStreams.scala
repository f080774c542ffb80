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

  /** Run the stream to completion over the parquet file and return
    * the materialized result (memory sink, complete mode).
    */
  def streamHourly(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val name = "stream_hourly_sink"
    s.streams.active.filter(_.name == name).foreach(_.stop())
    // The streaming file source requires a directory; expose the
    // single parquet file through a temp dir symlink.
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_events")
    java.nio.file.Files.createSymbolicLink(
      tmp.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val src = s.readStream.schema(rawSchema).parquet(tmp.toString)
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
    val q = hourlyAgg(src)
      .writeStream.format("memory").queryName(name).outputMode("complete")
      .start()
    q.processAllAvailable()
    q.stop()
    s.table(name).orderBy(col("hour"), col("event_type"))
  }
}
