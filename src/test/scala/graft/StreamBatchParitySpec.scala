package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.streaming.EventStreams

/** Batch==stream equality pins. The streaming source reads through an
  * explicit schema, so on-disk type drift can corrupt values SILENTLY
  * (r4: a hardcoded LongType ts schema over µs files compressed every
  * timestamp 1000× — stream_hourly returned 10 rows vs 3385, no
  * exception). These pins make any such drift a loud test failure:
  * the streaming result must equal the identical plan run in batch
  * over the same files.
  */
class StreamBatchParitySpec extends AnyFunSuite {
  import TestSpark._

  test("stream_hourly equals batch hourly aggregate over the same dir") {
    // withWatermark is a no-op on a batch frame, so the SAME plan runs
    // both ways
    val batch = EventStreams.hourlyAgg(Tables.events(spark, sf))
      .collect().toSet
    val streamed = EventStreams.streamHourly(spark, sf).collect().toSet
    assert(streamed === batch)
    assert(batch.size > 100, s"suspiciously few hourly rows: ${batch.size}")
  }

  test("stream_join equals batch interval join over the same dir") {
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val batch = purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"))
      .collect().toSet
    val streamed = EventStreams.streamClickPurchaseJoin(spark, sf).collect().toSet
    assert(streamed === batch)
  }

  test("stream_two_level equals the batch hour→day rollup") {
    val batch = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("hn"))
      .groupBy(date_trunc("day", col("hr")).as("day"))
      .agg(sum(col("hn")).as("n"), count(lit(1)).as("n_hours"))
      .collect().toSet
    val streamed = EventStreams.streamTwoLevel(spark, sf).collect().toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
    // every real daily window closed: total events conserved
    val total = Tables.events(spark, sf).count()
    assert(streamed.toSeq.map(_.getLong(1)).sum === total,
      "chained cascade lost or duplicated events")
  }

  test("stream_user_stats_v2 (transformWithState) equals the mapGroupsWithState variant") {
    val v1 = EventStreams.streamUserStats(spark, sf).collect().toSet
    val v2 = EventStreams.streamUserStatsV2(spark, sf).collect().toSet
    assert(v2 === v1)
    assert(v1.nonEmpty)
  }

  test("stream_join_full equals the batch full outer join under the same cutoffs") {
    val ev = Tables.events(spark, sf)
    val cutoff = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0).toInstant
      .minusSeconds(3 * 3600)
    val cutTs = java.sql.Timestamp.from(cutoff)
    val clicks = ev.filter(col("event_type") === "click" && col("ts") <= lit(cutTs))
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase" && col("ts") <= lit(cutTs))
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val batch = purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"),
        "fullOuter")
      .select(col("purchase_id"), col("click_id"),
        coalesce(col("p_user"), col("c_user")).as("user_id"))
      .collect().toSet
    val streamed = EventStreams.streamClickPurchaseFullJoin(spark, sf)
      .collect().toSet
    assert(streamed === batch)
    // both null-extension directions must actually occur
    assert(streamed.exists(_.isNullAt(0)), "no unmatched clicks emitted")
    assert(streamed.exists(_.isNullAt(1)), "no unmatched purchases emitted")
  }

  test("stream_idempotent_sink equals the batch hourly aggregate despite batch re-delivery") {
    // the sink path re-delivers the newest batch internally (simulated
    // crash recovery); idempotent partition overwrite must absorb it
    val batch = EventStreams.hourlyAgg(Tables.events(spark, sf))
      .collect().toSet
    val sunk = EventStreams.streamIdempotentSink(spark, sf).collect().toSet
    assert(sunk === batch,
      "replayed batch duplicated rows — the sink is not idempotent")
  }
}
