package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata. The decode step is a
  * deterministic STUB (no media libs in this container) — the
  * Spark-side plumbing (schema, batching, partition-parallel
  * processing) is real and what matters at 100 TB: payload bytes
  * never leave the executor, per-partition iterators batch the
  * "decode", and metadata comes back as narrow typed columns.
  */
object Multimodal {

  final case class MediaFeature(
      doc_id: Long, width: Int, height: Int, mean_intensity: Double)

  /** Deterministic fake "decode": derives pseudo image dims/stats
    * from the payload bytes. Replace with a real codec call
    * (per-partition init, e.g. javacv) in production.
    */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaFeature = {
    val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
    val b1 = if (payload.length > 1) payload(1) & 0xff else 0
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += (payload(i) & 0xff); i += 1 }
    val mean = if (payload.isEmpty) 0.0 else sum.toDouble / payload.length
    MediaFeature(docId, 64 + (b0 % 64), 64 + (b1 % 64),
      math.round(mean * 100) / 100.0)
  }

  /** Documents with an opaque binary payload column (UTF-8 bytes of
    * text stand in for image bytes; schema shape is the point).
    */
  def payloads(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Typed metadata over the binary column — pure codegen'd
    * expressions, no decode needed (the 100 TB fast path: metadata
    * queries never touch payload internals).
    */
  val mmBinaryStats: QueryDef = QueryDef.sql(
    "mm_binary_stats",
    """SELECT doc_id,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
      |  CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_code,
      |  substr(text, 1, 8) AS prefix8
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      length(col("text").cast("binary")).cast("long").as("byte_len"),
      ascii(substring(col("text"), 1, 1)).cast("long").as("first_code"),
      substring(col("text"), 1, 8).as("prefix8"))
      .orderBy(col("doc_id"))
  }

  /** Batched per-partition feature extraction over binary payloads. */
  val mmFeatures: QueryDef = QueryDef.rowsOnly("mm_features") { (s, d) =>
    import s.implicits._
    payloads(s, d)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  final case class FrameFeature(
      doc_id: Long, frame_no: Int, frame_len: Int, mean_intensity: Double)

  val FrameBytes = 256

  /** Frame-sampling plumbing: chunk each payload into fixed-size
    * frames, keep every `step`-th, and only THEN decode — skipped
    * frames never reach the codec (at scale that skip is the point
    * of sampling). Payloads chunk inside the executor (no shuffle of
    * frame bytes); output is narrow typed metadata.
    */
  def sampledFrames(docId: Long, payload: Array[Byte], step: Int): Iterator[FrameFeature] =
    payload.grouped(FrameBytes).zipWithIndex
      .filter(_._2 % step == 0)
      .map { case (frame, i) =>
        val f = decodeStub(docId, frame)
        FrameFeature(docId, i, frame.length, f.mean_intensity)
      }

  /** Per-frame feature extraction (every-4th-frame sampling). */
  val mmFrames: QueryDef = QueryDef.rowsOnly("mm_frames") { (s, d) =>
    import s.implicits._
    payloads(s, d)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) => sampledFrames(id, bytes, step = 4) }
      }
      .toDF()
      .orderBy(col("doc_id"), col("frame_no"))
  }

  val all: Seq[QueryDef] = Seq(mmBinaryStats, mmFeatures, mmFrames)
}
