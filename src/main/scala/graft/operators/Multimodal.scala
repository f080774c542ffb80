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

  // ---- real image-header decode (pure JVM, no codec libs) ------------

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** (width, height) from a PNG header: the 8-byte signature is
    * followed by the IHDR chunk (length + "IHDR" + 4-byte big-endian
    * width then height) — PNG spec (RFC 2083 §4.1.1).
    */
  def decodePng(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 24 && b.startsWith(PngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some((be32(b, 16), be32(b, 20)))
    else None

  /** (width, height) from a JPEG header: walk the marker segments
    * from SOI (FFD8) to the first SOFn frame header, whose payload is
    * precision(1) + height(2) + width(2) big-endian — ITU T.81 §B.2.2.
    * C4/C8/CC in the C0–CF range are not frame headers (DHT/JPG/DAC).
    */
  def decodeJpeg(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      var j = i + 1
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1 // fill bytes
      if (j >= b.length) return None
      val m = b(j) & 0xff
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i = j + 1 } // standalone
      else if (m == 0xd9 || m == 0xda) return None // EOI/SOS before any SOF
      else {
        if (j + 2 >= b.length) return None
        val len = be16(b, j + 1)
        if (len < 2) return None
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
          return if (j + 7 < b.length) Some((be16(b, j + 6), be16(b, j + 4))) else None
        i = j + 1 + len
      }
    }
    None
  }

  /** Real decode where the payload is a recognized image container
    * (PNG IHDR / JPEG SOFn header parsing — pure JVM, executor-local),
    * deterministic stub otherwise. The mean over payload bytes is the
    * same statistic in both paths.
    */
  def decode(docId: Long, payload: Array[Byte]): MediaFeature =
    decodePng(payload).orElse(decodeJpeg(payload)) match {
      case Some((w, h)) =>
        val stub = decodeStub(docId, payload)
        MediaFeature(docId, w, h, stub.mean_intensity)
      case None => decodeStub(docId, payload)
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

  /** Batched per-partition feature extraction over any (doc_id,
    * payload) frame — the path both mm_features and the tests drive.
    */
  def features(s: SparkSession, pl: DataFrame): DataFrame = {
    import s.implicits._
    pl.as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { case (id, bytes) => decode(id, bytes) }
      }
      .toDF()
  }

  /** Batched per-partition feature extraction over binary payloads. */
  val mmFeatures: QueryDef = QueryDef.rowsOnly("mm_features") { (s, d) =>
    features(s, payloads(s, d)).orderBy(col("doc_id"))
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
