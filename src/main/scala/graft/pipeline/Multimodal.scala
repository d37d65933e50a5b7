package graft.pipeline


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, processed by a typed `mapPartitions` feature
  * extractor — the Spark shape for image/audio/video pipelines where
  * a decode library runs per partition-batch.
  *
  * The decode step itself is a DETERMINISTIC STUB (no codec libraries
  * in this environment): payloads are the documents' UTF-8 bytes and
  * "decoding" reads them as a fake pixel stream. Everything around the
  * stub is the real production plumbing and is what's tested:
  *   - binary column + metadata struct schema carried through Catalyst,
  *   - partition-batched iteration (one `MediaRecord` iterator per
  *     partition — where a real decoder would amortize model/codec
  *     init, exactly like mapInPandas batches),
  *   - narrow execution: no shuffle, features stream out per row,
  *   - a frame-sample operator (every 16th byte) standing in for
  *     video frame extraction.
  *
  * Swap `extractFeatures` for a real decoder and the plan is
  * unchanged — that is the point.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte], width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, kind: String, width: Int, height: Int,
      n_bytes: Int, byte_sum: Long, frame_hash: Long)

  /** 60-bit md5-prefix hash, JVM-side — same value as
    * [[graft.functions.Portable.h60]] computes in-plan. Delegates to
    * the single byte-shift implementation in Portable (three
    * independent copies of the portable-hash contract is how engines
    * silently diverge). */
  private[graft] def h60jvm(s: String): Long =
    graft.functions.Portable.h60jvm(s)

  /** STUB decoder + feature extractor. A real implementation would
    * decode `payload` with an image/audio codec; this one reads the
    * raw bytes deterministically so the pipeline is testable. */
  private def extractFeatures(m: MediaRecord): MediaFeatures = {
    val n = m.payload.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += m.payload(i) & 0xff; i += 1 }
    // "frame sample": every 16th byte, hashed — stands in for
    // keyframe extraction on video payloads
    val frame = new String(
      (0 until n by 16).map(j => (m.payload(j) & 0xff).toChar).toArray)
    MediaFeatures(m.doc_id, "image", m.width, m.height, n, sum, h60jvm(frame))
  }

  /** The documents table dressed as a media catalog: payload =
    * UTF-8 bytes, metadata derived deterministically from n_chars. */
  def mediaCatalog(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      ((col("n_chars") % 64) + 16).cast("int").as("width"),
      (((col("n_chars") * 7) % 64) + 16).cast("int").as("height"))

  // ---------------------------------------------------------------- q40
  /** Feature extraction over binary media columns via typed
    * mapPartitions. One narrow stage: scan → decode-batch → features;
    * at 100 TB the unit of work is the parquet row-group and decoder
    * state is reused across a partition.
    */
  def q40MediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaCatalog(spark, dir).as[MediaRecord]
      .mapPartitions(_.map(extractFeatures))
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Oracle reconstructs the stub arithmetic from the text column
    * (payload bytes == code points: the corpus is pure ASCII, which
    * the spec asserts). */
  val q40Sql: String =
    """SELECT doc_id, 'image' AS kind,
      |  CAST((n_chars % 64) + 16 AS INT) AS width,
      |  CAST(((n_chars * 7) % 64) + 16 AS INT) AS height,
      |  CAST(length(text) AS INT) AS n_bytes,
      |  list_sum([unicode(text[i:i]) for i in range(1, length(text) + 1)])::BIGINT AS byte_sum,
      |  ('0x' || substr(md5(array_to_string(
      |      [text[i:i] for i in range(1, length(text) + 1, 16)], '')), 1, 15))::BIGINT AS frame_hash
      |FROM documents ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_media_features" -> (q40MediaFeatures _))

  def oracles: Map[String, String] = Map(
    "q40_media_features" -> q40Sql)
}
