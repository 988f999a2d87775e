package graft.llm

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** An opaque media payload with typed metadata — the multimodal column
  * convention: media travel as `binary`, interpretation is an operator. */
final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

/** Decoded media features. */
final case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
                           width: Long, height: Long, fingerprint: String)

/**
 * Multimodal column plumbing: image/audio/video payloads ride as `binary`
 * columns; decode / feature-extraction runs as a partition-wise typed map —
 * the Scala analog of `mapInPandas` batch processing.
 *
 * The DECODE STEP IS A STUB: real codecs (JPEG/PNG/audio) are not available
 * in this environment, so [[decodeStub]] derives deterministic fake
 * dimensions from the first payload bytes. Everything around it — the
 * Dataset schema, the per-partition batch iteration, the binary transport,
 * the fingerprinting — is the real production shape: swap `decodeStub` for
 * a codec call and nothing else changes.
 */
object Multimodal {

  /** STUB decoder (see class doc): dimensions := first two payload bytes. */
  def decodeStub(r: MediaRecord): MediaMeta = {
    val w = if (r.payload.nonEmpty) (r.payload(0) & 0xff).toLong else 0L
    val h = if (r.payload.length > 1) (r.payload(1) & 0xff).toLong else 0L
    MediaMeta(r.doc_id, r.media_type, r.payload.length.toLong, w, h, md5Hex(r.payload))
  }

  /** Partition-wise decode: one decoder instance per partition (real codecs
    * are expensive to construct — this is where they would be initialized,
    * once per task, not once per record). */
  def decode(ds: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder setup would go here
      it.map(decodeStub)
    }
  }

  /** Documents → media records (payload = UTF-8 bytes stands in for real
    * media bytes in the test corpus). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id"), lit("text/plain").as("media_type"),
      encode(col("text"), "UTF-8").as("payload")).as[MediaRecord]
  }

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString
}
