package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * Metadata storage format (reference Z1): the third plugin of the topic's
 * (validator, selector, serializer) triple. The reference rehydrates
 * serializers from their persisted descriptor via a `FromMetadata` factory
 * and rejects unknown types (`/root/reference/src/MofkaDriver.cpp:234,390-395`);
 * this is the Spark-side equivalent — the serializer decides the on-log text
 * form of the `metadata` column, and every read surface (consumer view, DSv2
 * reader) decodes through the SAME rehydrated plugin.
 *
 * Validation and partition selection always run over the LOGICAL metadata
 * (the JSON text); serialization applies at the storage boundary only.
 */
sealed trait Serializer {
  /** Logical metadata → stored text (applied once, at produce time). */
  def serialize(metadata: Column): Column
  /** Stored text → logical metadata (applied by every read surface). */
  def deserialize(stored: Column): Column
  /** Eager row-form twin of [[deserialize]] for the DSv2 reader — MUST stay
    * bit-identical to the Column form (same decode family). */
  def decode(stored: UTF8String): UTF8String
  def descriptor: JObject

  /** The stored `metadata` column decoded to JSON text — the single
    * definition every read surface shares (no-op Column for the JSON
    * serializer, so pushdown/pruning stay untouched). */
  final def decodedMetadataCol: Column = this match {
    case Serializer.Json => org.apache.spark.sql.functions.col("metadata")
    case s => s.deserialize(org.apache.spark.sql.functions.col("metadata"))
      .cast(org.apache.spark.sql.types.StringType)
  }

  /** DataFrame form of [[decodedMetadataCol]]: rewrite the `metadata`
    * column in place (identity for the JSON serializer). */
  final def decodeMetadataDf(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = this match {
    case Serializer.Json => df
    case _ => df.withColumn("metadata", decodedMetadataCol)
  }
}

object Serializer {

  /** Default: metadata stored verbatim as JSON text (identity — the plan is
    * untouched, so default topics keep full pushdown on `metadata`). */
  case object Json extends Serializer {
    override def serialize(metadata: Column): Column = metadata
    override def deserialize(stored: Column): Column = stored
    override def decode(stored: UTF8String): UTF8String = stored
    override def descriptor: JObject = TopicConfig.DefaultSerializer
  }

  /**
   * Base64-over-UTF-8 storage: the shipped non-default serializer, proving
   * the descriptor round-trips through the catalog and that consumers opened
   * from persisted config alone decode correctly. Spark's `base64` emits
   * unchunked RFC-4648 text; `unbase64` and the MIME decoder below both
   * accept chunked and unchunked input, so the pair is self-consistent.
   */
  case object Base64 extends Serializer {
    override def serialize(metadata: Column): Column =
      base64(metadata.cast(BinaryType))
    override def deserialize(stored: Column): Column =
      unbase64(stored).cast(StringType)
    override def decode(stored: UTF8String): UTF8String =
      if (stored == null) null
      else UTF8String.fromBytes(java.util.Base64.getMimeDecoder.decode(stored.toString))
    override def descriptor: JObject = JObject("type" -> JString("base64"))
  }

  /** `FromMetadata` factory (descriptor → implementation); unknown types are
    * rejected — at `createTopic` time and again on every open. */
  def fromDescriptor(desc: JObject): Serializer = desc \ "type" match {
    case JString("json") | JNothing => Json
    case JString("base64") => Base64
    case other => throw new IllegalArgumentException(
      s"unknown serializer type: ${JsonMethods.compact(JsonMethods.render(other))}")
  }

  /** Parse-and-rehydrate from the compact descriptor text (the serializable
    * form shipped to executor-side readers). */
  def fromDescriptorJson(json: String): Serializer =
    JsonMethods.parse(json) match {
      case o: JObject => fromDescriptor(o)
      case other => throw new IllegalArgumentException(
        s"serializer descriptor must be an object: ${JsonMethods.compact(other)}")
    }
}
