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

/** One sampled frame of a (video-like) payload. */
final case class MediaFrame(doc_id: Long, frame_index: Long, frame: Array[Byte])

/** Fixed-dimension feature vector extracted from a payload. */
final case class MediaFeatures(doc_id: Long, media_type: String, features: Array[Float])

/**
 * Multimodal column plumbing: image/audio/video payloads ride as `binary`
 * columns; decode / feature-extraction runs as a partition-wise typed map —
 * the Scala analog of `mapInPandas` batch processing.
 *
 * The decode step is REAL for image payloads (the JDK's built-in
 * `javax.imageio` reads PNG/JPEG/GIF/BMP headers — no external codec
 * needed); audio/video codecs are not available in this environment, so
 * non-image types keep [[decodeStub]]'s deterministic fake dimensions.
 * Everything around the codec — the Dataset schema, the per-partition batch
 * iteration, the binary transport, the fingerprinting — is the production
 * shape either way: swap the stub for a codec call and nothing else changes.
 */
object Multimodal {

  /** STUB decoder for non-image types (see class doc): dimensions := first
    * two payload bytes. */
  def decodeStub(r: MediaRecord): MediaMeta = {
    val w = if (r.payload.nonEmpty) (r.payload(0) & 0xff).toLong else 0L
    val h = if (r.payload.length > 1) (r.payload(1) & 0xff).toLong else 0L
    MediaMeta(r.doc_id, r.media_type, r.payload.length.toLong, w, h, md5Hex(r.payload))
  }

  /** Real decode for image-typed payloads: header-only width/height via
    * `javax.imageio` — the reader parses image metadata without decoding
    * pixel data, so cost per record is O(header), not O(pixels). An
    * undecodable image payload fails loudly (a corrupt corpus should not
    * silently yield fake dimensions). */
  def decodeImage(r: MediaRecord): MediaMeta = {
    // MemoryCacheImageInputStream directly: the payload is already fully in
    // memory — ImageIO.createImageInputStream would default to a DISK-cached
    // stream, creating+deleting a scratch temp file per record on executors
    val in = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(r.payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext)
        throw new IllegalArgumentException(
          s"doc ${r.doc_id}: no image reader for declared type ${r.media_type}")
      val reader = readers.next()
      try {
        reader.setInput(in)
        MediaMeta(r.doc_id, r.media_type, r.payload.length.toLong,
          reader.getWidth(0).toLong, reader.getHeight(0).toLong, md5Hex(r.payload))
      } finally reader.dispose()
    } finally in.close()
  }

  /** Type-dispatched per-record decode: real codec for images, stub else. */
  def decodeRecord(r: MediaRecord): MediaMeta =
    if (r.media_type.startsWith("image/")) decodeImage(r) else decodeStub(r)

  /** Partition-wise decode: one decoder instance per partition (heavy codecs
    * are expensive to construct — this is where they would be initialized,
    * once per task, not once per record; imageio readers are per-record by
    * design, they bind to one input stream). */
  def decode(ds: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder setup would go here
      it.map(decodeRecord)
    }
  }

  /** STUB resize (real impl: decode → scale to w×h → re-encode): the stub
    * deterministically re-frames the payload to exactly `w*h` bytes by
    * truncating/cycling. The operator shape — a partition-wise typed map
    * whose output schema equals its input schema — is the production one. */
  def resizeStub(r: MediaRecord, w: Int, h: Int): MediaRecord = {
    val out =
      if (r.payload.isEmpty) new Array[Byte](w * h)
      else Array.tabulate(w * h)(i => r.payload(i % r.payload.length))
    MediaRecord(r.doc_id, r.media_type, out)
  }

  def resize(ds: Dataset[MediaRecord], width: Int, height: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    require(width > 0 && height > 0, s"resize target must be positive: ${width}x$height")
    require(width.toLong * height <= Int.MaxValue,
      s"resize target ${width}x$height exceeds the 2 GiB per-cell binary limit")
    ds.mapPartitions { it =>
      // per-partition codec/scaler setup would go here
      it.map(resizeStub(_, width, height))
    }
  }

  /**
   * Frame sampling: treat the payload as consecutive `frameBytes`-sized
   * frames and keep every `everyNth` one. Framing is the STUB for a real
   * container demux; the batch shape — one input record fanning out to
   * 0..k output rows inside one task, no shuffle — is the production shape
   * for video pipelines.
   */
  def sampleFrames(ds: Dataset[MediaRecord], frameBytes: Int,
                   everyNth: Int): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    require(frameBytes > 0 && everyNth > 0,
      s"frameBytes/everyNth must be positive: $frameBytes/$everyNth")
    ds.flatMap { r =>
      // frame bounds in Long: i*frameBytes can exceed Int.MaxValue before
      // the min() for payloads near the 2 GiB cell limit
      val nFrames = ((r.payload.length.toLong + frameBytes - 1) / frameBytes).toInt
      Iterator.range(0, nFrames).filter(_ % everyNth == 0).map { i =>
        val from = i.toLong * frameBytes
        val until = math.min(from + frameBytes, r.payload.length.toLong)
        MediaFrame(r.doc_id, i.toLong,
          java.util.Arrays.copyOfRange(r.payload, from.toInt, until.toInt))
      }
    }
  }

  /** STUB feature extraction (real impl: a vision/audio encoder invoked in
    * batches per partition): a deterministic dim-d float vector folding
    * payload bytes. Output feeds directly into the `graft.llm.Similarity`
    * ANN/near-dup operators (same `Array[Float]` convention). */
  def extractFeaturesStub(r: MediaRecord, dim: Int): MediaFeatures = {
    val f = new Array[Float](dim)
    var i = 0
    while (i < r.payload.length) {
      f(i % dim) += (r.payload(i) & 0xff) / 255.0f
      i += 1
    }
    MediaFeatures(r.doc_id, r.media_type, f)
  }

  def extractFeatures(ds: Dataset[MediaRecord], dim: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    require(dim > 0, s"feature dimension must be positive: $dim")
    ds.mapPartitions { it =>
      // per-partition encoder (model weights) init would go here
      it.map(extractFeaturesStub(_, dim))
    }
  }

  /**
   * 63-bit average-hash (aHash) perceptual fingerprint. REAL pixel decode
   * for image-typed payloads: full `javax.imageio` decode, 8×8
   * nearest-neighbor grayscale downsample, mean threshold — the standard
   * perceptual-dedup primitive (near-identical images differ in few bits
   * even across re-encodes/minor edits). Non-image types fold payload bytes
   * deterministically (stub, consistent with [[decodeStub]]). 63 bits (top
   * bit dropped) so fingerprints feed [[Dedup.simhashPairs]]' pigeonhole
   * banding directly — near-duplicate IMAGE detection with the same
   * bucketed-join scale shape as text simhash.
   */
  def aHash(r: MediaRecord): Long =
    if (r.media_type.startsWith("image/")) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      if (img == null)
        throw new IllegalArgumentException(
          s"doc ${r.doc_id}: undecodable image payload of declared type ${r.media_type}")
      val (w, h) = (img.getWidth, img.getHeight)
      val g = new Array[Long](64)
      var i = 0
      while (i < 64) {
        val x = ((i % 8).toLong * w / 8).toInt
        val y = ((i / 8).toLong * h / 8).toInt
        val rgb = img.getRGB(x, y)
        g(i) = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3L
        i += 1
      }
      val mean = g.sum / 64
      (0 until 63).foldLeft(0L)((acc, j) => if (g(j) > mean) acc | (1L << j) else acc)
    } else {
      r.payload.foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff)) & ((1L << 63) - 1)
    }

  /** Partition-wise perceptual hashing, shaped for [[Dedup.simhashPairs]]:
    * columns (id, simhash). */
  def perceptualHashes(ds: Dataset[MediaRecord]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition codec init would go here
      it.map(r => (r.doc_id, aHash(r)))
    }.toDF("id", "simhash")
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
