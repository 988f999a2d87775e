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

/** Header-only container metadata (audio/video payloads): container kind,
  * playback duration, and the container-specific fields that apply (WAV:
  * rate/channels; MP4: track count). */
final case class MediaProbe(doc_id: Long, container: String, duration_ms: Long,
                            sample_rate: Option[Long], channels: Option[Long],
                            tracks: Option[Long])

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

  /** 64 deterministic gray values from a seed text — the synthetic image
    * corpus generator: pixel i of an 8×8 grayscale image is byte i of
    * `md5(text || chunk)` (4 chunks × 16 bytes). Chosen so [[aHash]] of the
    * rendered image is re-derivable from md5 HEX in plain SQL: an 8×8
    * source sampled by the 8×8 aHash grid hits every pixel exactly once,
    * and grayscale PNG round-trips losslessly. */
  def docGrays(text: String): Array[Int] =
    Array.range(0, 4).flatMap(c =>
      MessageDigest.getInstance("MD5")
        .digest((text + c.toString).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(_ & 0xff))

  /** Render 64 gray values as a real 8×8 PNG (lossless; `aHash` recovers
    * the exact values through the codec). */
  def pngGray8x8(g: Array[Int]): Array[Byte] = {
    require(g.length == 64, s"need 64 gray values, got ${g.length}")
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < 64) {
      val v = g(i) & 0xff
      img.setRGB(i % 8, i / 8, (v << 16) | (v << 8) | v)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  // -- container probing (audio/video) --------------------------------------
  //
  // Header-only probes beside the ImageIO path: WAV/RIFF chunk walking and
  // MP4 box walking read O(header) bytes — the payload-lazy contract for
  // non-image corpora (duration/rate/track metadata without a codec).

  /** Walk a RIFF/WAVE container's chunks: sample rate + channels from
    * `fmt `, sample count from `data` size / block align. Fails loudly on
    * anything that is not a WAVE RIFF — a corrupt corpus must not probe as
    * silence. */
  def probeWav(id: Long, b: Array[Byte]): MediaProbe = {
    def le16(o: Int) = ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)).toLong
    def le32(o: Int) = (0 until 4).map(i => (b(o + i) & 0xffL) << (8 * i)).sum
    def tag(o: Int) = new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    require(b.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE",
      s"doc $id: not a RIFF/WAVE payload")
    var off = 12
    var rate, chans, blockAlign, dataLen = -1L
    while (off + 8 <= b.length) {
      val (id4, size) = (tag(off), le32(off + 4))
      // a crafted/corrupt size must fail loudly, never loop or walk
      // backwards (size is unsigned-32 on disk; the payload bounds it)
      require(size >= 0 && size <= b.length.toLong,
        s"doc $id: corrupt RIFF chunk '$id4' size $size")
      if (id4 == "fmt ") {
        chans = le16(off + 10); rate = le32(off + 12); blockAlign = le16(off + 20)
      } else if (id4 == "data") dataLen = size
      off += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    require(rate > 0 && chans > 0 && blockAlign > 0 && dataLen >= 0,
      s"doc $id: WAVE missing fmt/data chunks")
    val nSamples = dataLen / blockAlign
    MediaProbe(id, "wav", nSamples * 1000L / rate, Some(rate), Some(chans), None)
  }

  /** Walk MP4 top-level boxes to `moov`, read `mvhd` (v0/v1) for
    * timescale+duration and count `trak` children — the standard ISO BMFF
    * metadata probe, O(moov) bytes. */
  def probeMp4(id: Long, b: Array[Byte]): MediaProbe = {
    def be32(o: Int) = (0 until 4).map(i => (b(o + i) & 0xffL) << (8 * (3 - i))).sum
    def be64(o: Int) = (0 until 8).map(i => (b(o + i) & 0xffL) << (8 * (7 - i))).sum
    def tag(o: Int) = new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    var off = 0
    var moov = -1
    var moovEnd = -1L
    while (off + 8 <= b.length && moov < 0) {
      val size = be32(off)
      require(size >= 8 && size <= b.length.toLong,
        s"doc $id: corrupt MP4 box size $size at offset $off")
      if (tag(off + 4) == "moov") { moov = off + 8; moovEnd = off + size }
      off += size.toInt
    }
    require(moov >= 0, s"doc $id: no moov box in MP4 payload")
    var o = moov
    var timescale, duration = -1L
    var tracks = 0L
    while (o + 8 <= moovEnd) {
      val size = be32(o)
      require(size >= 8 && o + size <= moovEnd,
        s"doc $id: corrupt moov child box size $size at offset $o")
      tag(o + 4) match {
        case "mvhd" =>
          val version = b(o + 8) & 0xff
          if (version == 1) { timescale = be32(o + 28); duration = be64(o + 32) }
          else { timescale = be32(o + 20); duration = be32(o + 24) }
        case "trak" => tracks += 1
        case _ =>
      }
      o += size.toInt
    }
    require(timescale > 0, s"doc $id: moov has no mvhd")
    MediaProbe(id, "mp4", duration * 1000L / timescale, None, None, Some(tracks))
  }

  /** Sniff-dispatched container probe (bytes decide, not the declared
    * type — a mislabeled payload fails loudly instead of mis-probing). */
  def probeContainer(r: MediaRecord): MediaProbe = {
    val b = r.payload
    def tag(o: Int) =
      if (b.length >= o + 4) new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      else ""
    if (tag(0) == "RIFF" && tag(8) == "WAVE") probeWav(r.doc_id, b)
    else if (tag(4) == "ftyp") probeMp4(r.doc_id, b)
    else throw new IllegalArgumentException(
      s"doc ${r.doc_id}: unrecognized container (declared ${r.media_type})")
  }

  /** Partition-wise container probing (same batch shape as [[decode]]). */
  def probe(ds: Dataset[MediaRecord]): Dataset[MediaProbe] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition demuxer init would go here
      it.map(probeContainer)
    }
  }

  /** Real-encoder WAV generator for the synthetic corpus: the JDK's
    * `javax.sound` writes the RIFF container, so [[probeWav]] is graded
    * against an independent writer (16-bit little-endian PCM; deterministic
    * byte pattern). */
  def wavPcm(id: Long, sampleRate: Int, channels: Int, nSamples: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, false)
    val data = new Array[Byte](nSamples * 2 * channels)
    var i = 0
    while (i < data.length) { data(i) = ((id * 31 + i) & 0x7f).toByte; i += 1 }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  // -- audio fingerprinting (near-duplicate detection) ----------------------

  /** 256 deterministic 8-bit PCM samples from a seed text (16 md5 chunks ×
    * 16 bytes) — the synthetic AUDIO corpus generator, the audio analog of
    * [[docGrays]]: sample i is byte i of `md5(text || chunk)`. Chosen so
    * [[audioHash]] of the encoded WAV is re-derivable from md5 HEX in plain
    * SQL (unsigned 8-bit PCM WAV round-trips losslessly, and 256 samples
    * split into the hash's 64 frames at exactly 4 samples each). */
  def docSamples(text: String): Array[Int] =
    Array.range(0, 16).flatMap(c =>
      MessageDigest.getInstance("MD5")
        .digest((text + c.toString).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(_ & 0xff))

  /** Encode unsigned 8-bit mono PCM through the JDK's REAL WAV writer
    * (`javax.sound`) — the counterpart of [[pngGray8x8]] for audio: the
    * fingerprint path decodes what an independent encoder wrote. */
  def wavPcm8(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      sampleRate.toFloat, 8, 1, 1, sampleRate.toFloat, false)
    val data = samples.map(v => (v & 0xff).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /**
   * Decode a WAV payload through `javax.sound` (the REAL codec path, like
   * [[aHash]]'s ImageIO decode) and fingerprint its amplitude envelope:
   * the sample stream splits into 64 equal frames, and bit j (j < 63, the
   * top bit dropped for sign safety) is set iff frame j's mean amplitude
   * exceeds the global mean — integer-exact via cross-multiplication, so
   * an oracle can re-derive every bit arithmetically. Amplitude scaling
   * and time-local noise move few bits; [[Dedup.simhashPairs]]' pigeonhole
   * banding then finds near-duplicate AUDIO with the same bucketed-join
   * scale shape as text simhash. Fails loudly on undecodable payloads and
   * unsupported sample layouts — a corrupt corpus must not hash as silence.
   */
  def audioHash(r: MediaRecord): Long = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(r.payload))
    val fmt = ais.getFormat
    val bytes =
      try ais.readAllBytes()
      finally ais.close()
    require(fmt.getChannels == 1,
      s"doc ${r.doc_id}: mono PCM expected, got ${fmt.getChannels} channels")
    val enc = fmt.getEncoding
    val samples: Array[Long] = fmt.getSampleSizeInBits match {
      case 8 if enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED =>
        bytes.map(b => (b & 0xff).toLong)
      case 16 if enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          && !fmt.isBigEndian =>
        // signed 16-bit little-endian: envelope = sample magnitude
        val out = new Array[Long](bytes.length / 2)
        var i = 0
        while (i < out.length) {
          val v = ((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)).toShort
          out(i) = math.abs(v.toLong)
          i += 1
        }
        out
      case other => throw new IllegalArgumentException(
        s"doc ${r.doc_id}: unsupported PCM layout ($other-bit $enc)")
    }
    val n = samples.length
    require(n >= 64, s"doc ${r.doc_id}: need ≥64 samples to fingerprint, got $n")
    val total = samples.sum
    var acc = 0L
    var j = 0
    while (j < 63) {
      val from = j * n / 64
      val until = (j + 1) * n / 64
      var fs = 0L
      var k = from
      while (k < until) { fs += samples(k); k += 1 }
      // frameMean > globalMean, exactly: fs/(until-from) > total/n
      if (fs * n > total * (until - from)) acc |= (1L << j)
      j += 1
    }
    acc
  }

  /** Partition-wise audio fingerprinting, shaped for
    * [[Dedup.simhashPairs]]: columns (id, simhash). */
  def audioHashes(ds: Dataset[MediaRecord]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition codec init would go here
      it.map(r => (r.doc_id, audioHash(r)))
    }.toDF("id", "simhash")
  }

  /** Minimal ISO BMFF generator (ftyp + moov[mvhd + trak×n]) — no MP4
    * muxer exists in this environment, so the writer is synthetic; the
    * box WALKER ([[probeMp4]]) is the production parser either way. */
  def mp4Stub(timescale: Int, duration: Long, tracks: Int): Array[Byte] = {
    def box(t: String, payload: Array[Byte]): Array[Byte] =
      java.nio.ByteBuffer.allocate(payload.length + 8)
        .putInt(payload.length + 8)
        .put(t.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        .put(payload).array()
    val ftyp = box("ftyp",
      "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        Array[Byte](0, 0, 0, 1) ++
        "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val mvhdPayload = java.nio.ByteBuffer.allocate(100)
    mvhdPayload.putInt(0) // version 0 + flags
    mvhdPayload.putInt(0).putInt(0) // creation/modification time
    mvhdPayload.putInt(timescale)
    mvhdPayload.putInt(duration.toInt)
    val moov = box("moov",
      box("mvhd", mvhdPayload.array()) ++
        Array.fill(tracks)(box("trak", Array.empty[Byte])).flatten)
    ftyp ++ moov
  }
}
