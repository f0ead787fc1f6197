package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata (north-star extension; the reference's data model stops at
  * lists/structs — binary payload columns are the Spark-native extension a
  * 100 TB training-data pipeline needs).
  *
  * Layout contract: one row per asset, `bytes BINARY` + a metadata struct.
  * Parquet stores binary pages with its usual encodings; column pruning
  * means metadata-only queries never read the payload pages, and
  * `spark.sql.files.maxPartitionBytes` keeps payload scans within executor
  * memory at any corpus size.
  *
  * Decoding: [[Multimodal.ImageIoCodec]] is a REAL decoder over the JDK's
  * built-in ImageIO codecs (JPEG/PNG/GIF/BMP — no external library), spec'd
  * against bitstreams produced by the JDK encoders. Video/audio bitstream
  * codecs (H.264/WAV-PCM beyond energy) have no in-JVM decoder here; the
  * driver-generated synthetic payloads use the deterministic
  * [[Multimodal.HeaderCodec]] because their bytes are fake headers, not
  * real bitstreams. Everything Spark-side — schema, typed mapPartitions
  * plumbing, batch shape, partitioning — is real and tested.
  */
object Multimodal {

  /** Metadata carried next to the payload (image flavor). */
  val imageMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Synthetic asset: 'IMG' + 4-digit width + 4-digit height + payload.
    * Deterministic from (id, payload seed) so oracles can reproduce it. */
  def synthImageBytes(width: Column, height: Column, payload: Column): Column =
    concat(lit("IMG"),
      lpad(width.cast(StringType), 4, "0"),
      lpad(height.cast(StringType), 4, "0"),
      payload).cast(BinaryType)

  /** Header-decode as pure column expressions (codegen'd): binary → typed
    * metadata. Real formats would go through [[ImageCodec.decode]] in a
    * typed mapPartitions (see decodeBatch). */
  def decodeHeader(bytes: Column): Column = struct(
    substring(bytes, 4, 4).cast(StringType).cast(IntegerType).as("width"),
    substring(bytes, 8, 4).cast(StringType).cast(IntegerType).as("height"),
    substring(bytes, 1, 3).cast(StringType).as("format"))

  /** Payload (everything after the 11-byte header). */
  def payloadBytes(bytes: Column): Column =
    substring(bytes, 12, Int.MaxValue)

  /** Offsets of sampled frames for a synthetic 'video' whose payload is
    * concatenated fixed-size frames: every `stride`-th frame's 1-based byte
    * offset — what a distributed decoder would fetch. Pure arithmetic, no
    * shuffle, prunes to metadata only. */
  def sampleFrameOffsets(nFrames: Column, frameSize: Int, stride: Int): Column =
    transform(
      filter(sequence(lit(0), nFrames - 1), i => i % stride === 0),
      i => i * frameSize + 1)

  // --------------------------------------------------------------------------
  // Typed decode path (the real-codec route)
  // --------------------------------------------------------------------------

  final case class Asset(asset_id: Long, bytes: Array[Byte])
  final case class DecodedMeta(asset_id: Long, width: Int, height: Int,
                               format: String, payloadLen: Int, checksum: Long)

  /** Codec boundary. [[ImageIoCodec]] is the real decoder (JDK ImageIO —
    * JPEG/PNG/GIF/BMP ship with the JVM, no external library);
    * [[HeaderCodec]] decodes the driver-generated synthetic payloads whose
    * header is a fake (not a real bitstream). */
  trait ImageCodec extends Serializable {
    def decode(bytes: Array[Byte]): DecodedMeta
  }

  /** Real-format decoder over the JDK's ImageIO codecs (JPEG/PNG/GIF/BMP).
    * Dimensions come from the header read (cheap — no raster decode); the
    * checksum folds the fully-decoded RGB raster, so two files with equal
    * pixels checksum equal regardless of container bytes. Headless-safe:
    * decoding never touches the display pipeline. */
  object ImageIoCodec extends ImageCodec {
    /** Raster allocation cap (~256 MB ARGB). Header dimensions are
      * attacker-controlled bytes: without this, one crafted/corrupt file
      * claiming 2^15×2^15 pixels OOMs the executor at `read` time instead
      * of failing the row. */
    val MaxPixels: Long = 1L << 26

    def decode(bytes: Array[Byte]): DecodedMeta = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, "no ImageIO codec matches the payload")
        val r = readers.next()
        try {
          r.setInput(iis)
          val (w, h) = (r.getWidth(0), r.getHeight(0))
          require(w > 0 && h > 0 && w.toLong * h <= MaxPixels,
            s"image dimensions ${w}x$h exceed the $MaxPixels-pixel " +
              "decode guard (crafted header?)")
          val fmt = r.getFormatName.toLowerCase
          val img = r.read(0)
          var ck = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              ck = (ck * 31 + (img.getRGB(x, y) & 0xffffff)) % 1000000007L
              x += 1
            }
            y += 1
          }
          DecodedMeta(-1L, w, h, fmt, bytes.length, ck)
        } finally r.dispose()
      } finally iis.close()
    }
  }

  /** Alias kept for the original codec-boundary name. */
  val JpegCodec: ImageCodec = ImageIoCodec

  final case class AudioMeta(asset_id: Long, sampleRate: Int, channels: Int,
                             bitsPerSample: Int, nFrames: Long, durationMs: Double)

  /** Real WAV (RIFF) container decode — pure byte arithmetic, no codec
    * library: walks the chunk list (not a fixed 44-byte assumption — files
    * with LIST/fact chunks before `data` parse correctly), reads the PCM
    * fmt fields little-endian, and derives frame count and duration from
    * the data chunk length. */
  object WavCodec extends Serializable {
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    private def fourCC(b: Array[Byte], i: Int): String =
      new String(b, i, 4, "US-ASCII")

    def decode(bytes: Array[Byte]): AudioMeta = {
      require(bytes.length >= 12 && fourCC(bytes, 0) == "RIFF" &&
        fourCC(bytes, 8) == "WAVE", "not a RIFF/WAVE payload")
      var i = 12
      var rate = -1; var channels = -1; var bits = -1
      var dataLen = -1L
      while (i + 8 <= bytes.length && (rate < 0 || dataLen < 0)) {
        val id = fourCC(bytes, i)
        // Unsigned 32-bit size kept in a Long: a crafted size like
        // 0xFFFFFFF8 must not wrap to a negative Int (which would make the
        // advance zero/negative and spin an executor task forever).
        val size = le32(bytes, i + 4).toLong & 0xffffffffL
        if (id == "fmt ") {
          require(size >= 16 && i + 8 + size <= bytes.length,
            s"malformed RIFF: fmt chunk at offset $i claims $size bytes " +
              s"(payload ${bytes.length})")
          channels = le16(bytes, i + 10)
          rate = le32(bytes, i + 12)
          bits = le16(bytes, i + 22)
        } else if (id == "data") {
          // Tolerate a truncated final data chunk (common in streamed WAVs)
          // but never a data chunk that claims bytes past the end with more
          // chunks still needed after it.
          dataLen = math.min(size, bytes.length - (i + 8).toLong)
        } else {
          require(i + 8 + size <= bytes.length,
            s"malformed RIFF: chunk '$id' at offset $i claims $size bytes " +
              s"(payload ${bytes.length})")
        }
        // Word-aligned advance in Long space; clamp so i stays a valid Int
        // and the loop guard terminates on truncated input.
        val next = i.toLong + 8L + size + (size & 1L)
        i = math.min(next, bytes.length.toLong).toInt
      }
      require(rate > 0 && dataLen >= 0, "missing fmt /data chunk")
      val frameBytes = channels * (bits / 8)
      val nFrames = if (frameBytes > 0) dataLen / frameBytes else 0L
      AudioMeta(-1L, rate, channels, bits, nFrames,
        nFrames * 1000.0 / rate)
    }
  }

  /** Batch WAV decode over partitions — same typed mapPartitions shape as
    * [[decodeBatch]]. */
  def decodeWavBatch(assets: Dataset[Asset]): Dataset[AudioMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(a => WavCodec.decode(a.bytes).copy(asset_id = a.asset_id)))
  }

  /** Deterministic fake: parses the synthetic 'IMG'+WWWW+HHHH header and
    * checksums the payload — exercises the full typed batch path. */
  object HeaderCodec extends ImageCodec {
    def decode(bytes: Array[Byte]): DecodedMeta = {
      val s = new String(bytes, 0, 11, "UTF-8")
      val payloadLen = bytes.length - 11
      var ck = 0L
      var i = 11
      while (i < bytes.length) { ck = (ck * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
      DecodedMeta(-1L, s.substring(3, 7).toInt, s.substring(7, 11).toInt,
        s.substring(0, 3), payloadLen, ck)
    }
  }

  /** Batch decode over partitions: the Scala analogue of a pandas-UDF
    * `mapInPandas` decode — one codec instance per partition, payload bytes
    * stream through without collecting. */
  def decodeBatch(assets: Dataset[Asset], codec: ImageCodec): Dataset[DecodedMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a => codec.decode(a.bytes).copy(asset_id = a.asset_id) }
    }
  }
}
