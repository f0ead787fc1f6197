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
  * Decoding real formats (JPEG/WAV/H.264) requires codec libraries that are
  * NOT in this environment — the codec is therefore a trait with the real
  * implementation stubbed (`???`) and a deterministic header-parsing fake
  * used by tests and queries. Everything Spark-side — schema, typed
  * mapPartitions plumbing, batch shape, partitioning — is real and tested.
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

  /** Codec boundary. Real decoders (JPEG/PNG/WAV) belong here; absent codec
    * libraries in this environment, only the deterministic header codec is
    * implemented. */
  trait ImageCodec extends Serializable {
    def decode(bytes: Array[Byte]): DecodedMeta
  }

  /** Real-format decoder — intentionally unimplemented (no codec libs). */
  object JpegCodec extends ImageCodec {
    def decode(bytes: Array[Byte]): DecodedMeta =
      ??? // requires an image library; not available in this environment
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
