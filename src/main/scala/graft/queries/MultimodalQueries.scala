package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal binary-column coverage: synthesize deterministic binary assets
  * from the documents table (no codec libs in the environment), then decode
  * metadata, slice payloads, and plan frame sampling — all as column
  * expressions whose DuckDB oracle reproduces the same byte arithmetic on
  * the equivalent BLOB.
  */
object MultimodalQueries extends QueryPack {

  // --- binary synthesis + header decode + payload stats ---------------------
  // oracle slices the ASCII source string (DuckDB blobs aren't sliceable);
  // byte-identical because the synthetic content is ASCII — the Spark side
  // slices the actual BINARY column.
  register("mm_image_meta",
    """WITH img AS (
      |  SELECT doc_id,
      |    'IMG' || lpad(CAST(32 + doc_id % 64 AS VARCHAR), 4, '0')
      |      || lpad(CAST(32 + doc_id % 48 AS VARCHAR), 4, '0')
      |      || substring(text, 1, 40) AS raw
      |  FROM documents WHERE doc_id <= 200)
      |SELECT doc_id,
      |  CAST(substring(raw, 4, 4) AS INT) AS width,
      |  CAST(substring(raw, 8, 4) AS INT) AS height,
      |  substring(raw, 1, 3) AS format,
      |  octet_length(encode(raw)) - 11 AS payload_len,
      |  CAST(substring(raw, 4, 4) AS INT) * CAST(substring(raw, 8, 4) AS INT) AS n_pixels
      |FROM img ORDER BY doc_id""".stripMargin) { (s, d) =>
    val img = Tables.documents(s, d)
      .filter(col("doc_id") <= 200)
      .select(col("doc_id"),
        Multimodal.synthImageBytes(
          lit(32) + col("doc_id") % 64,
          lit(32) + col("doc_id") % 48,
          substring(col("text"), 1, 40)).as("bytes"))
    val meta = Multimodal.decodeHeader(col("bytes"))
    img.select(col("doc_id"),
      meta.getField("width").as("width"),
      meta.getField("height").as("height"),
      meta.getField("format").as("format"),
      (octet_length(col("bytes")) - 11).as("payload_len"),
      (meta.getField("width") * meta.getField("height")).as("n_pixels"))
      .orderBy("doc_id")
  }

  // --- payload slicing + base64 transport encoding --------------------------
  register("mm_payload_slice",
    """WITH img AS (
      |  SELECT doc_id,
      |    'IMG' || lpad(CAST(32 + doc_id % 64 AS VARCHAR), 4, '0')
      |      || lpad(CAST(32 + doc_id % 48 AS VARCHAR), 4, '0')
      |      || substring(text, 1, 40) AS raw
      |  FROM documents WHERE doc_id <= 200)
      |SELECT doc_id,
      |  to_base64(encode(substring(raw, 12, 8))) AS head_b64,
      |  substring(raw, 12, 8) AS head_txt,
      |  octet_length(encode(substring(raw, 12, 100000))) AS payload_len
      |FROM img ORDER BY doc_id""".stripMargin) { (s, d) =>
    val img = Tables.documents(s, d)
      .filter(col("doc_id") <= 200)
      .select(col("doc_id"),
        Multimodal.synthImageBytes(
          lit(32) + col("doc_id") % 64,
          lit(32) + col("doc_id") % 48,
          substring(col("text"), 1, 40)).as("bytes"))
    img.select(col("doc_id"),
      base64(substring(col("bytes"), 12, 8)).as("head_b64"),
      substring(col("bytes"), 12, 8).cast(StringType).as("head_txt"),
      octet_length(Multimodal.payloadBytes(col("bytes"))).as("payload_len"))
      .orderBy("doc_id")
  }

  // --- frame-sample planning over a synthetic video column ------------------
  // n_frames from metadata; sampled offsets = every 3rd frame of 1024-byte
  // frames. Metadata-only: the payload column is never touched (column
  // pruning keeps the scan to doc_id).
  register("mm_frame_sample",
    """SELECT doc_id, n_frames,
      |  array_to_string(list_transform(
      |    list_filter(range(0, n_frames), i -> i % 3 = 0), i -> i * 1024 + 1), ',') AS offsets
      |FROM (SELECT doc_id, 4 + doc_id % 7 AS n_frames FROM documents WHERE doc_id <= 200)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") <= 200)
      .select(col("doc_id"), (lit(4) + col("doc_id") % 7).as("n_frames"))
      .withColumn("offsets",
        array_join(transform(
          Multimodal.sampleFrameOffsets(col("n_frames"), 1024, 3),
          _.cast(StringType)), ","))
      .orderBy("doc_id")
  }
}
