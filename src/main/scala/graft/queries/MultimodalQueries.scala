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

  // --- nearest-neighbor resize over the payload pixel grid ------------------
  // The payload is a row-major 8×5 "pixel" grid (one ASCII byte per pixel);
  // a 2× downsample gathers source pixel (2r, 2c) for each target pixel —
  // the actual index arithmetic of NN resize, as pure per-row codegen
  // expressions. A real decoder would run the identical gather over decoded
  // RGB in the typed decodeBatch path; only the pixel source is faked here
  // (no codec libs), not the resize math or the Spark plumbing.
  register("mm_resize_nn",
    """WITH img AS (SELECT doc_id, substring(text, 1, 40) AS pay
      |  FROM documents WHERE doc_id <= 200 AND length(text) >= 40)
      |SELECT doc_id, 4 AS out_w, 2 AS out_h,
      |  array_to_string(list_transform(range(0, 8),
      |    i -> substring(pay, CAST((i // 4) * 16 + (i % 4) * 2 + 1 AS INT), 1)), '') AS resized,
      |  substring(pay, 1, 8) AS src_row0
      |FROM img ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") <= 200 && length(col("text")) >= 40)
      .select(col("doc_id"), substring(col("text"), 1, 40).as("pay"))
      .select(col("doc_id"), lit(4).as("out_w"), lit(2).as("out_h"),
        array_join(expr("transform(sequence(0, 7), " +
          "i -> substring(pay, (i div 4) * 16 + (i % 4) * 2 + 1, 1))"), "").as("resized"),
        substring(col("pay"), 1, 8).as("src_row0"))
      .orderBy("doc_id")
  }

  // --- audio feature extraction: windowed energy over PCM-style samples -----
  // The payload's bytes stand in for 8-bit PCM samples; per-window energy
  // (sum of squared centered samples over 16-sample windows) and whole-clip
  // RMS are the canonical first features an audio pipeline extracts before
  // filtering/segmenting. Window fold is a per-row HOF — no shuffle; at
  // corpus scale this runs entirely map-side like the tokenize pass.
  register("mm_audio_energy",
    """WITH a AS (SELECT doc_id, substring(text, 1, 64) AS pay
      |  FROM documents WHERE doc_id <= 200 AND length(text) >= 64),
      |e AS (SELECT doc_id,
      |    list_transform(range(0, 4), w -> list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, 17),
      |        i -> CAST((ascii(substring(pay, CAST(w*16 + i AS INT), 1)) - 96)
      |             * (ascii(substring(pay, CAST(w*16 + i AS INT), 1)) - 96) AS BIGINT))),
      |      (x, y) -> x + y)) AS en
      |  FROM a)
      |SELECT doc_id, array_to_string(en, ',') AS win_energy,
      |  round(sqrt((en[1] + en[2] + en[3] + en[4]) / 64.0), 6) AS rms
      |FROM e ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") <= 200 && length(col("text")) >= 64)
      .select(col("doc_id"), substring(col("text"), 1, 64).as("pay"))
      .withColumn("en", expr("transform(sequence(0, 3), " +
        "w -> aggregate(transform(sequence(1, 16), " +
        "i -> cast((ascii(substring(pay, w*16 + i, 1)) - 96) " +
        "* (ascii(substring(pay, w*16 + i, 1)) - 96) as bigint)), 0L, (x, y) -> x + y))"))
      .select(col("doc_id"),
        array_join(expr("transform(en, x -> cast(x as string))"), ",").as("win_energy"),
        round(sqrt((element_at(col("en"), 1) + element_at(col("en"), 2)
          + element_at(col("en"), 3) + element_at(col("en"), 4)) / 64.0), 6).as("rms"))
      .orderBy("doc_id")
  }

  // --- asset dedup by payload content digest --------------------------------
  // The image-dedup staple: identical payload BYTES collapse regardless of
  // differing header metadata (two assets with different declared sizes but
  // the same pixels dedup together). The digest is computed next to the
  // scan — payload pages stream through md5 once and only the (16-byte
  // digest, id) pair shuffles; at 100 TB the shuffle is metadata-sized
  // while the binary column never leaves its scan stage.
  register("mm_payload_dedup",
    """WITH img AS (
      |  SELECT doc_id, substring(text, 1, 40) AS payload
      |  FROM documents WHERE doc_id <= 400)
      |SELECT md5(payload) AS digest, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM img GROUP BY 1 ORDER BY digest""".stripMargin) { (s, d) =>
    val img = Tables.documents(s, d)
      .filter(col("doc_id") <= 400)
      .select(col("doc_id"),
        Multimodal.synthImageBytes(
          lit(32) + col("doc_id") % 64, // headers differ per doc —
          lit(32) + col("doc_id") % 48, // dedup must ignore them
          substring(col("text"), 1, 40)).as("bytes"))
    img
      .select(col("doc_id"), md5(Multimodal.payloadBytes(col("bytes"))).as("digest"))
      .groupBy(col("digest"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("digest")
  }
}
