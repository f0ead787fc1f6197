package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Small-file compaction for feather part directories — the maintenance job
  * every streaming sink needs at scale. A drop-directory sink landing one
  * part per trigger produces thousands of small files per day; scans then
  * pay a footer read and a tiny record batch per file, and the driver's
  * planning cost grows linearly in file count. Compaction bin-packs
  * neighboring small parts into files near `targetBytes` and swaps them in
  * with file-level exactly-once semantics (the reference's ecosystem solves
  * this one layer up, in table formats; a bare directory needs the job
  * itself).
  *
  * Scale design (shared engine: [[Compaction]]):
  *  - grouping is name-ordered greedy first-fit on the driver (listing
  *    only — no data read); single-file groups are never rewritten, so a
  *    second run over a compacted directory is a no-op;
  *  - each multi-file group is rewritten by ONE executor task (decode →
  *    re-encode through [[GraftFeather.FeatherPartWriter]], which also
  *    regenerates the skipping-index sidecar), groups run in parallel;
  *  - hive-style `key=value` leaves compact independently — partition
  *    values live in directory names, so rows never cross leaves;
  *  - the swap is crash-safe via a manifest: `_compact/<out>.json` listing
  *    the inputs is written BEFORE the output rename, and deleted after the
  *    inputs are. Recovery on the next run completes a half-done swap
  *    (output present → delete leftover inputs) or discards a half-written
  *    output (no rename happened → inputs intact, group re-planned).
  *    Output names are deterministic (group id + hash of input names), so
  *    recovery and re-runs converge.
  *
  * NOT safe to run concurrently with another writer of the same leaf, or
  * under a name-based streaming consumer ([[graft.sources.DropDirectoryStream]]
  * tracks processed file NAMES — a compacted output is a new name and
  * would replay; the same caveat applies to Spark's FileStreamSource).
  */
object FeatherCompact {

  type Result = Compaction.Result

  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024,
              codec: String = "lz4", batchSize: Int = 4096): Result =
    Compaction.run(spark, path, ".feather", targetBytes, (_, _) =>
      new FeatherRewriter(codec, batchSize))

  private class FeatherRewriter(codec: String,
                                batchSize: Int) extends Compaction.Rewriter {
    override def rewriteGroup(execConf: org.apache.hadoop.conf.Configuration,
                              inputs: Seq[(String, Long)],
                              tmp: Path): Option[String] = {
      val lfs = tmp.getFileSystem(execConf)
      // the group's schema is the UNION of its inputs' footers — a leaf
      // holding evolved generations compacts without dropping the columns
      // only newer parts carry (predating rows fill null, same contract
      // as the mergeSchema read); one homogeneous leaf reduces to its own
      // schema exactly as before
      val schema = StructType(
        GraftFeather.readFieldsMergedConf(execConf, inputs)
          .map(f => org.apache.spark.sql.types.StructField(
            f.getName, GraftFeather.toSparkType(f), f.isNullable)))
      val pw = new GraftFeather.FeatherPartWriter(
        schema, lfs.create(tmp, true), codec, batchSize)
      val readers = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.arrow.vector.ipc.ArrowFileReader]
      try {
        inputs.foreach { case (f, len) =>
          // one reader open per input: allRows derives the batch count
          // from the footer it already parsed
          GraftFeather.allRows(execConf, f, len,
            schema.fieldNames.toSeq, readers += _, lenient = true)
            .foreach(pw.append)
          // retire each input's reader as soon as it drains — a group of
          // thousands of tiny files must not hold every file's buffers
          // until the group ends
          readers.foreach(r => try r.close() catch { case _: Exception => () })
          readers.clear()
        }
        pw.finish()
        Some(FeatherStats.toJson(pw.batchStats))
      } catch {
        case e: Throwable => pw.abort(); throw e
      } finally readers.foreach(r =>
        try r.close() catch { case _: Exception => () })
    }
  }
}
