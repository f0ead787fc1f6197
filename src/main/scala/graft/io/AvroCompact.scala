package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for Avro part directories — same job, grouping,
  * and crash-safe manifest swap as [[FeatherCompact]] (see there for the
  * full design rationale and the streaming-consumer caveat), on the shared
  * [[Compaction]] engine. The leaf's writer schema is fixed from the first
  * part on the driver and every input resolves against it during the
  * rewrite (the connector's usual by-name resolution), so a leaf with
  * irreconcilably drifted parts fails loudly rather than silently merging.
  * Avro has no skipping sidecars, so the commit writes none. */
object AvroCompact {

  type Result = Compaction.Result

  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024,
              codec: String = "snappy"): Result =
    Compaction.run(spark, path, ".avro", targetBytes, (_, firstFile) => {
      val (schemaJson, sparkSchema, _) =
        GraftAvro.planReadFiles(spark, Seq((firstFile, Long.MaxValue)), Long.MaxValue)
      new AvroRewriter(schemaJson, sparkSchema, codec)
    })

  private class AvroRewriter(schemaJson: String,
                             sparkSchema: org.apache.spark.sql.types.StructType,
                             codec: String) extends Compaction.Rewriter {
    override def rewriteGroup(execConf: org.apache.hadoop.conf.Configuration,
                              inputs: Seq[(String, Long)],
                              tmp: Path): Option[String] = {
      val lfs = tmp.getFileSystem(execConf)
      val pw = new GraftAvro.AvroPartWriter(
        sparkSchema, schemaJson, lfs.create(tmp, true), codec)
      val open = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.avro.file.DataFileReader[
          org.apache.avro.generic.GenericRecord]]
      try {
        inputs.foreach { case (f, len) =>
          // whole-file split (0..len): one pass per input, readers retire
          // as soon as their file drains
          // splitRows closes the reader itself at end-of-split and reports
          // it via the second callback — only track liveness here
          GraftAvro.splitRows(execConf, schemaJson, f, 0L, len,
            None, open += _, open -= _)
            .foreach(pw.append)
          open.foreach(r => try r.close() catch { case _: Exception => () })
          open.clear()
        }
        pw.finish()
        None
      } catch {
        case e: Throwable => pw.abort(); throw e
      } finally open.foreach(r =>
        try r.close() catch { case _: Exception => () })
    }
  }
}
