package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for Avro part directories — same job, grouping,
  * and crash-safe manifest swap as [[FeatherCompact]] (see there for the
  * full design rationale and the streaming-consumer caveat), on the shared
  * [[Compaction]] engine. Each group's reader schema is the null-defaulted
  * UNION of its inputs' headers (the same merged form the mergeSchema
  * read uses), so a leaf holding evolved generations compacts without
  * dropping newer columns — Avro's per-file resolution fills nulls for
  * predating writers, and a field carried with two different types still
  * fails loudly by file. Avro has no skipping sidecars, so the commit
  * writes none. */
object AvroCompact {

  type Result = Compaction.Result

  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024,
              codec: String = "snappy"): Result =
    Compaction.run(spark, path, ".avro", targetBytes, (_, _) =>
      new AvroRewriter(codec))

  private class AvroRewriter(codec: String) extends Compaction.Rewriter {
    override def rewriteGroup(execConf: org.apache.hadoop.conf.Configuration,
                              inputs: Seq[(String, Long)],
                              tmp: Path): Option[String] = {
      val lfs = tmp.getFileSystem(execConf)
      val merged = GraftAvro.mergedSchemaConf(execConf, inputs)
      val schemaJson = merged.toString
      val sparkSchema = GraftAvro.toSparkType(merged)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
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
