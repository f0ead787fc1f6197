package graft.io

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet tables — the parquet face of the
  * shared [[Compaction]] engine (see [[FeatherCompact]] for the design
  * rationale: grouping, crash-safety, the snapshot-mode manifest swap).
  *
  * The group rewrite is a BINARY row-group append
  * (`ParquetFileWriter.appendFile`): each input's row groups copy into
  * the output byte-for-byte — no decode, no re-encode, no statistics
  * loss (the copied row-group metadata carries its min/max through), so
  * a task's cost is IO-bound like the feather face's batch copy. The
  * stats sidecar regenerates from the OUTPUT footer.
  *
  * Binary append requires every input in a group to carry the SAME
  * parquet schema; a leaf whose generations have evolved refuses loudly
  * — run [[FeatherCluster.cluster]] (a decode rewrite through Spark)
  * to re-unify the leaf first. DV-bound files never reach this rewriter
  * (the shared engine decode-folds them via the face reader). */
object ParquetCompact {

  type Result = Compaction.Result

  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): Result =
    Compaction.run(spark, path, ".parquet", targetBytes,
      (_, _) => new ParquetRewriter)

  private class ParquetRewriter extends Compaction.Rewriter {
    override def rewriteGroup(execConf: org.apache.hadoop.conf.Configuration,
                              inputs: Seq[(String, Long)],
                              tmp: Path): Option[String] = {
      val footers = inputs.map { case (f, _) =>
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f), execConf))
        try (f, r.getFooter.getFileMetaData)
        finally r.close()
      }
      val schemas = footers.map(_._2.getSchema).distinct
      require(schemas.size == 1,
        s"parquet compaction group mixes schemas " +
          s"(${footers.map(f => new Path(f._1).getName).mkString(", ")}): " +
          "binary row-group append needs one schema — run cluster() " +
          "(a decode rewrite) to re-unify the evolved leaf first")
      val writer = new ParquetFileWriter(
        HadoopOutputFile.fromPath(tmp, execConf), schemas.head,
        ParquetFileWriter.Mode.OVERWRITE, 128L << 20,
        8 << 20 /* parquet-mr's default max padding */)
      // close() in the finally releases the output stream when a corrupt
      // input aborts the append mid-group (end() already closed it on
      // success — close() is then an idempotent no-op); without it the
      // executor leaks the FD (and on HDFS the open lease can fail the
      // retry's OVERWRITE create)
      try {
        writer.start()
        inputs.foreach { case (f, _) =>
          writer.appendFile(HadoopInputFile.fromPath(new Path(f), execConf)) }
        // identical schemas ⇒ identical Spark schema-json footer keys; the
        // first input's key-value metadata rides the output so read-back
        // types stay exact
        writer.end(footers.head._2.getKeyValueMetaData)
      } finally {
        try writer.close() catch { case _: Exception => () }
      }
      Some(FeatherStats.toJson(
        GraftParquet.footerBatches(execConf, tmp.toString)))
    }
  }
}
