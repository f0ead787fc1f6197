package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}

/** Offset for drop-directory streams: the SET of processed file names
  * (JSON array, persisted by Spark's offset log). A set — not a
  * high-watermark timestamp or name — means arrival order and clock skew
  * cannot lose or replay a file: any file not in the previous offset is
  * new, wherever it sorts. The set grows with file count; a production
  * long-runner would compact into a file log like Spark's
  * FileStreamSource — documented bound, not a correctness limit. */
private[sources] case class FileSetOffset(files: Set[String]) extends Offset {
  override def json(): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.writeValueAsString(files.toSeq.sorted.toArray)
  }
}

private[sources] object FileSetOffset {
  def fromJson(json: String): FileSetOffset = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    FileSetOffset(m.readValue(json, classOf[Array[String]]).toSet)
  }
}

/** Shared micro-batch machinery for incremental ingestion over a DROP
  * DIRECTORY: each micro-batch processes the files that appeared since
  * the last offset. The contract on producers is atomic drops (write
  * elsewhere, rename in; both graft sinks already commit by rename).
  *
  * ADMISSION CONTROL (`maxFilesPerTrigger`): a stream started over a
  * large backlog — thousands of dropped files after downtime — must not
  * plan them all into one micro-batch (one giant commit, no progress
  * checkpoints, restart loses everything). With the option set, each
  * trigger admits at most N new files (name order, so batch membership
  * is deterministic across restarts); Spark keeps firing triggers until
  * the backlog drains, checkpointing after each. Connectors subclass
  * with their split planning + reader factory. */
private[sources] abstract class DropDirectoryMicroBatchStream(
    path: String, suffixes: Seq[String], maxFilesPerTrigger: Option[Int])
    extends MicroBatchStream with SupportsAdmissionControl {

  require(maxFilesPerTrigger.forall(_ > 0),
    s"maxFilesPerTrigger must be positive, got ${maxFilesPerTrigger.get}")

  protected def spark: SparkSession = SparkSession.active

  /** Plan executor splits for ONLY the files new in this batch. */
  protected def planSplits(freshFiles: Seq[String]): Array[InputPartition]

  protected def listFiles(): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).iterator.map(_.getPath)
      .filter { f =>
        val n = f.getName
        suffixes.exists(n.endsWith) && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(_.toString).toSet
  }

  override def initialOffset(): Offset = FileSetOffset(Set.empty)
  override def deserializeOffset(json: String): Offset =
    FileSetOffset.fromJson(json)

  // with SupportsAdmissionControl Spark always calls the 2-arg form
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called with admission control")

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val prev = start.asInstanceOf[FileSetOffset].files
    // monotone union: a processed file DELETED from the directory must
    // stay in the offset, or it would replay on reappearing
    val fresh = (listFiles() -- prev).toSeq.sorted
    val admitted = limit match {
      case m: ReadMaxFiles => fresh.take(m.maxFiles)
      case _: ReadAllAvailable => fresh
      case _ => fresh // composite/unknown limits: admit everything
    }
    FileSetOffset(prev ++ admitted)
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val prev = start.asInstanceOf[FileSetOffset].files
    val now = end.asInstanceOf[FileSetOffset].files
    val fresh = (now -- prev).toSeq.sorted
    if (fresh.isEmpty) Array.empty else planSplits(fresh)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
