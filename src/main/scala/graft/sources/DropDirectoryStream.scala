package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxBytes, ReadMaxFiles, SupportsAdmissionControl}

/** Offset for drop-directory streams: the SET of processed file names. A
  * set — not a high-watermark timestamp or name — means arrival order and
  * clock skew cannot lose or replay a file: any file not in the previous
  * offset is new, wherever it sorts.
  *
  * COMPACTION: the set grows with total files seen, and Spark persists the
  * offset JSON on every micro-batch — at 10⁵ files a drop directory would
  * rewrite megabytes of names per trigger. Above a threshold the set
  * compacts into a checkpointed LOG FILE (sorted names, one per line,
  * written atomically) and the offset JSON shrinks to
  * `{"log": <path>, "extra": [names since compaction]}`; the inline form
  * stays a plain JSON array, so offsets written by older runs still
  * deserialize. This is the same shape as Spark's FileStreamSource compact
  * batch log. Compacted logs live under the stream's own checkpoint
  * location, so a restart that replays the offset can always re-read them
  * (they are never deleted: an earlier retained offset may still reference
  * an earlier log, and the log count is bounded by totalFiles/threshold).
  *
  * `base` is the compacted portion (content of `logPath`), `extra` the
  * names added since. */
private[sources] case class FileSetOffset(base: Set[String],
                                          extra: Set[String],
                                          logPath: Option[String]) extends Offset {
  def files: Set[String] = base ++ extra
  override def json(): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    logPath match {
      case None => m.writeValueAsString(files.toSeq.sorted.toArray)
      case Some(p) =>
        val node = m.createObjectNode()
        node.put("log", p)
        val arr = node.putArray("extra")
        extra.toSeq.sorted.foreach(arr.add)
        m.writeValueAsString(node)
    }
  }
}

private[sources] object FileSetOffset {
  def apply(files: Set[String]): FileSetOffset =
    FileSetOffset(Set.empty, files, None)

  /** Deserializes either offset form; `readLog` loads a compacted log file
    * (filesystem access lives with the caller, which has the Hadoop conf). */
  def fromJson(json: String, readLog: String => Set[String]): FileSetOffset = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.readTree(json)
    if (root.isArray) {
      val it = root.elements()
      val b = Set.newBuilder[String]
      while (it.hasNext) b += it.next().asText()
      FileSetOffset(Set.empty, b.result(), None)
    } else {
      val log = root.get("log").asText()
      val it = root.get("extra").elements()
      val b = Set.newBuilder[String]
      while (it.hasNext) b += it.next().asText()
      FileSetOffset(readLog(log), b.result(), Some(log))
    }
  }
}

/** Shared micro-batch machinery for incremental ingestion over a DROP
  * DIRECTORY: each micro-batch processes the files that appeared since
  * the last offset. The contract on producers is atomic drops (write
  * elsewhere, rename in; both graft sinks already commit by rename).
  *
  * ADMISSION CONTROL (`maxFilesPerTrigger` / `maxBytesPerTrigger`): a
  * stream started over a large backlog — thousands of dropped files
  * after downtime — must not plan them all into one micro-batch (one
  * giant commit, no progress checkpoints, restart loses everything).
  * With `maxFilesPerTrigger`, each trigger admits at most N new files;
  * with `maxBytesPerTrigger`, files greedy-pack into the byte budget in
  * name order and admission stops at the first file that would overflow
  * it (contiguous name order, so batch membership is deterministic
  * across restarts) — but always at least ONE file, or a single
  * over-budget file would stall the stream forever. A crawl drop
  * arrives as a mix of 10-GB dumps and kilobyte pages: a count cap
  * alone lets one giant batch stall a trigger while a thousand tiny
  * files under-fill the next, so the byte budget is the one that keeps
  * trigger latency flat. Both caps compose (Spark's composite limit):
  * a batch closes at whichever cap it hits first.
  *
  * OFFSET COMPACTION: once more than
  * `spark.graft.streaming.seenCompactThreshold` (default 4096) names sit
  * inline in the offset, the full set is written to
  * `<checkpointLocation>/graft-seen/<size>.compact` and subsequent offsets
  * carry only the log reference plus the inline tail — see
  * [[FileSetOffset]]. Connectors subclass with their split planning +
  * reader factory. */
private[sources] abstract class DropDirectoryMicroBatchStream(
    path: String, suffixes: Seq[String], maxFilesPerTrigger: Option[Int],
    checkpointLocation: String,
    maxBytesPerTrigger: Option[Long] = None)
    extends MicroBatchStream with SupportsAdmissionControl {

  require(maxFilesPerTrigger.forall(_ > 0),
    s"maxFilesPerTrigger must be positive, got ${maxFilesPerTrigger.get}")
  require(maxBytesPerTrigger.forall(_ > 0),
    s"maxBytesPerTrigger must be positive, got ${maxBytesPerTrigger.get}")

  protected def spark: SparkSession = SparkSession.active

  /** Plan executor splits for ONLY the files new in this batch. */
  protected def planSplits(freshFiles: Seq[String]): Array[InputPartition]

  /** Eligible drop files with their byte lengths (admission needs both). */
  protected def listFilesWithLen(): Map[String, Long] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Map.empty
    else fs.listStatus(p).iterator
      .filter { f =>
        val n = f.getPath.getName
        suffixes.exists(n.endsWith) && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(f => f.getPath.toString -> f.getLen).toMap
  }

  protected def listFiles(): Set[String] = listFilesWithLen().keySet

  // defensive session lookup: the threshold is tunable per session, but
  // the offset arithmetic itself must not require one (property tests
  // drive the admission logic sessionless)
  private def compactThreshold: Int =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.conf.get("spark.graft.streaming.seenCompactThreshold", "4096"))
      .getOrElse("4096").toInt

  private def hadoopConf = spark.sparkContext.hadoopConfiguration

  // the log is a JSON ARRAY, not newline-delimited text: file names may
  // legally contain newlines (the inline offset form round-trips them via
  // JSON escaping, and the property spec pins exotic names) — the compact
  // form must not corrupt what the inline form preserves
  private def readSeenLog(log: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(log)
    val fs = p.getFileSystem(hadoopConf)
    val in = fs.open(p)
    val text =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        "UTF-8")
      finally in.close()
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.readValue(text, classOf[Array[String]]).toSet
  }

  /** Atomic write (tmp + rename) of the full seen-set; name keyed by set
    * size, which strictly increases between compactions, so a replayed
    * `latestOffset` after restart rewrites the same name with the same
    * content instead of colliding. The rename result is CHECKED: silently
    * persisting an offset that references a log the rename never produced
    * would brick every later restart. */
  private def writeSeenLog(files: Set[String]): String = {
    val dir = new org.apache.hadoop.fs.Path(checkpointLocation, "graft-seen")
    val fs = dir.getFileSystem(hadoopConf)
    fs.mkdirs(dir)
    val fin = new org.apache.hadoop.fs.Path(dir, f"${files.size}%012d.compact")
    val tmp = new org.apache.hadoop.fs.Path(dir, f".${files.size}%012d.tmp")
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val out = fs.create(tmp, true)
    try out.write(m.writeValueAsString(files.toSeq.sorted.toArray)
      .getBytes("UTF-8"))
    finally out.close()
    fs.delete(fin, false) // replay-safe: same name ⇒ same content
    require(fs.rename(tmp, fin), s"seen-log rename $tmp -> $fin failed")
    fin.toString
  }

  override def initialOffset(): Offset = FileSetOffset(Set.empty)
  override def deserializeOffset(json: String): Offset =
    FileSetOffset.fromJson(json, readSeenLog)

  // with SupportsAdmissionControl Spark always calls the 2-arg form
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called with admission control")

  override def getDefaultReadLimit: ReadLimit = {
    val limits = maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n)).toSeq ++
      maxBytesPerTrigger.map(b => ReadLimit.maxBytes(b)).toSeq
    limits match {
      case Seq() => ReadLimit.allAvailable()
      case Seq(one) => one
      case both => ReadLimit.compositeLimit(both.toArray)
    }
  }

  /** Greedy byte-budget pack in name order, stopping at the FIRST file
    * that would overflow either cap — contiguous prefixes keep batch
    * membership deterministic and replay-stable (skipping an oversized
    * file to pack later small ones would process out of name order). An
    * empty batch never helps, so the head file always admits even when
    * it alone busts the byte budget. */
  private def admit(fresh: Seq[(String, Long)], maxFiles: Option[Int],
                    maxBytes: Option[Long]): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var bytes = 0L
    var stop = false
    val it = fresh.iterator
    while (!stop && it.hasNext) {
      val (f, len) = it.next()
      if (maxFiles.exists(out.size >= _)) stop = true
      else if (maxBytes.exists(b => out.nonEmpty && bytes + len > b))
        stop = true
      else { out += f; bytes += len }
    }
    out.toSeq
  }

  private def capsOf(limit: ReadLimit): (Option[Int], Option[Long]) =
    limit match {
      case m: ReadMaxFiles => (Some(m.maxFiles), None)
      case b: ReadMaxBytes => (None, Some(b.maxBytes))
      case c: CompositeReadLimit =>
        val parts = c.getReadLimits.map(capsOf)
        (parts.flatMap(_._1).minOption, parts.flatMap(_._2).minOption)
      case _: ReadAllAvailable => (None, None)
      case _ => (None, None) // unknown limits: admit everything
    }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val prev = start.asInstanceOf[FileSetOffset]
    // monotone union: a processed file DELETED from the directory must
    // stay in the offset, or it would replay on reappearing
    val fresh = listFilesWithLen().view
      .filterKeys(f => !prev.files(f)).toSeq.sortBy(_._1)
    val (maxF, maxB) = capsOf(limit)
    val admitted = admit(fresh, maxF, maxB)
    val next = FileSetOffset(prev.base, prev.extra ++ admitted, prev.logPath)
    if (next.extra.size <= compactThreshold) next
    else {
      // the log is written BEFORE the offset referencing it is persisted
      // (Spark serializes this return value into the offset log), so a
      // crash between the two leaves only an orphan log file, never a
      // dangling reference
      val all = next.files
      FileSetOffset(all, Set.empty, Some(writeSeenLog(all)))
    }
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
