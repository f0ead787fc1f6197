package graft.sources

import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property layer for the shared drop-directory streaming machinery: the
  * offset is durable state (it round-trips through Spark's JSON offset
  * log across restarts), so its serialization must survive every file
  * name a filesystem can produce, and admission must never lose or
  * re-admit a file regardless of listing order. Seeded, deterministic. */
class DropStreamPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // hostile-name generator: JSON metacharacters, quotes, commas, unicode,
  // spaces, backslashes — everything a producer could legally drop
  private val nameGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 24)
    parts <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf("\"", ",", "[", "]", "\\\\", "{", "}", " ", "'", ":"),
      1 -> Gen.oneOf("é", "ß", "中", "🙂", " "))) // incl. surrogate pair
  } yield "file:/drops/" + parts.mkString + ".feather"

  // inline offsets never touch a log file; a read attempt is a bug
  private val noLog: String => Set[String] =
    p => fail(s"inline offset tried to read a compact log: $p")

  test("FileSetOffset JSON round-trips arbitrary file names exactly") {
    val sets = sample(Gen.listOfN(200, Gen.chooseNum(0, 30)
      .flatMap(k => Gen.listOfN(k, nameGen).map(_.toSet))), 20260813L)
    sets.foreach { files =>
      val off = FileSetOffset(files)
      val back = FileSetOffset.fromJson(off.json(), noLog)
      assert(back.files === files, s"roundtrip lost names: ${off.json()}")
      // the log compares offsets by serialized form: equal sets must
      // serialize identically regardless of construction order
      assert(FileSetOffset(files.toSeq.reverse.toSet).json() === off.json())
    }
  }

  test("admission is exactly-once and bounded under arbitrary listings") {
    val scenarios = sample(Gen.listOfN(100, for {
      total <- Gen.chooseNum(0, 60)
      names <- Gen.listOfN(total, nameGen).map(_.distinct)
      limit <- Gen.chooseNum(1, 12)
    } yield (names, limit)), 99L)
    scenarios.foreach { case (names, limit) =>
      // a stream whose "directory" is an in-memory set, so the admission
      // logic is exercised without a filesystem
      var onDisk = Set.empty[String]
      val stream = new DropDirectoryMicroBatchStream(
          "/nonexistent", Seq(".feather"), Some(limit),
          s"${sys.props("java.io.tmpdir")}/graft_drop_ckpt_prop") {
        override protected def listFilesWithLen(): Map[String, Long] =
          onDisk.iterator.map(_ -> 0L).toMap
        override protected def planSplits(fresh: Seq[String]) =
          Array.empty[org.apache.spark.sql.connector.read.InputPartition]
        override def createReaderFactory() = null
      }
      onDisk = names.toSet
      var offset = stream.initialOffset().asInstanceOf[FileSetOffset]
      var admittedTotal = Seq.empty[String]
      var batches = 0
      while ({
        val next = stream.latestOffset(offset, ReadLimit.maxFiles(limit))
          .asInstanceOf[FileSetOffset]
        val admitted = (next.files -- offset.files).toSeq
        assert(admitted.size <= limit, s"batch over limit: $admitted")
        admittedTotal ++= admitted
        offset = next
        batches += 1
        assert(batches <= names.size + 2, "admission loop did not converge")
        admitted.nonEmpty
      }) ()
      // every file admitted exactly once, none lost, none duplicated
      assert(admittedTotal.sorted === names.sorted.toSeq)
      // a file DELETED from the directory must stay in the offset
      if (names.nonEmpty) {
        onDisk = Set.empty
        val after = stream.latestOffset(offset, ReadLimit.maxFiles(limit))
          .asInstanceOf[FileSetOffset]
        assert(after.files === offset.files, "offset shrank on deletion")
      }
    }
  }

  test("byte-budget admission greedy-packs in name order, admits every " +
       "file exactly once, and never stalls on an oversized file") {
    val scenarios = sample(Gen.listOfN(60, for {
      total <- Gen.chooseNum(0, 40)
      sizes <- Gen.listOfN(total, Gen.chooseNum(0L, 5000L))
      budget <- Gen.chooseNum(1L, 6000L)
      maxFiles <- Gen.option(Gen.chooseNum(1, 10))
    } yield (sizes, budget, maxFiles)), 4242L)
    scenarios.foreach { case (sizes, budget, maxFiles) =>
      var onDisk = sizes.zipWithIndex
        .map { case (len, i) => f"file:/drops/b$i%03d.feather" -> len }.toMap
      val stream = new DropDirectoryMicroBatchStream(
          "/nonexistent", Seq(".feather"), maxFiles,
          s"${sys.props("java.io.tmpdir")}/graft_drop_ckpt_bytes",
          maxBytesPerTrigger = Some(budget)) {
        override protected def listFilesWithLen(): Map[String, Long] = onDisk
        override protected def planSplits(fresh: Seq[String]) =
          Array.empty[org.apache.spark.sql.connector.read.InputPartition]
        override def createReaderFactory() = null
      }
      var offset = stream.initialOffset().asInstanceOf[FileSetOffset]
      var admittedTotal = Seq.empty[String]
      var batches = 0
      while ({
        val next = stream
          .latestOffset(offset, stream.getDefaultReadLimit)
          .asInstanceOf[FileSetOffset]
        val admitted = (next.files -- offset.files).toSeq.sorted
        // batch respects BOTH caps (head file exempt from the byte cap)
        maxFiles.foreach(n => assert(admitted.size <= n))
        if (admitted.size > 1)
          assert(admitted.map(onDisk).sum <= budget,
            s"multi-file batch over byte budget: $admitted")
        // greedy pack is a contiguous name-order prefix of the backlog
        val backlog = (onDisk.keySet -- offset.files).toSeq.sorted
        assert(admitted === backlog.take(admitted.size),
          "admission skipped a file out of name order")
        admittedTotal ++= admitted
        offset = next
        batches += 1
        assert(batches <= sizes.size + 2, "byte admission did not converge")
        admitted.nonEmpty
      }) ()
      // oversized files still flow (≥1 per batch): nothing is lost
      assert(admittedTotal.sorted === onDisk.keySet.toSeq.sorted)
    }
  }

  test("offsets compact into a checkpointed log and a restart picks up exactly-once") {
    val spark = graft.TestSpark.spark // compaction reads the session conf + fs
    val ckpt = java.nio.file.Files.createTempDirectory("graft_compact").toString
    def mkStream(disk: () => Set[String]) =
      new DropDirectoryMicroBatchStream("/nonexistent", Seq(".feather"),
          Some(7), ckpt) {
        override protected def listFilesWithLen(): Map[String, Long] =
          disk().iterator.map(_ -> 0L).toMap
        override protected def planSplits(fresh: Seq[String]) =
          Array.empty[org.apache.spark.sql.connector.read.InputPartition]
        override def createReaderFactory() = null
      }
    spark.conf.set("spark.graft.streaming.seenCompactThreshold", "10")
    try {
      var onDisk = (1 to 35).map(i => f"file:/drops/a$i%03d.feather").toSet
      val stream = mkStream(() => onDisk)
      var offset = stream.initialOffset().asInstanceOf[FileSetOffset]
      val admitted = scala.collection.mutable.ArrayBuffer.empty[String]
      var progressed = true
      while (progressed) {
        val next = stream.latestOffset(offset, ReadLimit.maxFiles(7))
          .asInstanceOf[FileSetOffset]
        val fresh = (next.files -- offset.files).toSeq.sorted
        admitted ++= fresh
        progressed = fresh.nonEmpty
        offset = next
      }
      // every file admitted exactly once despite compaction mid-stream
      assert(admitted.sorted.toSeq === onDisk.toSeq.sorted)
      // 35 names at threshold 10 MUST have compacted: the offset carries a
      // log reference and a small inline tail, not 35 inline names
      assert(offset.logPath.isDefined, "no compaction happened")
      assert(offset.extra.size <= 10)
      val json = offset.json()
      assert(json.contains("\"log\""))
      assert(json.length < 400, s"offset JSON did not shrink: ${json.length}")
      // the serialized offset is self-sufficient: a NEW stream instance
      // (restart) deserializes it via the checkpointed log file
      val restarted = mkStream(() => onDisk)
      val back = restarted.deserializeOffset(json).asInstanceOf[FileSetOffset]
      assert(back.files === offset.files)
      // post-restart drops admit exactly the new files, nothing replays
      onDisk ++= Seq("file:/drops/new1.feather", "file:/drops/new2.feather")
      val after = restarted.latestOffset(back, ReadLimit.maxFiles(7))
        .asInstanceOf[FileSetOffset]
      assert((after.files -- back.files) ===
        Set("file:/drops/new1.feather", "file:/drops/new2.feather"))
      // compact logs are bounded: totalFiles/threshold, not one per batch
      val logs = new java.io.File(s"$ckpt/graft-seen").listFiles()
        .filter(_.getName.endsWith(".compact"))
      assert(logs.length <= 4, s"too many compact logs: ${logs.length}")
    } finally spark.conf.unset("spark.graft.streaming.seenCompactThreshold")
  }
}
