package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.CopyInto
import graft.sources.FeatherSnapshots

/** COPY INTO (io/CopyInto): idempotent batch file ingestion — the
  * loader statement a crawl pipeline re-runs after every failure. The
  * ledger diff, the create-exclusive intent serialization, and the
  * digest-tagged crash healing each get a case. */
class CopyIntoSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def tmp(n: String): String = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_copy/$n"
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe)
      f.delete(): Unit
    }
    wipe(new java.io.File(p))
    p
  }
  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def headVersion(p: String): Long =
    FeatherSnapshots.resolve(fsOf(p), new Path(p), None).get.version

  private def newTable(path: String): Unit = {
    import spark.implicits._
    (1 to 100).map(i => (i.toLong, i * 1.0)).toDF("id", "amt")
      .coalesce(1)
      .write.format("feather").mode("overwrite")
      .option("snapshots", "true").save(path)
  }
  private def writeBatch(dir: String, ids: Range): Unit = {
    import spark.implicits._
    ids.map(i => (i.toLong, i * 1.0)).toDF("id", "amt")
      .coalesce(1).write.mode("append").parquet(dir)
  }

  test("COPY INTO ingests a batch once: the re-run skips every file " +
       "and publishes no version") {
    val path = tmp("basic"); val src = tmp("basic_src")
    newTable(path)
    writeBatch(src, 1001 to 1050)
    val r1 = CopyInto.run(spark, path, src, "parquet")
    assert(r1.filesIngested === 1 && r1.filesSkipped === 0)
    assert(spark.read.format("feather").load(path).count() === 150)
    val v1 = headVersion(path)
    val r2 = CopyInto.run(spark, path, src, "parquet")
    assert(r2.filesIngested === 0 && r2.filesSkipped === 1)
    assert(headVersion(path) === v1, "a no-op COPY publishes no version")
    assert(spark.read.format("feather").load(path).count() === 150)
  }

  test("incremental batches: only never-ingested files read; a file " +
       "REWRITTEN in place under the same name is NOT re-ingested " +
       "(path-keyed, the Delta COPY INTO contract)") {
    import spark.implicits._
    val path = tmp("incr"); val src = tmp("incr_src")
    newTable(path)
    writeBatch(src, 1001 to 1020)
    CopyInto.run(spark, path, src, "parquet"): Unit
    // batch B arrives later
    writeBatch(src, 2001 to 2030)
    val r2 = CopyInto.run(spark, path, src, "parquet")
    assert(r2.filesIngested === 1 && r2.filesSkipped === 1)
    assert(spark.read.format("feather").load(path).count() === 150)
    // rewrite an already-ingested file in place: same path, new rows
    val first = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).minBy(_.getName)
    Seq((9999L, 9.9)).toDF("id", "amt").coalesce(1)
      .write.mode("overwrite").parquet(s"$src/rewrite_tmp")
    val repl = new java.io.File(s"$src/rewrite_tmp").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(repl.toPath, first.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe); f.delete(): Unit }
    wipe(new java.io.File(s"$src/rewrite_tmp"))
    val r3 = CopyInto.run(spark, path, src, "parquet")
    assert(r3.filesIngested === 0 && r3.filesSkipped === 2,
      s"path-keyed ledger must skip the rewritten file: $r3")
  }

  test("pattern filters by file name; hidden files and _dirs never " +
       "ingest") {
    val path = tmp("pattern"); val src = tmp("pattern_src")
    newTable(path)
    writeBatch(src, 1001 to 1010) // part-*.parquet (+_SUCCESS, skipped)
    val stray = new java.io.File(src, "notes.txt")
    val w = new java.io.FileWriter(stray); w.write("not data"); w.close()
    val r = CopyInto.run(spark, path, src, "parquet",
      pattern = Some("*.parquet"))
    assert(r.filesIngested === 1 && r.filesSkipped === 0,
      s"the glob must exclude the stray .txt: $r")
  }

  test("csv sources read under the TABLE's imposed schema") {
    import spark.implicits._
    val path = tmp("csv"); val src = tmp("csv_src")
    newTable(path)
    (501 to 520).map(i => (i.toLong, i * 1.0)).toDF("id", "amt")
      .coalesce(1).write.csv(src)
    val r = CopyInto.run(spark, path, src, "csv")
    assert(r.filesIngested === 1)
    val got = spark.read.format("feather").load(path)
    assert(got.where(col("id") === 510L && col("amt") === 510.0)
      .count() === 1, "csv rows must land typed by the table's schema")
  }

  test("COPY INTO a hive-partitioned table routes rows per leaf") {
    import spark.implicits._
    val path = tmp("part"); val src = tmp("part_src")
    graft.io.ParquetTable.write(
      (1 to 90).map(i => (i.toLong, s"d${i % 3}")).toDF("id", "day"),
      path, partitionBy = Seq("day"))
    (1001 to 1030).map(i => (i.toLong, s"d${i % 3}")).toDF("id", "day")
      .coalesce(1).write.parquet(src)
    val r = CopyInto.run(spark, path, src, "parquet")
    assert(r.filesIngested === 1)
    val got = graft.io.ParquetTable.read(spark, path)
    assert(got.count() === 120)
    assert(got.where(col("id") > 1000L && col("day") === "d1")
      .count() === 10)
    (0 to 2).foreach(d => assert(
      new java.io.File(s"$path/day=d$d").isDirectory))
  }

  test("an extra source column refuses with evolution guidance and " +
       "leaves NO blocking intent (the next run proceeds)") {
    import spark.implicits._
    val path = tmp("refuse"); val src = tmp("refuse_src")
    newTable(path)
    (1 to 5).map(i => (i.toLong, i * 1.0, "extra")).toDF("id", "amt", "x")
      .coalesce(1).write.parquet(src)
    val e = intercept[IllegalArgumentException] {
      CopyInto.run(spark, path, src, "parquet")
    }
    assert(e.getMessage.contains("never evolves the schema"))
    // the refusal released its intent: a corrected source ingests
    val src2 = tmp("refuse_src2")
    writeBatch(src2, 2001 to 2005)
    val r = CopyInto.run(spark, path, src2, "parquet")
    assert(r.filesIngested === 1)
  }

  test("crash healing: a committed batch whose ledger publish crashed " +
       "is healed from the intent — never re-ingested") {
    val path = tmp("heal"); val src = tmp("heal_src")
    newTable(path)
    writeBatch(src, 1001 to 1040)
    CopyInto.run(spark, path, src, "parquet"): Unit
    val count1 = spark.read.format("feather").load(path).count()
    val v1 = headVersion(path)
    // simulate the crash window: ledger gone, intent back in place
    val fs = fsOf(path)
    val copyDir = new Path(path, "_copy")
    val ledger = new Path(copyDir, "ledger-v00000001.json")
    assert(fs.exists(ledger))
    // recover the digest from the committed part names
    val digest = FeatherSnapshots.resolve(fs, new Path(path), None).get
      .files.map(_._1).collectFirst {
        case n if n.contains("-copy-") =>
          n.split("-copy-")(1).split("-")(0) }.get
    val srcFiles = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => "\"file:" + f.getAbsolutePath + "\"").sorted
    val intentJson = s"""{"headVersion":1,"digest":"$digest",""" +
      s""""files":[${srcFiles.mkString(",")}]}"""
    fs.delete(ledger, false)
    val out = fs.create(new Path(copyDir, "intent-v00000001.json"), true)
    out.write(intentJson.getBytes("UTF-8")); out.close()
    // the next run heals: same content, no new version, ledger rebuilt
    val r = CopyInto.run(spark, path, src, "parquet")
    assert(r.filesIngested === 0 && r.filesSkipped === 1,
      s"healing must not re-ingest: $r")
    // the no-op report carries the healed head, not a stale resolve
    assert(r.version === v1, s"healed no-op reports a stale version: $r")
    assert(headVersion(path) === v1)
    assert(spark.read.format("feather").load(path).count() === count1)
    assert(fs.exists(ledger), "the ledger must be rebuilt from the intent")
  }

  test("an avro batch whose files disagree on schema refuses " +
       "deterministically (no silent first-file-schema read)") {
    import spark.implicits._
    val path = tmp("avro_mixed"); val src = tmp("avro_mixed_src")
    newTable(path)
    Seq((2001L, 1.0)).toDF("id", "amt").coalesce(1)
      .write.mode("append").format("graft-avro").save(src + "/gen1")
    Seq((2002L, 2.0, "x")).toDF("id", "amt", "note").coalesce(1)
      .write.mode("append").format("graft-avro").save(src + "/gen2")
    val e = intercept[IllegalArgumentException] {
      CopyInto.run(spark, path, src, "avro")
    }
    assert(e.getMessage.contains("disagree on schema"), e.getMessage)
    // the refusal left no blocking intent: a batch of AGREEING files
    // (scoped by pattern... here: one generation removed) then ingests
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe); f.delete(): Unit }
    wipe(new java.io.File(src + "/gen2"))
    val r = CopyInto.run(spark, path, src, "avro")
    assert(r.filesIngested === 1, s"$r")
    assert(spark.read.format("feather").load(path).count() === 101)
  }

  test("a stale UNCOMMITTED intent refuses by default (an in-flight " +
       "copier looks the same) and heals only with healStale") {
    val path = tmp("stale"); val src = tmp("stale_src")
    newTable(path)
    writeBatch(src, 1001 to 1010)
    val fs = fsOf(path)
    val copyDir = new Path(path, "_copy")
    fs.mkdirs(copyDir)
    val out = fs.create(new Path(copyDir, "intent-v00000001.json"), true)
    out.write(("""{"headVersion":1,"digest":"deadbeefdead",""" +
      """"files":["file:/nowhere/x.parquet"]}""").getBytes("UTF-8"))
    out.close()
    val e = intercept[IllegalArgumentException] {
      CopyInto.run(spark, path, src, "parquet")
    }
    assert(e.getMessage.contains("unresolved COPY intent"))
    val r = CopyInto.run(spark, path, src, "parquet", healStale = true)
    assert(r.filesIngested === 1)
    assert(spark.read.format("feather").load(path).count() === 110)
  }

  test("a COMPLETE competing run landing inside the claim window is " +
       "caught by the ledger-head re-check: the loser aborts before " +
       "reading anything and releases its claim") {
    val path = tmp("race"); val src = tmp("race_src")
    newTable(path)
    writeBatch(src, 1001 to 1010)
    val fs = fsOf(path)
    val copyDir = new Path(path, "_copy")
    // simulate the winner: its whole run (claim → ingest → publish →
    // release) fits between our loadLedger and our claim, so by the
    // time we hold intent-v1 its ledger-v1 is already on disk
    CopyInto.testAfterClaim = () => {
      val out = fs.create(new Path(copyDir, "ledger-v00000001.json"), false)
      out.write(("""{"commitVersion":1,"full":true,""" +
        """"files":["file:/elsewhere/winner.parquet"]}""").getBytes("UTF-8"))
      out.close()
    }
    val e = intercept[IllegalArgumentException] {
      CopyInto.run(spark, path, src, "parquet")
    }
    assert(e.getMessage.contains("lost a race"), e.getMessage)
    assert(spark.read.format("feather").load(path).count() === 100,
      "the loser must not have ingested")
    assert(!fs.exists(new Path(copyDir, "intent-v00000001.json")),
      "the loser's claim is released")
    // the retry diffs against the winner's ledger and ingests our batch
    val r = CopyInto.run(spark, path, src, "parquet")
    assert(r.filesIngested === 1 && r.filesSkipped === 0)
    assert(spark.read.format("feather").load(path).count() === 110)
  }

  test("the ledger is a delta log: per-run entries carry only the " +
       "batch, every 16th is a checkpoint that prunes the history, " +
       "and reconstruction still skips every ingested file") {
    val path = tmp("delta"); val src = tmp("delta_src")
    newTable(path)
    // 17 single-file batches → v1 full, v2..v15 deltas, v16 checkpoint
    // (deleting v1..v15), v17 delta
    (1 to 17).foreach { b =>
      writeBatch(s"$src/b$b", (b * 1000 + 1) to (b * 1000 + 3))
      val r = CopyInto.run(spark, path, s"$src/b$b", "parquet")
      assert(r.filesIngested === 1, s"batch $b: $r")
    }
    val fs = fsOf(path)
    val copyDir = new Path(path, "_copy")
    def ledger(k: Int): Path =
      new Path(copyDir, f"ledger-v$k%08d.json")
    def json(p: Path): String = {
      val in = fs.open(p)
      try new String(org.apache.hadoop.io.IOUtils
        .readFullyToByteArray(in), "UTF-8")
      finally in.close()
    }
    assert(!fs.exists(ledger(1)) && !fs.exists(ledger(15)),
      "the v16 checkpoint must prune the entries below it")
    assert(json(ledger(16)).contains("\"full\":true"))
    assert(json(ledger(17)).contains("\"full\":false"))
    // a delta entry carries ONLY its batch (one file), not the set
    assert(json(ledger(17)).split("\\.parquet", -1).length - 1 === 1)
    // reconstruction = checkpoint + delta: every source file skips
    (1 to 17).foreach { b =>
      val r = CopyInto.run(spark, path, s"$src/b$b", "parquet")
      assert(r.filesIngested === 0 && r.filesSkipped === 1,
        s"batch $b must be remembered through the delta chain: $r")
    }
    assert(spark.read.format("feather").load(path).count() === 100 + 17 * 3)
  }

  test("the graft_copy_into TVF returns the report row and defers " +
       "execution (EXPLAIN never ingests)") {
    val path = tmp("tvf"); val src = tmp("tvf_src")
    newTable(path)
    writeBatch(src, 1001 to 1020)
    val q = s"SELECT * FROM graft_copy_into('$path', '$src', 'parquet')"
    spark.sql(q).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple")): Unit
    assert(spark.read.format("feather").load(path).count() === 100,
      "EXPLAIN must not ingest")
    val row = spark.sql(q).collect().head
    assert(row.getAs[Long]("files_ingested") === 1L)
    assert(spark.read.format("feather").load(path).count() === 120)
    val row2 = spark.sql(q).collect().head
    assert(row2.getAs[Long]("files_ingested") === 0L &&
      row2.getAs[Long]("files_skipped") === 1L)
  }
}
