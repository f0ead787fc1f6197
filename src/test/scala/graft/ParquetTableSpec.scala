package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{FeatherChanges, FeatherCluster, FeatherMutations,
  FeatherStats, GraftParquet, ParquetTable}
import graft.sources.FeatherSnapshots

/** The PARQUET face of the table tier: snapshot commits + time travel,
  * copy-on-write and deletion-vector mutations, CDF, clustering/
  * compaction folds, adopt of hive-partitioned directories, the
  * maintenance row iterators' type fidelity, and the staging-dir vacuum
  * path. The semantics oracles are the feather face's — the face must
  * be swappable without a behavior change. */
class ParquetTableSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def tmp(n: String): String = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_pqtable_test/$n"
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe)
      f.delete(): Unit
    }
    wipe(new java.io.File(p))
    p
  }
  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeTable(path: String, n: Int, parts: Int): Unit = {
    import spark.implicits._
    val df = (1 to n).map(i => (i.toLong, s"g${i % 3}", s"p_$i"))
      .toDF("id", "grp", "pay")
      .repartitionByRange(parts, col("id"))
    ParquetTable.write(df, path): Unit
  }
  private def keysOf(ids: Seq[Long]) = {
    import spark.implicits._
    ids.toDF("id")
  }
  private def dataBytes(path: String): Long =
    new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .map(_.length()).sum

  test("write/read round-trip preserves types exactly " +
       "(int/long/double/string/bool/date/timestamp/decimal)") {
    val path = tmp("types")
    val rows = Seq(
      org.apache.spark.sql.Row(1, 10L, 1.5, "a", true,
        java.sql.Date.valueOf("2024-03-01"),
        java.sql.Timestamp.valueOf("2024-03-01 10:30:00.123456"),
        new java.math.BigDecimal("12345.67")),
      org.apache.spark.sql.Row(2, null, null, null, null, null, null, null))
    val schema = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("l", LongType), StructField("d", DoubleType),
      StructField("s", StringType), StructField("b", BooleanType),
      StructField("dt", DateType), StructField("ts", TimestampType),
      StructField("dec", DecimalType(10, 2))))
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.asJava, schema)
    val v = ParquetTable.write(df, path)
    assert(v === 1L)
    val back = ParquetTable.read(spark, path).orderBy("i").collect()
    assert(back.length === 2)
    assert(back(0) === rows(0))
    assert(back(1).toSeq.drop(1).forall(_ == null))
  }

  test("time travel: versionAsOf and timestampAsOf reproduce retained states") {
    import spark.implicits._
    val path = tmp("tt")
    ParquetTable.write((1 to 100).map(i => (i.toLong, s"v1_$i"))
      .toDF("id", "pay"), path)
    val tsBetween = System.currentTimeMillis()
    Thread.sleep(5)
    ParquetTable.append((101 to 150).map(i => (i.toLong, s"v2_$i"))
      .toDF("id", "pay"), path)
    assert(ParquetTable.read(spark, path, versionAsOf = Some(1L)).count() === 100)
    assert(ParquetTable.read(spark, path).count() === 150)
    assert(ParquetTable.read(spark, path,
      timestampAsOf = Some(tsBetween.toString)).count() === 100)
  }

  test("COW delete: footer-derived stats prune the rewrite to a sliver, " +
       "semantics match the anti-join") {
    val path = tmp("cow")
    writeTable(path, 2000, 8)
    val ids = (500L to 560L).toSeq
    val r = FeatherMutations.deleteByKey(spark, path, keysOf(ids), Seq("id"))
    assert(r.filesTouched > 0 && r.filesTouched < 8,
      s"range-clustered layout + footer stats must prune: $r")
    val back = ParquetTable.read(spark, path)
    assert(back.count() === 2000 - ids.size)
    assert(back.filter(col("id").isin(ids: _*)).count() === 0)
    // prior version still reads whole
    assert(ParquetTable.read(spark, path, versionAsOf = Some(1L))
      .count() === 2000)
  }

  test("DV delete: no data file rewritten, read filters positions, " +
       "COUNT and time travel agree, second delete unions") {
    val path = tmp("dv")
    writeTable(path, 2000, 8)
    val bytes0 = dataBytes(path)
    val r = FeatherMutations.deleteByKeyDV(spark, path,
      keysOf(Seq(10L, 500L, 1999L)), Seq("id"))
    assert(r.filesTouched > 0 && r.filesTouched < 8)
    assert(dataBytes(path) === bytes0, "DV delete must not rewrite data")
    assert(ParquetTable.read(spark, path).count() === 1997)
    assert(ParquetTable.read(spark, path)
      .filter(col("id").isin(10L, 500L, 1999L)).count() === 0)
    assert(ParquetTable.read(spark, path, versionAsOf = Some(1L))
      .count() === 2000)
    // union into a fresh sidecar
    FeatherMutations.deleteByKeyDV(spark, path, keysOf(Seq(11L, 12L)),
      Seq("id"))
    assert(ParquetTable.read(spark, path).count() === 1995)
    // ... and a retried (idempotent) takedown commits nothing
    val head = FeatherSnapshots.latestVersion(fsOf(path), new Path(path)).get
    val r3 = FeatherMutations.deleteByKeyDV(spark, path, keysOf(Seq(11L)),
      Seq("id"))
    assert(r3.version === head, "an all-already-deleted takedown is a no-op")
  }

  test("compaction folds parquet DVs into a physical rewrite") {
    val path = tmp("fold")
    writeTable(path, 1200, 6)
    FeatherMutations.deleteByKeyDV(spark, path, keysOf(Seq(1L, 600L, 1200L)),
      Seq("id"))
    val r = graft.io.ParquetCompact.compact(spark, path, targetBytes = 1L << 30)
    assert(r.filesAfter < r.filesBefore)
    val snap = FeatherSnapshots.resolve(fsOf(path), new Path(path), None).get
    assert(snap.dvs.isEmpty, "the fold must clear every DV binding")
    val back = ParquetTable.read(spark, path)
    assert(back.count() === 1197)
    assert(back.filter(col("id").isin(1L, 600L, 1200L)).count() === 0)
  }

  test("merge upserts through the parquet face; evolveSchema widens") {
    import spark.implicits._
    val path = tmp("merge")
    writeTable(path, 1000, 4)
    val src = Seq((10L, "gX", "updated_10"), (2001L, "gY", "inserted"))
      .toDF("id", "grp", "pay")
    FeatherMutations.merge(spark, path, src, Seq("id"))
    val back = ParquetTable.read(spark, path)
    assert(back.count() === 1001)
    assert(back.filter(col("id") === 10L).select("pay").head().getString(0)
      === "updated_10")
    // schema evolution on write: a NEW source column joins the schema
    val src2 = Seq((11L, "gZ", "u11", 7.5)).toDF("id", "grp", "pay", "score")
    FeatherMutations.merge(spark, path, src2, Seq("id"), evolveSchema = true)
    val evolved = ParquetTable.read(spark, path)
    assert(evolved.columns.contains("score"))
    assert(evolved.filter(col("id") === 11L).select("score").head()
      .getDouble(0) === 7.5)
    assert(evolved.filter(col("id") === 10L).select("score").head()
      .isNullAt(0), "pre-evolution rows read the new column as null")
  }

  test("cluster + zorder rewrite the parquet table and preserve rows") {
    import spark.implicits._
    val path = tmp("clust")
    val df = (1 to 3000).map(i =>
      ((i * 37) % 1000L, ((i * 91) % 500L, s"r_$i")._1, s"r_$i"))
      .map { case (a, b, s) => (a, b, s) }.toDF("x", "y", "pay")
      .repartition(6)
    ParquetTable.write(df, path)
    val r = FeatherCluster.clusterZOrder(spark, path, Seq("x", "y"),
      targetBytes = 1L << 20)
    assert(r.version === 2L)
    val back = ParquetTable.read(spark, path)
    assert(back.count() === 3000)
    assert(back.agg(sum("x"), sum("y")).head() ===
      df.agg(sum("x"), sum("y")).head())
  }

  test("CDF: changesSince carries appends; a DV delete emits old-image " +
       "delete rows; the SQL TVF serves the same feed") {
    import spark.implicits._
    val path = tmp("cdf")
    ParquetTable.write((1 to 500).map(i => (i.toLong, s"p$i"))
      .toDF("id", "pay").repartitionByRange(4, col("id")), path)
    ParquetTable.append(Seq((501L, "p501")).toDF("id", "pay"), path)
    FeatherMutations.deleteByKeyDV(spark, path, keysOf(Seq(5L, 6L)), Seq("id"))
    val (changes, head) = FeatherChanges.changesSince(spark, path, 1L)
    assert(head === 3L)
    val byType = changes.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.getOrElse("insert", 0L) === 1L)
    assert(byType.getOrElse("delete", 0L) === 2L)
    val delIds = changes.filter(col("_change_type") === "delete")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(delIds.toSeq === Seq(5L, 6L))
    // the SQL face over the same parquet table
    val sqlFeed = spark.sql(
      s"SELECT id, _change_type FROM graft_table_changes('$path', 2, 3)")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(sqlFeed.toSeq === Seq((5L, "delete"), (6L, "delete")))
  }

  test("partitioned write/append: hive leaves under the manifest, " +
       "partition columns read back, per-leaf mutations, layout guards") {
    import spark.implicits._
    val path = tmp("partwrite")
    val df = (1 to 600).map(i => (i.toLong, s"d${i % 3}", s"p$i"))
      .toDF("id", "day", "pay")
    val v = ParquetTable.write(df, path, partitionBy = Seq("day"))
    assert(v === 1L)
    val back = ParquetTable.read(spark, path)
    assert(back.columns.sorted.toSeq === Seq("day", "id", "pay"))
    assert(back.count() === 600)
    assert(back.filter(col("day") === "d1").count() === 200)
    // partitioned append routes into the same chain
    ParquetTable.append(Seq((601L, "d1", "p601")).toDF("id", "day", "pay"),
      path, partitionBy = Seq("day"))
    assert(ParquetTable.read(spark, path).count() === 601)
    // DV delete + merge work per leaf on the written layout
    FeatherMutations.deleteByKeyDV(spark, path, keysOf(Seq(3L, 6L)),
      Seq("id"))
    assert(ParquetTable.read(spark, path).count() === 599)
    FeatherMutations.mergeDV(spark, path,
      Seq((9L, "d0", "moved")).toDF("id", "day", "pay"), Seq("id"))
    val moved = ParquetTable.read(spark, path).filter(col("id") === 9L)
      .select("day", "pay").head()
    assert(moved.getString(0) === "d0" && moved.getString(1) === "moved")
    // a mismatched partitioning refuses loudly
    val e = intercept[IllegalArgumentException] {
      ParquetTable.append(Seq((1L, "x", "p")).toDF("id", "other", "pay"),
        path, partitionBy = Seq("other"))
    }
    assert(e.getMessage.contains("layout"))
    // ... and a flat append into the partitioned table refuses too
    val e2 = intercept[Exception] {
      ParquetTable.append(Seq((1L, "d", "p")).toDF("id", "day", "pay"), path)
    }
    assert(e2.getMessage.contains("layout") ||
      e2.getMessage.contains("key=value"))
    // an EMPTY partitioned append (idempotent-replay shape) no-ops
    // instead of throwing; defining a new table empty still refuses
    val before = ParquetTable.read(spark, path).count()
    ParquetTable.append(
      Seq.empty[(Long, String, String)].toDF("id", "day", "pay"),
      path, partitionBy = Seq("day"))
    assert(ParquetTable.read(spark, path).count() === before)
    val e3 = intercept[IllegalArgumentException] {
      ParquetTable.write(
        Seq.empty[(Long, String, String)].toDF("id", "day", "pay"),
        tmp("partwrite_empty"), partitionBy = Seq("day"))
    }
    assert(e3.getMessage.contains("empty frame"))
    // time travel across the partitioned history
    assert(ParquetTable.read(spark, path, versionAsOf = Some(1L))
      .count() === 600)
  }

  test("partition values needing escaping land in ONE leaf across the " +
       "Spark sink and the mutation insert routing (space, colon, '+')") {
    import spark.implicits._
    val path = tmp("partescape")
    // values that diverge between URL- and Hive-encodings: space (URL '+'
    // vs literal), '+' (URL %2B vs literal), ':' (Hive %3A)
    val vals = Seq("a b", "a+b", "a:b")
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v, "w") }
      .toDF("id", "day", "pay")
    ParquetTable.write(df, path, partitionBy = Seq("day"))
    // merge-inserts (routePartitionedInserts) must hit the SAME leaves
    val src = vals.zipWithIndex.map { case (v, i) => (100L + i, v, "m") }
      .toDF("id", "day", "pay")
    FeatherMutations.merge(spark, path, src, Seq("id"))
    val back = ParquetTable.read(spark, path)
    assert(back.count() === 6)
    vals.foreach { v =>
      assert(back.filter(col("day") === v).count() === 2,
        s"partition value '$v' split across leaves or mis-decoded")
    }
    // exactly three key=value leaves on disk — no second spelling
    val leaves = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
      .map(_.getName).sorted.toSeq
    assert(leaves.size === 3, s"leaf spellings diverged: $leaves")
    // and the spellings are Spark's own (space literal, '+' literal)
    assert(leaves.contains("day=a b") && leaves.contains("day=a+b"),
      s"unexpected escaping: $leaves")
  }

  test("adopt a hive-partitioned parquet directory: partition columns " +
       "survive, per-leaf delete works, basePath pruning holds") {
    import spark.implicits._
    val path = tmp("adopt")
    (1 to 900).map(i => (i.toLong, s"d${i % 3}", s"p$i"))
      .toDF("id", "day", "pay")
      .write.partitionBy("day").parquet(path)
    val v = ParquetTable.adopt(spark, path)
    assert(v === 1L)
    val back = ParquetTable.read(spark, path)
    assert(back.columns.sorted.toSeq === Seq("day", "id", "pay"))
    assert(back.count() === 900)
    assert(back.filter(col("day") === "d1").count() === 300)
    // row-level delete on the adopted table (foreign files, no sidecars:
    // probe touches conservatively, semantics still exact)
    FeatherMutations.deleteByKey(spark, path, keysOf(Seq(1L, 2L, 3L)),
      Seq("id"))
    val after = ParquetTable.read(spark, path)
    assert(after.count() === 897)
    assert(after.filter(col("day") === "d0").count() === 299)
  }

  test("stats backfill lights up pruning on an adopted parquet table") {
    import spark.implicits._
    val path = tmp("backfill")
    (1 to 2000).map(i => (i.toLong, s"p$i")).toDF("id", "pay")
      .repartitionByRange(8, col("id"))
      .write.parquet(path)
    ParquetTable.adopt(spark, path)
    assert(FeatherStats.backfill(spark, path) === 8)
    val r = FeatherMutations.deleteByKey(spark, path, keysOf(Seq(100L)),
      Seq("id"))
    assert(r.filesTouched === 1,
      s"backfilled stats must prune the probe to one part: $r")
  }

  test("delete of every row leaves an empty readable table with its schema") {
    val path = tmp("all")
    writeTable(path, 50, 2)
    FeatherMutations.deleteByKey(spark, path, keysOf((1L to 50L).toSeq),
      Seq("id"))
    val back = ParquetTable.read(spark, path)
    assert(back.count() === 0)
    assert(back.columns.toSeq === Seq("id", "grp", "pay"))
    assert(back.schema("id").dataType === LongType)
  }

  test("restore rolls the head back; expire makes a DV erasure physical") {
    val path = tmp("restore")
    writeTable(path, 400, 4)
    FeatherMutations.deleteByKeyDV(spark, path, keysOf(Seq(7L)), Seq("id"))
    assert(ParquetTable.read(spark, path).count() === 399)
    val fs = fsOf(path)
    FeatherSnapshots.restore(fs, new Path(path), 1L)
    assert(ParquetTable.read(spark, path).count() === 400)
    // roll forward again (restore to the DV version), then expire: the
    // sidecar survives while referenced, dies with its last reference
    FeatherSnapshots.restore(fs, new Path(path), 2L)
    assert(ParquetTable.read(spark, path).count() === 399)
    FeatherSnapshots.expire(fs, new Path(path), keepLast = 1)
    assert(ParquetTable.read(spark, path).count() === 399)
    val dvFiles = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".dv"))
    assert(dvFiles.length === 1, "the restored head still binds its DV")
  }

  test("maintenance row iterator: positions are file ordinals, evolved " +
       "columns null-fill, date/timestamp/decimal keys convert exactly") {
    import spark.implicits._
    val path = tmp("rows")
    val conf = spark.sparkContext.hadoopConfiguration
    val df = (0 until 100).map(i => (i.toLong,
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19000L + i)),
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1700000000L + i, 123456000L)),
        new java.math.BigDecimal(s"$i.25")))
      .toDF("id", "dt", "ts", "dec")
      .withColumn("dec", col("dec").cast(DecimalType(10, 2)))
      .coalesce(1)
    ParquetTable.write(df, path)
    val snap = FeatherSnapshots.resolve(fsOf(path), new Path(path), None).get
    val abs = new Path(new Path(path), snap.files.head._1).toString
    val it = GraftParquet.allRowsPos(conf, abs,
      Seq("id", "dt", "ts", "dec", "ghost"), dv = Array(3L, 5L),
      _ => (), _ => ()).toSeq
    assert(it.size === 98)
    assert(it.map(_._1).take(5) === Seq(0L, 1L, 2L, 4L, 6L))
    val r0 = it.head._2
    assert(r0.getLong(0) === 0L)
    assert(r0.getDate(1) === java.sql.Date.valueOf(
      java.time.LocalDate.ofEpochDay(19000L)))
    assert(r0.getTimestamp(2) === java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1700000000L, 123456000L)))
    assert(r0.getDecimal(3) === new java.math.BigDecimal("0.25"))
    assert(r0.isNullAt(4), "a column absent from the footer reads null")
    // ... and the ordinals agree with Spark's _metadata.row_index
    val sparkIdx = spark.read.parquet(abs)
      .select(col("id"), col("_metadata.row_index").as("ri"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    it.foreach { case (pos, row) =>
      assert(sparkIdx(row.getLong(0)) === pos) }
  }

  test("DV filtering survives URI-escapable table paths (a space in a " +
       "directory name must not silently no-op the anti-join)") {
    import spark.implicits._
    val path = tmp("uri escape") + "/with space"
    val df = (1 to 500).map(i => (i.toLong, s"p$i")).toDF("id", "pay")
      .repartitionByRange(2, col("id"))
    ParquetTable.write(df, path)
    FeatherMutations.deleteByKeyDV(spark, path, {
      import spark.implicits._
      Seq(5L, 250L).toDF("id")
    }, Seq("id"))
    val back = ParquetTable.read(spark, path)
    assert(back.count() === 498,
      "masked rows must stay deleted on an escapable path")
    assert(back.filter(col("id").isin(5L, 250L)).count() === 0)
    // posKeep (CDF dv-diff) on the same path
    val feed = graft.io.FeatherChanges.readChanges(spark, path, 1, 2)
    assert(feed.filter(col("_change_type") === "delete").count() === 2)
  }

  test("the STREAMING change feed serves a parquet table: deletes and " +
       "appends arrive as change rows with exactly-once restart semantics") {
    import spark.implicits._
    val path = tmp("stream_cdf")
    ParquetTable.write((1 to 300).map(i => (i.toLong, s"p$i"))
      .toDF("id", "pay").repartitionByRange(2, col("id")), path)
    FeatherMutations.deleteByKeyDV(spark, path, keysOf(Seq(5L, 6L)), Seq("id"))
    ParquetTable.append(Seq((301L, "p301")).toDF("id", "pay"), path)
    val ckpt = tmp("stream_cdf_ckpt")
    val sink = tmp("stream_cdf_sink")
    def run(): Unit = {
      val q = spark.readStream.format("feather-cdf").load(path)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .start(sink)
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val got = spark.read.parquet(sink)
    // bootstrap serves v1 whole (300 inserts), then the version diffs:
    // v2's DV delete (2 deletes), v3's append (1 insert)
    assert(got.filter(col("_change_type") === "insert").count() === 301)
    assert(got.filter(col("_change_type") === "delete")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(5L, 6L))
    // restart continues from the checkpoint: exactly the one new DV
    // delete streams, nothing replays
    FeatherMutations.deleteByKeyDV(spark, path, keysOf(Seq(7L)), Seq("id"))
    run()
    val got2 = spark.read.parquet(sink)
    assert(got2.count() === got.count() + 1)
    assert(got2.filter(col("_change_type") === "delete")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(5L, 6L, 7L))
  }

  test("vacuum reclaims an aged crashed staging directory but never an " +
       "in-flight one") {
    val path = tmp("vac")
    writeTable(path, 100, 2)
    val fs = fsOf(path)
    val root = new Path(path)
    // a crashed user write's staging (no version -> grace window only)
    fs.mkdirs(new Path(root, "_tmp-pq-deadbeef"))
    fs.create(new Path(root, "_tmp-pq-deadbeef/part-0.parquet"), true).close()
    // an in-flight mutation staging (target version 99 > head)
    fs.mkdirs(new Path(root, "_tmp-mut-v00000099-ab12cd34"))
    val removedYoung = FeatherSnapshots.vacuumOrphans(fs, root,
      graceMillis = 60000L, suffixes = ParquetTable.Suffixes)
    assert(removedYoung === 0, "younger than the grace window: kept")
    val removed = FeatherSnapshots.vacuumOrphans(fs, root,
      graceMillis = 0L, suffixes = ParquetTable.Suffixes)
    assert(removed === 1, "the aged crashed staging dir is reclaimed")
    assert(!fs.exists(new Path(root, "_tmp-pq-deadbeef")))
    assert(fs.exists(new Path(root, "_tmp-mut-v00000099-ab12cd34")),
      "an in-flight staging dir survives regardless of age")
    assert(ParquetTable.read(spark, path).count() === 100,
      "vacuum never touches referenced data")
  }
}
