package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{DeletionVectors, FeatherChanges, FeatherCluster, FeatherCompact, FeatherMutations}
import graft.sources.FeatherSnapshots

/** Merge-on-read deletes (deletion vectors): sidecar format, manifest
  * bindings, read-path application on both faces, folding through
  * compaction/clustering, time travel / restore / CDF interplay, and the
  * expire() physical-erasure path. */
class DeletionVectorSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def tmp(n: String): String = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_dv_test/$n"
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe)
      f.delete(): Unit
    }
    wipe(new java.io.File(p))
    p
  }
  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeTable(path: String, n: Int, parts: Int,
                         format: String = "feather"): Unit = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"g${i % 3}", s"p_$i")).toDF("id", "grp", "pay")
      .repartitionByRange(parts, col("id"))
      .write.format(format).mode("overwrite")
      .option("snapshots", "true").save(path)
  }
  private def keysOf(ids: Seq[Long]) = {
    import spark.implicits._
    ids.toDF("id")
  }
  private def dataBytes(path: String, suffix: String): Long =
    new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(suffix) && !f.getName.startsWith("_"))
      .map(_.length()).sum

  test("sidecar format: write/read/union/diff round-trip") {
    val fs = fsOf(tmp("fmt"))
    val dir = new Path(tmp("fmt"))
    fs.mkdirs(dir)
    val a = Array(5L, 1L, 9L, 5L)
    DeletionVectors.write(fs, dir, "x.dv", a)
    val back = DeletionVectors.read(
      spark.sparkContext.hadoopConfiguration, new Path(dir, "x.dv").toString)
    assert(back.toSeq === Seq(1L, 5L, 9L)) // sorted, deduplicated
    assert(DeletionVectors.union(Array(1L, 3L), Array(2L, 3L, 8L)).toSeq ===
      Seq(1L, 2L, 3L, 8L))
    assert(DeletionVectors.diff(Array(1L, 2L, 3L, 8L), Array(2L, 8L)).toSeq ===
      Seq(1L, 3L))
    assert(DeletionVectors.diff(Array.empty[Long], Array(1L)).toSeq === Nil)
  }

  test("deleteByKeyDV matches deleteByKey semantics without rewriting " +
       "data files, and bytes written scale with deleted rows") {
    val pathCow = tmp("dv_vs_cow_c")
    val pathDv = tmp("dv_vs_cow_d")
    writeTable(pathCow, 2000, 8)
    writeTable(pathDv, 2000, 8)
    val ids = Seq(10L, 11L, 500L, 501L, 502L, 1999L)
    val bytesBefore = dataBytes(pathDv, ".feather")
    val rc = FeatherMutations.deleteByKey(spark, pathCow, keysOf(ids), Seq("id"))
    val rd = FeatherMutations.deleteByKeyDV(spark, pathDv, keysOf(ids), Seq("id"))
    assert(rd.version === 2L)
    assert(rd.filesTouched === rc.filesTouched,
      "the DV delete prunes with the same probe as the COW delete")
    // the data files are untouched — only tiny .dv sidecars appeared
    assert(dataBytes(pathDv, ".feather") === bytesBefore,
      "a DV delete must not rewrite any data file")
    val dvBytes = dataBytes(pathDv, ".dv")
    assert(dvBytes > 0 && dvBytes < 1000,
      s"six deleted rows should cost tens of bytes of sidecar, got $dvBytes")
    // identical logical content
    val cow = spark.read.format("feather").load(pathCow)
      .orderBy("id").collect().toSeq
    val dv = spark.read.format("feather").load(pathDv)
      .orderBy("id").collect().toSeq
    assert(dv === cow)
    assert(dv.size === 1994)
    // COUNT(*) pushdown subtracts the binding cardinality
    assert(spark.read.format("feather").load(pathDv).count() === 1994L)
  }

  test("a second DV delete on the same file unions into a fresh sidecar; " +
       "time travel sees each binding generation") {
    val path = tmp("dv_union")
    writeTable(path, 400, 2)
    FeatherMutations.deleteByKeyDV(spark, path, keysOf(Seq(5L)), Seq("id"))
    FeatherMutations.deleteByKeyDV(spark, path, keysOf(Seq(7L)), Seq("id"))
    val head = spark.read.format("feather").load(path)
    assert(head.count() === 398)
    assert(head.where(col("id").isin(5L, 7L)).count() === 0)
    // v2 has only the first delete; v1 none
    assert(spark.read.format("feather").option("versionAsOf", "2").load(path)
      .where(col("id").isin(5L, 7L)).collect().map(_.getLong(0)).toSeq ===
      Seq(7L))
    assert(spark.read.format("feather").option("versionAsOf", "1").load(path)
      .count() === 400)
    // an already-deleted row never re-matches: the retried takedown is
    // a TRUE no-op — no commit (an empty op="delete" version would abort
    // live snapshot streams for nothing)
    val r3 = FeatherMutations.deleteByKeyDV(spark, path,
      keysOf(Seq(5L, 7L)), Seq("id"))
    assert(spark.read.format("feather").load(path).count() === 398)
    assert(r3.version === 3L, s"no-match delete must not commit: $r3")
    assert(r3.filesTouched === 0)
  }

  test("a COW mutation on a DV'd file folds the DV instead of " +
       "resurrecting deleted rows") {
    val path = tmp("dv_then_merge")
    writeTable(path, 400, 2)
    FeatherMutations.deleteByKeyDV(spark, path, keysOf(Seq(10L)), Seq("id"))
    // merge touches the same file (key 11 is in the same range)
    import spark.implicits._
    val source = Seq((11L, "gX", "merged")).toDF("id", "grp", "pay")
    FeatherMutations.merge(spark, path, source, Seq("id"))
    val after = spark.read.format("feather").load(path)
    assert(after.where(col("id") === 10L).count() === 0,
      "the merge rewrite must carry the DV's deletions")
    assert(after.where(col("id") === 11L).select("pay").head().getString(0)
      === "merged")
    assert(after.count() === 399)
    // the rewritten file has no binding left
    val snap = FeatherSnapshots.resolve(fsOf(path), new Path(path), None).get
    assert(snap.dvs.isEmpty)
  }

  test("compaction folds DVs: bindings disappear, rows stay correct, " +
       "expire makes the erasure physical") {
    val path = tmp("dv_compact")
    writeTable(path, 600, 3)
    FeatherMutations.deleteByKeyDV(spark, path,
      keysOf(Seq(1L, 300L, 600L)), Seq("id"))
    val fs = fsOf(path)
    val before = FeatherSnapshots.resolve(fs, new Path(path), None).get
    assert(before.dvs.nonEmpty)
    val r = FeatherCompact.compact(spark, path, targetBytes = 1L)
    // targetBytes=1 forms no small-file groups — only the DV fold ran
    // (ONE decode job per leaf over all its bound files)
    assert(r.groupsRewritten >= 1)
    val after = FeatherSnapshots.resolve(fs, new Path(path), None).get
    assert(after.dvs.isEmpty, "folded files must carry no binding")
    val got = spark.read.format("feather").load(path)
    assert(got.count() === 597)
    assert(got.where(col("id").isin(1L, 300L, 600L)).count() === 0)
    // expire: old parts AND the dv sidecars physically reclaim
    FeatherSnapshots.expire(fs, new Path(path), keepLast = 1)
    assert(dataBytes(path, ".dv") === 0, "expired DV sidecars must delete")
    assert(spark.read.format("feather").load(path).count() === 597)
  }

  test("compacting a table whose every row is DV-deleted still leaves a " +
       "readable empty table") {
    val path = tmp("dv_fold_all")
    // adopt WITHOUT stats sidecars: the delete cannot take the
    // stats-proven full-file drop shortcut and must bind a
    // full-coverage DV — the fold then produces zero output parts
    import spark.implicits._
    graft.io.GraftFeather.write(
      (1 to 50).map(i => (i.toLong, s"p_$i")).toDF("id", "pay")
        .repartition(1), path, overwrite = true)
    val fs = fsOf(path)
    new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".stats.json")).foreach(_.delete())
    new java.io.File(path, graft.io.FeatherStats.MergedName).delete()
    FeatherSnapshots.adopt(fs, new Path(path)) // v1
    FeatherMutations.deleteByKeyDV(spark, path,
      (1L to 50L).toDF("id"), Seq("id")) // v2: full-coverage binding
    val v2 = FeatherSnapshots.resolve(fs, new Path(path), None).get
    assert(v2.dvs.nonEmpty, "without stats the file stays bound")
    FeatherCompact.compact(spark, path, targetBytes = 1L) // v3: fold
    val got = spark.read.format("feather").load(path)
    assert(got.count() === 0)
    assert(got.columns.toSeq === Seq("id", "pay"),
      "the fold of the last live rows must stamp a readable schema")
  }

  test("clustering folds DVs and re-establishes disjoint ranges") {
    val path = tmp("dv_cluster")
    writeTable(path, 600, 3)
    FeatherMutations.deleteByKeyDV(spark, path,
      keysOf(Seq(2L, 301L)), Seq("id"))
    FeatherCluster.cluster(spark, path, Seq("id"), targetBytes = 16L << 10)
    val snap = FeatherSnapshots.resolve(fsOf(path), new Path(path), None).get
    assert(snap.dvs.isEmpty)
    val got = spark.read.format("feather").load(path)
    assert(got.count() === 598)
    assert(got.where(col("id").isin(2L, 301L)).count() === 0)
  }

  test("restore across a DV delete restores the bindings themselves") {
    val path = tmp("dv_restore")
    writeTable(path, 300, 2) // v1
    FeatherMutations.deleteByKeyDV(spark, path, keysOf(Seq(9L)), Seq("id")) // v2
    assert(spark.read.format("feather").load(path).count() === 299)
    FeatherSnapshots.restore(fsOf(path), new Path(path), 1L) // v3 = v1 content
    assert(spark.read.format("feather").load(path).count() === 300)
    FeatherSnapshots.restore(fsOf(path), new Path(path), 2L) // v4 = v2 content
    val got = spark.read.format("feather").load(path)
    assert(got.count() === 299)
    assert(got.where(col("id") === 9L).count() === 0)
  }

  test("CDF emits a DV delete's rows as 'delete' with the commit version") {
    val path = tmp("dv_cdf")
    writeTable(path, 500, 2) // v1
    FeatherMutations.deleteByKeyDV(spark, path,
      keysOf(Seq(20L, 21L, 400L)), Seq("id")) // v2
    import spark.implicits._
    Seq((501L, "g0", "p_501")).toDF("id", "grp", "pay")
      .write.format("feather").mode("append").save(path) // v3 append
    val ch = FeatherChanges.readChanges(spark, path, 1L, 3L)
    val dels = ch.where(col("_change_type") === "delete")
      .select("id", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(dels === Seq((20L, 2L), (21L, 2L), (400L, 2L)),
      "exactly the DV'd rows, at the delete's version")
    val ins = ch.where(col("_change_type") === "insert")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ins === Seq(501L))
    // bootstrap from zero replays history: the DV'd rows arrive as v1
    // inserts AND v2 deletes — a consumer folding the feed in version
    // order ends with them absent
    val boot = FeatherChanges.readChanges(spark, path, 0L, 3L)
    val hist = boot.where(col("id") === 20L)
      .select("_commit_version", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(hist === Seq((1L, "insert"), (2L, "delete")))
    // bootstrap from the HEAD-only window applies the bindings: rows
    // deleted before the window are not content
    val bootHead = FeatherChanges.readChanges(spark, path, 2L, 3L)
    assert(bootHead.where(col("id").isin(20L, 21L, 400L)).count() === 0)
  }

  test("a snapshot stream's initial load applies the head's bindings") {
    val path = tmp("dv_stream")
    writeTable(path, 200, 2)
    FeatherMutations.deleteByKeyDV(spark, path,
      keysOf(Seq(50L, 51L)), Seq("id"))
    val q = spark.readStream.format("feather").load(path)
      .writeStream.format("memory").queryName("dv_stream_t")
      .option("checkpointLocation", tmp("dv_stream_ckpt"))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("dv_stream_t").count() === 198)
      assert(spark.table("dv_stream_t")
        .where(col("id").isin(50L, 51L)).count() === 0)
    } finally q.stop()
  }

  test("avro face: DV delete end-to-end, including splits and compaction fold") {
    val path = tmp("dv_avro")
    writeTable(path, 1500, 4, format = "graft-avro")
    val bytesBefore = dataBytes(path, ".avro")
    val r = FeatherMutations.deleteByKeyDV(spark, path,
      keysOf(Seq(3L, 10L, 1499L)), Seq("id"))
    assert(r.filesTouched > 0 && r.filesTouched < 4,
      s"keys live in 2 of 4 range-clustered parts: $r")
    assert(dataBytes(path, ".avro") === bytesBefore)
    // read through byte-range splits small enough to cut files
    val got = spark.read.format("graft-avro")
      .option("maxSplitBytes", "4096").load(path)
    assert(got.count() === 1497)
    assert(got.where(col("id").isin(3L, 10L, 1499L)).count() === 0)
    assert(spark.read.format("graft-avro").load(path).count() === 1497L)
    // fold through avro compaction
    graft.io.AvroCompact.compact(spark, path, targetBytes = 1L)
    val snap = FeatherSnapshots.resolve(fsOf(path), new Path(path), None).get
    assert(snap.dvs.isEmpty)
    assert(spark.read.format("graft-avro").load(path).count() === 1497)
  }

  test("a DV covering every row of a file DROPS the file from the " +
       "manifest (readers skip it entirely)") {
    val path = tmp("dv_full_file")
    writeTable(path, 400, 4) // disjoint ~100-id ranges
    import spark.implicits._
    // delete ALL of the first file's rows plus one row elsewhere
    val r = FeatherMutations.deleteByKeyDV(spark, path,
      ((1L to 100L) :+ 350L).toDF("id"), Seq("id"))
    val snap = FeatherSnapshots.resolve(fsOf(path), new Path(path), None).get
    assert(snap.files.size === 3,
      s"the fully-deleted file must leave the manifest: ${snap.files}")
    assert(snap.dvs.size === 1,
      "only the partially-deleted file keeps a binding")
    assert(r.filesTouched === 2)
    val got = spark.read.format("feather").load(path)
    assert(got.count() === 299)
    assert(got.where(col("id") <= 100L || col("id") === 350L).count() === 0)
    // time travel still reads v1 whole
    assert(spark.read.format("feather").option("versionAsOf", "1")
      .load(path).count() === 400)
  }

  test("a DV delete of EVERY row leaves a readable empty table") {
    val path = tmp("dv_delete_all")
    writeTable(path, 120, 2)
    import spark.implicits._
    FeatherMutations.deleteByKeyDV(spark, path,
      (1L to 120L).toDF("id"), Seq("id"))
    val got = spark.read.format("feather").load(path)
    assert(got.count() === 0)
    assert(got.columns.toSeq === Seq("id", "grp", "pay"),
      "schema survives an all-rows DV delete")
  }

  test("hive-partitioned table: DV bindings ride the key=value leaves") {
    val path = tmp("dv_hive")
    import spark.implicits._
    graft.io.GraftFeather.write(
      (1 to 100).map(i => (i.toLong, s"p_$i")).toDF("id", "pay")
        .repartition(1), s"$path/dom=a", overwrite = true)
    graft.io.GraftFeather.write(
      (101 to 200).map(i => (i.toLong, s"p_$i")).toDF("id", "pay")
        .repartition(1), s"$path/dom=b", overwrite = true)
    FeatherSnapshots.adopt(fsOf(path), new Path(path)) // v1
    val r = FeatherMutations.deleteByKeyDV(spark, path,
      keysOf(Seq(5L, 150L)), Seq("id"))
    assert(r.partsWritten === 2)
    val snap = FeatherSnapshots.resolve(fsOf(path), new Path(path), None).get
    assert(snap.dvs.keySet.forall(k =>
        k.startsWith("dom=a/") || k.startsWith("dom=b/")))
    assert(snap.dvs.values.forall { case (dvRel, _) =>
      dvRel.startsWith("dom=") })
    val got = spark.read.format("feather").load(path)
    assert(got.count() === 198)
    assert(got.where(col("id").isin(5L, 150L)).count() === 0)
    // partition pruning + DV compose
    assert(got.where(col("dom") === "a").count() === 99)
  }

  test("vacuumOrphans: referenced DVs survive, orphaned DVs reclaim, " +
       "in-flight DVs survive regardless of age") {
    val path = tmp("dv_vacuum")
    writeTable(path, 300, 2)
    FeatherMutations.deleteByKeyDV(spark, path, keysOf(Seq(4L)), Seq("id"))
    val fs = fsOf(path)
    val root = new Path(path)
    // an orphan: plausible dv name bound to nothing, older than any grace
    DeletionVectors.write(fs, root, "dv-v00000001-deadbeef-old.feather.dv",
      Array(1L))
    new java.io.File(path, "dv-v00000001-deadbeef-old.feather.dv")
      .setLastModified(1000L)
    // in-flight: targets a version beyond latest
    DeletionVectors.write(fs, root, "dv-v00000099-cafecafe-new.feather.dv",
      Array(1L))
    new java.io.File(path, "dv-v00000099-cafecafe-new.feather.dv")
      .setLastModified(1000L)
    val removed = FeatherSnapshots.vacuumOrphans(fs, root, graceMillis = 0L)
    val left = new java.io.File(path).listFiles()
      .map(_.getName).filter(_.endsWith(".dv")).toSet
    assert(!left.contains("dv-v00000001-deadbeef-old.feather.dv"),
      s"orphan DV must reclaim (removed=$removed, left=$left)")
    assert(left.contains("dv-v00000099-cafecafe-new.feather.dv"),
      "pending DV must survive")
    assert(left.exists(_.startsWith("dv-v00000002")),
      "the bound DV must survive")
    assert(spark.read.format("feather").load(path).count() === 299)
  }

  // ---- merge-on-read upsert (mergeDV / applyCdcDV) --------------------------

  test("mergeDV matches merge semantics without rewriting candidate " +
       "files; re-run is idempotent on content") {
    import spark.implicits._
    val pathCow = tmp("mdv_cow")
    val pathDv = tmp("mdv_dv")
    writeTable(pathCow, 2000, 8)
    writeTable(pathDv, 2000, 8)
    val source = Seq((100L, "gU", "updated_100"), (101L, "gU", "updated_101"),
      (2500L, "gI", "inserted")).toDF("id", "grp", "pay")
    val rc = FeatherMutations.merge(spark, pathCow, source, Seq("id"))
    val bytes0 = dataBytes(pathDv, ".feather")
    val rd = FeatherMutations.mergeDV(spark, pathDv, source, Seq("id"))
    assert(rd.filesTouched === rc.filesTouched,
      "the DV merge prunes with the same probe as the COW merge")
    assert(dataBytes(pathDv, ".feather") > bytes0,
      "only the small source part is new bytes")
    val cow = spark.read.format("feather").load(pathCow)
      .orderBy("id").collect()
    val dv = spark.read.format("feather").load(pathDv)
      .orderBy("id").collect()
    assert(dv === cow, "strategy must not change merge semantics")
    // idempotent re-run: one more version, identical rows
    FeatherMutations.mergeDV(spark, pathDv, source, Seq("id"))
    assert(spark.read.format("feather").load(pathDv)
      .orderBy("id").collect() === cow)
    // time travel: v1 still reads the pre-merge state whole
    assert(spark.read.format("feather").option("versionAsOf", "1")
      .load(pathDv).count() === 2000)
  }

  test("mergeDV emits CDF deletes for masked rows and inserts for the " +
       "source; identical replacements net out") {
    import spark.implicits._
    val path = tmp("mdv_cdf")
    writeTable(path, 1000, 4)
    // row 50 gets an IDENTICAL replacement (nets out of the diff); row
    // 60 changes payload; 2001 inserts
    val source = Seq((50L, "g2", "p_50"), (60L, "g0", "CHANGED"),
      (2001L, "gN", "new")).toDF("id", "grp", "pay")
    FeatherMutations.mergeDV(spark, path, source, Seq("id"))
    val feed = FeatherChanges.readChanges(spark, path, 1, 2)
      .select("id", "pay", "_change_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(t => (t._1, t._3))
    assert(feed.toSeq === Seq(
      (60L, "p_60", "delete"), (60L, "CHANGED", "insert"),
      (2001L, "new", "insert")))
  }

  test("mergeDV folds physically through compaction") {
    import spark.implicits._
    val path = tmp("mdv_fold")
    writeTable(path, 1200, 6)
    val source = Seq((1L, "gU", "u1"), (600L, "gU", "u600"))
      .toDF("id", "grp", "pay")
    FeatherMutations.mergeDV(spark, path, source, Seq("id"))
    val r = FeatherCompact.compact(spark, path, targetBytes = 1L << 30)
    assert(r.filesAfter < r.filesBefore)
    val snap = FeatherSnapshots.resolve(fsOf(path), new Path(path), None).get
    assert(snap.dvs.isEmpty, "the fold must clear every merge mask")
    val back = spark.read.format("feather").load(path)
    assert(back.count() === 1200)
    assert(back.filter(col("id") === 1L).select("pay").head().getString(0)
      === "u1")
  }

  test("mergeDV on a hive-partitioned table routes inserts and MOVES a " +
       "matched key whose partition values changed") {
    import spark.implicits._
    val path = tmp("mdv_part")
    for (d <- Seq("d0", "d1", "d2"))
      graft.io.GraftFeather.write(
        (1 to 600).filter(i => s"d${i % 3}" == d)
          .map(i => (i.toLong, s"p$i")).toDF("id", "pay").repartition(1),
        s"$path/day=$d", overwrite = true)
    FeatherSnapshots.adopt(fsOf(path), new Path(path)) // v1
    // id=3 lives in day=d0 (3 % 3 == 0); move it to day=d2 with new pay
    val source = Seq((3L, "d2", "moved_3"), (601L, "d1", "new_601"))
      .toDF("id", "day", "pay")
    val r = FeatherMutations.mergeDV(spark, path, source, Seq("id"))
    assert(r.partsWritten >= 2, "one insert part per touched leaf")
    val back = spark.read.format("feather").load(path)
    assert(back.count() === 601)
    val moved = back.filter(col("id") === 3L)
      .select("day", "pay").collect()
    assert(moved.length === 1)
    assert(moved.head.getString(0) === "d2")
    assert(moved.head.getString(1) === "moved_3")
  }

  test("applyCdcDV: tombstones mask, live rows land, an all-tombstone " +
       "batch over the whole table leaves a readable empty table") {
    import spark.implicits._
    val path = tmp("cdcdv")
    writeTable(path, 100, 2)
    val batch = Seq(
      (5L, "g0", "upd_5", false),
      (6L, "g0", null: String, true),
      (101L, "gN", "ins_101", false))
      .toDF("id", "grp", "pay", "_deleted")
    FeatherMutations.applyCdcDV(spark, path, batch, Seq("id"))
    val back = spark.read.format("feather").load(path)
    assert(back.count() === 100) // -1 tombstone +1 insert
    assert(back.filter(col("id") === 6L).count() === 0)
    assert(back.filter(col("id") === 5L).select("pay").head().getString(0)
      === "upd_5")
    // tombstone EVERYTHING: the stamp keeps the table readable
    val ids = back.select("id").collect().map(_.getLong(0)).toSeq
    val killAll = ids.toDF("id")
      .withColumn("grp", lit(null).cast("string"))
      .withColumn("pay", lit(null).cast("string"))
      .withColumn("_deleted", lit(true))
    FeatherMutations.applyCdcDV(spark, path, killAll, Seq("id"))
    val empty = spark.read.format("feather").load(path)
    assert(empty.count() === 0)
    assert(empty.columns.toSeq === Seq("id", "grp", "pay"))
  }

  test("mergeDV evolveSchema widens without touching survivors") {
    import spark.implicits._
    val path = tmp("mdv_evo")
    writeTable(path, 500, 2)
    val bytes0 = dataBytes(path, ".feather")
    val source = Seq((10L, "gU", "u10", 0.9))
      .toDF("id", "grp", "pay", "score")
    FeatherMutations.mergeDV(spark, path, source, Seq("id"),
      evolveSchema = true)
    assert(dataBytes(path, ".feather") > bytes0)
    val back = spark.read.format("feather")
      .option("mergeSchema", "true").load(path)
    assert(back.columns.contains("score"))
    assert(back.filter(col("id") === 10L).select("score").head()
      .getDouble(0) === 0.9)
    assert(back.filter(col("id") === 11L).select("score").head().isNullAt(0))
  }

  test("a replayed all-tombstone CDC batch is a TRUE no-op: no version " +
       "published (live snapshot streams survive the replay)") {
    import spark.implicits._
    val path = tmp("cdcdv_replay")
    writeTable(path, 100, 2)
    val batch = Seq((5L, "g0", null: String, true))
      .toDF("id", "grp", "pay", "_deleted")
    val r1 = FeatherMutations.applyCdcDV(spark, path, batch, Seq("id"))
    assert(r1.version === 2L)
    // the replay: row 5 is already masked, nothing matches, no live rows
    val r2 = FeatherMutations.applyCdcDV(spark, path, batch, Seq("id"))
    assert(r2.version === 2L, s"replay must not commit: $r2")
    assert(r2.filesTouched === 0 && r2.partsWritten === 0)
    assert(spark.read.format("feather").load(path).count() === 99)
  }

  test("mergeDV works on the parquet face too") {
    import spark.implicits._
    val path = tmp("mdv_pq")
    val df = (1 to 800).map(i => (i.toLong, s"p$i")).toDF("id", "pay")
      .repartitionByRange(4, col("id"))
    graft.io.ParquetTable.write(df, path)
    val bytes0 = dataBytes(path, ".parquet")
    val source = Seq((7L, "u7"), (900L, "new")).toDF("id", "pay")
    val r = FeatherMutations.mergeDV(spark, path, source, Seq("id"))
    assert(r.filesTouched === 1 && r.partsWritten >= 1)
    val back = graft.io.ParquetTable.read(spark, path)
    assert(back.count() === 801)
    assert(back.filter(col("id") === 7L).select("pay").head().getString(0)
      === "u7")
    assert(dataBytes(path, ".parquet") > bytes0)
  }
}
