package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{FeatherStats, GraftFeather}
import graft.sources.FeatherSnapshots

/** FeatherStats.backfill — the ANALYZE pass for adopted/foreign files:
  * coverage appears, skipping starts pruning, and the pass is
  * idempotent. Both faces. */
class StatsBackfillSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def tmp(n: String): String = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_stats_backfill/$n"
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe)
      f.delete(): Unit
    }
    wipe(new java.io.File(p))
    p
  }
  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def conf = spark.sparkContext.hadoopConfiguration

  /** Range-clustered foreign feather dir: parts present, sidecars
    * stripped, adopted. */
  private def foreignFeather(path: String): Unit = {
    import spark.implicits._
    val fs = fsOf(path)
    fs.mkdirs(new Path(path))
    GraftFeather.writeParts(
      (1 to 1000).map(i => (i.toLong, s"p_$i")).toDF("id", "pay")
        .repartitionByRange(4, col("id")), path, "foreign")
    fs.listStatus(new Path(path))
      .filter(_.getPath.getName.endsWith(".stats.json"))
      .foreach(st => fs.delete(st.getPath, false))
    fs.delete(new Path(path, "_stats.json"), false)
    FeatherSnapshots.adopt(fs, new Path(path)): Unit
  }

  private def liveFiles(path: String): Seq[(String, Long)] =
    FeatherSnapshots.resolve(fsOf(path), new Path(path), None).get
      .files.map { case (rel, len) =>
        (new Path(path, rel).toString, len) }

  test("backfill covers adopted foreign files and enables skipping") {
    val path = tmp("feather")
    foreignFeather(path)
    assert(FeatherStats.exactRowCount(conf, liveFiles(path)).isEmpty,
      "foreign files start uncovered")
    assert(FeatherStats.backfill(spark, path) === 4)
    assert(FeatherStats.exactRowCount(conf, liveFiles(path)) === Some(1000L))
    // range skipping now prunes: a narrow band plans a strict subset
    val narrow = spark.read.format("feather").load(path)
      .where(col("id").between(10L, 20L))
    assert(narrow.count() === 11)
    assert(narrow.rdd.getNumPartitions < 4,
      "post-backfill stats must prune the range-clustered layout")
    // idempotent: everything covered, nothing re-read
    assert(FeatherStats.backfill(spark, path) === 0)
  }

  test("backfill covers an adopted avro directory") {
    val path = tmp("avro")
    import spark.implicits._
    (1 to 500).map(i => (i.toLong, s"n_$i")).toDF("id", "name")
      .repartitionByRange(3, col("id"))
      .write.format("graft-avro").mode("overwrite").save(path)
    val fs = fsOf(path)
    fs.listStatus(new Path(path))
      .filter(_.getPath.getName.endsWith(".stats.json"))
      .foreach(st => fs.delete(st.getPath, false))
    fs.delete(new Path(path, "_stats.json"), false)
    FeatherSnapshots.adopt(fs, new Path(path), Seq(".avro"))
    assert(FeatherStats.exactRowCount(conf, liveFiles(path)).isEmpty)
    assert(FeatherStats.backfill(spark, path) === 3)
    assert(FeatherStats.exactRowCount(conf, liveFiles(path)) === Some(500L))
    // the mutation probe prunes off the backfilled ranges
    val r = graft.io.FeatherMutations.deleteByKey(spark, path,
      Seq(5L).toDF("id"), Seq("id"))
    assert(r.filesTouched === 1, s"backfilled ranges must prune: $r")
  }

  test("backfill on a non-snapshotted directory is loud") {
    val path = tmp("nosnap")
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "v")
      .write.format("feather").mode("overwrite").save(path)
    val e = intercept[IllegalArgumentException] {
      FeatherStats.backfill(spark, path)
    }
    assert(e.getMessage.contains("snapshots"))
  }
}
