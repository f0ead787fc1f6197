package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FeatherSnapshots

/** Snapshot manifests on the graft-avro connector: atomic commits,
  * manifest-planned reads, version + timestamp time travel, compaction
  * as a manifest op, adoption, expire, and the streaming guard. */
class AvroSnapshotsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def tmp(n: String): String = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_avro_snap/$n"
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe)
      f.delete(): Unit
    }
    wipe(new java.io.File(p))
    p
  }
  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeV(path: String, lo: Int, hi: Int, mode: String): Unit = {
    import spark.implicits._
    (lo to hi).map(i => (i.toLong, s"n_$i")).toDF("id", "name")
      .repartition(1).write.format("graft-avro").mode(mode)
      .option("snapshots", "true").save(path)
  }

  test("commits publish manifests; overwrite retains; time travel works") {
    val path = tmp("versions")
    writeV(path, 1, 100, "overwrite")   // v1
    Thread.sleep(30)
    val between = System.currentTimeMillis()
    Thread.sleep(30)
    writeV(path, 101, 150, "append")    // v2
    writeV(path, 201, 220, "overwrite") // v3
    val fs = fsOf(path)
    assert(FeatherSnapshots.latestVersion(fs, new Path(path)) === Some(3L))
    val latest = spark.read.format("graft-avro").load(path)
    assert(latest.count() === 20)
    assert(spark.read.format("graft-avro").option("versionAsOf", "1")
      .load(path).count() === 100)
    assert(spark.read.format("graft-avro").option("versionAsOf", "2")
      .load(path).count() === 150)
    assert(spark.read.format("graft-avro")
      .option("timestampAsOf", between.toString).load(path).count() === 100)
    // the overwrite deleted nothing: v1's parts survive on disk
    FeatherSnapshots.read(fs, new Path(path), 1L).files.foreach {
      case (rel, len) =>
        assert(fs.getFileStatus(new Path(path, rel)).getLen === len)
    }
  }

  test("compaction on a snapshotted avro table is a manifest operation") {
    val path = tmp("compact")
    import spark.implicits._
    (1 to 2000).map(i => (i.toLong, s"n_$i")).toDF("id", "name")
      .repartition(10, col("id"))
      .write.format("graft-avro").mode("overwrite")
      .option("snapshots", "true").save(path)
    val r = graft.io.AvroCompact.compact(spark, path, targetBytes = 1L << 30)
    assert(r.filesAfter < r.filesBefore)
    val fs = fsOf(path)
    assert(FeatherSnapshots.latestVersion(fs, new Path(path)) === Some(2L))
    // post-compaction reads plan off v2; v1 still time-travels
    assert(spark.read.format("graft-avro").load(path).count() === 2000)
    assert(spark.read.format("graft-avro").option("versionAsOf", "1")
      .load(path).count() === 2000)
    // expire reclaims the compacted-away inputs
    val (gone, files) = FeatherSnapshots.expire(fs, new Path(path), 1)
    assert(gone === 1 && files === 10)
    assert(spark.read.format("graft-avro").load(path).count() === 2000)
  }

  test("an existing avro directory adopts without rewriting") {
    val path = tmp("adopt")
    import spark.implicits._
    (1 to 300).map(i => (i.toLong, s"n_$i")).toDF("id", "name")
      .repartition(3).write.format("graft-avro").mode("overwrite").save(path)
    val fs = fsOf(path)
    val v = FeatherSnapshots.adopt(fs, new Path(path), Seq(".avro"))
    assert(v === 1L)
    assert(spark.read.format("graft-avro").load(path).count() === 300)
    // later writes keep publishing manifests
    (301 to 320).map(i => (i.toLong, s"n_$i")).toDF("id", "name")
      .repartition(1).write.format("graft-avro").mode("append").save(path)
    assert(FeatherSnapshots.latestVersion(fs, new Path(path)) === Some(2L))
    assert(spark.read.format("graft-avro").option("versionAsOf", "1")
      .load(path).count() === 300)
  }

  test("streaming WRITES into a snapshotted avro table publish manifests") {
    val path = tmp("stream_sink")
    writeV(path, 1, 30, "overwrite") // v1
    import spark.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val q = input.toDF().toDF("id", "name")
      .writeStream.format("graft-avro")
      .option("path", path)
      .option("checkpointLocation", s"${tmp("stream_sink_ckpt")}/c")
      .start()
    try {
      input.addData(31L -> "n_31", 32L -> "n_32")
      q.processAllAvailable()
    } finally q.stop()
    val fs = fsOf(path)
    // the epoch published an append manifest: manifest-planned reads see
    // the streamed rows (without it they'd be invisible and vacuumable)
    assert(FeatherSnapshots.latestVersion(fs, new Path(path)).get >= 2L)
    assert(spark.read.format("graft-avro").load(path).count() === 32)
  }

  test("an empty overwrite of a snapshotted table stays readable") {
    val path = tmp("empty_ow")
    writeV(path, 1, 40, "overwrite")
    import spark.implicits._
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        Seq((1L, "x")).toDF("id", "name").schema)
      .write.format("graft-avro").mode("overwrite").save(path)
    val df = spark.read.format("graft-avro").load(path)
    assert(df.count() === 0)
    assert(df.columns.toSeq === Seq("id", "name"))
    // history intact
    assert(spark.read.format("graft-avro").option("versionAsOf", "1")
      .load(path).count() === 40)
  }

  test("a snapshotted avro table streams by manifest version, exactly once") {
    import org.apache.spark.sql.functions._
    val path = tmp("version_stream")
    val ckpt = tmp("version_stream_ckpt")
    writeV(path, 1, 100, "overwrite") // v1 before the stream starts
    val q = spark.readStream.format("graft-avro").load(path)
      .writeStream.format("memory").queryName("avro_snap_stream")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable() // initial load = current snapshot
      assert(spark.table("avro_snap_stream").count() === 100)
      writeV(path, 101, 150, "append") // v2
      q.processAllAvailable()
      assert(spark.table("avro_snap_stream").count() === 150)
      // compaction rewrites delivered rows — the version stream skips them
      val r = graft.io.AvroCompact.compact(spark, path, targetBytes = 1L << 30)
      assert(r.groupsRewritten >= 1)
      q.processAllAvailable()
      assert(spark.table("avro_snap_stream").count() === 150,
        "compacted rewrites must not re-stream")
      writeV(path, 151, 170, "append") // v4
      q.processAllAvailable()
      val got = spark.table("avro_snap_stream")
      assert(got.count() === 170)
      assert(got.agg(sum(col("id"))).head().getLong(0) ===
        (1 to 170).map(_.toLong).sum, "exactly-once across all version ops")
    } finally q.stop()
  }

  test("an avro version stream hits a delete: loud, then skips under " +
       "ignoreChanges; a merge delivers its parts under ignoreChanges") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val path = tmp("version_stream_mut")
    writeV(path, 1, 60, "overwrite")
    val q = spark.readStream.format("graft-avro").load(path)
      .writeStream.format("memory").queryName("avro_snap_mut")
      .option("checkpointLocation", tmp("version_stream_mut_ckpt"))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("avro_snap_mut").count() === 60)
      graft.io.FeatherMutations.deleteByKey(spark, path,
        Seq(1L, 2L).toDF("id"), Seq("id")) // v2: delete mid-stream
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("delete") ||
        Option(e.getCause).exists(_.getMessage.contains("delete")))
    } finally q.stop()
    val q2 = spark.readStream.format("graft-avro")
      .option("ignoreChanges", "true").load(path)
      .writeStream.format("memory").queryName("avro_snap_mut2")
      .option("checkpointLocation", tmp("version_stream_mut2_ckpt"))
      .start()
    try {
      q2.processAllAvailable() // initial load = post-delete snapshot
      assert(spark.table("avro_snap_mut2").count() === 58)
      // a merge mid-stream delivers its rewritten parts whole
      graft.io.FeatherMutations.merge(spark, path,
        Seq((100L, "n_100_v2"), (200L, "n_200")).toDF("id", "name"),
        Seq("id")) // v3: one replace + one insert
      q2.processAllAvailable()
      val got = spark.table("avro_snap_mut2")
      // the touched part re-delivers (downstream key-dedup contract):
      // latest row per key must reflect the merge
      val latest = got.groupBy("id").agg(max("name").as("name"))
      assert(latest.where(col("id") === 200L).count() === 1)
      assert(got.where(col("id") === 100L && col("name") === "n_100_v2")
        .count() >= 1)
    } finally q2.stop()
  }

  test("version stream over an evolved snapshotted avro table resolves " +
       "with mergeSchema") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val path = tmp("version_stream_evo")
    // gen1 (id, name) then an evolved append gen2 (id, name, lang)
    writeV(path, 1, 30, "overwrite")
    (31 to 40).map(i => (i.toLong, s"n_$i", "de")).toDF("id", "name", "lang")
      .repartition(1).write.format("graft-avro").mode("append")
      .option("mergeSchema", "true") // the write-evolution opt-in
      .option("snapshots", "true").save(path)
    val q = spark.readStream.format("graft-avro")
      .option("mergeSchema", "true").load(path)
      .writeStream.format("memory").queryName("avro_snap_evo")
      .option("checkpointLocation", tmp("version_stream_evo_ckpt"))
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("avro_snap_evo")
      assert(got.columns.toSeq === Seq("id", "name", "lang"))
      assert(got.count() === 40)
      assert(got.where(col("lang").isNull).count() === 30)
      assert(got.where(col("lang") === "de").count() === 10)
    } finally q.stop()
  }

}
