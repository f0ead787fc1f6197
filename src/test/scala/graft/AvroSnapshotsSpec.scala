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

  test("streaming a snapshotted avro table fails loudly") {
    val path = tmp("stream_guard")
    writeV(path, 1, 20, "overwrite")
    val e = intercept[Exception] {
      spark.readStream.format("graft-avro").load(path)
        .writeStream.format("memory").queryName("avro_snap_guard").start()
        .processAllAvailable()
    }
    assert(e.getMessage.contains("snapshotted avro") ||
      Option(e.getCause).exists(_.getMessage.contains("snapshotted avro")))
  }
}
