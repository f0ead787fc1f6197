package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{FeatherCluster, FeatherMutations}
import graft.sources.FeatherSnapshots

/** Model-based check of the snapshot mutation tier: a seeded random
  * sequence of append / delete / merge / cdc / cluster / expire steps
  * runs against both the real table and an in-memory Map model; after
  * every step the table's full content must equal the model's. This is
  * the property the whole tier reduces to — no sequence of manifest
  * operations may lose, duplicate, or corrupt a row. */
class MutationPropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def tmp(n: String): String = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_mut_prop/$n"
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe)
      f.delete(): Unit
    }
    wipe(new java.io.File(p))
    p
  }

  test("random op sequences agree with the in-memory model (seeded)") {
    import spark.implicits._
    val path = tmp("model")
    val rnd = new scala.util.Random(4242)
    val model = scala.collection.mutable.Map.empty[Long, String]
    var nextId = 0L
    def freshRows(n: Int): Seq[(Long, String)] =
      (1 to n).map { _ =>
        nextId += 1
        (nextId, s"v${rnd.nextInt(1000)}")
      }

    // seed
    val seed = freshRows(200)
    seed.foreach { case (k, v) => model(k) = v }
    seed.toDF("id", "pay").repartitionByRange(4, col("id"))
      .write.format("feather").mode("overwrite")
      .option("snapshots", "true").save(path)

    def check(step: String): Unit = {
      val got = spark.read.format("feather").load(path)
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      assert(got === model.toMap,
        s"divergence after $step: table has ${got.size} rows, " +
          s"model ${model.size}; diff=${(got.toSet diff model.toSet).take(5)} " +
          s"/ ${(model.toSet diff got.toSet).take(5)}")
    }

    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (step <- 1 to 21) {
      rnd.nextInt(7) match {
        case 0 => // append
          val rows = freshRows(rnd.nextInt(50) + 1)
          rows.foreach { case (k, v) => model(k) = v }
          rows.toDF("id", "pay").repartition(2)
            .write.format("feather").mode("append").save(path)
          check(s"$step:append")
        case 1 => // delete a random slice of existing + some absent keys
          val existing = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(30))
          val absent = Seq.fill(5)(nextId + 1000 + rnd.nextInt(500).toLong)
          existing.foreach(model.remove)
          FeatherMutations.deleteByKey(spark, path,
            (existing ++ absent).toDF("id"), Seq("id"))
          check(s"$step:delete")
        case 2 => // merge: update a slice + insert fresh
          val upd = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(20))
            .map(k => (k, s"u$step-${rnd.nextInt(99)}"))
          val ins = freshRows(rnd.nextInt(20))
          (upd ++ ins).foreach { case (k, v) => model(k) = v }
          FeatherMutations.merge(spark, path,
            (upd ++ ins).toDF("id", "pay"), Seq("id"))
          check(s"$step:merge")
        case 3 => // cdc: tombstones + upserts in one frame
          val dels = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(10))
          val ups = freshRows(rnd.nextInt(10))
          dels.foreach(model.remove)
          ups.foreach { case (k, v) => model(k) = v }
          val changes =
            dels.map(k => (k, null.asInstanceOf[String], true)) ++
              ups.map { case (k, v) => (k, v, false) }
          if (changes.nonEmpty) {
            FeatherMutations.applyCdc(spark, path,
              changes.toDF("id", "pay", "_deleted"), Seq("id"))
            check(s"$step:cdc")
          }
        case 4 => // cluster (row-preserving), rebuilding bloom sidecars
          FeatherCluster.cluster(spark, path, Seq("id"),
            targetBytes = 16 << 10, bloomFor = Some("id"))
          check(s"$step:cluster")
        case 5 => // expire history (content-preserving at head)
          FeatherSnapshots.expire(fs, new org.apache.hadoop.fs.Path(path),
            keepLast = 2)
          check(s"$step:expire")
        case 6 => // small-file compaction (content-preserving manifest op)
          graft.io.FeatherCompact.compact(spark, path,
            targetBytes = 64 << 10)
          check(s"$step:compact")
      }
    }
    // final sanity: versions advanced (expire steps retire history and
    // some steps commit nothing, so the count is below the step count)
    val latest = FeatherSnapshots.latestVersion(fs,
      new org.apache.hadoop.fs.Path(path)).get
    assert(latest > 1L)
  }
}
