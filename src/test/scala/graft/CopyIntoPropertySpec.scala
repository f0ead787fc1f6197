package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.CopyInto

/** Property-fuzz of COPY INTO's exactly-once contract: seeded random
  * sequences of batch drops, re-runs, subdirectory copies, and
  * whole-root copies against ONE table, folded against a set-union
  * model (ingested source paths → expected row ids). After every
  * statement the table's content must equal the union of every
  * ingested file's rows EXACTLY ONCE — the property the ledger, the
  * delta-log reconstruction, and the path-keyed dedup exist to hold.
  * Example-based specs pin the crash/race protocol; this layer sweeps
  * the overlap combinatorics (the same file reachable through its
  * batch dir AND the root, interleaved arrivals, empty diffs). */
class CopyIntoPropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def tmp(n: String): String = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_copy_prop/$n"
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe)
      f.delete(): Unit
    }
    wipe(new java.io.File(p))
    p
  }

  /** The model's view of a directory: every visible file below it
    * (the same eligibility listSource applies — hidden names skip). */
  private def modelList(dir: java.io.File): Seq[java.io.File] = {
    if (!dir.exists()) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[java.io.File]
    def walk(f: java.io.File): Unit =
      if (f.getName.startsWith("_") || f.getName.startsWith(".")) ()
      else if (f.isDirectory) f.listFiles().foreach(walk)
      else out += f
    dir.listFiles().foreach(walk)
    out.toSeq
  }

  test("10 seeded random COPY sequences: table content equals the " +
       "union of every ingested file's rows exactly once") {
    import spark.implicits._
    for (scenario <- 0 until 10) {
      val rng = new scala.util.Random(91501L + scenario)
      val table = tmp(s"sc$scenario")
      val srcRoot = new java.io.File(tmp(s"sc${scenario}_src"))
      // empty table via the SQL birth statement — USING feather
      // explicitly (an omitted USING arrives as Spark's own
      // sources.default, the parquet face)
      spark.sql(s"CREATE TABLE graft.`$table` (id BIGINT, amt DOUBLE) " +
        "USING feather").collect(): Unit

      var nextId = 1L
      var batches = Vector.empty[String] // batch dir paths
      // file's canonical path -> the ids its rows carry
      var fileIds = Map.empty[String, Seq[Long]]
      var ingested = Set.empty[String]

      def dropBatch(): String = {
        val dir = new java.io.File(srcRoot, s"b${batches.size}")
        val files = 1 + rng.nextInt(3)
        for (_ <- 1 to files) {
          val n = 3 + rng.nextInt(15)
          val ids = (nextId until nextId + n).toSeq
          nextId += n
          val before = modelList(dir).map(_.getCanonicalPath).toSet
          ids.map(i => (i, i * 1.0)).toDF("id", "amt")
            .coalesce(1).write.mode("append").parquet(dir.getPath)
          val added = modelList(dir).map(_.getCanonicalPath).toSet -- before
          assert(added.size == 1, s"one parquet part per write: $added")
          fileIds += added.head -> ids
        }
        batches :+= dir.getPath
        dir.getPath
      }

      def copy(dir: String): Unit = {
        val visible = modelList(new java.io.File(dir))
          .map(_.getCanonicalPath).toSet
        val fresh = visible -- ingested
        val r = CopyInto.run(spark, table, dir, "parquet")
        assert(r.filesIngested == fresh.size &&
            r.filesSkipped == visible.size - fresh.size,
          s"scenario $scenario copy($dir): engine $r vs model " +
            s"fresh=${fresh.size}/${visible.size}")
        ingested ++= fresh
        val want = ingested.toSeq.flatMap(fileIds).sorted
        val got = spark.read.format("feather").load(table)
          .select("id").collect().map(_.getLong(0)).sorted.toSeq
        assert(got == want,
          s"scenario $scenario diverged after copy($dir): " +
            s"got ${got.size} rows, want ${want.size} " +
            s"(dup/lost: ${got.diff(want).take(5)} / " +
            s"${want.diff(got).take(5)})")
      }

      dropBatch()
      for (_ <- 0 until 10) rng.nextInt(10) match {
        case n if n < 3 => copy(dropBatch()) // new batch, copy its dir
        case n if n < 6 => // re-run or copy an existing batch dir
          copy(batches(rng.nextInt(batches.size)))
        case n if n < 8 => copy(srcRoot.getPath) // the whole root
        case _ => // a batch ARRIVES but is not copied yet (the next
          dropBatch(): Unit // root copy must sweep it in exactly once)
      }
      copy(srcRoot.getPath) // final sweep: everything lands exactly once
    }
  }
}
