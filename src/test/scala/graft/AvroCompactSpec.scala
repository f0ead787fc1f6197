package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{AvroCompact, GraftAvro}

/** Avro face of the shared compaction engine: fewer files, identical rows,
  * no-op re-runs. The crash-recovery halves are engine behavior already
  * pinned format-independently in FeatherCompactSpec. */
class AvroCompactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def tmp(n: String) =
    s"${sys.props("java.io.tmpdir")}/graft_avro_compact/$n"

  private def avroNames(path: String): Seq[String] =
    new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".avro") && !f.getName.startsWith("."))
      .map(_.getName).sorted.toSeq

  test("many small avro parts compact into one with identical rows") {
    import spark.implicits._
    val path = tmp("basic")
    val df = (1 to 3000).map(i => (i.toLong, s"v_$i", i * 0.5)).toDF("id", "s", "x")
    GraftAvro.write(df.repartition(12, col("id")), path,
      codec = "deflate", overwrite = true)
    def rows = spark.read.format("graft-avro").load(path)
      .select("id", "s", "x").as[(Long, String, Double)].collect().sorted.toSeq
    val before = rows
    assert(avroNames(path).size === 12)
    val r = AvroCompact.compact(spark, path, targetBytes = 1L << 30)
    assert(r.filesBefore === 12 && r.filesAfter === 1 && r.groupsRewritten === 1, r)
    assert(rows === before)
    // second run: nothing left to rewrite, names stable
    val names = avroNames(path)
    val r2 = AvroCompact.compact(spark, path, targetBytes = 1L << 30)
    assert(r2.groupsRewritten === 0)
    assert(avroNames(path) === names)
  }
}
