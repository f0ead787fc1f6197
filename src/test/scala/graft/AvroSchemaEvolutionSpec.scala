package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.GraftAvro

/** Schema evolution on the graft-avro connector: mergeSchema=true builds
  * a union reader schema with null defaults and lets Avro's own per-file
  * resolution fill them — evolution the Avro way. Default reads keep the
  * first-file-schema contract (resolution projects later generations
  * down to it). */
class AvroSchemaEvolutionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def tmp(n: String): String = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_avro_evo/$n"
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe)
      f.delete(): Unit
    }
    wipe(new java.io.File(p))
    p
  }

  /** One generation as one part file, driver-written. */
  private def writeGen(path: String, name: String, df: DataFrame): Unit = {
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(path))
    val pw = new GraftAvro.AvroPartWriter(df.schema,
      GraftAvro.toAvroSchema(df.schema).toString,
      fs.create(new Path(path, name), true), "null")
    df.collect().foreach(pw.append)
    pw.finish()
  }

  private def twoGens(path: String): Unit = {
    import spark.implicits._
    writeGen(path, "gen1.avro",
      (1 to 50).map(i => (i.toLong, s"p_$i")).toDF("id", "pay"))
    writeGen(path, "gen2.avro",
      (51 to 80).map(i => (i.toLong, s"p_$i", "en")).toDF("id", "pay", "lang"))
  }

  test("default read projects later generations down to the first schema") {
    val path = tmp("strict")
    twoGens(path)
    val df = spark.read.format("graft-avro").load(path)
    assert(df.columns.toSeq === Seq("id", "pay")) // gen1 leads, lang unseen
    assert(df.count() === 80)
  }

  test("mergeSchema unions generations with null defaults") {
    val path = tmp("merge")
    twoGens(path)
    val df = spark.read.format("graft-avro")
      .option("mergeSchema", "true").load(path)
    assert(df.columns.toSeq === Seq("id", "pay", "lang"))
    assert(df.count() === 80)
    assert(df.where(col("lang").isNull).count() === 50)
    assert(df.where(col("lang") === "en").count() === 30)
    assert(df.where(col("id") === 60L).select("pay").head().getString(0)
      === "p_60")
  }

  test("projecting only common columns reads both generations") {
    val path = tmp("common")
    twoGens(path)
    val df = spark.read.format("graft-avro")
      .option("mergeSchema", "true").load(path)
      .select("id", "pay")
    assert(df.agg(sum("id")).head().getLong(0) === (1L to 80L).sum)
  }

  test("pruning away every evolved file keeps the merged schema resolvable") {
    val path = tmp("pruned_merge")
    import spark.implicits._
    // hive layout: dom=d0 predates `lang`, dom=d1 carries it
    writeGen(s"$path/dom=d0", "gen1.avro",
      (1 to 30).map(i => (i.toLong, s"p_$i")).toDF("id", "pay"))
    writeGen(s"$path/dom=d1", "gen2.avro",
      (31 to 50).map(i => (i.toLong, s"p_$i", "en")).toDF("id", "pay", "lang"))
    val df = spark.read.format("graft-avro")
      .option("mergeSchema", "true").load(path)
    // partition pruning to d0 leaves no file that carries `lang`; the
    // merged reader schema still resolves it (as all-null)
    val d0 = df.where(col("dom") === "d0").select("id", "lang")
    assert(d0.count() === 30)
    assert(d0.where(col("lang").isNull).count() === 30)
  }

  test("compacting heterogeneous generations keeps evolved columns") {
    val path = tmp("compact_evo")
    twoGens(path)
    val r = graft.io.AvroCompact.compact(spark, path, targetBytes = 1L << 30)
    assert(r.filesAfter < r.filesBefore, s"no-op: $r")
    val df = spark.read.format("graft-avro").load(path)
    assert(df.columns.toSeq === Seq("id", "pay", "lang"))
    assert(df.count() === 80)
    assert(df.where(col("lang").isNull).count() === 50)
    assert(df.where(col("lang") === "en").count() === 30)
  }

  test("a type conflict across generations fails loudly naming both files") {
    val path = tmp("conflict")
    import spark.implicits._
    writeGen(path, "gen1.avro", Seq((1L, 5L)).toDF("id", "v"))
    writeGen(path, "gen2.avro", Seq((2L, "five")).toDF("id", "v"))
    val e = intercept[Exception] {
      spark.read.format("graft-avro").option("mergeSchema", "true")
        .load(path).collect()
    }
    assert(e.getMessage.contains("'v'"))
  }

  test("a nullable later generation widens the merged reader schema") {
    val path = tmp("null_widen")
    import spark.implicits._
    // gen1 writes v as plain long; gen2 writes it as a null union holding
    // a null. Keeping gen1's non-null schema as the merged reader schema
    // would fail Avro resolution loudly on gen2's null rows.
    writeGen(path, "gen1.avro",
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))
    writeGen(path, "gen2.avro",
      Seq((3L, Option(30L)), (4L, Option.empty[Long])).toDF("id", "v"))
    val df = spark.read.format("graft-avro")
      .option("mergeSchema", "true").load(path)
    assert(df.schema("v").nullable)
    assert(df.count() === 4)
    assert(df.where(col("v").isNull).count() === 1)
    assert(df.where(col("v").isNotNull).agg(sum("v")).head().getLong(0) === 60L)
  }

}
