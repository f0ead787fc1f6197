package graft

import org.apache.spark.sql.functions._

object ScratchEvo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("scratch-evo")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evo").toString
    Seq((1L, "a")).toDF("id", "pay").write.format("feather")
      .mode("overwrite").option("snapshots", "true").save(s"$dir/t")
    // append with an EXTRA column
    try {
      Seq((2L, "b", 9.5)).toDF("id", "pay", "score").write.format("feather")
        .mode("append").save(s"$dir/t")
      println("APPEND-EXTRA: succeeded")
    } catch { case e: Exception =>
      println(s"APPEND-EXTRA failed: ${e.getClass.getSimpleName}: ${e.getMessage.take(200)}") }
    // append with a MISSING column
    try {
      Seq(3L).toDF("id").write.format("feather").mode("append").save(s"$dir/t")
      println("APPEND-MISSING: succeeded")
    } catch { case e: Exception =>
      println(s"APPEND-MISSING failed: ${e.getClass.getSimpleName}: ${e.getMessage.take(200)}") }
    // append with a TYPE CONFLICT
    try {
      Seq(("x", "c")).toDF("id", "pay").write.format("feather")
        .mode("append").save(s"$dir/t")
      println("APPEND-CONFLICT: succeeded")
    } catch { case e: Exception =>
      println(s"APPEND-CONFLICT failed: ${e.getClass.getSimpleName}: ${e.getMessage.take(200)}") }
    val back = spark.read.format("feather").option("mergeSchema", "true")
      .load(s"$dir/t")
    println(s"READBACK: ${back.schema.simpleString}")
    back.show()
    spark.stop()
  }
}
