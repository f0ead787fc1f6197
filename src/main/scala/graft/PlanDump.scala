package graft

/** Dev tool: write `.explain("formatted")` for the named registry queries to
  * `<outDir>/<name>_<suffix>.txt` — the before/after plan receipts the
  * optimization rounds commit under plans/.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <name>[,<name>...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names) = args.take(4)
    val spark = GraftSession.build("graft-plandump")
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names.split(",")) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      graft.ops.OrderedOps.clearPins()
      println(s"PLANDUMP wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
