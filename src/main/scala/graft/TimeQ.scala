package graft

/** Dev timing harness: run a comma-separated list of registry queries twice
  * each (cold + warm) after the same untimed warmup Bench uses
  * (Bench.warmup — one query per table/operator class + the bucketed-table
  * fixture), printing per-rep wall seconds. Complements Bench (whole-suite,
  * single rep) when isolating one query's cost from suite ordering noise.
  *
  * Usage: runMain graft.TimeQ <sfDir> <name>[,<name>...]
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.build("graft-timeq")
    spark.sparkContext.setLogLevel("WARN")
    Bench.warmup(spark, sfDir)
    for (name <- args(1).split(",") ; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"TIMEQ $name rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // release pins per rep, exactly as Bench does — a pinned query's
      // warm rep must rebuild its cache or the reading is not
      // bench-representative (and pins would accumulate across queries)
      graft.ops.OrderedOps.clearPins()
    }
    spark.stop()
  }
}
