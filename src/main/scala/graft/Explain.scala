package graft

/** Dev utility: print the formatted physical plan of one or more registry
  * queries (the `.explain("formatted")` loop the build discipline calls for
  * after every operator lands). Usage:
  *   runMain graft.Explain <sfDir> <name>[,<name>...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names =
      if (args.length > 1) args(1).split(",").toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.build("graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
