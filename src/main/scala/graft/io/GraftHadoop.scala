package graft.io

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Shared Hadoop-conf plumbing for the hand-rolled sources (Avro,
  * Feather): ONE broadcast conf snapshot per SparkSession, not per
  * read/write call — a long-lived session running many IO queries must
  * not accumulate broadcast blocks on driver + executors. (Hadoop's
  * `Configuration` is not serializable, hence the Map snapshot.) */
object GraftHadoop {
  private val confCache =
    new java.util.concurrent.ConcurrentHashMap[
      SparkSession,
      org.apache.spark.broadcast.Broadcast[Map[String, String]]]()

  def confBroadcast(spark: SparkSession)
      : org.apache.spark.broadcast.Broadcast[Map[String, String]] =
    confCache.computeIfAbsent(spark, s =>
      s.sparkContext.broadcast(
        s.sparkContext.hadoopConfiguration.iterator().asScala
          .map(e => e.getKey -> e.getValue).toMap))
}
