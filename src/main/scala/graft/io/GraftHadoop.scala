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

  /** Executor-side `Configuration` rebuilt from the broadcast map ONCE
    * per JVM per broadcast (keyed by broadcast id): rebuilding is
    * O(entries), and readers that pay it per partition turn a
    * 10⁵-partition scan into 10⁵ redundant rebuilds. The cached conf is
    * SHARED across that JVM's tasks — callers must treat it as
    * read-only (every graft reader does: it only derives FileSystem
    * handles and decoder settings). One entry per live session's conf
    * broadcast — bounded like [[confBroadcast]]'s own cache. */
  private val execConfCache =
    new java.util.concurrent.ConcurrentHashMap[
      Long, org.apache.hadoop.conf.Configuration]()

  def execConf(
      confMap: org.apache.spark.broadcast.Broadcast[Map[String, String]])
      : org.apache.hadoop.conf.Configuration =
    execConfCache.computeIfAbsent(confMap.id, _ => {
      val c = new org.apache.hadoop.conf.Configuration(false)
      confMap.value.foreach { case (k, v) => c.set(k, v) }
      c
    })
}
