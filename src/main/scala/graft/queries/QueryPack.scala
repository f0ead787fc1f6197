package graft.queries

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-checkable queries.
  *
  * Each entry pairs a Spark DataFrame program with (optionally) an ANSI-SQL
  * oracle that DuckDB runs over the same parquet tables. The driver
  * hash-compares both results with columns sorted by name — so every
  * registered query must (a) alias output columns identically on both sides,
  * and (b) be fully deterministic: explicit ORDER BY on a unique key, and no
  * order-sensitive floating-point aggregation (see GF.dec2 for the exact
  * decimal pattern).
  */
abstract class QueryPack {
  private val q = mutable.LinkedHashMap.empty[String, (SparkSession, String) => DataFrame]
  private val o = mutable.LinkedHashMap.empty[String, String]

  /** Register a query with a DuckDB oracle. */
  protected def register(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Unit = {
    require(!q.contains(name), s"duplicate query $name")
    q(name) = fn
    if (oracle ne null) o(name) = oracle
  }

  /** Register a query with only the weaker rows-only check (non-SQL op). */
  protected def registerNoOracle(name: String)(
      fn: (SparkSession, String) => DataFrame): Unit = register(name, null)(fn)

  final def defs: Map[String, (SparkSession, String) => DataFrame] = q.toMap
  final def oracles: Map[String, String] = o.toMap
  final def names: Seq[String] = q.keys.toSeq
}
