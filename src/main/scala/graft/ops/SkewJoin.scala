package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the skewed (fact) side, replicate the
  * small (dim) side across the salt domain, join on (key, salt).
  *
  * At 100 TB a single hot key (a null-like sentinel, a default user id, a
  * viral document) can put >100 GB in one shuffle partition and stall the
  * stage on one straggler task. AQE's skew-join handles moderate skew for
  * sort-merge joins at runtime; explicit salting is the plan-level fix that
  * works for ANY join strategy and arbitrary skew factors. Results are
  * identical to the plain join — only the shuffle distribution changes
  * (hot key's rows spread over `saltFactor` partitions; dim rows duplicate
  * ×saltFactor, which is cheap when dim ≪ fact).
  */
object SkewJoin {

  /** Inner equi-join of `fact` (skewed, large) with `dim` (small) on
    * `key`, spreading each fact key over `saltFactor` shuffle partitions.
    * Salt is derived from a hash of the full fact row's unique id column so
    * it is deterministic (no rand(): retries/speculative tasks must land
    * identical rows). */
  def saltedInnerJoin(fact: DataFrame, dim: DataFrame, key: String,
                      factIdCol: String, saltFactor: Int): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(hash(col(factIdCol)), lit(saltFactor)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
