package graft.frame

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Categorical dtype facade (reference python/cudf/cudf/core/column/
  * categorical.py — CategoricalAccessor: categories/codes/add_categories/
  * remove_categories/rename_categories/reorder_categories).
  *
  * Faithful to the reference representation in BOTH directions:
  *  - the DATA IS THE CODES — `facts` carries an integer `codeCol`; and
  *  - the DICTIONARY IS METADATA — `categories(i)` is the label for code i,
  *    held driver-side exactly like cuDF's CategoricalDtype.categories (and
  *    Spark MLlib's StringIndexer labels). A categorical's cardinality is
  *    small by definition, so the label list is collected ONCE at
  *    construction (a distributed distinct; only k strings reach the
  *    driver) and every dictionary verb afterwards is a pure driver-side
  *    list transform — zero Spark jobs, zero scans.
  *
  * Fact-touching verbs are ONE broadcast-hash join against a
  * LocalTableScan of the k-row dictionary (plan-audited: the fact side
  * never shuffles and the dictionary is never recomputed) — re-coding a
  * 100-TB column moves no data but the broadcast. Label strings cross the
  * wire exactly once, at construction.
  *
  * pandas semantics pinned here (and in CategoricalSpec):
  *  - codes assigned in sorted category order at construction (the
  *    deterministic cross-engine variant of first-appearance order, same
  *    convention as set_factorize); nulls are never a category.
  *  - rename_categories: 1:1 relabel, codes unchanged, facts untouched.
  *  - remove_categories: removed values' rows get a null code (pandas NaN);
  *    survivors re-code in retained order.
  *  - add_categories: appended AFTER existing categories (fresh codes at
  *    the end), present in the dictionary but in no row.
  *  - reorder_categories: permutation of the existing category set; codes
  *    follow the new order and facts are re-coded through a code→code map.
  */
final class GdfCategorical(
    val facts: DataFrame, val codeCol: String, val categories: Seq[String]) {

  private val spark = facts.sparkSession

  /** The dictionary as a (category, code) DataFrame — a LocalTableScan. */
  def dict: DataFrame = {
    import spark.implicits._
    categories.zipWithIndex.toDF("category", "code")
  }

  /** Fact rows with labels restored — a broadcast join on the code. Rows
    * whose category was removed decode to null, like pandas NaN. */
  def decoded(outCol: String): DataFrame =
    facts.join(
      broadcast(dict.select(col("code").as(codeCol), col("category").as(outCol))),
      Seq(codeCol), "left")

  /** rename_categories(mapper): driver-side relabel; labels not in the
    * mapper pass through (pandas dict-mapper behavior). No Spark job. */
  def renameCategories(mapper: Map[String, String]): GdfCategorical =
    new GdfCategorical(facts, codeCol, categories.map(c => mapper.getOrElse(c, c)))

  /** remove_categories(values): dropped categories leave the dictionary and
    * their rows' codes become null; survivors re-code in retained order. */
  def removeCategories(values: Seq[String]): GdfCategorical = {
    val drop = values.toSet
    val kept = categories.filterNot(drop)
    recode(kept, categories.zipWithIndex.collect {
      case (c, old) if !drop(c) => (old, kept.indexOf(c))
    })
  }

  /** add_categories(values): append with fresh codes at the end. Dictionary
    * metadata only; no fact row changes, no Spark job. */
  def addCategories(values: Seq[String]): GdfCategorical =
    new GdfCategorical(facts, codeCol, categories ++ values)

  /** reorder_categories(newOrder): explicit permutation of the current
    * category set (facade contract, as in pandas: same elements, new
    * order); codes follow the listed order and facts are re-coded. */
  def reorderCategories(newOrder: Seq[String]): GdfCategorical = {
    require(newOrder.sorted == categories.sorted,
      s"reorder must permute the current categories ($categories)")
    recode(newOrder, categories.zipWithIndex.map {
      case (c, old) => (old, newOrder.indexOf(c))
    })
  }

  /** Re-code facts through an old→new broadcast map (k rows; missing old
    * codes — removed categories — decode to null). */
  private def recode(newCats: Seq[String], mapping: Seq[(Int, Int)]): GdfCategorical = {
    import spark.implicits._
    val codeMap = mapping.toDF(codeCol, "__newcode")
    val refacts = facts
      .join(broadcast(codeMap), Seq(codeCol), "left")
      .withColumn(codeCol, col("__newcode"))
      .drop("__newcode")
    new GdfCategorical(refacts, codeCol, newCats)
  }
}

object GdfCategorical {
  /** Default dictionary-size cap for `fromColumn`. A categorical is by
    * definition low-cardinality; 65 536 labels is already far past any
    * sensible dictionary and still only a few MB on the driver. */
  val DefaultMaxCategories: Int = 1 << 16

  /** astype('category'): factorize `valueCol` into a sorted-order dictionary
    * and replace the raw values with codes — the one pass where label
    * strings travel. The distinct runs distributed; only the k distinct
    * labels are collected (categorical.py as_categorical_column).
    *
    * Guarded: `astype('category')` on a high-cardinality column (doc ids,
    * URLs) at 100-TB scale must be a clear error, not a driver OOM. ONE
    * bounded job: `take(cap + 2)` never moves more than cap+2 rows to the
    * driver (cap non-null labels + the at-most-one null distinct row + one
    * overflow witness), fails fast when the non-null label count exceeds
    * the cap, and on success IS the full dictionary — no second scan.
    * Callers that genuinely want a bigger dictionary pass an explicit
    * `maxCategories`. */
  def fromColumn(facts: DataFrame, valueCol: String, codeCol: String,
      maxCategories: Int = DefaultMaxCategories): GdfCategorical = {
    import facts.sparkSession.implicits._
    val distinctLabels = facts.select(col(valueCol)).distinct()
    val probe = distinctLabels.take(maxCategories + 2)
    val nonNull = probe.flatMap(r => Option(r.getString(0)))
    require(nonNull.length <= maxCategories,
      s"astype('category') on '$valueCol' found > $maxCategories distinct labels; " +
        "this column is not categorical — collecting its dictionary would OOM the " +
        "driver at scale. Pass a larger maxCategories only if the dictionary is " +
        "genuinely meant to be this big.")
    // probe returned fewer than cap+2 rows ⇒ it saw EVERY distinct label
    val cats: Seq[String] = nonNull.sorted.toSeq
    val dict = cats.zipWithIndex.toDF(valueCol, codeCol)
    val coded = facts
      .join(broadcast(dict), Seq(valueCol), "left")
      .drop(valueCol)
    new GdfCategorical(coded, codeCol, cats)
  }
}
