package graft.frame

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.OrderedOps

/** Categorical dtype facade (reference python/cudf/cudf/core/column/
  * categorical.py — CategoricalAccessor: categories/codes/add_categories/
  * remove_categories/rename_categories/reorder_categories).
  *
  * Faithful to the reference representation: the DATA IS THE CODES — `facts`
  * carries an integer `codeCol`, and the labels live only in the dictionary
  * `(category, code)`. That is why rename_categories touches zero fact rows,
  * and why remove/reorder re-code facts through a code→code broadcast map
  * rather than re-hashing strings.
  *
  * Codes are assigned in sorted category order (the deterministic
  * cross-engine variant of first-appearance order — same convention as
  * set_factorize), built with the two-phase OrderedOps numbering so the
  * dictionary build never funnels through one task.
  *
  * Scale contract: the dictionary is small by the nature of a categorical
  * (cardinality ≪ rows), so every fact-touching verb is ONE broadcast-hash
  * join — re-coding a 100-TB column shuffles nothing, and the string labels
  * cross the wire exactly once (at construction).
  *
  * pandas semantics pinned here (and in CategoricalSpec):
  *  - rename_categories: 1:1 relabel, codes unchanged, facts untouched.
  *  - remove_categories: removed values' rows get a null code (pandas NaN);
  *    surviving categories are re-coded in their retained order.
  *  - add_categories: appended AFTER existing categories (fresh codes at the
  *    end), present in the dictionary but in no row.
  *  - reorder_categories: permutation of the existing category set; codes
  *    follow the new order and facts are re-coded accordingly.
  */
final class GdfCategorical(
    val facts: DataFrame, val codeCol: String, val dict: DataFrame) {

  def categories: DataFrame = dict // (category, code)

  /** Fact rows with labels restored — a broadcast join on the code. Rows
    * whose category was removed decode to null, like pandas NaN. */
  def decoded(outCol: String): DataFrame =
    facts.join(
      broadcast(dict.select(col("code").as(codeCol), col("category").as(outCol))),
      Seq(codeCol), "left")

  /** rename_categories(mapper): dictionary-only relabel; labels not in the
    * mapper pass through (pandas dict-mapper behavior). Codes and facts are
    * untouched — the whole op is a projection over k dictionary rows. */
  def renameCategories(mapper: Map[String, String]): GdfCategorical = {
    val m = typedlit(mapper)
    new GdfCategorical(facts, codeCol,
      dict.select(
        coalesce(element_at(m, col("category")), col("category")).as("category"),
        col("code")))
  }

  /** remove_categories(values): dropped categories leave the dictionary and
    * their rows' codes become null; survivors re-code in retained order. */
  def removeCategories(values: Seq[String]): GdfCategorical =
    rebuildWith(dict.filter(!col("category").isin(values: _*))
      .select(col("category"), col("code").as("__old")))

  /** add_categories(values): append with fresh codes after the existing max.
    * Dictionary-only; no fact row changes. */
  def addCategories(values: Seq[String]): GdfCategorical = {
    val spark = dict.sparkSession
    import spark.implicits._
    val start = dict.agg(coalesce(max(col("code")), lit(-1))).head().getInt(0) + 1
    val added = values.zipWithIndex
      .map { case (v, i) => (v, start + i) }.toDF("category", "code")
    new GdfCategorical(facts, codeCol, dict.unionByName(added))
  }

  /** reorder_categories(newOrder): explicit permutation of the current
    * category set (facade contract, as in pandas: same elements, new order);
    * codes follow the listed order and facts are re-coded. */
  def reorderCategories(newOrder: Seq[String]): GdfCategorical = {
    val spark = dict.sparkSession
    import spark.implicits._
    val target = newOrder.zipWithIndex.toDF("category", "__new")
    rebuildWith(dict.join(broadcast(target), Seq("category"))
      .select(col("category"), col("code").as("__old"), col("__new")))
  }

  /** Re-code facts through an old→new code map (broadcast, k rows) and
    * install the new dictionary. `pending`: (category, __old[, __new]);
    * when __new is absent the new codes come from sorted-category order. */
  private def rebuildWith(pending: DataFrame): GdfCategorical = {
    val withNew =
      if (pending.columns.contains("__new")) pending
      else OrderedOps.withGlobalRowNumber(pending, "__rn", Seq(col("category")))
        .select(col("category"), col("__old"), (col("__rn") - 1).as("__new"))
    val codeMap = withNew.select(col("__old").as(codeCol),
      col("__new").cast(IntegerType).as("__newcode"))
    val refacts = facts
      .join(broadcast(codeMap), Seq(codeCol), "left")
      .withColumn(codeCol, col("__newcode"))
      .drop("__newcode")
    val newDict = withNew.select(col("category"), col("__new").cast(IntegerType).as("code"))
    new GdfCategorical(refacts, codeCol, newDict)
  }
}

object GdfCategorical {
  /** astype('category'): factorize `valueCol` into a sorted-order dictionary
    * and replace the raw values with codes — the one pass where label strings
    * travel (categorical.py as_categorical_column). */
  def fromColumn(facts: DataFrame, valueCol: String, codeCol: String): GdfCategorical = {
    val dict = OrderedOps.withGlobalRowNumber(
        facts.select(col(valueCol).as("category")).distinct(), "code", Seq(col("category")))
      .select(col("category"), (col("code") - 1).cast(IntegerType).as("code"))
    val coded = facts
      .join(broadcast(dict.select(col("category").as(valueCol), col("code").as(codeCol))),
        Seq(valueCol), "left")
      .drop(valueCol)
    new GdfCategorical(coded, codeCol, dict)
  }
}
