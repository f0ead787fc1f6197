package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join (pandas/cuDF merge_asof semantics: for each left row
  * (key, t), attach the latest right row with the same key and t_r ≤ t).
  *
  * Spark has no asof operator; the naive form is a range join that explodes
  * to |left|·|right| per key. The scalable composition is the union+window
  * trick: tag both inputs, union, sort within each key by (time, tag) —
  * right rows before left rows at equal times, so ties match backward-
  * inclusive — and carry the last non-null right payload forward with
  * `last(..., ignoreNulls)`. ONE shuffle on the key, window strictly
  * partition-local, zero row explosion: this is the plan you want at
  * 100 TB (both inputs stream through a single sort-merge pass per key).
  */
object AsOfJoin {

  /** Left rows gain `matched` columns from the latest right row at or
    * before their time.
    *
    * @param left      point-in-time rows; must contain keyCol + tCol
    * @param right     versioned rows; must contain keyCol + tCol + payload
    * @param keyCol    equi-join key
    * @param tCol      ordering column (numeric or timestamp; must be
    *                  duplicate-free per key on the right for determinism)
    * @param payload   right columns to attach (renamed as given)
    */
  def backward(left: DataFrame, right: DataFrame, keyCol: String, tCol: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // Payloads ride in ONE struct column: the struct is non-null for every
    // right row even when individual payload fields are null, so
    // last(ignoreNulls) attaches the MATCHED row's (possibly-null) values —
    // pandas/cuDF merge_asof semantics — rather than skipping to an older
    // row that happened to have a non-null field.
    val payloadStruct = struct(payload.map(col): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    val l = left
      .withColumn("__tag", lit(1))
      .select(leftCols.map(col) ++ Seq(col("__tag"),
        lit(null).cast(payloadType).as("__payload")): _*)
    val r = right
      .withColumn("__tag", lit(0))
      .select(leftCols.map(c => if (c == keyCol || c == tCol) col(c) else lit(null).as(c)) ++
        Seq(col("__tag"), payloadStruct.as("__payload")): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l.unionByName(r)
      .withColumn("__m", last(col("__payload"), ignoreNulls = true).over(w))
    carried
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__m.$p").as(p)): _*)
  }

  /** Forward as-of join (pandas merge_asof direction='forward'): attach the
    * EARLIEST right row with t_r ≥ t. Same union+window construction with
    * the frame flipped to [current, ∞) and ties ordered left-before-right
    * (tag desc) so an equal-time right row is inside the forward frame. */
  def forward(left: DataFrame, right: DataFrame, keyCol: String, tCol: String,
              payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val payloadStruct = struct(payload.map(col): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    val l = left
      .withColumn("__tag", lit(1))
      .select(leftCols.map(col) ++ Seq(col("__tag"),
        lit(null).cast(payloadType).as("__payload")): _*)
    val r = right
      .withColumn("__tag", lit(0))
      .select(leftCols.map(c => if (c == keyCol || c == tCol) col(c) else lit(null).as(c)) ++
        Seq(col("__tag"), payloadStruct.as("__payload")): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tCol).asc, col("__tag").desc)
      .rowsBetween(0, Window.unboundedFollowing)
    l.unionByName(r)
      .withColumn("__m", first(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__m.$p").as(p)): _*)
  }

  /** Nearest as-of join (pandas merge_asof direction='nearest'): attach the
    * right row minimizing |t_r − t|; backward wins exact ties (pandas). ONE
    * union and ONE sort feed BOTH framed aggregates (backward last +
    * forward first share the window ordering), so nearest costs the same
    * single shuffle as backward. The matched time rides inside the payload
    * struct (`__rt`) to decide the pick per row. */
  def nearest(left: DataFrame, right: DataFrame, keyCol: String, tCol: String,
              payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val payloadStruct = struct(col(tCol).as("__rt") +: payload.map(col): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    val l = left
      .withColumn("__tag", lit(1))
      .select(leftCols.map(col) ++ Seq(col("__tag"),
        lit(null).cast(payloadType).as("__payload")): _*)
    val r = right
      .withColumn("__tag", lit(0))
      .select(leftCols.map(c => if (c == keyCol || c == tCol) col(c) else lit(null).as(c)) ++
        Seq(col("__tag"), payloadStruct.as("__payload")): _*)
    val base = Window.partitionBy(col(keyCol))
      .orderBy(col(tCol).asc, col("__tag").asc)
    val wB = base.rowsBetween(Window.unboundedPreceding, 0)
    val wF = base.rowsBetween(0, Window.unboundedFollowing)
    // tag asc puts equal-time right rows BEFORE the left row: they land in
    // the backward frame (distance 0) and not the forward one — exactly the
    // backward-wins-ties rule.
    val t = col(tCol)
    val pick = when(col("__f").isNull, col("__b"))
      .when(col("__b").isNull, col("__f"))
      .when(t - col("__b.__rt") <= col("__f.__rt") - t, col("__b"))
      .otherwise(col("__f"))
    l.unionByName(r)
      .withColumn("__b", last(col("__payload"), ignoreNulls = true).over(wB))
      .withColumn("__f", first(col("__payload"), ignoreNulls = true).over(wF))
      .filter(col("__tag") === 1)
      .withColumn("__m", pick)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__m.$p").as(p)): _*)
  }
}
