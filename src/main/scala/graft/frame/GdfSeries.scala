package graft.frame

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GF

/** Series facade: a labeled 1-D column — (index levels, one value column) —
  * with pandas/cuDF INDEX-ALIGNED arithmetic (core/series.py:1331 binop
  * dispatch via `_binaryop`; alignment itself is core/reshape.py:13
  * `_align_objs`).
  *
  * pandas semantics pinned here:
  *  - binops between two Series align on the UNION of index labels (outer
  *    join); a label present on only one side yields null (pandas NaN),
  *    unless `fillValue` is given, in which case the missing side is filled
  *    BEFORE the op — but a label missing on BOTH sides stays null even
  *    with a fill value.
  *  - binops with a scalar are a plain projection (no alignment).
  *
  * Scale notes: alignment is ONE shuffle join on the index (both sides
  * hash-partitioned by label); scalar ops are codegen projections. Nothing
  * here funnels through the driver. A duplicate label on both sides would
  * produce the pandas cross-of-duplicates; like the GdfFrame facade, the
  * standing contract is a unique index.
  */
final class GdfSeries(val df: DataFrame, val indexCols: Seq[String], val valueCol: String) {
  require(indexCols.nonEmpty, "a Series needs at least one index level")

  private def value: Column = col(valueCol)

  /** General aligned binop: outer-join on labels, apply `op`. */
  def alignedBinop(other: GdfSeries, outCol: String,
                   fillValue: Option[Column] = None)(
                   op: (Column, Column) => Column): GdfSeries = {
    require(indexCols.size == other.indexCols.size,
      s"index arity mismatch: $indexCols vs ${other.indexCols}")
    val l = df.select(indexCols.map(col) :+ value.as("__l"): _*)
    val r = other.df.select(
      other.indexCols.zip(indexCols).map { case (o, n) => col(o).as(n) } :+
        col(other.valueCol).as("__r"): _*)
    val joined = l.join(r, indexCols, "full_outer")
    val out = fillValue match {
      case Some(f) =>
        when(col("__l").isNull && col("__r").isNull, lit(null))
          .otherwise(op(coalesce(col("__l"), f), coalesce(col("__r"), f)))
      case None => op(col("__l"), col("__r")) // null side propagates → NaN-like null
    }
    new GdfSeries(joined.withColumn(outCol, out).drop("__l", "__r"), indexCols, outCol)
  }

  // pandas operator names (series.py add/sub/mul/div/mod/pow + fill_value)
  def add(o: GdfSeries, out: String, fill: Option[Column] = None): GdfSeries =
    alignedBinop(o, out, fill)(_ + _)
  def sub(o: GdfSeries, out: String, fill: Option[Column] = None): GdfSeries =
    alignedBinop(o, out, fill)(_ - _)
  def mul(o: GdfSeries, out: String, fill: Option[Column] = None): GdfSeries =
    alignedBinop(o, out, fill)(_ * _)
  def div(o: GdfSeries, out: String, fill: Option[Column] = None): GdfSeries =
    alignedBinop(o, out, fill)((a, b) => a.cast("double") / b.cast("double"))
  def mod(o: GdfSeries, out: String, fill: Option[Column] = None): GdfSeries =
    alignedBinop(o, out, fill)((a, b) => GF.pymod(a, b))
  def lt(o: GdfSeries, out: String): GdfSeries = alignedBinop(o, out)(_ < _)
  def eqv(o: GdfSeries, out: String): GdfSeries = alignedBinop(o, out)(_ === _)

  /** combine_first (series.py combine_first): union of labels, this side
    * wins where present. */
  def combineFirst(o: GdfSeries, out: String): GdfSeries =
    alignedBinop(o, out)((a, b) => coalesce(a, b))

  /** update (series.py:3574): the OTHER side's non-null values overwrite
    * this one's, but the label set stays THIS series' — a left join on the
    * index (vs combine_first's full-outer label union with this side
    * winning). */
  def update(o: GdfSeries, out: String): GdfSeries = {
    val l = df.select(indexCols.map(col) :+ value.as("__l"): _*)
    val r = o.df.select(
      o.indexCols.zip(indexCols).map { case (oc, n) => col(oc).as(n) } :+
        col(o.valueCol).as("__r"): _*)
    new GdfSeries(
      l.join(r, indexCols, "left")
        .withColumn(out, coalesce(col("__r"), col("__l")))
        .drop("__l", "__r"),
      indexCols, out)
  }

  /** map with a Series argument (series.py map): each VALUE is looked up in
    * the other series' INDEX; unmatched values → null (pandas NaN), the
    * label set stays this series'. A left equi-join on the value — the
    * dictionary-lookup shape; Spark broadcasts the dict side when small.
    *
    * pandas raises InvalidIndexError when the dict index is not unique; a
    * silent left join would instead MULTIPLY caller rows. The uniqueness
    * check is baked into the plan (group the dict by label, raise_error on
    * any count > 1) so it costs one aggregation of the small dict side and
    * fails at execution exactly when pandas would, with the offending
    * label in the message. */
  def map(o: GdfSeries, out: String): GdfSeries = {
    require(o.indexCols.size == 1, "map target needs a single-level index")
    val l = df.select(indexCols.map(col) :+ value.as("__k"): _*)
    val r = o.df.select(col(o.indexCols.head).as("__k"), col(o.valueCol).as(out))
      .groupBy(col("__k"))
      .agg(first(col(out)).as(out), count(lit(1)).as("__dupes"))
      .select(col("__k"),
        when(col("__dupes") > 1, raise_error(concat(
          lit("map dict index is not unique at label: "),
          col("__k").cast("string"))))
          .otherwise(col(out)).as(out))
    new GdfSeries(l.join(r, Seq("__k"), "left").drop("__k"), indexCols, out)
  }

  /** Scalar binop — no alignment, plain projection. */
  def mapValue(out: String)(op: Column => Column): GdfSeries =
    new GdfSeries(df.withColumn(out, op(value)), indexCols, out)

  def rename(out: String): GdfSeries =
    new GdfSeries(df.withColumnRenamed(valueCol, out), indexCols, out)

  /** Back to a plain (index..., value) DataFrame, labels ascending. */
  def toDF: DataFrame =
    df.select((indexCols.map(col) :+ value): _*).orderBy(indexCols.map(col(_).asc): _*)
}

object GdfSeries {
  /** Series from a frame column (dataframe.py __getitem__ → Series). */
  def apply(df: DataFrame, indexCol: String, valueCol: String): GdfSeries =
    new GdfSeries(df.select(col(indexCol), col(valueCol)), Seq(indexCol), valueCol)

  def multi(df: DataFrame, indexCols: Seq[String], valueCol: String): GdfSeries =
    new GdfSeries(df.select((indexCols :+ valueCol).map(col): _*), indexCols, valueCol)
}
