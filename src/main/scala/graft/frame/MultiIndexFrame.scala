package graft.frame

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MultiIndex facade: a frame whose index is an ordered list of level
  * columns (reference: python/cudf/cudf/core/multiindex.py — 1,702 LoC of
  * driver-side label bookkeeping there; here the levels are ordinary
  * distributed columns and every MultiIndex verb is a plain relational op,
  * so the whole surface stays shuffle-exact and scale-free).
  *
  * Verb → plan mapping:
  *  - groupby(level=...)      → groupBy on the chosen level columns
  *  - unstack(level)          → groupBy(remaining).pivot(level) with RUNTIME
  *                              value discovery (Spark's pivot collects the
  *                              distinct level values — bounded by
  *                              spark.sql.pivotMaxValues, default 10k; the
  *                              resulting column set is data-dependent, the
  *                              pandas contract)
  *  - stack()                 → `stack(n, name1, col1, ...)` generator over
  *                              the CURRENT column set (dynamic, not a
  *                              hardcoded list)
  *  - swaplevel / droplevel   → level-list reorder (no data movement at all)
  *  - xs(key, level)          → filter + project (cross-section)
  *  - sortIndex               → lexicographic range repartition + local sort
  */
final class MultiIndexFrame(val df: DataFrame, val levels: Seq[String]) {
  require(levels.nonEmpty, "MultiIndex needs at least one level")
  private def valueCols: Seq[String] = df.columns.toSeq.filterNot(levels.contains)

  /** groupby(level=...) (multiindex.py _get_grouper): aggregate over a
    * subset of index levels. */
  def groupbyLevel(levelIdx: Seq[Int])(aggs: Seq[Column]): DataFrame = {
    val keys = levelIdx.map(levels(_))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** unstack(level): pivot one index level into DYNAMIC columns named
    * `<prefix><levelValue>` (reshape.py:924 unstack). One value column at a
    * time (pandas unstacks each value column into its own band; callers
    * unstack per column to keep names flat). */
  def unstack(level: String, valueCol: String, prefix: String = ""): MultiIndexFrame = {
    require(levels.contains(level), s"$level is not an index level ($levels)")
    val remaining = levels.filterNot(_ == level)
    require(remaining.nonEmpty, "cannot unstack the only level")
    val pivoted = df.groupBy(remaining.map(col): _*)
      .pivot(level) // values discovered at plan time from the data
      .agg(first(col(valueCol)))
    val renamed = pivoted.columns.foldLeft(pivoted) { (d, c) =>
      if (remaining.contains(c)) d else d.withColumnRenamed(c, s"$prefix$c")
    }
    new MultiIndexFrame(renamed, remaining)
  }

  /** stack(): melt ALL current value columns (dynamic set) into a new
    * innermost index level + single value column (reshape.py:843 stack).
    * Value columns must share one type (pandas' homogeneous-dtype stack;
    * heterogeneous frames stack to object, which has no Spark analogue). */
  def stack(newLevel: String, valueName: String): MultiIndexFrame = {
    val vc = valueCols
    require(vc.nonEmpty, "nothing to stack")
    val pairs = vc.map(c => s"'$c', `$c`").mkString(", ")
    val stacked = df.select(
      levels.map(col) :+
        expr(s"stack(${vc.length}, $pairs) AS ($newLevel, $valueName)"): _*)
    new MultiIndexFrame(stacked, levels :+ newLevel)
  }

  /** swaplevel(i, j) (multiindex.py swaplevel): pure metadata — the level
    * ORDER changes, no shuffle, no projection. */
  def swapLevel(i: Int, j: Int): MultiIndexFrame = {
    val l = levels.toArray
    val t = l(i); l(i) = l(j); l(j) = t
    new MultiIndexFrame(df, l.toSeq)
  }

  /** droplevel(name): remove an index level (remaining labels must stay
    * unique — facade contract, same as pandas' implicit assumption). */
  def dropLevel(name: String): MultiIndexFrame =
    new MultiIndexFrame(df.drop(name), levels.filterNot(_ == name))

  /** xs(key, level): cross-section — select rows where `level == key`, drop
    * that level (dataframe.py xs). A filter, so it pushes down to the scan. */
  def xs(key: Any, level: String): MultiIndexFrame =
    new MultiIndexFrame(
      df.filter(col(level) === lit(key)).drop(level),
      levels.filterNot(_ == level))

  /** sort_index(): lexicographic order over the level list. */
  def sortIndex(): MultiIndexFrame = {
    // no explicit partition count — AQE right-sizes the range shuffle at
    // any scale (see OrderedOps)
    new MultiIndexFrame(
      df.repartitionByRange(levels.map(col): _*)
        .sortWithinPartitions(levels.map(col): _*),
      levels)
  }

  /** head in lexicographic index order (TakeOrderedAndProject, no global
    * sort — same plan discipline as GdfFrame.head). */
  def head(n: Int): DataFrame =
    df.orderBy(levels.map(col(_).asc): _*).limit(n)

  /** Dict-style multi-agg producing pandas' two-level agg columns, flattened
    * as `<col>_<fn>` (dataframe.py groupby.agg(dict) → MultiIndex columns).
    * `selectOuter` below is the `df[col]` outer-level selector. */
  def aggDict(levelIdx: Seq[Int], spec: Seq[(String, Seq[String])]): MultiIndexFrame = {
    val keys = levelIdx.map(levels(_))
    val aggs = spec.flatMap { case (c, fns) =>
      fns.map(fn => expr(s"$fn(`$c`)").as(s"${c}_$fn"))
    }
    new MultiIndexFrame(
      df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*), keys)
  }

  /** Outer-level column selector over flattened two-level names: keeps the
    * index plus every `<outer>_<fn>` column (MultiIndex columns `df[col]`). */
  def selectOuter(outer: String): MultiIndexFrame =
    new MultiIndexFrame(
      df.select((levels ++ valueCols.filter(_.startsWith(outer + "_"))).map(col): _*),
      levels)
}

object MultiIndexFrame {
  /** set_index([cols...]): promote columns to a MultiIndex. */
  def apply(df: DataFrame, levels: Seq[String]): MultiIndexFrame =
    new MultiIndexFrame(df, levels)
}
