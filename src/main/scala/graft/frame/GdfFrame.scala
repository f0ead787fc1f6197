package graft.frame

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.OrderedOps

/** Ordered-frame facade: cuDF/pandas index semantics over an unordered
  * Spark DataFrame (SURVEY §1.4 — "the single biggest semantic gap").
  *
  * Row order is represented by an EXPLICIT index column; operators that
  * promise order (head/tail/shift/diff/alignment) sort by or window over it.
  * Design rules, all enforced here rather than per-query:
  *
  *  - no operator funnels the full frame through one task: head/tail use
  *    sort+limit (Spark's TakeOrderedAndProject — per-partition top-k then
  *    driver merge of k·p rows); shift/diff use range-partitioned windows
  *    with explicit partition-boundary repair; alignment is a shuffle join
  *    on the index.
  *  - the index is data, not metadata: it survives writes and reads and
  *    shuffles with its rows (dask_cudf makes the same choice —
  *    python/dask_cudf partitions carry index columns).
  *
  * Reference anchors: core/frame.py head/tail, core/dataframe.py shift/diff
  * (:3089), core/reshape.py:13 `_align_objs` (concat axis=1 outer-align).
  */
final class GdfFrame(val df: DataFrame, val indexCol: String) extends GdfFrameOps {

  private def idx: Column = col(indexCol)

  /** First n rows in index order (frame.py head): sort+limit compiles to
    * TakeOrderedAndProject — distributed top-k, no global sort. */
  def head(n: Int): DataFrame = df.orderBy(idx.asc).limit(n)

  /** Last n rows in index order, returned ascending like pandas tail. */
  def tail(n: Int): DataFrame =
    df.orderBy(idx.desc).limit(n).orderBy(idx.asc)

  /** shift(periods) of `valueCol` along the index (dataframe.py:3089).
    * Requires a unique index (the facade's standing contract). Negative
    * periods shift values from LATER rows (pandas shift(-n)) — same
    * algorithm run over the flipped sort direction.
    *
    * Scalable two-phase form: range-repartition by index and lag within each
    * partition (parallel windows keyed by partition id). Only the EDGE SET —
    * the first and last `periods` rows of every partition,
    * ≤ 2·periods·numPartitions rows total — goes through a global window to
    * repair partition-boundary rows. Every global predecessor of an edge-head
    * row is itself in the edge set (tails are included; partitions smaller
    * than `periods` are included wholly), so the small-window lag is exact
    * regardless of partition sizing. The full frame never funnels into one
    * task.
    */
  def shift(valueCol: String, outCol: String, periods: Int = 1): DataFrame = {
    require(periods != 0, "shift(0) is the identity; use periods != 0")
    val p = math.abs(periods)
    val ord = if (periods > 0) idx.asc else idx.desc
    val ordRev = if (periods > 0) idx.desc else idx.asc
    val nPart = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // the edge repair broadcasts ≤ 2·periods·numPartitions rows — fine for
    // sane shifts, but a pathological shift(10⁷) would broadcast a
    // frame-sized relation through the driver. Make the contract LOUD
    // instead of OOMing an executor
    require(2L * p * nPart <= 4_000_000L,
      s"shift($periods) with $nPart shuffle partitions repairs " +
        s"${2L * p * nPart} partition-edge rows through a broadcast — " +
        "beyond the 4M-row guard. A shift this deep is a frame-scale " +
        "reorder, not a window op: lower spark.sql.shuffle.partitions " +
        "for this call, or join against the index shifted by a constant " +
        "(df.join(df.withColumn(idx, idx + periods), idx)) instead")
    // pinned: the edge relation and the main path both read this, and
    // repartitionByRange samples bounds per evaluation — same dual-branch
    // determinism hazard OrderedOps documents; the tracked pin evaluates it
    // once and OrderedOps.clearPins() can release it after the action.
    // no explicit partition count — AQE right-sizes the range shuffle
    // (adjacent-only coalescing keeps ranges contiguous, so the edge-set
    // repair below stays exact; nPart above only sizes the LOUD guard,
    // an upper bound since AQE never splits this shuffle)
    val ranged = graft.ops.OrderedOps.pinned(df.repartitionByRange(ord)
      .withColumn("__pid", spark_partition_id()))
    val wFwd = Window.partitionBy(col("__pid")).orderBy(ord)
    val wRev = Window.partitionBy(col("__pid")).orderBy(ordRev)
    val local = ranged
      .withColumn("__rn", row_number().over(wFwd))
      .withColumn("__rr", row_number().over(wRev))
      .withColumn(outCol, lag(col(valueCol), p).over(wFwd))
    val edge = local.filter(col("__rn") <= p || col("__rr") <= p)
      .select(idx, col(valueCol))
    val edgeLag = edge
      // ≤ 2p rows per partition boundary — tiny, but constant-partitioned
      // so WindowExec's global-window warning stays meaningful (the
      // session excludes EliminateWindowPartitions — see GraftSession)
      .withColumn("__edge_lag",
        lag(col(valueCol), p)
          .over(Window.partitionBy(lit(0)).orderBy(ord)))
      .select(idx.as("__eidx"), col("__edge_lag"))
    local
      .join(broadcast(edgeLag), idx === col("__eidx"), "left")
      .withColumn(outCol,
        when(col("__rn") <= p, col("__edge_lag")).otherwise(col(outCol)))
      .drop("__pid", "__rn", "__rr", "__eidx", "__edge_lag")
  }

  /** diff(periods): value − shift(value) (dataframe.py diff → binop). */
  def diff(valueCol: String, outCol: String, periods: Int = 1): DataFrame = {
    val shifted = shift(valueCol, "__prev", periods)
    shifted.withColumn(outCol, col(valueCol) - col("__prev")).drop("__prev")
  }

  /** concat(axis=1): outer-align another frame on the index
    * (core/reshape.py:13 _align_objs) — a full outer shuffle join on the
    * index, both frames keep all labels, missing side → nulls. */
  def concatAxis1(other: GdfFrame): GdfFrame = {
    val joined = df
      .join(other.df.withColumnRenamed(other.indexCol, indexCol), Seq(indexCol), "full_outer")
    new GdfFrame(joined, indexCol)
  }

  /** select_dtypes(include=...) (dataframe.py select_dtypes): projection
    * by column TYPE, resolved from the schema on the driver — a pure
    * metadata operation, no Spark job. The index column is always kept
    * (it is the frame's order, not a data column). */
  def selectDtypes(include: Seq[org.apache.spark.sql.types.DataType]): GdfFrame = {
    val inc = include.toSet
    val kept = df.schema.fields
      .filter(f => f.name == indexCol || inc.contains(f.dataType))
      .map(_.name)
    new GdfFrame(df.select(kept.map(col).toSeq: _*), indexCol)
  }

  /** Materialized RangeIndex in the order of `sortCols` (index.py RangeIndex
    * — built lazily in cuDF; materialized here via the two-phase global
    * numbering, 0-based). */
  def withRangeIndex(posCol: String, sortCols: Column*): GdfFrame = {
    val numbered = OrderedOps.withGlobalRowNumber(df, posCol, sortCols)
      .withColumn(posCol, col(posCol) - 1)
    new GdfFrame(numbered, posCol)
  }
}

object GdfFrame {
  /** setIndex (dataframe.py set_index): promote a column to the index. */
  def apply(df: DataFrame, indexCol: String): GdfFrame = new GdfFrame(df, indexCol)

  /** Frame-level aligned binop (dataframe.py add/sub/... with fill_value;
    * column alignment via ColumnAccessor union, index alignment via
    * _align_objs): the result carries the UNION of both frames' value
    * columns over the UNION of index labels. A column absent from one frame
    * behaves as all-null on that side; with a fill value, a value missing on
    * ONE side is filled before the op, while a (row, column) missing on BOTH
    * sides stays null — the same contract GdfSeries.alignedBinop pins 1-D.
    * One full-outer shuffle join on the index; everything else is codegen
    * projection. */
  def alignedBinop(left: GdfFrame, right: GdfFrame,
                   fill: Option[Column] = None)(
                   op: (Column, Column) => Column): GdfFrame = {
    val idx = left.indexCol
    val lCols = left.df.columns.toSeq.filterNot(_ == idx)
    val rCols = right.df.columns.toSeq.filterNot(_ == right.indexCol)
    val union = lCols ++ rCols.filterNot(lCols.contains)
    val l = left.df.select(col(idx) +: lCols.map(c => col(c).as(s"__l_$c")): _*)
    val r = right.df.select(
      col(right.indexCol).as(idx) +: rCols.map(c => col(c).as(s"__r_$c")): _*)
    val joined = l.join(r, Seq(idx), "full_outer")
    val outs = union.map { c =>
      val lv = if (lCols.contains(c)) col(s"__l_$c") else lit(null)
      val rv = if (rCols.contains(c)) col(s"__r_$c") else lit(null)
      val v = fill match {
        case Some(f) =>
          when(lv.isNull && rv.isNull, lit(null))
            .otherwise(op(coalesce(lv, f), coalesce(rv, f)))
        case None => op(lv, rv)
      }
      v.as(c)
    }
    new GdfFrame(joined.select(col(idx) +: outs: _*), idx)
  }
}

/** Extra index-shaped API on GdfFrame (kept separate for scaladoc clarity). */
trait GdfFrameOps { self: GdfFrame =>

  /** sort_index: physically range-order rows by the index (a pandas no-op
    * view; in Spark an explicit range repartition + intra-partition sort —
    * the layout downstream merge-type operators want). */
  def sortIndex(): GdfFrame = {
    // no explicit partition count — AQE right-sizes the range shuffle at
    // any scale (see OrderedOps: adjacency-preserving coalesce keeps
    // range contiguity)
    new GdfFrame(
      df.repartitionByRange(col(indexCol)).sortWithinPartitions(indexCol),
      indexCol)
  }

  /** reset_index: demote the index to a plain column (identity here — the
    * index IS a column; kept for API parity). */
  def resetIndex(): DataFrame = df

  /** reindex by another label set: left-align onto `labels` (missing → null
    * rows), matching pandas reindex semantics via a left join on labels. */
  def reindex(labels: DataFrame, labelCol: String): GdfFrame =
    new GdfFrame(
      labels.withColumnRenamed(labelCol, indexCol)
        .join(df, Seq(indexCol), "left"),
      indexCol)
}
