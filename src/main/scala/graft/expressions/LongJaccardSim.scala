package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Jaccard similarity |A∩B| / |A∪B| of two SORTED-DISTINCT long-array
  * columns in one merge pass, with threshold-aware early exit — the
  * per-candidate-pair verification kernel of the LSH dedup operators.
  *
  * Semantically identical (for rows it returns exactly) to
  * `size(array_intersect(a,b)) / size(array_distinct(concat(a,b)))` — the
  * form the DuckDB oracle also computes — but where the builtins build two
  * intermediate ARRAYS plus the hash sets behind them per pair, this is a
  * single index-walk over the two sorted inputs: no allocation, no hashing,
  * O(|A|+|B|) worst case and usually far less:
  *
  *  - size-ratio preprune: |A∩B| ≤ min(|A|,|B|) and |A∪B| ≥ max(|A|,|B|),
  *    so `min < t·max` disqualifies a pair before touching any element
  *    (the arithmetic the [[graft.extensions.JaccardThresholdPruning]]
  *    rule injects in front of the string-array [[JaccardSim]], fused
  *    into the kernel here);
  *  - merge early exit: mid-walk, the best still-achievable intersection
  *    is `inter + min(remaining_a, remaining_b)`; once even that bound
  *    puts jaccard under the threshold, the pair is dead — bail.
  *
  * THE CONTRACT: both inputs must be STRICTLY ASCENDING (sorted, distinct,
  * no null elements) — `array_sort` over a distinct hash set, e.g.
  * `array_sort(shingle_hashes(text))`. Sorting once per DOCUMENT is what
  * the candidate-verify shape amortizes: each doc participates in many
  * candidate pairs, so the per-pair kernel must not re-sort or re-hash.
  * Ordering violations on the visited prefix throw (one compare per
  * advance, branch-predicted); violations past an early exit are
  * undetectable by construction — the SQL registration wraps inputs in
  * sort+distinct so the public surface is total (see GraftExtensions).
  *
  * `threshold` semantics: rows whose true jaccard is ≥ threshold return
  * the EXACT value; rows the kernel proves are below it may return -1.0
  * instead of the true value. Intended use is therefore exactly
  * `jac >= lit(t)` filters (the LSH verify stage), where pruned rows are
  * dropped either way. `NegativeInfinity` (the default) disables pruning
  * and the kernel returns exact values for every row.
  *
  * Two empty inputs → 0.0 (the builtin form yields null from 0/0; such
  * rows never pass a positive-threshold filter under either convention —
  * pinned by LongJaccardSimSpec).
  *
  * Reference anchor: the verify step of Lee et al. 2022-style LSH dedup;
  * the reference's own fused jaccard kernel is cpp/src/text/jaccard.cu
  * (jaccard_index over hashed token sets).
  */
case class LongJaccardSim(left: Expression, right: Expression,
                          threshold: Double = Double.NegativeInfinity)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard_hashes"

  private def isLongArray(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    LongJaccardSimImpl.jaccard(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], threshold)

  private def thresholdJava: String =
    if (threshold.isNegInfinity) "java.lang.Double.NEGATIVE_INFINITY"
    else s"${threshold}D"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.LongJaccardSimImpl.jaccard($a, $b, $thresholdJava)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): LongJaccardSim =
    copy(left = newLeft, right = newRight)
}

object LongJaccardSimImpl {
  private def unsorted(): Nothing = throw new IllegalArgumentException(
    "graft_jaccard_hashes requires strictly ascending (sorted, distinct) " +
      "long arrays — sort once per row with array_sort(array_distinct(x)); " +
      "the SQL function graft_jaccard_hashes() applies that for you")

  /** Exact jaccard when ≥ `threshold`; any value < threshold (-1.0) when
    * the kernel proves the pair is under it. NegativeInfinity = exact
    * always. Inputs must be strictly ascending (see [[LongJaccardSim]]). */
  def jaccard(a: ArrayData, b: ArrayData, threshold: Double): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    val prune = threshold > 0.0
    // inter ≤ min, union ≥ max: grossly mismatched sizes die element-free
    if (prune && math.min(na, nb) < threshold * math.max(na, nb)) return -1.0
    var i = 0
    var j = 0
    var inter = 0
    var prevA = Long.MinValue
    var prevB = Long.MinValue
    var sinceCheck = 0
    var firstA = true
    var firstB = true
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) {
        if ((!firstA && x <= prevA) || (!firstB && y <= prevB)) unsorted()
        prevA = x; prevB = y; firstA = false; firstB = false
        inter += 1; i += 1; j += 1
      } else if (x < y) {
        if (!firstA && x <= prevA) unsorted()
        prevA = x; firstA = false
        i += 1
      } else {
        if (!firstB && y <= prevB) unsorted()
        prevB = y; firstB = false
        j += 1
      }
      // every 32 advances: best achievable inter is current + the shorter
      // remainder; jaccard is monotone in inter, so once even the bound is
      // under the threshold the pair cannot recover
      sinceCheck += 1
      if (prune && sinceCheck >= 32) {
        sinceCheck = 0
        val bestInter = inter + math.min(na - i, nb - j)
        if (bestInter < threshold * (na + nb - bestInter)) return -1.0
      }
    }
    inter.toDouble / (na + nb - inter)
  }
}
