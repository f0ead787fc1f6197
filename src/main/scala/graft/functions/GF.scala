package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graft column-function library: cuDF's scalar operator surface re-expressed
  * as Spark `Column` combinators (see SURVEY.md §2.8).
  *
  * Everything here stays inside Catalyst expressions (codegen-friendly, no
  * UDFs) so whole-stage codegen spans are preserved in the hot path.
  */
object GF {

  // ---------------------------------------------------------------------------
  // Exact-decimal helpers.
  //
  // Double aggregation is order-dependent (fp addition is not associative), so
  // a distributed sum of doubles is not bit-deterministic across partitionings
  // or engines. The driver's oracle gate hash-compares against DuckDB, and at
  // 100 TB the partition count (hence merge order) is arbitrary — so every
  // money-typed aggregate goes through an exact decimal cast, is summed
  // exactly, and only the final scalar is lowered back to double.
  // ---------------------------------------------------------------------------
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  def dec4(c: Column): Column = c.cast(DecimalType(24, 4))

  /** Order-insensitive, engine-exact sum of a 2-decimal double column. */
  def sumMoney(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Exact mean of a 2-decimal double column (double division of exact sums). */
  def avgMoney(c: Column): Column =
    sum(dec2(c)).cast(DoubleType) / count(c)

  // ---------------------------------------------------------------------------
  // Binary ops with Python/cuDF semantics (reference: cpp/include/cudf/
  // binaryop.hpp:36-73). Spark's `%` is C-style (sign of dividend); cuDF's
  // PYMOD follows Python (sign of divisor).
  // ---------------------------------------------------------------------------
  def pymod(a: Column, b: Column): Column = ((a % b) + b) % b

  /** FLOOR_DIV (binaryop.hpp): floor(a/b) with float semantics. */
  def floordiv(a: Column, b: Column): Column = floor(a / b)

  /** TRUE_DIV: always floating-point division regardless of input types. */
  def truediv(a: Column, b: Column): Column =
    a.cast(DoubleType) / b.cast(DoubleType)

  /** LOG_BASE (binaryop.hpp:45). */
  def logBase(a: Column, base: Column): Column = log(a) / log(base)

  /** NULL_EQUALS → null-safe equality (binaryop.hpp NULL_EQUALS). */
  def nullEquals(a: Column, b: Column): Column = a <=> b

  /** NULL_MAX / NULL_MIN: null-skipping max/min of two columns. */
  def nullMax(a: Column, b: Column): Column = greatest(a, b)
  def nullMin(a: Column, b: Column): Column = least(a, b)

  // ---------------------------------------------------------------------------
  // Clip / where / mask (cudf Frame.clip frame.py:700, where/mask :827,884)
  // ---------------------------------------------------------------------------
  def clip(c: Column, lo: Column, hi: Column): Column = least(greatest(c, lo), hi)

  def where(c: Column, cond: Column, other: Column): Column =
    when(cond, c).otherwise(other)

  def mask(c: Column, cond: Column, other: Column): Column =
    when(cond, other).otherwise(c)

  // ---------------------------------------------------------------------------
  // String ops with no single Spark builtin (reference: cpp/include/cudf/
  // strings/*.hpp; python accessor core/column/string.py)
  // ---------------------------------------------------------------------------

  /** zfill (strings/padding.hpp:93): left-pad with '0', sign-aware. */
  def zfill(c: Column, width: Int): Column =
    when(c.startsWith("-"),
      concat(lit("-"), lpad(regexp_replace(c, "^-", ""), width - 1, "0")))
      .otherwise(lpad(c, width, "0"))

  /** swapcase (strings/case.hpp:77): per-char case flip, pure-builtin form.
    * Split to chars, flip each, reassemble — stays codegen'd via transform().
    */
  def swapcase(c: Column): Column =
    array_join(
      transform(split(c, ""),
        ch => when(ch === upper(ch), lower(ch)).otherwise(upper(ch))),
      "")

  /** count_characters (strings/attributes.hpp:46). */
  def countCharacters(c: Column): Column = length(c)

  /** count_bytes (strings/attributes.hpp:64). */
  def countBytes(c: Column): Column = octet_length(c)

  /** code_points (strings/attributes.hpp:84): UTF-8 code point per char. */
  def codePoints(c: Column): Column =
    transform(split(c, ""), ch => ascii(ch))

  /** str.partition (strings/split/partition.hpp:58): 3-way split on first sep. */
  def strPartition(c: Column, sep: String): Column = {
    val idx = instr(c, sep)
    struct(
      when(idx > 0, substring_index(c, sep, 1)).otherwise(c).as("head"),
      when(idx > 0, lit(sep)).otherwise(lit("")).as("sep"),
      when(idx > 0, c.substr(idx + lit(sep.length), length(c))).otherwise(lit("")).as("tail"))
  }

  /** rpartition (strings/partition.hpp rpartition): split on the LAST
    * occurrence; pandas puts the whole string in the TAIL when the
    * separator is absent (mirror-image of partition's head rule). */
  def strRPartition(c: Column, sep: String): Column = {
    val revIdx = instr(reverse(c), reverse(lit(sep)))
    val lastPos = length(c) - revIdx - lit(sep.length) + 2 // 1-based start of last sep
    struct(
      when(revIdx > 0, c.substr(lit(1), lastPos - 1)).otherwise(lit("")).as("head"),
      when(revIdx > 0, lit(sep)).otherwise(lit("")).as("sep"),
      when(revIdx > 0, c.substr(lastPos + lit(sep.length), length(c))).otherwise(c).as("tail"))
  }

  /** integers_to_ipv4 (strings/convert/convert_ipv4.hpp:81): uint32 → dotted
    * quad. Pure div/mod arithmetic so any SQL engine replicates it. */
  def intToIpv4(v: Column): Column =
    concat_ws(".",
      (v.cast(LongType) / 16777216).cast(LongType) % 256,
      (v.cast(LongType) / 65536).cast(LongType) % 256,
      (v.cast(LongType) / 256).cast(LongType) % 256,
      v.cast(LongType) % 256)

  /** ipv4_to_integers (convert_ipv4.hpp:53). */
  def ipv4ToInt(s: Column): Column = {
    val o = split(s, "\\.")
    element_at(o, 1).cast(LongType) * 16777216 +
      element_at(o, 2).cast(LongType) * 65536 +
      element_at(o, 3).cast(LongType) * 256 +
      element_at(o, 4).cast(LongType)
  }

  /** to_booleans (strings/convert/convert_booleans.hpp:46): string → bool
    * with explicit true/false token sets; unknown tokens → null. */
  def strToBool(c: Column,
                trues: Seq[String] = Seq("true", "1", "t", "yes"),
                falses: Seq[String] = Seq("false", "0", "f", "no")): Column =
    when(lower(c).isin(trues: _*), lit(true))
      .when(lower(c).isin(falses: _*), lit(false))
      .otherwise(lit(null).cast("boolean"))

  /** character class predicates (strings/char_types/char_types.hpp:93). */
  def isAlpha(c: Column): Column   = c.rlike("^\\p{L}+$")
  def isDigit(c: Column): Column   = c.rlike("^\\p{Nd}+$")
  def isAlnum(c: Column): Column   = c.rlike("^[\\p{L}\\p{Nd}]+$")
  def isUpperS(c: Column): Column  = c.rlike("^[^\\p{Ll}]*\\p{Lu}[^\\p{Ll}]*$")
  def isLowerS(c: Column): Column  = c.rlike("^[^\\p{Lu}]*\\p{Ll}[^\\p{Lu}]*$")
  def isSpace(c: Column): Column   = c.rlike("^\\s+$")
  def isNumericS(c: Column): Column = c.rlike("^\\p{N}+$")

  // ---------------------------------------------------------------------------
  // Datetime (cpp/include/cudf/datetime.hpp:45-205)
  // ---------------------------------------------------------------------------

  /** is_leap_year (datetime.hpp:182). */
  def isLeapYear(ts: Column): Column = {
    val y = year(ts)
    (y % 4 === 0) && ((y % 100 =!= 0) || (y % 400 === 0))
  }

  /** extract_day_of_year (datetime.hpp). */
  def dayOfYear(ts: Column): Column = dayofyear(ts)

  /** days_in_month. */
  def daysInMonth(ts: Column): Column = dayofmonth(last_day(ts))

  // ---------------------------------------------------------------------------
  // List / vector numerics (embeddings; functions.zip_with keeps it codegen'd)
  // ---------------------------------------------------------------------------

  /** Dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  /** L2 norm of a float-array column. */
  def l2Norm(c: Column): Column =
    sqrt(aggregate(transform(c, x => x * x), lit(0.0d), (acc, v) => acc + v))

  /** Cosine similarity of two double-array columns — fused codegen kernel
    * ([[graft.expressions.CosineSim]]); bit-identical to
    * `dot(a,b) / (l2Norm(a) * l2Norm(b))`. */
  def cosine(a: Column, b: Column): Column = {
    val B = org.apache.spark.sql.graft.Bridge
    B.column(graft.expressions.CosineSim(B.expression(a), B.expression(b)))
  }

  /** numpy/cudf isclose (frame.py isclose): |a−b| ≤ atol + rtol·|b|, with
    * the asymmetric-in-b numpy contract and optional equal_nan. Pure IEEE
    * arithmetic and comparisons — no transcendentals, so the oracle is
    * bit-exact; note both Spark and DuckDB order NaN above every value, so
    * the non-equal_nan branch yields false on NaN inputs in both engines. */
  def isclose(a: Column, b: Column, rtol: Double = 1e-5, atol: Double = 1e-8,
              equalNan: Boolean = false): Column = {
    val close = abs(a - b) <= lit(atol) + lit(rtol) * abs(b)
    if (equalNan) (isnan(a) && isnan(b)) || close else close
  }

  /** nans_to_nulls (frame.py nans_to_nulls): float NaN becomes null —
    * cuDF's bridge between the two missing-value representations
    * (SURVEY §1.3). */
  def nansToNulls(c: Column): Column = when(isnan(c), lit(null)).otherwise(c)
}
