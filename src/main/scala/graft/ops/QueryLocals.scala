package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** `df.query` @local references (reference
  * python/cudf/cudf/utils/queryutils.py:38 — `@name` in a query string binds
  * the caller's local variable of that name).
  *
  * Spark-first shape: the query string IS Spark SQL (Catalyst is the
  * compiler, filters still push down to the scan — same contract as
  * filt_query); `@name` tokens are substituted with properly-escaped SQL
  * LITERALS before parsing, so the bound values fold into the plan as
  * constants and participate in predicate pushdown / partition pruning
  * exactly like hand-written literals. Collections render as IN-lists
  * (pandas `a in @mylist`).
  */
object QueryLocals {

  private val Ref = raw"@(\w+)".r

  /** Renders one bound value as a SQL literal. */
  private def render(name: String, v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case b: Boolean => if (b) "true" else "false"
    case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
    case d: Double => if (d.isNaN || d.isInfinite)
      throw new IllegalArgumentException(s"@$name: non-finite double has no SQL literal")
      else s"CAST($d AS DOUBLE)"
    case f: Float => render(name, f.toDouble)
    case d: java.math.BigDecimal => s"CAST($d AS DECIMAL(${d.precision},${d.scale}))"
    case d: BigDecimal => render(name, d.bigDecimal)
    case d: java.sql.Date => s"DATE '$d'"
    case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
    case d: java.time.LocalDate => s"DATE '$d'"
    case xs: Seq[_] =>
      if (xs.isEmpty)
        throw new IllegalArgumentException(s"@$name: empty collection in an IN-list")
      xs.map(render(name, _)).mkString("(", ", ", ")")
    case other =>
      throw new IllegalArgumentException(
        s"@$name: unsupported local type ${other.getClass.getName}")
  }

  /** Compiles a query string with `@name` locals into a Column predicate.
    * Unknown names fail fast with the full set of available bindings. */
  def queryExpr(q: String, locals: Map[String, Any]): Column = {
    val substituted = Ref.replaceAllIn(q, m => {
      val name = m.group(1)
      val v = locals.getOrElse(name,
        throw new IllegalArgumentException(
          s"query references @$name but locals only bind ${locals.keys.toSeq.sorted.mkString(", ")}"))
      scala.util.matching.Regex.quoteReplacement(render(name, v))
    })
    expr(substituted)
  }
}
