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

  /** Renders one bound value as a SQL literal. String escaping targets
    * Spark's default literal parser (escapedStringLiterals=false, i.e.
    * backslash escapes ARE processed): every backslash must double, else
    * the value is silently unescaped — and a trailing backslash would
    * swallow the closing quote, splicing query text into the literal. */
  private def render(name: String, v: Any): String = v match {
    case null => "NULL"
    case s: String =>
      "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
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
      // A NULL element would make `x IN (...)` three-valued (never true for
      // non-members, and negations return no rows) — silently diverging
      // from pandas `a in @list` with None. Fail as loudly as the
      // empty-collection case instead.
      if (xs.exists(_ == null))
        throw new IllegalArgumentException(
          s"@$name: null element in an IN-list collection (SQL three-valued " +
            "logic would silently change membership semantics)")
      xs.map(render(name, _)).mkString("(", ", ", ")")
    case other =>
      throw new IllegalArgumentException(
        s"@$name: unsupported local type ${other.getClass.getName}")
  }

  /** Compiles a query string with `@name` locals into a Column predicate.
    * Unknown names fail fast with the full set of available bindings.
    *
    * Substitution is QUOTE-AWARE: an `@` inside a single-quoted string
    * literal is query text, not a local reference ('alice@example.com'
    * must not resolve @example) — same behavior as pandas' query
    * tokenizer, which only resolves @ in identifier position. */
  def queryExpr(q: String, locals: Map[String, Any]): Column = {
    val out = new StringBuilder
    var i = 0
    var inQuote = false
    while (i < q.length) {
      val c = q.charAt(i)
      if (inQuote) {
        out.append(c)
        if (c == '\\' && i + 1 < q.length) { out.append(q.charAt(i + 1)); i += 1 }
        else if (c == '\'') inQuote = false
        i += 1
      } else if (c == '\'') {
        inQuote = true; out.append(c); i += 1
      } else if (c == '@' && i + 1 < q.length &&
          (q.charAt(i + 1).isLetterOrDigit || q.charAt(i + 1) == '_')) {
        val start = i + 1
        var j = start
        while (j < q.length && (q.charAt(j).isLetterOrDigit || q.charAt(j) == '_')) j += 1
        val name = q.substring(start, j)
        val v = locals.getOrElse(name,
          throw new IllegalArgumentException(
            s"query references @$name but locals only bind ${locals.keys.toSeq.sorted.mkString(", ")}"))
        out.append(render(name, v))
        i = j
      } else {
        out.append(c); i += 1
      }
    }
    expr(out.toString)
  }
}
