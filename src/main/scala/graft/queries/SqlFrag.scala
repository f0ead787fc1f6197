package graft.queries

/** Shared DuckDB oracle-SQL fragments mirroring graft's native expressions. */
object SqlFrag {
  /** Mirrors graft.expressions.PolyHash / TextFunctions.polyHash. */
  def polyHash(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($e, ''), ch -> CAST(ascii(ch) AS BIGINT))), " +
      s"(h, c) -> (h * 31 + c) % 1000000007)"
}
