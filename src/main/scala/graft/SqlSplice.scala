package graft

/** Oracle-SQL splice helpers (ADVICE r16 #3): composed oracles (s19,
  * s21, t22, t27, st14–st16, d23, s18, s20) reuse member oracles' CTE
  * chains by cutting their SQL text at anchor substrings. A benign
  * reformat of a member oracle used to shift a cut silently or return
  * -1 and throw an opaque StringIndexOutOfBounds at map
  * initialization — taking every query in the enclosing object down.
  * These helpers make a missing anchor fail fast, naming the anchor
  * and the splice direction, so the break is a one-line diagnosis.
  */
object SqlSplice {

  private def at(sql: String, anchor: String, last: Boolean): Int = {
    val i = if (last) sql.lastIndexOf(anchor) else sql.indexOf(anchor)
    require(i >= 0,
      s"oracle splice anchor not found (${if (last) "last" else "first"}): " +
        s"'${anchor.take(60)}' — a member oracle was reformatted; update the splice")
    i
  }

  /** Everything strictly before the last occurrence of `anchor`. */
  def before(sql: String, anchor: String): String =
    sql.substring(0, at(sql, anchor, last = true))

  /** Everything strictly before the FIRST occurrence of `anchor`. */
  def beforeFirst(sql: String, anchor: String): String =
    sql.substring(0, at(sql, anchor, last = false))

  /** The slice from the first occurrence of `from` (inclusive) to the
    * last occurrence of `until` (exclusive). */
  def between(sql: String, from: String, until: String): String =
    sql.substring(at(sql, from, last = false), at(sql, until, last = true))

  /** Index of the last occurrence of `anchor`, asserted present. */
  def lastIdx(sql: String, anchor: String): Int = at(sql, anchor, last = true)

  /** Index of the first occurrence of `anchor`, asserted present. */
  def firstIdx(sql: String, anchor: String): Int = at(sql, anchor, last = false)
}
