package graft.operators

/** Escaping for names spliced into `selectExpr`/`expr` SQL text (the
  * stack() unpivots build their column lists as SQL strings).
  *
  * Spark's SQL parser treats backslash as an escape character inside
  * single-quoted literals (`spark.sql.parser.escapedStringLiterals` is
  * false by default), so doubling single quotes alone is not enough: a
  * step/column/rule name containing a backslash would be silently mangled
  * (`\n` becomes a newline) or break the parse (a trailing `\` eats the
  * closing quote). Backslashes are doubled FIRST, then quotes.
  */
private[operators] object SqlLit {
  /** `s` as a single-quoted SQL string literal. */
  def lit(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"

  /** `s` as a backtick-quoted SQL identifier. */
  def ident(s: String): String =
    "`" + s.replace("`", "``") + "`"
}
