package graft.sql

/** Analysis-time validation of raw `clickhouse_eval` fragments — the
  * lightweight analog of the reference's tokenize+parse of the raw string
  * with its ClickHouse dialect (/root/reference/src/udfs/eval.rs:58-142,
  * src/dialect.rs:43-70). A malformed fragment (or an embedded statement
  * separator) fails fast with a clear message instead of surfacing as an
  * opaque remote error mid-query — and `;` can never smuggle a second
  * statement into the generated SQL.
  *
  * Accepts exactly one expression: balanced parens/brackets, terminated
  * string literals (both `\'` and `''` escapes) and backtick identifiers,
  * no comments, no top-level commas, no semicolons.
  */
object ChFragment {

  def validate(raw: String): Unit = {
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"invalid clickhouse_eval fragment ($msg): $raw")
    val s = raw.trim
    if (s.isEmpty) fail("empty expression")
    var depth = 0
    var i = 0
    var inStr = false
    var inTick = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1 // escaped char, skip
        else if (c == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 1 // '' doubling
          else inStr = false
        }
      } else if (inTick) {
        if (c == '`') inTick = false
      } else c match {
        case '\'' => inStr = true
        case '`' => inTick = true
        case '(' | '[' => depth += 1
        case ')' | ']' =>
          depth -= 1
          if (depth < 0) fail("unbalanced parentheses")
        case ';' => fail("';' not allowed")
        case ',' if depth == 0 => fail("not a single expression (top-level ',')")
        case '-' if i + 1 < s.length && s.charAt(i + 1) == '-' =>
          fail("comments not allowed")
        case '/' if i + 1 < s.length && s.charAt(i + 1) == '*' =>
          fail("comments not allowed")
        case _ => ()
      }
      i += 1
    }
    if (inStr) fail("unterminated string literal")
    if (inTick) fail("unterminated quoted identifier")
    if (depth != 0) fail("unbalanced parentheses")
  }
}
