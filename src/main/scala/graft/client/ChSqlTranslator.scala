package graft.client

/** Translates the ClickHouse-dialect SQL our unparser generates into Spark
  * SQL for the embedded server engine. A real ClickHouse server would
  * execute the SQL as-is; the translator models the server's function
  * surface (the functions the reference's tests exercise through
  * passthrough — SURVEY.md §2.8) on top of Spark.
  *
  * Scope is intentionally the dialect WE generate: backtick quoting is
  * shared by both dialects; lambda syntax `x -> body` is shared by
  * ClickHouse HOFs and Spark HOFs; so translation is table-reference
  * rewriting plus a function-name map and a few special forms.
  */
object ChSqlTranslator {

  def viewName(db: String, table: String): String = s"__ch_${db}_$table"

  /** ClickHouse function name → Spark equivalent (1:1 name swaps). */
  private val fnMap: Map[String, String] = Map(
    "arrayJoin" -> "explode",
    // ClickHouse length() is polymorphic (strings AND arrays); Spark's is
    // string-only, so the embedded session registers a type-agnostic UDF
    "length" -> "graft_length",
    "base64Encode" -> "base64",
    "lengthUTF8" -> "char_length",
    "toUpperCase" -> "upper",
    "toLowerCase" -> "lower",
    "toInt64" -> "bigint",
    "toInt32" -> "int",
    "toFloat64" -> "double",
    "toString" -> "string",
    "modulo" -> "mod",
    "intDiv" -> "div",
    // Unix seconds from a DateTime: identical integer result (Spark's
    // unix_timestamp also accepts the string+format arity, like the server)
    "toUnixTimestamp" -> "unix_timestamp",
    // binary MD5 digest (Spark's md5() is hex-string; the server model
    // registers a digest-returning UDF so hex()/lower() compose on top)
    "MD5" -> "graft_md5bin",
    "SHA1" -> "graft_sha1bin",
    "SHA256" -> "graft_sha256bin",
    "CRC32" -> "graft_crc32",
    "arrayDistinct" -> "array_distinct",
    // value-identical 1:1 swaps (round 11): tie-breaks in argMax/argMin
    // are unspecified in BOTH engines; indexOf and array_position are
    // both 1-based with 0 for absent; arrayConcat/concat and
    // arrayReverse/reverse agree element-wise
    "argMax" -> "max_by",
    "argMin" -> "min_by",
    "has" -> "array_contains",
    "arrayReverse" -> "reverse",
    "arrayConcat" -> "concat",
    "indexOf" -> "array_position",
    "today" -> "current_date",
    "arrayFlatten" -> "flatten",
    // Unicode-codepoint case mapping in both engines
    "lowerUTF8" -> "lower",
    "upperUTF8" -> "upper",
    // insertion-order collection: order is UNSPECIFIED under parallel
    // execution in BOTH engines (same contract, not a silent delta)
    "groupArray" -> "collect_list",
    "groupUniqArray" -> "collect_set",
    // unnamed tuples are structs (Spark's own `(a, b)` literal parse);
    // tupleElement's positional access registers as graft_tuple_at
    "tuple" -> "struct",
    // statistical aggregates (scan-level complete pushdown)
    "varSamp" -> "var_samp",
    "varPop" -> "var_pop",
    "stddevSamp" -> "stddev_samp",
    "stddevPop" -> "stddev_pop",
    "covarSamp" -> "covar_samp",
    "covarPop" -> "covar_pop",
    // Pearson correlation: the same formula in both engines
    "corr" -> "corr",
    // population skewness: Spark's skewness IS µ3/σ³ over population
    // central moments (CentralMomentAgg: √n·M3/M2^1.5)
    "skewPop" -> "skewness",
    // round-14 wave: value-identical 1:1 swaps (FnSurfaceProbe sweep)
    "mapKeys" -> "map_keys",
    "mapValues" -> "map_values",
    "mapContains" -> "map_contains_key",
    "bitCount" -> "bit_count",
    "bitShiftLeft" -> "shiftleft",
    "bitShiftRight" -> "shiftright",
    // banker's (half-even) rounding in both engines
    "roundBankers" -> "bround",
    // NULL elements are skipped by BOTH engines' array min/max
    "arrayMin" -> "array_min",
    "arrayMax" -> "array_max",
    // Spark substring/char ops are codepoint-based — exactly the UTF8
    // variants' contract
    "substringUTF8" -> "substring",
    "replaceAll" -> "replace",
    "concatWithSeparator" -> "concat_ws",
    "generateUUIDv4" -> "uuid",
    // CH randCanonical IS Spark's rand: uniform [0, 1) Float64
    "randCanonical" -> "rand",
    // round-15 hash wave (public-spec kernels in graft.functions
    // .GraftHashes, vectors pinned in HashKernelSpec; single-argument
    // law enforced at registration). xxHash64 ALSO fixes a silent
    // divergence: Spark's case-insensitive resolver served its builtin
    // xxhash64 (internal row layout, seed 42) for the ClickHouse
    // spelling (XXH64 of the raw bytes, seed 0) — the rand() trap.
    // The lowercase internal `xxhash64(...)` the uniq rewrites emit is
    // untouched (fnMap is case-sensitive by design).
    "cityHash64" -> "graft_cityhash64",
    "sipHash64" -> "graft_siphash64",
    "xxHash64" -> "graft_xxhash64ch",
    "xxHash32" -> "graft_xxhash32ch",
    "farmFingerprint64" -> "graft_farmfp64",
    "halfMD5" -> "graft_halfmd5",
    // exact integer laws (BigInteger gcd; zero boundaries reject at
    // runtime — the server's zero law is not pinnable offline)
    "gcd" -> "graft_gcd",
    "lcm" -> "graft_lcm",
    // MySQL substring_index law in both engines (round-15 sweep 2)
    "substringIndex" -> "substring_index",
    // non-overlapping match count in both engines (round 16)
    "countMatches" -> "regexp_count",
    // calendar-exact in both engines (round 16)
    "toLastDayOfMonth" -> "last_day",
    // bit-fold aggregates: identical AND/OR/XOR folds, NULLs skipped
    // in both engines (empty groups: Spark NULL where a server yields
    // the fold identity — "no answer" vs identity, documented; gates
    // and probes never aggregate empty groups)
    "groupBitAnd" -> "bit_and",
    "groupBitOr" -> "bit_or",
    "groupBitXor" -> "bit_xor")

  // ---- round-14 wave helpers -------------------------------------------

  /** The inner text of a simple single-quoted literal (no embedded
    * quotes); None for anything else — callers reject loudly.
    */
  private def stringLiteral(arg: String): Option[String] = {
    val t = arg.trim
    if (t.length >= 2 && t.head == '\'' && t.last == '\'' &&
      !t.substring(1, t.length - 1).contains('\'')) Some(t.substring(1, t.length - 1))
    else None
  }

  /** Escape a literal separator for embedding in a Spark regex string
    * (the emitted text carries doubled backslashes, which the child
    * session's literal parse collapses to single ones).
    */
  private def escapeRegexLiteral(lit: String): String =
    lit.flatMap { c =>
      if ("\\^$.|?*+()[]{}".contains(c)) s"\\\\$c" else c.toString
    }

  /** ClickHouse extract/extractAll return capture group 1 when the
    * pattern captures, else the whole match — detectable only on a
    * literal pattern (unescaped '(' not opening a non-capturing group).
    */
  private def extractGroupIdx(arg: String): Int = {
    val lit = stringLiteral(arg).getOrElse(throw new IllegalArgumentException(
      "extract/extractAll: the pattern must be a string literal (the " +
        "result is group 1 when the pattern captures, else the whole match)"))
    var i = 0
    var has = false
    var inClass = false
    var classStart = -1 // index of the char after '[' (or after '[^')
    while (i < lit.length && !has) {
      val c = lit.charAt(i)
      if (c == '\\') i += 2
      else {
        if (inClass) {
          // ']' immediately after '[' or '[^' is a LITERAL member
          // (regex law) — only a later ']' closes the class
          if (c == ']' && i > classStart) inClass = false
        } else if (c == '[') {
          inClass = true
          classStart =
            if (i + 1 < lit.length && lit.charAt(i + 1) == '^') i + 2 else i + 1
        } else if (c == '(' &&
          (i + 1 >= lit.length || lit.charAt(i + 1) != '?')) has = true
        i += 1
      }
    }
    if (has) 1 else 0
  }

  /** Count of capture groups in a literal pattern (same class-aware
    * scan as [[extractGroupIdx]]; nested groups count — Java and RE2
    * share that numbering). Backs extractGroups' array arity.
    */
  private def captureGroupCount(lit: String): Int = {
    var i = 0
    var n = 0
    var inClass = false
    var classStart = -1
    while (i < lit.length) {
      val c = lit.charAt(i)
      if (c == '\\') i += 2
      else {
        if (inClass) {
          if (c == ']' && i > classStart) inClass = false
        } else if (c == '[') {
          inClass = true
          classStart =
            if (i + 1 < lit.length && lit.charAt(i + 1) == '^') i + 2 else i + 1
        } else if (c == '(') {
          // plain '(' is capturing; '(?...' is capturing ONLY for the
          // named form '(?<name>' — '(?:', '(?=', '(?!', '(?<=', '(?<!'
          // are not (named groups DO take a number in both Java and RE2,
          // so skipping them would drop extractGroups' trailing groups)
          if (i + 1 >= lit.length || lit.charAt(i + 1) != '?') n += 1
          else if (i + 2 < lit.length && lit.charAt(i + 2) == '<' &&
            i + 3 < lit.length && lit.charAt(i + 3) != '=' &&
            lit.charAt(i + 3) != '!') n += 1
        }
        i += 1
      }
    }
    n
  }

  /** ClickHouse regex replacements reference groups as `\N`; Java (and
    * Spark) use `$N`. Literal-only, '$'-free (a raw '$' is ambiguous
    * across the dialects).
    */
  private def chReplacementToJava(arg: String, fn: String = "replaceRegexpAll"): String = {
    val lit = stringLiteral(arg).getOrElse(throw new IllegalArgumentException(
      s"$fn: the replacement must be a string literal"))
    require(!lit.contains('$'),
      s"$fn: a literal '$$' in the replacement renders " +
        "differently across dialects — rewrite without it")
    val conv = lit.replaceAll("\\\\\\\\([0-9])", "\\$$1")
      .replaceAll("\\\\([0-9])", "\\$$1")
    s"'$conv'"
  }

  /** ClickHouse `format` templates ({} positional, {N} indexed 0-based,
    * {{ }} brace escapes) → Java format_string templates.
    */
  private def chFormatToJava(tpl: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < tpl.length) {
      val c = tpl.charAt(i)
      if (c == '%') { out.append("%%"); i += 1 }
      else if (c == '{' && i + 1 < tpl.length && tpl.charAt(i + 1) == '{') {
        out.append('{'); i += 2
      } else if (c == '}' && i + 1 < tpl.length && tpl.charAt(i + 1) == '}') {
        out.append('}'); i += 2
      } else if (c == '{') {
        val e = tpl.indexOf('}', i)
        require(e > 0, s"format: unclosed '{' in template '$tpl'")
        val tok = tpl.substring(i + 1, e)
        if (tok.isEmpty) out.append("%s")
        else {
          require(tok.forall(_.isDigit),
            s"format: unsupported placeholder '{$tok}' (only {} and {N})")
          out.append("%").append(tok.toInt + 1).append("$s")
        }
        i = e + 1
      } else { out.append(c); i += 1 }
    }
    out.result()
  }

  /** ClickHouse formatDateTime tokens → Java date patterns — the
    * unambiguous subset only. `%M` is minute or MONTH NAME depending on
    * server version/settings → rejected; literal letters outside tokens
    * would be Java pattern letters → rejected (separators pass).
    */
  private def chDateFormatToJava(fmt: String): String = {
    val map = Map('Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
      'H' -> "HH", 'h' -> "hh", 'i' -> "mm", 'S' -> "ss", 's' -> "ss",
      'F' -> "yyyy-MM-dd", 'D' -> "MM/dd/yy", 'T' -> "HH:mm:ss",
      'j' -> "DDD", 'a' -> "EEE", 'W' -> "EEEE", 'p' -> "a", 'Q' -> "Q")
    val out = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%') {
        require(i + 1 < fmt.length, s"formatDateTime: dangling '%' in '$fmt'")
        val t = fmt.charAt(i + 1)
        if (t == '%') out.append('%')
        else out.append(map.getOrElse(t, throw new IllegalArgumentException(
          s"formatDateTime: token '%$t' is not supported — supported: " +
            map.keys.toSeq.sorted.map("%" + _).mkString(", ") +
            " ('%M' is minute or month name depending on server " +
            "version; spell %i for minute)")))
        i += 2
      } else {
        require(!c.isLetter && c != '\'',
          s"formatDateTime: literal '$c' outside a % token would be a " +
            "Java pattern letter — only separator characters are supported")
        out.append(c); i += 1
      }
    }
    out.result()
  }

  /** The PARSE-sharable MySQL-directive subset for parseDateTime
    * (round 17): zero-padded canonical forms parse identically under
    * ClickHouse's MySQL-style parser and Spark's DateTimeFormatter
    * patterns. Format-only tokens (%a/%W day names: locale laws;
    * %y/%D two-digit years: century bases differ; %j/%Q: not
    * round-trippable parse directives; %p/%h: 12-hour pairing) REJECT
    * loudly rather than parse divergently.
    */
  private def chDateParseToJava(fmt: String): String = {
    val map = Map('Y' -> "yyyy", 'm' -> "MM", 'd' -> "dd",
      'H' -> "HH", 'i' -> "mm", 'S' -> "ss", 's' -> "ss",
      'F' -> "yyyy-MM-dd", 'T' -> "HH:mm:ss")
    val out = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%') {
        require(i + 1 < fmt.length, s"parseDateTime: dangling '%' in '$fmt'")
        val t = fmt.charAt(i + 1)
        if (t == '%') out.append('%')
        else out.append(map.getOrElse(t, throw new IllegalArgumentException(
          s"parseDateTime: token '%$t' is not a PARSE-sharable " +
            "directive — supported: " +
            map.keys.toSeq.sorted.map("%" + _).mkString(", ") +
            " (day names, 2-digit years, 12-hour forms and %j/%Q have " +
            "divergent parse laws; run against a real server)")))
        i += 2
      } else {
        require(!c.isLetter && c != '\'',
          s"parseDateTime: literal '$c' outside a % token would be a " +
            "Java pattern letter — only separator characters are supported")
        out.append(c); i += 1
      }
    }
    out.result()
  }

  /** Elements of an `array(...)` literal (post-bracket-rewrite), or None. */
  private def splitArrayLiteral(arg: String): Option[Seq[String]] = {
    val t = arg.trim
    if (t.startsWith("array(") && t.endsWith(")"))
      Some(parseArgs(t.substring(6), 0)._1)
    else None
  }

  /** Pin the one honest totals mode on a statement combining WITH TOTALS
    * and HAVING: append (or merge into a trailing SETTINGS clause)
    * `totals_mode = 'after_having_exclusive'` — the mode the embedded
    * rewrite implements — so a real server receiving the statement
    * verbatim behaves identically regardless of its configured default.
    * A statement that already names totals_mode is left untouched (the
    * embedded engine then honors-or-rejects the author's choice).
    */
  def pinTotalsMode(sql: String): String = {
    if (!raw"(?i)\bTOTALS\b".r.findFirstIn(sql).isDefined ||
      !raw"(?i)\bHAVING\b".r.findFirstIn(sql).isDefined) return sql
    if (raw"(?i)\btotals_mode\b".r.findFirstIn(sql).isDefined) return sql
    val trimmed = sql.replaceAll(raw"[;\s]+$$", "")
    if (topLevelPositions(trimmed, "SETTINGS").nonEmpty)
      trimmed + ", totals_mode = 'after_having_exclusive'"
    else trimmed + " SETTINGS totals_mode = 'after_having_exclusive'"
  }

  /** Drop a trailing top-level `FORMAT <name>` clause. The clause selects
    * a WIRE RENDERING, not a result: the connector owns the wire format
    * on every transport (RowBinary on HTTP, in-process frames embedded),
    * so stripping it IS honoring it — the rows are identical. Only the
    * statement-final form exists in the server grammar; a FORMAT token
    * anywhere else is left for the engine to reject loudly.
    */
  def stripFormat(sql: String): String = {
    val ps = topLevelPositions(sql, "FORMAT")
    if (ps.isEmpty) return sql
    val at = ps.last
    val tail = sql.substring(at)
    if (raw"(?is)^FORMAT\s+[A-Za-z][A-Za-z0-9]*\s*;?\s*$$".r
      .findFirstIn(tail).isDefined)
      sql.substring(0, at).replaceAll(raw"\s+$$", "")
    else sql
  }

  /** ClickHouse bracket syntax, which Spark's parser either rejects or —
    * worse — silently re-interprets:
    *
    *  - `[e1, e2]` array literals → `array(e1, e2)` (Spark has no
    *    bracket-literal form);
    *  - `a[i]` / `m['k']` subscripts → `element_at(a, i)`: ClickHouse
    *    subscripts are 1-BASED (negative = from the end), Spark's own
    *    `a[i]` is 0-based — passing it through would be a silent
    *    off-by-one on every element access. element_at carries the
    *    server's indexing exactly; out-of-range reads error loudly under
    *    ANSI instead of minting the server's type-default, which a text
    *    rewrite cannot know.
    *
    * A `[` is a subscript iff the previous non-space character ends a
    * primary (identifier, backtick quote, `)`, or `]`); otherwise it
    * opens a literal.
    */
  private[client] def rewriteBrackets(in: String): String =
    rewriteSubscripts(rewriteArrayLiterals(rewriteMapLiterals(in)))

  /** Words after which a `[` opens an array LITERAL (they introduce an
    * expression rather than ending a primary one). Anything else —
    * identifiers — takes the subscript reading.
    */
  private val NonPrimaryWords: Set[String] = Set(
    "SELECT", "DISTINCT", "ALL", "FROM", "WHERE", "PREWHERE", "HAVING",
    "QUALIFY", "AND", "OR", "NOT", "XOR", "IN", "BY", "ON", "WHEN", "THEN",
    "ELSE", "CASE", "JOIN", "UNION", "EXCEPT", "INTERSECT", "LIMIT",
    "OFFSET", "SETTINGS", "VALUES", "USING", "BETWEEN", "LIKE", "ILIKE",
    "IS", "AS", "ASC", "DESC", "OVER", "PARTITION", "ORDER", "GROUP",
    "RETURN", "INTERPOLATE", "WITH", "TOTALS", "FILL", "TO", "STEP",
    "ARRAY", "LEFT", "RIGHT", "INNER", "FULL", "CROSS", "SEMI", "ANTI",
    "ASOF", "ANY", "GLOBAL", "PASTE", "IF", "ELSEIF", "EXISTS")

  /** ClickHouse map literals `{'k': v, ...}` → `map('k', v, ...)` —
    * Spark has no brace-literal form. Braces appear in SELECT grammar
    * only as map literals, so every top-level `:` inside a brace group
    * is a key-value separator (nested literals recurse; strings and
    * backticks are opaque).
    */
  private def rewriteMapLiterals(in: String): String = {
    val out = new StringBuilder
    var inSq = false
    var inBq = false
    // brace nesting depth → replace ':' with ',' only at brace level
    var braces = 0
    var parensSinceBrace = List.empty[Int] // paren depth inside each brace
    var i = 0
    while (i < in.length) {
      val c = in.charAt(i)
      if (inSq) {
        out.append(c)
        if (c == '\\' && i + 1 < in.length) { out.append(in.charAt(i + 1)); i += 1 }
        else if (c == '\'') inSq = false
      }
      else if (inBq) { out.append(c); if (c == '`') inBq = false }
      else c match {
        case '\'' => inSq = true; out.append(c)
        case '`' => inBq = true; out.append(c)
        case '{' =>
          braces += 1; parensSinceBrace ::= 0; out.append("map(")
        case '}' if braces > 0 =>
          braces -= 1; parensSinceBrace = parensSinceBrace.drop(1)
          out.append(")")
        case '(' | '[' if braces > 0 =>
          parensSinceBrace = (parensSinceBrace.head + 1) :: parensSinceBrace.tail
          out.append(c)
        case ')' | ']' if braces > 0 =>
          parensSinceBrace = (parensSinceBrace.head - 1) :: parensSinceBrace.tail
          out.append(c)
        case ':' if braces > 0 && parensSinceBrace.head == 0 =>
          out.append(',')
        case _ => out.append(c)
      }
      i += 1
    }
    out.result()
  }

  private def rewriteArrayLiterals(in: String): String = {
    val out = new StringBuilder
    var inSq = false
    var inBq = false
    val literalStack = scala.collection.mutable.Stack[Boolean]()
    var i = 0
    while (i < in.length) {
      val c = in.charAt(i)
      if (inSq) {
        out.append(c)
        if (c == '\\' && i + 1 < in.length) { out.append(in.charAt(i + 1)); i += 1 }
        else if (c == '\'') inSq = false
      }
      else if (inBq) { out.append(c); if (c == '`') inBq = false }
      else c match {
        case '\'' => inSq = true; out.append(c)
        case '`' => inBq = true; out.append(c)
        case '[' =>
          var j = out.length - 1
          while (j >= 0 && out.charAt(j).isWhitespace) j -= 1
          val subscript = j >= 0 && {
            val p = out.charAt(j)
            if (p == '`' || p == ')' || p == ']') true
            else if (p.isLetterOrDigit || p == '_') {
              // a bare word ends a primary UNLESS it is a keyword that
              // introduces an expression (`SELECT [1]`, `WHERE x IN [..]`)
              var k = j
              while (k >= 0 && (out.charAt(k).isLetterOrDigit || out.charAt(k) == '_')) k -= 1
              !NonPrimaryWords.contains(
                out.substring(k + 1, j + 1).toUpperCase(java.util.Locale.ROOT))
            } else false
          }
          literalStack.push(!subscript)
          out.append(if (subscript) "[" else "array(")
        case ']' =>
          val lit = literalStack.nonEmpty && literalStack.pop()
          out.append(if (lit) ")" else "]")
        case _ => out.append(c)
      }
      i += 1
    }
    out.result()
  }

  private def rewriteSubscripts(in: String): String = {
    // locate the first '[' outside quotes (after the literal pass, every
    // remaining bracket is a subscript)
    var inSq = false
    var inBq = false
    var open = -1
    var i = 0
    while (i < in.length && open < 0) {
      val c = in.charAt(i)
      if (inSq) {
        if (c == '\\') i += 1 else if (c == '\'') inSq = false
      }
      else if (inBq) { if (c == '`') inBq = false }
      else if (c == '\'') inSq = true
      else if (c == '`') inBq = true
      else if (c == '[') open = i
      i += 1
    }
    if (open < 0) return in
    // matching ']' (quote- and nesting-aware)
    var depth = 1
    var close = -1
    i = open + 1
    inSq = false; inBq = false
    while (i < in.length && close < 0) {
      val c = in.charAt(i)
      if (inSq) { if (c == '\\') i += 1 else if (c == '\'') inSq = false }
      else if (inBq) { if (c == '`') inBq = false }
      else if (c == '\'') inSq = true
      else if (c == '`') inBq = true
      else if (c == '[') depth += 1
      else if (c == ']') { depth -= 1; if (depth == 0) close = i }
      i += 1
    }
    require(close > open, s"unbalanced '[' in: $in")
    // primary start: scan backward over an identifier / backtick-quoted /
    // parenthesized-group chain joined by '.'
    var start = open
    var scanning = true
    while (scanning) {
      var j = start - 1
      while (j >= 0 && in.charAt(j).isWhitespace) j -= 1
      if (j < 0) { scanning = false }
      else in.charAt(j) match {
        case '`' =>
          var k = j - 1
          while (k >= 0 && in.charAt(k) != '`') k -= 1
          require(k >= 0, s"unbalanced backtick in: $in")
          start = k
        case ')' =>
          var d = 1
          var k = j - 1
          var sq = false
          while (k >= 0 && d > 0) {
            val ch = in.charAt(k)
            if (sq) { if (ch == '\'') sq = false }
            else if (ch == '\'') sq = true
            else if (ch == ')') d += 1
            else if (ch == '(') d -= 1
            if (d > 0) k -= 1
          }
          require(k >= 0, s"unbalanced ')' before subscript in: $in")
          start = k
          // a function name directly before the group belongs to it
          var m = k - 1
          while (m >= 0 && (in.charAt(m).isLetterOrDigit || in.charAt(m) == '_')) m -= 1
          if (m < k - 1) start = m + 1
        case ch if ch.isLetterOrDigit || ch == '_' =>
          var k = j
          while (k >= 0 && (in.charAt(k).isLetterOrDigit || in.charAt(k) == '_')) k -= 1
          start = k + 1
        case _ => scanning = false
      }
      if (scanning) {
        // extend across a qualification dot (db.tbl.col[. …])
        var j2 = start - 1
        while (j2 >= 0 && in.charAt(j2).isWhitespace) j2 -= 1
        if (j2 >= 0 && in.charAt(j2) == '.') start = j2 else scanning = false
      }
    }
    require(start < open, s"subscript without a primary expression in: $in")
    val primary = in.substring(start, open).trim
    val index = in.substring(open + 1, close).trim
    rewriteSubscripts(
      in.substring(0, start) + s"element_at($primary, $index)" +
        in.substring(close + 1))
  }

  def translate(chSql: String, tables: Seq[(String, String)]): String = {
    var s = rewriteBrackets(stripFormat(chSql))
    // PREWHERE is an evaluation-order hint with WHERE semantics: on one
    // node the visible result is identical, so it folds into WHERE
    // (combined with AND when both clauses are present). GLOBAL IN /
    // GLOBAL JOIN likewise: distribution hints that are the identity on
    // a single execution domain.
    s = foldPrewhere(s)
    // ClickHouse scalar WITH (`WITH <expr> AS <ident>`) inlines before
    // anything else looks at statement structure — Spark's WITH only
    // accepts CTE subqueries
    s = rewriteScalarWith(s)
    // honored-or-rejected: WITH FILL is handled BEFORE translation (the
    // top-level single-column form — parseWithFill + the session's lazy
    // gap composition); any WITH FILL / INTERPOLATE still visible here
    // is a shape that path does not model (nested in a subquery, or a
    // caller bypassing the session) — reject by name, never garbled SQL.
    // The lookahead spares a CTE legitimately named `fill`.
    mapOutsideStrings(s) { seg =>
      if (raw"(?i)\bWITH\s+FILL\b(?!\s+AS\b|\s*\()".r.findFirstIn(seg).isDefined ||
        raw"(?i)\bINTERPOLATE\s*\(".r.findFirstIn(seg).isDefined)
        throw new IllegalArgumentException(
          "ORDER BY ... WITH FILL / INTERPOLATE here is not supported by " +
            "the embedded engine (only the TOP-LEVEL single-column WITH " +
            "FILL form is, rewritten before translation); build the grid " +
            "explicitly (sequence() + explode + LEFT JOIN, the q52 " +
            "gap-fill pattern) or run against a real server")
      seg
    }
    s = stripGlobal(s)
    // ALL join strictness is the server default — the identity (either
    // keyword order); UNION ALL is never followed by a join kind
    s = mapOutsideStrings(s) { seg =>
      seg.replaceAll(raw"(?i)\bALL\s+(LEFT|RIGHT|INNER|FULL)\s+(OUTER\s+)?JOIN\b", "$1 $2JOIN")
        .replaceAll(raw"(?i)\b(LEFT|RIGHT|INNER|FULL)\s+ALL\s+JOIN\b", "$1 JOIN")
    }
    // ARRAY JOIN before ASOF: the lateral-view rewrite removes the
    // clause's JOIN token, which would otherwise trip ASOF's
    // single-join-per-level guard
    s = rewriteArrayJoin(s)
    s = rewriteRightSemiAnti(s)
    s = rewritePaste(s)
    s = rewriteAsof(s)
    s = rewriteTotals(s)
    s = rewriteQualify(s)
    s = rewriteSettings(s)
    // table references: `db`.`table` or db.table → __ch_db_table.
    // Applied OUTSIDE string literals only — a data value containing the
    // text "main.orders" must survive translation verbatim (the same
    // quote-awareness rule the GLOBAL strip learned this round)
    s = mapOutsideStrings(s) { seg =>
      tables.foldLeft(seg) { case (acc, (db, t)) =>
        acc.replace(s"`$db`.`$t`", viewName(db, t))
          .replaceAll(s"(?<![`\\w])${java.util.regex.Pattern.quote(db)}\\.$t(?![`\\w])",
            viewName(db, t))
      }
    }
    // ClickHouse treats NULL as the LARGEST value in sorts (ASC → nulls
    // last, DESC → nulls first); Spark defaults the opposite way. Every
    // ORDER BY item without an explicit NULLS clause gets the server's
    // default made explicit, so embedded orderings match a real server.
    s = injectNullOrder(s)
    // special forms first (arg rewrites), then plain name swaps
    s = translateSpecialForms(s)
    fnMap.foreach { case (ch, sp) =>
      s = s.replaceAll(s"\\b${java.util.regex.Pattern.quote(ch)}\\s*\\(", sp + "(")
    }
    // ClickHouse case-sensitive names survive quoting: `arrayMap`(...) etc.
    fnMap.foreach { case (ch, sp) =>
      s = s.replace(s"`$ch`(", sp + "(")
    }
    s
  }

  /** ClickHouse type name → Spark DDL type (for CAST targets). */
  private def sparkTypeName(ch: String): String = {
    val t = ch.trim
    t match {
      case "Int8" => "TINYINT"
      case "Int16" | "UInt8" => "SMALLINT"
      case "Int32" | "UInt16" => "INT"
      case "Int64" | "UInt32" => "BIGINT"
      case "UInt64" => "DECIMAL(20, 0)"
      case "Float32" => "FLOAT"
      case "Float64" => "DOUBLE"
      case "String" => "STRING"
      case "Bool" => "BOOLEAN"
      case "Date" | "Date32" => "DATE"
      case _ if t.startsWith("DateTime") => "TIMESTAMP"
      case _ if t.startsWith("Decimal(") => "DECIMAL" + t.stripPrefix("Decimal")
      case _ if t.startsWith("Array(") && t.endsWith(")") =>
        s"ARRAY<${sparkTypeName(t.substring(6, t.length - 1))}>"
      case _ if t.startsWith("Nullable(") && t.endsWith(")") =>
        sparkTypeName(t.substring(9, t.length - 1))
      case other => other
    }
  }

  /** Forms that need more than a name swap. Operates on the nesting our
    * unparser emits (balanced-paren argument parsing).
    */
  private def translateSpecialForms(in: String): String = {
    var s = in
    // sigmoid(x) → (1.0 / (1.0 + exp(-(x))))
    s = rewriteCall(s, "sigmoid", args => s"(1.0 / (1.0 + exp(-(${args.head}))))")
    // splitByChar('c', s) → split(s, 'c') (argument order swap). The
    // separator lands in split's REGEX position, so it must be a
    // literal and regex-escaped — splitByChar('.', s) used to split at
    // EVERY character (round-16 fix, the splitByString pattern). The
    // 3-arg max_substrings form rejects: the server's remainder law is
    // setting-dependent (splitby_max_substrings_includes_remaining
    // _string), not pinnable offline.
    s = rewriteCall(s, "splitByChar", args => {
      require(args.size == 2,
        "splitByChar takes (separator, string) — the max_substrings " +
          "form's remainder law is server-setting-dependent, not " +
          "pinnable offline")
      val lit = stringLiteral(args(0)).getOrElse(
        throw new IllegalArgumentException(
          "splitByChar: the separator must be a string literal"))
      require(lit.length == 1,
        s"splitByChar: the separator must be a single character (got '$lit')")
      s"split(${args(1)}, '${escapeRegexLiteral(lit)}')"
    })
    // translate(s, from, to): Spark's builtin shares the name and the
    // per-char map law on the EQUAL-LENGTH domain; on unequal literal
    // lengths Spark silently DROPS characters where the server errors —
    // validate literals here so the divergence is an error, never a
    // silent success-with-value. Non-literal from/to pass through (no
    // translate-time check possible).
    s = rewriteCall(s, "translate", args => {
      require(args.size == 3, "translate takes (string, from, to)")
      (stringLiteral(args(1)), stringLiteral(args(2))) match {
        case (Some(f), Some(t)) => require(f.length == t.length,
          s"translate: 'from' (${f.length} chars) and 'to' (${t.length} " +
            "chars) must be the same length — the server errors on a " +
            "mismatch where Spark silently drops characters")
        case _ =>
      }
      s"translate(${args.mkString(", ")})"
    })
    // arraySum(x) → aggregate(x, cast(0 as double), (a, v) -> a + v)
    s = rewriteCall(s, "arraySum",
      args => s"aggregate(${args.head}, cast(0 as double), (a, v) -> a + v)")
    // ClickHouse HOFs take the lambda FIRST, Spark takes the array first:
    // arrayMap(x -> f(x), arr) → transform(arr, x -> f(x));
    // arrayMap((x, y) -> f, a, b) → zip_with(a, b, (x, y) -> f). The
    // server REQUIRES equal array sizes where zip_with NULL-pads the
    // shorter side — values agree on the defined (equal-length) domain;
    // 3+ arrays have no Spark primitive and reject loudly.
    s = rewriteCall(s, "arrayMap", args => args.length match {
      case 2 => s"transform(${args(1)}, ${args(0)})"
      case 3 => s"zip_with(${args(1)}, ${args(2)}, ${args(0)})"
      case n => throw new IllegalArgumentException(
        s"arrayMap over ${n - 1} arrays is not supported by the embedded " +
          "engine (1 or 2 arrays only)")
    })
    s = rewriteCall(s, "arrayFilter", args => s"filter(${args(1)}, ${args(0)})")
    s = rewriteCall(s, "arrayExists", args => s"exists(${args(1)}, ${args(0)})")
    s = rewriteCall(s, "arrayAll", args => s"forall(${args(1)}, ${args(0)})")
    // arrayFirstIndex(f, arr): 1-based index of the first match, 0 when
    // none — array_position shares BOTH conventions (the indexOf rule)
    s = rewriteCall(s, "arrayFirstIndex", args =>
      s"array_position(transform(${args(1)}, ${args(0)}), true)")
    // arrayLastIndex: position in the reversed array maps back as
    // size - p + 1; 0-for-absent survives the CASE
    s = rewriteCall(s, "arrayLastIndex", args => {
      val bools = s"transform(${args(1)}, ${args(0)})"
      s"(CASE WHEN array_position(reverse($bools), true) = 0 THEN 0 " +
        s"ELSE size(${args(1)}) - array_position(reverse($bools), true) + 1 " +
        "END)"
    })
    // hasAll/hasAny via Spark's SET operations, which treat NULL
    // elements as equal — exactly ClickHouse's semantics ([NULL] hasAll
    // [NULL] = 1); array_contains/arrays_overlap would go three-valued
    s = rewriteCall(s, "hasAll",
      args => s"(size(array_except(${args(1)}, ${args(0)})) = 0)")
    s = rewriteCall(s, "hasAny",
      args => s"(size(array_intersect(${args(0)}, ${args(1)})) > 0)")
    // distinct elements in both, order unspecified in BOTH engines
    s = rewriteCall(s, "arrayIntersect",
      args => s"array_intersect(${args(0)}, ${args(1)})")
    // range(n) = [0 .. n-1]; range(start, end[, step]) is HALF-OPEN
    // where Spark's sequence is inclusive — the end nudges back one
    // step; empty ranges need the CASE (sequence(0, -1) would emit a
    // DESCENDING ramp)
    s = rewriteCall(s, "range", args => args.size match {
      case 1 =>
        s"(CASE WHEN ${args(0)} <= 0 THEN array() " +
          s"ELSE sequence(0, ${args(0)} - 1) END)"
      case 2 =>
        s"(CASE WHEN ${args(1)} <= ${args(0)} THEN array() " +
          s"ELSE sequence(${args(0)}, ${args(1)} - 1) END)"
      case _ =>
        s"(CASE WHEN (${args(2)}) > 0 AND ${args(1)} <= ${args(0)} " +
          s"THEN array() ELSE sequence(${args(0)}, " +
          s"${args(1)} - (CASE WHEN (${args(2)}) > 0 THEN 1 ELSE -1 END), " +
          s"${args(2)}) END)"
    })
    // arrayFold((acc, x) -> ..., arr, init) → aggregate(arr, init, f):
    // both engines fold left with the same (acc, element) lambda shape
    s = rewriteCall(s, "arrayFold", args => {
      require(args.size == 3, "arrayFold(lambda, array, init)")
      s"aggregate(${args(1)}, ${args(2)}, ${args(0)})"
    })
    // arrayCount([f,] arr): matching elements; the no-lambda form counts
    // elements != 0 (server semantics)
    s = rewriteCall(s, "arrayCount", args =>
      if (args.size >= 2) s"size(filter(${args(1)}, ${args(0)}))"
      else s"size(filter(${args.head}, __ac_x -> __ac_x != 0))")
    // arraySort/arrayReverseSort (plain arity): ClickHouse places NULLs
    // LAST in both directions — Spark's sort_array puts them first on
    // ASC, so the NULL block is split out and re-appended. The keyed
    // arity (arraySort(f, arr)) rejects: the server's stable equal-key
    // order has no Spark array primitive.
    def nullsLastSort(a: String, desc: Boolean): String = {
      val vals = s"sort_array(filter($a, __as_x -> __as_x IS NOT NULL))"
      val core = if (desc) s"reverse($vals)" else vals
      s"concat($core, filter($a, __as_x -> __as_x IS NULL))"
    }
    s = rewriteCall(s, "arraySort", args => {
      require(args.size == 1,
        "arraySort with a key lambda is not supported by the embedded " +
          "engine (the server's stable equal-key order has no Spark " +
          "array primitive); sort a struct-keyed copy explicitly or run " +
          "against a real server")
      nullsLastSort(args.head, desc = false)
    })
    s = rewriteCall(s, "arrayReverseSort", args => {
      require(args.size == 1,
        "arrayReverseSort with a key lambda is not supported by the " +
          "embedded engine; sort a struct-keyed copy explicitly or run " +
          "against a real server")
      nullsLastSort(args.head, desc = true)
    })
    // arrayCumSum: running prefix sums, same length; arrayDifference:
    // [0, a2-a1, ...]. Both need the ELEMENT type's zero (a text rewrite
    // cannot name it) — try_element_at(a, 1) * 0, the sumArray trick.
    s = rewriteCall(s, "arrayCumSum", args => {
      val a = args.head
      val zero = s"try_element_at($a, 1) * 0"
      // slice(a, 1, 0) is an EMPTY array of a's own element type — the
      // only way a text rewrite can type the accumulator; sums stay in
      // the element type (narrow-int overflow errors loudly under ANSI
      // where the server would promote — never a silent wrap)
      s"aggregate($a, slice($a, 1, 0), " +
        "(__cs_acc, __cs_v) -> concat(__cs_acc, array(" +
        s"coalesce(try_element_at(__cs_acc, -1), $zero) + __cs_v)))"
    })
    s = rewriteCall(s, "arrayDifference", args => {
      val a = args.head
      s"(CASE WHEN size($a) <= 0 THEN $a ELSE concat(" +
        s"array(try_element_at($a, 1) * 0), " +
        s"zip_with(slice($a, 2, size($a) - 1), slice($a, 1, size($a) - 1), " +
        "(__ad_x, __ad_y) -> __ad_x - __ad_y)) END)"
    })
    // arrayReduce('agg', arr): literal-name dispatch onto the exact
    // element folds (the sumArray/uniqArray machinery, scalar-shaped)
    s = rewriteCall(s, "arrayReduce", args => {
      require(args.size == 2,
        "arrayReduce: exactly ('aggName', array) is supported")
      val name = args.head.trim
      require(name.length >= 3 && name.startsWith("'") && name.endsWith("'"),
        s"arrayReduce: the aggregate name must be a string literal (got $name)")
      val a = args(1)
      val nn = s"filter($a, __ar_x -> __ar_x IS NOT NULL)"
      name.substring(1, name.length - 1) match {
        case "sum" =>
          // outer coalesce: the typed-zero init is NULL over an empty
          // (or all-NULL) array, but the server's arrayReduce('sum',[])
          // is 0; the literal-0 fallback may widen narrow ints, in the
          // same direction as the server's own sum promotion
          s"coalesce(aggregate($nn, try_element_at($nn, 1) * 0, " +
            "(__ar_acc, __ar_v) -> __ar_acc + __ar_v), 0)"
        case "min" | "any" => s"array_min($a)" // any→min, the pinned rule
        case "max" | "anyLast" => s"array_max($a)"
        case "avg" =>
          s"(aggregate($nn, cast(0 as double), " +
            s"(__ar_acc, __ar_v) -> __ar_acc + __ar_v) / size($nn))"
        case "count" => s"cast(size($nn) as bigint)"
        case "uniq" | "uniqExact" =>
          s"cast(size(array_distinct($nn)) as bigint)"
        case other => throw new IllegalArgumentException(
          s"arrayReduce('$other', ...) is not supported by the embedded " +
            "engine — supported names: sum, min, max, avg, count, any, " +
            "anyLast, uniq, uniqExact")
      }
    })
    // ---- round-14 function wave (FnSurfaceProbe sweep): each mapping
    // is value-identical on its defined domain; anything whose boundary
    // law could not be pinned stays a loud reject ----
    // array surgery
    s = rewriteCall(s, "arrayPushBack",
      args => s"concat(${args(0)}, array(${args(1)}))")
    s = rewriteCall(s, "arrayPushFront",
      args => s"concat(array(${args(1)}), ${args(0)})")
    s = rewriteCall(s, "arrayPopBack", args =>
      s"slice(${args.head}, 1, greatest(size(${args.head}) - 1, 0))")
    s = rewriteCall(s, "arrayPopFront", args =>
      s"(CASE WHEN size(${args.head}) <= 1 THEN slice(${args.head}, 1, 0) " +
        s"ELSE slice(${args.head}, 2, size(${args.head}) - 1) END)")
    s = rewriteCall(s, "arrayResize", args => {
      require(args.size == 3,
        "arrayResize: only the 3-argument (array, size, pad) form is " +
          "supported — the 2-argument grow pads with the element type's " +
          "DEFAULT, which a text rewrite cannot derive")
      val (a, n, p) = (args(0), args(1), args(2))
      s"(CASE WHEN ($n) <= size($a) THEN slice($a, 1, greatest($n, 0)) " +
        s"ELSE concat($a, array_repeat($p, ($n) - size($a))) END)"
    })
    // 1-based access, identical to the `a[i]` subscript rewrite
    s = rewriteCall(s, "arrayElement",
      args => s"element_at(${args(0)}, ${args(1)})")
    // consecutive-duplicate collapse; <=> matches the server's
    // NULL-equals-NULL collapse
    s = rewriteCall(s, "arrayCompact", args => {
      val a = args.head
      s"filter($a, (__ac_x, __ac_i) -> __ac_i = 0 OR " +
        s"NOT (__ac_x <=> element_at($a, __ac_i)))"
    })
    s = rewriteCall(s, "countEqual", args =>
      s"cast(size(filter(${args(0)}, __ce_x -> __ce_x <=> ${args(1)})) as bigint)")
    // (arrayEnumerate already maps below — the indexed-transform rule)
    s = rewriteCall(s, "arrayUniq", args => {
      require(args.size == 1,
        "arrayUniq over multiple arrays (distinct TUPLES) is not supported")
      s"cast(size(array_distinct(${args.head})) as bigint)"
    })
    s = rewriteCall(s, "arrayAvg", args => {
      val nn = s"filter(${args.head}, __aa_x -> __aa_x IS NOT NULL)"
      s"(aggregate($nn, cast(0 as double), " +
        s"(__aa_acc, __aa_v) -> __aa_acc + __aa_v) / size($nn))"
    })
    s = rewriteCall(s, "arrayProduct", args => {
      val nn = s"filter(${args.head}, __ap_x -> __ap_x IS NOT NULL)"
      // Float64 result like the server's; empty folds to the init 1.0
      s"aggregate($nn, cast(1 as double), " +
        s"(__ap_acc, __ap_v) -> __ap_acc * __ap_v)"
    })
    // zip to unnamed tuples (structs — the repo's tuple representation;
    // tupleElement/graft_tuple_at read them positionally)
    s = rewriteCall(s, "arrayZip", args => {
      require(args.size == 2,
        "arrayZip: exactly two arrays are supported (3+ have no " +
          "equal-size-checked Spark composition)")
      s"zip_with(${args(0)}, ${args(1)}, (__az_a, __az_b) -> " +
        "struct(__az_a, __az_b))"
    })
    s = rewriteCall(s, "bitPositionsToArray", args =>
      s"filter(transform(sequence(0, 63), __bp_i -> " +
        s"CASE WHEN (cast(${args.head} as bigint) & shiftleft(1L, __bp_i)) != 0 " +
        "THEN cast(__bp_i as bigint) END), __bp_x -> __bp_x IS NOT NULL)")
    // string family
    s = rewriteCall(s, "splitByString", args => {
      require(args.size == 2, "splitByString takes (separator, string)")
      val lit = stringLiteral(args(0)).getOrElse(throw new IllegalArgumentException(
        "splitByString: the separator must be a string literal"))
      require(lit.nonEmpty,
        "splitByString('') splits to characters — spell it split(s, '')")
      s"split(${args(1)}, '${escapeRegexLiteral(lit)}')"
    })
    s = rewriteCall(s, "splitByRegexp",
      args => s"split(${args(1)}, ${args(0)})")
    s = rewriteCall(s, "extract", args => {
      // SQL-standard EXTRACT(unit FROM x) passes through untouched —
      // only the ClickHouse regex form (haystack, pattern) maps
      if (args.size == 1 &&
        raw"(?i)\sFROM\s".r.findFirstIn(args.head).isDefined)
        s"extract(${args.head})"
      else {
        require(args.size == 2, "extract takes (haystack, pattern)")
        s"regexp_extract(${args(0)}, ${args(1)}, ${extractGroupIdx(args(1))})"
      }
    })
    s = rewriteCall(s, "extractAll", args => {
      require(args.size == 2, "extractAll takes (haystack, pattern)")
      s"regexp_extract_all(${args(0)}, ${args(1)}, ${extractGroupIdx(args(1))})"
    })
    s = rewriteCall(s, "replaceOne", args => {
      val (h, n, r) = (args(0), args(1), args(2))
      // char_length, NOT graft_length: locate/substr are codepoint-based,
      // so the needle's length must be codepoints too (graft_length is
      // BYTES since round 15 — mixing them breaks multi-byte needles)
      s"(CASE WHEN locate($n, $h) > 0 THEN concat(" +
        s"substr($h, 1, locate($n, $h) - 1), $r, " +
        s"substr($h, locate($n, $h) + char_length($n))) ELSE $h END)"
    })
    s = rewriteCall(s, "replaceRegexpAll", args => {
      require(args.size == 3, "replaceRegexpAll takes (haystack, pattern, replacement)")
      s"regexp_replace(${args(0)}, ${args(1)}, ${chReplacementToJava(args(2))})"
    })
    // first-match-only regex replace: Java replaceFirst — also DuckDB's
    // default non-global regexp_replace, which makes it oracle-exact
    s = rewriteCall(s, "replaceRegexpOne", args => {
      require(args.size == 3, "replaceRegexpOne takes (haystack, pattern, replacement)")
      s"graft_replace_regexp_one(${args(0)}, ${args(1)}, " +
        s"${chReplacementToJava(args(2), "replaceRegexpOne")})"
    })
    s = rewriteCall(s, "countSubstrings", args => {
      val (h, n) = (args(0), args(1))
      // non-overlapping occurrences in both engines
      s"cast((graft_length($h) - graft_length(replace($h, $n, ''))) " +
        s"/ graft_length($n) as bigint)"
    })
    s = rewriteCall(s, "positionCaseInsensitive",
      args => s"locate(lower(${args(1)}), lower(${args(0)}))")
    s = rewriteCall(s, "notLike",
      args => s"(NOT (${args(0)} LIKE ${args(1)}))")
    s = rewriteCall(s, "format", args => {
      require(args.size >= 2, "format needs a template and arguments")
      val tpl = stringLiteral(args.head).getOrElse(throw new IllegalArgumentException(
        "format: the template must be a string literal"))
      s"format_string('${chFormatToJava(tpl)}', ${args.tail.mkString(", ")})"
    })
    s = rewriteCall(s, "base64Decode",
      args => s"cast(unbase64(${args.head}) as string)")
    // null / branch family
    s = rewriteCall(s, "assumeNotNull", args => {
      require(args.size == 1, "assumeNotNull takes one argument")
      // values agree wherever the server's result is defined (NULL input
      // is UNDEFINED there — the engines may differ only off-contract)
      s"(${args.head})"
    })
    // bit ops as operators (codegen'd)
    s = rewriteCall(s, "bitAnd", args => s"((${args(0)}) & (${args(1)}))")
    s = rewriteCall(s, "bitOr", args => s"((${args(0)}) | (${args(1)}))")
    s = rewriteCall(s, "bitXor", args => s"((${args(0)}) ^ (${args(1)}))")
    s = rewriteCall(s, "bitNot", args => s"(~(${args.head}))")
    s = rewriteCall(s, "intDivOrZero", args =>
      s"(CASE WHEN (${args(1)}) = 0 THEN 0 ELSE (${args(0)}) DIV (${args(1)}) END)")
    s = rewriteCall(s, "moduloOrZero", args =>
      s"(CASE WHEN (${args(1)}) = 0 THEN 0 ELSE (${args(0)}) % (${args(1)}) END)")
    s = rewriteCall(s, "exp2", args => s"power(cast(2 as double), ${args.head})")
    s = rewriteCall(s, "exp10", args => s"power(cast(10 as double), ${args.head})")
    // CH trunc/truncate(x[, N]) = toward-zero (at N decimal places);
    // Spark's own trunc is date-only, so both arities map here
    def truncSql(args: Seq[String]): String = {
      require(args.size == 1 || args.size == 2,
        "trunc/truncate: (x) or (x, places)")
      val x = if (args.size == 1) args.head
        else s"((${args.head}) * power(10, ${args(1)}))"
      val core = s"(CASE WHEN ($x) >= 0 THEN floor($x) ELSE ceiling($x) END)"
      if (args.size == 1) core else s"($core / power(10, ${args(1)}))"
    }
    s = rewriteCall(s, "trunc", truncSql)
    s = rewriteCall(s, "truncate", truncSql)
    // CH rand() is a random UInt32 (randCanonical is the [0,1) form) —
    // passing Spark's rand() through would be a silent distribution lie
    s = rewriteCall(s, "rand", args =>
      "cast(floor(rand() * 4294967296) as bigint)")
    // date/time family
    // NOTE: these run BEFORE any rule that EMITS Spark-form
    // date_sub/date_add text (yesterday/toMonday/toStartOfWeek below) —
    // a later position would rewrite the emitted Spark SQL (the
    // sequential-rules shadowing law, round 17).
    // dateAdd/dateSub spellings (round 17): the unit-first 3-argument
    // form (identifier or string-literal unit) and the
    // (date, INTERVAL n unit) 2-argument form, both folding onto
    // timestampadd like the add<Unit> family above
    locally {
      val units = Set("SECOND", "MINUTE", "HOUR", "DAY", "WEEK",
        "MONTH", "QUARTER", "YEAR")
      def unitOf(arg: String, nm: String): String = {
        val u = stringLiteral(arg).getOrElse(arg.trim)
          .toUpperCase(java.util.Locale.ROOT)
        require(units.contains(u),
          s"$nm: unit '$u' is not supported (${units.toSeq.sorted.mkString("/")})")
        u
      }
      val IntervalRe = raw"(?i)^INTERVAL\s+(.+?)\s+(\w+)$$".r
      for ((nm, neg) <- Seq("dateAdd" -> false, "date_add" -> false,
        "DATE_ADD" -> false, "dateSub" -> true, "date_sub" -> true,
        "DATE_SUB" -> true))
        s = rewriteCall(s, nm, args => args.size match {
          case 3 =>
            val u = unitOf(args(0), nm)
            val v = if (neg) s"-(${args(1)})" else args(1)
            s"timestampadd($u, $v, ${args(2)})"
          case 2 => args(1).trim match {
            case IntervalRe(v, u0) =>
              val u = unitOf(u0, nm)
              val v2 = if (neg) s"-($v)" else v
              s"timestampadd($u, $v2, ${args(0)})"
            case _ => throw new IllegalArgumentException(
              s"$nm takes (unit, value, date) or (date, INTERVAL n unit)")
          }
          case n => throw new IllegalArgumentException(
            s"$nm takes 2 or 3 arguments (got $n)")
        })
    }
    s = rewriteCall(s, "yesterday", _ => "date_sub(current_date(), 1)")
    s = rewriteCall(s, "toDayOfWeek", args => {
      require(args.size == 1,
        "toDayOfWeek: mode argument is not supported (default Mon=1..Sun=7)")
      s"(pmod(dayofweek(${args.head}) + 5, 7) + 1)"
    })
    s = rewriteCall(s, "toMonday", args =>
      s"date_sub(to_date(${args.head}), pmod(dayofweek(${args.head}) + 5, 7))")
    s = rewriteCall(s, "toStartOfWeek", args => {
      val mode = if (args.size >= 2) args(1).trim else "0"
      mode match {
        case "0" => // Sunday-start weeks (the server default)
          s"date_sub(to_date(${args.head}), dayofweek(${args.head}) - 1)"
        case "1" => // Monday-start weeks
          s"date_sub(to_date(${args.head}), pmod(dayofweek(${args.head}) + 5, 7))"
        case m => throw new IllegalArgumentException(
          s"toStartOfWeek: mode $m is not supported (0 = Sunday, 1 = Monday)")
      }
    })
    s = rewriteCall(s, "toStartOfQuarter", args =>
      s"to_date(date_trunc('quarter', ${args.head}))")
    for ((ch, unit) <- Seq(
      "addSeconds" -> "SECOND", "addMinutes" -> "MINUTE",
      "addHours" -> "HOUR", "addDays" -> "DAY", "addWeeks" -> "WEEK",
      "addMonths" -> "MONTH", "addQuarters" -> "QUARTER",
      "addYears" -> "YEAR")) {
      // timestampadd: Date inputs widen to timestamp (value-exact; the
      // server keeps Date for day-granularity adds — a TYPE widening,
      // same spirit as the Int128 mapping)
      s = rewriteCall(s, ch,
        args => s"timestampadd($unit, ${args(1)}, ${args(0)})")
      s = rewriteCall(s, "subtract" + ch.substring(3),
        args => s"timestampadd($unit, -(${args(1)}), ${args(0)})")
    }
    s = rewriteCall(s, "dateDiff", args => {
      require(args.size == 3,
        "dateDiff: (unit, start, end) — the timezone argument is not supported")
      val unit = stringLiteral(args.head).getOrElse(throw new IllegalArgumentException(
        "dateDiff: the unit must be a string literal")).toLowerCase(java.util.Locale.ROOT)
      require(Set("second", "minute", "hour", "day", "month",
        "quarter", "year").contains(unit),
        s"dateDiff: unit '$unit' is not supported (second/minute/hour/" +
          "day/month/quarter/year; 'week' boundaries differ between engines)")
      // the server counts UNIT-BOUNDARY crossings, not full units —
      // truncate both endpoints first so full-unit counting equals
      // boundary counting
      s"timestampdiff(${unit.toUpperCase(java.util.Locale.ROOT)}, " +
        s"date_trunc('$unit', ${args(1)}), date_trunc('$unit', ${args(2)}))"
    })
    s = rewriteCall(s, "fromUnixTimestamp", args => {
      require(args.size == 1,
        "fromUnixTimestamp: the 2-argument (format) form renders with " +
          "server-dialect tokens and is not supported")
      s"timestamp_seconds(${args.head})"
    })
    s = rewriteCall(s, "formatDateTime", args => {
      require(args.size == 2,
        "formatDateTime: (datetime, 'format') without timezone is supported")
      val fmt = stringLiteral(args(1)).getOrElse(throw new IllegalArgumentException(
        "formatDateTime: the format must be a string literal"))
      s"date_format(${args.head}, '${chDateFormatToJava(fmt)}')"
    })
    // parseDateTime family (round 17): MySQL-style directives on the
    // PARSE-sharable subset (chDateParseToJava). Error laws align:
    // parseDateTime throws on garbage like the ANSI to_timestamp;
    // OrNull rides try_to_timestamp; OrZero falls back to the epoch
    // (the server's zero-date). parseDateTimeBestEffort* stays
    // rejected (heuristic format detection, not a pinnable law).
    for ((nm, wrap) <- Seq[(String, (String, String) => String)](
      "parseDateTime" -> ((x, f) => s"to_timestamp($x, '$f')"),
      "parseDateTimeOrNull" -> ((x, f) => s"try_to_timestamp($x, '$f')"),
      "parseDateTimeOrZero" -> ((x, f) =>
        s"coalesce(try_to_timestamp($x, '$f'), " +
          "timestamp'1970-01-01 00:00:00')")))
      s = rewriteCall(s, nm, args => {
        require(args.size == 2,
          s"$nm(string, 'format') — the timezone argument is not supported")
        val fmt = stringLiteral(args(1)).getOrElse(
          throw new IllegalArgumentException(
            s"$nm: the format must be a string literal"))
        wrap(args.head, chDateParseToJava(fmt))
      })
    // bitmaskToList/bitmaskToArray (round 17): powers of two summing
    // to the input, ascending — comma-joined text / array. Negative
    // inputs reject loudly (the sign-bit power is not representable;
    // the server's negative law is not pinnable offline). shiftright
    // spelled as the FUNCTION — the round-16 ANTLR rule bans '>>'.
    def bitmaskArr(x: String): String =
      s"transform(filter(sequence(0, 62), i -> " +
        s"(shiftright(CAST(($x) AS BIGINT), i) & 1) = 1), " +
        s"i -> shiftleft(CAST(1 AS BIGINT), i))"
    def bitmaskGuard(x: String, body: String, nm: String): String =
      s"(CASE WHEN ($x) < 0 THEN raise_error('$nm: negative input — " +
        s"the server law on negatives is not pinnable offline') " +
        s"ELSE $body END)"
    s = rewriteCall(s, "bitmaskToArray", args => {
      require(args.size == 1, "bitmaskToArray(x)")
      bitmaskGuard(args.head, bitmaskArr(args.head), "bitmaskToArray")
    })
    s = rewriteCall(s, "bitmaskToList", args => {
      require(args.size == 1, "bitmaskToList(x)")
      bitmaskGuard(args.head,
        s"concat_ws(',', transform(${bitmaskArr(args.head)}, " +
          "p -> CAST(p AS STRING)))", "bitmaskToList")
    })
    // (toYYYYMM / toYYYYMMDD already map below — arithmetic forms)
    // OrNull/OrZero conversions (try_cast trims like the server's parse)
    for ((ch, t) <- Seq(
      "toInt8OrNull" -> "TINYINT", "toInt16OrNull" -> "SMALLINT",
      "toInt32OrNull" -> "INT", "toInt64OrNull" -> "BIGINT",
      "toFloat32OrNull" -> "FLOAT", "toFloat64OrNull" -> "DOUBLE")) {
      s = rewriteCall(s, ch, args => s"try_cast(${args.head} AS $t)")
      s = rewriteCall(s, ch.replace("OrNull", "OrZero"),
        args => s"coalesce(try_cast(${args.head} AS $t), 0)")
    }
    // 4-argument transform: literal from/to arrays → a CASE ladder
    s = rewriteCall(s, "transform", args => {
      if (args.size != 4) args.mkString("transform(", ", ", ")")
      else {
        val from = splitArrayLiteral(args(1)).getOrElse(
          throw new IllegalArgumentException(
            "transform(x, from, to, default): from/to must be array literals"))
        val to = splitArrayLiteral(args(2)).getOrElse(
          throw new IllegalArgumentException(
            "transform(x, from, to, default): from/to must be array literals"))
        require(from.length == to.length && from.nonEmpty,
          "transform: from/to arrays must be same-length and non-empty")
        val cases = from.zip(to).map { case (f, t) =>
          s"WHEN (${args(0)}) <=> ($f) THEN ($t)"
        }.mkString(" ")
        s"(CASE $cases ELSE (${args(3)}) END)"
      }
    })

    // CAST(x AS <ClickHouse type>) → CAST(x AS <Spark type>)  [round-14
    // helpers for the wave above live after translate()]
    s = rewriteCall(s, "CAST", args => {
      // re-join: the splitter breaks on top-level commas, but Spark
      // composite type names carry them OUTSIDE parens (MAP<STRING,
      // BIGINT>) — args.head alone would truncate the target type
      val a = args.mkString(", ")
      val i = a.lastIndexOf(" AS ")
      if (i < 0) s"CAST($a)"
      else s"CAST(${a.substring(0, i)} AS ${sparkTypeName(a.substring(i + 4))})"
    })
    // position(haystack, needle[, start_pos]): 1-based BYTE offsets
    // throughout (server law — locate counts codepoints). The 3-arg
    // byte-offset start form maps since round 16 (GraftBytePositionFrom
    // kernel; start < 1 and empty-needle-with-start stay loud rejects,
    // not pinnable boundaries).
    s = rewriteCall(s, "position", args => args.size match {
      case 2 => s"graft_position(${args(0)}, ${args(1)})"
      case 3 => s"graft_position_from(${args(0)}, ${args(1)}, ${args(2)})"
      case n => throw new IllegalArgumentException(
        s"position takes 2 or 3 arguments (got $n)")
    })
    // countDistinct(x...) → count(DISTINCT x...)
    s = rewriteCall(s, "countDistinct", args => s"count(DISTINCT ${args.mkString(", ")})")
    // positiveModulo → pmod
    s = rewriteCall(s, "positiveModulo", args => s"pmod(${args.mkString(", ")})")
    // trimBoth → trim, replaceAll → replace
    s = rewriteCall(s, "trimBoth", args => s"trim(${args.head})")
    s = rewriteCall(s, "replaceAll", args => s"replace(${args.mkString(", ")})")
    // match(haystack, re) → regexp_like (the embedded engine's Java regex
    // stands in for ClickHouse's RE2; shared-subset fidelity)
    s = rewriteCall(s, "match", args => s"regexp_like(${args.mkString(", ")})")
    // startsWith/endsWith → Spark lowercase names
    s = rewriteCall(s, "startsWith", args => s"startswith(${args.mkString(", ")})")
    s = rewriteCall(s, "endsWith", args => s"endswith(${args.mkString(", ")})")
    // literal constructors emitted by ChSql.literal
    s = rewriteCall(s, "toDateTime64", args => s"to_timestamp(${args.head})")
    // date/time family (ClickHouse names → Spark equivalents)
    s = rewriteCall(s, "toYear", args => s"year(${args.head})")
    s = rewriteCall(s, "toMonth", args => s"month(${args.head})")
    s = rewriteCall(s, "toDayOfMonth", args => s"dayofmonth(${args.head})")
    s = rewriteCall(s, "toHour", args => s"hour(${args.head})")
    s = rewriteCall(s, "toMinute", args => s"minute(${args.head})")
    s = rewriteCall(s, "toSecond", args => s"second(${args.head})")
    s = rewriteCall(s, "toStartOfYear", args => s"date_trunc('year', ${args.head})")
    s = rewriteCall(s, "toStartOfMonth", args => s"date_trunc('month', ${args.head})")
    s = rewriteCall(s, "toStartOfDay", args => s"date_trunc('day', ${args.head})")
    s = rewriteCall(s, "toStartOfHour", args => s"date_trunc('hour', ${args.head})")
    s = rewriteCall(s, "toStartOfMinute", args => s"date_trunc('minute', ${args.head})")
    s = rewriteCall(s, "toDate", args => s"to_date(${args.head})")
    s = rewriteCall(s, "toQuarter", args => s"quarter(${args.head})")
    s = rewriteCall(s, "toDayOfYear", args => s"dayofyear(${args.head})")
    s = rewriteCall(s, "toISOWeek", args => s"weekofyear(${args.head})")
    // ---- round-15 sweep-2 wave (FnSurfaceProbe round 2) ----------------
    // ISO week-year: Spark's YEAROFWEEK extract carries the same ISO law
    s = rewriteCall(s, "toISOYear", args =>
      s"extract(YEAROFWEEK FROM ${args.head})")
    // fixed-interval truncations: epoch-second flooring (UTC session —
    // identical to the server's wall-clock truncation law in UTC)
    for ((ch, step) <- Seq(
      "toStartOfFiveMinutes" -> 300, "toStartOfTenMinutes" -> 600,
      "toStartOfFifteenMinutes" -> 900, "timeSlot" -> 1800))
      s = rewriteCall(s, ch, args =>
        s"timestamp_seconds(floor(unix_timestamp(${args.head}) / $step) * $step)")
    // toStartOfInterval: literal INTERVAL arg. Sub-day + day steps are
    // epoch-second flooring (exact in the UTC session). Calendar steps
    // (round 16) follow the server's DOCUMENTED origins (DateLUT's
    // toStartOf*Interval): multi-week intervals count from Monday
    // 1970-01-05 (the 4-day Thursday offset), months from 1970-01,
    // quarters = months with 3n, years from 1970; n=1 falls back to the
    // plain truncation law (toMonday/toStartOfMonth/Quarter/Year — no
    // origin involved, valid for any date). Pre-origin inputs hit the
    // server's UNSIGNED DayNum wraparound (not a pinnable value) — they
    // reject loudly via assert_true; NULL passes through as NULL.
    // Return type is Date for week+ steps, DateTime below — the server
    // law.
    s = rewriteCall(s, "toStartOfInterval", args => {
      require(args.size == 2,
        "toStartOfInterval: (datetime, INTERVAL n unit) without timezone")
      val m = raw"(?i)^INTERVAL\s+(\d+)\s+(SECOND|MINUTE|HOUR|DAY|WEEK|MONTH|QUARTER|YEAR)S?$$".r
        .findFirstMatchIn(args(1).trim).getOrElse(
          throw new IllegalArgumentException(
            "toStartOfInterval: the interval must be a literal INTERVAL n " +
              "SECOND/MINUTE/HOUR/DAY/WEEK/MONTH/QUARTER/YEAR"))
      val n = m.group(1).toLong
      require(n > 0, "toStartOfInterval: the step must be positive")
      val x = args.head
      // pre-origin guard: NULL-transparent, loud on a pre-1970 value
      def guard(origin: String): String =
        s"coalesce(cast(assert_true(($x) >= date'$origin' OR ($x) IS NULL, " +
          s"'toStartOfInterval: inputs before $origin hit the server''s " +
          "unsigned-day wraparound, which is not a pinnable value " +
          "offline') as int), 0)"
      m.group(2).toUpperCase(java.util.Locale.ROOT) match {
        case u @ ("SECOND" | "MINUTE" | "HOUR" | "DAY") =>
          val step = n * (u match {
            case "SECOND" => 1L
            case "MINUTE" => 60L
            case "HOUR" => 3600L
            case "DAY" => 86400L
          })
          s"timestamp_seconds(floor(unix_timestamp($x) / $step) * $step)"
        case "WEEK" if n == 1 => s"to_date(date_trunc('WEEK', $x))"
        case "WEEK" =>
          val d = n * 7
          s"date_add(date'1970-01-05', cast((datediff($x, date'1970-01-05') " +
            s"div $d) * $d as int) + ${guard("1970-01-05")})"
        case "MONTH" if n == 1 => s"to_date(date_trunc('MONTH', $x))"
        case "QUARTER" if n == 1 => s"to_date(date_trunc('QUARTER', $x))"
        case "YEAR" if n == 1 => s"to_date(date_trunc('YEAR', $x))"
        case "YEAR" =>
          s"make_date(1970 + cast(((year($x) - 1970) div $n) * $n as int) " +
            s"+ ${guard("1970-01-01")}, 1, 1)"
        case monthly @ ("MONTH" | "QUARTER") =>
          val nm = if (monthly == "QUARTER") n * 3 else n
          s"add_months(date'1970-01-01', cast((((year($x) - 1970) * 12 " +
            s"+ month($x) - 1) div $nm) * $nm as int) + ${guard("1970-01-01")})"
      }
    })
    // CH round(): banker's for FLOAT inputs, away-from-zero for the
    // rest (type-split law) — graft_round dispatches on the resolved
    // child type; Spark's half-up builtin resolved case-insensitively
    // before round 15 and flipped float .5 ties silently
    s = rewriteCall(s, "round", args => {
      require(args.size == 1 || args.size == 2, "round(x[, N])")
      s"graft_round(${args.mkString(", ")})"
    })
    // keyed SipHash: the tuple-literal key pair parses at translate
    // time (UInt64 spellings accepted via unsigned parse → the same
    // 64-bit pattern the server uses); the kernel is the paper-vector-
    // pinned core, so this spelling is pinned DIRECTLY by the
    // published vectors (HashKernelSpec + DifferentialSpec)
    s = rewriteCall(s, "sipHash64Keyed", args => {
      require(args.size == 2,
        "sipHash64Keyed((k0, k1), data) — single data argument only " +
          "(multi-argument combine chains are not pinnable offline)")
      val m = raw"^\(\s*(\d+)\s*,\s*(\d+)\s*\)$$".r.findFirstMatchIn(args(0).trim)
        .getOrElse(throw new IllegalArgumentException(
          "sipHash64Keyed: the key must be a literal (k0, k1) tuple of " +
            "unsigned integers"))
      val k0 = java.lang.Long.parseUnsignedLong(m.group(1))
      val k1 = java.lang.Long.parseUnsignedLong(m.group(2))
      s"graft_siphash64k(${args(1)}, ${k0}L, ${k1}L)"
    })
    // array shifts: exact slice/repeat composition. The 2-argument form
    // pads with the ARGUMENT type's default value, which the translator
    // cannot derive from text (the -OrDefault law) — the filler is
    // REQUIRED here; negative n shifts the other direction, |n| beyond
    // the length fills completely
    def shiftLeft(a: String, n: String, d: String): String =
      s"(CASE WHEN size($a) <= 0 THEN ($a) " +
        s"WHEN ($n) >= 0 AND ($n) < size($a) THEN concat(" +
        s"slice($a, ($n) + 1, size($a) - ($n)), array_repeat($d, $n)) " +
        s"WHEN ($n) < 0 AND -($n) < size($a) THEN concat(" +
        s"array_repeat($d, -($n)), slice($a, 1, size($a) + ($n))) " +
        s"ELSE array_repeat($d, size($a)) END)"
    for ((name, neg) <- Seq("arrayShiftLeft" -> false, "arrayShiftRight" -> true))
      s = rewriteCall(s, name, args => {
        require(args.size == 3,
          s"$name(arr, n, filler): the 2-argument form pads with the " +
            "element type's DEFAULT value, which is not derivable from " +
            "text — pass the filler explicitly or run against a real server")
        shiftLeft(args(0), if (neg) s"-(${args(1)})" else args(1), args(2))
      })
    // arrayDifference: first element 0, then adjacent diffs (the
    // documented law); arrayCumSum: running prefix sums. Both compose
    // as index transforms/folds over the element type's own arithmetic
    // (exact for integrals; NULL elements poison their positions like
    // the server's Nullable propagation — not pinned).
    // (empty arrays guard the index ramp — sequence(1, 0) would emit a
    // DESCENDING ramp, the `range` rule's law)
    s = rewriteCall(s, "arrayDifference", args => {
      require(args.size == 1, "arrayDifference(arr)")
      val a = args.head
      s"(CASE WHEN size($a) <= 0 THEN ($a) ELSE " +
        s"transform(sequence(1, size($a)), __ad_i -> " +
        s"CASE WHEN __ad_i = 1 THEN element_at($a, 1) - element_at($a, 1) " +
        s"ELSE element_at($a, __ad_i) - element_at($a, __ad_i - 1) END) END)"
    })
    s = rewriteCall(s, "arrayCumSum", args => {
      require(args.size == 1, "arrayCumSum(arr)")
      val a = args.head
      s"(CASE WHEN size($a) <= 0 THEN ($a) ELSE " +
        s"transform(sequence(1, size($a)), __cs_i -> " +
        s"aggregate(slice($a, 1, __cs_i), element_at($a, 1) - " +
        s"element_at($a, 1), (__cs_acc, __cs_x) -> __cs_acc + __cs_x)) END)"
    })
    // arrayCumSumNonNegative: the clamped scan f_i = max(0, f_{i-1} +
    // x_i) (documented example [1,1,-4,1] → [1,2,0,1]) — the clamp
    // lives INSIDE the fold, so each prefix re-folds with greatest()
    s = rewriteCall(s, "arrayCumSumNonNegative", args => {
      require(args.size == 1, "arrayCumSumNonNegative(arr)")
      val a = args.head
      val zero = s"element_at($a, 1) - element_at($a, 1)"
      s"(CASE WHEN size($a) <= 0 THEN ($a) ELSE " +
        s"transform(sequence(1, size($a)), __cn_i -> " +
        s"aggregate(slice($a, 1, __cn_i), $zero, " +
        s"(__cn_acc, __cn_x) -> greatest(__cn_acc + __cn_x, $zero))) END)"
    })
    // array rotation: wrap-around slice composition, exact for any n
    // (pmod handles negatives = the server's opposite-direction law);
    // empty arrays pass through, NULL arrays stay NULL via slice/size
    def rotateLeft(a: String, n: String): String = {
      val k = s"pmod($n, size($a))"
      s"(CASE WHEN size($a) <= 0 THEN ($a) ELSE concat(" +
        s"slice($a, $k + 1, size($a) - $k), slice($a, 1, $k)) END)"
    }
    s = rewriteCall(s, "arrayRotateLeft", args => {
      require(args.size == 2, "arrayRotateLeft(arr, n)")
      rotateLeft(args(0), args(1))
    })
    s = rewriteCall(s, "arrayRotateRight", args => {
      require(args.size == 2, "arrayRotateRight(arr, n)")
      rotateLeft(args(0), s"-(${args(1)})")
    })
    // named arithmetic forms (divide is ALWAYS Float64 on the server)
    s = rewriteCall(s, "plus", args => s"((${args(0)}) + (${args(1)}))")
    s = rewriteCall(s, "minus", args => s"((${args(0)}) - (${args(1)}))")
    s = rewriteCall(s, "multiply", args => s"((${args(0)}) * (${args(1)}))")
    s = rewriteCall(s, "divide", args =>
      s"(cast((${args(0)}) as double) / (${args(1)}))")
    s = rewriteCall(s, "negate", args => s"(-(${args.head}))")
    // IEEE classification: NaN fails every ordered comparison and
    // Spark's NaN-as-largest ordering never enters (abs(x) <= maxDouble
    // is an ordinary comparison), so NaN → false on both forms, exactly
    // the server's isFinite/isInfinite
    s = rewriteCall(s, "isFinite", args =>
      s"(abs(cast((${args.head}) as double)) <= cast('1.7976931348623157E308' as double))")
    s = rewriteCall(s, "isInfinite", args =>
      s"(abs(cast((${args.head}) as double)) = cast('Infinity' as double))")
    s = rewriteCall(s, "ifNotFinite", args =>
      s"(CASE WHEN abs(cast((${args(0)}) as double)) <= " +
        s"cast('1.7976931348623157E308' as double) THEN (${args(0)}) " +
        s"ELSE (${args(1)}) END)")
    // single-bit tests ((a >> i) & 1 — the server's law; bitTestAll/Any
    // fold over literal or expression positions). Emitted as the
    // shiftright FUNCTION, not the `>>` operator: Spark's ANTLR parser
    // spuriously rejects `>>` once the surrounding statement is complex
    // enough (found by FnFuzzSpec round 16 — `((a >> 1) & 1)` parses
    // alone but fails at the tail of a ~2.4KB nested select list).
    s = rewriteCall(s, "bitTest", args =>
      s"((shiftright(${args(0)}, ${args(1)})) & 1)")
    s = rewriteCall(s, "bitTestAll", args => {
      require(args.size >= 2, "bitTestAll(a, i1, ...)")
      args.tail.map(i => s"((shiftright(${args.head}, $i)) & 1) = 1")
        .mkString("(CASE WHEN ", " AND ", " THEN 1 ELSE 0 END)")
    })
    s = rewriteCall(s, "bitTestAny", args => {
      require(args.size >= 2, "bitTestAny(a, i1, ...)")
      args.tail.map(i => s"((shiftright(${args.head}, $i)) & 1) = 1")
        .mkString("(CASE WHEN ", " OR ", " THEN 1 ELSE 0 END)")
    })
    // roundToExp2 on the integral domain (exact highestOneBit law;
    // float inputs reject at the expression's type check — the server's
    // float law works on the exponent field, not pinnable offline)
    s = rewriteCall(s, "roundToExp2", args => {
      require(args.size == 1, "roundToExp2(x)")
      s"graft_rexp2(${args.head})"
    })
    // codepoint-law string forms riding Spark's own codepoint semantics
    s = rewriteCall(s, "positionUTF8", args => {
      require(args.size == 2, "positionUTF8: (haystack, needle) only")
      s"locate(${args(1)}, ${args(0)})"
    })
    s = rewriteCall(s, "leftUTF8", args => s"left(${args.mkString(", ")})")
    s = rewriteCall(s, "rightUTF8", args => s"right(${args.mkString(", ")})")
    // URL family: the server's byte-scan laws as anchored regexes
    // (scheme = RFC 3986 ALPHA *(ALPHA/DIGIT/+/-/.); host chars stop at
    // :/?#@; doc-example boundary values pinned in DifferentialSpec).
    // regexp_extract returns '' on no match — the server's empty-string
    // default for every member of this family.
    // userinfo may carry ':' (user:pw@) and nest '@' pathologically —
    // the server keeps the host after the LAST '@' before the path
    val urlHost = "'^(?:[A-Za-z][A-Za-z0-9+.-]*://)?(?:[^/@?#]*@)*([A-Za-z0-9._-]+)'"
    s = rewriteCall(s, "protocol", args =>
      s"regexp_extract(${args.head}, '^([A-Za-z][A-Za-z0-9+.-]*):', 1)")
    s = rewriteCall(s, "domainWithoutWWW", args =>
      s"regexp_replace(regexp_extract(${args.head}, $urlHost, 1), '^www\\\\.', '')")
    s = rewriteCall(s, "domain", args =>
      s"regexp_extract(${args.head}, $urlHost, 1)")
    // TLD = the last dot-separated label of the host, requiring a letter
    // (the server returns '' for IPs and dotless hosts)
    s = rewriteCall(s, "topLevelDomain", args =>
      s"regexp_extract(regexp_extract(${args.head}, $urlHost, 1), " +
        s"'\\\\.((?=[A-Za-z0-9-]*[A-Za-z])[A-Za-z0-9-]+)$$', 1)")
    s = rewriteCall(s, "pathFull", args =>
      s"regexp_extract(${args.head}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)', 1)")
    s = rewriteCall(s, "path", args =>
      s"regexp_extract(${args.head}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)")
    s = rewriteCall(s, "queryString", args =>
      s"regexp_extract(${args.head}, '\\\\?([^#]*)', 1)")
    s = rewriteCall(s, "fragment", args =>
      s"regexp_extract(${args.head}, '#(.*)$$', 1)")
    s = rewriteCall(s, "cutQueryString", args =>
      s"regexp_replace(${args.head}, '\\\\?[^#]*', '')")
    s = rewriteCall(s, "extractURLParameter", args => {
      require(args.size == 2, "extractURLParameter(url, 'name')")
      val name = stringLiteral(args(1)).getOrElse(
        throw new IllegalArgumentException(
          "extractURLParameter: the parameter name must be a string literal"))
      s"regexp_extract(${args.head}, '[?&]${escapeRegexLiteral(name)}=([^&#]*)', 1)"
    })
    // extractGroups(haystack, pattern): the FIRST match's capture
    // groups as an array (the documented example law); the pattern
    // must be a literal with ≥1 group (the server errors on
    // group-free patterns — so does the translator). No match →
    // empty array (chosen instance consistent with extract's
    // ''-default; not spec-pinned).
    s = rewriteCall(s, "extractGroups", args => {
      require(args.size == 2, "extractGroups(haystack, 'pattern')")
      val lit = stringLiteral(args(1)).getOrElse(
        throw new IllegalArgumentException(
          "extractGroups: the pattern must be a string literal"))
      val n = captureGroupCount(lit)
      require(n >= 1,
        "extractGroups: the pattern must contain at least one capture " +
          "group (the server errors otherwise)")
      val groups = (1 to n)
        .map(g => s"regexp_extract(${args.head}, ${args(1)}, $g)")
        .mkString(", ")
      s"(CASE WHEN regexp_like(${args.head}, ${args(1)}) " +
        s"THEN array($groups) ELSE array() END)"
    })
    // multiSearchAny(haystack, ['n1', ...]): 1 when ANY needle is a
    // substring (byte search ≡ char search for valid-UTF-8 needles);
    // NULL haystack propagates. Needles must be a literal array —
    // the bracket dialect may already have rewritten [..] to array(..),
    // so both spellings parse here.
    s = rewriteCall(s, "multiSearchAny", args => {
      require(args.size == 2, "multiSearchAny(haystack, [needles...])")
      val t = args(1).trim
      val inner =
        if (t.startsWith("[") && t.endsWith("]")) t.substring(1, t.length - 1)
        else if (t.toLowerCase.startsWith("array(") && t.endsWith(")"))
          t.substring(6, t.length - 1)
        else throw new IllegalArgumentException(
          "multiSearchAny: needles must be a literal array of strings")
      val needles = parseArgs(inner + ")", 0)._1.map(_.trim).map(n =>
        stringLiteral(n).getOrElse(throw new IllegalArgumentException(
          s"multiSearchAny: needles must be string literals (got $n)")))
      require(needles.nonEmpty, "multiSearchAny: at least one needle")
      val any = needles.map(n => s"instr(${args.head}, '$n') > 0")
        .mkString(" OR ")
      s"(CASE WHEN (${args.head}) IS NULL THEN NULL " +
        s"WHEN $any THEN 1 ELSE 0 END)"
    })
    // hasToken(haystack, 'token'): token = maximal run between
    // non-alphanumeric ASCII separators (the documented tokenizer law);
    // the needle must itself be one alphanumeric token — the server
    // errors otherwise, and so does the translator.
    s = rewriteCall(s, "hasToken", args => {
      require(args.size == 2, "hasToken(haystack, 'token')")
      val tok = stringLiteral(args(1)).getOrElse(
        throw new IllegalArgumentException(
          "hasToken: the token must be a string literal"))
      require(tok.nonEmpty && tok.forall(c => c.isLetterOrDigit && c < 128),
        s"hasToken: '$tok' is not a single alphanumeric ASCII token — " +
          "the server errors on needles containing separators")
      s"(CASE WHEN (${args.head}) IS NULL THEN NULL " +
        s"WHEN (${args.head}) rlike " +
        s"'(^|[^A-Za-z0-9])$tok([^A-Za-z0-9]|$$)' THEN 1 ELSE 0 END)"
    })
    // round-16 URL additions (same byte-scan regex family):
    // cutFragment drops from the first '#'; cutQueryStringAndFragment
    // from the first '?' or '#'; netloc is everything between the
    // optional scheme and the first /?# (userinfo+host+port, the
    // documented example paul@www.example.com:80); port() extracts the
    // :digits suffix of the host with the server's 0 default (or the
    // caller's literal default in the 2-arg form)
    // RFC 3986 percent-encoding family (round 17 — GraftUrlCodec laws:
    // unreserved set per the RFC, uppercase hex, UTF-8 bytes; the Form
    // variants add the space↔'+' mapping; malformed %-sequences reject
    // loudly at decode)
    s = rewriteCall(s, "encodeURLComponent", args => {
      require(args.size == 1, "encodeURLComponent(s)")
      s"graft_encurl(${args.head})"
    })
    s = rewriteCall(s, "decodeURLComponent", args => {
      require(args.size == 1, "decodeURLComponent(s)")
      s"graft_decurl(${args.head})"
    })
    s = rewriteCall(s, "encodeURLFormComponent", args => {
      require(args.size == 1, "encodeURLFormComponent(s)")
      s"graft_encurlf(${args.head})"
    })
    s = rewriteCall(s, "decodeURLFormComponent", args => {
      require(args.size == 1, "decodeURLFormComponent(s)")
      s"graft_decurlf(${args.head})"
    })
    s = rewriteCall(s, "cutFragment", args =>
      s"regexp_replace(${args.head}, '#.*$$', '')")
    s = rewriteCall(s, "cutQueryStringAndFragment", args =>
      s"regexp_replace(${args.head}, '[?#].*$$', '')")
    s = rewriteCall(s, "netloc", args =>
      s"regexp_extract(${args.head}, " +
        s"'^(?:[A-Za-z][A-Za-z0-9+.-]*://)?([^/?#]*)', 1)")
    s = rewriteCall(s, "port", args => {
      require(args.size == 1 || args.size == 2, "port(url[, default])")
      val dflt = if (args.size == 2) {
        require(raw"^\d+$$".r.findFirstIn(args(1).trim).isDefined,
          "port: the default must be an integer literal")
        args(1).trim
      } else "0"
      s"cast(coalesce(nullif(regexp_extract(${args.head}, " +
        s"'^(?:[A-Za-z][A-Za-z0-9+.-]*://)?(?:[^/@?#]*@)*" +
        s"[A-Za-z0-9._-]+:(\\\\d+)', 1), ''), '$dflt') as int)"
    })
    // Remaining JSON forms: JSONExtractString/Int/Float/Bool/JSONHas
    // already map via get_json_object (round 11, literal-key-validated,
    // LATER in this pipeline — do NOT re-add them here, the earlier
    // rule would shadow the mapping: the round-14 ordering law).
    //
    // simpleJSON*/visitParam* (round 16): the server's DOCUMENTED
    // byte-scanner law as codegen kernels (graft.functions
    // .GraftSimpleJson — needle `"name":`, first occurrence, per-type
    // front-read extractors; laws + boundary pins in the scaladoc and
    // SimpleJsonSpec). visitParam* are the server's documented aliases.
    for ((suffix, fn) <- Seq(
      "Has" -> "graft_sj_has",
      "ExtractUInt" -> "graft_sj_uint",
      "ExtractInt" -> "graft_sj_int",
      "ExtractFloat" -> "graft_sj_float",
      "ExtractBool" -> "graft_sj_bool",
      "ExtractRaw" -> "graft_sj_raw",
      "ExtractString" -> "graft_sj_string");
      spelling <- Seq("simpleJSON" + suffix, "visitParam" + suffix))
      s = rewriteCall(s, spelling, args => {
        require(args.size == 2, s"$spelling(json, 'name')")
        s"$fn(${args(0)}, ${args(1)})"
      })
    // JSONLength: array element count / object key count, 0 for
    // scalars, missing paths, and invalid JSON (the simdjson family's
    // 0-default). Spark's json_array_length/json_object_keys return
    // NULL outside their own shape, so the coalesce chain IS the
    // polymorphic dispatch. Path keys ride the round-11 literal-key
    // get_json_object contract (lenient-parser caveat shared with the
    // whole JSONExtract family).
    s = rewriteCall(s, "JSONLength", args => {
      require(args.nonEmpty, "JSONLength(json[, keys...])")
      val target =
        if (args.size == 1) args.head
        else {
          val keys = args.tail.map(k => stringLiteral(k).getOrElse(
            throw new IllegalArgumentException(
              "JSONLength: keys must be string literals")))
          s"get_json_object(${args.head}, '$$.${keys.mkString(".")}')"
        }
      s"cast(coalesce(json_array_length($target), " +
        s"size(json_object_keys($target)), 0) as bigint)"
    })
    // JSONExtractKeys: object key list, [] outside the object shape
    // (the simdjson family's empty default; same literal-key path
    // contract as JSONLength)
    s = rewriteCall(s, "JSONExtractKeys", args => {
      require(args.nonEmpty, "JSONExtractKeys(json[, keys...])")
      val target =
        if (args.size == 1) args.head
        else {
          val keys = args.tail.map(k => stringLiteral(k).getOrElse(
            throw new IllegalArgumentException(
              "JSONExtractKeys: keys must be string literals")))
          s"get_json_object(${args.head}, '$$.${keys.mkString(".")}')"
        }
      s"coalesce(json_object_keys($target), array())"
    })
    // JSONExtractRaw still has NO composition: get_json_object unquotes
    // string values, so the raw (quote-preserving) form cannot be
    // rebuilt without re-escaping lies — reject loudly. (The scanner
    // law's raw form IS available as simpleJSONExtractRaw.)
    s = rewriteCall(s, "JSONExtractRaw", _ => throw new IllegalArgumentException(
      "JSONExtractRaw is not supported by the embedded engine (" +
        "get_json_object unquotes string values, so the quote-preserving " +
        "raw form is not expressible) — use simpleJSONExtractRaw's " +
        "scanner law or run against a real server"))
    // firstSignificantSubdomain family (round 16): the DEFAULT variants
    // follow the server's documented 4-name heuristic (significant =
    // the label before the last label, stepping one deeper when that
    // label is com/net/org/co) — no public-suffix list involved; the
    // PSL is only needed by the *Custom variants, which keep rejecting
    // at the unknown-function surface. Host extraction mirrors the
    // domain() law above.
    s = rewriteCall(s, "firstSignificantSubdomain", args => {
      require(args.size == 1, "firstSignificantSubdomain(url)")
      s"graft_fsd(${args.head}, false)"
    })
    s = rewriteCall(s, "cutToFirstSignificantSubdomain", args => {
      require(args.size == 1, "cutToFirstSignificantSubdomain(url)")
      s"graft_fsd(${args.head}, true)"
    })
    // ---- end round-15 sweep-2 wave -------------------------------------
    // extended string family (UTF8 variants = Spark's codepoint semantics)
    s = rewriteCall(s, "leftPadUTF8", args => s"lpad(${args.mkString(", ")})")
    s = rewriteCall(s, "rightPadUTF8", args => s"rpad(${args.mkString(", ")})")
    s = rewriteCall(s, "reverseUTF8", args => s"reverse(${args.head})")
    s = rewriteCall(s, "leftPad", args => s"lpad(${args.mkString(", ")})")
    s = rewriteCall(s, "rightPad", args => s"rpad(${args.mkString(", ")})")
    s = rewriteCall(s, "trimLeft", args => s"ltrim(${args.head})")
    s = rewriteCall(s, "trimRight", args => s"rtrim(${args.head})")
    s = rewriteCall(s, "isNaN", args => s"isnan(${args.head})")
    // -OrNull combinator: NULL when the aggregate accumulated nothing.
    // sum/avg/min/max/any/anyLast already return NULL on an empty or
    // all-NULL input in Spark — the combinator strips to the base
    // aggregate (whose own rewrites below then apply). count/uniq
    // return 0 there, so those wrap in nullif.
    for (f <- Seq("sum", "avg", "min", "max", "any", "anyLast",
      "argMax", "argMin"))
      s = rewriteCall(s, f + "OrNull", args => s"$f(${args.mkString(", ")})")
    for (f <- Seq("count", "uniq", "uniqExact"))
      s = rewriteCall(s, f + "OrNull", args => s"nullif($f(${
        if (args.isEmpty) "*" else args.mkString(", ")}), 0)")
    // -OrDefault: the RETURN TYPE's default when nothing accumulated —
    // derivable from text only where that type is fixed by the function
    // (count/uniq already 0; sum/avg numeric 0). min/max/any carry the
    // argument's type, whose default (''/1970-01-01/0) the translator
    // cannot know — those reject by name below, never a silent 0.
    for (f <- Seq("count", "uniq", "uniqExact"))
      s = rewriteCall(s, f + "OrDefault", args => s"$f(${
        if (args.isEmpty) "*" else args.mkString(", ")})")
    s = rewriteCall(s, "sumOrDefault",
      args => s"coalesce(sum(${args.mkString(", ")}), 0)")
    s = rewriteCall(s, "avgOrDefault",
      args => s"coalesce(avg(${args.mkString(", ")}), 0.0)")
    mapOutsideStrings(s) { seg =>
      raw"(?i)\b([A-Za-z_][A-Za-z0-9_]*)OrDefault\s*\(".r.findFirstMatchIn(seg)
        .foreach { m =>
          throw new IllegalArgumentException(
            s"${m.group(1)}OrDefault is not supported by the embedded " +
              "engine: the default is the ARGUMENT type's zero value " +
              "(0 / '' / 1970-01-01), which the translator cannot derive " +
              s"from text — write coalesce(${m.group(1)}(x), <default>) " +
              "explicitly or run against a real server")
        }
      seg
    }
    // sumMap/minMap/maxMap map since round 16 (ChMapAgg, LATER in this
    // pipeline). The zero-total ambiguity that used to reject the whole
    // family BY NAME (offline docs are ambiguous on whether zero-total
    // keys drop) is now a loud EVAL-TIME reject on exactly the
    // ambiguous instance — a zero folded total — so the common nonzero
    // case works and no silently divergent instance is ever picked
    // (the gcd(0,0) pattern). sumMapWithOverflow maps since round 17:
    // its law is wrapping at the value's own width (same-type result,
    // no promotion) — ChMapAgg.SumOv wraps the Long fold at the
    // declared-unsigned or resolved element width.
    s = rewriteCall(s, "sumMapWithOverflow", args => args.size match {
      case 2 => s"graft_summap_ov(${args(0)}, ${args(1)})"
      case 1 => s"graft_summap_ov(map_keys(${args.head}), " +
        s"map_values(${args.head}))"
      case n => throw new IllegalArgumentException(
        s"sumMapWithOverflow takes (keys_array, values_array) or (map)" +
          s" — got $n arguments")
    })
    // avgWeighted(x, w) = Σ(x·w)/Σ(w) — the exact closed form (the
    // server computes Float64 the same way; all-NULL/zero-weight groups
    // give NULL via the division, matching the server's nan→NULL edge
    // under the repo's NULL-for-undefined convention). The denominator
    // is guarded on the VALUE's nullness: ClickHouse skips the whole
    // row of a multi-argument aggregate when any argument is NULL, so a
    // NULL x must not contribute its weight (ADVICE r14 — Spark's
    // sum(w) alone would still count that row's weight)
    s = rewriteCall(s, "avgWeighted", args => {
      require(args.size == 2, "avgWeighted takes (value, weight)")
      val (x, w) = (args(0), args(1))
      // numerator needs no guard: x*w is NULL (sum-skipped) when either
      // side is; the CASE yields NULL for a NULL w too, so both sides
      // drop exactly the rows the server drops
      s"(sum(cast(($x) as double) * ($w)) / " +
        s"sum(CASE WHEN ($x) IS NOT NULL THEN cast(($w) as double) END))"
    })
    // deltaSum: sum of positive consecutive differences — inherently
    // ORDER-dependent, and Spark aggregation order is unspecified: loud
    // reject (the window spelling sum(greatest(x - lag(x), 0)) OVER (...)
    // expresses it deterministically)
    s = rewriteCall(s, "deltaSum", _ => throw new IllegalArgumentException(
      "deltaSum is order-dependent and Spark aggregation order is " +
        "unspecified — spell it as sum(greatest(x - lagInFrame(x) OVER " +
        "(ORDER BY ...), 0)) over an explicit ordering"))
    // any/anyLast: the server keeps "some" value — min/max are legal
    // instances, reproducibly (the Summing-representative rule). The
    // quantified-subquery form `= any(SELECT ...)` is NOT the aggregate
    // — reconstruct it untouched.
    s = rewriteCall(s, "anyLast", args => s"max(${args.head})")
    // a subquery argument — bare `SELECT ...` OR parenthesized
    // `(SELECT ...)` (any depth of wrapping parens) — marks the
    // quantified form; rewriting it to min() would silently turn IN
    // semantics into an equality against the subquery minimum
    // only strip an outer pair when the '(' at index 0 MATCHES the ')'
    // at the end — '(SELECT max(x) FROM t) - (SELECT min(x) FROM t)' is
    // an expression, not a wrapped subquery (advisor r12)
    def strippable(t: String): Boolean = {
      if (!(t.startsWith("(") && t.endsWith(")"))) return false
      var depth = 0
      var inSq = false
      var i = 0
      while (i < t.length) {
        val c = t.charAt(i)
        if (inSq) { if (c == '\\') i += 1 else if (c == '\'') inSq = false }
        else c match {
          case '\'' => inSq = true
          case '(' => depth += 1
          case ')' =>
            depth -= 1
            if (depth == 0 && i < t.length - 1) return false
          case _ => ()
        }
        i += 1
      }
      depth == 0
    }
    def isSubqueryArg(a: String): Boolean = {
      var t = a.trim
      while (strippable(t)) t = t.substring(1, t.length - 1).trim
      t.toUpperCase.startsWith("SELECT")
    }
    s = rewriteCall(s, "any", args =>
      if (args.size == 1 && !isSubqueryArg(args.head))
        s"min(${args.head})"
      else s"any(${args.mkString(", ")})")
    // date partition keys (toYYYYMM and friends — the canonical
    // partition_by expressions): closed-form integer arithmetic
    s = rewriteCall(s, "toYYYYMM",
      args => s"(year(${args.head}) * 100 + month(${args.head}))")
    s = rewriteCall(s, "toYYYYMMDD",
      args => s"(year(${args.head}) * 10000 + month(${args.head}) * 100 + " +
        s"dayofmonth(${args.head}))")
    // JSON extraction family → get_json_object with a $.-path built
    // from the LITERAL key arguments; non-literal or empty keys REJECT
    // at translate time — never a silently wrong path
    def jsonPath(keys: Seq[String]): String = {
      require(keys.nonEmpty, "JSONExtract*: at least one key is required")
      val lits = keys.map(_.trim).map { k =>
        require(k.length >= 3 && k.startsWith("'") && k.endsWith("'") &&
          !k.substring(1, k.length - 1).contains("'"),
          s"JSONExtract*: keys must be string literals (got $k)")
        k.substring(1, k.length - 1)
      }
      "'$." + lits.mkString(".") + "'"
    }
    s = rewriteCall(s, "JSONExtractString",
      args => s"get_json_object(${args.head}, ${jsonPath(args.tail)})")
    s = rewriteCall(s, "JSONExtractInt",
      args => s"cast(get_json_object(${args.head}, ${jsonPath(args.tail)}) as bigint)")
    s = rewriteCall(s, "JSONExtractFloat",
      args => s"cast(get_json_object(${args.head}, ${jsonPath(args.tail)}) as double)")
    s = rewriteCall(s, "JSONExtractBool",
      args => s"cast(get_json_object(${args.head}, ${jsonPath(args.tail)}) as boolean)")
    s = rewriteCall(s, "JSONHas",
      args => s"(get_json_object(${args.head}, ${jsonPath(args.tail)}) IS NOT NULL)")
    // -If combinator aggregates → Spark FILTER clauses (identical
    // semantics: the aggregate sees only rows passing the condition)
    s = rewriteCall(s, "sumIf",
      args => s"sum(${args(0)}) FILTER (WHERE ${args(1)})")
    s = rewriteCall(s, "avgIf",
      args => s"avg(${args(0)}) FILTER (WHERE ${args(1)})")
    s = rewriteCall(s, "minIf",
      args => s"min(${args(0)}) FILTER (WHERE ${args(1)})")
    s = rewriteCall(s, "maxIf",
      args => s"max(${args(0)}) FILTER (WHERE ${args(1)})")
    // countIf(cond) and countIf(x, cond) — the 2-arg combinator form
    // counts non-NULL x over rows passing cond
    s = rewriteCall(s, "countIf", args =>
      if (args.size >= 2) s"count(${args(0)}) FILTER (WHERE ${args(1)})"
      else s"count_if(${args.head})")
    // generic -If combinators beyond the arithmetic four: the LAST
    // argument is the condition, everything before it feeds the base
    // aggregate (argMaxIf(a, v, cond) keeps both value args). The base
    // maps per its own rule: any→min / anyLast→max (the deterministic
    // legal instances), uniq*→exact COUNT(DISTINCT), groupArray→
    // collect_list, groupUniqArray→collect_set.
    for ((ch, spark) <- Seq(
      "anyIf" -> "min", "anyLastIf" -> "max",
      "argMaxIf" -> "max_by", "argMinIf" -> "min_by",
      "groupArrayIf" -> "collect_list", "groupUniqArrayIf" -> "collect_set"))
      s = rewriteCall(s, ch, args => {
        require(args.size >= 2, s"$ch: needs value args plus a condition")
        s"$spark(${args.init.mkString(", ")}) FILTER (WHERE ${args.last})"
      })
    for (ch <- Seq("uniqIf", "uniqExactIf", "uniqCombinedIf", "uniqHLL12If"))
      s = rewriteCall(s, ch, args => {
        require(args.size >= 2, s"$ch: needs value args plus a condition")
        s"count(DISTINCT ${args.init.mkString(", ")}) FILTER (WHERE ${args.last})"
      })
    // -Distinct combinator: each value counted once. Identity for
    // min/max; DISTINCT-qualified base for the accumulating aggregates.
    s = rewriteCall(s, "sumDistinct", args => s"sum(DISTINCT ${args.head})")
    s = rewriteCall(s, "avgDistinct", args => s"avg(DISTINCT ${args.head})")
    s = rewriteCall(s, "minDistinct", args => s"min(${args.head})")
    s = rewriteCall(s, "maxDistinct", args => s"max(${args.head})")
    s = rewriteCall(s, "groupUniqArrayDistinct",
      args => s"collect_set(${args.head})")
    // -Array combinators: the aggregate runs over ALL ELEMENTS of the
    // array arguments across the group. min/max distribute over a
    // per-row array_min/array_max; sum/avg fold each row's elements
    // first (the fold's zero is `first_element * 0` — the ELEMENT type's
    // zero, which a text rewrite cannot otherwise name; NULL elements
    // are filtered before the fold, matching the base aggregates'
    // NULL-skipping, and an empty array folds to NULL, which the outer
    // aggregate skips — exactly "contributes no elements").
    s = rewriteCall(s, "minArray",
      args => s"min(array_min(${args.head}))")
    s = rewriteCall(s, "maxArray",
      args => s"max(array_max(${args.head}))")
    def arrayElemSum(a: String): String = {
      val nn = s"filter($a, __ar_x -> __ar_x IS NOT NULL)"
      // coalesce: an empty/all-NULL array folds to NULL, which the
      // outer sum would skip — but a group of ONLY empty arrays must
      // yield 0 (the server's sumArray), not NULL
      s"coalesce(aggregate($nn, try_element_at($nn, 1) * 0, " +
        "(__ar_acc, __ar_v) -> __ar_acc + __ar_v), 0)"
    }
    s = rewriteCall(s, "sumArray",
      args => s"sum(${arrayElemSum(args.head)})")
    s = rewriteCall(s, "avgArray", args =>
      s"(sum(${arrayElemSum(args.head)}) / " +
        s"sum(size(filter(${args.head}, __ar_x -> __ar_x IS NOT NULL))))")
    // uniqArray: distinct elements across the group's arrays — exact
    // (legal instance of the approximate-uniq contract); per-row
    // array_distinct bounds the collected payload at each row's
    // distinct set
    s = rewriteCall(s, "uniqArray", args =>
      "cast(size(array_distinct(flatten(collect_list(" +
        s"array_distinct(${args.head}))))) as bigint)")
    s = rewriteCall(s, "uniqExactArray", args =>
      "cast(size(array_distinct(flatten(collect_list(" +
        s"array_distinct(${args.head}))))) as bigint)")
    // groupArrayArray: concatenation of the group's arrays (order
    // unspecified under parallel execution in both engines)
    s = rewriteCall(s, "groupArrayArray",
      args => s"flatten(collect_list(${args.head}))")
    // countArray: total element count across the group's arrays
    s = rewriteCall(s, "countArray",
      args => s"sum(size(${args.head}))")
    // tuples → structs. tupleElement's index form addresses by POSITION,
    // which Spark SQL text cannot express — the embedded session
    // registers graft_tuple_at (a GetStructField builder); the name form
    // maps to ordinary field access.
    s = rewriteCall(s, "tupleElement", args => {
      require(args.size == 2,
        "tupleElement: exactly (tuple, index-or-name) is supported")
      val sel = args(1).trim
      if (sel.startsWith("'") && sel.endsWith("'") && sel.length >= 3)
        s"(${args(0)}).`${sel.substring(1, sel.length - 1)}`"
      else {
        require(sel.forall(_.isDigit) && sel.nonEmpty,
          s"tupleElement: index must be an integer literal or a string " +
            s"literal name (got $sel)")
        s"graft_tuple_at(${args(0)}, $sel)"
      }
    })
    // uniq/uniqExact as plain aggregates: exact COUNT(DISTINCT) — for
    // uniq a documented improvement over the server's approximation
    // (same choice as the exact uniqMerge state path). The other
    // approximate-distinct family members carry the SAME contract
    // ("approximately computes the number of distinct values"), so the
    // exact answer is a legal instance of each — never a silent delta.
    s = rewriteCall(s, "uniqExact",
      args => s"count(DISTINCT ${args.mkString(", ")})")
    s = rewriteCall(s, "uniqCombined64",
      args => s"count(DISTINCT ${args.mkString(", ")})")
    s = rewriteCall(s, "uniqCombined",
      args => s"count(DISTINCT ${args.mkString(", ")})")
    s = rewriteCall(s, "uniqHLL12",
      args => s"count(DISTINCT ${args.mkString(", ")})")
    s = rewriteCall(s, "uniqTheta",
      args => s"count(DISTINCT ${args.mkString(", ")})")
    s = rewriteCall(s, "uniq",
      args => s"count(DISTINCT ${args.mkString(", ")})")
    // multiIf(c1, v1, ..., [else]) → CASE WHEN chain
    s = rewriteCall(s, "multiIf", args => {
      val pairs = args.grouped(2).toSeq
      val whens = pairs.takeWhile(_.size == 2)
        .map(p => s"WHEN ${p(0)} THEN ${p(1)}").mkString(" ")
      val els = if (args.size % 2 == 1) s" ELSE ${args.last}" else ""
      s"(CASE $whens$els END)"
    })
    // empty/notEmpty are polymorphic (strings AND arrays) like length
    s = rewriteCall(s, "empty", args => s"(graft_length(${args.head}) = 0)")
    s = rewriteCall(s, "notEmpty", args => s"(graft_length(${args.head}) > 0)")
    // arrayEnumerate(arr) → [1, 2, ..., length] via indexed transform
    // (sequence(1, size(a)) would emit a DESCENDING [1, 0] on empty
    // arrays instead of [])
    s = rewriteCall(s, "arrayEnumerate",
      args => s"transform(${args.head}, (__ae_x, __ae_i) -> __ae_i + 1)")
    // arrayStringConcat(arr[, sep]) → array_join (server default sep '')
    s = rewriteCall(s, "arrayStringConcat", args =>
      if (args.size >= 2) s"array_join(${args(0)}, ${args(1)})"
      else s"array_join(${args.head}, '')")
    // arraySlice(arr, offset[, length]) → slice; omitted length = to the
    // end (size() is a safe upper bound in both engines)
    s = rewriteCall(s, "arraySlice", args =>
      if (args.size >= 3) s"slice(${args(0)}, ${args(1)}, ${args(2)})"
      else s"slice(${args(0)}, ${args(1)}, size(${args(0)}))")
    // AggregatingMergeTree combinators: -State writes produce the
    // transparent storage representation (ClickHouseType.aggStateType),
    // -Merge reads combine partial states. avg keeps exact integer
    // sum/count (single-division rational on read — hash-stable);
    // uniq is exact over xxhash64 values.
    s = rewriteCall(s, "avgState",
      args => s"named_struct('s', sum(${args.head}), 'c', count(${args.head}))")
    s = rewriteCall(s, "avgMerge",
      args => s"(sum((${args.head}).s) / sum((${args.head}).c))")
    s = rewriteCall(s, "uniqState",
      args => s"collect_set(xxhash64(${args.head})) " +
        s"FILTER (WHERE (${args.head}) IS NOT NULL)")
    s = rewriteCall(s, "uniqExactState",
      args => s"collect_set(xxhash64(${args.head})) " +
        s"FILTER (WHERE (${args.head}) IS NOT NULL)")
    s = rewriteCall(s, "uniqMerge",
      args => s"cast(size(array_distinct(flatten(collect_list(${args.head})))) as bigint)")
    s = rewriteCall(s, "uniqExactMerge",
      args => s"cast(size(array_distinct(flatten(collect_list(${args.head})))) as bigint)")
    s = rewriteCall(s, "sumState", args => s"sum(${args.head})")
    s = rewriteCall(s, "sumMerge", args => s"sum(${args.head})")
    s = rewriteCall(s, "countState",
      args => if (args.isEmpty) "count(1)" else s"count(${args.head})")
    s = rewriteCall(s, "countMerge", args => s"sum(${args.head})")
    s = rewriteCall(s, "minState", args => s"min(${args.head})")
    s = rewriteCall(s, "minMerge", args => s"min(${args.head})")
    s = rewriteCall(s, "maxState", args => s"max(${args.head})")
    s = rewriteCall(s, "maxMerge", args => s"max(${args.head})")
    // anyState: the server keeps "any one" value — min is a legal any,
    // reproducibly (same rule as the Summing non-summed columns)
    s = rewriteCall(s, "anyState", args => s"min(${args.head})")
    s = rewriteCall(s, "anyMerge", args => s"min(${args.head})")
    // parameterized aggregate: quantileExactInclusive(p)(x) →
    // percentile(x, p) (percentile_cont semantics in both)
    s = rewriteParamCall(s, "quantileExactInclusive",
      (params, args) => s"percentile(${args.head}, ${params.head})")
    // plural form: quantilesExactInclusive(p1, p2, ...)(x) → one
    // percentile call with an array of fractions (single sort, array out)
    s = rewriteParamCall(s, "quantilesExactInclusive",
      (params, args) =>
        s"percentile(${args.head}, array(${params.mkString(", ")}))")
    // Exact nearest-rank quantiles — full materialization per group,
    // exactly like the server's quantileExact family (it sorts the whole
    // value set too). Spark has no non-interpolating percentile, so the
    // honest mapping is an explicit sorted-array pick. Per ClickHouse
    // QuantileExact.h, ALL THREE nearest-rank variants use the same
    // 0-based index floor(p*n) (1-based rank floor(p*n)+1, clamped) for
    // p != 0.5; they differ only in the median special case:
    //  - quantileExact(p)(x): rank floor(p*n)+1 everywhere (its p=0.5
    //    truncation already lands on the upper middle for even n);
    //  - quantileExactLow(0.5): LOWER of the two middles (rank ceil(n/2),
    //    python median_low) — the CASE below compares p at runtime;
    //  - quantileExactHigh(0.5): upper middle rank floor(n/2)+1, which
    //    equals floor(0.5*n)+1 for every n — numerically identical to
    //    quantileExact, mapped to the same pick;
    //  - medianExact(x) = quantileExact(0.5)(x).
    // quantileExactExclusive is the Excel PERCENTILE.EXC interpolation
    // (h = p*(n+1), clamped to the ends), Float64 result like the server.
    // NULLs skip (collect_list drops them; n counts non-NULL), all-NULL
    // groups return NULL. quantileExactInclusive stays the interpolating
    // percentile mapping above — different server function, different
    // semantics, never conflated.
    def exactRank(x: String, rank: String): String = {
      val n = s"count($x)"
      s"CASE WHEN $n = 0 THEN NULL ELSE element_at(sort_array(" +
        s"collect_list($x)), $rank) END"
    }
    def exactDefaultRank(x: String, p: String): String =
      exactRank(x, s"least(CAST(floor(($p) * count($x)) AS INT) + 1, " +
        s"CAST(count($x) AS INT))")
    def exactLowRank(x: String, p: String): String =
      exactRank(x, s"CASE WHEN ($p) = 0.5 THEN " +
        s"CAST(ceil(count($x) / 2.0) AS INT) " +
        s"ELSE least(CAST(floor(($p) * count($x)) AS INT) + 1, " +
        s"CAST(count($x) AS INT)) END")
    def exactExclusive(x: String, p: String): String = {
      val n = s"count($x)"
      val h = s"(($p) * ($n + 1))"
      val k = s"CAST(floor($h) AS INT)"
      val sorted = s"sort_array(collect_list($x))"
      s"CASE WHEN $n = 0 THEN NULL " +
        s"WHEN $k < 1 THEN CAST(element_at($sorted, 1) AS DOUBLE) " +
        s"WHEN $k >= $n THEN CAST(element_at($sorted, CAST($n AS INT)) AS DOUBLE) " +
        s"ELSE CAST(element_at($sorted, $k) AS DOUBLE) + " +
        s"($h - $k) * (CAST(element_at($sorted, $k + 1) AS DOUBLE) - " +
        s"CAST(element_at($sorted, $k) AS DOUBLE)) END"
    }
    s = rewriteParamCall(s, "quantilesExactExclusive", (params, args) =>
      s"array(${params.map(p => exactExclusive(args.head, p)).mkString(", ")})")
    s = rewriteParamCall(s, "quantilesExactHigh", (params, args) =>
      s"array(${params.map(p => exactDefaultRank(args.head, p)).mkString(", ")})")
    s = rewriteParamCall(s, "quantilesExactLow", (params, args) =>
      s"array(${params.map(p => exactLowRank(args.head, p)).mkString(", ")})")
    s = rewriteParamCall(s, "quantilesExact", (params, args) =>
      s"array(${params.map(p => exactDefaultRank(args.head, p)).mkString(", ")})")
    s = rewriteParamCall(s, "quantileExactExclusive",
      (params, args) => exactExclusive(args.head, params.head))
    s = rewriteParamCall(s, "quantileExactHigh",
      (params, args) => exactDefaultRank(args.head, params.head))
    s = rewriteParamCall(s, "quantileExactLow",
      (params, args) => exactLowRank(args.head, params.head))
    s = rewriteParamCall(s, "quantileExact",
      (params, args) => exactDefaultRank(args.head, params.head))
    s = rewriteCall(s, "medianExact", args => exactDefaultRank(args.head, "0.5"))
    // higher-moment family, closed forms over Spark's population
    // statistics (ClickHouse: kurtPop = µ4/σ⁴ NON-excess, Spark's
    // kurtosis is the EXCESS form; the *Samp variants divide the same
    // population central moment by the UNBIASED σ — the ratio
    // (varPop/varSamp)^(k/2) converts). n=1 groups: Spark yields NULL
    // where a server yields nan — both "no answer", never a value lie.
    s = rewriteCall(s, "kurtPop", args => s"(kurtosis(${args.head}) + 3.0)")
    s = rewriteCall(s, "skewSamp", args =>
      s"(skewness(${args.head}) * " +
        s"pow(var_pop(${args.head}) / var_samp(${args.head}), 1.5))")
    s = rewriteCall(s, "kurtSamp", args =>
      s"((kurtosis(${args.head}) + 3.0) * " +
        s"pow(var_pop(${args.head}) / var_samp(${args.head}), 2.0))")
    // topK(k)(x) / topKWeighted(k)(x, w): exact frequency ranking via the
    // registered graft_topk aggregates ("approximately most frequent" —
    // exact counts are a legal instance; ties rank value-ascending,
    // deterministic where the server's sketch is not). The optional
    // load_factor/counted_rate extra parameters are sketch-accuracy
    // tuning with no exact-result meaning — dropped like the
    // performance-identity SETTINGS.
    s = rewriteParamCall(s, "topKWeighted", (params, args) => {
      require(args.size == 2, "topKWeighted(k)(x, weight)")
      s"graft_topk_w(${args(0)}, ${args(1)}, ${params.head})"
    })
    s = rewriteParamCall(s, "topK", (params, args) => {
      require(args.size == 1, "topK(k)(x)")
      s"graft_topk(${args.head}, ${params.head})"
    })
    // windowFunnel(window[, modes...])(ts, cond1, ...): max funnel
    // level. Default + the three strict modes (each a documented
    // server algorithm — laws in ChWindowFunnel's scaladoc); unknown
    // mode strings reject loudly there, never a silent default-mode
    // answer for a strict-mode question.
    s = rewriteParamCall(s, "windowFunnel", (params, args) => {
      require(params.nonEmpty, "windowFunnel(window[, mode...])(ts, cond...)")
      val w = params.head.trim
      require(raw"^\d+$$".r.findFirstIn(w).isDefined,
        "windowFunnel: the window must be an integer literal")
      val modes = params.tail.map(p => stringLiteral(p).getOrElse(
        throw new IllegalArgumentException(
          "windowFunnel: modes must be string literals")))
      // validate at translate time so typos fail before planning
      graft.functions.ChWindowFunnel.parseModes(modes)
      require(args.size >= 2, "windowFunnel(window)(ts, cond1, ...)")
      s"graft_window_funnel($w, '${modes.mkString(",")}', ${args.mkString(", ")})"
    })
    // sequenceMatch(pattern)(ts, cond...): the subsequence-expressible
    // pattern subset — laws and the supported token set live in
    // ChSequenceMatch's scaladoc; unsupported tokens reject there
    s = rewriteParamCall(s, "sequenceMatch", (params, args) => {
      require(params.size == 1, "sequenceMatch('pattern')(ts, cond...)")
      stringLiteral(params.head).getOrElse(
        throw new IllegalArgumentException(
          "sequenceMatch: the pattern must be a string literal"))
      require(args.size >= 2, "sequenceMatch('pattern')(ts, cond1, ...)")
      s"graft_seq_match(${params.head}, ${args.mkString(", ")})"
    })
    // sequenceCount: the same pattern subset, counting NON-OVERLAPPING
    // matches (a completed chain resets the search after its last event)
    s = rewriteParamCall(s, "sequenceCount", (params, args) => {
      require(params.size == 1, "sequenceCount('pattern')(ts, cond...)")
      stringLiteral(params.head).getOrElse(
        throw new IllegalArgumentException(
          "sequenceCount: the pattern must be a string literal"))
      require(args.size >= 2, "sequenceCount('pattern')(ts, cond1, ...)")
      s"graft_seq_count(${params.head}, ${args.mkString(", ")})"
    })
    // sumMap/minMap/maxMap(keys, values): per-key folds over parallel
    // arrays → the documented (sorted keys, folded values) tuple
    // (ChMapAgg laws: equal-length arrays enforced per row, exact Long
    // folds for integral values)
    for ((ch, fn) <- Seq("sumMap" -> "graft_summap",
      "minMap" -> "graft_minmap", "maxMap" -> "graft_maxmap"))
      s = rewriteCall(s, ch, args => args.size match {
        case 2 => s"$fn(${args(0)}, ${args(1)})"
        // the 1-argument MAP form is the same fold over the map's
        // key/value arrays
        case 1 => s"$fn(map_keys(${args.head}), map_values(${args.head}))"
        case n => throw new IllegalArgumentException(
          s"$ch takes (keys_array, values_array) or (map) — got $n arguments")
      })
    // retention(cond1, ..., condN): r1 = cond1 held on some row;
    // r_i = cond1 held AND cond_i held (independent rows — the
    // documented law), as an array of 0/1
    s = rewriteCall(s, "retention", args => {
      require(args.nonEmpty && args.size <= 32,
        "retention takes 1 to 32 conditions")
      def hit(c: String): String = s"max(CASE WHEN $c THEN 1 ELSE 0 END)"
      val r1 = hit(args.head)
      val rest = args.tail.map(c => s"least($r1, ${hit(c)})")
      s"array(${(r1 +: rest).mkString(", ")})"
    })
    // uniqUpTo(N)(x...): the EXACT count when ≤ N, else N + 1 — that
    // IS the documented law, so the capped exact count is not an
    // approximation stand-in
    s = rewriteParamCall(s, "uniqUpTo", (params, args) => {
      require(params.size == 1, "uniqUpTo(N)(x...)")
      val n = params.head.trim
      require(raw"^\d+$$".r.findFirstIn(n).isDefined,
        "uniqUpTo: N must be an integer literal")
      require(args.nonEmpty, "uniqUpTo(N)(x...)")
      s"least(count(DISTINCT ${args.mkString(", ")}), ${n.toLong + 1})"
    })
    // APPROXIMATE interpolating quantiles (reservoir sampling on the
    // server): the contract is "computes an approximate quantile", so the
    // EXACT interpolated percentile is a legal instance (the uniq rule);
    // deterministic here where the server's sampling is not
    s = rewriteParamCall(s, "quantiles", (params, args) =>
      s"percentile(${args.head}, array(${params.mkString(", ")}))")
    s = rewriteParamCall(s, "quantile",
      (params, args) => s"percentile(${args.head}, ${params.head})")
    s = rewriteCall(s, "median", args => s"percentile(${args.head}, 0.5)")
    // lagInFrame/leadInFrame → lag/lead; Spark REJECTS an explicit frame
    // on offset functions, so the forced full frame our unparser emits is
    // stripped from the OVER clause that follows
    s = rewriteCall(s, "lagInFrame", args => s"lag(${args.mkString(", ")})")
    s = rewriteCall(s, "leadInFrame", args => s"lead(${args.mkString(", ")})")
    s = stripOffsetFrames(s)
    s
  }

  private val FullFrame = " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"

  /** Remove the frame clause from the OVER spec directly following a
    * lag()/lead() call (balanced-paren aware; other windows keep theirs).
    */
  private def stripOffsetFrames(in: String): String = {
    var s = in
    for (fn <- Seq("lag", "lead")) {
      val out = new StringBuilder
      var i = 0
      val pat = fn + "("
      while (i < s.length) {
        val at = s.indexOf(pat, i)
        val boundaryOk = at >= 0 &&
          (at == 0 || !(s.charAt(at - 1).isLetterOrDigit || s.charAt(at - 1) == '_'))
        if (at < 0) { out.append(s.substring(i)); i = s.length }
        else if (!boundaryOk) {
          out.append(s.substring(i, at + pat.length)); i = at + pat.length
        } else {
          val (callEnd, _) = skipBalanced(s, at + pat.length)
          out.append(s.substring(i, callEnd))
          i = callEnd
          val overPrefix = " OVER ("
          if (s.regionMatches(true, i, overPrefix, 0, overPrefix.length)) {
            val (overEnd, overBody) = skipBalanced(s, i + overPrefix.length)
            out.append(" OVER (").append(overBody.replace(FullFrame, "")).append(")")
            i = overEnd
          }
        }
      }
      s = out.result()
    }
    s
  }

  /** From just after an opening '(', return (index past the matching ')',
    * the body between the parens) — quote-aware.
    */
  private def skipBalanced(s: String, start: Int): (Int, String) = {
    var depth = 1
    var i = start
    var inStr = false
    while (i < s.length && depth > 0) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ => ()
      }
      i += 1
    }
    (i, s.substring(start, i - 1))
  }

  /** Rewrite ClickHouse parameterized-aggregate syntax
    * `name(params...)(args...)` via `f(params, args)` (both groups
    * balanced-paren parsed). Calls without the second group pass through.
    */
  private def rewriteParamCall(
      s: String, name: String, f: (Seq[String], Seq[String]) => String): String = {
    val out = new StringBuilder
    var i = 0
    val pat = name + "("
    while (i < s.length) {
      val at = s.indexOf(pat, i)
      val boundaryOk = at >= 0 &&
        (at == 0 || !(s.charAt(at - 1).isLetterOrDigit || s.charAt(at - 1) == '_'))
      if (at < 0) { out.append(s.substring(i)); i = s.length }
      else if (!boundaryOk) { out.append(s.substring(i, at + pat.length)); i = at + pat.length }
      else {
        out.append(s.substring(i, at))
        val (params, afterParams) = parseArgs(s, at + pat.length)
        if (afterParams < s.length && s.charAt(afterParams) == '(') {
          val (args, end) = parseArgs(s, afterParams + 1)
          out.append(f(params, args))
          i = end
        } else {
          out.append(s.substring(at, afterParams))
          i = afterParams
        }
      }
    }
    out.result()
  }

  /** Rewrite every `name(args...)` call via `f(topLevelArgs)`, handling
    * nested parens/quotes in the arguments.
    */
  private def rewriteCall(s: String, name: String, f: Seq[String] => String): String = {
    val out = new StringBuilder
    var i = 0
    val pat = name + "("
    while (i < s.length) {
      val at = s.indexOf(pat, i)
      val boundaryOk = at >= 0 &&
        (at == 0 || !(s.charAt(at - 1).isLetterOrDigit || s.charAt(at - 1) == '_'))
      if (at < 0) { out.append(s.substring(i)); i = s.length }
      else if (!boundaryOk) { out.append(s.substring(i, at + pat.length)); i = at + pat.length }
      else {
        out.append(s.substring(i, at))
        val (args, end) = parseArgs(s, at + pat.length)
        // recurse into the parsed arguments FIRST: the outer call's
        // region swallows any same-name call nested inside it (e.g.
        // CAST(x AS Float64) inside a lambda under an outer CAST), and
        // the left-to-right scan resumes past it — the inner call would
        // otherwise reach Spark untranslated
        out.append(f(args.map(a => rewriteCall(a, name, f))))
        i = end
      }
    }
    out.result()
  }

  /** A parsed top-level `LIMIT n [OFFSET o] BY exprs` clause
    * (ClickHouse's per-group limit): `core` is the statement with the
    * ORDER BY, LIMIT BY, and trailing LIMIT clauses removed; `orderBy`
    * the top-level ORDER BY expression list (the order LIMIT BY selects
    * rows in, per the server's documented semantics); `outerLimit` the
    * trailing plain LIMIT clause verbatim, if any.
    */
  final case class LimitByParts(core: String, n: Long, offset: Long,
      by: String, orderBy: Option[String], outerLimit: Option[String])

  private val LimitByHead = raw"(?is)^LIMIT\s+(\d+)(?:\s+OFFSET\s+(\d+))?\s+BY\s+".r
  private val OrderByHead = raw"(?is)^ORDER\s+BY\s+".r
  private val PlainLimit = raw"(?is)^LIMIT\s+\d+(?:\s+OFFSET\s+\d+)?\s*;?\s*$$".r

  /** Positions of top-level (outside parens/quotes) word-boundary
    * occurrences of `word` (case-insensitive).
    */
  private[client] def topLevelPositions(sql: String, word: String): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    var depth = 0
    var inSq = false
    var inBq = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inSq) { if (c == '\\') i += 1 else if (c == '\'') inSq = false }
      else if (inBq) { if (c == '`') inBq = false }
      else c match {
        case '\'' => inSq = true
        case '`' => inBq = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 &&
            (i == 0 || !(sql.charAt(i - 1).isLetterOrDigit || sql.charAt(i - 1) == '_')) &&
            sql.regionMatches(true, i, word, 0, word.length) &&
            (i + word.length >= sql.length ||
              !(sql.charAt(i + word.length).isLetterOrDigit ||
                sql.charAt(i + word.length) == '_')))
            out += i
      }
      i += 1
    }
    out.result()
  }

  private val ClauseKws =
    Seq("WHERE", "GROUP", "ORDER", "LIMIT", "HAVING", "UNION", "SETTINGS",
      "QUALIFY")

  /** Keywords that end an ORDER BY item list (same nesting level). */
  private val OrderEnders = Seq(
    "LIMIT", "SETTINGS", "UNION", "HAVING", "WINDOW", "ROWS", "RANGE",
    "GROUPS", "FORMAT", "OFFSET")
  private val NullsClause = raw"(?is).*\bNULLS\s+(FIRST|LAST)\s*$$".r
  private val DescTail = raw"(?is).*\bDESC\s*$$".r

  /** Make the server's sort-NULL default explicit on every ORDER BY item
    * (any nesting level — window specs included) that does not already
    * carry a NULLS clause: ASC → NULLS LAST, DESC → NULLS FIRST (NULL is
    * the largest value on a server; Spark defaults the opposite way).
    */
  private def injectNullOrder(in: String): String = {
    val out = new StringBuilder
    var i = 0
    var inSq = false
    var inBq = false
    def wordAt(at: Int, w: String): Boolean =
      (at == 0 || !(in.charAt(at - 1).isLetterOrDigit || in.charAt(at - 1) == '_')) &&
        in.regionMatches(true, at, w, 0, w.length) &&
        (at + w.length >= in.length ||
          !(in.charAt(at + w.length).isLetterOrDigit || in.charAt(at + w.length) == '_'))
    while (i < in.length) {
      val c = in.charAt(i)
      if (inSq) { out.append(c); if (c == '\\') { if (i + 1 < in.length) { out.append(in.charAt(i + 1)); i += 1 } } else if (c == '\'') inSq = false; i += 1 }
      else if (inBq) { out.append(c); if (c == '`') inBq = false; i += 1 }
      else if (c == '\'') { inSq = true; out.append(c); i += 1 }
      else if (c == '`') { inBq = true; out.append(c); i += 1 }
      else if (wordAt(i, "ORDER")) {
        var j = i + 5
        while (j < in.length && in.charAt(j).isWhitespace) j += 1
        if (wordAt(j, "BY")) {
          out.append(in.substring(i, j + 2))
          i = j + 2
          // parse comma-separated items at this nesting level
          var listDone = false
          while (!listDone) {
            val item = new StringBuilder
            var rel = 0
            var itemDone = false
            var sep: Option[Char] = None
            var sq = false; var bq = false
            while (!itemDone && i < in.length) {
              val ch = in.charAt(i)
              if (sq) { item.append(ch); if (ch == '\\') { if (i + 1 < in.length) { item.append(in.charAt(i + 1)); i += 1 } } else if (ch == '\'') sq = false; i += 1 }
              else if (bq) { item.append(ch); if (ch == '`') bq = false; i += 1 }
              else if (ch == '\'') { sq = true; item.append(ch); i += 1 }
              else if (ch == '`') { bq = true; item.append(ch); i += 1 }
              else if (ch == '(') { rel += 1; item.append(ch); i += 1 }
              else if (ch == ')') {
                if (rel == 0) { itemDone = true; listDone = true } // OVER(...) closes
                else { rel -= 1; item.append(ch); i += 1 }
              }
              else if (ch == ',' && rel == 0) { itemDone = true; sep = Some(','); i += 1 }
              else if (rel == 0 && OrderEnders.exists(wordAt(i, _))) {
                itemDone = true; listDone = true
              }
              else { item.append(ch); i += 1 }
            }
            if (i >= in.length) { itemDone = true; listDone = true }
            val raw0 = item.result()
            val trimmedEnd = raw0.replaceAll("\\s+$", "")
            val trailingWs = raw0.substring(trimmedEnd.length)
            val fixed =
              if (trimmedEnd.isEmpty || NullsClause.findFirstIn(trimmedEnd).isDefined)
                trimmedEnd
              else if (DescTail.findFirstIn(trimmedEnd).isDefined)
                trimmedEnd + " NULLS FIRST"
              else trimmedEnd + " NULLS LAST"
            out.append(fixed).append(trailingWs)
            sep.foreach(out.append(_))
            if (sep.isEmpty) listDone = true
          }
        } else { out.append(c); i += 1 }
      }
      else { out.append(c); i += 1 }
    }
    out.result()
  }

  // ---- ASOF JOIN → Spark rewrite (the embedded model of the server's
  // point-in-time join) -------------------------------------------------
  //
  // `L ASOF [LEFT|INNER] JOIN R ON <eqs> AND <one inequality>` rewrites to
  // an equi+range LEFT JOIN with a per-left-row window pick:
  //
  //   SELECT <sel> FROM (
  //     SELECT __asof_l.*, r.*, row_number() OVER (
  //       PARTITION BY __asof_l.__asof_lid ORDER BY <rTime> DESC|ASC) AS __asof_rn
  //     FROM (SELECT *, monotonically_increasing_id() AS __asof_lid FROM L) AS __asof_l
  //     LEFT JOIN R ON <on>
  //   ) AS __asof WHERE __asof_rn = 1 [...]
  //
  // The synthetic lid keeps duplicate left rows distinct (a window over
  // the left columns would merge them); it never reaches the output, so
  // results stay deterministic. Matched rows always carry a non-NULL
  // right time (NULL fails the inequality), so `rn = 1 AND rTime IS NOT
  // NULL` is exactly the INNER variant. ClickHouse leaves ties between
  // equal (key, time) right rows unspecified, and so does this rewrite —
  // the same contract, not a silent delta. `SETTINGS join_use_nulls = 1`
  // (which the unparser pins for NULL padding on real servers) is the
  // rewrite's native semantics and is stripped; `join_use_nulls = 0`
  // (type-default padding) cannot be honored and rejects.
  //
  // Honored-or-rejected boundaries (loud errors, never silent): one ASOF
  // per SELECT level, no other join at that level, no `*` select items,
  // exactly one top-level inequality in ON, and each inequality operand
  // must resolve to one side (by alias qualifier or by a unique ` AS x`
  // binding in one side's subquery).

  private def rewriteAsof(in: String): String = {
    if (!raw"(?i)\bASOF\b".r.findFirstIn(in).isDefined) return in
    rewriteAsofLevel(in)
  }

  // ---- ANY JOIN strictness → build-side dedup -------------------------

  /** A parsed top-level `<kind> ANY JOIN` (kind-first `LEFT ANY JOIN` /
    * `INNER ANY JOIN` and legacy strictness-first `ANY LEFT JOIN` /
    * `ANY INNER JOIN` both): the session rewrites the RIGHT operand to a
    * deterministic one-row-per-key pick (schema needed, so the rewrite
    * itself lives with the embedded engine). `cond` starts at the
    * ON/USING keyword and runs to the end of the statement.
    */
  final case class AnyJoinParts(
      prefix: String, kind: String, left: String, right: String,
      rightAlias: Option[String], usingCols: Option[Seq[String]],
      cond: String)

  private val AnyJoinRe =
    raw"(?is)^(?:(LEFT|INNER)\s+ANY|ANY\s+(LEFT|INNER))\s+JOIN\b".r
  private val RightAnyRe =
    raw"(?is)\b(?:RIGHT\s+ANY|ANY\s+RIGHT|ANY\s+FULL|FULL\s+ANY)\s+JOIN\b".r

  def parseAnyJoin(sql: String): Option[AnyJoinParts] = {
    if (RightAnyRe.findFirstIn(sql).isDefined)
      throw new IllegalArgumentException(
        "RIGHT/FULL ANY JOIN is not supported by the embedded rewrite " +
          "(the deduplicated side is the LEFT operand there); swap the " +
          "sides to LEFT ANY JOIN, or run against a real server")
    val hits = (topLevelPositions(sql, "LEFT") ++
      topLevelPositions(sql, "INNER") ++ topLevelPositions(sql, "ANY"))
      .distinct.sorted
      .filter(p => AnyJoinRe.findFirstIn(sql.substring(p)).isDefined)
    if (hits.isEmpty) {
      if (raw"(?is)\b(LEFT|INNER)\s+ANY\s+JOIN|\bANY\s+(LEFT|INNER)\s+JOIN".r
        .findFirstIn(sql).isDefined)
        throw new IllegalArgumentException(
          "ANY JOIN inside a subquery is not supported by the embedded " +
            "rewrite (top-level only); restructure the statement or run " +
            "against a real server")
      return None
    }
    require(hits.length == 1 && topLevelPositions(sql, "JOIN").length == 1,
      "ANY JOIN mixed with other joins at one SELECT level is not " +
        "supported by the embedded rewrite; nest them in subqueries")
    val at = hits.head
    val m = AnyJoinRe.findFirstMatchIn(sql.substring(at)).get
    val kind = Option(m.group(1)).getOrElse(m.group(2)).toUpperCase
    val fromPos = topLevelPositions(sql, "FROM").filter(_ < at).lastOption
      .getOrElse(throw new IllegalArgumentException(
        "ANY JOIN without a FROM clause"))
    val left = sql.substring(fromPos + 4, at).trim
    val afterJoin = at + m.end
    val condPos = (topLevelPositions(sql, "ON") ++
      topLevelPositions(sql, "USING")).filter(_ > afterJoin).sorted.headOption
      .getOrElse(throw new IllegalArgumentException(
        "ANY JOIN without an ON/USING condition"))
    var right = sql.substring(afterJoin, condPos).trim
    // optional `AS alias` / trailing bare alias on the right operand
    var alias: Option[String] = None
    val asM = raw"(?is)^(.*?)\s+AS\s+(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\s*$$".r
    asM.findFirstMatchIn(right) match {
      case Some(am) if lastTopLevelAs(right) >= 0 =>
        alias = Some(am.group(2)); right = am.group(1).trim
      case _ =>
        val bare =
          raw"(?is)^(\(.*\)|`[^`]+`\.`[^`]+`)\s+(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\s*$$".r
        bare.findFirstMatchIn(right).foreach { bm =>
          alias = Some(bm.group(2)); right = bm.group(1).trim
        }
    }
    val condText = sql.substring(condPos)
    val usingCols =
      if (condText.toUpperCase.startsWith("USING")) {
        val open = condText.indexOf('(')
        require(open >= 0, "ANY JOIN USING without a column list")
        Some(parseArgs(condText, open + 1)._1
          .map(_.trim.stripPrefix("`").stripSuffix("`")))
      } else None
    Some(AnyJoinParts(sql.substring(0, fromPos), kind, left, right,
      alias, usingCols, condText))
  }

  // ---- RIGHT SEMI / RIGHT ANTI joins → side swap ----------------------

  private val RightSemiRe = raw"(?is)^RIGHT\s+(SEMI|ANTI)\s+JOIN\b".r

  /** `A RIGHT SEMI|ANTI JOIN B <ON|USING> ...` → `B LEFT SEMI|ANTI JOIN
    * A ...` — identical semantics (the preserved side is B either way;
    * ON/USING conditions are side-symmetric), and Spark parses the LEFT
    * forms natively. One join per SELECT level (the ASOF honesty rule);
    * selecting the probe side's columns fails loudly at analysis — the
    * server's SEMI exposes one matched row's columns, which Spark's
    * semi join cannot, so silence is never an option there.
    */
  def rewriteRightSemiAnti(s: String): String = {
    if (raw"(?is)\bRIGHT\s+(SEMI|ANTI)\s+JOIN\b".r.findFirstIn(s).isEmpty)
      return s
    mapTopLevelParens(rewriteRightSemiLevel(s))(
      inner => rewriteRightSemiAnti(inner))
  }

  private def rewriteRightSemiLevel(sql: String): String = {
    val hits = topLevelPositions(sql, "RIGHT").filter(p =>
      RightSemiRe.findFirstIn(sql.substring(p)).isDefined)
    if (hits.isEmpty) return sql
    require(hits.length == 1 && topLevelPositions(sql, "JOIN").length == 1,
      "RIGHT SEMI/ANTI JOIN mixed with other joins at one SELECT level " +
        "is not supported by the embedded rewrite; nest them in subqueries")
    val at = hits.head
    val m = RightSemiRe.findFirstMatchIn(sql.substring(at)).get
    val kind = m.group(1).toUpperCase
    val fromPos = topLevelPositions(sql, "FROM").filter(_ < at).lastOption
      .getOrElse(throw new IllegalArgumentException(
        "RIGHT SEMI/ANTI JOIN without a FROM clause"))
    val left = sql.substring(fromPos + 4, at).trim
    val afterJoin = at + m.end
    val condPos = (topLevelPositions(sql, "ON") ++
      topLevelPositions(sql, "USING")).filter(_ > afterJoin).sorted.headOption
      .getOrElse(throw new IllegalArgumentException(
        "RIGHT SEMI/ANTI JOIN without an ON/USING condition"))
    val right = sql.substring(afterJoin, condPos).trim
    require(left.nonEmpty && right.nonEmpty,
      s"RIGHT $kind JOIN: malformed operands near '${sql.substring(fromPos)
        .take(60)}'")
    sql.substring(0, fromPos) + s"FROM $right LEFT $kind JOIN $left " +
      sql.substring(condPos)
  }

  /** ClickHouse `PASTE JOIN` — horizontal concatenation by row POSITION.
    * The embedded rewrite makes the pairing explicit: each side gets a
    * row_number() keyed by ITS OWN top-level ORDER BY, and the sides
    * join on that number. Honored-or-rejected boundaries (all loud):
    * one PASTE JOIN per statement, top level only, both sides must be
    * parenthesized subqueries WITH their own ORDER BY (positional
    * pairing over an unordered stream is nondeterministic — the same
    * determinism rule as LIMIT BY), no `*` select items (the pairing
    * column would leak into them), no ON/USING (the server grammar has
    * none). Unequal side lengths pair to the SHORTER side (inner join
    * on the position — the embedded model's documented pick; no padding
    * is fabricated). ORDER BY ties leave the pairing unspecified, as on
    * the server. HTTP transports ship the statement verbatim.
    */
  def rewritePaste(s: String): String = {
    if (raw"(?is)\bPASTE\s+JOIN\b".r.findFirstIn(s).isEmpty) return s
    val hits = topLevelPositions(s, "PASTE").filter(p =>
      raw"(?is)^PASTE\s+JOIN\b".r.findFirstIn(s.substring(p)).isDefined)
    if (hits.isEmpty)
      throw new IllegalArgumentException(
        "PASTE JOIN inside a subquery is not supported by the embedded " +
          "rewrite; restructure or run against a real server")
    require(hits.length == 1,
      "multiple PASTE JOINs in one statement are not supported by the " +
        "embedded rewrite; nest them in subqueries")
    require(topLevelPositions(s, "JOIN").length == 1,
      "PASTE JOIN mixed with other joins at one SELECT level is not " +
        "supported by the embedded rewrite; nest them in subqueries")
    val at = hits.head
    // `*` select items would expose the injected pairing column
    val selPos = topLevelPositions(s, "SELECT").headOption.getOrElse(
      throw new IllegalArgumentException("PASTE JOIN without a SELECT"))
    val fromAll = topLevelPositions(s, "FROM")
    val fromPos = fromAll.filter(_ < at).lastOption.getOrElse(
      throw new IllegalArgumentException("PASTE JOIN without a FROM clause"))
    require(!s.substring(selPos, fromPos).contains("*"),
      "PASTE JOIN: `*` select items are not supported by the embedded " +
        "rewrite (the positional pairing column would leak into them); " +
        "name the columns explicitly")
    // left side: optional alias, optional AS, then a ')' closing the
    // parenthesized subquery
    var j = at - 1
    while (j >= 0 && s.charAt(j).isWhitespace) j -= 1
    var leftAlias = ""
    if (j >= 0 && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')) {
      var ws = j
      while (ws >= 0 && (s.charAt(ws).isLetterOrDigit || s.charAt(ws) == '_')) ws -= 1
      leftAlias = s.substring(ws + 1, j + 1)
      require(!leftAlias.equalsIgnoreCase("AS"),
        "PASTE JOIN: missing alias after AS on the left side")
      j = ws
      while (j >= 0 && s.charAt(j).isWhitespace) j -= 1
      if (j >= 1 && s.regionMatches(true, j - 1, "AS", 0, 2) &&
        (j - 2 < 0 || !(s.charAt(j - 2).isLetterOrDigit || s.charAt(j - 2) == '_'))) {
        j -= 2
        while (j >= 0 && s.charAt(j).isWhitespace) j -= 1
      }
    }
    require(j >= 0 && s.charAt(j) == ')',
      "PASTE JOIN: both sides must be parenthesized subqueries with " +
        "their own ORDER BY")
    var d = 1
    var k = j - 1
    var sq = false
    while (k >= 0 && d > 0) {
      val c = s.charAt(k)
      if (sq) { if (c == '\'') sq = false }
      else if (c == '\'') sq = true
      else if (c == ')') d += 1
      else if (c == '(') d -= 1
      if (d > 0) k -= 1
    }
    require(k > fromPos, "PASTE JOIN: unbalanced left subquery parens")
    val leftInner = s.substring(k + 1, j)
    require(s.substring(fromPos + 4, k).trim.isEmpty,
      "PASTE JOIN: the left side must be a single parenthesized subquery")
    // right side after the JOIN keyword
    val m = raw"(?is)^PASTE\s+JOIN\s*".r.findFirstMatchIn(s.substring(at)).get
    var r = at + m.end
    require(r < s.length && s.charAt(r) == '(',
      "PASTE JOIN: both sides must be parenthesized subqueries with " +
        "their own ORDER BY")
    var rd = 1
    var rc = r + 1
    sq = false
    while (rc < s.length && rd > 0) {
      val c = s.charAt(rc)
      if (sq) { if (c == '\\') rc += 1 else if (c == '\'') sq = false }
      else if (c == '\'') sq = true
      else if (c == '(') rd += 1
      else if (c == ')') rd -= 1
      if (rd > 0) rc += 1
    }
    require(rd == 0, "PASTE JOIN: unbalanced right subquery parens")
    val rightInner = s.substring(r + 1, rc)
    var p = rc + 1
    while (p < s.length && s.charAt(p).isWhitespace) p += 1
    if (p + 1 < s.length && s.regionMatches(true, p, "AS", 0, 2) &&
      (p + 2 >= s.length ||
        !(s.charAt(p + 2).isLetterOrDigit || s.charAt(p + 2) == '_'))) {
      p += 2
      while (p < s.length && s.charAt(p).isWhitespace) p += 1
    }
    var rightAlias = ""
    var pe = p
    while (pe < s.length && (s.charAt(pe).isLetterOrDigit || s.charAt(pe) == '_')) pe += 1
    if (pe > p) {
      val word = s.substring(p, pe)
      // clause keywords are NOT aliases
      if (!(ClauseKws ++ Seq("ON", "USING", "FORMAT", "OFFSET"))
        .exists(_.equalsIgnoreCase(word))) {
        rightAlias = word
        p = pe
      }
    }
    val rest = s.substring(p)
    require(!raw"(?is)^\s*(ON|USING)\b".r.findFirstIn(rest).isDefined,
      "PASTE JOIN takes no ON/USING condition (pairing is positional)")
    def sideOrder(inner: String, side: String): String = {
      val obs = topLevelPositions(inner, "ORDER").filter(q =>
        OrderByHead.findFirstIn(inner.substring(q)).isDefined)
      require(obs.nonEmpty,
        s"PASTE JOIN: the $side side needs its own top-level ORDER BY — " +
          "positional pairing over an unordered stream is " +
          "nondeterministic (the LIMIT BY determinism rule)")
      val q = obs.last
      val obM = OrderByHead.findFirstMatchIn(inner.substring(q)).get
      val after = q + obM.end
      val end = OrderEnders.flatMap(kw => topLevelPositions(inner, kw))
        .filter(_ >= after).sorted.headOption.getOrElse(inner.length)
      inner.substring(after, end).trim
    }
    val la = if (leftAlias.nonEmpty) leftAlias else "__paste_l"
    val ra = if (rightAlias.nonEmpty) rightAlias else "__paste_r"
    val newFrom =
      s"FROM (SELECT *, row_number() OVER (ORDER BY ${sideOrder(leftInner, "left")}) " +
        s"AS __paste_rn FROM ( $leftInner ) __paste_li) AS $la " +
        s"JOIN (SELECT *, row_number() OVER (ORDER BY ${sideOrder(rightInner, "right")}) " +
        s"AS __paste_rn FROM ( $rightInner ) __paste_ri) AS $ra " +
        s"ON $la.__paste_rn = $ra.__paste_rn"
    s.substring(0, fromPos) + newFrom + rest
  }

  // ---- star column transformers (* REPLACE / APPLY / COLUMNS) --------

  sealed trait StarOp
  /** `REPLACE (e1 AS c1, ...)` — substitute in place, position kept. */
  final case class StarReplace(items: Seq[(String, String)]) extends StarOp
  /** `APPLY (fn)` — every selected column wrapped in fn. */
  final case class StarApply(fn: String) extends StarOp

  /** A top-level select list of the form `* [EXCEPT (...)] <transformers>`
    * or `COLUMNS('re') <transformers>`: `core` is the statement with the
    * list reduced to what Spark parses natively (`*` / `* EXCEPT (...)`),
    * the transformers compose on the ANALYZED frame (REPLACE keeps
    * column position via withColumn; APPLY renames to `fn(col)` — the
    * server's naming). COLUMNS filters by RE2-style partial match first.
    */
  final case class StarTransformParts(
      core: String, ops: Seq[StarOp], columnsRe: Option[String])

  /** Translate a ClickHouse scalar EXPRESSION fragment (no statement
    * structure) to a Spark SQL fragment.
    */
  def translateFragment(frag: String, tables: Seq[(String, String)]): String =
    translate("SELECT " + frag, tables).trim.stripPrefix("SELECT").trim

  def parseStarTransform(sql: String): Option[StarTransformParts] = {
    val sel = topLevelPositions(sql, "SELECT").headOption.getOrElse(return None)
    val from = topLevelPositions(sql, "FROM").find(_ > sel).getOrElse(return None)
    val list = sql.substring(sel + 6, from).trim
    val isStarForm =
      raw"(?is)^\*\s+(EXCEPT|REPLACE|APPLY)\b.*".r.findFirstIn(list).isDefined
    val isColumnsForm = raw"(?is)^COLUMNS\s*\(.*".r.findFirstIn(list).isDefined
    if (!isStarForm && !isColumnsForm) return None
    def fail(why: String): Nothing = throw new IllegalArgumentException(
      s"star transformer: $why (select list: '$list'); supported shapes " +
        "are `* [EXCEPT (cols)] {REPLACE (e AS c, ...) | APPLY (fn)}...` " +
        "and `COLUMNS('re') {APPLY (fn) | REPLACE (...)}...` at the top " +
        "level — restructure or run against a real server")
    for (kw <- Seq("GROUP", "ORDER", "HAVING", "UNION"))
      if (topLevelPositions(sql, kw).exists(_ > from))
        fail(s"$kw BY/clause combined with a transformer is not modeled " +
          "embedded (the transformer composes on the analyzed result); " +
          "wrap the transformed SELECT in a subquery")
    var p = 0
    var columnsRe: Option[String] = None
    val keep = new StringBuilder("*")
    def skipWs(): Unit = while (p < list.length && list.charAt(p).isWhitespace) p += 1
    def word(): String = {
      val s0 = p
      while (p < list.length && isWordChar(list.charAt(p))) p += 1
      list.substring(s0, p)
    }
    if (isColumnsForm) {
      p = list.indexOf('(') + 1
      val (args, past) = parseArgs(list, p)
      val re = args match {
        case Seq(one) if one.length >= 2 && one.startsWith("'") && one.endsWith("'") =>
          one.substring(1, one.length - 1)
        case _ => fail("COLUMNS takes exactly one quoted regex literal")
      }
      columnsRe = Some(re)
      p = past
    } else {
      p = 1 // past '*'
      skipWs()
      if (list.regionMatches(true, p, "EXCEPT", 0, 6) &&
        (p + 6 >= list.length || !isWordChar(list.charAt(p + 6)))) {
        p += 6; skipWs()
        if (p < list.length && list.charAt(p) == '(') {
          val (args, past) = parseArgs(list, p + 1)
          keep.append(s" EXCEPT (${args.mkString(", ")})")
          p = past
        } else {
          // the server accepts a single unparenthesized column; Spark's
          // native star-EXCEPT needs the parens — normalize
          val c = word()
          if (c.isEmpty) fail("EXCEPT without a column list")
          keep.append(s" EXCEPT ($c)")
        }
      }
    }
    val ops = Seq.newBuilder[StarOp]
    var done = false
    while (!done) {
      skipWs()
      if (p >= list.length) done = true
      else {
        val w = word()
        skipWs()
        if (p >= list.length || list.charAt(p) != '(')
          fail(s"expected a parenthesized transformer argument after '$w'")
        val (args, past) = parseArgs(list, p + 1)
        p = past
        w.toUpperCase match {
          case "REPLACE" =>
            ops += StarReplace(args.map { it =>
              val asAt = lastTopLevelAs(it)
              if (asAt < 0) fail(s"REPLACE item '$it' has no AS column")
              val name = it.substring(asAt + 2).trim
                .stripPrefix("`").stripSuffix("`")
              (it.substring(0, asAt).trim, name)
            })
          case "APPLY" =>
            args match {
              case Seq(fn) if BareIdent.findFirstIn(fn.trim).isDefined =>
                ops += StarApply(fn.trim)
              case _ => fail("APPLY takes exactly one bare function name")
            }
          case other => fail(s"unknown transformer '$other'")
        }
      }
    }
    val parts = ops.result()
    if (parts.isEmpty && columnsRe.isEmpty && keep.result() == "*") return None
    Some(StarTransformParts(
      sql.substring(0, sel + 6) + " " + keep.result() + " " + sql.substring(from),
      parts, columnsRe))
  }

  // ---- scalar WITH aliases → inline substitution ---------------------

  /** Index of the LAST top-level ` AS ` keyword in `it` (CAST's AS and
    * lambda bodies sit inside parens), or -1.
    */
  private def lastTopLevelAs(it: String): Int = {
    var p = 0; var d = 0; var sq = false; var bq = false; var asAt = -1
    while (p < it.length) {
      val c = it.charAt(p)
      if (sq) { if (c == '\\') p += 1 else if (c == '\'') sq = false }
      else if (bq) { if (c == '`') bq = false }
      else c match {
        case '\'' => sq = true
        case '`' => bq = true
        case '(' => d += 1
        case ')' => d -= 1
        case _ if d == 0 && (p == 0 || !isWordChar(it.charAt(p - 1))) &&
          it.regionMatches(true, p, "AS", 0, 2) &&
          (p + 2 >= it.length || !isWordChar(it.charAt(p + 2))) => asAt = p
        case _ =>
      }
      p += 1
    }
    asAt
  }

  private val BareIdent = raw"^[A-Za-z_][A-Za-z0-9_]*$$".r

  /** ClickHouse's scalar WITH form — `WITH <expr> AS <ident>, ...` (the
    * expression FIRST; `(SELECT ...)` scalar subqueries included) —
    * substitutes `(expr)` for every bare `ident` reference in the rest
    * of the statement, exactly the server's documented expansion.
    * Standard CTE items (`<ident> AS (<subquery>)`) pass through
    * untouched, and the two forms mix freely in one WITH list. Applied
    * at every nesting level. References are replaced word-boundary
    * aware, never after `.` (qualified columns), before `(` (calls), or
    * inside strings/backticks.
    */
  def rewriteScalarWith(s: String): String = {
    if (raw"(?i)\bWITH\b".r.findFirstIn(s).isEmpty) return s
    mapTopLevelParens(rewriteScalarWithLevel(s))(inner => rewriteScalarWith(inner))
  }

  private def rewriteScalarWithLevel(sql: String): String = {
    val sel = topLevelPositions(sql, "SELECT").headOption.getOrElse(return sql)
    val w = topLevelPositions(sql, "WITH").find(_ < sel).getOrElse(return sql)
    val itemsTxt = sql.substring(w + 4, sel)
    // split items on top-level commas
    val items = {
      var p = 0; var d = 0; var sq = false; var bq = false; var last = 0
      val out = Seq.newBuilder[String]
      while (p < itemsTxt.length) {
        val c = itemsTxt.charAt(p)
        if (sq) { if (c == '\\') p += 1 else if (c == '\'') sq = false }
        else if (bq) { if (c == '`') bq = false }
        else c match {
          case '\'' => sq = true
          case '`' => bq = true
          case '(' => d += 1
          case ')' => d -= 1
          case ',' if d == 0 => out += itemsTxt.substring(last, p); last = p + 1
          case _ =>
        }
        p += 1
      }
      out += itemsTxt.substring(last)
      out.result().map(_.trim).filter(_.nonEmpty)
    }
    var subs = Seq.empty[(String, String)]
    def applySubs(text: String): String = subs.foldLeft(text) {
      case (acc, (name, repl)) =>
        mapOutsideStrings(acc) { seg =>
          // even split indexes sit outside backticks
          seg.split("`", -1).zipWithIndex.map { case (part, idx) =>
            if (idx % 2 != 0) part
            else part.replaceAll(
              raw"(?<![.\w])" + java.util.regex.Pattern.quote(name) + raw"(?![\w(])",
              java.util.regex.Matcher.quoteReplacement(repl))
          }.mkString("`")
        }
    }
    val kept = items.flatMap { it =>
      val asAt = lastTopLevelAs(it)
      if (asAt < 0) Some(it)
      else {
        val lhs = it.substring(0, asAt).trim
        val rhs = it.substring(asAt + 2).trim
        val lhsBare = BareIdent.findFirstIn(lhs.stripPrefix("`").stripSuffix("`"))
          .isDefined && !lhs.contains("(")
        if (lhsBare && rhs.startsWith("(")) Some(it) // standard CTE
        else if (BareIdent.findFirstIn(rhs).isDefined) {
          // scalar alias: expr AS ident — earlier aliases expand inside
          // later definitions, matching the server's left-to-right rule
          subs :+= rhs -> s"(${applySubs(lhs)})"
          None
        } else Some(it)
      }
    }
    if (subs.isEmpty) return sql
    val rest = applySubs(sql.substring(sel))
    val head = sql.substring(0, w)
    if (kept.isEmpty) head + rest
    else head + "WITH " + kept.map(applySubs).mkString(", ") + " " + rest
  }

  // ---- ARRAY JOIN clause → LATERAL VIEW chain ------------------------

  /** Keywords that end an ARRAY JOIN item list at its own nesting level
    * (next clause or next join). LEFT/RIGHT double as function names —
    * the scanner skips them when a `(` follows.
    */
  private val AjEnders = Set(
    "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "SETTINGS", "UNION",
    "FORMAT", "QUALIFY", "WINDOW", "JOIN", "INNER", "LEFT", "RIGHT",
    "FULL", "CROSS", "ASOF", "SEMI", "ANTI", "GLOBAL", "INTERSECT",
    "EXCEPT", "ARRAY", "PREWHERE")

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** `FROM ... [LEFT] ARRAY JOIN e1 AS n1 [, e2 AS n2 ...]` → a Spark
    * LATERAL VIEW chain, rewritten in place at ANY nesting depth (the
    * clause sits exactly where LATERAL VIEW does). The first item
    * posexplodes and its position column zips the rest — server
    * multi-ARRAY JOIN is POSITIONAL, not a cross product (SELECT doc
    * §array-join); each further item picks `element_at(ek, pos + 1)`.
    * LEFT ARRAY JOIN maps to LATERAL VIEW OUTER (empty arrays keep the
    * row with NULL elements). Honored-or-rejected: every item needs an
    * `AS alias` (a bare-column ARRAY JOIN REPLACES that column in the
    * server's output — not expressible as a lateral view without schema
    * surgery), and the owning SELECT must not be a star select (a Spark
    * star would include the helper position column a server never
    * shows). Unequal array sizes in the multi-item form surface as an
    * element_at index error under ANSI — a server errors there too.
    */
  def rewriteArrayJoin(sql: String): String = rewriteArrayJoinFrom(sql, 0)

  private def rewriteArrayJoinFrom(sql: String, k: Int): String = {
    // locate the first ARRAY JOIN outside strings/backticks
    var i = 0; var inSq = false; var inBq = false; var depth = 0
    var found = -1; var foundDepth = 0
    var lastSelAtDepth = Map[Int, Int]()
    while (i < sql.length && found < 0) {
      val c = sql.charAt(i)
      if (inSq) { if (c == '\\') i += 1 else if (c == '\'') inSq = false }
      else if (inBq) { if (c == '`') inBq = false }
      else c match {
        case '\'' => inSq = true
        case '`' => inBq = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          val boundary = i == 0 || !isWordChar(sql.charAt(i - 1))
          if (boundary && sql.regionMatches(true, i, "SELECT", 0, 6) &&
            (i + 6 >= sql.length || !isWordChar(sql.charAt(i + 6))))
            lastSelAtDepth += depth -> i
          if (boundary && sql.regionMatches(true, i, "ARRAY", 0, 5) &&
            raw"(?is)^ARRAY\s+JOIN\b".r.findFirstIn(sql.substring(i)).isDefined) {
            found = i; foundDepth = depth
          }
      }
      i += 1
    }
    if (found < 0) return sql
    // LEFT / INNER prefix (INNER ARRAY JOIN == ARRAY JOIN)
    var start = found
    var outer = false
    val before = sql.substring(0, found)
    raw"(?is)\b(LEFT|INNER)\s*$$".r.findFirstMatchIn(before).foreach { pm =>
      start = pm.start
      outer = pm.group(1).equalsIgnoreCase("LEFT")
    }
    // the owning SELECT (same depth) must not be a star select
    lastSelAtDepth.get(foundDepth).foreach { selAt =>
      // the owning FROM is the first one at the SELECT's own depth (a
      // scalar subquery in the select list carries its own, deeper FROM)
      var p = selAt + 6; var d = 0; var s2 = false; var b2 = false
      var selEnd = found
      while (p < found && selEnd == found) {
        val c = sql.charAt(p)
        if (s2) { if (c == '\\') p += 1 else if (c == '\'') s2 = false }
        else if (b2) { if (c == '`') b2 = false }
        else c match {
          case '\'' => s2 = true
          case '`' => b2 = true
          case '(' => d += 1
          case ')' => d -= 1
          case _ if d == 0 && !isWordChar(sql.charAt(p - 1)) &&
            sql.regionMatches(true, p, "FROM", 0, 4) &&
            (p + 4 >= sql.length || !isWordChar(sql.charAt(p + 4))) => selEnd = p
          case _ =>
        }
        p += 1
      }
      if (hasTopLevelStar(sql.substring(selAt + 6, selEnd)))
        throw new IllegalArgumentException(
          "ARRAY JOIN with a `*` select is not supported by the embedded " +
            "rewrite (a Spark star would include the helper position " +
            "column a server never shows); list columns explicitly")
    }
    val itemsStart =
      found + raw"(?is)^ARRAY\s+JOIN\b".r.findFirstMatchIn(sql.substring(found)).get.end
    // items run to the next clause keyword / closing paren at this level
    var j = itemsStart; var rel = 0; var sq = false; var bq = false
    var itemsEnd = sql.length
    val commas = Seq.newBuilder[Int]
    while (j < sql.length && itemsEnd == sql.length) {
      val c = sql.charAt(j)
      if (sq) { if (c == '\\') j += 1 else if (c == '\'') sq = false }
      else if (bq) { if (c == '`') bq = false }
      else c match {
        case '\'' => sq = true
        case '`' => bq = true
        case '(' => rel += 1
        case ')' =>
          rel -= 1; if (rel < 0) itemsEnd = j
        case ',' if rel == 0 => commas += j
        case _ if rel == 0 && (j == itemsStart || !isWordChar(sql.charAt(j - 1))) =>
          val kw = AjEnders.find(w =>
            sql.regionMatches(true, j, w, 0, w.length) &&
              (j + w.length >= sql.length || !isWordChar(sql.charAt(j + w.length))))
          kw.foreach { w =>
            // LEFT(/RIGHT( are string functions, not clause starts
            val fnLike = (w == "LEFT" || w == "RIGHT") && {
              var p = j + w.length
              while (p < sql.length && sql.charAt(p).isWhitespace) p += 1
              p < sql.length && sql.charAt(p) == '('
            }
            if (!fnLike) itemsEnd = j
          }
        case _ =>
      }
      j += 1
    }
    val itemsTxt = sql.substring(itemsStart, itemsEnd)
    val cuts = (Seq(itemsStart - 1) ++ commas.result() ++ Seq(itemsEnd))
    val items = cuts.sliding(2).map { case Seq(a, b) =>
      sql.substring(a + 1, b).trim
    }.toSeq.filter(_.nonEmpty)
    require(items.nonEmpty, s"ARRAY JOIN: empty item list near '$itemsTxt'")
    val parsed = items.map { it =>
      // the alias is the LAST top-level ` AS ` binding (CAST(x AS T) and
      // lambda bodies sit inside parens)
      var p = 0; var d = 0; var s2 = false; var b2 = false; var asAt = -1
      while (p < it.length) {
        val c = it.charAt(p)
        if (s2) { if (c == '\\') p += 1 else if (c == '\'') s2 = false }
        else if (b2) { if (c == '`') b2 = false }
        else c match {
          case '\'' => s2 = true
          case '`' => b2 = true
          case '(' => d += 1
          case ')' => d -= 1
          case _ if d == 0 && (p == 0 || !isWordChar(it.charAt(p - 1))) &&
            it.regionMatches(true, p, "AS", 0, 2) &&
            (p + 2 >= it.length || !isWordChar(it.charAt(p + 2))) => asAt = p
          case _ =>
        }
        p += 1
      }
      if (asAt < 0)
        throw new IllegalArgumentException(
          s"ARRAY JOIN item '$it' has no AS alias: an unaliased ARRAY " +
            "JOIN replaces the array column in place, which the embedded " +
            "rewrite cannot express — write `ARRAY JOIN <expr> AS <name>` " +
            "or run against a real server")
      val expr = it.substring(0, asAt).trim
      val alias = it.substring(asAt + 2).trim
      require(expr.nonEmpty && alias.nonEmpty &&
        raw"^(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)$$".r.findFirstIn(alias).isDefined,
        s"ARRAY JOIN item '$it': malformed expression or alias")
      (expr, alias)
    }
    val lead = if (outer) "LATERAL VIEW OUTER " else "LATERAL VIEW "
    val pos = s"__aj_pos_$k"
    val repl = new StringBuilder
    repl.append(s"${lead}posexplode(${parsed.head._1}) __aj_$k ")
      .append(s"AS $pos, ${parsed.head._2}")
    parsed.zipWithIndex.drop(1).foreach { case ((e, n), idx) =>
      // element_at rides the FIRST item's position: zip semantics. The
      // 1-element array keeps this a generator (never empty, so plain
      // LATERAL VIEW is right even under OUTER).
      repl.append(s" LATERAL VIEW explode(array(element_at($e, $pos + 1))) ")
        .append(s"__aj_${k}_$idx AS $n")
    }
    val rebuilt = sql.substring(0, start).stripSuffix(" ") + " " +
      repl.result() + " " + sql.substring(itemsEnd).trim
    rewriteArrayJoinFrom(rebuilt.trim, k + 1)
  }

  /** Rewrite the (single) top-level ASOF join of `sql`, recursing into
    * top-level paren groups when this level has none.
    */
  private def rewriteAsofLevel(sql: String): String = {
    val asofs = topLevelPositions(sql, "ASOF")
    if (asofs.isEmpty) {
      // recurse into top-level paren groups
      val out = new StringBuilder
      var i = 0
      var inSq = false
      var inBq = false
      while (i < sql.length) {
        val c = sql.charAt(i)
        if (inSq) { out.append(c); if (c == '\\' && i + 1 < sql.length) { out.append(sql.charAt(i + 1)); i += 1 } else if (c == '\'') inSq = false; i += 1 }
        else if (inBq) { out.append(c); if (c == '`') inBq = false; i += 1 }
        else if (c == '\'') { inSq = true; out.append(c); i += 1 }
        else if (c == '`') { inBq = true; out.append(c); i += 1 }
        else if (c == '(') {
          // find matching close, quote-aware
          var depth = 1; var j = i + 1; var sq = false; var bq = false
          while (j < sql.length && depth > 0) {
            val ch = sql.charAt(j)
            if (sq) { if (ch == '\\') j += 1 else if (ch == '\'') sq = false }
            else if (bq) { if (ch == '`') bq = false }
            else ch match {
              case '\'' => sq = true
              case '`' => bq = true
              case '(' => depth += 1
              case ')' => depth -= 1
              case _ =>
            }
            j += 1
          }
          out.append('(').append(rewriteAsofLevel(sql.substring(i + 1, j - 1))).append(')')
          i = j
        }
        else { out.append(c); i += 1 }
      }
      return out.result()
    }
    require(asofs.length == 1,
      "ASOF JOIN: multiple ASOF joins at one SELECT level are not supported " +
        "by the embedded rewrite; nest them in subqueries")
    val at = asofs.head
    val selPos = topLevelPositions(sql, "SELECT").headOption.getOrElse(
      throw new IllegalArgumentException("ASOF JOIN outside a SELECT"))
    val fromPos = topLevelPositions(sql, "FROM").filter(p => p > selPos && p < at)
      .lastOption.getOrElse(
        throw new IllegalArgumentException("ASOF JOIN without a FROM clause"))
    require(topLevelPositions(sql, "JOIN").length == 1,
      "ASOF JOIN mixed with other joins at one SELECT level is not " +
        "supported by the embedded rewrite; nest them in subqueries")
    val prefix = sql.substring(0, selPos)
    val selRaw = sql.substring(selPos + 6, fromPos).trim
    require(!hasTopLevelStar(selRaw),
      "ASOF JOIN: `*` select items are not supported by the embedded " +
        "rewrite (the internal row-pick columns would leak); list columns " +
        "explicitly")
    val lSeg = sql.substring(fromPos + 4, at).trim
    val jm = raw"(?is)^ASOF\s+(LEFT\s+|INNER\s+)?JOIN\b".r
      .findFirstMatchIn(sql.substring(at)).getOrElse(
        throw new IllegalArgumentException(
          s"malformed ASOF join near: ${sql.substring(at).take(60)}"))
    val isLeft = jm.group(1) != null && jm.group(1).trim.equalsIgnoreCase("LEFT")
    val joinEnd = at + jm.end
    // USING form: `USING (k1, ..., kn, asofCol)` — the last column is the
    // asof column with the server's pinned `left >= right` (backward
    // inclusive) match; handled in its own branch because the flattening
    // must EXCEPT the right side's same-named columns
    val usingPosOpt = topLevelPositions(sql, "USING").find(_ >= joinEnd)
    val onPosOpt = topLevelPositions(sql, "ON").find(_ >= joinEnd)
    if (usingPosOpt.exists(up => onPosOpt.forall(up < _)))
      return rewriteAsofUsing(
        sql, prefix, selRaw, lSeg, isLeft, joinEnd, usingPosOpt.get)
    val onPos = onPosOpt.getOrElse(
      throw new IllegalArgumentException(
        "ASOF JOIN requires an ON clause (or USING (keys..., asofColumn))"))
    val rSeg = sql.substring(joinEnd, onPos).trim
    val onEnd = ClauseKws.flatMap(k => topLevelPositions(sql, k))
      .filter(_ > onPos).sorted.headOption.getOrElse(sql.length)
    val onExpr = sql.substring(onPos + 2, onEnd).trim
    val tail = sql.substring(onEnd)

    val (lAlias, _) = termAlias(lSeg)
    val (rAliasOpt, _) = termAlias(rSeg)
    val rAlias = rAliasOpt.getOrElse("__asof_r")
    // nested ASOF joins inside either side rewrite recursively
    val lSegR = rewriteAsofLevel(lSeg)
    val rSegR = rewriteAsofLevel(rSeg)
    val rTermFull = if (rAliasOpt.isDefined) rSegR else s"$rSegR AS __asof_r"

    // the one inequality decides the pick order
    val conjs = splitTopLevelAnd(onExpr)
    val ineqs = conjs.flatMap(c => ineqOf(c).map(c -> _))
    require(ineqs.length == 1,
      s"ASOF JOIN ON must carry exactly one inequality conjunct, found " +
        s"${ineqs.length} in: $onExpr")
    val (_, (a, op, b)) = ineqs.head
    def sideOf(x: String): Option[Boolean] = { // Some(true)=right side
      val qual = raw"(?s)^\s*([A-Za-z_]\w*)\s*\.".r.findFirstMatchIn(x).map(_.group(1))
      qual match {
        case Some(q) if q.equalsIgnoreCase(rAlias) => Some(true)
        case Some(q) if lAlias.exists(q.equalsIgnoreCase) => Some(false)
        case Some(_) => None
        case None =>
          val ident = x.trim.stripPrefix("`").stripSuffix("`")
          if (!ident.matches(raw"\w+")) None
          else {
            val re = raw"(?i)\bAS\s+`?${java.util.regex.Pattern.quote(ident)}`?(?![\w])".r
            val inR = re.findFirstIn(rSeg).isDefined
            val inL = re.findFirstIn(lSeg).isDefined
            if (inR && !inL) Some(true)
            else if (inL && !inR) Some(false)
            else None
          }
      }
    }
    val (rTime, dir) = (sideOf(a), sideOf(b)) match {
      case (Some(true), Some(false)) => (a.trim, op)
      case (Some(false), Some(true)) => (b.trim, flipOp(op))
      case _ => throw new IllegalArgumentException(
        s"ASOF JOIN: cannot resolve inequality sides in `$a $op $b` " +
          "(qualify operands with the join aliases)")
    }
    val ord = if (dir == "<=" || dir == "<") "DESC" else "ASC"

    def stripQuals(t: String): String = {
      var s0 = replaceQualifier(t, rAlias, "")
      lAlias.foreach(la => s0 = replaceQualifier(s0, la, ""))
      s0
    }
    val onInner = lAlias.map(la =>
      replaceQualifier(onExpr, la, "__asof_l.")).getOrElse(onExpr)
    val sel = stripQuals(selRaw)
    val rTimeOuter = stripQuals(rTime)

    // tail: strip join_use_nulls=1 SETTINGS (our native semantics), merge
    // a WHERE into the rn filter, keep other clauses outside
    val (whereExpr, rest) = splitAsofTail(tail)
    val inner =
      s"SELECT __asof_l.*, $rAlias.*, row_number() OVER (PARTITION BY " +
        s"__asof_l.__asof_lid ORDER BY $rTime $ord) AS __asof_rn " +
        s"FROM (SELECT *, monotonically_increasing_id() AS __asof_lid " +
        s"FROM $lSegR) AS __asof_l LEFT JOIN $rTermFull ON $onInner"
    val innerCond = if (isLeft) "" else s" AND $rTimeOuter IS NOT NULL"
    val whereOut = s" WHERE __asof_rn = 1$innerCond" +
      whereExpr.map(w => s" AND (${stripQuals(w)})").getOrElse("")
    s"${prefix}SELECT $sel FROM ($inner) AS __asof$whereOut" +
      (if (rest.trim.isEmpty) "" else " " + stripQuals(rest.trim))
  }

  /** `L ASOF [LEFT|INNER] JOIN R USING (k1, ..., kn, t)` — the server's
    * USING spelling: equality on every listed column except the LAST,
    * which is the asof column matched as `left.t >= right.t` (backward
    * inclusive — the USING form carries no direction syntax). The
    * flatten EXCEPTs the right side's same-named columns (Spark
    * star-EXCEPT), so unqualified references resolve to the LEFT copy —
    * the merged-column semantics USING promises; the right asof value
    * survives under a synthetic alias for the INNER variant's match
    * test. Any OTHER column name shared between the sides still hits
    * the documented shared-name limitation (loud analysis error).
    */
  private def rewriteAsofUsing(
      sql: String, prefix: String, selRaw: String, lSeg: String,
      isLeft: Boolean, joinEnd: Int, usingPos: Int): String = {
    val rSeg = sql.substring(joinEnd, usingPos).trim
    var p = usingPos + 5
    while (p < sql.length && sql.charAt(p).isWhitespace) p += 1
    require(p < sql.length && sql.charAt(p) == '(',
      "ASOF JOIN USING requires a parenthesized column list")
    val (cols0, afterList) = parseArgs(sql, p + 1)
    val cols = cols0.map(_.trim).filter(_.nonEmpty)
    require(cols.length >= 2,
      "ASOF JOIN USING needs at least one key column plus the asof " +
        "column (the LAST listed column)")
    require(cols.forall(c => c.matches(raw"`[^`]+`|\w+")),
      s"ASOF JOIN USING accepts plain column names only: ${cols.mkString(", ")}")
    val tail = sql.substring(afterList)
    val (lAlias, _) = termAlias(lSeg)
    val (rAliasOpt, _) = termAlias(rSeg)
    val rAlias = rAliasOpt.getOrElse("__asof_r")
    // nested ASOF joins inside either side rewrite recursively
    val lSegR = rewriteAsofLevel(lSeg)
    val rSegR = rewriteAsofLevel(rSeg)
    val rTermFull = if (rAliasOpt.isDefined) rSegR else s"$rSegR AS __asof_r"
    val keys = cols.init
    val tCol = cols.last
    val onInner = (keys.map(k => s"__asof_l.$k = $rAlias.$k") :+
      s"$rAlias.$tCol <= __asof_l.$tCol").mkString(" AND ")
    def stripQuals(t: String): String = {
      var s0 = replaceQualifier(t, rAlias, "")
      lAlias.foreach(la => s0 = replaceQualifier(s0, la, ""))
      s0
    }
    val sel = stripQuals(selRaw)
    val (whereExpr, rest) = splitAsofTail(tail)
    val inner =
      s"SELECT __asof_l.*, $rAlias.* EXCEPT (${cols.mkString(", ")}), " +
        s"$rAlias.$tCol AS __asof_rt, row_number() OVER (PARTITION BY " +
        s"__asof_l.__asof_lid ORDER BY $rAlias.$tCol DESC) AS __asof_rn " +
        s"FROM (SELECT *, monotonically_increasing_id() AS __asof_lid " +
        s"FROM $lSegR) AS __asof_l LEFT JOIN $rTermFull ON $onInner"
    val innerCond = if (isLeft) "" else " AND __asof_rt IS NOT NULL"
    val whereOut = s" WHERE __asof_rn = 1$innerCond" +
      whereExpr.map(w => s" AND (${stripQuals(w)})").getOrElse("")
    s"${prefix}SELECT $sel FROM ($inner) AS __asof$whereOut" +
      (if (rest.trim.isEmpty) "" else " " + stripQuals(rest.trim))
  }

  /** (Some(whereExpr), rest) for a clause tail following the ON expr.
    * Rejects SETTINGS other than `join_use_nulls = 1` (which is dropped:
    * NULL padding is the rewrite's native behavior; `= 0` type-default
    * padding cannot be honored).
    */
  private def splitAsofTail(tail0: String): (Option[String], String) = {
    var tail = tail0
    // SETTINGS handling (always trailing in our dialect)
    topLevelPositions(tail, "SETTINGS").headOption.foreach { sp =>
      val body = tail.substring(sp + 8).trim.stripSuffix(";").trim
      val items = body.split(",").map(_.trim).filter(_.nonEmpty)
      val kept = items.filterNot(
        _.matches(raw"(?i)join_use_nulls\s*=\s*1"))
      require(!items.exists(_.matches(raw"(?i)join_use_nulls\s*=\s*0")),
        "ASOF JOIN with join_use_nulls = 0 (type-default padding) is not " +
          "supported by the embedded engine; use NULL padding")
      require(kept.isEmpty,
        s"ASOF JOIN: unsupported SETTINGS on the embedded engine: " +
          kept.mkString(", "))
      tail = tail.substring(0, sp)
    }
    val t = tail.trim
    if (t.isEmpty) (None, "")
    else {
      val wp = topLevelPositions(t, "WHERE").headOption
      wp match {
        case Some(0) =>
          val wEnd = ClauseKws.filterNot(_ == "WHERE")
            .flatMap(k => topLevelPositions(t, k))
            .sorted.headOption.getOrElse(t.length)
          (Some(t.substring(5, wEnd).trim), t.substring(wEnd))
        case _ => (None, t)
      }
    }
  }

  /** (alias, isSubquery) of a FROM term: `(sub) AS x` / `(sub) x` /
    * `tbl AS x` / `tbl x` / `(sub)` / `tbl`.
    */
  private def termAlias(seg: String): (Option[String], Boolean) = {
    val s = seg.trim
    if (s.endsWith(")")) (None, true)
    else {
      val am = raw"(?is)^(.*\))\s+(?:AS\s+)?`?([A-Za-z_]\w*)`?$$".r
      am.findFirstMatchIn(s) match {
        case Some(g) => (Some(g.group(2)), true)
        case None =>
          val parts = s.split(raw"\s+")
          if (parts.length == 1) (None, false)
          else (Some(parts.last.stripPrefix("`").stripSuffix("`")), false)
      }
    }
  }

  /** Split a boolean expression on top-level AND (quote/paren-aware). */
  private def splitTopLevelAnd(e: String): Seq[String] = {
    val ands = topLevelPositions(e, "AND")
    val bounds = (Seq(-3) ++ ands) :+ e.length
    bounds.sliding(2).map { case Seq(a, b) =>
      e.substring(a + 3, b).trim
    }.toSeq.filter(_.nonEmpty)
  }

  /** Some((lhs, op, rhs)) when the conjunct is a top-level inequality. */
  private def ineqOf(c: String): Option[(String, String, String)] = {
    var depth = 0; var inSq = false; var inBq = false; var i = 0
    while (i < c.length) {
      val ch = c.charAt(i)
      if (inSq) { if (ch == '\\') i += 1 else if (ch == '\'') inSq = false }
      else if (inBq) { if (ch == '`') inBq = false }
      else ch match {
        case '\'' => inSq = true
        case '`' => inBq = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case '<' | '>' if depth == 0 =>
          val nxt = if (i + 1 < c.length) c.charAt(i + 1) else ' '
          if (ch == '<' && nxt == '>') i += 1 // not-equals, skip
          else {
            val op = if (nxt == '=') c.substring(i, i + 2) else ch.toString
            return Some((c.substring(0, i).trim, op,
              c.substring(i + op.length).trim))
          }
        case _ =>
      }
      i += 1
    }
    None
  }

  private def flipOp(op: String): String = op match {
    case "<=" => ">="
    case ">=" => "<="
    case "<" => ">"
    case ">" => "<"
  }

  /** Quote-aware `alias.` → `repl` (repl carries its own dot or empty). */
  private def replaceQualifier(text: String, alias: String, repl: String): String = {
    val out = new StringBuilder
    var i = 0; var inSq = false; var inBq = false
    while (i < text.length) {
      val c = text.charAt(i)
      if (inSq) { out.append(c); if (c == '\\' && i + 1 < text.length) { out.append(text.charAt(i + 1)); i += 1 } else if (c == '\'') inSq = false; i += 1 }
      else if (inBq) { out.append(c); if (c == '`') inBq = false; i += 1 }
      else if (c == '\'') { inSq = true; out.append(c); i += 1 }
      else if (c == '`') { inBq = true; out.append(c); i += 1 }
      else if ((i == 0 || !(text.charAt(i - 1).isLetterOrDigit || text.charAt(i - 1) == '_' || text.charAt(i - 1) == '.')) &&
        text.regionMatches(true, i, alias, 0, alias.length) &&
        i + alias.length < text.length && text.charAt(i + alias.length) == '.') {
        out.append(repl)
        i += alias.length + 1
      }
      else { out.append(c); i += 1 }
    }
    out.result()
  }

  /** True when the select list carries a bare or qualified `*` at depth 0. */
  private def hasTopLevelStar(sel: String): Boolean = {
    var depth = 0; var inSq = false; var inBq = false; var i = 0
    while (i < sel.length) {
      val c = sel.charAt(i)
      if (inSq) { if (c == '\\') i += 1 else if (c == '\'') inSq = false }
      else if (inBq) { if (c == '`') inBq = false }
      else c match {
        case '\'' => inSq = true
        case '`' => inBq = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case '*' if depth == 0 =>
          // `*` as multiplication has operands on both sides; a select
          // star is preceded by start, comma, or a dot
          var j = i - 1
          while (j >= 0 && sel.charAt(j).isWhitespace) j -= 1
          if (j < 0 || sel.charAt(j) == ',' || sel.charAt(j) == '.') return true
        case _ =>
      }
      i += 1
    }
    false
  }

  /** `s` with every segment OUTSIDE single-quoted string literals mapped
    * through `f` (literals — including their quotes and escapes — pass
    * verbatim). Backticked identifiers are NOT literals and stay inside
    * the mapped segments.
    */
  private[client] def mapOutsideStrings(s: String)(f: String => String): String = {
    val out = new StringBuilder
    val seg = new StringBuilder
    var inSq = false
    var i = 0
    def flush(): Unit = { out.append(f(seg.result())); seg.clear() }
    while (i < s.length) {
      val c = s.charAt(i)
      if (inSq) {
        out.append(c)
        if (c == '\\' && i + 1 < s.length) { out.append(s.charAt(i + 1)); i += 1 }
        else if (c == '\'') inSq = false
        i += 1
      } else if (c == '\'') {
        flush(); inSq = true; out.append(c); i += 1
      } else { seg.append(c); i += 1 }
    }
    flush()
    out.result()
  }

  /** `s` with each top-level paren group's CONTENT replaced by
    * `g(content)` (quote-aware) — the shared recursion step for
    * statement-structure rewrites.
    */
  private def mapTopLevelParens(s: String)(g: String => String): String = {
    val out = new StringBuilder
    var i = 0; var inSq = false; var inBq = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inSq) { out.append(c); if (c == '\\' && i + 1 < s.length) { out.append(s.charAt(i + 1)); i += 1 } else if (c == '\'') inSq = false; i += 1 }
      else if (inBq) { out.append(c); if (c == '`') inBq = false; i += 1 }
      else if (c == '\'') { inSq = true; out.append(c); i += 1 }
      else if (c == '`') { inBq = true; out.append(c); i += 1 }
      else if (c == '(') {
        var depth = 1; var j = i + 1; var sq = false; var bq = false
        while (j < s.length && depth > 0) {
          val ch = s.charAt(j)
          if (sq) { if (ch == '\\') j += 1 else if (ch == '\'') sq = false }
          else if (bq) { if (ch == '`') bq = false }
          else ch match {
            case '\'' => sq = true
            case '`' => bq = true
            case '(' => depth += 1
            case ')' => depth -= 1
            case _ =>
          }
          j += 1
        }
        out.append('(').append(g(s.substring(i + 1, j - 1))).append(')')
        i = j
      }
      else { out.append(c); i += 1 }
    }
    out.result()
  }

  // ---- WITH TOTALS → GROUPING SETS rewrite ----------------------------
  //
  // `GROUP BY <keys> WITH TOTALS` adds one all-rows aggregate row. A real
  // server emits the totals as an out-of-band block in most formats; any
  // client that flattens them inline must mark the row somehow, and the
  // SQL-standard marking is NULL group keys — exactly what
  // `GROUP BY GROUPING SETS ((<keys>), ())` produces, and what the
  // DuckDB oracle's GROUPING SETS emits, so embedded results stay
  // hash-comparable. (A NULL-valued key group is then indistinguishable
  // from the totals row — the standard ROLLUP ambiguity, same contract.)
  //
  // WITH TOTALS + HAVING: the server's totals_mode setting decides which
  // rows feed the totals. The embedded engine PINS ONE HONEST MODE —
  // `after_having_exclusive` (totals aggregate ONLY rows of groups that
  // survive HAVING) — implemented by restricting base rows to the
  // surviving key groups (a LEFT SEMI JOIN on null-safe `<=>` key
  // equality, so NULL-keyed surviving groups keep their rows — an IN
  // subquery would silently drop them) and dropping the HAVING (every
  // restricted per-key group satisfies it by construction; the server
  // never filters the totals row itself).
  // [[graft.session.ClickHouseSession.chSql]] pins the same mode on
  // statements shipped to real servers, so the contract holds across
  // transports; `SETTINGS totals_mode = 'after_having_exclusive'` is
  // accepted (it names the implemented behavior), every other
  // totals_mode value rejects loudly.

  private def rewriteTotals(in: String): String = {
    if (!raw"(?i)\bTOTALS\b".r.findFirstIn(in).isDefined) return in
    mapTopLevelParens(rewriteTotalsLevel(in))(rewriteTotals)
  }

  private def rewriteTotalsLevel(s: String): String = {
    val tps = topLevelPositions(s, "TOTALS")
    if (tps.isEmpty) return s
    val tp = tps.head
    // require the preceding word WITH
    var w = tp - 1
    while (w >= 0 && s.charAt(w).isWhitespace) w -= 1
    val wp = w - 3
    require(wp >= 0 && s.regionMatches(true, wp, "WITH", 0, 4) &&
      (wp == 0 || !(s.charAt(wp - 1).isLetterOrDigit || s.charAt(wp - 1) == '_')),
      s"TOTALS without WITH near: ${s.substring(math.max(0, tp - 30), tp + 6)}")
    val gp = topLevelPositions(s, "GROUP").filter(_ < wp).lastOption.getOrElse(
      throw new IllegalArgumentException("WITH TOTALS requires GROUP BY"))
    val bym = raw"(?is)^GROUP\s+BY\s+".r.findFirstMatchIn(s.substring(gp)).getOrElse(
      throw new IllegalArgumentException("malformed GROUP BY before WITH TOTALS"))
    val keys = s.substring(gp + bym.end, wp).trim
    require(keys.nonEmpty, "WITH TOTALS: empty GROUP BY key list")
    val sets = s"GROUP BY GROUPING SETS (($keys), ())"
    topLevelPositions(s, "HAVING").find(_ > gp) match {
      case None =>
        rewriteTotalsLevel(s.substring(0, gp) + sets + s.substring(tp + 6))
      case Some(hv) =>
        require(hv > tp,
          "WITH TOTALS: HAVING must follow the GROUP BY ... WITH TOTALS " +
            "clause (ClickHouse clause order)")
        // pinned totals_mode = 'after_having_exclusive' (see header)
        val selPos = topLevelPositions(s, "SELECT").headOption.getOrElse(
          throw new IllegalArgumentException("WITH TOTALS outside a SELECT"))
        val fromPos = topLevelPositions(s, "FROM")
          .filter(p => p > selPos && p < gp).lastOption.getOrElse(
            throw new IllegalArgumentException(
              "WITH TOTALS + HAVING requires a FROM clause"))
        val hvEnd = Seq("ORDER", "LIMIT", "UNION", "SETTINGS", "FORMAT",
            "OFFSET", "WINDOW", "QUALIFY")
          .flatMap(k => topLevelPositions(s, k)).filter(_ > hv)
          .sorted.headOption.getOrElse(s.length)
        val cond = s.substring(hv + 6, hvEnd).trim
        require(cond.nonEmpty, "WITH TOTALS: empty HAVING condition")
        // FROM ... [WHERE ...] verbatim — reused for the surviving-group
        // probe (same source text, so the probe sees the same rows)
        val srcSeg = s.substring(fromPos, gp).trim
        val keyList = parseArgs("(" + keys + ")", 1)._1.map(_.trim)
        val probe = "SELECT " + keyList.zipWithIndex
          .map { case (k, i) => s"$k AS __totals_k$i" }.mkString(", ") +
          s" $srcSeg GROUP BY $keys HAVING $cond"
        // null-safe key equality: a NULL-keyed group surviving HAVING
        // must keep its rows (IN-subquery three-valued logic would drop
        // them). The semi join inserts between the source and the WHERE.
        val eqs = keyList.zipWithIndex.map { case (k, i) =>
          s"($k) <=> __totals_keep.__totals_k$i" }.mkString(" AND ")
        val semi = s" LEFT SEMI JOIN ($probe) AS __totals_keep ON $eqs"
        val joinAt = topLevelPositions(s, "WHERE")
          .find(p => p > fromPos && p < gp).getOrElse(gp)
        val headBase = s.substring(0, joinAt).replaceAll(raw"\s+$$", "")
        val whereSeg = s.substring(joinAt, gp).trim // "" or "WHERE ..."
        val head = headBase + semi +
          (if (whereSeg.isEmpty) " " else s" $whereSeg ")
        val tailStr =
          (s.substring(tp + 6, hv).trim + " " + s.substring(hvEnd).trim).trim
        rewriteTotalsLevel(head + sets +
          (if (tailStr.isEmpty) "" else " " + tailStr))
    }
  }

  // ---- QUALIFY → wrapped WHERE rewrite ---------------------------------
  //
  // ClickHouse `QUALIFY <cond>` filters rows AFTER window functions
  // evaluate (the window analog of HAVING). Spark has no QUALIFY, but the
  // equivalent is exact: wrap the statement-so-far in a subquery and
  // filter — the window results are ordinary columns there, and the
  // trailing ORDER BY / LIMIT stay OUTSIDE the wrap so they apply after
  // the filter (the server's clause order). Works at any depth via the
  // same top-level-paren recursion as the TOTALS rewrite.
  //
  // Honored-or-rejected: the condition must reference window results BY
  // SELECT ALIAS (an inline `OVER (...)` inside QUALIFY would need
  // injecting hidden columns into the select list — rejected loudly with
  // the alias workaround); one QUALIFY per SELECT level.

  private def rewriteQualify(in: String): String = {
    if (!raw"(?i)\bQUALIFY\b".r.findFirstIn(in).isDefined) return in
    mapTopLevelParens(rewriteQualifyLevel(in))(rewriteQualify)
  }

  private def rewriteQualifyLevel(s: String): String = {
    val qps = topLevelPositions(s, "QUALIFY")
    if (qps.isEmpty) return s
    // one QUALIFY per SELECT — but UNION branches share this paren level,
    // so rewrite the FIRST and recurse (its clause ends at the UNION
    // keyword, leaving later branches intact), like the TOTALS rewrite
    val qp = qps.head
    val qEnd = Seq("ORDER", "LIMIT", "UNION", "SETTINGS", "FORMAT", "OFFSET")
      .flatMap(k => topLevelPositions(s, k)).filter(_ > qp)
      .sorted.headOption.getOrElse(s.length)
    val cond = s.substring(qp + 7, qEnd).trim
    require(cond.nonEmpty, "QUALIFY: empty condition")
    // the wrap must be BRANCH-local: a QUALIFY in a later UNION branch
    // wraps only text after the preceding top-level UNION keyword, never
    // the already-rewritten earlier branches
    val branchStart = topLevelPositions(s, "UNION").filter(_ < qp)
      .lastOption.map { up =>
        var j = up + 5
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        val kw = Seq("ALL", "DISTINCT").find(k =>
          s.regionMatches(true, j, k, 0, k.length) &&
            (j + k.length >= s.length ||
              !(s.charAt(j + k.length).isLetterOrDigit || s.charAt(j + k.length) == '_')))
        kw.foreach { k =>
          j += k.length
          while (j < s.length && s.charAt(j).isWhitespace) j += 1
        }
        j
      }.getOrElse(0)
    val prefix = s.substring(0, branchStart)
    val core0 = s.substring(branchStart, qp).trim
    val tail = s.substring(qEnd).trim
    // inline `fn(...) OVER (...)` in the condition: hoist each distinct
    // window expression into the core's select list under a hidden
    // alias, reference the alias, and star-EXCEPT the hidden columns in
    // the wrap (both dialects parse `* EXCEPT (...)`)
    val (core, cond2, hidden) = hoistQualifyWindows(core0, cond)
    val sel =
      if (hidden.isEmpty) "*"
      else s"* EXCEPT (${hidden.mkString(", ")})"
    rewriteQualifyLevel(
      prefix + s"SELECT $sel FROM ($core) AS __qualify WHERE $cond2" +
        (if (tail.isEmpty) "" else " " + tail))
  }

  /** Word-boundary positions of `word` outside string/backtick quotes at
    * ANY paren depth (topLevelPositions' depth-0 restriction lifted).
    */
  private def wordPositionsAnyDepth(sql: String, word: String): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    var inSq = false
    var inBq = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inSq) { if (c == '\\') i += 1 else if (c == '\'') inSq = false }
      else if (inBq) { if (c == '`') inBq = false }
      else if (c == '\'') inSq = true
      else if (c == '`') inBq = true
      else if ((i == 0 || !(sql.charAt(i - 1).isLetterOrDigit || sql.charAt(i - 1) == '_')) &&
        sql.regionMatches(true, i, word, 0, word.length) &&
        (i + word.length >= sql.length ||
          !(sql.charAt(i + word.length).isLetterOrDigit ||
            sql.charAt(i + word.length) == '_')))
        out += i
      i += 1
    }
    out.result()
  }

  /** Hoist every inline `fn(args) OVER (spec)` / `fn(args) OVER name` in
    * a QUALIFY condition into the core's select list as hidden `__q_i`
    * aliases (window results are only addressable as columns of the
    * wrapped subquery). Named-window references keep working because the
    * hidden item lands in the same SELECT whose WINDOW clause defines
    * the name. DISTINCT cores reject — injecting hidden columns would
    * change the dedup key.
    */
  private def hoistQualifyWindows(
      core: String, cond: String): (String, String, Seq[String]) = {
    if (wordPositionsAnyDepth(cond, "OVER").isEmpty) return (core, cond, Seq.empty)
    require(!raw"(?is)^SELECT\s+DISTINCT\b".r.findFirstIn(core).isDefined,
      "QUALIFY with an inline window over a SELECT DISTINCT core is not " +
        "supported by the embedded rewrite (hidden hoisted columns would " +
        "change the dedup key); alias the window function in the SELECT " +
        "list and reference the alias in QUALIFY")
    val fromP = topLevelPositions(core, "FROM").headOption.getOrElse(
      throw new IllegalArgumentException(
        "QUALIFY with an inline window needs a FROM clause to hoist into"))
    var c = cond
    val exprs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var guard = 0
    while (wordPositionsAnyDepth(c, "OVER").nonEmpty && guard < 32) {
      guard += 1
      val at = wordPositionsAnyDepth(c, "OVER").head
      // backward: ')' closing the function's argument list, then the name
      var j = at - 1
      while (j >= 0 && c.charAt(j).isWhitespace) j -= 1
      require(j >= 0 && c.charAt(j) == ')',
        s"QUALIFY: cannot parse the window call before OVER in '$cond'")
      var d = 1
      var k = j - 1
      var sq = false
      while (k >= 0 && d > 0) {
        val ch = c.charAt(k)
        if (sq) { if (ch == '\'') sq = false }
        else if (ch == '\'') sq = true
        else if (ch == ')') d += 1
        else if (ch == '(') d -= 1
        if (d > 0) k -= 1
      }
      require(k > 0, s"QUALIFY: unbalanced window call in '$cond'")
      var f = k - 1
      while (f >= 0 && (c.charAt(f).isLetterOrDigit || c.charAt(f) == '_')) f -= 1
      require(f < k - 1,
        s"QUALIFY: cannot parse the window function name in '$cond'")
      val start = f + 1
      // forward: `(spec)` group or a bare window name
      var p = at + 4
      while (p < c.length && c.charAt(p).isWhitespace) p += 1
      val end =
        if (p < c.length && c.charAt(p) == '(') {
          var dd = 1
          var q = p + 1
          var sq2 = false
          while (q < c.length && dd > 0) {
            val ch = c.charAt(q)
            if (sq2) { if (ch == '\'') sq2 = false }
            else if (ch == '\'') sq2 = true
            else if (ch == '(') dd += 1
            else if (ch == ')') dd -= 1
            q += 1
          }
          require(dd == 0, s"QUALIFY: unbalanced OVER spec in '$cond'")
          q
        } else {
          var q = p
          while (q < c.length && (c.charAt(q).isLetterOrDigit || c.charAt(q) == '_')) q += 1
          require(q > p, s"QUALIFY: OVER needs a (spec) or window name in '$cond'")
          q
        }
      val winExpr = c.substring(start, end)
      val alias = exprs.getOrElseUpdate(winExpr, s"__q_${exprs.size}")
      c = c.substring(0, start) + alias + c.substring(end)
    }
    require(guard < 32, s"QUALIFY: too many inline windows in '$cond'")
    val injected = exprs.map { case (e, a) => s"$e AS $a" }.mkString(", ")
    val core2 = core.substring(0, fromP).replaceAll(raw"\s+$$", "") +
      s", $injected " + core.substring(fromP)
    (core2, c, exprs.values.toSeq)
  }

  // ---- SETTINGS clause handling (embedded) ----------------------------
  //
  // A real server accepts `SETTINGS name = value` on any SELECT. The
  // embedded engine honors-or-rejects: settings that only tune
  // PERFORMANCE or RESOURCE use (threads, block sizes, memory / spill
  // thresholds, caches, read order) are identities on the visible result
  // and are dropped; anything else — including result-shaping settings
  // like join_use_nulls, totals_mode, group_by_use_nulls, limits that
  // cut result rows — REJECTS loudly by name rather than silently
  // changing semantics. (The ASOF rewrite consumes its own
  // join_use_nulls = 1 before this runs.)

  private val IdentitySettings: Set[String] = Set(
    "max_threads", "max_block_size", "max_insert_block_size",
    "max_memory_usage", "preferred_block_size_bytes",
    "use_uncompressed_cache", "optimize_read_in_order",
    "max_bytes_before_external_group_by", "max_bytes_before_external_sort",
    "max_execution_time", "priority", "network_compression_method")

  private def rewriteSettings(in: String): String = {
    if (!raw"(?i)\bSETTINGS\b".r.findFirstIn(in).isDefined) return in
    mapTopLevelParens(rewriteSettingsLevel(in))(rewriteSettings)
  }

  private def rewriteSettingsLevel(s: String): String = {
    val sp = topLevelPositions(s, "SETTINGS").headOption.getOrElse(return s)
    // the clause runs to the next top-level clause keyword (in our
    // dialect SETTINGS is trailing; UNION branches carry their own)
    val end = Seq("UNION", "FORMAT").flatMap(k => topLevelPositions(s, k))
      .filter(_ > sp).sorted.headOption.getOrElse(s.length)
    val body = s.substring(sp + 8, end).trim.stripSuffix(";").trim
    val items = body.split(",").map(_.trim).filter(_.nonEmpty)
    val offenders = items.flatMap { it =>
      val Array(name0, value0 @ _*) = it.split("=", 2).map(_.trim): @unchecked
      val name = name0.toLowerCase
      val value = value0.headOption.getOrElse("")
        .stripPrefix("'").stripSuffix("'").trim.toLowerCase
      if (IdentitySettings.contains(name)) None
      // totals_mode: 'after_having_exclusive' IS the implemented embedded
      // behavior (the pinned WITH TOTALS + HAVING mode) — accepted and
      // dropped; any other mode would silently change totals semantics
      else if (name == "totals_mode" && value == "after_having_exclusive") None
      else Some(name)
    }
    require(offenders.isEmpty,
      s"SETTINGS not supported by the embedded engine: " +
        s"${offenders.mkString(", ")} — only performance/resource " +
        "settings (" + IdentitySettings.toSeq.sorted.take(4).mkString(", ") +
        ", ...) are accepted (and dropped as identities); result-shaping " +
        "settings would silently change semantics")
    rewriteSettingsLevel(
      s.substring(0, sp).stripSuffix(" ").stripSuffix("\n") + " " +
        s.substring(end))
  }

  private val GlobalFollowers = Seq(
    "IN", "NOT", "JOIN", "LEFT", "RIGHT", "INNER", "FULL", "CROSS",
    "ANY", "ALL")

  /** Strip `GLOBAL` distribution hints (identity on a single execution
    * domain) quote-aware at ANY paren depth: `GLOBAL IN`, `GLOBAL NOT
    * IN`, `GLOBAL <join kw>`. A raw regex would rewrite string literals
    * containing the word GLOBAL (round-11 bug, advisor-flagged).
    */
  private def stripGlobal(in: String): String = {
    val out = new StringBuilder
    var inSq = false
    var inBq = false
    var i = 0
    def wordAt(at: Int, w: String): Boolean =
      (at == 0 || !(in.charAt(at - 1).isLetterOrDigit || in.charAt(at - 1) == '_')) &&
        in.regionMatches(true, at, w, 0, w.length) &&
        (at + w.length >= in.length ||
          !(in.charAt(at + w.length).isLetterOrDigit || in.charAt(at + w.length) == '_'))
    while (i < in.length) {
      val c = in.charAt(i)
      if (inSq) { out.append(c); if (c == '\\' && i + 1 < in.length) { out.append(in.charAt(i + 1)); i += 1 } else if (c == '\'') inSq = false; i += 1 }
      else if (inBq) { out.append(c); if (c == '`') inBq = false; i += 1 }
      else if (c == '\'') { inSq = true; out.append(c); i += 1 }
      else if (c == '`') { inBq = true; out.append(c); i += 1 }
      else if (wordAt(i, "GLOBAL")) {
        var j = i + 6
        while (j < in.length && in.charAt(j).isWhitespace) j += 1
        if (GlobalFollowers.exists(wordAt(j, _))) i = j // drop GLOBAL + ws
        else { out.append(c); i += 1 }
      }
      else { out.append(c); i += 1 }
    }
    out.result()
  }

  /** Fold every top-level `PREWHERE p` into the WHERE clause:
    * `PREWHERE p WHERE w` → `WHERE (p) AND (w)`, bare `PREWHERE p` →
    * `WHERE p`. One fold per pass; loops until none remain (UNION
    * branches at the top level each get their own). Subquery-nested
    * PREWHERE is left for Spark to reject loudly.
    */
  private def foldPrewhere(in: String): String = {
    val pws = topLevelPositions(in, "PREWHERE")
    if (pws.isEmpty) return in
    val at = pws.head
    val after = at + "PREWHERE".length
    val end = ClauseKws.flatMap(k => topLevelPositions(in, k))
      .filter(_ > at).sorted.headOption.getOrElse(in.length)
    val expr = in.substring(after, end).trim
    val prefix = in.substring(0, at)
    val folded =
      if (end < in.length && in.regionMatches(true, end, "WHERE", 0, 5)) {
        val end2 = ClauseKws.filterNot(_ == "WHERE")
          .flatMap(k => topLevelPositions(in, k))
          .filter(_ > end).sorted.headOption.getOrElse(in.length)
        val w = in.substring(end + 5, end2).trim
        s"${prefix}WHERE ($expr) AND ($w)${if (end2 < in.length) " " + in.substring(end2) else ""}"
      } else s"${prefix}WHERE $expr${if (end < in.length) " " + in.substring(end) else ""}"
    foldPrewhere(folded)
  }

  /** A parsed top-level `LIMIT n WITH TIES`: core is the statement with
    * the ORDER BY and the LIMIT clause removed; orderBy defines the tie
    * groups (required — WITH TIES without an order is meaningless and
    * the server errors too).
    */
  final case class WithTiesParts(core: String, orderBy: String, n: Long)

  private val WithTiesHead = raw"(?is)^LIMIT\s+(\d+)\s+WITH\s+TIES\s*;?\s*$$".r

  /** Some(parts) when `sql` ends in a top-level `LIMIT n WITH TIES`
    * (server semantics: keep every row tying the last in-limit row on
    * the ORDER BY key). Nested WITH TIES rejects loudly like LIMIT BY.
    */
  def parseWithTies(sql: String): Option[WithTiesParts] = {
    val hit = topLevelPositions(sql, "LIMIT").flatMap(at =>
      WithTiesHead.findFirstMatchIn(sql.substring(at)).map(m => (at, m)))
    if (hit.isEmpty) {
      if (raw"(?is)LIMIT\s+\d+\s+WITH\s+TIES".r.findFirstIn(sql).isDefined)
        throw new IllegalArgumentException(
          "LIMIT ... WITH TIES inside a subquery is not supported by the " +
            "embedded rewrite (top-level only); restructure the statement " +
            "or run against a real server")
      return None
    }
    val (at, m) = hit.head
    val ob = topLevelPositions(sql, "ORDER")
      .filter(p => p < at && OrderByHead.findFirstIn(sql.substring(p)).isDefined)
      .headOption.getOrElse(throw new IllegalArgumentException(
        "LIMIT ... WITH TIES requires a top-level ORDER BY (the ties are " +
          "defined by the sort key)"))
    val obM = OrderByHead.findFirstMatchIn(sql.substring(ob)).get
    val orderBy = sql.substring(ob + obM.end, at).trim
    require(orderBy.nonEmpty, "LIMIT ... WITH TIES: empty ORDER BY")
    Some(WithTiesParts(sql.substring(0, ob).trim, orderBy, m.group(1).toLong))
  }

  /** A parsed top-level `ORDER BY <col> [ASC] WITH FILL [FROM i] [TO i]
    * [STEP i]`: `core` is the statement with the WITH FILL decoration
    * removed (ORDER BY retained); TO is EXCLUSIVE (server semantics),
    * omitted bounds come from the result's own min/max (inclusive).
    */
  final case class WithFillParts(
      core: String, col: String,
      /** Bound literals verbatim: a bare integer or a quoted date
        * ('YYYY-MM-DD') — the fill composer type-checks them against the
        * fill column.
        */
      from: Option[String], to: Option[String],
      /** Step count (default 1) and, for `STEP INTERVAL n <unit>`, the
        * calendar unit (DAY/WEEK/MONTH/YEAR) — None for a numeric step.
        */
      stepN: Long, stepUnit: Option[String],
      /** Columns carrying the PREVIOUS value across fill rows
        * (`INTERPOLATE (c1, c2)` — the no-AS form; expressions reject).
        */
      interpolate: Seq[String] = Seq.empty)

  private val FillTail =
    (raw"(?is)^(?:\s+FROM\s+(-?\d+|'[^']*'))?(?:\s+TO\s+(-?\d+|'[^']*'))?" +
      raw"(?:\s+STEP\s+(?:(\d+)|INTERVAL\s+(\d+)\s+(DAY|WEEK|MONTH|YEAR)))?").r

  /** Some(parts) for the supported top-level WITH FILL shape: exactly
    * one ORDER BY item, a bare ascending column, integer literal
    * bounds/step, at most a trailing SETTINGS clause. Anything else
    * (DESC, expressions, INTERPOLATE, trailing LIMIT, multiple sort
    * items) rejects loudly — and WITH FILL that never reaches this
    * parser (nested in a subquery) rejects in the translator.
    */
  def parseWithFill(sql: String): Option[WithFillParts] = {
    val fp = topLevelPositions(sql, "FILL").headOption.getOrElse(return None)
    // require the preceding word WITH (same shape as the TOTALS parse)
    var w = fp - 1
    while (w >= 0 && sql.charAt(w).isWhitespace) w -= 1
    val wp = w - 3
    if (!(wp >= 0 && sql.regionMatches(true, wp, "WITH", 0, 4) &&
      (wp == 0 || !(sql.charAt(wp - 1).isLetterOrDigit || sql.charAt(wp - 1) == '_'))))
      return None
    val ob = topLevelPositions(sql, "ORDER")
      .filter(p => p < wp && OrderByHead.findFirstIn(sql.substring(p)).isDefined)
      .lastOption.getOrElse(throw new IllegalArgumentException(
        "WITH FILL requires an ORDER BY"))
    val obM = OrderByHead.findFirstMatchIn(sql.substring(ob)).get
    var item = sql.substring(ob + obM.end, wp).trim
    require(!raw"(?i)\bDESC\b".r.findFirstIn(item).isDefined,
      "WITH FILL DESC is not supported by the embedded rewrite " +
        "(ascending fills only); sort the filled result afterwards")
    item = raw"(?i)\s+ASC$$".r.replaceAllIn(item, "")
    require(!item.contains(","),
      "WITH FILL is supported embedded only as the SOLE ORDER BY item")
    require(item.matches(raw"`[^`]+`|\w+"),
      s"WITH FILL embedded needs a bare output column to fill, got: $item")
    val m = FillTail.findFirstMatchIn(sql.substring(fp + 4)).get
    var rest = sql.substring(fp + 4 + m.end).trim.stripSuffix(";").trim
    // INTERPOLATE (c1, c2, ...) — previous-value carry on fill rows.
    // Only the no-AS form is modeled (expression interpolation chains
    // through previously interpolated rows — rejected, not faked).
    var interp = Seq.empty[String]
    if (rest.toUpperCase.startsWith("INTERPOLATE")) {
      val afterKw = rest.substring("INTERPOLATE".length).trim
      require(afterKw.startsWith("("),
        "INTERPOLATE requires a parenthesized column list")
      val (args, past) = parseArgs(afterKw, 1)
      interp = args.map(_.trim)
      require(interp.nonEmpty, "INTERPOLATE: empty column list")
      require(interp.forall(_.matches(raw"`[^`]+`|\w+")),
        "INTERPOLATE with an AS expression is not modeled by the " +
          "embedded engine (expression carries chain through previously " +
          "interpolated rows); only the previous-value form " +
          s"INTERPOLATE (col, ...) is: ${interp.mkString(", ")}")
      rest = afterKw.substring(past).trim.stripSuffix(";").trim
    }
    require(rest.isEmpty || rest.toUpperCase.startsWith("SETTINGS"),
      s"WITH FILL embedded supports at most INTERPOLATE (cols) and a " +
        s"trailing SETTINGS clause (LIMIT after the fill is not " +
        s"modeled): '$rest'")
    val stepN = Option(m.group(3)).orElse(Option(m.group(4)))
      .map(_.toLong).getOrElse(1L)
    require(stepN > 0, s"WITH FILL STEP must be positive: $stepN")
    Some(WithFillParts(
      sql.substring(0, wp).trim + (if (rest.isEmpty) "" else " " + rest),
      item,
      Option(m.group(1)),
      Option(m.group(2)),
      stepN,
      Option(m.group(5)).map(_.toUpperCase),
      interp))
  }

  private val DistinctOnHead = raw"(?is)^SELECT\s+DISTINCT\s+ON\s*\(".r

  /** `SELECT DISTINCT ON (exprs) cols ...` → `SELECT cols ... LIMIT 1 BY
    * exprs` (the server documents DISTINCT ON as exactly this sugar), so
    * the existing LIMIT BY row_number rewrite executes it — including its
    * determinism rule: a top-level ORDER BY is REQUIRED (without one the
    * server keeps an arbitrary row per group, which is not reproducible).
    * Top-level only; DISTINCT ON inside a subquery rejects loudly like
    * nested LIMIT BY. Returns `sql` unchanged when the clause is absent.
    */
  def rewriteDistinctOn(sql: String): String = {
    val sel = topLevelPositions(sql, "SELECT").find(at =>
      DistinctOnHead.findFirstIn(sql.substring(at)).isDefined)
    if (sel.isEmpty) {
      if (raw"(?is)\bDISTINCT\s+ON\s*\(".r.findFirstIn(sql).isDefined)
        throw new IllegalArgumentException(
          "DISTINCT ON inside a subquery is not supported by the embedded " +
            "rewrite (top-level only); restructure the statement or run " +
            "against a real server")
      return sql
    }
    val at = sel.get
    val m = DistinctOnHead.findFirstMatchIn(sql.substring(at)).get
    val (exprs, past) = parseArgs(sql, at + m.end)
    require(exprs.nonEmpty, "DISTINCT ON: empty expression list")
    if (raw"(?is)\bLIMIT\s+\d+(?:\s+OFFSET\s+\d+)?\s+BY\s".r
      .findFirstIn(sql).isDefined)
      throw new IllegalArgumentException(
        "DISTINCT ON combined with LIMIT BY is not supported by the " +
          "embedded rewrite (DISTINCT ON is itself LIMIT 1 BY — express " +
          "the statement with a single LIMIT BY clause)")
    if (topLevelPositions(sql, "UNION").nonEmpty)
      throw new IllegalArgumentException(
        "DISTINCT ON over a top-level UNION is not supported by the " +
          "embedded rewrite; wrap each branch in a subquery")
    if (topLevelPositions(sql, "ORDER").isEmpty)
      throw new IllegalArgumentException(
        "DISTINCT ON without a top-level ORDER BY keeps an arbitrary row " +
          "per group — add an ORDER BY for a deterministic read")
    val stripped =
      sql.substring(0, at) + "SELECT " + sql.substring(past).trim
    // the LIMIT 1 BY clause slots before any trailing top-level LIMIT /
    // SETTINGS (clause order a server accepts); otherwise at the end
    val tailAt = (topLevelPositions(stripped, "LIMIT") ++
      topLevelPositions(stripped, "SETTINGS")).sorted.headOption
    val byTxt = s"LIMIT 1 BY ${exprs.mkString(", ")}"
    tailAt match {
      case Some(p) =>
        stripped.substring(0, p).trim + s" $byTxt " + stripped.substring(p)
      case None =>
        stripped.trim.stripSuffix(";").trim + s" $byTxt"
    }
  }

  /** Some(parts) when `sql` carries a top-level `LIMIT n [OFFSET o] BY`
    * clause; None otherwise. A LIMIT BY nested in a subquery is rejected
    * loudly (the embedded rewrite handles the top level only — a server
    * handles both, so silence would be a lie).
    */
  def parseLimitBy(sql: String): Option[LimitByParts] = {
    val limits = topLevelPositions(sql, "LIMIT")
    val lb = limits.flatMap(at =>
      LimitByHead.findFirstMatchIn(sql.substring(at)).map(m => (at, m)))
    if (lb.isEmpty) {
      // nested LIMIT BY (inside a subquery) has no rewrite — honored-or-
      // rejected: fail loudly rather than hand Spark unparseable SQL
      if (raw"(?is)LIMIT\s+\d+(?:\s+OFFSET\s+\d+)?\s+BY\s".r
        .findFirstIn(sql).isDefined)
        throw new IllegalArgumentException(
          "LIMIT BY inside a subquery is not supported by the embedded " +
            "rewrite (top-level only); restructure the statement or run " +
            "against a real server")
      return None
    }
    val (at, m) = lb.head
    val byStart = at + m.end
    // the BY expression list runs to the next top-level LIMIT (or end)
    val nextLimit = limits.find(_ > at)
    val byEnd = nextLimit.getOrElse(sql.length)
    val by = sql.substring(byStart, byEnd).trim.stripSuffix(";").trim
    require(by.nonEmpty, "LIMIT BY: empty expression list")
    val outer = nextLimit.map { nl =>
      val rest = sql.substring(nl).trim
      require(PlainLimit.findFirstIn(rest).isDefined,
        s"LIMIT BY: unsupported trailing clause '$rest'")
      rest.stripSuffix(";").trim
    }
    // top-level ORDER BY before the LIMIT BY clause defines the
    // selection order within each group (server semantics)
    val ob = topLevelPositions(sql, "ORDER")
      .filter(p => p < at && OrderByHead.findFirstIn(sql.substring(p)).isDefined)
      .headOption
    val (core, orderBy) = ob match {
      case Some(p) =>
        val obM = OrderByHead.findFirstMatchIn(sql.substring(p)).get
        (sql.substring(0, p).trim,
          Some(sql.substring(p + obM.end, at).trim).filter(_.nonEmpty))
      case None => (sql.substring(0, at).trim, None)
    }
    Some(LimitByParts(core, m.group(1).toLong,
      Option(m.group(2)).map(_.toLong).getOrElse(0L), by, orderBy, outer))
  }

  /** Parse balanced argument list starting just after '('; returns
    * (top-level args, index just past the closing paren).
    */
  private[client] def parseArgs(s: String, start: Int): (Seq[String], Int) = {
    var depth = 1
    // square-bracket literals (`[1, 2]`) carry top-level commas that are
    // NOT argument separators — arrayMap(x -> x, [1, 2]) must parse as
    // two args, not three (round-13 session-3 fix; the mangled split
    // produced unbalanced Spark SQL)
    var bDepth = 0
    var i = start
    var inStr = false
    var inBq = false
    val args = Seq.newBuilder[String]
    val cur = new StringBuilder
    while (i < s.length && depth > 0) {
      val c = s.charAt(i)
      if (inStr) {
        cur.append(c); if (c == '\'') inStr = false
      } else if (inBq) {
        cur.append(c); if (c == '`') inBq = false
      } else c match {
        case '\'' => inStr = true; cur.append(c)
        case '`' => inBq = true; cur.append(c)
        case '(' => depth += 1; cur.append(c)
        case '[' => bDepth += 1; cur.append(c)
        case ']' => bDepth -= 1; cur.append(c)
        case ')' =>
          depth -= 1
          if (depth == 0) { args += cur.result().trim } else cur.append(c)
        case ',' if depth == 1 && bDepth == 0 =>
          args += cur.result().trim; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    (args.result().filter(_.nonEmpty), i)
  }
}
