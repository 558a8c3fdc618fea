package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse's simpleJSON* / visitParam* byte-scanner family for the
  * embedded engine — the log-parsing idiom the server documents as a
  * DELIBERATELY simplified scanner, not a JSON parser (VERDICT r15
  * item 1; reference surface: every spelling flows through the
  * passthrough UDF, /root/reference/src/udfs/placeholder.rs:22-74).
  *
  * The documented scanner law (ClickHouse docs, "Functions for working
  * with JSON", simpleJSON section — all of it public spec):
  *
  *  1. The field is located as the FIRST byte occurrence of the needle
  *     `"name":` anywhere in the string, at any nesting level, with no
  *     canonical-encoding awareness (`{"abc":1}` does NOT match
  *     'abc') and no whitespace tolerance (assumption 4: the JSON has
  *     no spaces outside string literals).
  *  2. The value starts immediately after the colon. Per-function laws:
  *     - Has: 1 when the needle occurs, else 0 (value not inspected).
  *     - ExtractUInt/Int: an optional opening '"' is skipped, then an
  *       integer is read from the front of the value (sign accepted —
  *       '-' yields 0 for UInt; parsing stops at the first non-digit,
  *       so `"4e3"` → 4 and `-3.4` → -3 per the documented examples);
  *       missing field or no leading digits → 0.
  *     - ExtractFloat: same front-read with the decimal float grammar
  *       `[+-]?(digits[.digits*]|.digits)[eE[+-]digits]` — `"4e3"` →
  *       4000. The server parses via fast_float, which also accepts
  *       inf/nan spellings; whether a given server build does is not
  *       pinnable offline, so a value starting (after the sign) with
  *       'inf'/'nan' (any case) REJECTS loudly instead of guessing.
  *     - ExtractBool: 1 only when the value starts with the literal
  *       bytes `true` (the quoted string `"true"` is 0, per the
  *       documented example); everything else 0.
  *     - ExtractRaw: the value verbatim, separators included (objects/
  *       arrays/quoted strings whole), scanned with a bracket/quote
  *       balance stack; a top-level ',' or '}' terminates; end of input
  *       returns what was scanned. Inside strings a backslash skips the
  *       next byte (the standard JSON escape skip; the server source's
  *       skip is equivalent on well-formed escapes — backslash handling
  *       on MALFORMED escape tails is not pinned here).
  *     - ExtractString: empty string unless the value starts with '"';
  *       the quoted body is unescaped per the strict JSON escape set
  *       (quote, backslash, slash, b, f, n, r, t, and backslash-u-hex4
  *       incl. UTF-16 surrogate pairs); ANY unescaping failure —
  *       unknown escape, short hex4, unpaired surrogate, unterminated
  *       string — returns '' (the documented law: a 3-digit hex escape
  *       → '', the smiley escape 263a → '☺', `{"foo":"hello}` → '').
  *  3. Integer overflow past the result width is NOT a pinnable server
  *     law offline (the server's unchecked read wraps on some versions)
  *     — it rejects loudly here, like gcd(0,0).
  *
  * Result types follow the server: Has/Bool → UInt8 (IntegerType 0/1),
  * ExtractUInt → UInt64 (Decimal(20,0), the repo's UInt64 rep),
  * ExtractInt → Int64, ExtractFloat → Float64, Raw/String → String.
  */
object GraftSimpleJson {

  /** Index of the first byte AFTER `"name":`, or -1 when absent. */
  def valueStart(json: Array[Byte], name: Array[Byte]): Int = {
    val nl = name.length
    val limit = json.length - nl - 3
    var i = 0
    while (i <= limit) {
      if (json(i) == '"' && json(i + nl + 1) == '"' && json(i + nl + 2) == ':') {
        var j = 0
        while (j < nl && json(i + 1 + j) == name(j)) j += 1
        if (j == nl) return i + nl + 3
      }
      i += 1
    }
    -1
  }

  def sjHas(json: UTF8String, name: UTF8String): Int =
    if (valueStart(json.getBytes, name.getBytes) >= 0) 1 else 0

  /** Digit-span front-read shared by UInt/Int: (endIndex, spanStart) or
    * null-like (-1, -1) when no digits.
    */
  private def digitSpan(b: Array[Byte], from: Int): (Int, Int) = {
    var i = from
    while (i < b.length && b(i) >= '0' && b(i) <= '9') i += 1
    if (i == from) (-1, -1) else (from, i)
  }

  def sjUInt(json: UTF8String, name: UTF8String): Decimal = {
    val b = json.getBytes
    var pos = valueStart(b, name.getBytes)
    if (pos < 0) return Decimal(0L, 20, 0)
    if (pos < b.length && b(pos) == '"') pos += 1
    if (pos < b.length && b(pos) == '+') pos += 1
    val (s, e) = digitSpan(b, pos)
    if (s < 0) return Decimal(0L, 20, 0)
    val bi = new java.math.BigInteger(new String(b, s, e - s,
      java.nio.charset.StandardCharsets.US_ASCII))
    if (bi.bitLength() > 64) throw new IllegalArgumentException(
      "simpleJSONExtractUInt: the value exceeds UInt64 — the server's " +
        "overflow law is not pinnable offline; run against a real server")
    GraftHashes.uDec(bi.longValue())
  }

  def sjInt(json: UTF8String, name: UTF8String): Long = {
    val b = json.getBytes
    var pos = valueStart(b, name.getBytes)
    if (pos < 0) return 0L
    if (pos < b.length && b(pos) == '"') pos += 1
    var neg = false
    if (pos < b.length && (b(pos) == '+' || b(pos) == '-')) {
      neg = b(pos) == '-'
      pos += 1
    }
    val (s, e) = digitSpan(b, pos)
    if (s < 0) return 0L
    try {
      val v = java.lang.Long.parseLong(new String(b, s, e - s,
        java.nio.charset.StandardCharsets.US_ASCII))
      if (neg) -v else v
    } catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        "simpleJSONExtractInt: the value exceeds Int64 — the server's " +
          "overflow law is not pinnable offline; run against a real server")
    }
  }

  def sjFloat(json: UTF8String, name: UTF8String): Double = {
    val b = json.getBytes
    var pos = valueStart(b, name.getBytes)
    if (pos < 0) return 0.0
    if (pos < b.length && b(pos) == '"') pos += 1
    var i = pos
    if (i < b.length && (b(i) == '+' || b(i) == '-')) i += 1
    // inf/nan spellings: fast_float-version-dependent — reject loudly
    if (i + 2 < b.length) {
      val c0 = b(i) | 0x20
      if ((c0 == 'i' && (b(i + 1) | 0x20) == 'n' && (b(i + 2) | 0x20) == 'f') ||
        (c0 == 'n' && (b(i + 1) | 0x20) == 'a' && (b(i + 2) | 0x20) == 'n'))
        throw new IllegalArgumentException(
          "simpleJSONExtractFloat: inf/nan value spellings are not a " +
            "pinnable server law offline — run against a real server")
    }
    val intS = i
    while (i < b.length && b(i) >= '0' && b(i) <= '9') i += 1
    val hasInt = i > intS
    var hasFrac = false
    if (i < b.length && b(i) == '.') {
      val fs = i + 1
      var j = fs
      while (j < b.length && b(j) >= '0' && b(j) <= '9') j += 1
      if (hasInt || j > fs) { hasFrac = true; i = j }
    }
    if (!hasInt && !hasFrac) return 0.0
    if (i < b.length && (b(i) == 'e' || b(i) == 'E')) {
      var j = i + 1
      if (j < b.length && (b(j) == '+' || b(j) == '-')) j += 1
      val es = j
      while (j < b.length && b(j) >= '0' && b(j) <= '9') j += 1
      if (j > es) i = j // exponent valid only with at least one digit
    }
    java.lang.Double.parseDouble(new String(b, pos, i - pos,
      java.nio.charset.StandardCharsets.US_ASCII))
  }

  def sjBool(json: UTF8String, name: UTF8String): Int = {
    val b = json.getBytes
    val pos = valueStart(b, name.getBytes)
    if (pos >= 0 && pos + 4 <= b.length && b(pos) == 't' &&
      b(pos + 1) == 'r' && b(pos + 2) == 'u' && b(pos + 3) == 'e') 1
    else 0
  }

  def sjRaw(json: UTF8String, name: UTF8String): UTF8String = {
    val b = json.getBytes
    val start = valueStart(b, name.getBytes)
    if (start < 0) return UTF8String.EMPTY_UTF8
    // balance stack of expected closers (']' '}' '"')
    var stack = new Array[Byte](8)
    var depth = 0
    var i = start
    while (i < b.length) {
      val c = b(i)
      if (depth > 0 && stack(depth - 1) == '"') {
        if (c == '\\' && i + 1 < b.length) i += 2
        else {
          if (c == '"') depth -= 1
          i += 1
        }
      } else if (depth > 0 && c == stack(depth - 1)) { depth -= 1; i += 1 }
      else {
        c match {
          case '[' | '{' | '"' =>
            if (depth == stack.length) stack = java.util.Arrays.copyOf(stack, depth * 2)
            stack(depth) = if (c == '[') ']' else if (c == '{') '}' else '"'
            depth += 1
          case ',' | '}' if depth == 0 =>
            return UTF8String.fromBytes(b, start, i - start)
          case _ =>
        }
        i += 1
      }
    }
    UTF8String.fromBytes(b, start, b.length - start)
  }

  def sjString(json: UTF8String, name: UTF8String): UTF8String = {
    val b = json.getBytes
    val pos = valueStart(b, name.getBytes)
    if (pos < 0 || pos >= b.length || b(pos) != '"') return UTF8String.EMPTY_UTF8
    val out = new java.io.ByteArrayOutputStream(32)
    var i = pos + 1
    while (i < b.length) {
      val c = b(i)
      if (c == '"') return UTF8String.fromBytes(out.toByteArray)
      if (c == '\\') {
        if (i + 1 >= b.length) return UTF8String.EMPTY_UTF8
        b(i + 1) match {
          case '"' => out.write('"'); i += 2
          case '\\' => out.write('\\'); i += 2
          case '/' => out.write('/'); i += 2
          case 'b' => out.write('\b'); i += 2
          case 'f' => out.write('\f'); i += 2
          case 'n' => out.write('\n'); i += 2
          case 'r' => out.write('\r'); i += 2
          case 't' => out.write('\t'); i += 2
          case 'u' =>
            val cp = readHex4(b, i + 2)
            if (cp < 0) return UTF8String.EMPTY_UTF8
            if (cp >= 0xD800 && cp <= 0xDBFF) {
              // high surrogate: a second backslash-u-hex4 must follow
              if (i + 11 >= b.length || b(i + 6) != '\\' || b(i + 7) != 'u')
                return UTF8String.EMPTY_UTF8
              val lo = readHex4(b, i + 8)
              if (lo < 0xDC00 || lo > 0xDFFF) return UTF8String.EMPTY_UTF8
              writeUtf8(out, 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00))
              i += 12
            } else if (cp >= 0xDC00 && cp <= 0xDFFF) {
              return UTF8String.EMPTY_UTF8 // lone low surrogate
            } else {
              writeUtf8(out, cp)
              i += 6
            }
          case _ => return UTF8String.EMPTY_UTF8 // unknown escape: strict law
        }
      } else {
        out.write(c)
        i += 1
      }
    }
    UTF8String.EMPTY_UTF8 // unterminated
  }

  /** Parse 4 hex digits at `at`; -1 when short or non-hex. */
  private def readHex4(b: Array[Byte], at: Int): Int = {
    if (at + 4 > b.length) return -1
    var v = 0
    var i = at
    while (i < at + 4) {
      val c = b(i)
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else return -1
      v = (v << 4) | d
      i += 1
    }
    v
  }

  /** UTF-8 encode one codepoint (callers never pass surrogates). */
  private def writeUtf8(out: java.io.ByteArrayOutputStream, cp: Int): Unit = {
    if (cp < 0x80) out.write(cp)
    else if (cp < 0x800) {
      out.write(0xC0 | (cp >> 6)); out.write(0x80 | (cp & 0x3F))
    } else if (cp < 0x10000) {
      out.write(0xE0 | (cp >> 12)); out.write(0x80 | ((cp >> 6) & 0x3F))
      out.write(0x80 | (cp & 0x3F))
    } else {
      out.write(0xF0 | (cp >> 18)); out.write(0x80 | ((cp >> 12) & 0x3F))
      out.write(0x80 | ((cp >> 6) & 0x3F)); out.write(0x80 | (cp & 0x3F))
    }
  }
}

/** Which member of the simpleJSON family a [[ChSimpleJson]] computes. */
object ChSimpleJsonMode extends Enumeration {
  val Has, UIntM, IntM, FloatM, Bool, Raw, Str = Value
}

/** simpleJSON* / visitParam* scanner (laws in [[GraftSimpleJson]]'s
  * scaladoc). The field name must be foldable — the server requires a
  * constant field name, and accepting a per-row name here would be a
  * silent superset of the server surface.
  */
case class ChSimpleJson(left: Expression, right: Expression,
    mode: ChSimpleJsonMode.Value) extends BinaryExpression {

  override def dataType: DataType = mode match {
    case ChSimpleJsonMode.Has | ChSimpleJsonMode.Bool => IntegerType
    case ChSimpleJsonMode.UIntM => DecimalType(20, 0)
    case ChSimpleJsonMode.IntM => LongType
    case ChSimpleJsonMode.FloatM => DoubleType
    case ChSimpleJsonMode.Raw | ChSimpleJsonMode.Str => StringType
  }

  override def prettyName: String = "ch_simplejson_" +
    mode.toString.toLowerCase.stripSuffix("m")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes (json STRING, name STRING) — got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: the field name must be a constant (the server law)")
    else TypeCheckResult.TypeCheckSuccess

  private def kernel: String = mode match {
    case ChSimpleJsonMode.Has => "sjHas"
    case ChSimpleJsonMode.UIntM => "sjUInt"
    case ChSimpleJsonMode.IntM => "sjInt"
    case ChSimpleJsonMode.FloatM => "sjFloat"
    case ChSimpleJsonMode.Bool => "sjBool"
    case ChSimpleJsonMode.Raw => "sjRaw"
    case ChSimpleJsonMode.Str => "sjString"
  }

  override def nullSafeEval(json: Any, name: Any): Any = {
    val j = json.asInstanceOf[UTF8String]
    val n = name.asInstanceOf[UTF8String]
    mode match {
      case ChSimpleJsonMode.Has => GraftSimpleJson.sjHas(j, n)
      case ChSimpleJsonMode.UIntM => GraftSimpleJson.sjUInt(j, n)
      case ChSimpleJsonMode.IntM => GraftSimpleJson.sjInt(j, n)
      case ChSimpleJsonMode.FloatM => GraftSimpleJson.sjFloat(j, n)
      case ChSimpleJsonMode.Bool => GraftSimpleJson.sjBool(j, n)
      case ChSimpleJsonMode.Raw => GraftSimpleJson.sjRaw(j, n)
      case ChSimpleJsonMode.Str => GraftSimpleJson.sjString(j, n)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (j, n) =>
      s"graft.functions.GraftSimpleJson.$kernel($j, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
