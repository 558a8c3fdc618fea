package graft.pushdown

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{ClickHouseEval, ClickHouseFn, ClickHousePassthrough}
import graft.sql.ChSql
import graft.types.ClickHouseType

/** Catalyst `Expression` → ClickHouse SQL compiler (the analog of the
  * reference's unparser dialect + lambda rewriter,
  * /root/reference/src/dialect.rs and src/udfs/apply.rs:126-217).
  *
  * `None` = not compilable → the enclosing subtree cannot be pushed (the
  * same "does it unparse?" exactness probe the scan filters use,
  * sql.rs:215-228). Attribute references resolve through `scope`
  * (exprId → generated remote alias).
  */
object ChExprUnparser {

  def compile(e: Expression, scope: Map[ExprId, String]): Option[String] = {
    def go(e: Expression): Option[String] = compile(e, scope)
    def fn(name: String, args: Seq[Expression]): Option[String] = {
      val parts = args.map(go)
      if (parts.exists(_.isEmpty)) None
      else Some(s"$name(${parts.flatten.mkString(", ")})")
    }
    def bin(op: String, l: Expression, r: Expression): Option[String] =
      for (ls <- go(l); rs <- go(r)) yield s"($ls $op $rs)"

    e match {
      // ---- passthrough family: unwrap into remote syntax ----
      case ClickHousePassthrough(child, _) => go(child)
      case ClickHouseEval(raw, _) => Some(s"($raw)")
      case ClickHouseFn(name, args, _) => fn(name, args)

      // ---- leaves ----
      case a: AttributeReference => scope.get(a.exprId)
      case v: NamedLambdaVariable => scope.get(v.exprId)
      case Alias(child, _) => go(child)
      case l: Literal => literal(l)

      // ---- arithmetic ----
      case Add(l, r, _) => bin("+", l, r)
      case Subtract(l, r, _) => bin("-", l, r)
      case Multiply(l, r, _) => bin("*", l, r)
      case Divide(l, r, _) => bin("/", l, r)
      case Remainder(l, r, _) => bin("%", l, r)
      case UnaryMinus(c, _) => go(c).map(s => s"(-$s)")

      // ---- comparison / logic ----
      case EqualTo(l, r) => bin("=", l, r)
      case EqualNullSafe(l, r) =>
        for (ls <- go(l); rs <- go(r)) yield s"($ls IS NOT DISTINCT FROM $rs)"
      case GreaterThan(l, r) => bin(">", l, r)
      case GreaterThanOrEqual(l, r) => bin(">=", l, r)
      case LessThan(l, r) => bin("<", l, r)
      case LessThanOrEqual(l, r) => bin("<=", l, r)
      case And(l, r) => bin("AND", l, r)
      case Or(l, r) => bin("OR", l, r)
      case Not(c) => go(c).map(s => s"(NOT $s)")
      case IsNull(c) => go(c).map(s => s"($s IS NULL)")
      case IsNotNull(c) => go(c).map(s => s"($s IS NOT NULL)")
      case In(v, list) =>
        for {
          vs <- go(v)
          items <- sequence(list.map(go))
        } yield s"($vs IN (${items.mkString(", ")}))"
      case InSet(v, hset) =>
        for {
          vs <- go(v)
          items <- sequence(hset.toSeq.sortBy(_.toString)
            .map(x => literal(Literal(x, v.dataType))))
        } yield s"($vs IN (${items.mkString(", ")}))"
      case CaseWhen(branches, elseValue) =>
        val parts = branches.map { case (c, v) =>
          for (cs <- go(c); vs <- go(v)) yield s"WHEN $cs THEN $vs"
        }
        for {
          ps <- sequence(parts)
          el <- elseValue.map(go).getOrElse(Some(""))
        } yield s"(CASE ${ps.mkString(" ")}${if (el.nonEmpty) s" ELSE $el" else ""} END)"
      case If(c, t, f) => fn("if", Seq(c, t, f))
      case Coalesce(children) => fn("coalesce", children)
      case Greatest(children) => fn("greatest", children)
      case Least(children) => fn("least", children)

      // ---- casts ----
      case Cast(child, dt, _, _) =>
        for {
          cs <- go(child)
          t <- renderType(dt)
        } yield s"CAST($cs AS $t)"

      // ---- strings ----
      case Upper(c) => fn("upper", Seq(c))
      case Lower(c) => fn("lower", Seq(c))
      case Length(c) => fn("length", Seq(c))
      case Concat(cs) => fn("concat", cs)
      case Substring(s, p, l) => fn("substring", Seq(s, p, l))
      case StartsWith(l, r) => fn("startsWith", Seq(l, r))
      case EndsWith(l, r) => fn("endsWith", Seq(l, r))
      case Contains(l, r) =>
        for (ls <- go(l); rs <- go(r)) yield s"(position($ls, $rs) > 0)"
      // md5 fingerprinting (dedup pipelines): ClickHouse MD5 returns the
      // binary digest, so the hex-string form Spark produces is
      // lower(hex(MD5(s))). Spark's Md5 takes binary — unwrap the
      // string→binary Cast (UTF-8 bytes on both sides).
      case Md5(Cast(c, BinaryType, _, _)) if c.dataType == StringType =>
        go(c).map(cs => s"lower(hex(MD5($cs)))")
      case Md5(c) if c.dataType == StringType =>
        go(c).map(cs => s"lower(hex(MD5($cs)))")
      case Sha1(Cast(c, BinaryType, _, _)) if c.dataType == StringType =>
        go(c).map(cs => s"lower(hex(SHA1($cs)))")
      case Sha2(Cast(c, BinaryType, _, _), Literal(256, IntegerType))
          if c.dataType == StringType =>
        go(c).map(cs => s"lower(hex(SHA256($cs)))")
      // both engines use zlib's CRC-32 (IEEE 802.3, init 0xFFFFFFFF)
      case Crc32(Cast(c, BinaryType, _, _)) if c.dataType == StringType =>
        go(c).map(cs => s"CRC32($cs)")
      // split on a literal single non-regex-meta char: Spark's regex
      // split and ClickHouse splitByChar agree exactly there (and the
      // guard keeps regex separators local, where Java semantics apply)
      case StringSplit(str, l @ Literal(sep: UTF8String, StringType), Literal(-1, IntegerType))
          if sep.toString.length == 1 &&
            !"\\^$.|?*+()[]{}".contains(sep.toString.charAt(0)) =>
        fn("splitByChar", Seq(l, str))
      case StringTrim(c, None) => fn("trimBoth", Seq(c))
      case StringTrimLeft(c, None) => fn("trimLeft", Seq(c))
      case StringTrimRight(c, None) => fn("trimRight", Seq(c))
      case StringReplace(s, f, r) => fn("replaceAll", Seq(s, f, r))
      // ClickHouse string reverse/pads are BYTE-based; Spark's are
      // codepoint-based — the UTF8 variants are the matching semantics.
      // Array reverse is elementwise in both dialects.
      case Reverse(c) if c.dataType == StringType => fn("reverseUTF8", Seq(c))
      case Reverse(c) if c.dataType.isInstanceOf[ArrayType] => fn("reverse", Seq(c))
      case StringRepeat(s, n) => fn("repeat", Seq(s, n))
      case StringLPad(s, l, p) => fn("leftPadUTF8", Seq(s, l, p))
      case StringRPad(s, l, p) => fn("rightPadUTF8", Seq(s, l, p))
      // LIKE: both dialects use backslash escaping for % and _, so the
      // default escape char unparses exactly; a custom ESCAPE clause has
      // no ClickHouse equivalent → stays local
      case Like(l, r, escapeChar) if escapeChar == '\\' => bin("LIKE", l, r)
      case ILike(l, r, escapeChar) if escapeChar == '\\' => bin("ILIKE", l, r)
      // regex flavors differ at the edges (RE2 remotely vs Java locally):
      // backreferences/lookarounds ERROR remotely, and possessive
      // quantifiers silently change matches. Push only literal patterns
      // within the shared Java/RE2 subset; anything else stays local.
      case RLike(l, r @ Literal(pat: UTF8String, StringType))
          if re2SafePattern(pat.toString) => fn("match", Seq(l, r))

      // ---- math ----
      case Abs(c, _) => fn("abs", Seq(c))
      case Exp(c) => fn("exp", Seq(c))
      case Log(c) => fn("log", Seq(c))
      case Log10(c) => fn("log10", Seq(c))
      case Log2(c) => fn("log2", Seq(c))
      case Sqrt(c) => fn("sqrt", Seq(c))
      case Pow(l, r) => fn("pow", Seq(l, r))
      case Floor(c) => fn("floor", Seq(c))
      case Ceil(c) => fn("ceil", Seq(c))
      case Round(c, s, _) => fn("round", Seq(c, s))
      case Pmod(l, r, _) =>
        // pmod(a, b) = ((a % b) + b) % b; ClickHouse has positiveModulo
        fn("positiveModulo", Seq(l, r))
      // trig/hyperbolic/sign family: identical names and IEEE semantics
      case Sin(c) => fn("sin", Seq(c))
      case Cos(c) => fn("cos", Seq(c))
      case Tan(c) => fn("tan", Seq(c))
      case Asin(c) => fn("asin", Seq(c))
      case Acos(c) => fn("acos", Seq(c))
      case Atan(c) => fn("atan", Seq(c))
      case Atan2(l, r) => fn("atan2", Seq(l, r))
      case Sinh(c) => fn("sinh", Seq(c))
      case Cosh(c) => fn("cosh", Seq(c))
      case Tanh(c) => fn("tanh", Seq(c))
      case Signum(c) => fn("sign", Seq(c))
      case Cbrt(c) => fn("cbrt", Seq(c))
      case IsNaN(c) => fn("isNaN", Seq(c))

      // ---- date/time ----
      case Year(c) => fn("toYear", Seq(c))
      case Quarter(c) => fn("toQuarter", Seq(c))
      case Month(c) => fn("toMonth", Seq(c))
      case DayOfMonth(c) => fn("toDayOfMonth", Seq(c))
      case DayOfYear(c) => fn("toDayOfYear", Seq(c))
      // Spark weekofyear is the ISO week — toISOWeek, NOT toWeek
      case WeekOfYear(c) => fn("toISOWeek", Seq(c))
      // NOT DayOfWeek: Spark counts 1=Sunday, ClickHouse 1=Monday — stays local
      case Hour(c, _) => fn("toHour", Seq(c))
      case Minute(c, _) => fn("toMinute", Seq(c))
      case Second(c, _) => fn("toSecond", Seq(c))
      case TruncTimestamp(Literal(fmt: UTF8String, StringType), ts, _) =>
        val chTrunc = fmt.toString.toLowerCase match {
          case "year" | "yyyy" | "yy" => Some("toStartOfYear")
          case "month" | "mon" | "mm" => Some("toStartOfMonth")
          case "day" | "dd" => Some("toStartOfDay")
          case "hour" => Some("toStartOfHour")
          case "minute" => Some("toStartOfMinute")
          case _ => None
        }
        chTrunc.flatMap(name => go(ts).map(t => s"$name($t)"))

      // ---- higher-order array functions (the apply/lambda surface,
      //      udfs/apply.rs: fn(x -> body, cols...)) ----
      case ArrayTransform(arg, f) => hof("arrayMap", arg, f, scope)
      case ArrayFilter(arg, f) => hof("arrayFilter", arg, f, scope)
      case ArrayExists(arg, f, _) => hof("arrayExists", arg, f, scope)
      // zip-map over two arrays: ClickHouse arrayMap accepts N arrays
      // with an N-ary lambda — but the server ERRORS on unequal lengths
      // where Spark's zip_with NULL-pads, so an unconditional pushdown
      // is a plan-dependent behavior change (ADVICE r14). Push only when
      // the two sides are PROVABLY the same array (semantic equality —
      // the self-zip shapes like zip_with(a, a, ...) used for squares /
      // index pairing); everything else stays local, where Spark's
      // padding law holds regardless of pushdown.
      case org.apache.spark.sql.catalyst.expressions.ZipWith(l, r, f)
          if l.semanticEquals(r) =>
        hofN("arrayMap", Seq(l, r), f, scope)
      // distinct-count composition only: ClickHouse arrayDistinct does
      // not guarantee Spark's first-occurrence order, but under length()
      // ordering is irrelevant — bare array_distinct stays local
      case Size(ArrayDistinct(c), _) =>
        go(c).map(cs => s"length(arrayDistinct($cs))")
      case Size(c, _) => fn("length", Seq(c))

      // ---- aggregates (for whole-subtree aggregation pushdown) ----
      case AggregateExpression(af, _, isDistinct, None, _) =>
        af match {
          case Sum(c, _) => fn("sum", Seq(c))
          case Min(c) => fn("min", Seq(c))
          case Max(c) => fn("max", Seq(c))
          case Average(c, _) => fn("avg", Seq(c))
          case Count(cs) if isDistinct => fn("countDistinct", cs)
          case Count(Seq(Literal(1, IntegerType))) => Some("count(*)")
          case Count(cs) => fn("count", cs)
          // exact interpolating percentile: ClickHouse's
          // quantileExactInclusive implements percentile_cont semantics
          // (linear interpolation over the sorted exact set), which is
          // what Spark's percentile() computes. Only literal fractions
          // and the default frequency (1) unparse; weighted or
          // column-driven fractions stay local.
          case Percentile(c, Literal(p: Double, DoubleType), Literal(1L, LongType), _, _, false) =>
            go(c).map(cs => s"quantileExactInclusive($p)($cs)")
          // array-of-fractions form → the server's plural combinator
          // (one sort, Array(Float64) out — same as Spark's array out)
          case Percentile(c,
              Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData,
                ArrayType(DoubleType, _)),
              Literal(1L, LongType), _, _, false) =>
            go(c).map(cs =>
              s"quantilesExactInclusive(${arr.toDoubleArray().mkString(", ")})($cs)")
          // max_by/min_by ⇄ argMax/argMin: same argument order (value,
          // ordering); tie-breaks are unspecified in BOTH engines, the
          // same "any survivor" contract
          case MaxBy(v, o) => for (vs <- go(v); os <- go(o))
            yield s"argMax($vs, $os)"
          case MinBy(v, o) => for (vs <- go(v); os <- go(o))
            yield s"argMin($vs, $os)"
          case _ => None
        }

      // FILTER-clause aggregates → the server's -If combinators (the
      // aggregate sees only rows passing the predicate — identical
      // semantics; count over a column keeps its non-NULL rule)
      case AggregateExpression(af, _, false, Some(filter), _) =>
        go(filter).flatMap { f =>
          af match {
            case Sum(c, _) => go(c).map(cs => s"sumIf($cs, $f)")
            case Min(c) => go(c).map(cs => s"minIf($cs, $f)")
            case Max(c) => go(c).map(cs => s"maxIf($cs, $f)")
            case Average(c, _) => go(c).map(cs => s"avgIf($cs, $f)")
            case Count(Seq(Literal(1, IntegerType))) => Some(s"countIf($f)")
            case Count(Seq(c)) => go(c).map(cs => s"countIf($cs, $f)")
            case _ => None
          }
        }

      // ---- window expressions (for whole-subtree window pushdown;
      //      ClickHouse has standard OVER syntax since 21.x) ----
      case WindowExpression(func, spec) =>
        val fnSql: Option[(String, WindowFnKind)] = func match {
          case _: RowNumber => Some(("row_number()", RankingFn))
          case _: Rank => Some(("rank()", RankingFn))
          case _: DenseRank => Some(("dense_rank()", RankingFn))
          // ClickHouse spells lag/lead `lagInFrame`/`leadInFrame`, which
          // obey the window frame — standard lag/lead semantics require
          // the explicit full frame (forced in windowSpec). The default
          // is always passed explicitly so the two engines cannot differ
          // on type-default vs NULL. ignoreNulls has no remote equivalent.
          case Lag(in, off, dflt, false) =>
            for (i <- go(in); o <- go(off); d <- go(dflt))
              yield (s"lagInFrame($i, $o, $d)", OffsetFn)
          case Lead(in, off, dflt, false) =>
            for (i <- go(in); o <- go(off); d <- go(dflt))
              yield (s"leadInFrame($i, $o, $d)", OffsetFn)
          case NTile(buckets) =>
            go(buckets).map(b => (s"ntile($b)", RankingFn))
          // Spark rewrites windowed first() into nth_value(x, 1); both
          // dialects spell nth_value identically (1-based, frame-respecting)
          case NthValue(in, off, false) =>
            for (i <- go(in); o <- go(off)) yield (s"nth_value($i, $o)", AggFn)
          // first/last are frame-respecting value functions in BOTH
          // dialects (same names); only the respect-nulls default form
          // unparses. NOT valid in the grouped-aggregate path — order
          // comes from the window, never from a group.
          case AggregateExpression(First(c, false), _, false, None, _) =>
            go(c).map(s => (s"first_value($s)", AggFn))
          case AggregateExpression(Last(c, false), _, false, None, _) =>
            go(c).map(s => (s"last_value($s)", AggFn))
          case agg: AggregateExpression => go(agg).map(s => (s, AggFn))
          case _ => None
        }
        for {
          (f, kind) <- fnSql
          over <- windowSpec(spec, kind, scope)
        } yield s"$f OVER $over"

      case _ => None
    }
  }

  private sealed trait WindowFnKind
  private case object RankingFn extends WindowFnKind // no frame clause
  private case object AggFn extends WindowFnKind     // explicit frame
  private case object OffsetFn extends WindowFnKind  // forced full frame

  /** WindowSpecDefinition → `(PARTITION BY ... ORDER BY ... [frame])`.
    * Ranking functions must not carry a frame clause (both dialects
    * reject it); aggregate frames are emitted explicitly so the remote
    * engine cannot differ on defaults; lagInFrame/leadInFrame force the
    * full frame (Spark's offset frame spec has no remote spelling — the
    * full frame + InFrame functions reproduce standard lag/lead). Only
    * unbounded/current-row boundaries unparse — other frames stay local.
    */
  private def windowSpec(
      spec: WindowSpecDefinition,
      kind: WindowFnKind,
      scope: Map[ExprId, String]): Option[String] = {
    def bound(e: Expression): Option[String] = e match {
      case UnboundedPreceding => Some("UNBOUNDED PRECEDING")
      case UnboundedFollowing => Some("UNBOUNDED FOLLOWING")
      case CurrentRow => Some("CURRENT ROW")
      case _ => None
    }
    val parts = sequence(spec.partitionSpec.map(compile(_, scope)))
    val orders = sequence(spec.orderSpec.map { so =>
      compile(so.child, scope).map { c =>
        val dir = so.direction match {
          case Ascending => "ASC"
          case Descending => "DESC"
        }
        val nulls = so.nullOrdering match {
          case NullsFirst => "NULLS FIRST"
          case NullsLast => "NULLS LAST"
        }
        s"$c $dir $nulls"
      }
    })
    val frame: Option[String] = kind match {
      case RankingFn => Some("")
      case OffsetFn => Some(" ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING")
      case AggFn => spec.frameSpecification match {
        case UnspecifiedFrame => Some("")
        case SpecifiedWindowFrame(frameType, lower, upper) =>
          val ft = frameType match { case RowFrame => "ROWS"; case RangeFrame => "RANGE" }
          for (lo <- bound(lower); hi <- bound(upper))
            yield s" $ft BETWEEN $lo AND $hi"
      }
    }
    for (ps <- parts; os <- orders; fr <- frame) yield {
      val pb = if (ps.isEmpty) "" else s"PARTITION BY ${ps.mkString(", ")}"
      val ob = if (os.isEmpty) "" else s"ORDER BY ${os.mkString(", ")}"
      s"(${Seq(pb, ob).filter(_.nonEmpty).mkString(" ")}$fr)"
    }
  }

  private def hof(
      chName: String,
      arg: Expression,
      f: Expression,
      scope: Map[ExprId, String]): Option[String] =
    hofN(chName, Seq(arg), f, scope)

  private def hofN(
      chName: String,
      args0: Seq[Expression],
      f: Expression,
      scope: Map[ExprId, String]): Option[String] = f match {
    case LambdaFunction(body, args, _) =>
      val vars = args.collect { case v: NamedLambdaVariable => v }
      if (vars.length != args.length) None
      else {
        // lambda variables enter scope under fresh remote names x0, x1...
        val inner = scope ++ vars.zipWithIndex.map { case (v, i) =>
          v.exprId -> s"x$i"
        }
        for {
          bodySql <- compile(body, inner)
          argSqls <- sequence(args0.map(a => compile(a, scope)))
        } yield {
          val params =
            if (vars.length == 1) s"x0"
            else s"(${vars.indices.map(i => s"x$i").mkString(", ")})"
          s"$chName($params -> $bodySql, ${argSqls.mkString(", ")})"
        }
      }
    case _ => None
  }

  private def sequence[T](xs: Seq[Option[T]]): Option[Seq[T]] =
    if (xs.exists(_.isEmpty)) None else Some(xs.flatten)

  /** Conservative check that a regex stays inside the Java∩RE2 subset:
    * no backreferences (`\1`), no lookarounds / atomic groups (`(?=`,
    * `(?!`, `(?<`, `(?>`), no possessive quantifiers (`a*+`). False
    * negatives only force the predicate local — never a wrong answer.
    */
  private def re2SafePattern(p: String): Boolean = {
    val hasBackref = raw"\\[1-9]".r.findFirstIn(p).isDefined
    val hasLookaround =
      p.contains("(?=") || p.contains("(?!") || p.contains("(?<") || p.contains("(?>")
    val hasPossessive = raw"[*+?}]\+".r.findFirstIn(p).isDefined
    !hasBackref && !hasLookaround && !hasPossessive
  }

  /** Render an internal (Catalyst) literal value as ClickHouse SQL. */
  def literal(l: Literal): Option[String] = (l.value, l.dataType) match {
    case (null, _) => Some("NULL")
    case (v: UTF8String, StringType) => Some(ChSql.stringLit(v.toString))
    case (v: Boolean, BooleanType) => Some(if (v) "true" else "false")
    case (v, ByteType | ShortType | IntegerType | LongType) => Some(v.toString)
    case (v: Float, FloatType) =>
      if (v.isNaN || v.isInfinite) None else Some(v.toString)
    case (v: Double, DoubleType) =>
      if (v.isNaN || v.isInfinite) None else Some(v.toString)
    case (v: Decimal, _: DecimalType) => Some(v.toBigDecimal.underlying.toPlainString)
    case (micros: Long, TimestampType) =>
      val inst = java.time.Instant.EPOCH.plusNanos(micros * 1000L)
      ChSql.literal(inst)
    case (days: Int, DateType) =>
      ChSql.literal(java.time.LocalDate.ofEpochDay(days.toLong))
    case _ => None
  }

  /** Spark type → ClickHouse type for CAST targets. */
  def renderType(dt: DataType): Option[String] =
    try Some(ClickHouseType.render(dt)) catch { case _: IllegalArgumentException => None }
}
