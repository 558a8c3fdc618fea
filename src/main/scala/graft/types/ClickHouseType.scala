package graft.types

import org.apache.spark.sql.types._

/** ClickHouse ⇄ Spark type mapping (SURVEY.md §1.2).
  *
  * Parses ClickHouse type strings (`Nullable(Array(Int64))`,
  * `Decimal(20, 4)`, `LowCardinality(String)`, ...) plus the Arrow-ish
  * aliases the reference's UDF return-type strings accept
  * (`Utf8`, `List(Utf8)`, `Boolean` — /root/reference/src/udfs.rs:30-43),
  * and renders Spark types back to ClickHouse DDL types.
  *
  * Rules reproduced from the reference:
  *  - ClickHouse arrays are never nullable at the element level unless
  *    explicitly `Array(Nullable(T))` (udfs.rs:66-73) →
  *    `ArrayType(_, containsNull=false)` by default.
  *  - Unsigned integers widen (Spark has no unsigned): UInt8→Short,
  *    UInt16→Int, UInt32→Long, UInt64→Decimal(20,0).
  *  - `Nullable(T)` maps to the field nullability flag, not a distinct type.
  *  - `LowCardinality(T)` is a storage hint — unwrapped.
  */
object ClickHouseType {

  /** Parsed ClickHouse type: Spark type + top-level nullability. */
  final case class Parsed(dataType: DataType, nullable: Boolean)

  def parse(s: String): Parsed = parseInner(s.trim)

  private def parseInner(s: String): Parsed = {
    val t = s.trim
    def args(prefix: String): Seq[String] = splitTopLevel(
      t.substring(prefix.length + 1, t.length - 1))
    t match {
      case _ if t.startsWith("Nullable(") && t.endsWith(")") =>
        val inner = parseInner(t.substring("Nullable(".length, t.length - 1))
        // ClickHouse rejects Nullable around composite types:
        // "Nested type Array(...) cannot be inside Nullable type"
        inner.dataType match {
          case _: ArrayType | _: MapType | _: StructType =>
            throw new IllegalArgumentException(
              s"nested type cannot be inside Nullable: '$t'")
          case _ => inner.copy(nullable = true)
        }
      case _ if t.startsWith("LowCardinality(") && t.endsWith(")") =>
        parseInner(t.substring("LowCardinality(".length, t.length - 1))
      case _ if (t.startsWith("Array(") || t.startsWith("List(")) && t.endsWith(")") =>
        val inner = parseInner(t.substring(t.indexOf('(') + 1, t.length - 1))
        Parsed(ArrayType(inner.dataType, containsNull = inner.nullable), nullable = false)
      case _ if t.startsWith("Map(") && t.endsWith(")") =>
        val Seq(k, v) = args("Map")
        val (pk, pv) = (parseInner(k), parseInner(v))
        Parsed(MapType(pk.dataType, pv.dataType, valueContainsNull = pv.nullable), false)
      case _ if t.startsWith("Tuple(") && t.endsWith(")") =>
        val fields = args("Tuple").zipWithIndex.map { case (f, i) =>
          // named tuple elements: "name Type"
          val (name, tpe) = f.trim.split(" ", 2) match {
            case Array(n, rest) if !isTypeName(n) => (n, rest)
            case _ => (s"_${i + 1}", f)
          }
          val p = parseInner(tpe)
          StructField(name, p.dataType, p.nullable)
        }
        Parsed(StructType(fields.toArray), false)
      case _ if t.startsWith("Decimal(") && t.endsWith(")") =>
        val Seq(p, sc) = args("Decimal")
        Parsed(DecimalType(p.trim.toInt, sc.trim.toInt), false)
      case _ if t.startsWith("FixedString(") && t.endsWith(")") =>
        Parsed(StringType, false)
      case _ if t.startsWith("DateTime64") => Parsed(TimestampType, false)
      case _ if t.startsWith("DateTime") => Parsed(TimestampType, false)
      case _ if t.startsWith("Enum8(") || t.startsWith("Enum16(") =>
        Parsed(StringType, false)
      case "Int8" => Parsed(ByteType, false)
      case "Int16" => Parsed(ShortType, false)
      case "Int32" => Parsed(IntegerType, false)
      case "Int64" => Parsed(LongType, false)
      case "UInt8" => Parsed(ShortType, false)
      case "UInt16" => Parsed(IntegerType, false)
      case "UInt32" => Parsed(LongType, false)
      case "UInt64" => Parsed(DecimalType(20, 0), false)
      // wide integers land in Spark's widest EXACT type. Boundary note:
      // Int128/256 and UInt128/256 ranges exceed 38 decimal digits —
      // in-range values round-trip exactly, wider ones fail LOUDLY on
      // write (Decimal overflow under ANSI), never wrap silently
      case "Int128" | "Int256" | "UInt128" | "UInt256" =>
        Parsed(DecimalType(38, 0), false)
      // IP addresses: textual form (the reference's Arrow surface
      // carries them as strings; server-side functions still apply via
      // passthrough)
      case "IPv4" | "IPv6" => Parsed(StringType, false)
      case "Float32" => Parsed(FloatType, false)
      case "Float64" => Parsed(DoubleType, false)
      case "String" | "Utf8" | "LargeUtf8" | "Utf8View" | "UUID" => Parsed(StringType, false)
      case "Bool" | "Boolean" => Parsed(BooleanType, false)
      case "Date" | "Date32" => Parsed(DateType, false)
      case _ if t.startsWith("AggregateFunction(") && t.endsWith(")") =>
        val parts = args("AggregateFunction")
        require(parts.nonEmpty, s"empty AggregateFunction type: '$t'")
        Parsed(aggStateType(parts.head, parts.tail.map(parseInner), t), false)
      case other =>
        throw new IllegalArgumentException(s"unsupported ClickHouse type: '$other'")
    }
  }

  /** Storage representation of an `AggregateFunction(fn, args...)` column
    * (AggregatingMergeTree targets). A real server stores opaque state
    * blobs; the embedded engine stores a TRANSPARENT Spark type per
    * function so states stay parquet-representable and mergeable in SQL:
    *  - avg   → struct<s: sum-type, c: bigint> (exact integer sum for
    *    integral args — avgMerge is then a single exact-rational division)
    *  - uniq / uniqExact → array<bigint> of xxhash64 values (exact over
    *    64-bit hashes; collisions negligible at any gate scale)
    *  - sum   → widened arg type, count → bigint, min/max/any → arg type
    */
  private def aggStateType(fn: String, argTypes: Seq[Parsed], full: String): DataType = {
    def widened(p: Parsed): DataType = p.dataType match {
      case ByteType | ShortType | IntegerType | LongType => LongType
      case FloatType | DoubleType => DoubleType
      case d: DecimalType => d
      case other => throw new IllegalArgumentException(
        s"AggregateFunction($fn) over non-numeric type ${other.sql}: '$full'")
    }
    def arg0: Parsed = {
      require(argTypes.nonEmpty, s"AggregateFunction($fn) needs an argument type: '$full'")
      argTypes.head
    }
    fn match {
      case "avg" => StructType(Array(
        StructField("s", widened(arg0), nullable = true),
        StructField("c", LongType, nullable = true)))
      case "uniq" | "uniqExact" =>
        ArrayType(LongType, containsNull = false)
      case "sum" => widened(arg0)
      case "count" => LongType
      case "min" | "max" | "any" => arg0.dataType
      case other => throw new IllegalArgumentException(
        s"unsupported AggregateFunction function: '$other' in '$full' " +
          "(supported: avg, uniq, uniqExact, sum, count, min, max, any)")
    }
  }

  /** Function name of an `AggregateFunction(...)` column type (unwrapping
    * nothing — the server rejects Nullable/LowCardinality around states),
    * or None for plain types. Drives merge-time state combining.
    */
  def aggFunction(chType: String): Option[String] = {
    val t = chType.trim
    if (t.startsWith("AggregateFunction(") && t.endsWith(")"))
      Some(splitTopLevel(t.substring("AggregateFunction(".length, t.length - 1)).head)
    else None
  }

  /** Recursively strip nullability for fit checks that enforce it
    * elsewhere (runtime NULL guards / verifyWriteSchema widening).
    */
  def ignoreNullability(dt: DataType): DataType = dt match {
    case ArrayType(et, _) => ArrayType(ignoreNullability(et), containsNull = true)
    case MapType(kt, vt, _) =>
      MapType(ignoreNullability(kt), ignoreNullability(vt), valueContainsNull = true)
    case StructType(fields) => StructType(fields.map(f =>
      StructField(f.name, ignoreNullability(f.dataType), nullable = true)))
    case other => other
  }

  private def isTypeName(s: String): Boolean =
    s.headOption.exists(_.isUpper) && (s.contains("(") || parseable(s))

  private def parseable(s: String): Boolean =
    try { parseInner(s); true } catch { case _: IllegalArgumentException => false }

  /** Split "a, Map(b, c), d" at top-level commas only. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty) out += cur.result()
    out.result().map(_.trim)
  }

  /** Render a Spark type as a ClickHouse DDL type. */
  def render(dt: DataType, nullable: Boolean = false): String = {
    val base = dt match {
      case ByteType => "Int8"
      case ShortType => "Int16"
      case IntegerType => "Int32"
      case LongType => "Int64"
      case FloatType => "Float32"
      case DoubleType => "Float64"
      case StringType => "String"
      case BooleanType => "Bool"
      case DateType => "Date32"
      case TimestampType | TimestampNTZType => "DateTime64(6)"
      case d: DecimalType if d.precision == 20 && d.scale == 0 => "UInt64"
      case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
      case ArrayType(et, cn) => s"Array(${render(et, cn)})"
      case MapType(kt, vt, vn) => s"Map(${render(kt)}, ${render(vt, vn)})"
      case StructType(fields) =>
        s"Tuple(${fields.map(f => s"${f.name} ${render(f.dataType, f.nullable)}").mkString(", ")})"
      case other =>
        throw new IllegalArgumentException(s"cannot render Spark type $other as ClickHouse")
    }
    if (nullable && !dt.isInstanceOf[ArrayType] && !dt.isInstanceOf[MapType]
      && !dt.isInstanceOf[StructType]) s"Nullable($base)"
    else base
  }

  /** Parse a whole schema: Seq of (name, chType) → StructType. */
  def toStructType(cols: Seq[(String, String)]): StructType =
    StructType(cols.map { case (n, t) =>
      val p = parse(t)
      StructField(n, p.dataType, p.nullable)
    }.toArray)

  /** Schema verification for the write path (mirrors sink.rs:46-81):
    * field count, names (order-insensitive), types, and nullability —
    * a nullable input field cannot write into a non-nullable sink field.
    * Returns the list of violations (empty = ok).
    */
  def verifyWriteSchema(sink: StructType, input: StructType): Seq[String] = {
    val errs = Seq.newBuilder[String]
    if (sink.length != input.length)
      errs += s"field count mismatch: sink=${sink.length} input=${input.length}"
    val sinkByName = sink.fields.map(f => f.name -> f).toMap
    input.fields.foreach { in =>
      sinkByName.get(in.name) match {
        case None => errs += s"input field '${in.name}' not in sink schema"
        case Some(sk) =>
          if (!typeWritable(sk.dataType, in.dataType))
            errs += s"field '${in.name}' type mismatch: sink=${sk.dataType.simpleString} input=${in.dataType.simpleString}"
          else if (in.nullable && !sk.nullable)
            errs += s"field '${in.name}' nullability mismatch: nullable input into non-nullable sink"
      }
    }
    errs.result()
  }

  /** One shared coercion builder for every wire-vs-plan drift seam
    * (remote exec row + columnar paths, HTTP scan streams): per column a
    * pass-through BoundReference when types match, else a UTC Cast. The
    * expressions are serializable — build them driver-side, create the
    * UnsafeProjection wherever the rows are.
    */
  def castExprs(
      from: Seq[DataType],
      to: Seq[DataType]): Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    to.zipWithIndex.map { case (dt, i) =>
      val ref = org.apache.spark.sql.catalyst.expressions.BoundReference(
        i, from(i), nullable = true)
      if (from(i) == dt) ref
      else org.apache.spark.sql.catalyst.expressions.Cast(
        ref, dt, Some(java.time.ZoneOffset.UTC.getId))
    }

  /** Structural type compatibility for writes: identical types, or equal
    * up to NULLABILITY WIDENING — non-nullable elements/values may write
    * into nullable slots (never the reverse). Without this, an
    * `array<double>` of non-null elements cannot insert into an
    * `Array(Nullable(Float64))` column even though every value fits.
    */
  private def typeWritable(sink: DataType, input: DataType): Boolean =
    (sink, input) match {
      case (s, i) if s == i => true
      case (ArrayType(se, sn), ArrayType(ie, in_)) =>
        (sn || !in_) && typeWritable(se, ie)
      case (MapType(sk, sv, sn), MapType(ik, iv, in_)) =>
        (sn || !in_) && typeWritable(sk, ik) && typeWritable(sv, iv)
      case (StructType(sf), StructType(inf)) =>
        sf.length == inf.length && sf.zip(inf).forall { case (a, b) =>
          a.name == b.name && (a.nullable || !b.nullable) &&
            typeWritable(a.dataType, b.dataType)
        }
      case _ => false
    }
}
