package graft.client

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip and wire-layout tests for the RowBinary codec
  * (graft.client.RowBinary). Wire layout facts are from the public
  * format doc (clickhouse.com/docs/en/interfaces/formats#rowbinary);
  * each layout test pins one byte-level fact so a codec regression
  * fails here, not against a live server.
  */
class RowBinarySpec extends AnyFunSuite {

  private def enc(chType: String, v: Any): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    RowBinary.encoder(chType).write(out, v)
    out.flush()
    bos.toByteArray
  }

  private def dec(chType: String, bytes: Array[Byte]): Any =
    RowBinary.decoder(chType).read(new DataInputStream(new ByteArrayInputStream(bytes)))

  /** external value --encode--> wire --decode--> catalyst value */
  private def roundTrip(chType: String, external: Any): Any = dec(chType, enc(chType, external))

  // ---- varint ----

  test("LEB128 varint round-trips boundary values") {
    for (n <- Seq(0, 1, 127, 128, 129, 255, 256, 16383, 16384, 1 << 20, Int.MaxValue)) {
      val bos = new ByteArrayOutputStream()
      RowBinary.writeVarInt(bos, n)
      val in = new DataInputStream(new ByteArrayInputStream(bos.toByteArray))
      assert(RowBinary.readVarInt(in) === n, s"varint $n")
    }
  }

  test("varint wire bytes: 127 is one byte, 128 is two") {
    val b127 = new ByteArrayOutputStream(); RowBinary.writeVarInt(b127, 127)
    val b128 = new ByteArrayOutputStream(); RowBinary.writeVarInt(b128, 128)
    assert(b127.toByteArray.toSeq === Seq(127.toByte))
    assert(b128.toByteArray.toSeq === Seq(0x80.toByte, 0x01.toByte))
  }

  // ---- header ----

  test("WithNamesAndTypes header round-trips") {
    val cols = Seq("id" -> "UInt64", "name" -> "Nullable(String)", "v" -> "Array(Float32)")
    val bos = new ByteArrayOutputStream()
    RowBinary.writeHeader(bos, cols)
    val in = new DataInputStream(new ByteArrayInputStream(bos.toByteArray))
    assert(RowBinary.readHeader(in) === cols)
  }

  // ---- integers ----

  test("integer widths round-trip (incl. unsigned expansion)") {
    assert(roundTrip("Int8", 120.toByte) === 120.toByte)
    assert(roundTrip("Int8", (-7).toByte) === (-7).toByte)
    assert(roundTrip("UInt8", 200.toShort) === 200.toShort) // UInt8 -> Short
    assert(roundTrip("Int16", (-12345).toShort) === (-12345).toShort)
    assert(roundTrip("UInt16", 65000) === 65000) // UInt16 -> Int
    assert(roundTrip("Int32", -2000000000) === -2000000000)
    assert(roundTrip("UInt32", 4000000000L) === 4000000000L) // UInt32 -> Long
    assert(roundTrip("Int64", Long.MinValue) === Long.MinValue)
    assert(roundTrip("Bool", true) === true)
    assert(roundTrip("Bool", false) === false)
  }

  test("Int32 wire bytes are little-endian") {
    assert(enc("Int32", 0x01020304).toSeq ===
      Seq(0x04.toByte, 0x03.toByte, 0x02.toByte, 0x01.toByte))
  }

  test("UInt64 above Long.MaxValue decodes to Decimal(20,0)") {
    // 2^63 = 9223372036854775808 encodes as raw long Long.MinValue
    val bytes = enc("Int64", Long.MinValue)
    val d = dec("UInt64", bytes).asInstanceOf[Decimal]
    assert(d.toJavaBigDecimal.toBigInteger.toString === "9223372036854775808")
    // and a BigDecimal input encodes back to the same 8 bytes
    assert(enc("UInt64", new java.math.BigDecimal("9223372036854775808")).toSeq === bytes.toSeq)
  }

  // ---- floats ----

  test("floats round-trip bit-exactly") {
    assert(roundTrip("Float32", 3.14f) === 3.14f)
    assert(roundTrip("Float64", -2.718281828) === -2.718281828)
    assert(java.lang.Float.isNaN(roundTrip("Float32", Float.NaN).asInstanceOf[Float]))
    assert(roundTrip("Float64", Double.NegativeInfinity) === Double.NegativeInfinity)
  }

  // ---- strings ----

  test("String round-trips UTF-8, empty, and multibyte") {
    assert(roundTrip("String", "hello") === UTF8String.fromString("hello"))
    assert(roundTrip("String", "") === UTF8String.fromString(""))
    assert(roundTrip("String", "héllo — 世界") === UTF8String.fromString("héllo — 世界"))
  }

  test("FixedString pads with zero bytes to width") {
    val bytes = enc("FixedString(5)", "ab")
    assert(bytes.length === 5)
    assert(bytes.toSeq === Seq[Byte]('a', 'b', 0, 0, 0))
    assert(dec("FixedString(5)", bytes).asInstanceOf[UTF8String].numBytes === 5)
    intercept[IllegalArgumentException](enc("FixedString(2)", "toolong"))
  }

  // ---- Nullable ----

  test("Nullable flag byte: 1=NULL nothing follows, 0=value") {
    assert(enc("Nullable(Int32)", null).toSeq === Seq(1.toByte))
    val some = enc("Nullable(Int32)", 7)
    assert(some.length === 5 && some(0) === 0.toByte)
    assert(roundTrip("Nullable(Int32)", null) === null)
    assert(roundTrip("Nullable(String)", "x") === UTF8String.fromString("x"))
  }

  // ---- dates & times (decode returns Catalyst epoch ints/micros) ----

  test("Date is UInt16 epoch days; Date32 is Int32") {
    val d = java.time.LocalDate.of(2024, 3, 1)
    val days = d.toEpochDay.toInt
    assert(roundTrip("Date", d) === days)
    assert(enc("Date", d).length === 2)
    assert(roundTrip("Date32", java.time.LocalDate.of(1900, 1, 1)) ===
      java.time.LocalDate.of(1900, 1, 1).toEpochDay.toInt)
  }

  test("DateTime is UInt32 seconds; DateTime64(p) scales ticks to micros") {
    val inst = java.time.Instant.parse("2024-06-01T12:34:56Z")
    assert(roundTrip("DateTime", inst) === inst.getEpochSecond * 1000000L)
    assert(enc("DateTime", inst).length === 4)
    val withMicros = java.time.Instant.parse("2024-06-01T12:34:56.123456Z")
    assert(roundTrip("DateTime64(6)", withMicros) ===
      withMicros.getEpochSecond * 1000000L + 123456L)
    // p=3: millis precision — micros below the tick truncate
    assert(roundTrip("DateTime64(3)", withMicros) ===
      withMicros.getEpochSecond * 1000000L + 123000L)
    // p=9: nanos ticks on the wire, floorDiv back to micros
    assert(roundTrip("DateTime64(9)", withMicros) ===
      withMicros.getEpochSecond * 1000000L + 123456L)
    // pre-epoch value through signed Int64 ticks
    val pre = java.time.Instant.parse("1960-01-01T00:00:00.5Z")
    assert(roundTrip("DateTime64(3)", pre) ===
      pre.getEpochSecond * 1000000L + 500000L)
  }

  // ---- decimals ----

  test("Decimal widths 4/8/16/32 bytes by precision") {
    assert(enc("Decimal(9, 2)", new java.math.BigDecimal("12345.67")).length === 4)
    assert(enc("Decimal(18, 4)", new java.math.BigDecimal("-1.2345")).length === 8)
    assert(enc("Decimal(38, 10)", new java.math.BigDecimal("1e20")).length === 16)
    assert(enc("Decimal(76, 0)", new java.math.BigDecimal("-1e50")).length === 32)
    for ((p, s, v) <- Seq((9, 2, "12345.67"), (18, 4, "-9999999999999.9999"),
        (20, 4, "1234567890123456.7890"), (38, 10, "-12345678901234567890.0123456789"),
        (76, 2, "123456789012345678901234567890.12"))) {
      val bd = new java.math.BigDecimal(v)
      val got = roundTrip(s"Decimal($p, $s)", bd).asInstanceOf[Decimal]
      assert(got.toJavaBigDecimal.compareTo(bd) === 0, s"Decimal($p,$s) $v")
    }
  }

  // ---- enum / uuid ----

  test("Enum8/Enum16 decode to names") {
    assert(dec("Enum8('a' = 1, 'b' = 2)", Array(2.toByte)) === UTF8String.fromString("b"))
    assert(dec("Enum8('neg' = -1)", Array((-1).toByte)) === UTF8String.fromString("neg"))
    assert(dec("Enum16('x' = 300)", enc("Int16", 300.toShort)) === UTF8String.fromString("x"))
    intercept[IllegalArgumentException](dec("Enum8('a' = 1)", Array(9.toByte)))
  }

  test("UUID encodes as two LE UInt64 halves and round-trips") {
    val u = "123e4567-e89b-12d3-a456-426614174000"
    val bytes = enc("UUID", u)
    assert(bytes.length === 16)
    assert(roundTrip("UUID", u) === UTF8String.fromString(u))
  }

  // ---- composites ----

  test("Array round-trips incl. nested and nullable elements") {
    val got = roundTrip("Array(Int64)", Seq(1L, 2L, 3L)).asInstanceOf[GenericArrayData]
    assert(got.array.toSeq === Seq(1L, 2L, 3L))
    val empty = roundTrip("Array(String)", Seq.empty[String]).asInstanceOf[GenericArrayData]
    assert(empty.numElements() === 0)
    val nn = roundTrip("Array(Nullable(Int32))", Seq(1, null, 3)).asInstanceOf[GenericArrayData]
    assert(nn.array.toSeq === Seq(1, null, 3))
    val nested = roundTrip("Array(Array(Int32))", Seq(Seq(1, 2), Seq(3)))
      .asInstanceOf[GenericArrayData]
    assert(nested.array.map(_.asInstanceOf[GenericArrayData].array.toSeq).toSeq ===
      Seq(Seq(1, 2), Seq(3)))
  }

  test("Map round-trips as interleaved key/value pairs") {
    val m = scala.collection.immutable.ListMap("a" -> 1L, "b" -> 2L)
    val got = roundTrip("Map(String, Int64)", m).asInstanceOf[ArrayBasedMapData]
    val keys = got.keyArray.asInstanceOf[GenericArrayData].array.map(_.toString).toSeq
    val vals = got.valueArray.asInstanceOf[GenericArrayData].array.toSeq
    assert(keys.zip(vals).toMap === Map("a" -> 1L, "b" -> 2L))
  }

  test("Tuple decodes positionally; named elements parse") {
    val bytes = enc("Int32", 7) ++ enc("String", "x")
    val row = dec("Tuple(Int32, String)", bytes).asInstanceOf[GenericInternalRow]
    assert(row.getInt(0) === 7 && row.getUTF8String(1) === UTF8String.fromString("x"))
    val named = dec("Tuple(a Int32, b String)", bytes).asInstanceOf[GenericInternalRow]
    assert(named.getInt(0) === 7)
  }

  test("type aliases: List = Array, Boolean = Bool; Tuple encodes from Row/Seq") {
    val got = roundTrip("List(Int64)", Seq(5L, 6L)).asInstanceOf[GenericArrayData]
    assert(got.array.toSeq === Seq(5L, 6L))
    assert(roundTrip("Boolean", true) === true)
    val bytes = enc("Tuple(a Int32, b String)", org.apache.spark.sql.Row(7, "x"))
    val row = dec("Tuple(a Int32, b String)", bytes).asInstanceOf[GenericInternalRow]
    assert(row.getInt(0) === 7 && row.getUTF8String(1) === UTF8String.fromString("x"))
    val bytes2 = enc("Tuple(Int32, String)", Seq(9, "y"))
    val row2 = dec("Tuple(Int32, String)", bytes2).asInstanceOf[GenericInternalRow]
    assert(row2.getInt(0) === 9)
  }

  test("pre-epoch sub-tick DateTime64 values floor consistently on both legs") {
    // -1500us into DateTime64(3): floorDiv gives tick -2 -> decodes -2000us.
    // Truncate-toward-zero would give -1 -> -1000us (a 1ms forward shift).
    assert(roundTrip("DateTime64(3)", -1500L) === -2000L)
    assert(roundTrip("DateTime64(3)", 1500L) === 1000L)
  }

  test("named tuple elements may start uppercase (no first-letter heuristic)") {
    val bytes = enc("Int32", 7) ++ enc("String", "x")
    val row = dec("Tuple(Amount Int32, Note String)", bytes)
      .asInstanceOf[GenericInternalRow]
    assert(row.getInt(0) === 7 && row.getUTF8String(1) === UTF8String.fromString("x"))
    // unnamed multi-word types (contain spaces) still parse as one type
    val mb = enc("Map(String, Int64)", Map("k" -> 1L))
    val row2 = dec("Tuple(Map(String, Int64))", mb).asInstanceOf[GenericInternalRow]
    assert(row2.numFields === 1)
  }

  test("Boolean and List aliases ride the vector path") {
    assert(RowBinary.vectorDecoder("Boolean").isDefined)
    assert(RowBinary.vectorDecoder("Nullable(Boolean)").isDefined)
    assert(RowBinary.vectorDecoder("List(Int64)").isDefined)
  }

  test("mid-row EOF is a loud truncation error, not a silent clean end") {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val encId = RowBinary.encoder("Int64")
    val encNm = RowBinary.encoder("String")
    encId.write(out, 1L); encNm.write(out, "complete row")
    encId.write(out, 2L); encNm.write(out, "this row gets cut")
    out.flush()
    val full = bos.toByteArray
    // production stream layering: DataInputStream over the counter over
    // a BUFFER — the counter must measure decoder-consumed bytes, so a
    // truncated tail already prefetched into the buffer still counts as
    // a truncation (the other layering silently passes this test)
    def reader(bytes: Array[Byte]) = {
      val counter = new RowBinary.CountingInputStream(
        new java.io.BufferedInputStream(new ByteArrayInputStream(bytes), 1 << 16))
      new RowBinary.RowReader(
        new DataInputStream(counter),
        Array(RowBinary.decoder("Int64"), RowBinary.decoder("String")), counter)
    }
    // cut inside row 2's SECOND column
    val rdr = reader(full.take(full.length - 5))
    assert(rdr.readRow().getLong(0) === 1L)
    val e = intercept[java.io.IOException](rdr.readRow())
    assert(e.getMessage.contains("truncated"))
    // cut inside row 2's FIRST column (3 bytes into the Int64): the
    // hardest case — the tail bytes sit in the buffer before decode
    val row1Len = 8 + 1 + "complete row".length
    val rdrF = reader(full.take(row1Len + 3))
    assert(rdrF.readRow().getLong(0) === 1L)
    val eF = intercept[java.io.IOException](rdrF.readRow())
    assert(eF.getMessage.contains("truncated"))
    // clean EOF at an exact row boundary is still a clean end
    val rdr2 = reader(full)
    assert(rdr2.readRow() != null && rdr2.readRow() != null && rdr2.readRow() == null)
  }

  test("LowCardinality is transparent in RowBinary") {
    assert(roundTrip("LowCardinality(String)", "tag") === UTF8String.fromString("tag"))
    assert(roundTrip("LowCardinality(Nullable(String))", null) === null)
  }

  test("insert encoders reject out-of-range values instead of corrupting") {
    // each of these used to narrow/mask/wrap into valid-looking wire bytes
    intercept[IllegalArgumentException](enc("UInt8", 300.toShort)) //  & 0xff → 44
    intercept[IllegalArgumentException](enc("Int8", 200))
    intercept[IllegalArgumentException](enc("UInt16", -1))
    intercept[IllegalArgumentException](enc("Int16", 70000))
    intercept[IllegalArgumentException](enc("UInt32", -5L))
    intercept[IllegalArgumentException](enc("UInt32", 1L << 33))
    intercept[IllegalArgumentException](enc("Int32", Long.MaxValue))
    intercept[IllegalArgumentException](enc("UInt64", -1L))
    intercept[IllegalArgumentException]( // >= 2^64 wraps longValue
      enc("UInt64", new java.math.BigDecimal(
        java.math.BigInteger.ONE.shiftLeft(64))))
    intercept[IllegalArgumentException]( // DateTime is UInt32 seconds (1970-2106)
      enc("DateTime", java.time.Instant.parse("1969-12-31T00:00:00Z")))
    intercept[IllegalArgumentException](
      enc("DateTime", java.time.Instant.parse("2107-01-01T00:00:00Z")))
    intercept[IllegalArgumentException]( // Date is UInt16 days
      enc("Date", java.time.LocalDate.of(2150, 1, 1)))
    intercept[IllegalArgumentException]( // Decimal(38,0) is 16 bytes: 2^127
      enc("Decimal(38, 0)", // doesn't fit signed — high bytes used to drop
        new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(127))))
    // boundary values still encode
    assert(roundTrip("UInt8", 255.toShort) === 255.toShort)
    assert(roundTrip("UInt32", 0xffffffffL) === 0xffffffffL)
    assert(roundTrip("Date", java.time.LocalDate.ofEpochDay(65535)) === 65535)
    val maxU64 = new java.math.BigDecimal(
      java.math.BigInteger.ONE.shiftLeft(64).subtract(java.math.BigInteger.ONE))
    assert(roundTrip("UInt64", maxU64).asInstanceOf[Decimal]
      .toJavaBigDecimal.toBigInteger === maxU64.toBigInteger)
  }

  test("Enum8/Enum16 encode from names (what a read returns) or declared " +
    "discriminants; unknowns are rejected") {
    val e8 = "Enum8('a' = 1, 'b' = 2, 'neg' = -3)"
    assert(roundTrip(e8, "b") === UTF8String.fromString("b"))
    assert(roundTrip(e8, UTF8String.fromString("neg")) === UTF8String.fromString("neg"))
    assert(enc(e8, "neg").toSeq === Seq((-3).toByte)) // one signed wire byte
    assert(roundTrip(e8, 1) === UTF8String.fromString("a")) // declared discriminant
    val e16 = "Enum16('x' = 300, 'y' = -2)"
    assert(roundTrip(e16, "x") === UTF8String.fromString("x"))
    assert(enc(e16, "x").toSeq === enc("Int16", 300.toShort).toSeq)
    // honored-or-rejected: unknown names/values never land as wire bytes
    intercept[IllegalArgumentException](enc(e8, "zz"))
    intercept[IllegalArgumentException](enc(e8, 9))
    intercept[IllegalArgumentException](enc(e8, 3.14))
    // wide numerics must bound-check on the FULL value, not the low 32
    // bits: 2^32 + 1 narrows to 1 (a declared discriminant) via intValue
    intercept[IllegalArgumentException](enc(e8, 4294967297L))
    intercept[IllegalArgumentException](enc(e8, java.lang.Long.MIN_VALUE))
    intercept[IllegalArgumentException](enc(e16, (1L << 32) + 300L))
    // in-Long-range but outside the enum width also rejects
    intercept[IllegalArgumentException](enc(e8, 40000L))
    assert(roundTrip(e8, 2L) === UTF8String.fromString("b")) // valid Long still lands
  }

  test("Enum8 with escaped quote in a name parses and decodes") {
    // splitTopLevel must not toggle quote state on an escaped \' —
    // ClickHouse renders Enum8('a\'b' = 1, 'c,d' = 2) in type strings
    val t = "Enum8('a\\'b' = 1, 'c,d' = 2)"
    assert(dec(t, Array[Byte](1)) === UTF8String.fromString("a'b"))
    assert(dec(t, Array[Byte](2)) === UTF8String.fromString("c,d"))
  }

  test("unknown types fail fast, both directions") {
    intercept[IllegalArgumentException](RowBinary.decoder("AggregateFunction(sum, Int64)"))
    // IPv6 gained a codec in round 15 — Point remains wire-unsupported
    intercept[IllegalArgumentException](RowBinary.encoder("Point"))
  }

  // ---- RowReader stream framing ----

  test("RowReader reads rows to clean EOF") {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val encId = RowBinary.encoder("Int64")
    val encNm = RowBinary.encoder("Nullable(String)")
    for (i <- 1 to 3) { encId.write(out, i.toLong); encNm.write(out, if (i == 2) null else s"r$i") }
    out.flush()
    val decs = Array(RowBinary.decoder("Int64"), RowBinary.decoder("Nullable(String)"))
    val rdr = new RowBinary.RowReader(
      new DataInputStream(new ByteArrayInputStream(bos.toByteArray)), decs)
    val rows = Iterator.continually(rdr.readRow()).takeWhile(_ != null).toSeq
    assert(rows.map(_.getLong(0)) === Seq(1L, 2L, 3L))
    assert(rows(1).isNullAt(1) && rows(0).getUTF8String(1) === UTF8String.fromString("r1"))
  }

  // ---- vector decode path ----

  test("vectorDecoder decodes maps and tuples straight into vectors") {
    // Map(String, Nullable(Int64)) column
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val menc = RowBinary.encoder("Map(String, Nullable(Int64))")
    menc.write(out, scala.collection.immutable.ListMap("a" -> 1L, "b" -> null))
    menc.write(out, Map.empty[String, Any])
    menc.write(out, Map("c" -> 3L))
    out.flush()
    val mt = MapType(StringType, LongType, valueContainsNull = true)
    val vec = new OnHeapColumnVector(3, mt)
    val vd = RowBinary.vectorDecoder("Map(String, Nullable(Int64))").get
    val in = new DataInputStream(new ByteArrayInputStream(bos.toByteArray))
    (0 until 3).foreach(r => vd.readInto(in, vec, r))
    val m0 = vec.getMap(0)
    assert(m0.numElements() === 2)
    assert(m0.keyArray.getUTF8String(0).toString === "a" && m0.valueArray.getLong(0) === 1L)
    assert(m0.valueArray.isNullAt(1))
    assert(vec.getMap(1).numElements() === 0)
    assert(vec.getMap(2).numElements() === 1 && vec.getMap(2).valueArray.getLong(0) === 3L)
    vec.close()
    // Tuple(a Int32, b Nullable(String)) column
    val bos2 = new ByteArrayOutputStream()
    val out2 = new DataOutputStream(bos2)
    val tenc = RowBinary.encoder("Tuple(a Int32, b Nullable(String))")
    tenc.write(out2, Seq(7, "x"))
    tenc.write(out2, Seq(8, null))
    out2.flush()
    val st = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    val vec2 = new OnHeapColumnVector(2, st)
    val td = RowBinary.vectorDecoder("Tuple(a Int32, b Nullable(String))").get
    val in2 = new DataInputStream(new ByteArrayInputStream(bos2.toByteArray))
    (0 until 2).foreach(r => td.readInto(in2, vec2, r))
    assert(vec2.getStruct(0).getInt(0) === 7)
    assert(vec2.getStruct(0).getUTF8String(1).toString === "x")
    assert(vec2.getStruct(1).getInt(0) === 8 && vec2.getStruct(1).isNullAt(1))
    vec2.close()
    // deeper nesting decodes natively since round 14 (the fuzz
    // differential drives it value-level); Nullable COMPOSITES are the
    // remaining honest row-path refusal (the server cannot emit them)
    assert(RowBinary.vectorDecoder("Map(String, Array(Int64))").isDefined)
    assert(RowBinary.vectorDecoder("Array(Array(Int64))").isDefined)
    assert(RowBinary.vectorDecoder("Array(Nullable(Tuple(Int64)))").isEmpty)
  }

  test("readInto decodes primitives and strings straight into vectors") {
    val rows = 4
    val specs = Seq[(String, DataType, Seq[Any])](
      ("Int32", IntegerType, Seq(1, -2, 3, 4)),
      ("Int64", LongType, Seq(10L, 20L, -30L, 40L)),
      ("Float64", DoubleType, Seq(1.5, -2.5, 0.0, 9.75)),
      ("Nullable(String)", StringType, Seq("a", null, "ccc", "")),
      ("Date", DateType, Seq(19000, 19001, 19002, 19003)),
      ("DateTime64(6)", TimestampType,
        Seq(1700000000000000L, 1700000000000001L, 0L, 1234567890123456L)))
    for ((chType, sparkType, vals) <- specs) {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      val enc = RowBinary.internalEncoder(chType, sparkType)
      val src = new GenericInternalRow(1)
      vals.foreach { v =>
        src.update(0, v match {
          case s: String => UTF8String.fromString(s)
          case other => other
        })
        enc(out, src, 0)
      }
      out.flush()
      val vec = new OnHeapColumnVector(rows, sparkType)
      val d = RowBinary.decoder(chType)
      val in = new DataInputStream(new ByteArrayInputStream(bos.toByteArray))
      (0 until rows).foreach(r => d.readInto(in, vec, r))
      vals.zipWithIndex.foreach { case (v, r) =>
        if (v == null) assert(vec.isNullAt(r), s"$chType row $r null")
        else {
          val got = sparkType match {
            case IntegerType | DateType => vec.getInt(r)
            case LongType | TimestampType => vec.getLong(r)
            case DoubleType => vec.getDouble(r)
            case StringType => vec.getUTF8String(r).toString
            case _ => fail("unhandled")
          }
          assert(got === v, s"$chType row $r")
        }
      }
      vec.close()
    }
  }

  // ---- round-15: wide integers + IP types on the wire (ADVICE r14:
  // these types parsed at loadTable but had no RowBinary codec) ----

  test("Int128/UInt128/Int256/UInt256 round-trip; widths and range checks") {
    val d = Decimal("99999999999999999999999999999999999999") // 38 nines
    for (t <- Seq("Int128", "UInt128", "Int256", "UInt256")) {
      assert(enc(t, d).length === (if (t.endsWith("128")) 16 else 32), t)
      assert(roundTrip(t, d) === d, t)
      assert(roundTrip(t, Decimal(42)) === Decimal(BigDecimal(42), 38, 0), t)
    }
    for (t <- Seq("Int128", "Int256"))
      assert(roundTrip(t, Decimal(-42)) === Decimal(BigDecimal(-42), 38, 0), t)
    // negative into unsigned fails loudly
    intercept[IllegalArgumentException](enc("UInt128", Decimal(-1)))
    // wire value beyond 38 digits decodes LOUDLY, never saturates:
    // 2^127 - 1 has 39 digits
    val max128 = Array.fill[Byte](16)(-1); max128(15) = 0x7f
    intercept[IllegalArgumentException](dec("Int128", max128))
    // ... and the same bytes are IN range for UInt128? no — still 39
    // digits; UInt128 all-ones is 39 digits too
    intercept[IllegalArgumentException](dec("UInt128", Array.fill[Byte](16)(-1)))
  }

  test("Int128 wire layout: little-endian two's-complement") {
    assert(enc("Int128", Decimal(1)).toSeq ===
      (Seq(1.toByte) ++ Seq.fill(15)(0.toByte)))
    assert(enc("Int128", Decimal(-1)).toSeq === Seq.fill(16)(-1.toByte))
  }

  test("IPv4: UInt32 wire form, dotted text both directions") {
    // 1.2.3.4 = 0x01020304 → LE bytes 04 03 02 01
    assert(enc("IPv4", "1.2.3.4").toSeq ===
      Seq(4.toByte, 3.toByte, 2.toByte, 1.toByte))
    assert(roundTrip("IPv4", "255.254.0.1").toString === "255.254.0.1")
    intercept[IllegalArgumentException](enc("IPv4", "2001:db8::1"))
    intercept[IllegalArgumentException](enc("IPv4", "not-an-ip"))
  }

  test("IPv6: 16 network-order bytes; RFC 5952 compressed text out") {
    val b = enc("IPv6", "2001:db8::1")
    assert(b.length === 16)
    assert(b(0) === 0x20.toByte && b(1) === 0x01.toByte && b(15) === 1.toByte)
    assert(roundTrip("IPv6", "2001:DB8:0:0:0:0:0:1").toString === "2001:db8::1")
    // dotted-quad text stores as the server's IPv4-mapped form and
    // renders back in the mixed notation
    assert(roundTrip("IPv6", "1.2.3.4").toString === "::ffff:1.2.3.4")
    assert(roundTrip("IPv6", "::ffff:1.2.3.4").toString === "::ffff:1.2.3.4")
  }

  test("Nullable wide/IP types round-trip nulls") {
    for (t <- Seq("Nullable(Int128)", "Nullable(IPv6)", "Nullable(IPv4)"))
      assert(roundTrip(t, null) === null, t)
  }
}
