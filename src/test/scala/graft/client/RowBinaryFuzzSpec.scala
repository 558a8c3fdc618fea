package graft.client

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.util.Random

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.Decimal
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Randomized type-TREE round-trip fuzz for the RowBinary codec: random
  * ClickHouse type trees (Nullable/Array/Map/Tuple/LowCardinality composed
  * over every atom family) with random values, encoded then decoded, and
  * compared against an expected Catalyst value computed independently of
  * the codec. RowBinarySpec pins each type's wire layout by hand; this
  * spec covers the COMPOSITIONS no hand-written list reaches
  * (Array(Map(String, Tuple(...))), Nullable inside Map values, ...).
  * Seeded, so a failure reproduces; the failing type string is in the
  * assertion message.
  */
class RowBinaryFuzzSpec extends AnyFunSuite {

  /** One generated column type: the CH type string plus a value generator
    * returning (external insert value, expected NORMALIZED decoded value).
    */
  private case class TypeGen(ch: String, gen: Random => (Any, Any))

  /** Decoded Catalyst value → plain comparable Scala structure. Floats
    * compare by raw bits (NaN/-0.0 must survive the wire untouched).
    */
  private def norm(v: Any): Any = v match {
    case null => null
    case u: UTF8String => u.toString
    case d: Decimal => (d.precision, d.scale, d.toJavaBigDecimal)
    case a: GenericArrayData => a.array.toSeq.map(norm)
    case m: ArrayBasedMapData =>
      norm(m.keyArray).asInstanceOf[Seq[Any]]
        .zip(norm(m.valueArray).asInstanceOf[Seq[Any]])
    case r: GenericInternalRow => r.values.toSeq.map(norm)
    case f: Float => ("f32", java.lang.Float.floatToRawIntBits(f))
    case d: Double => ("f64", java.lang.Double.doubleToRawLongBits(d))
    case x => x
  }

  private val alphabet = "abXY01 _✓é漢字ß€"
  private def randString(r: Random, maxLen: Int): String =
    (0 until r.nextInt(maxLen + 1)).map(_ => alphabet(r.nextInt(alphabet.length))).mkString

  private def finiteFloatBits(r: Random): Int = {
    var b = r.nextInt()
    while (java.lang.Float.isNaN(java.lang.Float.intBitsToFloat(b))) b = r.nextInt()
    b
  }
  private def finiteDoubleBits(r: Random): Long = {
    var b = r.nextLong()
    while (java.lang.Double.isNaN(java.lang.Double.longBitsToDouble(b))) b = r.nextLong()
    b
  }

  // ---- atoms ------------------------------------------------------------

  private def atomGen(r: Random): TypeGen = r.nextInt(19) match {
    case 0 => TypeGen("Int8", { rr => val v = (rr.nextInt(256) - 128).toByte; (v, v) })
    case 1 => TypeGen("Int16", { rr => val v = rr.nextInt(65536).toShort; (v, v) })
    case 2 => TypeGen("Int32", { rr => val v = rr.nextInt(); (v, v) })
    case 3 => TypeGen("Int64", { rr => val v = rr.nextLong(); (v, v) })
    case 4 => TypeGen("UInt8", { rr => val v = rr.nextInt(256).toShort; (v, v) })
    case 5 => TypeGen("UInt16", { rr => val v = rr.nextInt(65536); (v, v) })
    case 6 => TypeGen("UInt32", { rr => val v = rr.nextLong() & 0xffffffffL; (v, v) })
    case 7 => TypeGen("UInt64", { rr =>
      val bi = new java.math.BigInteger(64, rr.self)
      (new java.math.BigDecimal(bi), (20, 0, new java.math.BigDecimal(bi)))
    })
    case 8 => TypeGen("Float32", { rr =>
      val f = java.lang.Float.intBitsToFloat(finiteFloatBits(rr))
      (f, ("f32", java.lang.Float.floatToRawIntBits(f)))
    })
    case 9 => TypeGen("Float64", { rr =>
      val d = java.lang.Double.longBitsToDouble(finiteDoubleBits(rr))
      (d, ("f64", java.lang.Double.doubleToRawLongBits(d)))
    })
    case 10 => TypeGen("Bool", { rr => val v = rr.nextBoolean(); (v, v) })
    case 11 => TypeGen("String", { rr => val s = randString(rr, 8); (s, s) })
    case 12 =>
      val n = 1 + r.nextInt(8)
      TypeGen(s"FixedString($n)", { rr =>
        val k = rr.nextInt(n + 1)
        val s = (0 until k).map(_ => ('a' + rr.nextInt(26)).toChar).mkString
        (s, s.padTo(n, '\u0000')) // decode returns the full zero-padded width
      })
    case 13 => TypeGen("Date", { rr =>
      val d = rr.nextInt(65536)
      (java.time.LocalDate.ofEpochDay(d.toLong), d)
    })
    case 14 => TypeGen("Date32", { rr => val d = rr.nextInt(200001) - 100000; (d, d) })
    case 15 => TypeGen("DateTime", { rr =>
      val us = (rr.nextLong() & 0xffffffffL) * 1000000L // whole seconds in UInt32 range
      (us, us)
    })
    case 16 =>
      val p = r.nextInt(10) // DateTime64(0..9)
      TypeGen(s"DateTime64($p)", { rr =>
        val us =
          if (p <= 6) { // micros aligned to the tick so the floor is exact
            val mult = math.pow(10, 6 - p).toLong
            (rr.nextLong() % (Long.MaxValue / mult)) * mult
          } else rr.nextLong() % (Long.MaxValue / math.pow(10, p - 6).toLong)
        (us, us)
      })
    case 17 =>
      val p = 1 + r.nextInt(38)
      val s = r.nextInt(p + 1)
      TypeGen(s"Decimal($p, $s)", { rr =>
        val unscaled = new java.math.BigInteger(1 + (p * 10) / 3, rr.self)
          .mod(java.math.BigInteger.TEN.pow(p)) // up to the full p digits
        val signed = if (rr.nextBoolean()) unscaled.negate else unscaled
        val bd = new java.math.BigDecimal(signed, s)
        (bd, (p, s, bd))
      })
    case 18 =>
      val (t, names) =
        if (r.nextBoolean()) ("Enum8('lo' = -3, 'a' = 1, 'b' = 2)", Seq("lo", "a", "b"))
        else ("Enum16('big' = 300, 'neg' = -2)", Seq("big", "neg"))
      TypeGen(t, { rr => val n = names(rr.nextInt(names.length)); (n, n) })
  }

  /** Map keys: non-nullable atoms whose external values are sane hash-map
    * keys (no floats — NaN/-0.0 keys, no zero-padded FixedString).
    */
  private def keyAtomGen(r: Random): TypeGen = {
    var g = atomGen(r)
    while (!Set("Int8", "Int16", "Int32", "Int64", "UInt8", "UInt16", "UInt32",
      "String", "Date", "Date32", "DateTime", "Bool").contains(g.ch.takeWhile(_ != '(')))
      g = atomGen(r)
    g
  }

  // ---- wrappers ---------------------------------------------------------

  private def tree(r: Random, depth: Int): TypeGen =
    if (depth == 0) {
      val a = atomGen(r)
      if (r.nextInt(4) == 0) nullable(a) else a
    } else r.nextInt(5) match {
      case 0 => // Array(inner)
        val e = tree(r, depth - 1)
        TypeGen(s"Array(${e.ch})", { rr =>
          val pairs = Seq.fill(rr.nextInt(4))(e.gen(rr))
          (pairs.map(_._1), pairs.map(_._2))
        })
      case 1 => // Map(key atom, value tree)
        val k = keyAtomGen(r)
        val v = tree(r, depth - 1)
        TypeGen(s"Map(${k.ch}, ${v.ch})", { rr =>
          val entries = Seq.fill(rr.nextInt(4))((k.gen(rr), v.gen(rr)))
            .distinctBy(_._1._1) // external keys must be distinct in a Map
          val external = scala.collection.immutable.ListMap(
            entries.map { case ((ke, _), (ve, _)) => ke -> ve }: _*)
          val byExt = entries.map { case ((ke, kn), (ve, vn)) => ke -> ((kn, ve, vn)) }.toMap
          // expected follows the SAME iteration order the encoder will use
          val expected = external.toSeq.map { case (ke, _) =>
            val (kn, _, vn) = byExt(ke); (kn, vn)
          }
          (external, expected)
        })
      case 2 => // Tuple(e1, ..., en), unnamed
        val els = Seq.fill(1 + r.nextInt(3))(tree(r, depth - 1))
        TypeGen(s"Tuple(${els.map(_.ch).mkString(", ")})", { rr =>
          val pairs = els.map(_.gen(rr))
          (pairs.map(_._1), pairs.map(_._2))
        })
      case 3 => nullable(atomGen(r))
      case 4 => // LowCardinality is transparent in RowBinary
        val a = atomGen(r)
        TypeGen(s"LowCardinality(${a.ch})", a.gen)
    }

  private def nullable(a: TypeGen): TypeGen =
    TypeGen(s"Nullable(${a.ch})", { rr =>
      if (rr.nextInt(3) == 0) (null, null) else a.gen(rr)
    })

  // ---- the fuzz ---------------------------------------------------------

  private def roundTrip(ch: String, external: Any): Any = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    RowBinary.encoder(ch).write(out, external)
    out.flush()
    RowBinary.decoder(ch).read(
      new DataInputStream(new ByteArrayInputStream(bos.toByteArray)))
  }

  test("400 random type trees x 3 values round-trip encode -> decode, " +
    "compared against independently computed expected values") {
    val r = new Random(271828)
    for (i <- 0 until 400) {
      val t = tree(r, r.nextInt(3))
      for (j <- 0 until 3) {
        val (external, expected) = t.gen(r)
        val decoded = try norm(roundTrip(t.ch, external)) catch {
          case e: Exception =>
            fail(s"tree #$i value #$j: ${t.ch} threw on $external: $e")
        }
        assert(decoded === expected, s"tree #$i value #$j: ${t.ch} external=$external")
      }
    }
  }

  // ---- row-vs-vector decode differential --------------------------------

  /** Vector slot → the same normalized shape [[norm]] produces for the
    * row-decoded value, read back through the Spark type the production
    * scan would use (ClickHouseType.parse) — so a divergence between the
    * hand-written readInto vector writers and Dec.read is a failure here,
    * not silent columnar corruption.
    */
  private def normFromVector(
      v: org.apache.spark.sql.vectorized.ColumnVector,
      dt: org.apache.spark.sql.types.DataType, row: Int): Any = {
    import org.apache.spark.sql.types._
    if (v.isNullAt(row)) null
    else dt match {
      case _: ArrayType | _: MapType | _: StructType =>
        normNested(dt, dt match {
          case _: ArrayType => v.getArray(row)
          case _: MapType => v.getMap(row)
          case _: StructType => v.getStruct(row)
        })
      case _ => norm(atomOf(v, dt, row))
    }
  }

  /** Recursive normalization of a vector READ-BACK value (ColumnarArray/
    * ColumnarMap/ColumnarRow or atom) — nested composites decode
    * natively since round 14, so the differential must walk them.
    */
  private def normNested(dt: org.apache.spark.sql.types.DataType, v: Any): Any = {
    import org.apache.spark.sql.types._
    if (v == null) null
    else dt match {
      case ArrayType(et, _) =>
        val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        (0 until a.numElements()).map(j =>
          if (a.isNullAt(j)) null else normNested(et, a.get(j, et)))
      case MapType(kt, vt, _) =>
        val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
        (0 until m.numElements()).map(j =>
          (normNested(kt, m.keyArray.get(j, kt)),
            if (m.valueArray.isNullAt(j)) null
            else normNested(vt, m.valueArray.get(j, vt))))
      case st: StructType =>
        val sr = v.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        st.fields.indices.map { j =>
          if (sr.isNullAt(j)) null
          else normNested(st.fields(j).dataType,
            sr.get(j, st.fields(j).dataType))
        }
      case _ => norm(v)
    }
  }

  private def atomOf(
      v: org.apache.spark.sql.vectorized.ColumnVector,
      dt: org.apache.spark.sql.types.DataType, row: Int): Any = {
    import org.apache.spark.sql.types._
    dt match {
      case BooleanType => v.getBoolean(row)
      case ByteType => v.getByte(row)
      case ShortType => v.getShort(row)
      case IntegerType | DateType => v.getInt(row)
      case LongType | TimestampType | TimestampNTZType => v.getLong(row)
      case FloatType => v.getFloat(row)
      case DoubleType => v.getDouble(row)
      case StringType => v.getUTF8String(row)
      case d: DecimalType => v.getDecimal(row, d.precision, d.scale)
      case other => fail(s"unexpected vector atom type $other")
    }
  }

  test("row and vector decode paths agree on random vector-supported types") {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    val r = new Random(161803)
    var covered = 0
    for (i <- 0 until 400) {
      val t = tree(r, r.nextInt(3)) // nested composites decode natively (round 14)
      RowBinary.vectorDecoder(t.ch).foreach { vd =>
        covered += 1
        val dt = graft.types.ClickHouseType.parse(t.ch).dataType
        val vals = Seq.fill(4)(t.gen(r))
        val bos = new ByteArrayOutputStream()
        val out = new DataOutputStream(bos)
        val enc = RowBinary.encoder(t.ch)
        vals.foreach(v => enc.write(out, v._1))
        out.flush()
        val wire = bos.toByteArray
        // row path
        val dec = RowBinary.decoder(t.ch)
        val rowIn = new DataInputStream(new ByteArrayInputStream(wire))
        val rowVals = vals.indices.map(_ => norm(dec.read(rowIn)))
        // vector path, through the Spark type the production scan maps to
        val vec = new OnHeapColumnVector(vals.size, dt)
        vd.reset()
        val vecIn = new DataInputStream(new ByteArrayInputStream(wire))
        vals.indices.foreach(j => vd.readInto(vecIn, vec, j))
        val vecVals = vals.indices.map(j => normFromVector(vec, dt, j))
        vec.close()
        assert(rowVals === vals.map(_._2), s"tree #$i row path: ${t.ch}")
        assert(vecVals === rowVals, s"tree #$i vector path diverges: ${t.ch}")
      }
    }
    assert(covered > 150, s"only $covered vector-supported trees generated")
  }

  test("deep nesting: a depth-4 composite survives the wire") {
    val ch = "Array(Map(String, Tuple(Nullable(Int64), Array(Nullable(String)), " +
      "Decimal(20, 4))))"
    val external = Seq(
      Map("k1" -> Seq(42L, Seq("a", null, "✓"), new java.math.BigDecimal("-12.3456")),
        "k2" -> Seq(null, Seq.empty[String], new java.math.BigDecimal("0.0001"))),
      Map.empty[String, Any])
    val decoded = norm(roundTrip(ch, external))
    assert(decoded === Seq(
      Seq("k1" -> Seq(42L, Seq("a", null, "✓"), (20, 4, new java.math.BigDecimal("-12.3456"))),
        "k2" -> Seq(null, Seq(), (20, 4, new java.math.BigDecimal("0.0001")))),
      Seq()))
  }
}
