package graft

import scala.util.Random

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.connector.ColumnarPack

/** Randomized differential for [[ColumnarPack]], the embedded read path's
  * row→vector packer: random supported schemas × random catalyst rows,
  * packed with a TINY batch size (so vectors are reset and child offsets
  * reused across many batches — the subtle part), read back through the
  * vector API and compared against the source rows. A divergence here is
  * silent columnar corruption on every embedded gate scan.
  */
class ColumnarPackFuzzSpec extends AnyFunSuite {

  // ---- random schema + value generation ----------------------------------

  /** (Spark type, value generator returning a catalyst value). */
  private case class FieldGen(dt: DataType, gen: Random => Any)

  private def atomGen(r: Random): FieldGen = r.nextInt(12) match {
    case 0 => FieldGen(BooleanType, _.nextBoolean())
    case 1 => FieldGen(ByteType, rr => (rr.nextInt(256) - 128).toByte)
    case 2 => FieldGen(ShortType, rr => rr.nextInt(65536).toShort)
    case 3 => FieldGen(IntegerType, _.nextInt())
    case 4 => FieldGen(LongType, _.nextLong())
    case 5 => FieldGen(FloatType, rr => java.lang.Float.intBitsToFloat(rr.nextInt()))
    case 6 => FieldGen(DoubleType, rr => java.lang.Double.longBitsToDouble(rr.nextLong()))
    case 7 => FieldGen(StringType, rr =>
      UTF8String.fromString(Seq.fill(rr.nextInt(9))("ab ✓é漢"(rr.nextInt(6))).mkString))
    case 8 => FieldGen(BinaryType, rr => Array.fill(rr.nextInt(9))(rr.nextInt().toByte))
    case 9 => FieldGen(DateType, _.nextInt(100000))
    case 10 => FieldGen(TimestampType, _.nextLong())
    case 11 =>
      val p = 1 + r.nextInt(38)
      val s = r.nextInt(p + 1)
      FieldGen(DecimalType(p, s), { rr =>
        val unscaled = new java.math.BigInteger(1 + (p * 10) / 3, rr.self)
          .mod(java.math.BigInteger.TEN.pow(p))
        Decimal(new java.math.BigDecimal(
          if (rr.nextBoolean()) unscaled.negate else unscaled, s), p, s)
      })
  }

  /** `depth` bounds COMPOSITE nesting: element/value/field types recurse
    * with depth-1 until atoms; depth 0 = atoms only. Covers the round-14
    * shapes (array-of-struct, map-of-array, struct-of-array and deeper)
    * alongside the original flat composites.
    */
  private def fieldGen(r: Random, depth: Int = 2): FieldGen = {
    def sub(rr: Random): FieldGen =
      if (depth <= 0) atomGen(rr) else fieldGen(rr, depth - 1)
    r.nextInt(6) match {
      case 0 | 1 | 2 => atomGen(r)
      case 3 => // Array(T), maybe with nulls
        val e = sub(r)
        val withNulls = r.nextBoolean()
        FieldGen(ArrayType(e.dt, containsNull = withNulls), { rr =>
          new GenericArrayData(Array.fill[Any](rr.nextInt(4))(
            if (withNulls && rr.nextInt(4) == 0) null else e.gen(rr)))
        })
      case 4 => // Map(atomKey, T), values maybe null; keys never null
        var k = atomGen(r)
        while (k.dt == BinaryType || k.dt == FloatType || k.dt == DoubleType) k = atomGen(r)
        val v = sub(r)
        val withNulls = r.nextBoolean()
        FieldGen(MapType(k.dt, v.dt, valueContainsNull = withNulls), { rr =>
          val n = rr.nextInt(4)
          ArrayBasedMapData(
            Array.fill[Any](n)(k.gen(rr)),
            Array.fill[Any](n)(if (withNulls && rr.nextInt(4) == 0) null else v.gen(rr)))
        })
      case 5 => // Struct(Ts), fields maybe null
        val els = Seq.fill(1 + r.nextInt(3))(sub(r))
        FieldGen(StructType(els.zipWithIndex.map { case (e, i) =>
          StructField(s"f$i", e.dt, nullable = true)
        }), { rr =>
          new GenericInternalRow(els.map(e =>
            if (rr.nextInt(5) == 0) null else e.gen(rr)).toArray[Any])
        })
    }
  }

  // ---- normalization (source catalyst value vs vector read-back) ---------

  private def normPlain(v: Any): Any = v match {
    case null => null
    case u: UTF8String => u.toString
    case b: Array[Byte] => b.toSeq
    case d: Decimal => d.toJavaBigDecimal
    case f: Float => java.lang.Float.floatToRawIntBits(f)
    case d: Double => java.lang.Double.doubleToRawLongBits(d)
    case x => x
  }

  /** Source catalyst value → normalized, by declared type (recursive
    * through any composite nesting).
    */
  private def normSource(dt: DataType, v: Any): Any =
    if (v == null) null
    else dt match {
      case ArrayType(et, _) =>
        val a = v.asInstanceOf[GenericArrayData]
        a.array.toSeq.map(x => normSource(et, x))
      case MapType(kt, vt, _) =>
        val m = v.asInstanceOf[ArrayBasedMapData]
        val ks = m.keyArray.asInstanceOf[GenericArrayData].array.toSeq
        val vs = m.valueArray.asInstanceOf[GenericArrayData].array.toSeq
        ks.map(normSource(kt, _)).zip(vs.map(normSource(vt, _)))
      case st: StructType =>
        val sr = v.asInstanceOf[GenericInternalRow]
        sr.values.toSeq.zip(st.fields).map { case (x, f) =>
          normSource(f.dataType, x)
        }
      case _ => normPlain(v)
    }

  /** Read-back value (ColumnarArray/ColumnarMap/ColumnarRow or atom) →
    * normalized, recursive through any nesting.
    */
  private def normRead(dt: DataType, v: Any): Any =
    if (v == null) null
    else dt match {
      case ArrayType(et, _) =>
        val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        (0 until a.numElements()).map(j =>
          if (a.isNullAt(j)) null else normRead(et, a.get(j, et)))
      case MapType(kt, vt, _) =>
        val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
        (0 until m.numElements()).map(j =>
          (normRead(kt, m.keyArray.get(j, kt)),
            if (m.valueArray.isNullAt(j)) null
            else normRead(vt, m.valueArray.get(j, vt))))
      case st: StructType =>
        val sr = v.asInstanceOf[InternalRow]
        st.fields.indices.map(j =>
          if (sr.isNullAt(j)) null
          else normRead(st.fields(j).dataType, sr.get(j, st.fields(j).dataType)))
      case _ => normPlain(v)
    }

  /** Vector slot → normalized, through the public vector API. */
  private def normVector(
      col: org.apache.spark.sql.vectorized.ColumnVector, dt: DataType, row: Int): Any =
    if (col.isNullAt(row)) null
    else dt match {
      case _: ArrayType => normRead(dt, col.getArray(row))
      case _: MapType => normRead(dt, col.getMap(row))
      case _: StructType => normRead(dt, col.getStruct(row))
      case BooleanType => col.getBoolean(row)
      case ByteType => col.getByte(row)
      case ShortType => col.getShort(row)
      case IntegerType | DateType => col.getInt(row)
      case LongType | TimestampType => col.getLong(row)
      case FloatType => normPlain(col.getFloat(row))
      case DoubleType => normPlain(col.getDouble(row))
      case StringType => col.getUTF8String(row).toString
      case BinaryType => col.getBinary(row).toSeq
      case d: DecimalType => col.getDecimal(row, d.precision, d.scale).toJavaBigDecimal
      case other => fail(s"unexpected atom type $other")
    }

  // ---- the fuzz -----------------------------------------------------------

  test("150 random schemas x 100 rows survive packing into reused 7-row " +
    "batches, bit for bit") {
    val r = new Random(577215)
    for (i <- 0 until 150) {
      val fields = Seq.fill(1 + r.nextInt(4))(fieldGen(r))
      val schema = StructType(fields.zipWithIndex.map { case (f, j) =>
        StructField(s"c$j", f.dt, nullable = true)
      })
      assert(ColumnarPack.supports(schema), s"schema #$i should be supported: $schema")
      val rows: Seq[Seq[Any]] = Seq.fill(100)(fields.map(f =>
        if (r.nextInt(6) == 0) null else f.gen(r)))
      val internal: Iterator[InternalRow] =
        rows.iterator.map(vs => new GenericInternalRow(vs.toArray[Any]))
      // batchSize 7: 100 rows → 15 batches, vectors reset + child offsets
      // reused 14 times
      val it = ColumnarPack.iterator(internal, schema, batchSize = 7)
      val got = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
      while (it.hasNext) {
        val b: ColumnarBatch = it.next()
        for (n <- 0 until b.numRows())
          got += fields.indices.map(c => normVector(b.column(c), fields(c).dt, n))
      }
      it.close()
      val want = rows.map(vs => fields.indices.map(c => normSource(fields(c).dt, vs(c))))
      assert(got.size == want.size, s"schema #$i row count")
      for (n <- want.indices)
        assert(got(n) === want(n), s"schema #$i row $n differs; schema=$schema")
    }
  }
}
