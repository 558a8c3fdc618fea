package graft.connector

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.SpecializedGetters
import org.apache.spark.sql.execution.vectorized.{OnHeapColumnVector, WritableColumnVector}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

/** Row→vector packer for the remote read path: turns the transport's
  * InternalRow stream into reused [[ColumnarBatch]] blocks so the
  * scan boundary is vectorized (one virtual call per ~4K rows instead of
  * per row, and Spark's codegen'd ColumnarToRow on top). This is the
  * engine-side half of the reference's Arrow-native transport
  * (/root/reference/src/connection.rs:163-178, src/stream.rs:21-28 —
  * RecordBatch streams end to end); a real wire client overrides
  * [[graft.client.ClickHouseClient.readPartitionColumnar]] to decode
  * server blocks straight into vectors and skips this packer entirely.
  *
  * Vectors are REUSED across batches (the standard vectorized-reader
  * contract: consumers must not hold a batch across next()).
  */
object ColumnarPack {

  val DefaultBatchSize = 4096

  /** Types the packer (and the OnHeap vectors) can carry: atomics and
    * ANY nesting of arrays/maps/structs over them (array-of-struct,
    * map-of-array, ... — the reference is Arrow columnar for every type,
    * connection.rs:163-178). Interval/variant/UDT stay on the row path.
    */
  def supports(schema: StructType): Boolean =
    schema.nonEmpty && schema.fields.forall(f => supportsType(f.dataType))

  private def supportsType(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | BinaryType | DateType |
         TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case ArrayType(et, _) => supportsType(et)
    case MapType(kt, vt, _) => supportsType(kt) && supportsType(vt)
    case StructType(fields) => fields.forall(f => supportsType(f.dataType))
    case _ => false
  }

  /** Pack an internal-row iterator into reused columnar batches. */
  def iterator(
      rows: Iterator[InternalRow],
      schema: StructType,
      batchSize: Int = DefaultBatchSize): Iterator[ColumnarBatch] with AutoCloseable =
    new Iterator[ColumnarBatch] with AutoCloseable {
      private val vectors = OnHeapColumnVector.allocateColumns(batchSize, schema)
      private val batch = new ColumnarBatch(vectors.map(v => v: ColumnVector))
      // running element offset per ARRAY-SHAPED vector (array and map
      // child vectors grow monotonically within a batch, reset with it);
      // keyed by vector IDENTITY so arbitrarily nested children each
      // track their own offset
      private val childOffsets =
        new java.util.IdentityHashMap[WritableColumnVector, Integer]()
      private val types = schema.fields.map(_.dataType)

      override def hasNext: Boolean = rows.hasNext

      override def next(): ColumnarBatch = {
        var i = 0
        while (i < vectors.length) { vectors(i).reset(); i += 1 }
        childOffsets.clear()
        var n = 0
        while (n < batchSize && rows.hasNext) {
          val r = rows.next()
          var c = 0
          while (c < types.length) {
            if (r.isNullAt(c)) vectors(c).putNull(n)
            else write(vectors(c), n, r, c, types(c))
            c += 1
          }
          n += 1
        }
        batch.setNumRows(n)
        batch
      }

      override def close(): Unit = batch.close()

      private def offsetOf(v: WritableColumnVector): Int = {
        val o = childOffsets.get(v)
        if (o == null) 0 else o.intValue
      }

      /** Write `src(ord)` (non-null) into slot `idx` of `v`. `src` is an
        * InternalRow or ArrayData — both are [[SpecializedGetters]], so
        * one recursive writer covers every nesting. Nested child vectors
        * are reserved per write (capacity grows geometrically; top-level
        * vectors are pre-sized to the batch).
        */
      private def write(
          v: WritableColumnVector, idx: Int, src: SpecializedGetters,
          ord: Int, dt: DataType): Unit = dt match {
        case BooleanType => v.putBoolean(idx, src.getBoolean(ord))
        case ByteType => v.putByte(idx, src.getByte(ord))
        case ShortType => v.putShort(idx, src.getShort(ord))
        case IntegerType | DateType => v.putInt(idx, src.getInt(ord))
        case LongType | TimestampType | TimestampNTZType =>
          v.putLong(idx, src.getLong(ord))
        case FloatType => v.putFloat(idx, src.getFloat(ord))
        case DoubleType => v.putDouble(idx, src.getDouble(ord))
        case StringType =>
          val b = src.getUTF8String(ord).getBytes
          v.putByteArray(idx, b, 0, b.length)
        case BinaryType =>
          val b = src.getBinary(ord)
          v.putByteArray(idx, b, 0, b.length)
        case d: DecimalType =>
          v.putDecimal(idx, src.getDecimal(ord, d.precision, d.scale), d.precision)
        case ArrayType(et, _) =>
          val arr = src.getArray(ord)
          val m = arr.numElements()
          val child = v.arrayData()
          val start = offsetOf(child)
          child.reserve(start + m)
          var j = 0
          while (j < m) {
            if (arr.isNullAt(j)) child.putNull(start + j)
            else write(child, start + j, arr, j, et)
            j += 1
          }
          v.putArray(idx, start, m)
          childOffsets.put(child, Integer.valueOf(start + m))
        case MapType(kt, vt, _) =>
          // maps share the array offsets mechanism: child 0 = keys,
          // child 1 = values, both growing at the same element offsets
          // (tracked on the KEY vector; both children reserve together)
          val map = src.getMap(ord)
          val m = map.numElements()
          val keys = v.getChild(0)
          val vals = v.getChild(1)
          val start = offsetOf(keys)
          keys.reserve(start + m)
          vals.reserve(start + m)
          val ka = map.keyArray()
          val va = map.valueArray()
          var j = 0
          while (j < m) {
            write(keys, start + j, ka, j, kt) // SQL map keys are never null
            if (va.isNullAt(j)) vals.putNull(start + j)
            else write(vals, start + j, va, j, vt)
            j += 1
          }
          v.putArray(idx, start, m)
          childOffsets.put(keys, Integer.valueOf(start + m))
        case st: StructType =>
          // struct children index by the PARENT's slot (no offsets); a
          // struct nested under an array indexes by that array's element
          // offset, which `idx` already is
          val sr = src.getStruct(ord, st.length)
          var j = 0
          while (j < st.length) {
            val child = v.getChild(j)
            child.reserve(idx + 1)
            if (sr.isNullAt(j)) child.putNull(idx)
            else write(child, idx, sr, j, st.fields(j).dataType)
            j += 1
          }
        case other =>
          throw new IllegalStateException(s"unsupported columnar type $other")
      }
    }
}
