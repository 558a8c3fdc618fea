package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse `sumMap(keys, values)` / `minMap` / `maxMap` for the
  * embedded engine: per-key folds over parallel key/value arrays across
  * the group, returning the documented tuple of (keys sorted ascending,
  * folded values) — the metric-map idiom.
  *
  * Laws, documented not guessed:
  *  - the two arrays must be the SAME LENGTH per row — the server
  *    errors, and so does this aggregate (loudly, at the row);
  *  - integral value arrays fold in exact Long arithmetic; Float32/64
  *    fold as Double; other value types reject at type check;
  *  - NULL arrays skip the row; NULL keys/values skip the element
  *    (the base aggregates' NULL-skipping — chosen instance, never
  *    load-bearing in gates/pins);
  *  - a key whose folded value is ZERO rejects loudly at eval: whether
  *    the server drops zero totals is ambiguous in offline sources
  *    (the reason this family used to reject by NAME), so the one
  *    ambiguous instance errors instead of silently picking a law —
  *    the gcd(0,0) pattern. Guard zero totals explicitly or run
  *    against a real server.
  */
case class ChMapAgg(
    keys: Expression,
    values: Expression,
    mode: ChMapAgg.Mode.Value,
    wrapUW: Option[Int] = None,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Any, Any]] {

  import ChMapAgg._

  override def children: Seq[Expression] = Seq(keys, values)
  override def nullable: Boolean = false
  override def prettyName: String = mode match {
    case Mode.Sum => "sumMap"
    case Mode.Min => "minMap"
    case Mode.Max => "maxMap"
    case Mode.SumOv => "sumMapWithOverflow"
  }

  private def keyType: DataType =
    keys.dataType.asInstanceOf[ArrayType].elementType
  private def valType: DataType =
    values.dataType.asInstanceOf[ArrayType].elementType
  private def valIsIntegral: Boolean = valType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }
  private def outValType: DataType =
    if (valIsIntegral) LongType else DoubleType

  override def dataType: DataType = StructType(Seq(
    StructField("k", ArrayType(keyType, containsNull = false), nullable = false),
    StructField("v", ArrayType(outValType, containsNull = false), nullable = false)))

  @transient private lazy val keyOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(keyType)

  override def checkInputDataTypes(): TypeCheckResult =
    (keys.dataType, values.dataType) match {
      case (ArrayType(kt, _), ArrayType(vt, _)) =>
        if (!TypeUtils.typeWithProperEquals(kt))
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName: keys of type ${kt.catalogString} cannot be grouped")
        else vt match {
          case LongType | IntegerType | ShortType | ByteType =>
            TypeCheckResult.TypeCheckSuccess
          case DoubleType | FloatType if mode != Mode.SumOv =>
            TypeCheckResult.TypeCheckSuccess
          case DoubleType | FloatType => TypeCheckResult.TypeCheckFailure(
            s"$prettyName: wrapping overflow is an INTEGER law — float " +
              "values have no wrap width (use sumMap)")
          case other => TypeCheckResult.TypeCheckFailure(
            s"$prettyName: values must be integral or float — got " +
              other.catalogString)
        }
      case (k, v) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes (array, array) — got " +
          s"(${k.catalogString}, ${v.catalogString})")
    }

  override def createAggregationBuffer(): mutable.HashMap[Any, Any] =
    mutable.HashMap.empty

  private def copyKey(v: Any): Any = v match {
    case u: UTF8String => u.copy()
    case b: Array[Byte] => b.clone()
    case other => other
  }

  /** sumMapWithOverflow wrap width: declared-unsigned inline arrays
    * wrap unsigned at the captured byte width (the r91 plumbing —
    * `wrapUW` survives reference binding); everything else wraps
    * SIGNED at the resolved element width, the server's same-type
    * result law. Wrapping each addition equals wrapping the Long fold
    * once (mod-2^w arithmetic is associative and 2^w divides 2^64).
    */
  private def wrapEffW: Option[Int] =
    ChMapAgg.arrayDeclaredW(values).orElse(wrapUW)

  private def wrapVal(v: Long): Long = wrapEffW match {
    case Some(w) => v & ((1L << (8 * w)) - 1)
    case None => valType match {
      case LongType => v
      case IntegerType => v.toInt.toLong
      case ShortType => v.toShort.toLong
      case ByteType => v.toByte.toLong
      case other => throw new IllegalStateException(
        s"$prettyName: unexpected value type $other")
    }
  }

  private def fold(a: Any, b: Any): Any =
    if (valIsIntegral) {
      val (x, y) = (a.asInstanceOf[Long], b.asInstanceOf[Long])
      mode match {
        case Mode.Sum => math.addExact(x, y)
        case Mode.Min => math.min(x, y)
        case Mode.Max => math.max(x, y)
        case Mode.SumOv => x + y // wrapping — the law, see wrapEffW
      }
    } else {
      val (x, y) = (a.asInstanceOf[Double], b.asInstanceOf[Double])
      mode match {
        case Mode.Sum => x + y
        case Mode.Min => math.min(x, y)
        case Mode.Max => math.max(x, y)
        case Mode.SumOv => throw new IllegalStateException(
          "sumMapWithOverflow over floats rejects at type check")
      }
    }

  private def widen(v: Any): Any =
    if (valIsIntegral) (v: @unchecked) match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
    } else (v: @unchecked) match {
      case d: Double => d
      case f: Float => f.toDouble
    }

  override def update(
      buf: mutable.HashMap[Any, Any], input: InternalRow): mutable.HashMap[Any, Any] = {
    val ka = keys.eval(input).asInstanceOf[ArrayData]
    val va = values.eval(input).asInstanceOf[ArrayData]
    if (ka != null && va != null) {
      require(ka.numElements() == va.numElements(),
        s"$prettyName: the key and value arrays must have the same " +
          s"length (got ${ka.numElements()} vs ${va.numElements()} — " +
          "the server errors on this row too)")
      var i = 0
      while (i < ka.numElements()) {
        if (!ka.isNullAt(i) && !va.isNullAt(i)) {
          val k = copyKey(ka.get(i, keyType))
          val v = widen(va.get(i, valType))
          buf.get(k) match {
            case Some(prev) => buf.update(k, fold(prev, v))
            case None => buf.update(k, v)
          }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[Any, Any],
      other: mutable.HashMap[Any, Any]): mutable.HashMap[Any, Any] = {
    other.foreach { case (k, v) =>
      buf.get(k) match {
        case Some(prev) => buf.update(k, fold(prev, v))
        case None => buf.update(k, v)
      }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[Any, Any]): Any = {
    val sorted0 = buf.toSeq.sortWith((a, b) => keyOrdering.lt(a._1, b._1))
    // sumMapWithOverflow wraps the folded totals at the value width
    // BEFORE the zero-ambiguity check (a wrapped-to-zero total is a
    // zero total the same way)
    val sorted =
      if (mode == Mode.SumOv)
        sorted0.map { case (k, v) => (k, wrapVal(v.asInstanceOf[Long])) }
      else sorted0
    sorted.foreach { case (k, v) =>
      val isZero =
        if (valIsIntegral) v.asInstanceOf[Long] == 0L
        else v.asInstanceOf[Double] == 0.0
      if (isZero) throw new IllegalArgumentException(
        s"$prettyName: key $k folded to ZERO — whether the server drops " +
          "zero-total keys is not a pinnable law offline; guard zero " +
          "totals explicitly or run against a real server")
    }
    InternalRow(
      new GenericArrayData(sorted.map(_._1).toArray),
      new GenericArrayData(sorted.map(_._2).toArray))
  }

  override def serialize(buf: mutable.HashMap[Any, Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeInt(buf.size)
    buf.foreach { case (k, v) => oos.writeObject(k); oos.writeObject(v) }
    oos.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Any] = {
    val ois = new ObjectInputStream(new ByteArrayInputStream(bytes))
    val n = ois.readInt()
    val buf = mutable.HashMap.empty[Any, Any]
    var i = 0
    while (i < n) {
      val k = ois.readObject()
      val v = ois.readObject()
      buf.update(k, v)
      i += 1
    }
    ois.close()
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ChMapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ChMapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChMapAgg =
    copy(keys = newChildren(0), values = newChildren(1),
      wrapUW = ChMapAgg.widthThroughArray(newChildren(1), wrapEffW))
}

object ChMapAgg {
  object Mode extends Enumeration {
    val Sum, Min, Max, SumOv = Value
  }

  /** Declared-unsigned width shared by EVERY element of an inline
    * array literal (`[u32col]`) — the sumMapWithOverflow wrap width for
    * declared-unsigned stores. None when elements disagree or the
    * values expression is not an inline array (resolved signed width
    * applies then).
    */
  def arrayDeclaredW(values: Expression): Option[Int] = values match {
    case ca: org.apache.spark.sql.catalyst.expressions.CreateArray
        if ca.children.nonEmpty =>
      val ws = ca.children.map(GraftHashes.declaredWidth)
      if (ws.forall(w => w.isDefined && w == ws.head)) ws.head else None
    case _ => None
  }

  /** [[GraftHashes.widthThrough]] lifted over an inline array's
    * elements (binding replaces the elements, not the CreateArray).
    */
  def widthThroughArray(newValues: Expression,
      prev: Option[Int]): Option[Int] = newValues match {
    case ca: org.apache.spark.sql.catalyst.expressions.CreateArray
        if ca.children.nonEmpty =>
      val ws = ca.children.map(c => GraftHashes.widthThrough(c, prev))
      if (ws.forall(w => w.isDefined && w == ws.head)) ws.head else None
    case _ => None
  }
}
