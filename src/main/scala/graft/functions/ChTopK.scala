package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact model of ClickHouse `topK(k)(x)` / `topKWeighted(k)(x, w)` for
  * the embedded server session (reference surface: the passthrough
  * aggregate battery, SURVEY.md §2.8). The server's Filtered Space-Saving
  * sketch "returns an array of the approximately most frequent values" —
  * exact frequencies are a legal instance of that contract (the same rule
  * as the uniq family), and where the server's result is order-unstable
  * under merges, this one is deterministic: counts are exact, ranking is
  * (count DESC, value ASC).
  *
  * Values are the child's Catalyst representation; buffer values are
  * defensively copied (UTF8String points into reused row buffers).
  * NULL values accumulate nothing, like every ClickHouse aggregate over
  * a Nullable column.
  */
case class ChTopK(
    child: Expression,
    k: Int,
    weight: Option[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Any, Long]] {

  require(k > 0, s"topK: k must be positive (got $k)")

  override def children: Seq[Expression] = child +: weight.toSeq

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  @transient private lazy val valueOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (!TypeUtils.typeWithProperEquals(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topK: values of type ${child.dataType.catalogString} cannot be counted")
    else if (weight.exists(w => !org.apache.spark.sql.graft.bridge.isIntegral(w.dataType)))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topKWeighted: weight must be integral (got ${weight.get.dataType.catalogString})")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty

  private def copyValue(v: Any): Any = v match {
    case u: UTF8String => u.copy()
    case b: Array[Byte] => b.clone()
    case other => other
  }

  override def update(
      buf: mutable.HashMap[Any, Long], input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // a NULL weight skips the row (NULL in any aggregated argument);
      // weight ZERO still ENTERS the value (it ranks by total weight 0,
      // visible when fewer than k values exist — caught by the
      // differential fuzz, round-13 session 3)
      val w = weight match {
        case None => Some(1L)
        case Some(we) => we.eval(input) match {
          case null => None
          case n: java.lang.Number => Some(n.longValue())
        }
      }
      w.foreach { wv =>
        val key = copyValue(v)
        buf.update(key, buf.getOrElse(key, 0L) + wv)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[Any, Long],
      other: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    other.foreach { case (v, c) => buf.update(v, buf.getOrElse(v, 0L) + c) }
    buf
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    val top = buf.toSeq
      .sortWith { case ((v1, c1), (v2, c2)) =>
        if (c1 != c2) c1 > c2 else valueOrdering.lt(v1, v2)
      }
      .take(k)
      .map(_._1)
    new GenericArrayData(top.toArray)
  }

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeInt(buf.size)
    buf.foreach { case (v, c) => oos.writeObject(v); oos.writeLong(c) }
    oos.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val ois = new ObjectInputStream(new ByteArrayInputStream(bytes))
    val n = ois.readInt()
    val buf = mutable.HashMap.empty[Any, Long]
    var i = 0
    while (i < n) {
      val v = ois.readObject()
      val c = ois.readLong()
      buf.update(v, c)
      i += 1
    }
    ois.close()
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ChTopK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): ChTopK =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChTopK =
    if (weight.isDefined) copy(child = newChildren(0), weight = Some(newChildren(1)))
    else copy(child = newChildren(0))

  override def prettyName: String = if (weight.isDefined) "topKWeighted" else "topK"
}
