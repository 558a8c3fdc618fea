package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** ClickHouse `windowFunnel(window)(timestamp, cond1, ..., condN)` for
  * the embedded engine (DEFAULT mode only — the documented law):
  * returns the maximum funnel level reached, where a level-L chain is
  * events e1 ≤ e2 ≤ ... ≤ eL in timestamp order matching cond1..condL
  * with every event inside `[t(e1), t(e1) + window]`. Implemented as
  * the server's documented scan (sort by timestamp; cond1 events
  * refresh the level-1 chain start — a LATER start strictly dominates
  * for future extension, which is what makes the single-candidate scan
  * equal to the exists-a-chain law; cond_k events promote when within
  * window of the stored chain start).
  *
  * Contract choices, documented not guessed:
  *  - mode flags ('strict_order', 'strict_dedup', 'strict_increase')
  *    REJECT at translate time — different documented algorithms, each
  *    would need its own pins;
  *  - a TimestampType child measures `window` in SECONDS (the DateTime
  *    convention; comparisons run at full micros precision, identical
  *    for whole-second DateTime data). Integral children use the
  *    column's own unit, the server law;
  *  - events where several conditions hold at the SAME timestamp
  *    process in condition order (the server's sort is
  *    timestamp-stable over condition index). Gate/spec data uses
  *    disjoint conditions and tie-free timestamps, so no unpinned tie
  *    law is ever load-bearing.
  *
  * State is one (timestamp, condition-bitmask) pair per event matching
  * ANY condition — the filter happens at update, so group state is
  * bounded by matching events, the same class as the server's own
  * in-memory event list.
  */
case class ChWindowFunnel(
    window: Long,
    ts: Expression,
    conds: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Int)]] {

  require(window >= 0, s"windowFunnel: window must be non-negative (got $window)")
  require(conds.nonEmpty && conds.size <= 32,
    s"windowFunnel: 1 to 32 conditions (got ${conds.size})")

  override def children: Seq[Expression] = ts +: conds

  override def nullable: Boolean = false

  override def dataType: DataType = IntegerType

  override def prettyName: String = "windowFunnel"

  private def tsIsTimestamp: Boolean = ts.dataType match {
    case TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Window in the child's INTERNAL unit (micros for timestamps). */
  private def windowInternal: Long =
    if (tsIsTimestamp) window * 1000000L else window

  override def checkInputDataTypes(): TypeCheckResult = {
    val tsOk = ts.dataType match {
      case TimestampType | TimestampNTZType | LongType | IntegerType |
           ShortType | ByteType | DateType => true
      case _ => false
    }
    if (!tsOk) TypeCheckResult.TypeCheckFailure(
      s"windowFunnel: the timestamp must be a DateTime or integer — got " +
        ts.dataType.catalogString)
    else conds.find(_.dataType != BooleanType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"windowFunnel: conditions must be booleans — got ${c.dataType.catalogString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Int)] =
    mutable.ArrayBuffer.empty

  override def update(
      buf: mutable.ArrayBuffer[(Long, Int)],
      input: InternalRow): mutable.ArrayBuffer[(Long, Int)] = {
    val t = ts.eval(input)
    if (t != null) {
      var mask = 0
      var i = 0
      while (i < conds.size) {
        conds(i).eval(input) match {
          case java.lang.Boolean.TRUE => mask |= 1 << i
          case _ =>
        }
        i += 1
      }
      if (mask != 0) {
        val tl = t match {
          case l: Long => l
          case n: java.lang.Number => n.longValue()
        }
        buf += ((tl, mask))
      }
    }
    buf
  }

  override def merge(
      buf: mutable.ArrayBuffer[(Long, Int)],
      other: mutable.ArrayBuffer[(Long, Int)]): mutable.ArrayBuffer[(Long, Int)] = {
    buf ++= other
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[(Long, Int)]): Any = {
    if (buf.isEmpty) return 0
    // one (ts, condIdx) entry per matched condition, timestamp order
    // with condition order breaking ties (the documented stable sort)
    val entries = mutable.ArrayBuffer.empty[(Long, Int)]
    buf.foreach { case (t, mask) =>
      var i = 0
      while (i < conds.size) {
        if ((mask & (1 << i)) != 0) entries += ((t, i))
        i += 1
      }
    }
    val sorted = entries.sortBy(e => (e._1, e._2))
    val n = conds.size
    val w = windowInternal
    val starts = Array.fill[Long](n)(Long.MinValue) // chain-start ts per level
    val reached = Array.fill(n)(false)
    sorted.foreach { case (t, idx) =>
      if (idx == 0) { starts(0) = t; reached(0) = true }
      else if (reached(idx - 1) && t - starts(idx - 1) <= w) {
        starts(idx) = starts(idx - 1)
        reached(idx) = true
        if (idx == n - 1) return n
      }
    }
    var lvl = n - 1
    while (lvl >= 0 && !reached(lvl)) lvl -= 1
    lvl + 1
  }

  override def serialize(buf: mutable.ArrayBuffer[(Long, Int)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, m) => out.writeLong(t); out.writeInt(m) }
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, Int)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(Long, Int)]
    var i = 0
    while (i < n) {
      val t = in.readLong()
      val m = in.readInt()
      buf += ((t, m))
      i += 1
    }
    in.close()
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ChWindowFunnel =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): ChWindowFunnel =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChWindowFunnel =
    copy(ts = newChildren.head, conds = newChildren.tail)
}
