package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** ClickHouse `sequenceMatch(pattern)(timestamp, cond1, ..., condN)`
  * for the embedded engine, on the SUBSEQUENCE-expressible pattern
  * subset:
  *
  *  - `(?N)` condition references (the documented example law is
  *    subsequence matching — events between matched ones are allowed:
  *    sequenceMatch('(?1)(?2)') over events 1,3,2 → 1);
  *  - `(?t<=n)` / `(?t<n)` UPPER-BOUND time constraints between two
  *    adjacent references, measured between the CONSECUTIVE matched
  *    events;
  *  - `.*` (any number of events) — a no-op under subsequence
  *    semantics, accepted and ignored.
  *
  * `.` (exactly one any-event), `(?t>n)`/`(?t>=n)`/`(?t==n)` lower/
  * equality constraints REJECT loudly: with only upper bounds the
  * LATEST completion of a prefix strictly dominates (a later previous
  * event can only shrink the gap to any future candidate), so the
  * one-pass single-candidate scan below is exactly the exists-a-
  * matching-subsequence law; lower-bound constraints invert that
  * dominance and would need candidate SETS — not pinnable against a
  * server offline.
  *
  * Returns UInt8 0/1 (IntegerType). Timestamp/window units follow
  * [[ChWindowFunnel]]'s contract (seconds on timestamp children,
  * column units on integral). State = one (ts, bitmask) per event
  * matching ANY referenced condition.
  */
case class ChSequenceMatch(
    pattern: String,
    ts: Expression,
    conds: Seq[Expression],
    countMode: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Int)]] {

  import ChSequenceMatch._

  /** (condIdx 0-based, optional (maxGap, inclusive) vs previous ref). */
  @transient private lazy val steps: Seq[(Int, Option[(Long, Boolean)])] =
    parsePattern(pattern, conds.size)

  override def children: Seq[Expression] = ts +: conds
  override def nullable: Boolean = false
  override def dataType: DataType = if (countMode) LongType else IntegerType
  override def prettyName: String =
    if (countMode) "sequenceCount" else "sequenceMatch"

  private def tsIsTimestamp: Boolean = ts.dataType match {
    case TimestampType | TimestampNTZType => true
    case _ => false
  }
  private def unitScale: Long = if (tsIsTimestamp) 1000000L else 1L

  override def checkInputDataTypes(): TypeCheckResult = {
    val tsOk = ts.dataType match {
      case TimestampType | TimestampNTZType | LongType | IntegerType |
           ShortType | ByteType | DateType => true
      case _ => false
    }
    if (!tsOk) TypeCheckResult.TypeCheckFailure(
      s"sequenceMatch: the timestamp must be a DateTime or integer — got " +
        ts.dataType.catalogString)
    else conds.find(_.dataType != BooleanType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"sequenceMatch: conditions must be booleans — got ${c.dataType.catalogString}")
      case None =>
        // force the pattern parse so bad patterns fail at analysis
        if (steps.isEmpty) TypeCheckResult.TypeCheckFailure(
          s"$prettyName: the pattern must contain at least one (?N) " +
            "reference")
        else TypeCheckResult.TypeCheckSuccess
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

  override def eval(buf: mutable.ArrayBuffer[(Long, Int)]): Any =
    if (countMode) countMatches(buf)
    else if (countMatches(buf, stopAtFirst = true) > 0L) 1 else 0

  /** Latest-completion DP: done(i) with last(i) = the LATEST valid
    * completion time of the first i+1 steps. With upper-bound gaps the
    * latest completion strictly dominates (a later previous event
    * shrinks the gap to any future candidate, and scan order already
    * guarantees last(i-1) ≤ t), so overwriting a single candidate is
    * exact — the mirror of windowFunnel's chain-START refresh, whose
    * window is anchored at level 1 instead.
    *
    * Count mode is the server's non-overlapping law: a completed chain
    * resets the search, which resumes AFTER the completing event; the
    * DP's first completion is the earliest-ending match, so the greedy
    * reset maximizes (and equals) the server's non-overlapping count.
    */
  private def countMatches(buf: mutable.ArrayBuffer[(Long, Int)],
      stopAtFirst: Boolean = false): Long = {
    val k = steps.size
    if (k == 0 || buf.isEmpty) return 0L
    val sorted = buf.sortBy(_._1)
    val last = Array.fill[Long](k)(0L)
    val done = Array.fill(k)(false)
    var count = 0L
    sorted.foreach { case (t, mask) =>
      var i = k - 1
      var completed = false
      while (i >= 0 && !completed) {
        // DESC: one event never serves two adjacent steps
        val (condIdx, gap) = steps(i)
        if ((mask & (1 << condIdx)) != 0 &&
          (i == 0 || (done(i - 1) && gapOk(t - last(i - 1), gap)))) {
          done(i) = true
          last(i) = t
          if (i == k - 1) {
            count += 1L
            if (stopAtFirst) return count
            completed = true // non-overlap: restart AFTER this event
            java.util.Arrays.fill(done, false)
          }
        }
        i -= 1
      }
    }
    count
  }

  private def gapOk(delta: Long, gap: Option[(Long, Boolean)]): Boolean =
    gap match {
      case None => true
      case Some((g, incl)) =>
        val bound = g * unitScale
        if (incl) delta <= bound else delta < bound
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

  override def withNewMutableAggBufferOffset(newOffset: Int): ChSequenceMatch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ChSequenceMatch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChSequenceMatch =
    copy(ts = newChildren.head, conds = newChildren.tail)
}

object ChSequenceMatch {

  private val Ref = raw"^\(\?(\d+)\)".r
  private val Gap = raw"^\(\?t(<=|<|>=|>|==)(\d+)\)".r

  /** Parse the documented pattern grammar into (condIdx, gap-vs-prev)
    * steps; rejections are loud and name the unsupported token.
    */
  def parsePattern(pattern: String,
      nConds: Int): Seq[(Int, Option[(Long, Boolean)])] = {
    val out = mutable.ArrayBuffer.empty[(Int, Option[(Long, Boolean)])]
    var pendingGap: Option[(Long, Boolean)] = None
    var rest = pattern
    while (rest.nonEmpty) {
      Ref.findFirstMatchIn(rest) match {
        case Some(m) =>
          val idx = m.group(1).toInt
          require(idx >= 1 && idx <= nConds,
            s"sequenceMatch: (?$idx) references condition $idx but only " +
              s"$nConds were given")
          out += ((idx - 1, pendingGap))
          pendingGap = None
          rest = rest.substring(m.matched.length)
        case None =>
          Gap.findFirstMatchIn(rest) match {
            case Some(m) =>
              require(out.nonEmpty,
                "sequenceMatch: a time constraint must follow a (?N) reference")
              require(pendingGap.isEmpty,
                "sequenceMatch: consecutive time constraints are not supported")
              m.group(1) match {
                case "<=" => pendingGap = Some((m.group(2).toLong, true))
                case "<" => pendingGap = Some((m.group(2).toLong, false))
                case op => throw new IllegalArgumentException(
                  s"sequenceMatch: the '(?t$op...)' constraint is not " +
                    "supported by the embedded engine — lower-bound/" +
                    "equality constraints break the earliest-completion " +
                    "dominance that makes the scan exact; run against a " +
                    "real server")
              }
              rest = rest.substring(m.matched.length)
            case None if rest.startsWith(".*") =>
              // any number of events: a no-op under subsequence semantics
              rest = rest.substring(2)
            case None => throw new IllegalArgumentException(
              s"sequenceMatch: unsupported pattern token at '${rest.take(8)}'" +
                " — supported: (?N), (?t<=n), (?t<n), .* ('.' single-event" +
                " steps are not subsequence-expressible; run against a " +
                "real server)")
          }
      }
    }
    require(pendingGap.isEmpty,
      "sequenceMatch: a trailing time constraint has no following (?N)")
    out.toSeq
  }
}
