package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** ClickHouse `sequenceMatch(pattern)(timestamp, cond1, ..., condN)`
  * for the embedded engine, on the documented pattern grammar:
  *
  *  - `(?N)` condition references (the documented example law is
  *    subsequence matching — events between matched ones are allowed:
  *    sequenceMatch('(?1)(?2)') over events 1,3,2 → 1);
  *  - `(?t<=n)` / `(?t<n)` / `(?t>n)` / `(?t>=n)` / `(?t==n)` time
  *    constraints between the two ADJACENT matched events (the
  *    documented "time that should separate two events");
  *  - `.` — exactly one arbitrary event (any event, matching a
  *    condition or not) between the adjacent matched steps;
  *  - `.*` (any number of events) — a no-op under subsequence
  *    semantics, accepted and ignored.
  *
  * Round 17 replaced the single-candidate scan with a CANDIDATE-SET
  * DP, which lifts the round-16 rejects on lower-bound/equality
  * constraints and `.`: cand(i) is the set of feasible last-event
  * times of a match of steps 0..i, and each event (steps processed
  * DESCENDING so one event never serves two adjacent steps) joins
  * cand(i) when some c ∈ cand(i-1) satisfies the step's gap. The sets
  * stay exact under pruning keyed on the NEXT step's constraint —
  * the only consumer of cand(i):
  *
  *  - next gap absent or an UPPER bound (`<`,`<=`): satisfaction is
  *    monotone DECREASING in the gap, so the LATEST candidate
  *    dominates — singleton (the round-16 law, now a special case);
  *  - next gap a LOWER bound (`>`,`>=`): monotone INCREASING — the
  *    EARLIEST candidate dominates — singleton (this is the dominance
  *    INVERSION the round-16 scaladoc named as requiring sets);
  *  - next gap EQUALITY (`==`): nothing dominates — the full distinct
  *    set is kept, bounded by [[ChSequenceMatch.CandidateCap]] with a
  *    LOUD overflow (never silent truncation).
  *
  * Count mode is the server's non-overlapping law: the DP's first
  * completion is the earliest-ending match; the greedy
  * reset-after-completion (search resumes AFTER the completing event)
  * maximizes and equals the non-overlapping count.
  *
  * Returns UInt8 0/1 (IntegerType). Timestamp/window units follow
  * [[ChWindowFunnel]]'s contract (seconds on timestamp children,
  * column units on integral). State = one (ts, bitmask) per event
  * matching ANY referenced condition — plus, when the pattern contains
  * a `.` step, one zero-mask entry per other event (the any-step needs
  * them) — bounded by [[ChWindowFunnel.maxEventsConf]] with a LOUD
  * overflow (the r93-family hot-key guard).
  */
case class ChSequenceMatch(
    pattern: String,
    ts: Expression,
    conds: Seq[Expression],
    countMode: Boolean = false,
    maxEvents: Int = ChWindowFunnel.maxEventsConf(),
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Int)]] {

  import ChSequenceMatch._

  // mask bits live in an Int: >32 conditions would alias bit N+32 with
  // bit N via Scala's mod-32 shift — reject the arity loudly like the
  // server (and ChWindowFunnel) instead
  require(conds.nonEmpty && conds.size <= 32,
    s"$prettyName: 1 to 32 conditions (got ${conds.size})")

  /** (condIdx 0-based or -1 for `.`, optional gap vs previous ref). */
  @transient private lazy val steps: Seq[(Int, Option[Gap])] =
    parsePattern(pattern, conds.size)

  /** `.` steps match events that satisfy NO condition — those must be
    * recorded too.
    */
  @transient private lazy val needsAllEvents: Boolean =
    steps.exists(_._1 == -1)

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
      if (mask != 0 || needsAllEvents) {
        val tl = t match {
          case l: Long => l
          case n: java.lang.Number => n.longValue()
        }
        buf += ((tl, mask))
        ChWindowFunnel.checkCap(buf.size, maxEvents, prettyName)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.ArrayBuffer[(Long, Int)],
      other: mutable.ArrayBuffer[(Long, Int)]): mutable.ArrayBuffer[(Long, Int)] = {
    buf ++= other
    ChWindowFunnel.checkCap(buf.size, maxEvents, prettyName)
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[(Long, Int)]): Any =
    if (countMode) countMatches(buf)
    else if (countMatches(buf, stopAtFirst = true) > 0L) 1 else 0

  /** Candidate-set DP (laws and pruning argument in the class
    * scaladoc). cand(i) holds feasible last-event times of a match of
    * steps 0..i, pruned per step i+1's constraint type; scan order
    * guarantees every candidate ≤ the current event time.
    */
  private def countMatches(buf: mutable.ArrayBuffer[(Long, Int)],
      stopAtFirst: Boolean = false): Long = {
    val k = steps.size
    if (k == 0 || buf.isEmpty) return 0L
    // deterministic tie law (the server documents same-second order as
    // undefined; ours must be partition-invariant): at an equal
    // timestamp, no-condition events process first, then by lowest set
    // condition index. Equal-key events are interchangeable (disjoint-
    // condition contract), so arrival order within a key never matters.
    val sorted = buf.sortBy { case (t, m) =>
      (t, if (m == 0) -1 else java.lang.Integer.numberOfTrailingZeros(m))
    }
    // pruning mode per step i = keyed on step i+1's gap (None for last)
    val prune: Array[Int] = Array.tabulate(k) { i =>
      if (i + 1 >= k) PruneMax
      else steps(i + 1)._2 match {
        case None | Some(Gap(OpLt, _)) | Some(Gap(OpLe, _)) => PruneMax
        case Some(Gap(OpGt, _)) | Some(Gap(OpGe, _)) => PruneMin
        case _ => PruneAll // OpEq (ops are a closed Int set)
      }
    }
    val cand = Array.fill(k)(mutable.ArrayBuffer.empty[Long])
    var count = 0L
    sorted.foreach { case (t, mask) =>
      var i = k - 1
      var completed = false
      while (i >= 0 && !completed) {
        // DESC: one event never serves two adjacent steps
        val (condIdx, gap) = steps(i)
        val stepMatches =
          if (condIdx == -1) true else (mask & (1 << condIdx)) != 0
        if (stepMatches &&
          (i == 0 || feasible(cand(i - 1), t, gap))) {
          if (i == k - 1) {
            count += 1L
            if (stopAtFirst) return count
            completed = true // non-overlap: restart AFTER this event
            var j = 0
            while (j < k) { cand(j).clear(); j += 1 }
          } else add(cand(i), t, prune(i))
        }
        i -= 1
      }
    }
    count
  }

  /** Some candidate in `prev` satisfies the gap to `t`. Pruned sets
    * make this O(1) except for equality gaps (bounded scan).
    */
  private def feasible(prev: mutable.ArrayBuffer[Long], t: Long,
      gap: Option[Gap]): Boolean = {
    if (prev.isEmpty) return false
    gap match {
      case None => true
      case Some(Gap(op, n)) =>
        val bound = n * unitScale
        op match {
          case OpLe => prev.exists(c => t - c <= bound)
          case OpLt => prev.exists(c => t - c < bound)
          case OpGe => prev.exists(c => t - c >= bound)
          case OpGt => prev.exists(c => t - c > bound)
          case OpEq => prev.exists(c => t - c == bound)
        }
    }
  }

  private def add(set: mutable.ArrayBuffer[Long], t: Long,
      mode: Int): Unit = mode match {
    case PruneMax =>
      // times arrive ascending — the newest IS the max
      if (set.isEmpty) set += t else set(0) = t
    case PruneMin =>
      if (set.isEmpty) set += t // the first IS the min; later ones never beat it
    case PruneAll =>
      if (set.isEmpty || set.last != t) {
        set += t
        if (set.size > CandidateCap) throw new IllegalStateException(
          s"$prettyName: an equality time constraint accumulated more " +
            s"than $CandidateCap candidate completion times in one " +
            "group — the exact DP would grow without bound on this " +
            "data; narrow the conditions or pre-filter the hot key.")
      }
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

  // gap operators (vs the PREVIOUS matched step's time)
  final val OpLe = 0; final val OpLt = 1
  final val OpGe = 2; final val OpGt = 3; final val OpEq = 4
  case class Gap(op: Int, n: Long)

  // candidate-set pruning modes (argument in the class scaladoc)
  final val PruneMax = 0; final val PruneMin = 1; final val PruneAll = 2

  /** Bound on an equality-gap candidate set (one Long each). */
  final val CandidateCap = 65536

  private val Ref = raw"^\(\?(\d+)\)".r
  private val TimeGap = raw"^\(\?t(<=|<|>=|>|==)(\d+)\)".r

  /** Parse the documented pattern grammar into (condIdx | -1 for `.`,
    * gap-vs-prev) steps; rejections are loud and name the token.
    */
  def parsePattern(pattern: String,
      nConds: Int): Seq[(Int, Option[Gap])] = {
    val out = mutable.ArrayBuffer.empty[(Int, Option[Gap])]
    var pendingGap: Option[Gap] = None
    var rest = pattern
    def push(idx: Int): Unit = {
      out += ((idx, pendingGap))
      pendingGap = None
    }
    while (rest.nonEmpty) {
      Ref.findFirstMatchIn(rest) match {
        case Some(m) =>
          val idx = m.group(1).toInt
          require(idx >= 1 && idx <= nConds,
            s"sequenceMatch: (?$idx) references condition $idx but only " +
              s"$nConds were given")
          push(idx - 1)
          rest = rest.substring(m.matched.length)
        case None =>
          TimeGap.findFirstMatchIn(rest) match {
            case Some(m) =>
              require(out.nonEmpty,
                "sequenceMatch: a time constraint must follow a (?N) reference")
              require(pendingGap.isEmpty,
                "sequenceMatch: consecutive time constraints are not supported")
              val n = m.group(2).toLong
              pendingGap = Some(m.group(1) match {
                case "<=" => Gap(OpLe, n)
                case "<" => Gap(OpLt, n)
                case ">=" => Gap(OpGe, n)
                case ">" => Gap(OpGt, n)
                case "==" => Gap(OpEq, n)
              })
              rest = rest.substring(m.matched.length)
            case None if rest.startsWith(".*") =>
              // any number of events: a no-op under subsequence semantics
              rest = rest.substring(2)
            case None if rest.startsWith(".") =>
              // exactly one arbitrary event (condition-matching or not)
              push(-1)
              rest = rest.substring(1)
            case None => throw new IllegalArgumentException(
              s"sequenceMatch: unsupported pattern token at '${rest.take(8)}'" +
                " — supported: (?N), (?t<=n), (?t<n), (?t>=n), (?t>n), " +
                "(?t==n), '.', '.*'")
          }
      }
    }
    require(pendingGap.isEmpty,
      "sequenceMatch: a trailing time constraint has no following (?N)")
    out.toSeq
  }
}
