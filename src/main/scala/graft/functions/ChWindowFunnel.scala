package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** ClickHouse `windowFunnel(window[, modes])(timestamp, cond1, ...,
  * condN)` for the embedded engine: returns the maximum funnel level
  * reached, where a level-L chain is events e1 ≤ e2 ≤ ... ≤ eL in
  * timestamp order matching cond1..condL with every event inside
  * `[t(e1), t(e1) + window]`. Implemented as the server's documented
  * scan (sort by timestamp; cond1 events refresh the level-1 chain
  * start — a LATER start strictly dominates for future extension,
  * which is what makes the single-candidate scan equal to the
  * exists-a-chain law; cond_k events promote when within window of
  * the stored chain start).
  *
  * Strict modes (round 17 — each a documented server law, pinned in
  * SimpleJsonSpec with mode-discriminating event patterns and in the
  * r96 gate with independent recursive-CTE state-machine oracles):
  *
  *  - `strict_order` — "don't allow interventions of other events"
  *    (the doc's A→B→D→C example stops at D with level 2). Events
  *    matching NO condition are also recorded; once the chain has
  *    started (first cond1 seen), the scan STOPS at the first event
  *    that neither refreshes level 1 nor has its predecessor level
  *    reached, returning the prefix length reached so far. An
  *    in-order event that merely falls OUTSIDE the window does not
  *    intervene (its predecessor level is reached — it simply fails
  *    to promote), and before the chain starts nothing can intervene.
  *  - `strict_dedup` — "a repeating event for an already-reached
  *    condition interrupts further processing": the interrupt returns
  *    the REPEATED condition's 1-based level, which can be BELOW the
  *    max prefix already reached (A,B,C,B on a 4-step funnel → 2) —
  *    that anchor-at-the-repeat law is the documented interrupt, not
  *    an accident. cond1 repeats refresh the chain start (the refresh
  *    case precedes the dedup check) and never interrupt.
  *  - `strict_increase` — "apply conditions only to events with
  *    strictly increasing timestamps": promotion additionally
  *    requires t strictly greater than the LAST event timestamp of
  *    the predecessor level (tracked per level alongside the chain
  *    start); the window check still applies.
  *
  * Modes combine (comma-separated in SQL); the scan applies each
  * mode's clause independently, the server's composition.
  *
  * Other contract choices, documented not guessed:
  *  - a TimestampType child measures `window` in SECONDS (the DateTime
  *    convention; comparisons run at full micros precision, identical
  *    for whole-second DateTime data). Integral children use the
  *    column's own unit, the server law;
  *  - events where several conditions hold at the SAME timestamp
  *    process in condition order, and (strict_order only) a
  *    no-condition event at the same timestamp processes BEFORE
  *    condition entries (the stable sort choice). Gate/spec data uses
  *    disjoint conditions and tie-free timestamps, so no unpinned tie
  *    law is ever load-bearing.
  *
  * State is one (timestamp, condition-bitmask) pair per event matching
  * ANY condition (plus, under strict_order, one zero-mask entry per
  * non-matching event — intervention needs them), bounded by
  * [[ChWindowFunnel.maxEventsConf]]: a pathological hot group (bot
  * traffic concentrating millions of events in one key) rejects
  * LOUDLY at the cap instead of growing one task's buffer without
  * bound — never a silent truncation (see FunnelProbe for the
  * cap-engagement curve).
  *
  * Reference surface: any function name flows through passthrough
  * (/root/reference/src/udfs/placeholder.rs:22-74); the laws above are
  * the public server documentation's.
  */
case class ChWindowFunnel(
    window: Long,
    ts: Expression,
    conds: Seq[Expression],
    strictOrder: Boolean = false,
    strictDedup: Boolean = false,
    strictIncrease: Boolean = false,
    maxEvents: Int = ChWindowFunnel.maxEventsConf(),
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
      // strict_order needs NON-matching events too (they intervene)
      if (mask != 0 || strictOrder) {
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

  override def eval(buf: mutable.ArrayBuffer[(Long, Int)]): Any = {
    if (buf.isEmpty) return 0
    // one (ts, condIdx) entry per matched condition, timestamp order
    // with condition order breaking ties (the documented stable sort);
    // zero-mask entries (strict_order only) carry condIdx -1 and sort
    // before condition entries at an equal timestamp
    val entries = mutable.ArrayBuffer.empty[(Long, Int)]
    buf.foreach { case (t, mask) =>
      if (mask == 0) entries += ((t, -1))
      else {
        var i = 0
        while (i < conds.size) {
          if ((mask & (1 << i)) != 0) entries += ((t, i))
          i += 1
        }
      }
    }
    val sorted = entries.sortBy(e => (e._1, e._2))
    val n = conds.size
    val w = windowInternal
    val starts = Array.fill[Long](n)(Long.MinValue) // chain-start ts per level
    val lasts = Array.fill[Long](n)(Long.MinValue) // last-event ts per level
    val reached = Array.fill(n)(false)
    var started = false
    def prefix: Int = {
      var lvl = n - 1
      while (lvl >= 0 && !reached(lvl)) lvl -= 1
      lvl + 1
    }
    sorted.foreach { case (t, idx) =>
      if (idx == -1) {
        // a no-condition event: intervenes once the chain has started
        if (started) return prefix
      } else if (idx == 0) {
        starts(0) = t; lasts(0) = t; reached(0) = true; started = true
        if (n == 1) return 1
      } else if (strictDedup && reached(idx)) {
        // the documented interrupt: report the REPEATED condition's level
        return idx + 1
      } else if (strictOrder && started && !reached(idx - 1)) {
        // an out-of-order funnel event intervenes like any other
        return prefix
      } else if (reached(idx - 1)) {
        var ok = t - starts(idx - 1) <= w
        if (strictIncrease) ok = ok && lasts(idx - 1) < t
        if (ok) {
          starts(idx) = starts(idx - 1)
          lasts(idx) = t
          reached(idx) = true
          if (idx == n - 1) return n
        }
      }
    }
    prefix
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

object ChWindowFunnel {

  /** Per-group event-buffer cap config (shared by the whole r93
    * behavioral family). Read ONCE at expression construction — a
    * constructor field, so it survives reference binding (the
    * declaredW rule).
    */
  val MaxEventsKey = "spark.sql.graft.funnel.maxEventsPerGroup"
  val MaxEventsDefault = 1000000

  def maxEventsConf(): Int =
    try org.apache.spark.sql.internal.SQLConf.get
      .getConfString(MaxEventsKey, MaxEventsDefault.toString).toInt
    catch { case _: Exception => MaxEventsDefault }

  /** LOUD overflow at the cap — never a silent truncation. */
  def checkCap(size: Int, cap: Int, fn: String): Unit =
    if (size > cap) throw new IllegalStateException(
      s"$fn: a single group accumulated more than $cap condition-" +
        s"matching events — a pathological hot key would grow one " +
        s"task's state without bound. Raise $MaxEventsKey if the " +
        "group is genuinely this large, or pre-filter the hot key.")

  /** Parse the SQL mode-string list into the three flags; unknown
    * modes (including the deprecated bare 'strict') reject loudly.
    */
  def parseModes(modes: Seq[String]): (Boolean, Boolean, Boolean) = {
    var (so, sd, si) = (false, false, false)
    modes.foreach {
      case "strict_order" => so = true
      case "strict_dedup" | "strict_deduplication" => sd = true
      case "strict_increase" => si = true
      case other => throw new IllegalArgumentException(
        s"windowFunnel: unknown mode '$other' — supported: " +
          "'strict_order', 'strict_dedup', 'strict_increase'")
    }
    (so, sd, si)
  }
}
