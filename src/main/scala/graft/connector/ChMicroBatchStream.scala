package graft.connector

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType

import graft.client.ClickHouseClient
import graft.sql.ChSql

/** Streaming offset: the highest cursor value already processed
  * (inclusive). Serialized into the checkpoint, so restarts resume from
  * exactly the committed high-water mark.
  */
final case class ChStreamOffset(maxInclusive: Long) extends Offset {
  override def json(): String = s"""{"max":$maxInclusive}"""
}

object ChStreamOffset {
  private val P = """\{\s*"max"\s*:\s*(-?\d+)\s*\}""".r
  def fromJson(s: String): ChStreamOffset = s match {
    case P(v) => ChStreamOffset(v.toLong)
    case _ => throw new IllegalArgumentException(s"bad ClickHouse stream offset: $s")
  }
}

/** Incremental (micro-batch) READ from a remote ClickHouse table — the
  * source-side complement of the connector's StreamingWrite sink: a
  * `readStream.table("clickhouse.db.t")` tails an append-only table by a
  * monotonically increasing integral cursor column.
  *
  * Contract (the same one any log-backed source imposes): rows are
  * append-only and a row's cursor value never changes; once a batch
  * `(start, end]` is planned, the store's contents in that range are
  * immutable. Under that contract offsets are deterministic key ranges,
  * so Spark's checkpoint replay re-reads EXACTLY the same rows —
  * end-to-end exactly-once with the checkpointed offset log.
  *
  * Scale shape: each micro-batch plans one remote range query
  * (`WHERE cursor > start AND cursor <= end` appended to the scan's
  * pushed WHERE) through the same handle-based path as batch scans —
  * rows stream executor-side; the driver only moves the two cursor
  * bounds plus one tiny `min/max(cursor)` probe per batch.
  * `stream_max_per_batch` bounds how far the cursor advances per batch,
  * so a backlogged table drains in bounded steps instead of one giant
  * batch.
  */
class ChMicroBatchStream(
    client: ClickHouseClient,
    db: String,
    table: String,
    select: Seq[(String, String)],
    where: Seq[String],
    out: StructType,
    readStreams: Int,
    cursorCol: String,
    maxPerBatch: Option[Long],
    startExclusive: Long)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val cursorSql = ChSql.quoteIdent(cursorCol)

  /** Trigger.AvailableNow endpoint, snapshotted once at stream start so
    * the drain has a fixed target even while writers keep appending.
    */
  @volatile private var availableNowRange: Option[(Long, Long)] = None

  /** One tiny remote aggregate — the per-batch planning probe. None for
    * an empty table.
    */
  private def remoteRange(): Option[(Long, Long)] = {
    val (_, rows) = client.query(
      s"SELECT min($cursorSql), max($cursorSql) FROM ${ChSql.quoteTable(db, table)}", 1)
    def asLong(v: Any): Long = v match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
      case s: java.lang.Short => s.longValue()
      case b: java.lang.Byte => b.longValue()
      case other =>
        throw new IllegalStateException(
          s"stream_cursor $cursorCol must be integral, got ${other.getClass}")
    }
    // FOLD over every returned row, not head: a sharded client returns
    // one (min, max) row PER SHARD — the global range is min-of-mins /
    // max-of-maxes (a single store returns exactly one row, same fold)
    val ranges = rows.flatten.collect {
      case r if !r.isNullAt(0) && !r.isNullAt(1) => (asLong(r.get(0)), asLong(r.get(1)))
    }
    if (ranges.isEmpty) None
    else Some((ranges.map(_._1).min, ranges.map(_._2).max))
  }

  override def initialOffset(): Offset = ChStreamOffset(startExclusive)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowRange = Some(
      remoteRange().getOrElse((startExclusive, startExclusive)))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  // SupportsAdmissionControl routes planning through the 2-arg variant
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called (SupportsAdmissionControl)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ChStreamOffset].maxInclusive
    availableNowRange.orElse(remoteRange()) match {
      case None => ChStreamOffset(s) // empty table: no progress
      case Some((mn, mx)) =>
        val target = math.max(s, mx)
        // Advance in bounded steps measured from where data actually
        // starts: rows below min(cursor) don't exist, so jumping the
        // processed mark to min-1 skips nothing (without this, a
        // stream_start of Long.MinValue would crawl up in cap-sized
        // steps through empty key space).
        val base = if (mn == Long.MinValue) s else math.max(s, mn - 1)
        val capped = maxPerBatch match {
          case Some(m) if m > 0 && base < target =>
            if (base > target - m) target else base + m // overflow-safe
          case _ => target
        }
        ChStreamOffset(math.max(s, capped))
    }
  }

  override def reportLatestOffset(): Offset =
    ChStreamOffset(
      availableNowRange.orElse(remoteRange()).map(_._2).getOrElse(startExclusive))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[ChStreamOffset].maxInclusive
    val hi = end.asInstanceOf[ChStreamOffset].maxInclusive
    if (hi <= lo) return Array.empty
    val sel =
      if (select.isEmpty) "1"
      else select.map { case (e, a) =>
        if (e == ChSql.quoteIdent(a)) e else s"$e AS ${ChSql.quoteIdent(a)}"
      }.mkString(", ")
    val allWhere = where ++ Seq(s"$cursorSql > $lo", s"$cursorSql <= $hi")
    val sql = s"SELECT $sel FROM ${ChSql.quoteTable(db, table)}" +
      s" WHERE ${allWhere.mkString(" AND ")}"
    val (resultSchema, handles) = client.planQuery(sql, readStreams)
    if (out.nonEmpty) {
      require(resultSchema.length == out.length,
        s"remote result arity ${resultSchema.length} != expected ${out.length} for $sql")
    }
    handles.map(h => ChInputPartition(h): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChReaderFactory(client, out)

  override def deserializeOffset(json: String): Offset = ChStreamOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
