package graft.connector

import java.util.concurrent.atomic.AtomicLong

/** SQL-visible insert row counts (reference parity: its INSERT returns a
  * one-row count batch, tests/common/helpers.rs:157-170; Spark's
  * AppendData returns no rows and surfaces `chRowsInserted` only as a UI
  * metric). Every batch-insert commit path — the DSv2 staged write AND
  * the collapsed server-side INSERT SELECT — records its final row count
  * here, keyed by (connection, table), and additionally into a capture
  * slot when a [[captured]] block is active on the calling thread (DSv2
  * commits run driver-side on the statement's own thread, so the
  * correlation is exact). Streaming epochs intentionally do not record:
  * their counts are per-epoch progress, not a statement result.
  */
object ChInsertCount {

  private val captureSlot = new ThreadLocal[AtomicLong]
  private val lastByTable =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]

  private def key(connectionKey: String, db: String, table: String): String =
    s"$connectionKey/$db/$table"

  private[graft] def record(
      connectionKey: String, db: String, table: String, rows: Long): Unit = {
    lastByTable.put(key(connectionKey, db, table), rows)
    val c = captureSlot.get()
    if (c != null) c.addAndGet(rows)
    ()
  }

  /** Rows committed by the most recent batch insert into the table over
    * this connection (this JVM); None before any insert.
    */
  def lastFor(connectionKey: String, db: String, table: String): Option[Long] =
    Option(lastByTable.get(key(connectionKey, db, table))).map(_.longValue())

  /** Run `body` (typically one INSERT statement) and return the total
    * rows its insert commits recorded on this thread.
    */
  def captured(body: => Unit): Long = {
    val prev = captureSlot.get() // nested captures restore the outer slot
    val c = new AtomicLong
    captureSlot.set(c)
    try { body; c.get() } finally {
      if (prev == null) captureSlot.remove() else captureSlot.set(prev)
    }
  }
}
