package graft.client

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, ObjectInputStream, ObjectOutputStream}
import java.nio.file.{Files, Path}

import org.apache.spark.sql.Row

/** Streamed row spill for the embedded transport: executors write their
  * result partitions as length-unknown sequences of value arrays; readers
  * pull them back one row at a time with O(1) memory. This is the
  * embedded stand-in for a wire protocol's per-stream block cursor — the
  * full result is never resident on any single node, matching the
  * reference's incremental `RecordBatchStream` emission
  * (/root/reference/src/stream.rs:21-43).
  *
  * Format: Java-serialized `Array[Any]` per row (external Spark types:
  * String/Timestamp/BigDecimal/Seq/...), stream reset every [[ResetEvery]]
  * rows so the back-reference table stays bounded; EOF terminates.
  */
object RowSpill {

  private val ResetEvery = 512

  /** Write all of `rows` to `path`; returns the row count. */
  def write(path: Path, rows: Iterator[Row]): Long = {
    val oos = new ObjectOutputStream(
      new BufferedOutputStream(Files.newOutputStream(path), 1 << 16))
    var n = 0L
    try {
      rows.foreach { r =>
        oos.writeObject(r.toSeq.toArray)
        n += 1
        if (n % ResetEvery == 0) oos.reset()
      }
    } finally oos.close()
    n
  }

  /** Lazily stream rows back from `path` (opens on first `hasNext`). */
  def read(path: Path): Iterator[Row] = new Iterator[Row] {
    private var ois: ObjectInputStream = _
    private var nextRow: Row = _
    private var finished = false

    private def advance(): Unit = {
      if (ois == null)
        ois = new ObjectInputStream(
          new BufferedInputStream(Files.newInputStream(path), 1 << 16))
      try nextRow = Row.fromSeq(
        ois.readObject().asInstanceOf[Array[Any]].toSeq)
      catch {
        case _: EOFException =>
          finished = true
          ois.close()
      }
    }

    override def hasNext: Boolean = {
      if (!finished && nextRow == null) advance()
      !finished
    }

    override def next(): Row = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextRow
      nextRow = null
      r
    }
  }
}
