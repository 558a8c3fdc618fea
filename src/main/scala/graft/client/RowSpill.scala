package graft.client

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.nio.file.{Files, Path}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.types.StructType

/** Streamed row spill for the embedded transport: executors write their
  * result partitions as length-prefixed UnsafeRow byte images; readers
  * pull them back one row at a time with O(1) memory. This is the
  * embedded stand-in for a wire protocol's per-stream block cursor — the
  * full result is never resident on any single node, and rows move in
  * Spark's INTERNAL format end to end (a wire client likewise decodes
  * blocks straight to InternalRow), matching the reference's incremental
  * `RecordBatchStream` emission (/root/reference/src/stream.rs:21-43).
  *
  * Format per row: 4-byte big-endian length, then the UnsafeRow bytes.
  * Length 0 never occurs (UnsafeRow has a fixed-width null bitset), so
  * EOF cleanly terminates.
  */
object RowSpill {

  /** Write all of `rows` (any InternalRow; converted to UnsafeRow if
    * needed) to `path`; returns the row count.
    */
  def write(path: Path, schema: StructType, rows: Iterator[InternalRow]): Long = {
    val out = new DataOutputStream(
      new BufferedOutputStream(Files.newOutputStream(path), 1 << 16))
    // rows from a codegen pipeline are UnsafeRow already; anything else
    // (e.g. a LocalTableScan) converts once here
    lazy val toUnsafe = UnsafeProjection.create(schema)
    var n = 0L
    try {
      rows.foreach { r =>
        val u = r match {
          case u: UnsafeRow => u
          case other => toUnsafe(other)
        }
        val bytes = u.getBytes
        out.writeInt(bytes.length)
        out.write(bytes)
        n += 1
      }
    } finally out.close()
    n
  }

  /** Lazily stream UnsafeRows back from `path` (opens on first hasNext).
    * Each returned row is freshly backed — safe to buffer downstream.
    * Closeable so abandoned reads (pushed limits, killed tasks) release
    * the file descriptor immediately instead of waiting for GC.
    */
  def read(path: Path, numFields: Int): SpillFileIterator =
    new SpillFileIterator(path, numFields)

  final class SpillFileIterator(path: Path, numFields: Int)
    extends Iterator[InternalRow] with AutoCloseable {
    private var in: DataInputStream = _
    private var nextRow: UnsafeRow = _
    private var finished = false

    private def advance(): Unit = {
      if (in == null)
        in = new DataInputStream(
          new BufferedInputStream(Files.newInputStream(path), 1 << 16))
      // EOF is clean ONLY at a record boundary (the length prefix); EOF
      // inside the payload means a truncated file — silent row loss is
      // never acceptable, so that errors loudly
      val len =
        try in.readInt()
        catch {
          case _: EOFException =>
            finished = true
            close()
            return
        }
      val bytes = new Array[Byte](len)
      try in.readFully(bytes)
      catch {
        case e: EOFException =>
          close()
          throw new java.io.IOException(
            s"truncated spill file $path: EOF inside a $len-byte record", e)
      }
      val row = new UnsafeRow(numFields)
      row.pointTo(bytes, len)
      nextRow = row
    }

    override def hasNext: Boolean = {
      if (!finished && nextRow == null) advance()
      !finished
    }

    override def next(): InternalRow = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextRow
      nextRow = null
      r
    }

    override def close(): Unit = {
      finished = true
      if (in != null) { in.close(); in = null }
    }
  }
}
