package graft.connector

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.client.ClickHouseClient
import graft.sql.ChSql

/** DSv2 table over a remote ClickHouse table (the Spark analog of the
  * reference's `SqlTable` provider + `ClickHouseDataSink`,
  * /root/reference/src/sql.rs:62-100 and src/sink.rs).
  *
  * Read path: Catalyst drives column pruning / filter pushdown / limit
  * pushdown into [[ChScanBuilder]]; the scan unparses to ClickHouse SQL
  * (`SELECT cols FROM db.t WHERE ... LIMIT n`) and executes remotely,
  * result streams becoming input partitions.
  *
  * Write path: append-only ([[ChWriteBuilder]]); overwrite is rejected
  * exactly like the reference (table.rs:144-152). Each write task streams
  * bounded batches to the store as it consumes its partition (the
  * reference's buffer_unordered(write_concurrency) pattern, sink.rs:
  * 129-208); commit() only aggregates counts, so no row ever crosses the
  * driver.
  */
class ClickHouseTable(
    client: ClickHouseClient,
    db: String,
    table: String,
    tableSchema: StructType,
    readStreams: Int,
    writeConcurrency: Int = 4,
    writeBatchSize: Int = 10000)
  extends Table with SupportsRead with SupportsWrite {

  override def name(): String = s"$db.$table"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ChScanBuilder(client, db, table, tableSchema, readStreams)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ChWriteBuilder(client, db, table, info.schema(), writeConcurrency, writeBatchSize)
}

/** Pushdown-capable scan builder (mirrors sql.rs:215-239): filters are
  * pushed iff they compile to ClickHouse SQL ("exactness probe");
  * projection prunes the remote select list; limit lands in the SQL.
  */
class ChScanBuilder(
    client: ClickHouseClient,
    db: String,
    table: String,
    fullSchema: StructType,
    readStreams: Int)
  extends ScanBuilder
  with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns
  with SupportsPushDownLimit {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var compiled: Seq[String] = Seq.empty
  private var limit: Option[Int] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition(f => ChSql.compileFilter(f).isDefined)
    pushed = ok
    compiled = ok.toSeq.flatMap(ChSql.compileFilter)
    residual // Spark re-applies only these locally; pushed ones are Exact
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(l: Int): Boolean = {
    // only safe to push when all filters were pushed too (otherwise the
    // remote LIMIT truncates before the residual local filter runs)
    if (compiled.length == pushed.length && limit.isEmpty) { limit = Some(l); true }
    else false
  }

  override def build(): Scan = {
    val sql = ChSql.buildScanSql(db, table, required.fieldNames.toSeq, compiled, limit)
    new ChScan(client, sql, required, readStreams)
  }
}

class ChScan(client: ClickHouseClient, sql: String, out: StructType, readStreams: Int)
  extends Scan with Batch {

  /** Exposed for subtree collapse (graft.pushdown): the scan's generated
    * remote SQL becomes the leaf FROM clause of a collapsed query.
    */
  def generatedSql: String = sql
  def chClient: ClickHouseClient = client
  def chStreams: Int = readStreams

  override def readSchema(): StructType = out
  override def description(): String = s"ClickHouseScan[$sql]"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // Embedded transport: the "remote" query runs here (driver) and its
    // result streams become partitions. A wire client returns one
    // partition per shard/stream cursor instead, each reader pulling its
    // own stream on the executor.
    val (resultSchema, groups) = client.query(sql, readStreams)
    if (out.isEmpty) {
      // empty projection (COUNT(*)): the remote SQL is `SELECT 1 FROM t`
      // (sql.rs:259-276) — only the row COUNT matters, emit empty rows
      groups.map(g => ChInputPartition(g.map(_ => Row.empty)): InputPartition).toArray
    } else {
      require(resultSchema.length == out.length,
        s"remote result arity ${resultSchema.length} != expected ${out.length} for $sql")
      groups.map(g => ChInputPartition(g): InputPartition).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChReaderFactory(out)
}

final case class ChInputPartition(rows: Seq[Row]) extends InputPartition

class ChReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[ChInputPartition].rows
    new PartitionReader[InternalRow] {
      private val toInternal = ExpressionEncoder(schema).createSerializer()
      private val it = rows.iterator
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) false
        else { current = toInternal(it.next()); true }
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

/** Append-only write path. No SupportsTruncate/SupportsOverwrite →
  * Spark rejects overwrite at analysis, matching the reference's
  * NotImplemented for InsertOp::Overwrite.
  */
class ChWriteBuilder(
    client: ClickHouseClient,
    db: String,
    table: String,
    inputSchema: StructType,
    writeConcurrency: Int,
    batchSize: Int)
  extends WriteBuilder {

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new ChBatchWrite(client, db, table, inputSchema, writeConcurrency, batchSize)
  }
}

class ChBatchWrite(
    client: ClickHouseClient,
    db: String,
    table: String,
    inputSchema: StructType,
    writeConcurrency: Int,
    batchSize: Int)
  extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ChDataWriterFactory(client, db, table, inputSchema, writeConcurrency, batchSize)

  // The reference returns the inserted count as a one-row result batch
  // (examples/99:295-304); Spark DML returns no rows — a semantic
  // difference documented in SURVEY §2.1. Count is observable via readback.
  // All data has already streamed from the write tasks; commit only sees
  // counts, so the driver never holds rows regardless of insert size.
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final case class ChCountMessage(rows: Long) extends WriterCommitMessage

/** Streams bounded batches to the store from INSIDE each write task —
  * the reference's `buffer_unordered(write_concurrency)` pattern
  * (sink.rs:129-208, default 4, connection.rs:47) at per-partition
  * granularity: up to `writeConcurrency` inserts in flight per task,
  * `batchSize` rows each (the reference's insert-bench default batch,
  * examples/10_large_scale.rs:28). Memory per task is O(batchSize ×
  * concurrency), independent of partition size — at 100 TB the previous
  * collect-to-driver-commit shape is a guaranteed OOM.
  */
class ChDataWriterFactory(
    client: ClickHouseClient,
    db: String,
    table: String,
    schema: StructType,
    writeConcurrency: Int,
    batchSize: Int) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val toRow =
        ExpressionEncoder(schema).resolveAndBind().createDeserializer()
      private val buf = new scala.collection.mutable.ArrayBuffer[Row](batchSize)
      private val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, writeConcurrency))
      private val inFlight =
        new scala.collection.mutable.Queue[java.util.concurrent.Future[Long]]
      private var written = 0L

      override def write(record: InternalRow): Unit = {
        buf += toRow(record.copy())
        if (buf.length >= batchSize) flush()
      }

      private def flush(): Unit = if (buf.nonEmpty) {
        val rows = buf.toVector
        buf.clear()
        // bound the in-flight window: block on the oldest insert before
        // admitting a new one (buffer_unordered semantics)
        while (inFlight.length >= math.max(1, writeConcurrency))
          written += inFlight.dequeue().get()
        inFlight.enqueue(pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long = client.insert(db, table, schema, rows)
        }))
      }

      override def commit(): WriterCommitMessage = {
        flush()
        while (inFlight.nonEmpty) written += inFlight.dequeue().get()
        ChCountMessage(written)
      }

      override def abort(): Unit = pool.shutdownNow()
      override def close(): Unit = pool.shutdown()
    }
}
