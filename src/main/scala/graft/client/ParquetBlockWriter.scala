package graft.client

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types.StructType

/** Writes one batch of rows as a single parquet part file — the embedded
  * transport's stand-in for a ClickHouse Native-protocol block
  * (/root/reference/src/sink.rs:129-208 streams one Arrow batch per
  * in-flight insert).
  *
  * Uses Spark's own `ParquetWriteSupport` (public) directly over
  * parquet-mr, so a block can be written from ANY thread — including a
  * DSv2 write task on an executor — without a SparkSession or a Spark
  * job. The file is written in a temp directory and moved atomically
  * into the table directory, so concurrent inserts never observe a
  * partial part.
  */
object ParquetBlockWriter {

  // Monotonic per-part insert sequence, embedded in the part FILE NAME
  // (`part-<%016x seq>-<uuid>.parquet`, hex fixed-width so lexicographic
  // file order IS insertion order): the embedded analog of the server's
  // monotonically-assigned block numbers. Seeded from wall-clock
  // microseconds so sequences stay monotonic across process restarts;
  // the max() guard keeps same-millisecond bursts strictly increasing.
  // CollapsingMergeTree's order-dependent collapse reads this back
  // (EmbeddedClickHouse.partSeqOf).
  private val seqCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  def nextPartSeq(): Long = seqCounter.updateAndGet(prev =>
    math.max(prev + 1, System.currentTimeMillis() * 1000L))

  private final class Builder(path: org.apache.hadoop.fs.Path)
    extends ParquetWriter.Builder[org.apache.spark.sql.catalyst.InternalRow, Builder](path) {
    override def self(): Builder = this
    override def getWriteSupport(conf: Configuration)
      : WriteSupport[org.apache.spark.sql.catalyst.InternalRow] =
      new ParquetWriteSupport
  }

  /** Spark-equivalent writer config (what ParquetUtils.prepareWrite sets),
    * keyed through SQLConf entries so names track the Spark version.
    */
  private def conf(schema: StructType): Configuration = {
    import org.apache.spark.sql.internal.SQLConf
    val c = new Configuration(false)
    c.set("fs.file.impl", classOf[org.apache.hadoop.fs.RawLocalFileSystem].getName)
    ParquetWriteSupport.setSchema(schema, c)
    c.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key, "false")
    c.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key, "TIMESTAMP_MICROS")
    c.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key, "false")
    c.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key, "false")
    c.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    c.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    c.set(SQLConf.SESSION_LOCAL_TIMEZONE.key, "UTC")
    c
  }

  /** Write `rows` (already in `schema` field order) to
    * `targetDir/part-<uuid>.parquet`; returns the row count.
    *
    * Staged NEXT TO the table directory, not in java.io.tmpdir: /tmp is
    * tmpfs on many distros and ATOMIC_MOVE across filesystems throws
    * AtomicMoveNotSupportedException — same-directory staging guarantees
    * a same-fs atomic rename.
    */
  def writeBlock(targetDir: Path, schema: StructType, rows: Seq[Row]): Long =
    writeBlockAt(targetDir, schema, rows)._1

  /** Like [[writeBlock]] but also returns the published part path (for
    * callers that post-process the landed block, e.g. MV triggers).
    */
  def writeBlockAt(targetDir: Path, schema: StructType, rows: Seq[Row]): (Long, Path) = {
    val ser = ExpressionEncoder(schema).resolveAndBind().createSerializer()
    val tmpDir = Files.createDirectories(
      targetDir.resolve(s".staging-${java.util.UUID.randomUUID}"))
    val tmp = tmpDir.resolve("block.parquet")
    try {
      val w = new Builder(new org.apache.hadoop.fs.Path(tmp.toUri))
        .withConf(conf(schema))
        .withCompressionCodec(CompressionCodecName.SNAPPY)
        .build()
      try rows.foreach(r => w.write(ser(r)))
      finally w.close()
      val target = targetDir.resolve(
        f"part-${nextPartSeq()}%016x-${java.util.UUID.randomUUID}.parquet")
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      (rows.length.toLong, target)
    } finally {
      if (Files.exists(tmp)) Files.delete(tmp)
      NioFiles.list(tmpDir).foreach(Files.delete(_))
      Files.delete(tmpDir)
    }
  }
}
