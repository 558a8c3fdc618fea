package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The co-partitioning transform behind bucketed connector reads
  * (`bucket_by` / `buckets` read options): Spark's storage-partitioned
  * join recognizes two scans as co-partitioned when both report
  * `KeyGroupedPartitioning(bucket(n, key))` AND the bucket functions'
  * canonical names agree — this function IS that identity.
  *
  * Semantics are pinned to what the embedded store's bucketed read
  * actually does with rows: partition i holds exactly the rows with
  * `pmod(murmur3(key, seed=42), n) = i`, because the store routes with
  * Spark's own HashPartitioning (EmbeddedClickHouse.planQueryBuckets).
  * `produceResult` reproduces that bit-for-bit, so one-side-shuffle SPJ
  * (spark.sql.sources.v2.bucketing.shuffle.enabled) stays correct too.
  *
  * The canonical name embeds the key's type: murmur3 of Int 5 and Long 5
  * differ, so equal-looking buckets over differently-typed keys must
  * never be treated as co-partitioned.
  *
  * Reference analog: the provider's partition-aware scan surface
  * (/root/reference/src/providers/table.rs partition_by/order_by params);
  * the reference delegates co-location to the server's sharding — Spark
  * expresses it as a catalog function + reported partitioning instead.
  */
object ChBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): pmod(murmur3(col, seed=42), n) — bucket id of a bucketed connector read"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, column), got ${inputType.catalogString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket numBuckets must be INT, got ${inputType.fields(0).dataType.catalogString}")
    ChBoundBucket(inputType.fields(1).dataType)
  }
}

final case class ChBoundBucket(keyType: DataType) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String =
    s"graft.bucket.murmur3(${keyType.catalogString})"
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val v = input.get(1, keyType)
    // a NULL key hashes to the seed itself — Murmur3Hash's fold skips
    // null children, matching HashPartitioning's routing of null keys
    val h = if (v == null) 42 else Murmur3HashFunction.hash(v, keyType, 42L).toInt
    val r = h % n
    if (r < 0) r + n else r
  }
}
