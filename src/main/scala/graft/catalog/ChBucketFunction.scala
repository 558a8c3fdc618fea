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
  * The identity is parameterized by the transport's hash FAMILY
  * ([[graft.client.ClickHouseClient.bucketFamily]]):
  *
  *  - `murmur3` (embedded store): partition i holds exactly the rows
  *    with `pmod(murmur3(key, seed=42), n) = i`, because the store
  *    routes with Spark's own HashPartitioning
  *    (EmbeddedClickHouse.planQueryBuckets). `produceResult` reproduces
  *    that bit-for-bit, so one-side-shuffle SPJ
  *    (spark.sql.sources.v2.bucketing.shuffle.enabled) stays correct.
  *  - `cityhash64` (HTTP transport): the SERVER routes rows via
  *    `cityHash64(key) % n = i` slice predicates — both sides of a join
  *    are routed by the same server-side function, so co-partitioning
  *    holds with no local evaluation. Since round 15 `produceResult`
  *    ALSO evaluates (bit-exact CityHash v1.0.2 from
  *    graft.functions.GraftHashes over Long/Int/String storage bytes),
  *    so shuffle-side SPJ composes with server-routed scans; key types
  *    whose server hash width the Spark type cannot reproduce still
  *    refuse loudly.
  *
  * The canonical name embeds family AND key type: murmur3 of Int 5 and
  * Long 5 differ, and murmur3 never matches cityHash64 — scans that
  * would route the same key to different buckets are never treated as
  * co-partitioned.
  *
  * Reference analog: the provider's partition-aware scan surface
  * (/root/reference/src/providers/table.rs partition_by/order_by params);
  * the reference delegates co-location to the server's sharding — Spark
  * expresses it as a catalog function + reported partitioning instead.
  */
final case class ChBucketFunction(family: String) extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    s"bucket(n, col): $family-routed bucket id of a bucketed connector read"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, column), got ${inputType.catalogString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket numBuckets must be INT, got ${inputType.fields(0).dataType.catalogString}")
    ChBoundBucket(family, inputType.fields(1).dataType)
  }
}

final case class ChBoundBucket(family: String, keyType: DataType)
  extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String =
    s"graft.bucket.$family(${keyType.catalogString})"
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = family match {
    case "murmur3" =>
      val n = input.getInt(0)
      val v = input.get(1, keyType)
      // a NULL key hashes to the seed itself — Murmur3Hash's fold skips
      // null children, matching HashPartitioning's routing of null keys
      val h = if (v == null) 42 else Murmur3HashFunction.hash(v, keyType, 42L).toInt
      val r = h % n
      if (r < 0) r + n else r
    case "cityhash64" =>
      // round 15: bit-exact local CityHash v1.0.2 (graft.functions
      // .GraftHashes, vector-pinned in HashKernelSpec) over the value's
      // storage bytes — the SAME law the server's `cityHash64(key) % n`
      // slice predicates apply, so shuffle-side SPJ
      // (v2.bucketing.shuffle.enabled) now composes with server-routed
      // scans. NULLs ride bucket 0, matching the HTTP slice predicates
      // (`key IS NULL OR cityHash64(key) % n = 0`).
      val n = input.getInt(0)
      if (input.isNullAt(1)) return 0
      val b: Array[Byte] = keyType match {
        case org.apache.spark.sql.types.LongType =>
          graft.functions.GraftHashes.bytesLE(input.getLong(1))
        case org.apache.spark.sql.types.IntegerType =>
          graft.functions.GraftHashes.bytesLE(input.getInt(1))
        case org.apache.spark.sql.types.StringType =>
          input.getUTF8String(1).getBytes
        case other => throw new UnsupportedOperationException(
          s"bucket(cityhash64) over ${other.catalogString} keys is not " +
            "evaluable locally (the server hash width for this type is " +
            "not reproducible from the Spark type) — keep " +
            "spark.sql.sources.v2.bucketing.shuffle.enabled off")
      }
      java.lang.Long.remainderUnsigned(
        graft.functions.GraftHashes.cityHash64(b, 0, b.length), n.toLong).toInt
    case other => throw new UnsupportedOperationException(
      s"bucket($other) is routed by the server, not evaluable in Spark — " +
        "keep spark.sql.sources.v2.bucketing.shuffle.enabled off for " +
        "this transport (both-sides-bucketed joins never evaluate it)")
  }
}
