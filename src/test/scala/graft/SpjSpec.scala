package graft

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.client.EmbeddedClickHouse

/** Storage-partitioned joins over bucket-keyed connector reads: two scans
  * reading with the same `bucket_by`/`buckets` options report
  * KeyGroupedPartitioning(bucket(n, key)), and Spark plans their join
  * with ZERO shuffle — the federated co-located join path (cross-store
  * joins never collapse into one remote SQL, r28, so at 100 TB this is
  * what keeps them off the wire-shuffle).
  */
class SpjSpec extends AnyFunSuite {

  private lazy val rootA = Files.createTempDirectory("graft_spj_a_").toString
  private lazy val rootB = Files.createTempDirectory("graft_spj_b_").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .appName("spj-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // unique catalog names per suite: suites share one JVM-wide session
    s.conf.set("spark.sql.catalog.chspja", classOf[graft.catalog.ClickHouseCatalog].getName)
    s.conf.set("spark.sql.catalog.chspja.path", rootA)
    s.conf.set("spark.sql.catalog.chspjb", classOf[graft.catalog.ClickHouseCatalog].getName)
    s.conf.set("spark.sql.catalog.chspjb.path", rootB)
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s
  }

  private def seed(): Unit = {
    Tables.register(spark, "/root/testdata/sf0.001")
    if (!new EmbeddedClickHouse(rootA).tableExists("main", "orders_b")) {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS chspja.main")
      spark.sql(
        """CREATE TABLE chspja.main.orders_b
          |(o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
          |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'o_orderkey')""".stripMargin)
      spark.sql(
        """INSERT INTO chspja.main.orders_b
          |SELECT o_orderkey, o_custkey, o_totalprice FROM orders""".stripMargin)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS chspjb.main")
      spark.sql(
        """CREATE TABLE chspjb.main.customer_b
          |(c_custkey BIGINT, c_mktsegment STRING)
          |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'c_custkey')""".stripMargin)
      spark.sql(
        """INSERT INTO chspjb.main.customer_b
          |SELECT c_custkey, c_mktsegment FROM customer""".stripMargin)
    }
  }

  private def executed(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect() // force execution so AQE finalizes
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** Every node of the finalized physical plan, traversing INTO AQE query
    * stages (collect() alone stops at stage boundaries).
    */

  private def shuffles(plan: SparkPlan): Seq[SparkPlan] =
    PlanAsserts.flatten(plan).collect { case s: ShuffleExchangeLike => s }

  private def bucketed(cat: String, tbl: String, col: String, n: Int) =
    spark.read.option("bucket_by", col).option("buckets", n.toString)
      .table(s"$cat.main.$tbl")

  test("cross-store co-partitioned join runs with zero shuffle") {
    seed()
    // forbid broadcast: at real scale neither store side broadcasts, and
    // the point here is the co-partitioned (storage-partitioned) join
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val o = bucketed("chspja", "orders_b", "o_custkey", 8)
      val c = bucketed("chspjb", "customer_b", "c_custkey", 8)
      val joined = o.join(c, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment"), col("o_totalprice"))

      val expected = spark.table("orders")
        .join(spark.table("customer"), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment"), col("o_totalprice"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

      val got = joined.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(got == expected)

      val plan = executed(joined)
      val joinNode = PlanAsserts.flatten(plan).collectFirst {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }.getOrElse(fail(s"no join node in:\n$plan"))
      assert(shuffles(plan).isEmpty,
        s"co-partitioned join must plan ZERO exchanges, got:\n$plan")
      val _ = joinNode
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("bucketed scan alone: n partitions keyed 0..n-1, rows routed by murmur3") {
    seed()
    val df = bucketed("chspja", "orders_b", "o_custkey", 8)
    assert(df.count() == spark.table("orders").count())
    // per-partition routing: every row's key must murmur3-bucket to its
    // partition id — the exact contract ChBoundBucket reports
    val misrouted = df.select(col("o_custkey")).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val bucket = graft.catalog.ChBoundBucket("murmur3",
          org.apache.spark.sql.types.LongType)
        it.filter { r =>
          val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](8, if (r.isNullAt(0)) null else r.getLong(0)))
          bucket.produceResult(row) != pid
        }.map(_ => pid)
      }.collect()
    assert(misrouted.isEmpty, s"rows landed off-bucket in partitions ${misrouted.toSet}")
  }

  test("same-store co-partitioned join on a plain session is also shuffle-free") {
    seed()
    // both sides from store A, bucketed on the SAME key type and count
    val o = bucketed("chspja", "orders_b", "o_custkey", 4)
      .groupBy("o_custkey").agg(sum("o_totalprice").as("spend"))
    // grouping on the bucket column: even the aggregation needs no
    // shuffle — KeyGroupedPartitioning satisfies the clustering
    val plan = executed(o)
    assert(shuffles(plan).isEmpty,
      s"bucket-keyed groupBy must be shuffle-free:\n$plan")
  }

  test("half-set or conflicting bucket options fail loudly") {
    seed()
    val e1 = intercept[Exception] {
      spark.read.option("bucket_by", "o_custkey")
        .table("chspja.main.orders_b").collect()
    }
    assert(e1.getMessage.contains("buckets"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.read.option("bucket_by", "nope").option("buckets", "4")
        .table("chspja.main.orders_b").collect()
    }
    assert(e2.getMessage.contains("nope"), e2.getMessage)
    // bucket_by outranks split_by (a catalog-level read.split_by default
    // must not veto an explicit bucketed read): the read proceeds bucketed
    val both = spark.read.option("bucket_by", "o_custkey").option("buckets", "4")
      .option("split_by", "o_orderkey")
      .table("chspja.main.orders_b")
    assert(both.rdd.getNumPartitions == 4)
    assert(both.count() == spark.table("orders").count())
  }

  test("ineligible shapes fall back silently (pushed agg keeps its pushdown)") {
    seed()
    // aggregate pushdown wins over bucketing: the scan aggregates
    // remotely and reports UnknownPartitioning
    val df = bucketed("chspja", "orders_b", "o_custkey", 8)
      .agg(count(lit(1)).as("n"))
    assert(df.collect().head.getLong(0) == spark.table("orders").count())
  }

  test("cityhash64 bucket family evaluates locally, bit-exact (round 15)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType, TimestampType}
    import org.apache.spark.unsafe.types.UTF8String
    // Long keys: pinned against the cross-implementation vector set
    // (city64(LE8(k)) % 4 for k = 1..10 — HashKernelSpec provenance)
    val longB = graft.catalog.ChBoundBucket("cityhash64", LongType)
    val expect = Seq(2, 1, 1, 0, 3, 2, 2, 2, 3, 2)
    for ((e, i) <- expect.zipWithIndex)
      assert(longB.produceResult(InternalRow(4, (i + 1).toLong)) == e, s"k=${i + 1}")
    // NULL keys ride bucket 0 — the HTTP slice predicates' law
    assert(longB.produceResult(InternalRow(4, null)) == 0)
    // String keys hash their raw bytes; agrees with the kernel directly
    val strB = graft.catalog.ChBoundBucket("cityhash64", StringType)
    val gb = "graft".getBytes("UTF-8")
    assert(strB.produceResult(InternalRow(7, UTF8String.fromString("graft"))) ==
      java.lang.Long.remainderUnsigned(
        graft.functions.GraftHashes.cityHash64(gb, 0, gb.length), 7L).toInt)
    // a key type whose server width the Spark type cannot reproduce
    // still refuses loudly (never a silently divergent route)
    val tsB = graft.catalog.ChBoundBucket("cityhash64", TimestampType)
    intercept[UnsupportedOperationException](
      tsB.produceResult(InternalRow(4, 1000000L)))
    // canonical names stay family- and type-scoped: murmur3 never
    // matches cityhash64, Long never matches Int
    assert(graft.catalog.ChBoundBucket("cityhash64", LongType).canonicalName !=
      graft.catalog.ChBoundBucket("murmur3", LongType).canonicalName)
    assert(graft.catalog.ChBoundBucket("cityhash64", LongType).canonicalName !=
      graft.catalog.ChBoundBucket("cityhash64", IntegerType).canonicalName)
  }
}
