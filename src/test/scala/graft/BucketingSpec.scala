package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing — the 100 TB shuffle-elimination story
  * (SURVEY §2.3 scale notes): writing both fact tables bucketed on the
  * join key lets SortMergeJoin read matching buckets directly, with NO
  * Exchange on either side. At cluster scale this converts the
  * fact-to-fact join from a full network shuffle of both tables into a
  * local merge per bucket.
  */
class BucketingSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft_bucket_wh_").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .appName("bucketing-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    val top = df.queryExecution.executedPlan
    val plans = top +: top.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
    plans.flatMap(_.collect { case e: ShuffleExchangeExec => e }).size
  }

  test("bucketed fact-to-fact join runs with zero shuffles") {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.load(spark, dir, "lineitem")
    val ord = Tables.load(spark, dir, "orders")
    // suites share one JVM session, so the builder's warehouse.dir may be
    // ignored — drop tables AND their leftover locations for idempotence
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      org.apache.commons.io.FileUtils.deleteQuietly(loc)
    }
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    ord.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")

    // disable broadcast so the join planner must pick SortMergeJoin —
    // on the 100 TB fact-to-fact case neither side broadcasts anyway
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      // aggregation on a different key still shuffles its partials; the
      // JOIN itself must not — assert by counting exchanges under the
      // join (exactly the one agg exchange is allowed in the whole plan)
      assert(shuffles(joined) <= 1,
        s"bucketed join should leave at most the agg shuffle:\n${joined.queryExecution}")

      // and the same join WITHOUT bucketing shuffles both sides
      val unbucketed = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(shuffles(unbucketed) >= 3,
        "unbucketed baseline should shuffle both join sides plus the agg")

      // correctness: identical results
      val a = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val b = unbucketed.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(a == b)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
