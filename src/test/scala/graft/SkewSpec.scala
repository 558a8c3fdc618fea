package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

/** Hot-key mitigation, both forms: AQE's runtime skew-join split and the
  * explicit salted join (graft.ops.Skew). The dataset is a power-law
  * worst case — 90% of the big side shares ONE key.
  */
class SkewSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .appName("skew-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    import spark.implicits._
    // 90k rows on key 0, 10k spread over 1..100 — key 0's partition is
    // ~90% of the shuffle
    val big = spark.range(100000)
      .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 100 + 1).as("k"),
        col("id").as("v"))
    val small = spark.range(0, 101).select(col("id").as("k"), (col("id") * 10).as("w"))
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes").map(k =>
      k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try {
      val joined = big.join(small, "k")
      // materialize THIS QueryExecution (count() would build a separate
      // one, leaving joined's adaptive plan un-executed and un-optimized)
      assert(joined.collect().length == 100000)
      // QueryStageExec nodes are leaves for collect: descend explicitly
      def smjIn(p: org.apache.spark.sql.execution.SparkPlan): Seq[SortMergeJoinExec] =
        p.collect {
          case j: SortMergeJoinExec => Seq(j)
          case a: AdaptiveSparkPlanExec => smjIn(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => smjIn(q.plan)
        }.flatten
      val smjs = smjIn(joined.queryExecution.executedPlan)
      assert(smjs.nonEmpty, "expected a sort-merge join under AQE")
      assert(smjs.exists(_.isSkewJoin),
        s"AQE should mark the join skew-split:\n${joined.queryExecution}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join equals the plain join on skewed data") {
    val big = spark.range(20000)
      .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 50 + 1).as("k"),
        col("id").as("v"))
    val small = spark.range(0, 51).select(col("id").as("k"), (col("id") * 10).as("w"))
    val salted = Skew.saltedJoin(big, small, "k", numSalts = 8)
      .select("k", "v", "w").collect().map(_.toSeq).toSet
    val plain = big.join(small, "k")
      .select("k", "v", "w").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }
}
