package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r18 plan evidence): the r68/r69 gates return recallGate's
  * one-row threshold table, so PlanAudit on the GATE shows only a
  * LocalTableScan — the probe plan the fusion changed is the `ann`
  * DataFrame consumed inside. This prints exactly that probe plan:
  * the two-level stored index rebuilt from the same chstore tables the
  * gate reads (fromTablesTwoLevel) probed through annTopK2 at the
  * gate's operating point (all supers, nprobe = ceil(0.75 k)).
  *
  * Usage: GRAFT_PLAN_OUT=plans/r18 GRAFT_PLAN_SUFFIX=_after \
  *   sbt "runMain graft.AnnPlanProbe <sfDir>"
  */
object AnnPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-ann-plan-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.register(spark, sfDir)
    val tag = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    spark.conf.set("spark.sql.catalog.clickhouse",
      classOf[graft.catalog.ClickHouseCatalog].getName)
    spark.conf.set("spark.sql.catalog.clickhouse.path",
      s"/root/repo/target/chstore_$tag")
    val stored = graft.ops.AnnIvf.fromTablesTwoLevel(
      spark.table("clickhouse.main.ivf2_cells"),
      spark.table("clickhouse.main.ivf2_super"),
      spark.table("clickhouse.main.ivf2_sub"), "vec_id", "embedding")
    val k = stored.subCenters.count().toInt
    val probes = spark.table("embeddings").filter(col("vec_id") < 100)
    val ann = graft.ops.AnnIvf.annTopK2(
      stored, probes, "vec_id", "embedding", k = 5,
      nprobeSuper = stored.superCenters.length,
      nprobe = math.ceil(0.75 * k).toInt)
    ann.write.format("noop").mode("overwrite").save() // AQE-finalize
    val formatted = ann.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val executed = ann.queryExecution.executedPlan.toString
    println(executed.take(8000))
    sys.env.get("GRAFT_PLAN_OUT").foreach { d =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      val suffix = sys.env.getOrElse("GRAFT_PLAN_SUFFIX", "")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(d, s"r68_probe$suffix.txt"),
        s"==== r68 two-level probe (annTopK2, all supers) — " +
          s"explain(formatted) ====\n$formatted\n" +
          s"==== executed plan (AQE-finalized) ====\n$executed\n")
    }
    spark.stop()
  }
}
