package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (VERDICT r13 item 7): measures the r27/r45 per-batch
  * fingerprint-index probe cost as the index grows, comparing the
  * shipped `NOT IN` anti-probe against join formulations that could
  * exploit the index's fp-sorted layout (order_by = fp).
  *
  * The r27 contract being probed: each micro-batch runs
  * `fp NOT IN (SELECT fp FROM fp_index)` WHERE THE INDEX LIVES — zero
  * index rows cross the wire, but the probe itself is O(index) per
  * batch. This tool grows the index 1× → 10× and times, per variant,
  * the pure PROBE (count of batch rows not present — the anti-insert's
  * read side, kept mutation-free so runs are comparable):
  *
  *  - `not_in`: the shipped formulation, through the embedded engine;
  *  - `anti_join`: LEFT ANTI JOIN spelled server-side (same engine);
  *  - `merge_anti`: Spark sort-merge anti join over the index's own
  *    parquet parts (hint("merge")) — the proxy for a true server
  *    merge-path probe over the fp-sorted primary key.
  *
  * Decision rule (BASELINE.md round-14): keep `NOT IN` as the shipped
  * default unless a variant's cost stays ~flat across the 10× growth.
  */
object FpProbe {
  def main(args: Array[String]): Unit = {
    val baseRows = args.headOption.map(_.toLong).getOrElse(200000L)
    val batchRows = 5000
    val iters = 3
    val spark = SparkSession.builder().master("local[8]")
      .appName("fp-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("graft_fpprobe_").toString
    spark.conf.set("spark.sql.catalog.chfp",
      classOf[graft.catalog.ClickHouseCatalog].getName)
    spark.conf.set("spark.sql.catalog.chfp.path", root)
    val client = new graft.client.EmbeddedClickHouse(root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chfp.main")
    spark.sql(
      """CREATE TABLE chfp.main.fp_index (fp STRING, first_event BIGINT)
        |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'fp')""".stripMargin)
    spark.sql(
      """CREATE TABLE chfp.main.fp_stage (fp STRING, first_event BIGINT)
        |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'fp')""".stripMargin)
    // fixed probe batch: half present in every index generation (ids
    // < batch/2 are always inserted below), half forever-novel
    spark.range(batchRows)
      .select(md5(concat(lit("fp_"), col("id").cast("string")).cast("binary"))
        .as("fp"), col("id").as("first_event"))
      .writeTo("chfp.main.fp_stage").append()

    def timeIt(f: => Long): (Double, Long) = {
      val runs = (0 until iters).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (runs.map(_._1).min, runs.head._2)
    }
    def scalarCount(sql: String): Long =
      client.query(sql, 1)._2.flatten.head.getLong(0)

    var indexRows = 0L
    val results = Seq(1L, 10L).map { scale =>
      val target = baseRows * scale
      // grow to `target`: new fps beyond the current population; the
      // overlap half of the batch (ids < batchRows/2) is always present
      spark.range(indexRows, target)
        .select(md5(concat(lit("fp_"),
            when(col("id") < batchRows / 2, col("id"))
              .otherwise(col("id") + 1000000000L).cast("string"))
          .cast("binary")).as("fp"),
          col("id").as("first_event"))
        .writeTo("chfp.main.fp_index").append()
      indexRows = target
      client.optimizeTable("main", "fp_index", finalize = false)

      val (tNotIn, nNotIn) = timeIt(scalarCount(
        """SELECT count(*) AS n FROM `main`.`fp_stage`
          |WHERE `fp` IS NOT NULL AND `fp` NOT IN
          |  (SELECT `fp` FROM `main`.`fp_index` WHERE `fp` IS NOT NULL)"""
          .stripMargin))
      val (tAnti, nAnti) = timeIt(scalarCount(
        """SELECT count(*) AS n FROM (
          |  SELECT s.`fp` FROM `main`.`fp_stage` s
          |  LEFT ANTI JOIN `main`.`fp_index` i ON s.`fp` = i.`fp`)"""
          .stripMargin))
      // merge-path proxy: anti join the index's own parquet parts with a
      // sort-merge hint (batch side sorted too) — what a server-side
      // primary-key merge probe would cost, including its sorts
      val idxDf = spark.table("chfp.main.fp_index")
      val stageDf = spark.table("chfp.main.fp_stage")
      val (tMerge, nMerge) = timeIt(
        stageDf.hint("merge")
          .join(idxDf, Seq("fp"), "left_anti").count())
      require(nNotIn == nAnti && nAnti == nMerge,
        s"variant disagreement: $nNotIn / $nAnti / $nMerge")
      println(f"index=${target}%d rows batch=$batchRows novel=$nNotIn : " +
        f"not_in=$tNotIn%.3fs anti_join=$tAnti%.3fs merge_anti=$tMerge%.3fs")
      (target, tNotIn, tAnti, tMerge)
    }
    val Seq((_, a1, b1, c1), (_, a10, b10, c10)) = results
    println(f"growth 1x->10x: not_in ${a10 / a1}%.2fx anti_join ${b10 / b1}%.2fx " +
      f"merge_anti ${c10 / c1}%.2fx (flat = ~1.0x)")
    spark.stop()
  }
}
