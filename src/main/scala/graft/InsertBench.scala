package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.session.ClickHouseSession

/** Insert-throughput harness mirroring the reference's large-scale
  * benchmark (examples/10_large_scale.rs: ROW_COUNTS x WORKERS x
  * BATCH_SIZES sweep, trimmed-mean + best reporting) and its
  * write-concurrency demo (examples/09): writes N generated rows through
  * the connector at each concurrency level and reports rows/sec.
  *
  * Env knobs (reference parity): GRAFT_ROWS (default 1,000,000),
  * GRAFT_CONCURRENCIES (default "1,4,8,16"), GRAFT_ITERS (default 3),
  * GRAFT_BATCH_SIZES (default "10000" — the per-block insert size,
  * 10_large_scale.rs BATCH_SIZES).
  */
object InsertBench {
  def main(args: Array[String]): Unit = {
    val rowsN = sys.env.getOrElse("GRAFT_ROWS", "1000000").toLong
    val concurrencies = sys.env.getOrElse("GRAFT_CONCURRENCIES", "1,4,8,16")
      .split(",").map(_.trim.toInt).toSeq
    val iters = sys.env.getOrElse("GRAFT_ITERS", "3").toInt
    val batchSizes = sys.env.getOrElse("GRAFT_BATCH_SIZES", "10000")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-insert-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft_insbench_").toString
    val cells = for (wc <- concurrencies; bs <- batchSizes) yield (wc, bs)
    val results = cells.map { case (wc, bs) =>
      spark.conf.set("spark.sql.catalog.chbench.write.concurrency", wc.toString)
      spark.conf.set("spark.sql.catalog.chbench.write.batch_size", bs.toString)
      val ch = ClickHouseSession.builder(spark)
        .storePath(root).catalogName("chbench").build()
      spark.conf.set("spark.sql.catalog.chbench.write.concurrency", wc.toString)
      spark.conf.set("spark.sql.catalog.chbench.write.batch_size", bs.toString)
      val times = (0 until iters).map { it =>
        val tbl = s"bench_${wc}_${bs}_$it"
        ch.newTable("bench", tbl)
          .column("id", "Int64").column("v", "Float64").column("tag", "String")
          .engine("MergeTree").orderBy("id").create()
        val df = spark.range(rowsN).select(
          col("id"),
          (col("id") % 997).cast("double").as("v"),
          concat(lit("tag"), (col("id") % 31).cast("string")).as("tag"))
        val t0 = System.nanoTime()
        df.writeTo(s"chbench.bench.$tbl").append()
        val dt = (System.nanoTime() - t0) / 1e9
        ch.dropTable("bench", tbl)
        dt
      }
      // trimmed mean: drop min+max when >= 3 iterations (10_large_scale.rs:53-58)
      val trimmed =
        if (times.length >= 3) times.sorted.drop(1).dropRight(1) else times
      val avg = trimmed.sum / trimmed.length
      val best = times.min
      (wc, bs, avg, best)
    }

    results.foreach { case (wc, bs, avg, best) =>
      println(f"concurrency=$wc%2d batch=$bs%6d avg=${avg}%.2fs " +
        f"(${rowsN / avg}%.0f rows/s) best=${best}%.2fs (${rowsN / best}%.0f rows/s)")
    }
    val qs = results.map { case (wc, bs, avg, _) => s""""c${wc}_b$bs":${rowsN / avg}""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"insert_rows_per_sec","value":${rowsN / results.map(_._3).min},"unit":"rows/sec","queries":$qs,"sf":"$rowsN rows"}""")
    spark.stop()
  }
}
