package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: quantifies the shard-key-local collapse (r41 shape) by
  * timing the SAME co-located join+aggregate two ways over the SAME
  * two-shard store: (A) through the shard_by-declaring catalog — the
  * rule collapses it to one remote statement per shard, zero rows
  * cross; (B) through a catalog WITHOUT shard_by over the same roots —
  * only row-local scans ship, both tables stream out and Spark joins
  * and aggregates them. The delta is what declaring the routing key
  * buys; at 100 TB (B) is two full-table transfers plus a shuffle.
  *
  * Usage: sbt 'runMain graft.ShardProbe /root/testdata/sf0.1'
  */
object ShardProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("shard-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // builds the chcoloc catalog + sharded store idempotently
    SparkEntry.queries("r41_sharded_colocated_join")(spark, sfDir).count()

    val tag = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    val roots = s"/root/repo/target/chcoloc0_$tag,/root/repo/target/chcoloc1_$tag"
    // same roots, NO shard_by: nothing co-locates, the join stays local
    spark.conf.set("spark.sql.catalog.chcolocx",
      classOf[graft.catalog.ClickHouseCatalog].getName)
    spark.conf.set("spark.sql.catalog.chcolocx.path", roots)

    def shape(cat: String): DataFrame = {
      val c = spark.table(s"$cat.main.cust_co").as("c")
      val o = spark.table(s"$cat.main.ord_co").as("o")
      c.join(o, col("c.custkey") === col("o.custkey"))
        .groupBy(col("c.custkey").as("custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o.price")).cast("decimal(18,2)").as("total"))
    }

    def time(df: => DataFrame): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }

    val rows = shape("chcoloc_" + tag).count()
    val collapsed = time(shape("chcoloc_" + tag))
    val local = time(shape("chcolocx"))
    println(s"""{"metric":"coloc_join_ab","rows":$rows,""" +
      s""""collapsed_sec":$collapsed,"local_join_sec":$local,""" +
      s""""speedup":${local / collapsed},"sf":"$sfDir"}""")
    spark.stop()
  }
}
