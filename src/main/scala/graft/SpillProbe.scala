package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: time the embedded remote-read path phase by phase. */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("spill-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.ConnectorQueries.harness(spark, dir)
    Tables.register(spark, dir)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // warm-up
    spark.table("clickhouse.main.nation").count()

    // raw transfer cost: full orders scan through the connector
    for (i <- 1 to 3)
      time(s"orders full transfer #$i")(
        spark.table("clickhouse.main.orders")
          .select("o_custkey", "o_totalprice").rdd.count())

    // r15 shape
    for (i <- 1 to 3)
      time(s"r15 #$i") {
        spark.conf.set(
          "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
        spark.table("clickhouse.main.orders")
          .join(broadcast(spark.table("customer")
            .filter(col("c_mktsegment") === "BUILDING")),
            col("o_custkey") === col("c_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum("o_totalprice"), 2).as("revenue"))
          .collect()
      }

    // r15 without DPP at all
    for (i <- 1 to 3)
      time(s"r15 noDPP #$i") {
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
        val r = spark.table("clickhouse.main.orders")
          .join(broadcast(spark.table("customer")
            .filter(col("c_mktsegment") === "BUILDING")),
            col("o_custkey") === col("c_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum("o_totalprice"), 2).as("revenue"))
          .collect()
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
        r
      }

    // client-level: plan (spill write) vs read
    val client = new graft.client.EmbeddedClickHouse(
      s"/root/repo/target/chstore_${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
    for (i <- 1 to 3) {
      val (schema, handles) = time(s"planQuery(full orders) #$i")(
        client.planQuery(
          "SELECT `o_custkey`, `o_totalprice` FROM `main`.`orders`", 8))
      time(s"readPartitions #$i")(
        handles.map(h => client.readPartition(h).length).sum)
    }
    spark.stop()
  }
}
