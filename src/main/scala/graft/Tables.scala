package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-generated TPC-H-ish parquet corpus (TESTDATA.md) and
  * registers each table as a temp view so both the DataFrame API and
  * `spark.sql` queries can address them by name (matching the DuckDB
  * oracle's table names).
  *
  * Scale note: these are plain parquet scans — Catalyst pushes filters and
  * required columns down to the parquet reader, so every query built on top
  * starts from a pruned columnar scan. At cluster scale the same views
  * would be external tables; nothing here materializes data on the driver.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) in parquet, which Spark's reader
      // rejects. Read nanos as long and convert to TimestampType (micros) —
      // monotonic truncation, so ordering/date_trunc semantics survive.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros((org.apache.spark.sql.functions.col("ts") / 1000L).cast("long")))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  // one registration per (session, dir): every gate query calls register,
  // and re-reading 10 parquet footers per query dominates small-query
  // latency; key on the session so concurrent suites stay isolated
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Register all tables as temp views for the given scale-factor dir. */
  def register(spark: SparkSession, dir: String): Unit =
    if (registered.get(spark) != dir) {
      names.foreach { n => load(spark, dir, n).createOrReplaceTempView(n) }
      registered.put(spark, dir)
    }
}
