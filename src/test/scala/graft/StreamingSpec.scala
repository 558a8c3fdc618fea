package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming over the events table (beyond-reference surface —
  * the reference's "streaming" is bounded batch emission, SURVEY §2.10;
  * this demonstrates the engine's stream path: file source → watermark →
  * windowed aggregation → sink, validated against the batch answer).
  */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .appName("streaming-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("windowed streaming aggregation matches the batch answer") {
    val dir = "/root/testdata/sf0.001"
    // file-source streams read directories: stage the events file into one
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    // events.ts is TIMESTAMP(NANOS): read ns-as-long then convert, same as
    // the batch path in Tables.load
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema

    val stream = spark.readStream.schema(rawSchema)
      .parquet(streamDir.toString)
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))

    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("ev_agg")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ev_agg")
        .select(col("window.start").cast("date").as("day"), col("event_type"),
          col("n"), col("total"))
        .collect().map(_.toSeq).toSet

      val batch = Tables.load(spark, dir, "events")
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .collect().map(_.toSeq).toSet

      assert(streamed == batch,
        s"stream/batch divergence: ${streamed.size} vs ${batch.size} groups")
    } finally q.stop()
  }
}
