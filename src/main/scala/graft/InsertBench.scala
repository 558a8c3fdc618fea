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

    // GRAFT_TRANSPORT=http: the same workers x batch envelope through the
    // HTTP wire client against an in-JVM decode-and-count server — what
    // the RowBinary block-insert path (encode + HTTP + optional gzip +
    // server-side decode) costs, storage excluded. GRAFT_COMPRESSION=gzip
    // adds the content-coding legs.
    if (sys.env.get("GRAFT_TRANSPORT").contains("http")) {
      runHttp(rowsN, concurrencies, batchSizes, iters,
        sys.env.getOrElse("GRAFT_COMPRESSION", "none"))
      return
    }

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-insert-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft_insbench_").toString
    val cells = for (wc <- concurrencies; bs <- batchSizes) yield (wc, bs)
    // GRAFT_DISTRIBUTE=false A/Bs the layout-aware write path (the
    // pre-write order_by sort) against raw appends
    val distribute = sys.env.getOrElse("GRAFT_DISTRIBUTE", "true")
    val results = cells.map { case (wc, bs) =>
      spark.conf.set("spark.sql.catalog.chbench.write.concurrency", wc.toString)
      spark.conf.set("spark.sql.catalog.chbench.write.batch_size", bs.toString)
      spark.conf.set("spark.sql.catalog.chbench.write.distribute", distribute)
      val ch = ClickHouseSession.builder(spark)
        .storePath(root).catalogName("chbench").build()
      spark.conf.set("spark.sql.catalog.chbench.write.concurrency", wc.toString)
      spark.conf.set("spark.sql.catalog.chbench.write.batch_size", bs.toString)
      spark.conf.set("spark.sql.catalog.chbench.write.distribute", distribute)
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

  /** Wire-insert envelope: wc client threads each push rowsN/wc generated
    * rows in `bs`-row RowBinary blocks (the reference's workers x batch
    * matrix, examples/10_large_scale.rs), server decodes and counts.
    */
  private def runHttp(
      rowsN: Long, concurrencies: Seq[Int], batchSizes: Seq[Int], iters: Int,
      compression: String): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", DoubleType, nullable = false),
      StructField("tag", StringType, nullable = false)))
    // GRAFT_SHARDS=N > 1: one mock server per shard behind the sharded
    // composite client — the scale-OUT write envelope (each block routes
    // to one shard by id-hash; servers decode in parallel)
    val nShards = sys.env.getOrElse("GRAFT_SHARDS", "1").toInt
    val servers = IndexedSeq.fill(math.max(1, nShards))(new graft.client.MockClickHouseHttp)
    try {
      val client: graft.client.ClickHouseClient =
        if (servers.size == 1)
          new graft.client.HttpClickHouseClient(
            servers.head.endpoint, compression = compression)
        else new graft.client.ShardedClickHouseClient(
          servers.map(sv => new graft.client.HttpClickHouseClient(
            sv.endpoint, compression = compression)
            : graft.client.ClickHouseClient),
          Some("id"))
      client.createTable("bench", "wire",
        Seq("id" -> "Int64", "v" -> "Float64", "tag" -> "String"),
        Map("engine" -> "MergeTree", "order_by" -> "id"))
      val cells = for (wc <- concurrencies; bs <- batchSizes) yield (wc, bs)
      val results = cells.map { case (wc, bs) =>
        val times = (0 until iters).map { _ =>
          servers.foreach(_.rowsReceived.set(0))
          val perWorker = rowsN / wc
          val t0 = System.nanoTime()
          val threads = (0 until wc).map { w =>
            val t = new Thread(() => {
              var off = w * perWorker
              val end = off + perWorker
              while (off < end) {
                val n = math.min(bs.toLong, end - off).toInt
                val rows = new Array[Row](n)
                var i = 0
                while (i < n) {
                  val id = off + i
                  rows(i) = Row(id, (id % 997).toDouble, s"tag${id % 31}")
                  i += 1
                }
                client.insert("bench", "wire", schema,
                  scala.collection.immutable.ArraySeq.unsafeWrapArray(rows))
                off += n
              }
            })
            t.start(); t
          }
          threads.foreach(_.join())
          val dt = (System.nanoTime() - t0) / 1e9
          val got = servers.map(_.rowsReceived.get()).sum
          val want = perWorker * wc
          require(got == want, s"servers decoded $got rows, expected $want")
          if (servers.size > 1)
            require(servers.forall(_.rowsReceived.get() > 0),
              s"every shard must receive rows: ${servers.map(_.rowsReceived.get())}")
          dt
        }
        val trimmed =
          if (times.length >= 3) times.sorted.drop(1).dropRight(1) else times
        (wc, bs, trimmed.sum / trimmed.length, times.min)
      }
      results.foreach { case (wc, bs, avg, best) =>
        println(f"http concurrency=$wc%2d batch=$bs%6d avg=${avg}%.2fs " +
          f"(${rowsN / avg}%.0f rows/s) best=${best}%.2fs (${rowsN / best}%.0f rows/s)")
      }
      val qs = results.map { case (wc, bs, avg, _) => s""""c${wc}_b$bs":${rowsN / avg}""" }
        .mkString("{", ",", "}")
      println(s"""{"metric":"http_insert_rows_per_sec","value":${rowsN / results.map(_._3).min},"unit":"rows/sec","queries":$qs,"sf":"$rowsN rows","compression":"$compression","shards":${servers.size}}""")
    } finally servers.foreach(_.close())
  }
}
