package graft

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.session.ClickHouseSession

/** Fluent builder API (mirrors the reference's builders.rs fluent DDL
  * chain and its e2e builder test, tests/e2e.rs: builder).
  */
class SessionSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .appName("session-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("fluent DDL chain: database -> table -> insert -> query -> drop") {
    val root = Files.createTempDirectory("graft_sess_").toString
    val ch = ClickHouseSession.builder(spark)
      .storePath(root).catalogName("chsess").build()

    ch.createDatabase("analytics")
    ch.newTable("analytics", "metrics")
      .column("id", "Int64")
      .column("name", "Nullable(String)")
      .column("value", "Float64")
      .engine("MergeTree").orderBy("id").partitionBy("id")
      .ttl("toDateTime64(id, 3) + INTERVAL 10 DAY") // must be temporal
      .create()

    assert(ch.databases.contains("analytics"))
    assert(ch.tables("analytics") == Seq("metrics"))
    assert(ch.client.fetchTableOptions("analytics", "metrics")("order_by") == "id")
    assert(ch.client.fetchTableOptions("analytics", "metrics")("ttl") ==
      "toDateTime64(id, 3) + INTERVAL 10 DAY")

    ch.client.insert("analytics", "metrics",
      ch.client.asInstanceOf[graft.client.EmbeddedClickHouse].sparkSchema("analytics", "metrics"),
      Seq(Row(1L, "a", 1.5), Row(2L, "b", 2.5)))

    // reads go through the catalog plugin (pushdown path)
    val got = ch.table("analytics", "metrics")
      .filter(col("id") > 1).select("name").collect().map(_.getString(0))
    assert(got.toSeq == Seq("b"))
    assert(ch.sql("SELECT count(*) AS n FROM chsess.analytics.metrics")
      .collect().head.getLong(0) == 2L)

    // schema evolution through the builder API, ClickHouse types
    ch.addColumn("analytics", "metrics", "unit", "Nullable(String)")
    ch.renameColumn("analytics", "metrics", "value", "score")
    ch.modifyColumn("analytics", "metrics", "score", "Nullable(Float64)")
    assert(ch.client.fetchColumns("analytics", "metrics") == Seq(
      "id" -> "Int64", "name" -> "Nullable(String)",
      "score" -> "Nullable(Float64)", "unit" -> "Nullable(String)"))
    assert(ch.table("analytics", "metrics").orderBy("id")
      .collect().map(_.getDouble(2)).toSeq == Seq(1.5, 2.5))
    ch.dropColumn("analytics", "metrics", "unit")
    ch.renameTable("analytics", "metrics", "analytics", "metrics2")
    assert(ch.tables("analytics") == Seq("metrics2"))

    ch.dropTable("analytics", "metrics2")
    assert(ch.tables("analytics").isEmpty)
    ch.dropDatabase("analytics")
    assert(!ch.databases.contains("analytics"))
  }

  test("GraftExtensions (spark.sql.extensions path) wires rule/strategy/functions") {
    // suites share one JVM session, so build-time extensions are exercised
    // on a SIBLING session over the same SparkContext — exactly what
    // spark.sql.extensions=graft.GraftExtensions produces at build
    // create() builds a NEW session (unlike getOrCreate) and reuses the
    // already-running SparkContext
    val s2: SparkSession = org.apache.spark.sql.classic.SparkSession.builder()
      .master(spark.sparkContext.master)
      .withExtensions(new GraftExtensions().apply(_))
      .create()
    s2.conf.set("spark.sql.shuffle.partitions", "4")

    val root = Files.createTempDirectory("graft_ext_").toString
    val client = new graft.client.EmbeddedClickHouse(root)
    client.createTable("db", "people",
      Seq("id" -> "Int32", "name" -> "String"), Map("engine" -> "MergeTree"))
    client.insert("db", "people", client.sparkSchema("db", "people"),
      Seq(Row(1, "Alice"), Row(2, "Bob")))
    s2.conf.set("spark.sql.catalog.chext", classOf[graft.catalog.ClickHouseCatalog].getName)
    s2.conf.set("spark.sql.catalog.chext.path", root)

    // NO GraftSession.install(s2): the injected rule must consume the
    // passthrough and the injected strategy must plan the remote node
    val df = s2.sql(
      "SELECT clickhouse(upper(name), 'String') AS u FROM chext.db.people")
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val top = df.queryExecution.executedPlan
    val plans = top +: top.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
    val remotes = plans.flatMap(_.collect {
      case e: graft.pushdown.ClickHouseRemoteExec => e })
    assert(remotes.nonEmpty, s"no remote exec in:\n$top")
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("ALICE", "BOB"))
  }
}
