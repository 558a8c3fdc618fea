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
      .engine("MergeTree").orderBy("id").partitionBy("id").ttl("id + 10")
      .create()

    assert(ch.databases.contains("analytics"))
    assert(ch.tables("analytics") == Seq("metrics"))
    assert(ch.client.fetchTableOptions("analytics", "metrics")("order_by") == "id")
    assert(ch.client.fetchTableOptions("analytics", "metrics")("ttl") == "id + 10")

    ch.client.insert("analytics", "metrics",
      ch.client.asInstanceOf[graft.client.EmbeddedClickHouse].sparkSchema("analytics", "metrics"),
      Seq(Row(1L, "a", 1.5), Row(2L, "b", 2.5)))

    // reads go through the catalog plugin (pushdown path)
    val got = ch.table("analytics", "metrics")
      .filter(col("id") > 1).select("name").collect().map(_.getString(0))
    assert(got.toSeq == Seq("b"))
    assert(ch.sql("SELECT count(*) AS n FROM chsess.analytics.metrics")
      .collect().head.getLong(0) == 2L)

    ch.dropTable("analytics", "metrics")
    assert(ch.tables("analytics").isEmpty)
    ch.dropDatabase("analytics")
    assert(!ch.databases.contains("analytics"))
  }
}
