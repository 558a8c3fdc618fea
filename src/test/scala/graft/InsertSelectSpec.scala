package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.client.EmbeddedClickHouse
import graft.pushdown.ChInsertSelectCommand

/** SQL `INSERT INTO <ch-table> SELECT ...` over SAME-STORE tables
  * rewrites to one server-side `INSERT ... SELECT` (ChInsertSelect
  * Command) — zero rows cross the wire. Federated sources, sharded
  * catalogs, VALUES inserts, and optioned writes keep Spark's write
  * path; nullability stays enforced; materialized views on the target
  * still fire.
  */
class InsertSelectSpec extends AnyFunSuite {

  private lazy val root = Files.createTempDirectory("graft_insel_").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .appName("insert-select-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.conf.set("spark.sql.catalog.chisel",
      classOf[graft.catalog.ClickHouseCatalog].getName)
    s.conf.set("spark.sql.catalog.chisel.path", root)
    graft.GraftSession.install(s)
    s
  }

  private lazy val setup: Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chisel.main")
    spark.sql(
      """CREATE TABLE chisel.main.src (id BIGINT, tag STRING, v BIGINT)
        |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'id')""".stripMargin)
    spark.sql(
      "INSERT INTO chisel.main.src SELECT id, concat('t', id % 3), id * 10 " +
        "FROM range(30)")
  }

  /** Executed-plan nodes of the LAST statement, through CommandResult. */
  private def planOf(sql: String) =
    PlanAsserts.flatten(spark.sql(sql).queryExecution.executedPlan)

  private def freshTarget(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS chisel.main.$name")
    spark.sql(
      s"""CREATE TABLE chisel.main.$name (id BIGINT, tag STRING, v BIGINT)
         |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'id')""".stripMargin)
  }

  test("same-store INSERT SELECT ships as ONE server statement: the plan " +
    "is the command, not AppendData, and the rows land transformed") {
    setup
    freshTarget("dst")
    val nodes = planOf(
      """INSERT INTO chisel.main.dst
        |SELECT id + 100, tag, v * 2 FROM chisel.main.src WHERE id < 10""".stripMargin)
    val cmds = nodes.collect {
      case e: org.apache.spark.sql.execution.command.ExecutedCommandExec => e.cmd }
    assert(cmds.exists(_.isInstanceOf[ChInsertSelectCommand]),
      s"expected the server-side command:\n${nodes.head}")
    assert(!nodes.exists(_.getClass.getSimpleName == "AppendDataExec"),
      "no Spark write path")
    val rows = spark.table("chisel.main.dst").orderBy("id").collect()
    assert(rows.length == 10 && rows.head.getLong(0) == 100L &&
      rows.head.getLong(2) == 0L && rows.last.getLong(2) == 180L)
  }

  test("aggregating INSERT SELECT also collapses (GROUP BY runs in the " +
    "store); a fresh read over the target sees the rows (cache refresh)") {
    setup
    spark.sql("DROP TABLE IF EXISTS chisel.main.agg")
    spark.sql(
      """CREATE TABLE chisel.main.agg (tag STRING, n BIGINT)
        |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'tag')""".stripMargin)
    assert(spark.table("chisel.main.agg").count() == 0) // prime the cache
    val nodes = planOf(
      """INSERT INTO chisel.main.agg
        |SELECT tag, count(*) FROM chisel.main.src GROUP BY tag""".stripMargin)
    assert(nodes.exists {
      case e: org.apache.spark.sql.execution.command.ExecutedCommandExec =>
        e.cmd.isInstanceOf[ChInsertSelectCommand]
      case _ => false
    }, s"aggregate should collapse too:\n${nodes.head}")
    assert(spark.table("chisel.main.agg").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("t0" -> 10L, "t1" -> 10L, "t2" -> 10L))
  }

  test("federated sources, VALUES, and write options keep Spark's write " +
    "path (AppendData), and still land correctly") {
    setup
    freshTarget("dst2")
    spark.range(3).selectExpr("id", "'x' AS tag", "id AS v")
      .createOrReplaceTempView("local_rows")
    val nodes = planOf(
      "INSERT INTO chisel.main.dst2 SELECT id, tag, v FROM local_rows")
    assert(!nodes.exists {
      case e: org.apache.spark.sql.execution.command.ExecutedCommandExec =>
        e.cmd.isInstanceOf[ChInsertSelectCommand]
      case _ => false
    }, "a non-store source must not claim the server path")
    spark.sql("INSERT INTO chisel.main.dst2 VALUES (100, 'y', 1)")
    assert(spark.table("chisel.main.dst2").count() == 4)
  }

  test("sharded catalogs keep the Spark write path: routing is the " +
    "client's job there") {
    val r1 = Files.createTempDirectory("graft_insh1_").toString
    val r2 = Files.createTempDirectory("graft_insh2_").toString
    spark.conf.set("spark.sql.catalog.chiselsh",
      classOf[graft.catalog.ClickHouseCatalog].getName)
    spark.conf.set("spark.sql.catalog.chiselsh.path", s"$r1,$r2")
    spark.conf.set("spark.sql.catalog.chiselsh.shard_by", "id")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chiselsh.main")
    for (t <- Seq("a", "b")) spark.sql(
      s"""CREATE TABLE chiselsh.main.$t (id BIGINT, v BIGINT)
         |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'id')""".stripMargin)
    spark.sql("INSERT INTO chiselsh.main.a SELECT id, id FROM range(20)")
    val nodes = planOf("INSERT INTO chiselsh.main.b SELECT id, v FROM chiselsh.main.a")
    assert(!nodes.exists {
      case e: org.apache.spark.sql.execution.command.ExecutedCommandExec =>
        e.cmd.isInstanceOf[ChInsertSelectCommand]
      case _ => false
    }, "sharded targets need client-side routing")
    assert(spark.table("chiselsh.main.b").count() == 20)
  }

  test("NULL into a non-Nullable sink column fails loudly through the " +
    "server path; materialized views on the target fire") {
    setup
    // Spark DDL columns are nullable by default and the catalog maps them
    // faithfully to Nullable(T) — the NULL-guard assertion needs an honest
    // NOT NULL sink.
    spark.sql("DROP TABLE IF EXISTS chisel.main.dst3")
    spark.sql(
      """CREATE TABLE chisel.main.dst3
        |(id BIGINT NOT NULL, tag STRING NOT NULL, v BIGINT NOT NULL)
        |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'id')""".stripMargin)
    val e = intercept[Exception](spark.sql(
      """INSERT INTO chisel.main.dst3
        |SELECT id, CASE WHEN id = 5 THEN CAST(NULL AS STRING) ELSE tag END, v
        |FROM chisel.main.src""".stripMargin))
    val chain = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    // the SERVER-side guard message: the statement collapsed to the
    // remote path (AssertNotNull stripped by the rewrite) and the
    // runtime NULL guard raised there — not Spark's write-path assert
    assert(chain.contains("Cannot insert NULL into non-Nullable column"), chain)
    // the staged copy aborts: nothing landed
    assert(spark.table("chisel.main.dst3").count() == 0)
    // MV on the target fires through the server-side insert
    spark.sql(
      """CREATE TABLE chisel.main.dst3_agg (tag STRING, n BIGINT)
        |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'tag')""".stripMargin)
    graft.connector.ChMutations.clientOf(spark, "chisel")
      .createMaterializedView("main", "dst3_mv", "main", "dst3_agg",
        "SELECT tag, count(*) AS n FROM main.dst3 GROUP BY tag")
    spark.sql(
      "INSERT INTO chisel.main.dst3 SELECT id, tag, v FROM chisel.main.src " +
        "WHERE id < 6")
    assert(spark.table("chisel.main.dst3_agg").collect()
      .map(_.getLong(1)).sum == 6L)
  }

  test("NULL into a Nullable sink column succeeds: Spark-nullable DDL maps " +
    "to Nullable(T), so the insert is legal and the NULL lands") {
    setup
    freshTarget("dst4") // default-nullable columns -> Nullable(T) in the store
    spark.sql(
      """INSERT INTO chisel.main.dst4
        |SELECT id, CASE WHEN id = 5 THEN CAST(NULL AS STRING) ELSE tag END, v
        |FROM chisel.main.src WHERE id < 10""".stripMargin)
    val rows = spark.table("chisel.main.dst4").collect()
    assert(rows.length == 10)
    assert(rows.count(_.isNullAt(1)) == 1)
  }
}
