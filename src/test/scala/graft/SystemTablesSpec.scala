package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.client.EmbeddedClickHouse

/** The `system` metadata database: a real server ships
  * system.{databases,tables,columns,parts} and the reference reaches
  * them through plain catalog resolution + passthrough SQL (no special
  * code — the server reports `system` like any database), so connector
  * users expect `SELECT ... FROM <catalog>.system.tables` to work. The
  * embedded client synthesizes them from store metadata; these specs pin
  * the synthesized content, its freshness across DDL/DML, read-only
  * enforcement on every mutation surface, and the sharded union shape.
  */
class SystemTablesSpec extends AnyFunSuite {

  private lazy val root = Files.createTempDirectory("graft_systb_").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .appName("system-tables-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // unique catalog name per suite: suites share one JVM-wide session
    s.conf.set("spark.sql.catalog.chsys",
      classOf[graft.catalog.ClickHouseCatalog].getName)
    s.conf.set("spark.sql.catalog.chsys.path", root)
    s
  }

  private lazy val setup: Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chsys.main")
    spark.sql(
      """CREATE TABLE chsys.main.base (id BIGINT, v DOUBLE, tag STRING)
        |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'id',
        |  'partition_by' = 'tag')""".stripMargin)
    spark.sql("INSERT INTO chsys.main.base VALUES (1, 1.5, 'a'), (2, 2.5, 'b')")
    spark.sql("INSERT INTO chsys.main.base VALUES (3, 3.5, 'c')")
  }

  test("system appears in SHOW NAMESPACES and lists its five tables") {
    setup
    val dbs = spark.sql("SHOW NAMESPACES IN chsys").collect().map(_.getString(0))
    assert(dbs.contains("system") && dbs.contains("main"), dbs.mkString(","))
    val ts = spark.sql("SHOW TABLES IN chsys.system").collect()
      .map(_.getString(1)).sorted.toSeq
    assert(ts == Seq("columns", "databases", "parts", "projections", "tables"))
  }

  test("system.tables reports engine, total_rows, sorting and partition keys") {
    setup
    val r = spark.table("chsys.system.tables")
      .where("database = 'main' AND name = 'base'").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[String]("engine") == "MergeTree")
    assert(row.getAs[Long]("total_rows") == 3L)
    assert(row.getAs[String]("sorting_key") == "id")
    assert(row.getAs[String]("partition_key") == "tag")
    // the system tables list themselves (server parity), with NULL rows
    val sys = spark.table("chsys.system.tables")
      .where("database = 'system'").collect()
    assert(sys.length == 5 && sys.forall(_.isNullAt(3)))
  }

  test("system.columns carries name, ClickHouse type, 1-based position") {
    setup
    val cols = spark.table("chsys.system.columns")
      .where("database = 'main' AND table = 'base'")
      .orderBy("position").collect()
      .map(r => (r.getAs[String]("name"), r.getAs[String]("type"),
        r.getAs[Long]("position"))).toSeq
    // Spark DDL columns are nullable by default → Nullable(...) store
    // types, exactly what the server's system.columns would report
    assert(cols == Seq(("id", "Nullable(Int64)", 1L),
      ("v", "Nullable(Float64)", 2L), ("tag", "Nullable(String)", 3L)))
  }

  test("system.parts: one row per part file with footer row counts; " +
    "OPTIMIZE consolidates to one part and system sees it") {
    setup
    val parts = spark.table("chsys.system.parts")
      .where("database = 'main' AND table = 'base'").collect()
    assert(parts.length == 2, s"two insert blocks = two parts: ${parts.length}")
    assert(parts.map(_.getAs[Long]("rows")).sorted.toSeq == Seq(1L, 2L))
    assert(parts.forall(_.getAs[Boolean]("active")))
    assert(parts.forall(_.getAs[Long]("bytes_on_disk") > 0L))
    graft.connector.ChMutations.clientOf(spark, "chsys")
      .optimizeTable("main", "base", finalize = false)
    val after = spark.table("chsys.system.parts")
      .where("database = 'main' AND table = 'base'").collect()
    assert(after.length == 1 && after.head.getAs[Long]("rows") == 3L)
  }

  test("metadata is live across DDL: ALTER/CREATE/DROP show up " +
    "(version-gated view refresh, no manual invalidation)") {
    setup
    spark.sql("CREATE TABLE chsys.main.ephemeral (k BIGINT) " +
      "TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'k')")
    def names() = spark.table("chsys.system.tables")
      .where("database = 'main'").collect().map(_.getAs[String]("name")).toSet
    assert(names().contains("ephemeral"))
    spark.sql("ALTER TABLE chsys.main.ephemeral ADD COLUMN extra STRING")
    val cols = spark.table("chsys.system.columns")
      .where("database = 'main' AND table = 'ephemeral'")
      .orderBy("position").collect().map(_.getAs[String]("name")).toSeq
    assert(cols == Seq("k", "extra"))
    spark.sql("DROP TABLE chsys.main.ephemeral")
    assert(!names().contains("ephemeral"))
  }

  test("filter + projection pushdown and joins work over system tables " +
    "like any scan") {
    setup
    // federate system.columns against system.tables through the catalog
    val df = spark.sql(
      """SELECT t.name, c.ncols, t.total_rows
        |FROM chsys.system.tables t
        |JOIN (SELECT table AS name, count(*) AS ncols
        |      FROM chsys.system.columns WHERE database = 'main'
        |      GROUP BY table) c USING (name)
        |WHERE t.database = 'main' AND t.name = 'base'""".stripMargin)
    val r = df.collect()
    assert(r.length == 1 && r.head.getAs[Long]("ncols") == 3L &&
      r.head.getAs[Long]("total_rows") == 3L)
  }

  test("every mutation surface rejects system tables loudly") {
    setup
    val client = graft.connector.ChMutations.clientOf(spark, "chsys")
    def rejected(f: => Any): String = {
      val e = intercept[Exception](f)
      // executor-side write failures nest the root cause several levels
      // deep (SparkException → task failure → require) — walk the chain
      Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    }
    assert(rejected(spark.sql(
      "INSERT INTO chsys.system.databases VALUES ('x')")).contains("read-only"))
    assert(rejected(spark.sql(
      "DROP TABLE chsys.system.parts")).contains("read-only"))
    assert(rejected(spark.sql(
      "ALTER TABLE chsys.system.tables ADD COLUMN x STRING")).contains("read-only"))
    assert(rejected(client.deleteWhere("system", "parts", "1")).contains("read-only"))
    assert(rejected(client.updateWhere("system", "tables",
      Seq("name" -> "'x'"), "1")).contains("read-only"))
    assert(rejected(client.optimizeTable("system", "parts")).contains("read-only"))
    assert(rejected(client.renameTable("system", "parts", "main", "p2"))
      .contains("read-only"))
    assert(rejected(client.createTable("system", "extra",
      Seq("a" -> "Int64"), Map.empty)).contains("read-only"))
    assert(rejected(client.dropDatabase("system")).contains("read-only"))
    // CREATE NAMESPACE system: already exists (IF NOT EXISTS is a no-op)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chsys.system") // no-op, no throw
    assert(rejected(new EmbeddedClickHouse(root)
      .createDatabase("system", ifNotExists = false)).contains("already exists"))
  }

  test("sharded catalogs union system rows per shard (parts from " +
    "every shard are visible)") {
    val r1 = Files.createTempDirectory("graft_syssh1_").toString
    val r2 = Files.createTempDirectory("graft_syssh2_").toString
    spark.conf.set("spark.sql.catalog.chsyssh",
      classOf[graft.catalog.ClickHouseCatalog].getName)
    spark.conf.set("spark.sql.catalog.chsyssh.path", s"$r1,$r2")
    spark.conf.set("spark.sql.catalog.chsyssh.shard_by", "id")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chsyssh.main")
    spark.sql(
      """CREATE TABLE chsyssh.main.t (id BIGINT, v BIGINT)
        |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'id')""".stripMargin)
    spark.sql("INSERT INTO chsyssh.main.t SELECT id, id FROM range(100)")
    // routing spreads rows across both shards; each shard holds >=1 part
    val parts = spark.table("chsyssh.system.parts")
      .where("database = 'main' AND table = 't'").collect()
    assert(parts.length >= 2, s"expected parts on both shards: ${parts.length}")
    assert(parts.map(_.getAs[Long]("rows")).sum == 100L)
    // per-shard table rows: sum of total_rows across the union = all rows
    val totals = spark.table("chsyssh.system.tables")
      .where("database = 'main' AND name = 't'").collect()
    assert(totals.length == 2 &&
      totals.map(_.getAs[Long]("total_rows")).sum == 100L)
  }

  test("the _part virtual column reads the part file name in-query, " +
    "matches system.parts, and never leaks into star-selects") {
    setup
    val ch = graft.session.ClickHouseSession.builder(spark)
      .storePath(root).catalogName("chsys").build()
    // a fresh insert guarantees >= 2 live parts even after the OPTIMIZE
    // test consolidated the earlier ones
    spark.sql("INSERT INTO chsys.main.base VALUES (9, 9.5, 'c')")
    val total = spark.table("chsys.main.base").count()
    val byPart = ch.chSql(
      "SELECT `_part` AS p, count(*) AS n FROM `main`.`base` " +
        "GROUP BY p ORDER BY p").collect()
    assert(byPart.length >= 2, "expected at least two live parts")
    assert(byPart.map(_.getLong(1)).sum == total)
    val sysParts = ch.chSql(
      "SELECT `name` FROM `system`.`parts` WHERE `table` = 'base'")
      .collect().map(_.getString(0)).toSet
    assert(byPart.map(_.getString(0)).toSet == sysParts,
      "_part values must be exactly the system.parts names")
    // bare (unbackticked) reference works too; predicates on it prune
    val one = ch.chSql(
      s"SELECT count(*) AS n FROM `main`.`base` " +
        s"WHERE _part = '${byPart.head.getString(0)}'").collect().head
    assert(one.getLong(0) == byPart.head.getLong(1))
    // star-selects of ordinary reads never see the virtual column
    assert(!ch.chSql("SELECT * FROM `main`.`base` LIMIT 1")
      .columns.contains("_part"))
    // a string literal mentioning _part is DATA, not a reference
    assert(ch.chSql("SELECT * FROM `main`.`base` WHERE tag != '_part'")
      .columns.sameElements(Array("id", "v", "tag")))
    // other virtual columns stay loud (file names cannot honestly
    // derive a partition id — embedded parts are not partition-split)
    intercept[Exception](ch.chSql(
      "SELECT `_partition_id` FROM `main`.`base`").collect())
  }
}
