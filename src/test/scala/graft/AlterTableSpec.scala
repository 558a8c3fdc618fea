package graft

import java.nio.file.Files

import org.apache.spark.sql.{AnalysisException, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.client.{ChAlterOp, EmbeddedClickHouse}

/** ALTER TABLE / RENAME TABLE through the Spark DSv2 catalog: schema
  * evolution as remote DDL (ADD/DROP/RENAME/MODIFY COLUMN as one
  * statement in declaration order), ClickHouse column defaults for the
  * rows that predate an ADD, and the honored-or-rejected guards (key
  * columns, shard_by routing column, NULL-narrowing, composite defaults).
  */
class AlterTableSpec extends AnyFunSuite {

  private lazy val root = Files.createTempDirectory("graft_alter_").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .appName("alter-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // unique catalog name per suite: suites share one JVM-wide session
    s.conf.set("spark.sql.catalog.chalter",
      classOf[graft.catalog.ClickHouseCatalog].getName)
    s.conf.set("spark.sql.catalog.chalter.path", root)
    s
  }

  private var n = 0
  /** Fresh table per test: (qualified name, bare name). */
  private def freshTable(): (String, String) = {
    n += 1
    val t = s"evo_$n"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chalter.main")
    spark.sql(
      s"""CREATE TABLE chalter.main.$t (id BIGINT, v DOUBLE, tag STRING)
         |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'id')""".stripMargin)
    spark.sql(
      s"INSERT INTO chalter.main.$t VALUES (1, 1.5, 'a'), (2, 2.5, 'b')")
    (s"chalter.main.$t", t)
  }

  test("ADD COLUMN: existing rows read the ClickHouse column default, " +
    "new inserts carry real values") {
    val (qt, _) = freshTable()
    spark.sql(s"ALTER TABLE $qt ADD COLUMN flag BIGINT NOT NULL")
    spark.sql(s"ALTER TABLE $qt ADD COLUMN note STRING") // nullable → NULL
    spark.sql(s"INSERT INTO $qt VALUES (3, 3.5, 'c', 7, 'hello')")
    val rows = spark.table(qt).orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(3))).toSeq ==
      Seq((1L, 0L), (2L, 0L), (3L, 7L)),
      "pre-ADD rows must read the non-Nullable default 0")
    assert(rows.map(r => Option(r.getString(4))).toSeq ==
      Seq(None, None, Some("hello")),
      "pre-ADD rows must read NULL for the Nullable add")
  }

  test("DROP COLUMN and RENAME COLUMN preserve the remaining data") {
    val (qt, _) = freshTable()
    spark.sql(s"ALTER TABLE $qt DROP COLUMN v")
    spark.sql(s"ALTER TABLE $qt RENAME COLUMN tag TO label")
    assert(spark.table(qt).schema.fieldNames.toSeq == Seq("id", "label"))
    assert(spark.table(qt).orderBy("id").collect().toSeq ==
      Seq(Row(1L, "a"), Row(2L, "b")))
    // renamed column accepts inserts under its new name
    spark.sql(s"INSERT INTO $qt VALUES (3, 'c')")
    assert(spark.table(qt).count() == 3)
  }

  test("ALTER COLUMN TYPE: widening cast rewrites the data in place") {
    val (qt, _) = freshTable()
    spark.sql(s"ALTER TABLE $qt ALTER COLUMN v TYPE STRING")
    val vs = spark.table(qt).orderBy("id").collect().map(_.getString(1)).toSeq
    assert(vs == Seq("1.5", "2.5"), s"cast-preserved values, got $vs")
    // store metadata reflects the new ClickHouse type
    val client = new EmbeddedClickHouse(root)
    assert(client.fetchColumns("main", qt.split('.').last).toMap.apply("v")
      .contains("String"))
  }

  test("one multi-change ALTER applies in declaration order " +
    "(rename then add under the old name)") {
    val (qt, bare) = freshTable()
    val cat = spark.sessionState.catalogManager.catalog("chalter")
      .asInstanceOf[graft.catalog.ClickHouseCatalog]
    import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
    cat.alterTable(Identifier.of(Array("main"), bare),
      TableChange.renameColumn(Array("v"), "v_old"),
      TableChange.addColumn(Array("v"), org.apache.spark.sql.types.LongType, false))
    val sch = spark.table(qt).schema
    assert(sch.fieldNames.toSeq == Seq("id", "v_old", "tag", "v"))
    val r = spark.table(qt).orderBy("id").collect()
    assert(r.map(_.getDouble(1)).toSeq == Seq(1.5, 2.5), "renamed keeps data")
    assert(r.map(_.getLong(3)).toSeq == Seq(0L, 0L), "new v defaults to 0")
  }

  test("honored-or-rejected: key-column DDL, NULL narrowing, composite " +
    "defaults, positions all error loudly") {
    val (qt, bare) = freshTable()
    // order_by key column: drop / rename / retype all reject
    val e1 = intercept[Exception](spark.sql(s"ALTER TABLE $qt DROP COLUMN id"))
    assert(e1.getMessage.contains("key column"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql(s"ALTER TABLE $qt RENAME COLUMN id TO id2"))
    assert(e2.getMessage.contains("key column"), e2.getMessage)
    // Nullable column with NULLs cannot narrow to non-Nullable
    spark.sql(s"ALTER TABLE $qt ADD COLUMN maybe BIGINT")
    val cat = spark.sessionState.catalogManager.catalog("chalter")
      .asInstanceOf[graft.catalog.ClickHouseCatalog]
    import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
    val e3 = intercept[Exception](
      cat.alterTable(Identifier.of(Array("main"), bare),
        TableChange.updateColumnNullability(Array("maybe"), false)))
    assert(e3.getMessage.contains("NULL value"), e3.getMessage)
    // non-Nullable Tuple has no default the store can invent
    val e4 = intercept[Exception](
      spark.sql(s"ALTER TABLE $qt ADD COLUMN pt STRUCT<x: BIGINT> NOT NULL"))
    assert(e4.getMessage.contains("Nullable"), e4.getMessage)
    // unknown column errors, table unharmed
    intercept[Exception](spark.sql(s"ALTER TABLE $qt DROP COLUMN nope"))
    assert(spark.table(qt).count() == 2)
  }

  test("pushdown works against the EVOLVED schema: filters on renamed " +
    "columns and aggregates over added columns ship remotely") {
    val (qt, _) = freshTable()
    spark.sql(s"ALTER TABLE $qt RENAME COLUMN v TO score")
    spark.sql(s"ALTER TABLE $qt ADD COLUMN w BIGINT NOT NULL")
    spark.sql(s"INSERT INTO $qt VALUES (3, 9.5, 'c', 4), (4, 0.5, 'd', 6)")
    val df = spark.table(qt).where("score > 1.0")
      .agg(org.apache.spark.sql.functions.sum("w").as("sw"))
    assert(df.collect().head.getLong(0) == 4L) // rows 1,2 default w=0; row 3 w=4
    val scans = PlanAsserts.flatten(df.queryExecution.executedPlan).collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.description()
    }
    assert(scans.nonEmpty)
    assert(scans.head.contains("`score` > 1.0") || scans.head.contains("`score` >"),
      s"filter must push on the RENAMED column: ${scans.head}")
    assert(scans.head.toLowerCase.contains("sum(`w`)"),
      s"aggregate must push on the ADDED column: ${scans.head}")
  }

  test("RENAME TABLE moves data and metadata; old name is gone") {
    val (qt, bare) = freshTable()
    spark.sql(s"ALTER TABLE $qt RENAME TO main.${bare}_renamed")
    assert(spark.table(s"chalter.main.${bare}_renamed").count() == 2)
    intercept[AnalysisException](spark.table(qt).collect())
    // target-exists rejects
    val (qt2, bare2) = freshTable()
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $qt2 RENAME TO main.${bare}_renamed"))
    assert(e.getMessage.toLowerCase.contains("exists"), e.getMessage)
  }

  test("ADD COLUMN FIRST / AFTER place the column exactly where " +
    "ClickHouse would, embedded and HTTP alike") {
    val (qt, bare) = freshTable()
    spark.sql(s"ALTER TABLE $qt ADD COLUMN early BIGINT NOT NULL FIRST")
    spark.sql(s"ALTER TABLE $qt ADD COLUMN mid STRING AFTER id")
    assert(spark.table(qt).schema.fieldNames.toSeq ==
      Seq("early", "id", "mid", "v", "tag"))
    val r = spark.table(qt).orderBy("id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(0L, 0L), "FIRST column defaults")
    assert(r.forall(_.isNullAt(2)), "AFTER column defaults NULL")
    // positional insert follows the evolved order
    spark.sql(s"INSERT INTO $qt VALUES (7, 3, 'm', 3.5, 'c')")
    assert(spark.table(qt).where("id = 3").collect().head.getLong(0) == 7L)
    // HTTP ships the position clauses verbatim
    val server = new graft.client.MockClickHouseHttp
    try {
      val http = new graft.client.HttpClickHouseClient(server.endpoint)
      http.createTable("main", "pos_http",
        Seq("a" -> "Int64", "b" -> "Int64"), Map("engine" -> "MergeTree"))
      http.alterTable("main", "pos_http", Seq(
        ChAlterOp.AddColumn("z", "Int64", Some(None)),
        ChAlterOp.AddColumn("m", "Int64", Some(Some("a")))))
      import scala.jdk.CollectionConverters._
      val alter = server.statements.asScala.find(_.startsWith("ALTER TABLE")).get
      assert(alter.contains("ADD COLUMN `z` Int64 FIRST") &&
        alter.contains("ADD COLUMN `m` Int64 AFTER `a`"), alter)
      assert(http.fetchColumns("main", "pos_http").map(_._1) ==
        Seq("z", "a", "m", "b"))
    } finally server.close()
  }

  test("ALTER invalidates cached plans: a cached DataFrame does not " +
    "pin the pre-evolution data") {
    val (qt, _) = freshTable()
    val cached = spark.table(qt)
    cached.cache()
    assert(cached.count() == 2)
    spark.sql(s"ALTER TABLE $qt RENAME COLUMN v TO score")
    // fresh read resolves the evolved schema and the rewritten parts
    val r = spark.table(qt).orderBy("id").collect()
    assert(spark.table(qt).schema.fieldNames.contains("score"))
    assert(r.map(_.getDouble(1)).toSeq == Seq(1.5, 2.5))
    cached.unpersist()
  }

  test("ALTER on an EMPTY table evolves the schema; the first insert " +
    "lands under the new shape") {
    val (qt, _) = freshTable()
    spark.sql(s"DELETE FROM $qt WHERE true")
    assert(spark.table(qt).count() == 0)
    spark.sql(s"ALTER TABLE $qt ADD COLUMN extra BIGINT NOT NULL")
    spark.sql(s"ALTER TABLE $qt DROP COLUMN v")
    assert(spark.table(qt).schema.fieldNames.toSeq == Seq("id", "tag", "extra"))
    spark.sql(s"INSERT INTO $qt VALUES (10, 'z', 42)")
    assert(spark.table(qt).collect().toSeq == Seq(Row(10L, "z", 42L)))
  }

  test("embedded client: ALTER on a table with attached external parquet " +
    "is rejected (read-only data)") {
    val client = new EmbeddedClickHouse(root)
    client.createDatabase("main")
    val dir = Files.createTempDirectory("alter_ext_").toString
    spark.range(3).toDF("id").write.mode("overwrite").parquet(dir)
    client.createTable("main", "evo_ext", Seq("id" -> "Int64"),
      Map("engine" -> "MergeTree"))
    client.attachExternal("main", "evo_ext", Seq(s"$dir/*.parquet"))
    val e = intercept[IllegalArgumentException](
      client.alterTable("main", "evo_ext",
        Seq(ChAlterOp.AddColumn("x", "Nullable(Int64)"))))
    assert(e.getMessage.contains("external"), e.getMessage)
  }

  test("HTTP transport: ALTER ships ONE ordered DDL statement and " +
    "invalidates the insert-encoder type cache") {
    val server = new graft.client.MockClickHouseHttp
    try {
      val http = new graft.client.HttpClickHouseClient(server.endpoint)
      http.createTable("main", "evo_http",
        Seq("id" -> "Int64", "v" -> "Int32"), Map("engine" -> "MergeTree"))
      import org.apache.spark.sql.types._
      val s32 = StructType(Seq(
        StructField("id", LongType, false), StructField("v", IntegerType, false)))
      // prime the encoder cache with the Int32 width
      http.insert("main", "evo_http", s32, Seq(Row(1L, 10)))
      http.alterTable("main", "evo_http", Seq(
        ChAlterOp.ModifyType("v", "Int64"),
        ChAlterOp.AddColumn("w", "Nullable(String)"),
        ChAlterOp.RenameColumn("w", "note")))
      import scala.jdk.CollectionConverters._
      val alters = server.statements.asScala.filter(_.startsWith("ALTER TABLE"))
      assert(alters.size == 1, s"one statement, got: $alters")
      assert(alters.head ==
        "ALTER TABLE `main`.`evo_http` MODIFY COLUMN `v` Int64, " +
          "ADD COLUMN `w` Nullable(String), RENAME COLUMN `w` TO `note`",
        alters.head)
      assert(http.fetchColumns("main", "evo_http") ==
        Seq("id" -> "Int64", "v" -> "Int64", "note" -> "Nullable(String)"))
      // post-ALTER inserts must encode v at the NEW width — a stale cached
      // encoder would write 4 bytes where the server decodes 8
      val before = server.rowsReceived.get()
      val s64 = StructType(Seq(
        StructField("id", LongType, false), StructField("v", LongType, false),
        StructField("note", StringType, true)))
      http.insert("main", "evo_http", s64, Seq(Row(2L, 20L, "x"), Row(3L, 30L, null)))
      assert(server.rowsReceived.get() - before == 2,
        "server must decode exactly 2 rows at the post-ALTER widths")
      // RENAME TABLE moves the server-side metadata
      http.renameTable("main", "evo_http", "main", "evo_http2")
      assert(!http.tableExists("main", "evo_http"))
      assert(http.tableExists("main", "evo_http2"))
    } finally server.close()
  }

  test("replica-set catalogs broadcast ALTER and RENAME to every replica " +
    "(schema objects are per-replica state, the ON CLUSTER analog)") {
    val p = new graft.client.MockClickHouseHttp
    val s = new graft.client.MockClickHouseHttp
    try {
      val client = new graft.client.FailoverClickHouseClient(IndexedSeq(
        new graft.client.HttpClickHouseClient(p.endpoint),
        new graft.client.HttpClickHouseClient(s.endpoint)))
      client.createTable("main", "evo_rep",
        Seq("id" -> "Int64"), Map("engine" -> "MergeTree"))
      client.alterTable("main", "evo_rep",
        Seq(ChAlterOp.AddColumn("x", "Nullable(Int64)")))
      client.renameTable("main", "evo_rep", "main", "evo_rep2")
      import scala.jdk.CollectionConverters._
      for ((m, tag) <- Seq(p -> "primary", s -> "survivor")) {
        val qs = m.statements.asScala.toSeq
        assert(qs.exists(_.contains("ADD COLUMN `x`")), s"$tag ALTER")
        assert(qs.exists(_.startsWith("RENAME TABLE")), s"$tag RENAME")
      }
      assert(client.tableExists("main", "evo_rep2"))
    } finally { p.close(); s.close() }
  }

  test("sharded catalogs broadcast ALTER to every shard; DDL on the " +
    "shard_by routing column is rejected") {
    val m1 = new graft.client.MockClickHouseHttp
    val m2 = new graft.client.MockClickHouseHttp
    try {
      spark.conf.set("spark.sql.catalog.chaltsh",
        classOf[graft.catalog.ClickHouseCatalog].getName)
      spark.conf.set("spark.sql.catalog.chaltsh.endpoint",
        s"${m1.endpoint},${m2.endpoint}")
      spark.conf.set("spark.sql.catalog.chaltsh.shard_by", "id")
      spark.sql(
        """CREATE TABLE chaltsh.main.evo_sh (id BIGINT, v BIGINT)
          |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'id')""".stripMargin)
      spark.sql("ALTER TABLE chaltsh.main.evo_sh ADD COLUMN note STRING")
      import scala.jdk.CollectionConverters._
      for ((m, tag) <- Seq(m1 -> "shard0", m2 -> "shard1"))
        assert(m.statements.asScala.exists(q =>
          q.startsWith("ALTER TABLE") && q.contains("ADD COLUMN `note`")),
          s"$tag must receive the broadcast ALTER")
      val e = intercept[Exception](
        spark.sql("ALTER TABLE chaltsh.main.evo_sh RENAME COLUMN id TO id2"))
      assert(e.getMessage.contains("shard_by"), e.getMessage)
      // the routing guard lives in the CLIENT, so the fluent/raw client
      // surface cannot bypass it either
      val eClient = intercept[IllegalArgumentException](
        graft.connector.ChMutations.clientOf(spark, "chaltsh")
          .alterTable("main", "evo_sh",
            Seq(ChAlterOp.ModifyType("id", "Int32"))))
      assert(eClient.getMessage.contains("shard_by"), eClient.getMessage)
      // OPTIMIZE broadcasts per shard (each shard merges its own parts)
      graft.connector.ChMutations.clientOf(spark, "chaltsh")
        .optimizeTable("main", "evo_sh", finalize = false)
      for ((m, tag) <- Seq(m1 -> "shard0", m2 -> "shard1"))
        assert(m.statements.asScala.exists(_.startsWith("OPTIMIZE TABLE")),
          s"$tag must receive the OPTIMIZE broadcast")
    } finally { m1.close(); m2.close() }
  }

  test("the split_by ORDER-BY-head scale warning probes system.tables " +
    "once per table, not once per scan planning") {
    val r1 = new graft.client.MockClickHouseHttp
    val r2 = new graft.client.MockClickHouseHttp
    r1.wireReadRows = 10; r2.wireReadRows = 10
    try {
      spark.conf.set("spark.sql.catalog.chohm",
        classOf[graft.catalog.ClickHouseCatalog].getName)
      spark.conf.set("spark.sql.catalog.chohm.endpoint",
        s"${r1.endpoint}|${r2.endpoint}")
      spark.conf.set("spark.sql.catalog.chohm.read.streams", "1")
      import scala.jdk.CollectionConverters._
      def headProbes(): Int =
        (r1.statements.asScala ++ r2.statements.asScala)
          .count(_.startsWith("SELECT engine, sorting_key"))
      def scanOnce(): Unit =
        assert(spark.read.option("split_by", "id")
          .table("chohm.bench.wire_read").collect().length == 10)
      scanOnce()
      val after1 = headProbes()
      assert(after1 >= 1, "the warning path must actually probe once")
      scanOnce(); scanOnce()
      assert(headProbes() == after1,
        s"order_by-head probe must be memoized per (client, table): " +
          s"$after1 then ${headProbes()}")
    } finally { r1.close(); r2.close() }
  }

  test("plain scans report an exact remote row count to the planner; " +
    "filters/aggregates withhold it (unknown selectivity)") {
    val (qt, _) = freshTable() // 2 rows
    def rowStat(df: org.apache.spark.sql.DataFrame): Option[BigInt] =
      df.queryExecution.optimizedPlan.stats.rowCount
    assert(rowStat(spark.table(qt)).contains(BigInt(2)),
      s"plain scan must report system.parts rows, got ${rowStat(spark.table(qt))}")
    assert(rowStat(spark.table(qt).limit(1)).contains(BigInt(1)),
      "pushed LIMIT re-arithmetics the exact count")
    assert(rowStat(spark.table(qt).where("id = 1")).isEmpty ||
      rowStat(spark.table(qt).where("id = 1")).exists(_ <= 2),
      "pushed WHERE must not claim the unfiltered count")
    // client-level: all four transports answer (embedded via footers)
    val client = new EmbeddedClickHouse(root)
    assert(client.tableRowCount("main", qt.split('.').last).contains(2L))
  }

  test("TTL lifecycle: SET TBLPROPERTIES('ttl') ships MODIFY TTL, UNSET " +
    "ships REMOVE TTL; other property changes reject; DESCRIBE surfaces " +
    "engine options") {
    val (qt, bare) = freshTable()
    val ttlExpr = "toDateTime64(id, 3) + INTERVAL 100 DAY"
    spark.sql(s"ALTER TABLE $qt SET TBLPROPERTIES ('ttl' = '$ttlExpr')")
    val client = new EmbeddedClickHouse(root)
    assert(client.fetchTableOptions("main", bare).get("ttl").contains(ttlExpr))
    // the properties surface shows engine options (order_by from CREATE)
    val props = spark.sql(s"SHOW TBLPROPERTIES $qt").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("ttl").contains(ttlExpr), props)
    assert(props.get("order_by").contains("id"), props)
    // a non-temporal TTL is rejected at DDL time, like the server
    val badTtl = intercept[Exception](
      spark.sql(s"ALTER TABLE $qt SET TBLPROPERTIES ('ttl' = 'id + 100')"))
    assert(badTtl.getMessage.contains("Date or DateTime"), badTtl.getMessage)
    spark.sql(s"ALTER TABLE $qt UNSET TBLPROPERTIES ('ttl')")
    assert(!client.fetchTableOptions("main", bare).contains("ttl"))
    // TTL change is metadata-only: data untouched
    assert(spark.table(qt).count() == 2)
    // arbitrary property changes have no remote counterpart
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $qt SET TBLPROPERTIES ('engine' = 'Log')"))
    assert(e.getMessage.contains("no"), e.getMessage)
    // HTTP wire shape
    val server = new graft.client.MockClickHouseHttp
    try {
      val http = new graft.client.HttpClickHouseClient(server.endpoint)
      http.createTable("main", "ttl_http",
        Seq("id" -> "Int64"), Map("engine" -> "MergeTree"))
      http.alterTable("main", "ttl_http", Seq(ChAlterOp.ModifyTtl(Some("id + 5"))))
      http.alterTable("main", "ttl_http", Seq(ChAlterOp.ModifyTtl(None)))
      import scala.jdk.CollectionConverters._
      val qs = server.statements.asScala.toSeq
      assert(qs.contains("ALTER TABLE `main`.`ttl_http` MODIFY TTL id + 5"), qs)
      assert(qs.contains("ALTER TABLE `main`.`ttl_http` REMOVE TTL"), qs)
    } finally server.close()
  }

  test("row TTL is applied at OPTIMIZE (merge-time expiry): expired rows " +
    "drop, fresh and NULL-TTL rows stay; plain reads keep expired rows " +
    "until the merge") {
    val client = new EmbeddedClickHouse(root)
    client.createDatabase("main")
    client.createTable("main", "ttl_rows",
      Seq("id" -> "Int64", "ts" -> "Nullable(DateTime64(3))"),
      Map("engine" -> "MergeTree", "order_by" -> "id",
        "ttl" -> "ts + INTERVAL 1 DAY"))
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(
      StructField("id", LongType, false),
      StructField("ts", TimestampType, true)))
    def t(deltaMs: Long) =
      new java.sql.Timestamp(System.currentTimeMillis() + deltaMs)
    client.insert("main", "ttl_rows", sch, Seq(
      Row(1L, t(-10L * 86400 * 1000)), // expired 9 days ago
      Row(2L, t(0L)),                  // expires in 1 day → stays
      Row(3L, null)))                  // NULL TTL keeps the row
    // expired rows stay visible until a merge, like a server
    assert(client.query("SELECT count(*) AS n FROM `main`.`ttl_rows`", 1)
      ._2.flatten.head.getLong(0) == 3L)
    client.optimizeTable("main", "ttl_rows", finalize = false)
    val ids = client.query("SELECT id FROM `main`.`ttl_rows`", 1)
      ._2.flatten.map(_.getLong(0)).sorted
    assert(ids == Seq(2L, 3L), s"expected 1 expired: $ids")
    // non-temporal TTL at CREATE rejects too (same validation as ALTER)
    val e = intercept[Exception](client.createTable("main", "ttl_bad",
      Seq("id" -> "Int64"), Map("engine" -> "MergeTree", "ttl" -> "id * 2")))
    assert(e.getMessage.contains("Date or DateTime"), e.getMessage)
  }

  test("OPTIMIZE TABLE FINAL materializes ReplacingMergeTree dedup and " +
    "consolidates parts; plain engines just consolidate") {
    val client = new EmbeddedClickHouse(root)
    client.createDatabase("main")
    client.createTable("main", "opt_rep",
      Seq("k" -> "Int64", "ver" -> "Int64", "v" -> "String"),
      Map("engine" -> "ReplacingMergeTree(ver)", "order_by" -> "k"))
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(
      StructField("k", LongType, false), StructField("ver", LongType, false),
      StructField("v", StringType, false)))
    // three inserts → three parts, keys overlap across parts
    client.insert("main", "opt_rep", sch, Seq(Row(1L, 1L, "a1"), Row(2L, 1L, "b1")))
    client.insert("main", "opt_rep", sch, Seq(Row(1L, 3L, "a3"), Row(3L, 1L, "c1")))
    client.insert("main", "opt_rep", sch, Seq(Row(2L, 2L, "b2")))
    // plain read sees all 5 physical rows before the merge
    assert(client.query("SELECT count(*) AS n FROM `main`.`opt_rep`", 1)
      ._2.flatten.head.getLong(0) == 5L)
    client.optimizeTable("main", "opt_rep", finalize = true)
    // dedup is now MATERIALIZED: plain reads see the survivors
    val got = client.query(
      "SELECT `k`, `v` FROM `main`.`opt_rep` ORDER BY `k`", 1)._2.flatten
      .map(r => r.getLong(0) -> r.getString(1))
    assert(got == Seq(1L -> "a3", 2L -> "b2", 3L -> "c1"), got)
    // and parts consolidated to one file
    val dir = new java.io.File(s"$root/main/opt_rep")
    val parts = dir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts == 1, s"one merged part, got $parts")

    // plain MergeTree: OPTIMIZE (even FINAL) keeps every row
    client.createTable("main", "opt_plain",
      Seq("k" -> "Int64"), Map("engine" -> "MergeTree", "order_by" -> "k"))
    val s1 = StructType(Seq(StructField("k", LongType, false)))
    client.insert("main", "opt_plain", s1, Seq(Row(1L), Row(1L)))
    client.insert("main", "opt_plain", s1, Seq(Row(2L)))
    client.optimizeTable("main", "opt_plain", finalize = true)
    assert(client.query("SELECT count(*) AS n FROM `main`.`opt_plain`", 1)
      ._2.flatten.head.getLong(0) == 3L)
    client.dropTable("main", "opt_rep"); client.dropTable("main", "opt_plain")
  }

  test("OPTIMIZE ships the statement on HTTP and pins to the PRIMARY on " +
    "replica sets (merges replicate server-side)") {
    val p = new graft.client.MockClickHouseHttp
    val s = new graft.client.MockClickHouseHttp
    try {
      val fo = new graft.client.FailoverClickHouseClient(IndexedSeq(
        new graft.client.HttpClickHouseClient(p.endpoint),
        new graft.client.HttpClickHouseClient(s.endpoint)))
      fo.createTable("main", "opt_http",
        Seq("id" -> "Int64"), Map("engine" -> "MergeTree"))
      fo.optimizeTable("main", "opt_http", finalize = true)
      import scala.jdk.CollectionConverters._
      assert(p.statements.asScala.exists(
        _ == "OPTIMIZE TABLE `main`.`opt_http` FINAL"),
        p.statements.asScala.filter(_.startsWith("OPTIMIZE")).toSeq)
      assert(!s.statements.asScala.exists(_.startsWith("OPTIMIZE")),
        "OPTIMIZE must not broadcast to replicas")
    } finally { p.close(); s.close() }
  }

  test("ATTACH PARTITION FROM clones every part without firing MVs; " +
    "same-structure and same-key rules are honored-or-rejected") {
    val (qtSrc, src) = freshTable() // 2 rows over 1 insert
    spark.sql(s"INSERT INTO $qtSrc VALUES (3, 3.5, 'c')") // second part
    n += 1
    val dst = s"att_dst_$n"
    spark.sql(
      s"""CREATE TABLE chalter.main.$dst (id BIGINT, v DOUBLE, tag STRING)
         |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'id')""".stripMargin)
    // an MV on the destination must NOT fire on attach (not an INSERT)
    spark.sql(
      s"""CREATE TABLE chalter.main.${dst}_agg (tag STRING, cnt BIGINT)
         |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'tag')""".stripMargin)
    val client = new EmbeddedClickHouse(root)
    client.createMaterializedView("main", s"${dst}_mv", "main", s"${dst}_agg",
      s"SELECT tag, count(*) AS cnt FROM main.$dst GROUP BY tag")
    client.attachPartitionsFrom("main", dst, "main", src)
    graft.connector.ChMutations.refresh(spark, s"chalter.main.$dst")
    assert(spark.table(s"chalter.main.$dst").orderBy("id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(spark.table(qtSrc).count() == 3, "ATTACH FROM copies, source keeps data")
    assert(spark.table(s"chalter.main.${dst}_agg").count() == 0,
      "attach is not an insert — the view must not fire")
    // structure mismatch rejects
    n += 1
    spark.sql(
      s"""CREATE TABLE chalter.main.att_bad_$n (id BIGINT, v DOUBLE)
         |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'id')""".stripMargin)
    val e1 = intercept[Exception](
      client.attachPartitionsFrom("main", s"att_bad_$n", "main", src))
    assert(e1.getMessage.contains("structure"), e1.getMessage)
    // key-layout mismatch rejects
    n += 1
    spark.sql(
      s"""CREATE TABLE chalter.main.att_key_$n (id BIGINT, v DOUBLE, tag STRING)
         |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'tag')""".stripMargin)
    val e2 = intercept[Exception](
      client.attachPartitionsFrom("main", s"att_key_$n", "main", src))
    assert(e2.getMessage.contains("order_by"), e2.getMessage)
  }

  test("HTTP ATTACH PARTITION FROM ships one per-partition ALTER (ID " +
    "form); failover pins to the primary like all data changes") {
    val p = new graft.client.MockClickHouseHttp
    val s = new graft.client.MockClickHouseHttp
    try {
      val fo = new graft.client.FailoverClickHouseClient(IndexedSeq(
        new graft.client.HttpClickHouseClient(p.endpoint),
        new graft.client.HttpClickHouseClient(s.endpoint)))
      fo.createTable("main", "att_a", Seq("id" -> "Int64"),
        Map("engine" -> "MergeTree"))
      fo.createTable("main", "att_b", Seq("id" -> "Int64"),
        Map("engine" -> "MergeTree"))
      fo.attachPartitionsFrom("main", "att_b", "main", "att_a")
      import scala.jdk.CollectionConverters._
      assert(p.statements.asScala.exists(
        _ == "ALTER TABLE `main`.`att_b` ATTACH PARTITION ID 'all' " +
          "FROM `main`.`att_a`"),
        p.statements.asScala.filter(_.contains("ATTACH")).toSeq)
      assert(!s.statements.asScala.exists(_.contains("ATTACH PARTITION")),
        "attach must pin to the primary")
    } finally { p.close(); s.close() }
  }

  test("ALTER on a CollapsingMergeTree table keeps the insertion-order " +
    "collapse defined: the mutation's rewritten part re-stamps its " +
    "sequence at publish and FINAL still collapses correctly") {
    n += 1
    val t = s"cc_alter_$n"
    spark // embedded mutations need an active session (suite lazy init)
    val client = new EmbeddedClickHouse(root)
    client.createTable("main", t, Seq(
      "id" -> "Int64", "sign" -> "Int8", "v" -> "Int64"),
      Map("engine" -> "CollapsingMergeTree(sign)", "order_by" -> "id"))
    val sch = client.sparkSchema("main", t)
    import org.apache.spark.sql.Row
    client.insert("main", t, sch, Seq(Row(1L, 1.toByte, 10L)))
    client.insert("main", t, sch, Seq(
      Row(1L, (-1).toByte, 10L), Row(1L, 1.toByte, 20L),
      Row(2L, 1.toByte, 7L)))
    // ADD COLUMN rewrites every part (embedded materialization) — the
    // published rewrite must carry fresh sequences in staged order
    client.alterTable("main", t,
      Seq(graft.client.ChAlterOp.AddColumn("w", "Nullable(Int64)")))
    val fin = client.query(
      s"SELECT `id`, `v` FROM `main`.`$t` FINAL", 1)._2.flatten
      .map(row => (row.getLong(0), row.getLong(1))).sortBy(_._1)
    assert(fin == Seq((1L, 20L), (2L, 7L)), fin.toString)
    // and a post-ALTER cancel still collapses against the rewritten part
    val sch2 = client.sparkSchema("main", t)
    client.insert("main", t, sch2, Seq(Row(1L, (-1).toByte, 20L, null)))
    val fin2 = client.query(
      s"SELECT `id`, `v` FROM `main`.`$t` FINAL", 1)._2.flatten
      .map(row => (row.getLong(0), row.getLong(1)))
    assert(fin2 == Seq((2L, 7L)), fin2.toString)
  }

  test("EXCHANGE TABLES swaps atomically (blue/green publish); views " +
    "and missing tables reject") {
    n += 1
    val (blue, green) = (s"ex_blue_$n", s"ex_green_$n")
    val client = new EmbeddedClickHouse(root)
    for ((t, v) <- Seq(blue -> 1L, green -> 2L)) {
      spark.sql(
        s"""CREATE TABLE chalter.main.$t (id BIGINT, v BIGINT)
           |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'id')""".stripMargin)
      spark.sql(s"INSERT INTO chalter.main.$t VALUES (1, $v)")
    }
    client.exchangeTables("main", blue, "main", green)
    graft.connector.ChMutations.refresh(spark, s"chalter.main.$blue")
    graft.connector.ChMutations.refresh(spark, s"chalter.main.$green")
    assert(spark.table(s"chalter.main.$blue").head.getLong(1) == 2L)
    assert(spark.table(s"chalter.main.$green").head.getLong(1) == 1L)
    // a second exchange swaps BACK (documented non-idempotence)
    client.exchangeTables("main", blue, "main", green)
    graft.connector.ChMutations.refresh(spark, s"chalter.main.$blue")
    assert(spark.table(s"chalter.main.$blue").head.getLong(1) == 1L)
    intercept[Exception](client.exchangeTables("main", blue, "main", "nope"))
    // an MV cannot be exchanged: a view is not a table
    spark.sql(
      s"""CREATE TABLE chalter.main.ex_tgt_$n (v BIGINT)
         |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'v')""".stripMargin)
    client.createMaterializedView("main", s"ex_mv_$n", "main", s"ex_tgt_$n",
      s"SELECT v FROM main.$blue")
    val e = intercept[Exception](
      client.exchangeTables("main", s"ex_mv_$n", "main", green))
    assert(e.getMessage.contains("no such table"), e.getMessage)
  }

  test("DROP PARTITION deletes exactly one partition's rows; tables " +
    "without partition_by reject; HTTP ships the ALTER") {
    n += 1
    val t = s"dp_$n"
    val client = new EmbeddedClickHouse(root)
    client.createTable("main", t,
      Seq("id" -> "Int64", "month" -> "String", "v" -> "Int64"),
      Map("engine" -> "MergeTree", "order_by" -> "id",
        "partition_by" -> "month"))
    val sch = client.sparkSchema("main", t)
    client.insert("main", t, sch, Seq(
      Row(1L, "2024-01", 10L), Row(2L, "2024-01", 20L),
      Row(3L, "2024-02", 30L)))
    client.dropPartition("main", t, "'2024-01'")
    graft.connector.ChMutations.refresh(spark, s"chalter.main.$t")
    val left = spark.table(s"chalter.main.$t").collect()
    assert(left.length == 1 && left.head.getString(1) == "2024-02")
    // no partition_by → honored-or-rejected
    val (qt2, bare2) = freshTable()
    val e = intercept[Exception](client.dropPartition("main", bare2, "'x'"))
    assert(e.getMessage.contains("partition_by"), e.getMessage + qt2)
    // HTTP wire shape
    val m = new graft.client.MockClickHouseHttp
    try {
      val http = new graft.client.HttpClickHouseClient(m.endpoint)
      http.createTable("main", "dp_http", Seq("id" -> "Int64"),
        Map("engine" -> "MergeTree", "partition_by" -> "id"))
      http.dropPartition("main", "dp_http", "7")
      import scala.jdk.CollectionConverters._
      assert(m.statements.asScala.exists(
        _ == "ALTER TABLE `main`.`dp_http` DROP PARTITION 7"),
        m.statements.asScala.filter(_.contains("DROP PARTITION")).toSeq)
    } finally m.close()
  }

  test("TRUNCATE TABLE clears rows metadata-speed, keeps the table and " +
    "its schema; external attachments reject; HTTP ships the statement") {
    val (qt, bare) = freshTable()
    val client = new EmbeddedClickHouse(root)
    assert(spark.table(qt).count() == 2)
    client.truncateTable("main", bare)
    graft.connector.ChMutations.refresh(spark, qt)
    assert(spark.table(qt).count() == 0)
    // table + schema survive; inserts land again
    spark.sql(s"INSERT INTO $qt VALUES (9, 9.5, 'z')")
    assert(spark.table(qt).count() == 1)
    intercept[Exception](client.truncateTable("main", "no_such_table"))
    val m = new graft.client.MockClickHouseHttp
    try {
      val http = new graft.client.HttpClickHouseClient(m.endpoint)
      http.createTable("main", "tr_http", Seq("id" -> "Int64"),
        Map("engine" -> "MergeTree"))
      http.truncateTable("main", "tr_http")
      import scala.jdk.CollectionConverters._
      assert(m.statements.asScala.exists(_ == "TRUNCATE TABLE `main`.`tr_http`"),
        m.statements.asScala.filter(_.contains("TRUNCATE")).toSeq)
    } finally m.close()
  }

  test("OPTIMIZE DEDUPLICATE drops full duplicates; BY columns keep the " +
    "lexicographically-smallest survivor; HTTP ships the statement") {
    n += 1
    val t = s"dd_$n"
    val client = new EmbeddedClickHouse(root)
    client.createTable("main", t,
      Seq("id" -> "Int64", "tag" -> "String", "v" -> "Int64"),
      Map("engine" -> "MergeTree", "order_by" -> "id"))
    val sch = client.sparkSchema("main", t)
    client.insert("main", t, sch, Seq(
      Row(1L, "a", 10L), Row(1L, "a", 10L), // full dup
      Row(2L, "b", 5L), Row(2L, "b", 7L)))  // same id, different v
    client.optimizeDeduplicate("main", t)
    graft.connector.ChMutations.refresh(spark, s"chalter.main.$t")
    assert(spark.table(s"chalter.main.$t").count() == 3,
      "full-row dedup keeps the id=2 pair apart")
    client.optimizeDeduplicate("main", t, Seq("id"))
    graft.connector.ChMutations.refresh(spark, s"chalter.main.$t")
    val rows = spark.table(s"chalter.main.$t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(rows == Seq((1L, 10L), (2L, 5L)),
      s"BY id keeps the smallest remaining row: $rows")
    intercept[Exception](client.optimizeDeduplicate("main", t, Seq("nope")))
    val m = new graft.client.MockClickHouseHttp
    try {
      val http = new graft.client.HttpClickHouseClient(m.endpoint)
      http.createTable("main", "dd_http", Seq("id" -> "Int64"),
        Map("engine" -> "MergeTree"))
      http.optimizeDeduplicate("main", "dd_http", Seq("id"))
      import scala.jdk.CollectionConverters._
      assert(m.statements.asScala.exists(
        _ == "OPTIMIZE TABLE `main`.`dd_http` FINAL DEDUPLICATE BY (`id`)"),
        m.statements.asScala.filter(_.contains("DEDUP")).toSeq)
    } finally m.close()
  }

  test("array and map ADD COLUMN defaults are typed empties") {
    val (qt, _) = freshTable()
    spark.sql(s"ALTER TABLE $qt ADD COLUMN xs ARRAY<BIGINT> NOT NULL")
    spark.sql(s"ALTER TABLE $qt ADD COLUMN kv MAP<STRING, BIGINT> NOT NULL")
    val r = spark.table(qt).orderBy("id").collect()
    assert(r.forall(_.getSeq[Long](3).isEmpty), "array default = []")
    assert(r.forall(_.getMap[String, Long](4).isEmpty), "map default = {}")
    spark.sql(s"INSERT INTO $qt VALUES (9, 9.5, 'z', array(1, 2), map('k', 3))")
    val added = spark.table(qt).where("id = 9").collect().head
    assert(added.getSeq[Long](3) == Seq(1L, 2L))
    assert(added.getMap[String, Long](4) == Map("k" -> 3L))
  }
}
