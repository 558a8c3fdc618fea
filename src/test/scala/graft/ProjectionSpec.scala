package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.client.{ChAlterOp, ChProjections, EmbeddedClickHouse}

/** Table PROJECTIONs (server surface: ALTER TABLE ADD/MATERIALIZE/DROP
  * PROJECTION; reads use matching projections transparently).
  *
  * The embedded model stores per-part pre-aggregated STATE dirs and
  * swaps matching reads onto them; the swap is proven by the hit
  * counter (results are identical either way — that equality is itself
  * asserted throughout), and every non-covered shape must fall back to
  * the base scan with correct results.
  */
class ProjectionSpec extends AnyFunSuite {

  private lazy val root = Files.createTempDirectory("graft_proj_").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .appName("projection-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.conf.set("spark.sql.catalog.chproj",
      classOf[graft.catalog.ClickHouseCatalog].getName)
    s.conf.set("spark.sql.catalog.chproj.path", root)
    s
  }

  private lazy val client = new EmbeddedClickHouse(root)

  private lazy val ch = graft.session.ClickHouseSession.builder(spark)
    .storePath(root).catalogName("chproj").build()

  private var n = 0
  private def freshTable(rows: Seq[(Long, String, Long)]): String = {
    n += 1
    val t = s"pt_$n"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chproj.main")
    spark.sql(
      s"""CREATE TABLE chproj.main.$t (id BIGINT, tag STRING, v BIGINT)
         |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'id')""".stripMargin)
    if (rows.nonEmpty)
      spark.sql(s"INSERT INTO chproj.main.$t VALUES " +
        rows.map { case (i, tg, v) => s"($i, '$tg', $v)" }.mkString(", "))
    t
  }

  private def hits(t: String, p: String): Long =
    client.projectionHitCount("main", t, p)

  private def agg(t: String): String =
    s"""SELECT `tag` AS tag, sum(`v`) AS s, count(*) AS c,
       |  min(`v`) AS mn, max(`v`) AS mx, avg(`v`) AS a
       |FROM `main`.`$t` GROUP BY tag ORDER BY tag""".stripMargin

  test("definition parsing: loud rejects for every unsupported shape") {
    def bad(sql: String): String =
      intercept[IllegalArgumentException](
        ChProjections.parseDef("p", sql)).getMessage
    assert(bad("SELECT tag ORDER BY tag").contains("AGGREGATE"))
    assert(bad("SELECT tag, sum(v) FROM t GROUP BY tag").contains("no FROM"))
    assert(bad("SELECT tag, uniqExact(v) GROUP BY tag")
      .contains("not re-mergeable"))
    assert(bad("SELECT tag, sum(DISTINCT v) GROUP BY tag")
      .contains("DISTINCT"))
    assert(bad("SELECT tag, v GROUP BY tag").contains("neither"))
    assert(bad("SELECT sum(v) GROUP BY ").contains("GROUP BY"))
    assert(bad("SELECT tag GROUP BY tag").contains("at least one aggregate"))
    // a good one parses with the expected state layout
    val d = ChProjections.parseDef("p",
      "SELECT tag, sum(v), count(*), avg(v) GROUP BY tag")
    assert(d.keys == Seq("tag"))
    assert(d.aggs.map(_.fn) == Seq("sum", "count", "avg"))
    assert(d.stateCols(2) == Seq("avs2", "avc2"))
  }

  test("ADD records for NEW parts; inserts build states; MATERIALIZE " +
    "backfills pre-existing parts; system.projections reports both") {
    val t = freshTable(Seq((1, "a", 10), (2, "b", 20))) // pre-ADD part
    client.alterTable("main", t, Seq(ChAlterOp.AddProjection("by_tag",
      "SELECT tag, sum(v), count(*), min(v), max(v), avg(v) GROUP BY tag")))
    // the pre-existing part is NOT covered: reads are correct but unswapped
    val before = hits(t, "by_tag")
    val r1 = ch.chSql(agg(t)).collect()
    assert(r1.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 10L), ("b", 20L)))
    assert(hits(t, "by_tag") == before, "uncovered part must fall back")
    // a new insert builds its own state dir; coverage still partial
    spark.sql(s"INSERT INTO chproj.main.$t VALUES (3, 'a', 5)")
    val sys1 = ch.chSql(
      s"SELECT `parts_built`, `parts_total` FROM `system`.`projections` " +
        s"WHERE `table` = '$t'").collect().head
    // the pre-ADD part(s) lack states, every post-ADD part has one
    assert(sys1.getLong(0) > 0L && sys1.getLong(0) < sys1.getLong(1),
      s"expected partial coverage, got ${sys1.getLong(0)}/${sys1.getLong(1)}")
    // MATERIALIZE backfills; now reads swap
    client.alterTable("main", t,
      Seq(ChAlterOp.MaterializeProjection("by_tag")))
    val r2 = ch.chSql(agg(t)).collect()
    assert(r2.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq ==
      Seq(("a", 15L, 2L, 5L, 10L, 7.5), ("b", 20L, 1L, 20L, 20L, 20.0)))
    assert(hits(t, "by_tag") == before + 1, "covered read must swap")
    val sys2 = ch.chSql(
      s"SELECT `parts_built`, `parts_total` FROM `system`.`projections` " +
        s"WHERE `table` = '$t'").collect().head
    assert(sys2.getLong(0) == sys2.getLong(1) && sys2.getLong(0) > 0L)
  }

  test("avg re-merges exactly across parts (global avg, not avg of " +
    "per-part avgs) and subset GROUP BY / global aggregates swap too") {
    val t = freshTable(Seq.empty)
    client.alterTable("main", t, Seq(ChAlterOp.AddProjection("p2",
      "SELECT tag, id, sum(v), count(*), avg(v) GROUP BY tag, id")))
    // two parts with skewed group sizes: avg(avg) would be wrong
    spark.sql(s"INSERT INTO chproj.main.$t VALUES (1, 'a', 0), (1, 'a', 0), (1, 'a', 0)")
    spark.sql(s"INSERT INTO chproj.main.$t VALUES (1, 'a', 12)")
    val h0 = hits(t, "p2")
    // subset GROUP BY (tag only, projection keyed by tag+id)
    val r = ch.chSql(
      s"SELECT `tag` AS tag, avg(`v`) AS a, sum(`v`) AS s " +
        s"FROM `main`.`$t` GROUP BY tag").collect()
    assert(r.map(x => (x.getString(0), x.getDouble(1), x.getLong(2))).toSeq ==
      Seq(("a", 3.0, 12L)), "global avg must be 12/4=3, never avg of avgs")
    assert(hits(t, "p2") == h0 + 1)
    // global aggregate (empty GROUP BY subset)
    val g = ch.chSql(
      s"SELECT sum(`v`) AS s, count(*) AS c FROM `main`.`$t`").collect().head
    assert(g.getLong(0) == 12L && g.getLong(1) == 4L)
    assert(hits(t, "p2") == h0 + 2)
    // WHERE on a key column still swaps; WHERE on a non-key falls back
    val w = ch.chSql(
      s"SELECT sum(`v`) AS s FROM `main`.`$t` WHERE `tag` = 'a' AND `id` = 1")
      .collect().head
    assert(w.getLong(0) == 12L)
    assert(hits(t, "p2") == h0 + 3)
    val nk = ch.chSql(
      s"SELECT sum(`v`) AS s FROM `main`.`$t` WHERE `v` > 0").collect().head
    assert(nk.getLong(0) == 12L)
    assert(hits(t, "p2") == h0 + 3, "non-key WHERE must fall back")
  }

  test("mutations and OPTIMIZE rebuild states; DROP PROJECTION removes " +
    "them; column DDL under a projection is guarded") {
    val t = freshTable(Seq((1, "a", 10), (2, "b", 20), (3, "b", 30)))
    client.alterTable("main", t, Seq(ChAlterOp.AddProjection("pm",
      "SELECT tag, sum(v), count(*) GROUP BY tag")))
    client.alterTable("main", t, Seq(ChAlterOp.MaterializeProjection("pm")))
    val h0 = hits(t, "pm")
    // a mutation rewrites parts — states must follow the rewrite
    graft.connector.ChMutations.updateWhere(spark, s"chproj.main.$t",
      Seq("v" -> "v + 1"), "tag = 'b'")
    val r1 = ch.chSql(
      s"SELECT `tag` AS tag, sum(`v`) AS s, count(*) AS c " +
        s"FROM `main`.`$t` GROUP BY tag ORDER BY tag").collect()
    assert(r1.map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq(("a", 10L, 1L), ("b", 52L, 2L)))
    assert(hits(t, "pm") == h0 + 1, "mutation-rewritten part must stay covered")
    // OPTIMIZE merges to one part — still covered
    client.optimizeTable("main", t, finalize = false)
    val r2 = ch.chSql(
      s"SELECT sum(`v`) AS s FROM `main`.`$t`").collect().head
    assert(r2.getLong(0) == 62L)
    assert(hits(t, "pm") == h0 + 2)
    // dropping a referenced column is refused while the projection exists
    val e = intercept[Exception](client.alterTable("main", t,
      Seq(ChAlterOp.DropColumn("v"))))
    assert(e.getMessage.contains("pm"))
    // DROP PROJECTION: meta + state dirs gone, reads fall back, correct
    client.alterTable("main", t, Seq(ChAlterOp.DropProjection("pm")))
    assert(client.listProjections("main", t).isEmpty)
    val r3 = ch.chSql(
      s"SELECT sum(`v`) AS s FROM `main`.`$t`").collect().head
    assert(r3.getLong(0) == 62L)
    assert(hits(t, "pm") == h0 + 2)
    // now the column drops fine
    client.alterTable("main", t, Seq(ChAlterOp.DropColumn("v")))
  }

  test("ADD-time validation: unresolvable expressions, Decimal sum/avg, " +
    "duplicate names, unknown DROP/MATERIALIZE reject loudly") {
    val t = freshTable(Seq((1, "a", 1)))
    def add(name: String, defSql: String): Unit =
      client.alterTable("main", t,
        Seq(ChAlterOp.AddProjection(name, defSql)))
    intercept[IllegalArgumentException](
      add("bad1", "SELECT nosuch, sum(v) GROUP BY nosuch"))
    intercept[IllegalArgumentException](
      add("bad2", "SELECT tag, sum(tag) GROUP BY tag")) // non-numeric sum
    add("ok", "SELECT tag, sum(v) GROUP BY tag")
    intercept[IllegalArgumentException](
      add("ok", "SELECT tag, sum(v) GROUP BY tag")) // duplicate
    intercept[IllegalArgumentException](client.alterTable("main", t,
      Seq(ChAlterOp.DropProjection("nosuch"))))
    intercept[IllegalArgumentException](client.alterTable("main", t,
      Seq(ChAlterOp.MaterializeProjection("nosuch"))))
    // Decimal sums change precision when re-merged — rejected at ADD
    spark.sql(
      s"""CREATE TABLE chproj.main.dec_t (k STRING, d DECIMAL(12, 2))
         |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'k')""".stripMargin)
    intercept[IllegalArgumentException](client.alterTable("main", "dec_t",
      Seq(ChAlterOp.AddProjection("pd", "SELECT k, sum(d) GROUP BY k"))))
  }

  test("SQL DDL on the extensions session: ALTER TABLE ADD / " +
    "MATERIALIZE / DROP PROJECTION route to client DDL") {
    val sqlRoot = Files.createTempDirectory("graft_projsql_").toString
    val ext = org.apache.spark.sql.classic.SparkSession.builder()
      .master(spark.sparkContext.master)
      .withExtensions(new GraftExtensions().apply(_))
      .create()
    ext.conf.set("spark.sql.shuffle.partitions", "4")
    ext.conf.set("spark.sql.session.timeZone", "UTC")
    ext.conf.set("spark.sql.catalog.chprojq",
      classOf[graft.catalog.ClickHouseCatalog].getName)
    ext.conf.set("spark.sql.catalog.chprojq.path", sqlRoot)
    ext.sql("CREATE NAMESPACE IF NOT EXISTS chprojq.main")
    ext.sql(
      """CREATE TABLE chprojq.main.s (id BIGINT, tag STRING, v BIGINT)
        |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'id')""".stripMargin)
    ext.sql("INSERT INTO chprojq.main.s VALUES (1, 'a', 5), (2, 'b', 7)")
    ext.sql("ALTER TABLE chprojq.main.s ADD PROJECTION by_tag " +
      "(SELECT tag, sum(v), count(*) GROUP BY tag)")
    val cl = new EmbeddedClickHouse(sqlRoot)
    assert(cl.listProjections("main", "s").map(_.name) == Seq("by_tag"))
    ext.sql("ALTER TABLE chprojq.main.s MATERIALIZE PROJECTION by_tag")
    val extCh = graft.session.ClickHouseSession.builder(ext)
      .storePath(sqlRoot).catalogName("chprojq").build()
    val h0 = cl.projectionHitCount("main", "s", "by_tag")
    val r = extCh.chSql("SELECT `tag` AS tag, sum(`v`) AS s FROM " +
      "`main`.`s` GROUP BY tag ORDER BY tag").collect()
    assert(r.map(x => (x.getString(0), x.getLong(1))).toSeq ==
      Seq(("a", 5L), ("b", 7L)))
    // the extensions session's rule pipeline may analyze the statement
    // more than once — at LEAST one swap proves the path
    assert(cl.projectionHitCount("main", "s", "by_tag") >= h0 + 1)
    ext.sql("ALTER TABLE chprojq.main.s DROP PROJECTION by_tag")
    assert(cl.listProjections("main", "s").isEmpty)
    // plain Spark ALTERs still parse on the extensions session
    ext.sql("ALTER TABLE chprojq.main.s ADD COLUMN note STRING")
    // NEVER ext.close(): sibling sessions share the JVM SparkContext —
    // closing one kills active-session state for every later suite
  }

  test("sharded catalogs: projection DDL fans out to every shard and " +
    "each shard's read swaps onto ITS OWN states") {
    val r1 = Files.createTempDirectory("graft_projsh1_").toString
    val r2 = Files.createTempDirectory("graft_projsh2_").toString
    spark.conf.set("spark.sql.catalog.chprojsh",
      classOf[graft.catalog.ClickHouseCatalog].getName)
    spark.conf.set("spark.sql.catalog.chprojsh.path", s"$r1,$r2")
    spark.conf.set("spark.sql.catalog.chprojsh.shard_by", "id")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chprojsh.main")
    spark.sql(
      """CREATE TABLE chprojsh.main.sp (id BIGINT, tag STRING, v BIGINT)
        |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'id')""".stripMargin)
    val c1 = new EmbeddedClickHouse(r1)
    val c2 = new EmbeddedClickHouse(r2)
    // DDL broadcasts: both shards carry the definition
    graft.connector.ChMutations.clientOf(spark, "chprojsh")
      .alterTable("main", "sp", Seq(ChAlterOp.AddProjection("pt",
        "SELECT tag, sum(v), count(*) GROUP BY tag")))
    assert(c1.listProjections("main", "sp").map(_.name) == Seq("pt"))
    assert(c2.listProjections("main", "sp").map(_.name) == Seq("pt"))
    // routed insert: every shard's slice builds its own states
    spark.sql("INSERT INTO chprojsh.main.sp VALUES " +
      (1 to 40).map(i => s"($i, 't${i % 3}', $i)").mkString(", "))
    val shCh = graft.session.ClickHouseSession.builder(spark)
      .storePath(s"$r1,$r2").catalogName("chprojsh").build()
    val h1 = c1.projectionHitCount("main", "sp", "pt")
    val h2 = c2.projectionHitCount("main", "sp", "pt")
    // raw passthrough over shards has UNION semantics (one row per
    // shard per group) — fold in Spark for the global answer
    val rows = shCh.chSql(
      "SELECT `tag` AS tag, sum(`v`) AS s, count(*) AS c " +
        "FROM `main`.`sp` GROUP BY tag")
      .groupBy("tag")
      .agg(org.apache.spark.sql.functions.sum("s").as("s"),
        org.apache.spark.sql.functions.sum("c").as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("t0", (3 to 39 by 3).sum.toLong, 13L),
      ("t1", (1 to 40 by 3).sum.toLong, 14L),
      ("t2", (2 to 38 by 3).sum.toLong, 13L)))
    // both shards hold data (routing spreads ids) and both swapped
    assert(c1.projectionHitCount("main", "sp", "pt") > h1,
      "shard 1 read must ride its projection")
    assert(c2.projectionHitCount("main", "sp", "pt") > h2,
      "shard 2 read must ride its projection")
  }

  test("swap-safety: plain key scans and aggregate tails fall back; " +
    "empty-match global count merges to 0, not NULL") {
    // two parts BOTH containing group 'a': the state view has one row
    // per (part, group) = 2 rows, the base 4 — any swap of a
    // non-aggregate read or a tail count(*) is detectably wrong
    val t = freshTable(Seq((1, "a", 1), (2, "a", 2)))
    spark.sql(s"INSERT INTO chproj.main.$t VALUES (3, 'a', 3), (4, 'a', 4)")
    client.alterTable("main", t, Seq(ChAlterOp.AddProjection("pg",
      "SELECT tag, sum(v), count(*) GROUP BY tag")))
    client.alterTable("main", t, Seq(ChAlterOp.MaterializeProjection("pg")))
    val h0 = hits(t, "pg")
    // 1) a bare key-column scan must return one row per BASE row
    val scan = ch.chSql(s"SELECT `tag` AS tag FROM `main`.`$t`").collect()
    assert(scan.length == 4, "key scan must not collapse to state rows")
    assert(hits(t, "pg") == h0, "non-aggregate query must never swap")
    // 2) HAVING count(*) counts BASE rows (4), not state rows (2)
    val hv = ch.chSql(
      s"SELECT `tag` AS tag, sum(`v`) AS s FROM `main`.`$t` " +
        "GROUP BY tag HAVING count(*) > 3").collect()
    assert(hv.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 10L)), "HAVING count(*) must filter on base-row counts")
    assert(hits(t, "pg") == h0, "aggregate-call tail must fall back")
    // ... and an ORDER BY with a call falls back too
    ch.chSql(s"SELECT `tag` AS tag, count(*) AS c FROM `main`.`$t` " +
      "GROUP BY tag ORDER BY count(*) LIMIT 1").collect()
    assert(hits(t, "pg") == h0)
    // 3) alias-only tails still ride the projection
    val al = ch.chSql(
      s"SELECT `tag` AS tag, sum(`v`) AS s, count(*) AS c FROM `main`.`$t` " +
        "GROUP BY tag HAVING s > 3 ORDER BY s DESC LIMIT 5").collect()
    assert(al.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("a", 10L, 4L)))
    assert(hits(t, "pg") == h0 + 1, "alias-only tail should swap")
    // 4) global count over an empty key match merges to 0, not NULL
    val z = ch.chSql(
      s"SELECT count(*) AS c FROM `main`.`$t` WHERE `tag` = 'zzz'")
      .collect().head
    assert(!z.isNullAt(0) && z.getLong(0) == 0L,
      "empty-match global count must be 0 after the state merge")
    assert(hits(t, "pg") == h0 + 2, "the empty-match count should still swap")
  }

  test("scan-aggregate pushdown over the catalog table rides the " +
    "projection too (the connector's generated SQL matches)") {
    val t = freshTable(Seq((1, "a", 10), (2, "b", 20), (3, "a", 30)))
    client.alterTable("main", t, Seq(ChAlterOp.AddProjection("ps",
      "SELECT tag, sum(v), count(*) GROUP BY tag")))
    client.alterTable("main", t, Seq(ChAlterOp.MaterializeProjection("ps")))
    val h0 = hits(t, "ps")
    val rows = spark.table(s"chproj.main.$t")
      .groupBy("tag")
      .agg(org.apache.spark.sql.functions.sum("v").as("s"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("c"))
      .orderBy("tag").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("a", 40L, 2L), ("b", 20L, 1L)))
    assert(hits(t, "ps") >= h0 + 1,
      "the pushed-down scan aggregate should swap onto the projection")
  }
}
