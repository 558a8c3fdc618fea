package graft

import java.nio.file.Files

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** SQL `UPDATE` statements on ClickHouse catalog tables ship as
  * server-side `ALTER TABLE ... UPDATE` mutations (ChUpdateRewrite on
  * the extensions session) — old-value semantics, NULL condition keeps
  * rows, zero rows cross the wire. Outside the shared expression
  * surface the STATEMENT fails loudly; non-ClickHouse targets fall
  * through to Spark's own UPDATE handling.
  */
class UpdateSqlSpec extends AnyFunSuite {

  private lazy val root = Files.createTempDirectory("graft_updsql_").toString

  private lazy val spark: SparkSession = {
    val base = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val s = org.apache.spark.sql.classic.SparkSession.builder()
      .master(base.sparkContext.master)
      .withExtensions(new GraftExtensions().apply(_))
      .create()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.conf.set("spark.sql.catalog.chupd",
      classOf[graft.catalog.ClickHouseCatalog].getName)
    s.conf.set("spark.sql.catalog.chupd.path", root)
    s
  }

  private var n = 0
  private def fresh(): String = {
    n += 1
    val t = s"u_$n"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chupd.main")
    spark.sql(
      s"""CREATE TABLE chupd.main.$t (id BIGINT, score DOUBLE, tag STRING)
         |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'id')""".stripMargin)
    spark.sql(s"INSERT INTO chupd.main.$t VALUES " +
      "(1, 1.5, 'x'), (2, 2.5, 'y'), (3, 3.5, 'x'), (4, 4.5, NULL)")
    t
  }

  private def scores(t: String): Map[Long, Double] =
    spark.table(s"chupd.main.$t").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("UPDATE ... WHERE ships as a server mutation with old-value " +
    "semantics; NULL condition keeps rows") {
    val t = fresh()
    spark.sql(s"UPDATE chupd.main.$t SET score = score * 2 WHERE tag = 'x'")
    assert(scores(t) == Map(1L -> 3.0, 2L -> 2.5, 3L -> 7.0, 4L -> 4.5))
  }

  test("UPDATE without WHERE mutates every row; multi-assignment and " +
    "shared functions unparse") {
    val t = fresh()
    spark.sql(
      s"UPDATE chupd.main.$t SET score = floor(score) + abs(-1), tag = 'z'")
    assert(scores(t) == Map(1L -> 2.0, 2L -> 3.0, 3L -> 4.0, 4L -> 5.0))
    assert(spark.table(s"chupd.main.$t").collect()
      .forall(_.getString(2) == "z"))
  }

  test("round() is NOT shared surface: ClickHouse rounds half-to-even, " +
    "Spark HALF_UP — the statement must reject, not silently diverge") {
    val t = fresh()
    val e = intercept[AnalysisException](spark.sql(
      s"UPDATE chupd.main.$t SET score = round(score)"))
    assert(e.getMessage.contains("remote mutation"), e.getMessage)
  }

  test("expressions OUTSIDE the shared surface fail the statement loudly") {
    val t = fresh()
    val e = intercept[AnalysisException](spark.sql(
      s"UPDATE chupd.main.$t SET score = `someClickHouseOnlyFn`(score)"))
    assert(e.getMessage.contains("remote mutation"), e.getMessage)
    // nothing mutated
    assert(scores(t) == Map(1L -> 1.5, 2L -> 2.5, 3L -> 3.5, 4L -> 4.5))
  }

  test("UPDATE on a non-ClickHouse target falls through to Spark's own " +
    "handling (no accidental interception)") {
    spark.range(3).createOrReplaceTempView("plain_view")
    val e = intercept[Exception](
      spark.sql("UPDATE plain_view SET id = 1 WHERE id = 2"))
    assert(!e.getMessage.contains("remote mutation"),
      s"must be Spark's own UPDATE error, got: ${e.getMessage}")
  }

  test("20 random UPDATE shapes over the shared surface agree with a " +
    "direct Spark CASE recompute, bit for bit") {
    import scala.util.Random
    for (seed <- 0 until 20) {
      val r = new Random(seed)
      val t = fresh() // 4 fixed rows incl. a NULL tag
      spark.sql(s"INSERT INTO chupd.main.$t VALUES " +
        (5 to 12).map(i => s"($i, ${i * 0.75 + 0.1}, " +
          s"${if (i % 3 == 0) "NULL" else s"'t${i % 4}'"})").mkString(", "))
      // snapshot BEFORE the mutation for the local recompute — a TRUE
      // copy (collect + re-create), not .cache(): cached plans over the
      // table are exactly what the mutation invalidates
      val live = spark.table(s"chupd.main.$t")
      val before = spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(live.collect(): _*)),
        live.schema)
      before.createOrReplaceTempView(s"before_$t")

      def lit(): String = Seq("0.5", "2.0", "-1.25", "3.0")(r.nextInt(4))
      def numExpr(depth: Int): String =
        if (depth >= 2) Seq("`score`", lit())(r.nextInt(2))
        else r.nextInt(8) match {
          case 0 => "`score`"
          case 1 => s"(${numExpr(depth + 1)} + ${numExpr(depth + 1)})"
          case 2 => s"(${numExpr(depth + 1)} * ${numExpr(depth + 1)})"
          case 3 => s"(${numExpr(depth + 1)} - ${lit()})"
          case 4 => s"abs(${numExpr(depth + 1)})"
          case 5 => s"ceiling(${numExpr(depth + 1)})"
          case 6 => s"floor(${numExpr(depth + 1)})"
          case 7 => s"coalesce(${numExpr(depth + 1)}, ${lit()})"
        }
      def cond(depth: Int): String =
        if (depth >= 2) "`score` > 2.0"
        else r.nextInt(7) match {
          case 0 => s"`score` ${Seq("<", "<=", ">", ">=", "=")(r.nextInt(5))} ${lit()}"
          case 1 => "`tag` IS NULL"
          case 2 => "`tag` = 't1'"
          case 3 => s"`id` IN (1, 3, ${5 + r.nextInt(8)})"
          case 4 => s"(${cond(depth + 1)} AND ${cond(depth + 1)})"
          case 5 => s"(${cond(depth + 1)} OR ${cond(depth + 1)})"
          case 6 => s"(NOT ${cond(depth + 1)})"
        }
      val set = numExpr(0)
      val where = cond(0)
      spark.sql(s"UPDATE chupd.main.$t SET score = $set WHERE $where")
      // the mutation contract: recompute from OLD values where the
      // condition is TRUE (NULL keeps) — same text, direct Spark CASE
      val expect = spark.sql(
        s"""SELECT `id`,
           |  CASE WHEN coalesce(CAST(($where) AS BOOLEAN), false)
           |    THEN ($set) ELSE `score` END AS score, `tag`
           |FROM before_$t""".stripMargin)
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
      val got = spark.table(s"chupd.main.$t")
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
      assert(got.toSeq == expect.toSeq,
        s"seed $seed diverged\nSET $set WHERE $where\n" +
          s"got:    ${got.mkString("; ")}\nexpect: ${expect.mkString("; ")}")
      spark.sql(s"DROP TABLE chupd.main.$t")
    }
  }

  test("mutations invalidate CACHED plans over the table: a cached " +
    "DataFrame does not keep serving pre-mutation rows") {
    val t = fresh()
    val cached = spark.table(s"chupd.main.$t")
    cached.cache()
    assert(cached.count() == 4) // materialize pre-mutation
    spark.sql(s"UPDATE chupd.main.$t SET score = 100.0 WHERE id = 1")
    assert(spark.table(s"chupd.main.$t").where("id = 1")
      .collect().head.getDouble(1) == 100.0,
      "fresh read must see the mutation despite the cached plan")
    cached.unpersist()
  }

  test("UPDATE on a SHARDED catalog mutates each shard's local rows " +
    "(broadcast mutation, routing untouched)") {
    val r1 = Files.createTempDirectory("graft_updsh1_").toString
    val r2 = Files.createTempDirectory("graft_updsh2_").toString
    spark.conf.set("spark.sql.catalog.chupdsh",
      classOf[graft.catalog.ClickHouseCatalog].getName)
    spark.conf.set("spark.sql.catalog.chupdsh.path", s"$r1,$r2")
    spark.conf.set("spark.sql.catalog.chupdsh.shard_by", "id")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chupdsh.main")
    spark.sql(
      """CREATE TABLE chupdsh.main.t (id BIGINT, score DOUBLE)
        |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'id')""".stripMargin)
    spark.sql("INSERT INTO chupdsh.main.t SELECT id, CAST(id AS DOUBLE) " +
      "FROM range(20)")
    // both shards must hold rows, or this degrades to single-store
    val perShard = Seq(r1, r2).map(r =>
      new graft.client.EmbeddedClickHouse(r)
        .query("SELECT count(*) AS n FROM `main`.`t`", 1)._2.flatten.head.getLong(0))
    assert(perShard.forall(_ > 0), s"shard slices: $perShard")
    spark.sql("UPDATE chupdsh.main.t SET score = score + 100.0 WHERE id >= 10")
    val got = spark.table("chupdsh.main.t").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == (0 until 20).map(i =>
      i.toLong -> (if (i >= 10) i + 100.0 else i.toDouble)).toMap)
  }

  test("2-part UPDATE under USE <clickhouse-catalog> resolves through " +
    "the current catalog; 1-part under USE catalog.db too") {
    val t = fresh()
    spark.sql("USE chupd")
    try {
      spark.sql(s"UPDATE main.$t SET score = 9.0 WHERE id = 2")
      assert(scores(t)(2L) == 9.0)
      spark.sql("USE chupd.main")
      spark.sql(s"UPDATE $t SET score = 8.0 WHERE id = 1")
      assert(scores(t)(1L) == 8.0)
    } finally spark.sql("USE spark_catalog")
  }

  test("NULL-skipping and partial-domain functions are NOT shared " +
    "surface: greatest/least and sqrt reject") {
    val t = fresh()
    for (bad <- Seq("greatest(score, 1.0)", "least(score, 1.0)", "sqrt(score)")) {
      val e = intercept[AnalysisException](spark.sql(
        s"UPDATE chupd.main.$t SET score = $bad"))
      assert(e.getMessage.contains("remote mutation"), s"$bad: ${e.getMessage}")
    }
  }

  test("UPDATE assigning the shard_by routing column is rejected " +
    "(placement would no longer match the value)") {
    val r1 = Files.createTempDirectory("graft_updshk1_").toString
    val r2 = Files.createTempDirectory("graft_updshk2_").toString
    spark.conf.set("spark.sql.catalog.chupdshk",
      classOf[graft.catalog.ClickHouseCatalog].getName)
    spark.conf.set("spark.sql.catalog.chupdshk.path", s"$r1,$r2")
    spark.conf.set("spark.sql.catalog.chupdshk.shard_by", "id")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chupdshk.main")
    spark.sql(
      """CREATE TABLE chupdshk.main.t (id BIGINT, v BIGINT)
        |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'id')""".stripMargin)
    spark.sql("INSERT INTO chupdshk.main.t SELECT id, id FROM range(10)")
    val e = intercept[Exception](
      spark.sql("UPDATE chupdshk.main.t SET id = id + 1"))
    assert(e.getMessage.contains("shard_by"), e.getMessage)
    // non-routing assignments still work
    spark.sql("UPDATE chupdshk.main.t SET v = v * 2 WHERE id < 5")
    assert(spark.table("chupdshk.main.t").where("id < 5")
      .collect().forall(r => r.getLong(1) == r.getLong(0) * 2))
  }

  test("TRUNCATE TABLE rides SupportsDelete's unconditional delete " +
    "(ClickHouse has TRUNCATE; only OVERWRITE stays rejected)") {
    val t = fresh()
    spark.sql(s"TRUNCATE TABLE chupd.main.$t")
    assert(spark.table(s"chupd.main.$t").count() == 0)
    spark.sql(s"INSERT INTO chupd.main.$t VALUES (9, 9.5, 'z')")
    assert(spark.table(s"chupd.main.$t").count() == 1)
  }

  test("IS NULL, IN, and boolean composition unparse in the condition") {
    val t = fresh()
    spark.sql(s"UPDATE chupd.main.$t SET tag = 'was_null' WHERE tag IS NULL")
    spark.sql(
      s"UPDATE chupd.main.$t SET score = -1.0 WHERE id IN (1, 2) AND NOT (score > 2.0)")
    val rows = spark.table(s"chupd.main.$t").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    assert(rows(4L)._2 == "was_null")
    assert(rows(1L)._1 == -1.0 && rows(2L)._1 == 2.5)
  }
}
