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
