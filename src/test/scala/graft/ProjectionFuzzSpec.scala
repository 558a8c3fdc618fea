package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.client.{ChAlterOp, EmbeddedClickHouse}

/** Adversarial fuzz for the projection read-swap: random aggregate
  * shapes — matching, partially matching, and deliberately non-matching
  * — run against a projected table while the store CHURNS underneath
  * (inserts, mutations, merges, projection drop/re-add). Every result
  * must equal a local Spark recompute over the table's current rows,
  * bit for bit, whether or not the swap engaged; and across the whole
  * run the swap must have engaged at least once (the fuzz would pass
  * vacuously if the matcher never fired).
  */
class ProjectionFuzzSpec extends AnyFunSuite {

  private lazy val root = Files.createTempDirectory("graft_projfuzz_").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .appName("projection-fuzz")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.conf.set("spark.sql.catalog.chpfz",
      classOf[graft.catalog.ClickHouseCatalog].getName)
    s.conf.set("spark.sql.catalog.chpfz.path", root)
    s
  }

  private lazy val client = new EmbeddedClickHouse(root)

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case null => "NULL"
      case d: Double => java.lang.Double.toString(d)
      case v => v.toString
    }.mkString("|")).sorted.toSeq

  test("40 random aggregate shapes stay bit-identical to a local " +
    "recompute across store churn; the swap engages along the way") {
    val r = new Random(86420)
    val ch = graft.session.ClickHouseSession.builder(spark)
      .storePath(root).catalogName("chpfz").build()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chpfz.main")
    spark.sql(
      """CREATE TABLE chpfz.main.fz (id BIGINT, tag STRING, grp BIGINT,
        |  v BIGINT)
        |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'id')""".stripMargin)
    val defSql =
      "SELECT tag, grp, sum(v), count(*), min(v), max(v), avg(v) " +
        "GROUP BY tag, grp"
    client.alterTable("main", "fz",
      Seq(ChAlterOp.AddProjection("pfz", defSql)))

    var nextId = 0L
    def insertSome(n: Int): Unit = {
      val rows = (1 to n).map { _ =>
        nextId += 1
        s"($nextId, 't${r.nextInt(4)}', ${r.nextInt(3)}, ${r.nextInt(1000) - 200})"
      }
      spark.sql(s"INSERT INTO chpfz.main.fz VALUES ${rows.mkString(", ")}")
    }
    insertSome(60)

    var cases = 0
    (1 to 40).foreach { i =>
      // churn between queries
      r.nextInt(6) match {
        case 0 => insertSome(r.nextInt(20) + 1)
        case 1 if nextId > 10 =>
          graft.connector.ChMutations.updateWhere(spark, "chpfz.main.fz",
            Seq("v" -> s"v + ${r.nextInt(5)}"), s"id % ${r.nextInt(7) + 2} = 0")
        case 2 if nextId > 10 =>
          graft.connector.ChMutations.deleteWhere(spark, "chpfz.main.fz",
            s"id = ${r.nextInt(nextId.toInt) + 1}")
        case 3 => client.optimizeTable("main", "fz", finalize = false)
        case 4 if i % 7 == 0 =>
          // drop and re-add: ADD covers only future parts until a
          // MATERIALIZE backfills — fallback must stay correct throughout
          client.alterTable("main", "fz", Seq(ChAlterOp.DropProjection("pfz")))
          client.alterTable("main", "fz",
            Seq(ChAlterOp.AddProjection("pfz", defSql)))
          if (r.nextBoolean())
            client.alterTable("main", "fz",
              Seq(ChAlterOp.MaterializeProjection("pfz")))
        case _ => ()
      }
      // swap-UNSAFE surface (round-14 ADVICE hardening): plain key
      // scans must return one row per BASE row — a wrong swap would
      // collapse to state rows with an identical schema, invisible to
      // the analyzed-schema guard
      if (r.nextInt(5) == 0) {
        val wh = if (r.nextBoolean()) (" WHERE `tag` = 't1'", " WHERE tag = 't1'")
        else ("", "")
        val remoteScan = ch.chSql(
          s"SELECT `tag` AS tag, `grp` AS grp FROM `main`.`fz`${wh._1}")
        spark.table("chpfz.main.fz").createOrReplaceTempView("fz_local")
        val localScan = spark.sql(s"SELECT tag, grp FROM fz_local${wh._2}")
        assert(canon(remoteScan) == canon(localScan),
          s"fuzz case $i plain-scan diverged (where=${wh._1})")
        cases += 1
      } else {
      // random query shape
      val groupKeys = r.nextInt(4) match {
        case 0 => Seq("tag", "grp")
        case 1 => Seq("tag")
        case 2 => Seq("grp")
        case 3 => Seq.empty
      }
      val aggPool = Seq(
        ("sum(`v`)", "sum(v)"),
        ("count(*)", "count(*)"),
        ("min(`v`)", "min(v)"),
        ("max(`v`)", "max(v)"),
        ("avg(`v`)", "avg(v)"),
        // deliberately NON-matching aggregates: the swap must not fire
        // for these shapes (schema/arg mismatch) and results must still
        // be exact via fallback
        ("sum(`v` + 1)", "sum(v + 1)"),
        ("count(`v`)", "count(v)"))
      val picked = r.shuffle(aggPool).take(r.nextInt(3) + 1)
      val whereR = r.nextInt(4) match {
        case 0 => ("`tag` = 't1'", "tag = 't1'")
        case 1 => ("`grp` >= 1", "grp >= 1")
        case 2 => ("`v` > 0", "v > 0") // non-key: fallback path
        case 3 => ("", "")
      }
      val remoteItems = (groupKeys.map(k => s"`$k` AS $k") ++
        picked.zipWithIndex.map { case ((re, _), j) => s"$re AS a$j" })
        .mkString(", ")
      val localItems = (groupKeys ++
        picked.zipWithIndex.map { case ((_, lo), j) => s"$lo AS a$j" })
        .mkString(", ")
      // trailing clauses: alias-only tails may ride the swap; any tail
      // carrying a CALL (HAVING count(*)) must fall back — and count
      // BASE rows, never per-part state rows (round-14 ADVICE shape)
      val tail =
        if (groupKeys.nonEmpty && r.nextInt(3) == 0) {
          if (r.nextBoolean()) (" HAVING count(*) > 2", " HAVING count(*) > 2")
          else (" HAVING a0 IS NOT NULL", " HAVING a0 IS NOT NULL")
        } else ("", "")
      val remote = ch.chSql(
        s"SELECT $remoteItems FROM `main`.`fz`" +
          (if (whereR._1.isEmpty) "" else s" WHERE ${whereR._1}") +
          (if (groupKeys.isEmpty) ""
           else s" GROUP BY ${groupKeys.map(k => s"`$k`").mkString(", ")}") +
          tail._1)
      // local twin: tails re-express as a filter over the grouped
      // subquery (count(*) recomputed from base rows alongside)
      spark.table("chpfz.main.fz").createOrReplaceTempView("fz_local")
      val whereSql = if (whereR._2.isEmpty) "" else s" WHERE ${whereR._2}"
      val groupSql =
        if (groupKeys.isEmpty) "" else s" GROUP BY ${groupKeys.mkString(", ")}"
      val local =
        if (tail._2.isEmpty)
          spark.sql(s"SELECT $localItems FROM fz_local$whereSql$groupSql")
        else spark.sql(
          s"SELECT ${(groupKeys ++ picked.indices.map(j => s"a$j")).mkString(", ")} " +
            s"FROM (SELECT $localItems, count(*) AS __c FROM fz_local" +
            s"$whereSql$groupSql) WHERE " +
            tail._2.replace(" HAVING ", "").replace("count(*)", "__c"))
      assert(canon(remote) == canon(local),
        s"fuzz case $i diverged (keys=$groupKeys, aggs=${picked.map(_._1)}, " +
          s"where=${whereR._1}, tail=${tail._1})")
      cases += 1
      }
    }
    assert(cases == 40)
    assert(client.projectionHitCount("main", "fz", "pfz") > 0L,
      "the fuzz never exercised the swap — matcher or coverage broke")
  }
}
