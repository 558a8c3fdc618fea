package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.client.EmbeddedClickHouse
import graft.ops.AsOfJoin
import graft.pushdown.ClickHouseRemoteExec

/** Remote ASOF JOIN collapse (VERDICT r11 item 1): an as-of join of two
  * same-store connector tables ships as server-native `ASOF LEFT JOIN`
  * (one remote exec, no Spark-side join or window — neither event stream
  * crosses the wire); every other shape lowers to the exact local
  * tagged-union composition of [[graft.ops.AsOfJoin.asofJoin]] during
  * optimization. Results are bit-identical between the paths on
  * (key, time)-unique right sides.
  */
class AsofJoinSpec extends AnyFunSuite {

  private lazy val root = Files.createTempDirectory("graft_asof_").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .appName("asof-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.conf.set("spark.sql.catalog.chasof",
      classOf[graft.catalog.ClickHouseCatalog].getName)
    s.conf.set("spark.sql.catalog.chasof.path", root)
    GraftSession.install(s)
    val client = new EmbeddedClickHouse(root)
    client.createTable("db", "ev",
      Seq("k" -> "Int64", "ts" -> "Int64", "v" -> "Int64"),
      Map("engine" -> "MergeTree", "order_by" -> "k"))
    client.insert("db", "ev", client.sparkSchema("db", "ev"),
      (for (k <- 1L to 5L; i <- 0L to 9L) yield Row(k, i * 10L, k * 100L + i)))
    // (k, qts) unique — ASOF tie semantics are unspecified on both engines
    client.createTable("db", "qt",
      Seq("k" -> "Int64", "qts" -> "Int64", "seq" -> "Int64", "price" -> "Int64"),
      Map("engine" -> "MergeTree", "order_by" -> "k"))
    client.insert("db", "qt", client.sparkSchema("db", "qt"),
      (for (k <- 1L to 4L; i <- 0L to 5L) yield
        Row(k, i * 17L + 3L, i, k * 1000L + i * 7L)))
    s
  }

  private def flat(df: DataFrame) =
    PlanAsserts.flatten(df.queryExecution.executedPlan)

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  test("same-store as-of join collapses to ONE remote ASOF LEFT JOIN — " +
    "no Spark join, window, or shuffle; results match the local composition") {
    val ev = spark.table("chasof.db.ev")
    val qt = spark.table("chasof.db.qt")
    val planned = AsOfJoin.asofJoinPlanned(
      ev, qt, "k", "ts", "qts", "seq", Seq("price"))
    val execs = flat(planned).collect { case e: ClickHouseRemoteExec => e }
    assert(execs.length == 1,
      s"expected one remote exec:\n${planned.queryExecution.executedPlan}")
    assert(execs.head.sql.contains("ASOF LEFT JOIN"), execs.head.sql)
    assert(execs.head.sql.contains("join_use_nulls = 1"), execs.head.sql)
    val all = flat(planned)
    assert(!all.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.BaseJoinExec]),
      "the join must run in the store")
    assert(!all.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.window.WindowExec]),
      "the as-of pick must run in the store")
    assert(!all.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]),
      "collapsed as-of must be exchange-free")
    val local = AsOfJoin.asofJoin(ev, qt, "k", "ts", "qts", "seq", Seq("price"))
    assert(planned.columns.toSeq == local.columns.toSeq)
    assert(rows(planned) == rows(local))
    // sanity on the semantics themselves: k=5 has no quotes → NULL
    // payload; k=1 ts=20 → latest qts<=20 is 20 (seq=1) → price 1007
    val byKey = planned.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))
    ).toMap
    assert(byKey((5L, 30L)).isEmpty)
    assert(byKey((1L, 20L)).contains(1007L))
  }

  test("cross-source as-of join lowers to the local composition (window " +
    "present, no ASOF remote SQL) with identical results") {
    val ev = spark.table("chasof.db.ev")
    import spark.implicits._
    val localQt = (for (k <- 1L to 4L; i <- 0L to 5L) yield
      (k, i * 17L + 3L, i, k * 1000L + i * 7L)).toDF("k", "qts", "seq", "price")
    val planned = AsOfJoin.asofJoinPlanned(
      ev, localQt, "k", "ts", "qts", "seq", Seq("price"))
    val all = flat(planned)
    assert(!all.collect { case e: ClickHouseRemoteExec => e }
      .exists(_.sql.contains("ASOF")), "cross-source must not ship ASOF")
    assert(all.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.window.WindowExec]),
      s"expanded composition must window locally:\n${all.head}")
    val local = AsOfJoin.asofJoin(ev, localQt, "k", "ts", "qts", "seq", Seq("price"))
    assert(rows(planned) == rows(local))
  }

  test("MULTI-KEY as-of join (symbol+venue): every key pair must match; " +
    "collapses to one remote ASOF with all equality conjuncts and agrees " +
    "with the local composition") {
    val client = new EmbeddedClickHouse(root)
    if (!client.tableExists("db", "ev2")) {
      client.createTable("db", "ev2",
        Seq("k" -> "Int64", "venue" -> "String", "ts" -> "Int64", "v" -> "Int64"),
        Map("engine" -> "MergeTree", "order_by" -> "k"))
      client.insert("db", "ev2", client.sparkSchema("db", "ev2"),
        (for (k <- 1L to 4L; ven <- Seq("A", "B"); i <- 0L to 5L)
          yield org.apache.spark.sql.Row(k, ven, i * 10L, k * 10L + i)))
      client.createTable("db", "qt2",
        Seq("k" -> "Int64", "venue" -> "String", "qts" -> "Int64",
          "seq" -> "Int64", "price" -> "Int64"),
        Map("engine" -> "MergeTree", "order_by" -> "k"))
      // venue B quotes shifted so cross-venue matches would be DETECTABLY
      // wrong; (k, venue, qts) unique
      client.insert("db", "qt2", client.sparkSchema("db", "qt2"),
        (for (k <- 1L to 3L; (ven, off) <- Seq(("A", 3L), ("B", 7L)); q <- 0L to 3L)
          yield org.apache.spark.sql.Row(
            k, ven, q * 13L + off, q, k * 1000L + (if (ven == "A") 0L else 500L) + q)))
    }
    val ev = spark.table("chasof.db.ev2")
    val qt = spark.table("chasof.db.qt2")
    val planned = AsOfJoin.asofJoinPlanned(
      ev, qt, Seq("k", "venue"), "ts", "qts", "seq", Seq("price"))
    val execs = flat(planned).collect { case e: ClickHouseRemoteExec => e }
    assert(execs.length == 1, s"${planned.queryExecution.executedPlan}")
    // both equality conjuncts precede the inequality in the ON clause
    val on = execs.head.sql
    assert(raw"ON \w+ = \w+ AND \w+ = \w+ AND \w+ <= \w+".r
      .findFirstIn(on).isDefined, on)
    val local = AsOfJoin.asofJoin(
      ev, qt, Seq("k", "venue"), "ts", "qts", "seq", Seq("price"))
    assert(rows(planned) == rows(local))
    // cross-venue isolation: a venue-A row must never carry a +500 price
    val got = planned.collect()
    assert(got.exists(r => !r.isNullAt(4)))
    got.filter(r => r.getString(1) == "A" && !r.isNullAt(4))
      .foreach(r => assert(r.getLong(4) % 1000L < 500L, r.toString))
  }

  test("INNER as-of join drops unmatched left rows on BOTH paths: the " +
    "remote collapse ships ASOF JOIN (no LEFT) and matches the local " +
    "composition bit for bit") {
    val ev = spark.table("chasof.db.ev")
    val qt = spark.table("chasof.db.qt")
    val planned = AsOfJoin.asofJoinPlannedInner(
      ev, qt, "k", "ts", "qts", "seq", Seq("price"))
    val execs = flat(planned).collect { case e: ClickHouseRemoteExec => e }
    assert(execs.length == 1, s"${planned.queryExecution.executedPlan}")
    assert(execs.head.sql.contains("ASOF JOIN") &&
      !execs.head.sql.contains("ASOF LEFT JOIN"), execs.head.sql)
    val local = AsOfJoin.asofJoinInner(
      ev, qt, "k", "ts", "qts", "seq", Seq("price"))
    assert(rows(planned) == rows(local))
    // inner semantics: k=5 has no quotes → all its rows drop; k=1 ts=0
    // precedes every quote (min qts is 3) → dropped too
    val got = planned.collect()
    assert(!got.exists(_.getLong(0) == 5L))
    assert(!got.exists(r => r.getLong(0) == 1L && r.getLong(1) == 0L))
    assert(got.forall(!_.isNullAt(3)), "inner rows always carry a payload")
  }

  test("as-of join of two HTTP-catalog tables plans ONE remote ASOF LEFT " +
    "JOIN statement with join_use_nulls pinned (ships verbatim — a real " +
    "server executes it natively); no range-split cursor ever attaches") {
    val mock = new graft.client.MockClickHouseHttp
    try {
      spark.conf.set("spark.sql.catalog.chasofhttp",
        classOf[graft.catalog.ClickHouseCatalog].getName)
      spark.conf.set("spark.sql.catalog.chasofhttp.endpoint", mock.endpoint)
      val cl = graft.connector.ChMutations.clientOf(spark, "chasofhttp")
      cl.createTable("main", "dl", Seq("k" -> "Int64", "ts" -> "Int64"),
        Map("engine" -> "MergeTree"))
      cl.createTable("main", "dr",
        Seq("k" -> "Int64", "qts" -> "Int64", "seq" -> "Int64", "p" -> "Int64"),
        Map("engine" -> "MergeTree"))
      val planned = AsOfJoin.asofJoinPlanned(
        spark.table("chasofhttp.main.dl"), spark.table("chasofhttp.main.dr"),
        "k", "ts", "qts", "seq", Seq("p"))
      // plan-shape only: the mock cannot execute joins, but the statement
      // a real server would receive is fully determined at planning
      val all = flat(planned)
      val remotes = all.collect { case r: ClickHouseRemoteExec => r }
      assert(remotes.size == 1, s"one remote exec:\n${all.head}")
      assert(remotes.head.sql.contains("ASOF LEFT JOIN"), remotes.head.sql)
      assert(remotes.head.sql.contains("SETTINGS join_use_nulls = 1"),
        remotes.head.sql)
      assert(!all.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BaseJoinExec]), s"${all.head}")
      // ASOF collapses never carry a range-split cursor (tie re-execution)
      assert(remotes.head.splitBy.isEmpty)
    } finally mock.close()
  }

  test("direction/strictness variants (<=, <, >=, >): the collapse ships " +
    "the exact inequality, the local composition agrees bit for bit, and " +
    "hand-checked picks pin the semantics of each operator") {
    val ev = spark.table("chasof.db.ev")
    val qt = spark.table("chasof.db.qt")
    // k=1 quotes: qts [3, 20, 37, 54, 71, 88], price 1000 + 7*seq.
    // Hand-picks at (k=1, ts): the boundary row ts=20 hits qts=20 exactly,
    // so inclusive vs strict differ there; the ends pin direction.
    val expect = Map(
      "<=" -> Map(0L -> None, 20L -> Some(1007L), 90L -> Some(1035L)),
      "<" -> Map(0L -> None, 20L -> Some(1000L), 90L -> Some(1035L)),
      ">=" -> Map(0L -> Some(1000L), 20L -> Some(1007L), 90L -> None),
      ">" -> Map(0L -> Some(1000L), 20L -> Some(1014L), 90L -> None))
    for (op <- Seq("<=", "<", ">=", ">")) {
      val planned = AsOfJoin.asofJoinPlanned(
        ev, qt, Seq("k"), "ts", "qts", "seq", Seq("price"),
        op = op, leftJoin = true)
      val execs = flat(planned).collect { case e: ClickHouseRemoteExec => e }
      assert(execs.length == 1, s"$op: one remote exec")
      assert(execs.head.sql.contains(s" $op "), s"$op: ${execs.head.sql}")
      val local = AsOfJoin.asofJoin(
        ev, qt, Seq("k"), "ts", "qts", "seq", Seq("price"),
        op = op, leftJoin = true)
      assert(rows(planned) == rows(local), s"$op: paths must agree")
      val got = planned.collect().map(r =>
        (r.getLong(0), r.getLong(1)) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      expect(op).foreach { case (ts, want) =>
        assert(got((1L, ts)) == want, s"$op at (k=1, ts=$ts)")
      }
      // k=5 has no quotes: NULL payload in every direction (LEFT join)
      assert(got((5L, 30L)).isEmpty, s"$op: unmatched left row")
    }
    // strict INNER forward: unmatched rows DROP (k=1 ts=90 has no later
    // quote; k=5 has none at all)
    val innerFwd = AsOfJoin.asofJoinPlanned(
      ev, qt, Seq("k"), "ts", "qts", "seq", Seq("price"),
      op = ">", leftJoin = false)
    val innerLocal = AsOfJoin.asofJoin(
      ev, qt, Seq("k"), "ts", "qts", "seq", Seq("price"),
      op = ">", leftJoin = false)
    assert(rows(innerFwd) == rows(innerLocal))
    val gotI = innerFwd.collect()
    assert(!gotI.exists(_.getLong(0) == 5L))
    assert(!gotI.exists(r => r.getLong(0) == 1L && r.getLong(1) == 90L))
    assert(gotI.forall(!_.isNullAt(3)))
    // a bogus operator rejects loudly on both paths
    val e = intercept[IllegalArgumentException](AsOfJoin.asofJoin(
      ev, qt, Seq("k"), "ts", "qts", "seq", Seq("price"),
      op = "!=", leftJoin = true))
    assert(e.getMessage.contains("inequality"), e.getMessage)
  }

  test("embedded raw-SQL ASOF with SHARED column names across the sides " +
    "fails with the named limitation and the subselect-rename workaround " +
    "(the rewrite flattens both sides into one row)") {
    val ch = graft.session.ClickHouseSession.builder(spark)
      .storePath(root).catalogName("chasof").build()
    // ev and qt both carry `k`: selecting it strips to an ambiguous ref
    val e = intercept[IllegalArgumentException](ch.chSql(
      """SELECT e.`k` AS k, q.`price` AS p
        |FROM `db`.`ev` e ASOF LEFT JOIN `db`.`qt` q
        |  ON e.`k` = q.`k` AND q.`qts` <= e.`ts`""".stripMargin).collect())
    assert(e.getMessage.contains("alias one side's columns apart"),
      e.getMessage)
    // the same join with the shared name selected from ONE side only
    // (via a renaming subselect) works — the documented workaround
    val ok = ch.chSql(
      """SELECT e.`k` AS k, q.`price` AS p
        |FROM `db`.`ev` e ASOF LEFT JOIN
        |  (SELECT `k` AS `qk`, `qts`, `price` FROM `db`.`qt`) q
        |  ON e.`k` = q.`qk` AND q.`qts` <= e.`ts`""".stripMargin)
    assert(ok.count() == 50)
  }

  test("embedded ASOF JOIN USING executes with merged-key semantics: " +
    "values match the ON form / local composition; INNER drops unmatched") {
    val ch = graft.session.ClickHouseSession.builder(spark)
      .storePath(root).catalogName("chasof").build()
    // right side renamed so both sides share (k, ts) — the USING shape
    val viaUsing = ch.chSql(
      """SELECT `k` AS k, `ts` AS ts, `price` AS p
        |FROM `db`.`ev` e ASOF LEFT JOIN
        |  (SELECT `k`, `qts` AS `ts`, `price` FROM `db`.`qt`) q
        |  USING (`k`, `ts`)""".stripMargin)
    val local = graft.ops.AsOfJoin.asofJoin(
      spark.table("chasof.db.ev"), spark.table("chasof.db.qt"),
      "k", "ts", "qts", "seq", Seq("price"))
      .select(org.apache.spark.sql.functions.col("k"),
        org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("asof_price").as("p"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(canon(viaUsing) == canon(local))
    // INNER USING: unmatched left rows drop (k=5 has no quotes)
    val inner = ch.chSql(
      """SELECT `k` AS k, `ts` AS ts, `price` AS p
        |FROM `db`.`ev` e ASOF JOIN
        |  (SELECT `k`, `qts` AS `ts`, `price` FROM `db`.`qt`) q
        |  USING (`k`, `ts`)""".stripMargin).collect()
    assert(inner.nonEmpty && !inner.exists(_.getLong(0) == 5L))
    assert(inner.forall(!_.isNullAt(2)))
  }

  test("a session without the pushdown rule gets the local composition " +
    "directly (no marker node ever built)") {
    val s2 = spark.newSession()
    import s2.implicits._
    val ev = (for (k <- 1L to 3L; i <- 0L to 4L) yield
      (k, i * 10L, k + i)).toDF("k", "ts", "v")
    val qt = (for (k <- 1L to 3L; i <- 0L to 2L) yield
      (k, i * 13L + 1L, i, k * 10L + i)).toDF("k", "qts", "seq", "price")
    val planned = AsOfJoin.asofJoinPlanned(
      ev, qt, "k", "ts", "qts", "seq", Seq("price"))
    val local = AsOfJoin.asofJoin(ev, qt, "k", "ts", "qts", "seq", Seq("price"))
    assert(rows(planned) == rows(local))
  }
}
