package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.client.HttpClickHouseClient

/** The real-protocol transport, tested hermetically: an in-JVM HTTP server
  * emulates the slice of ClickHouse's public HTTP interface the client
  * speaks (system.* metadata, DESCRIBE, JSONCompactEachRow SELECT streams,
  * JSONEachRow INSERT bodies, DDL) — the counterpart of the reference's
  * `mocks` feature (/root/reference/src/connection.rs:1-37,
  * connection/mock.rs). Point the same client at a live server by setting
  * CH_ENDPOINT (integration path; skipped here, no egress in the sandbox).
  */
class HttpClientSpec extends AnyFunSuite {

  // ---- mock ClickHouse: one table main.events_http + DDL/insert support ----

  private val mapper = new ObjectMapper()
  private val queries = mutable.ArrayBuffer.empty[String]

  // (id, name, val) with one NULL id — range splits must not lose it
  private val baseRows = mutable.ArrayBuffer[(Option[Long], String, Double)](
    (Some(1L), "a", 1.5), (Some(2L), "b", 2.5), (Some(3L), "c", 3.5),
    (Some(10L), "d", 4.5), (Some(11L), "e", 5.5), (Some(12L), "f", 6.5),
    (Some(20L), "g", 7.5), (Some(21L), "h", 8.5), (None, "z", 9.5))
  private val colTypes = Seq(
    "id" -> "Nullable(Int64)", "name" -> "Nullable(String)", "val" -> "Float64")
  // extra tables created via DDL at runtime: name -> (columns, rows as JSON maps)
  private val dynTables =
    mutable.Map.empty[String, (Seq[(String, String)], mutable.ArrayBuffer[Map[String, Any]])]

  private def selectCols(sql: String): Seq[String] = {
    var s = sql
    var sel = ""
    // `SELECT * FROM (inner)` wrappers (range slices): descend to the
    // innermost explicit select list
    while ({
      val from = s.toUpperCase.indexOf(" FROM ")
      sel = s.substring(s.toUpperCase.indexOf("SELECT") + 6, from).trim
      sel == "*" && s.indexOf('(', from) >= 0
    }) s = s.substring(s.indexOf('(', s.toUpperCase.indexOf(" FROM ")) + 1)
    sel.split(",").map(_.trim.stripPrefix("`").stripSuffix("`")).toSeq
  }

  private def rowsFor(sql: String): Seq[Map[String, Any]] = {
    val all: Seq[Map[String, Any]] =
      if (sql.contains("`events_http`")) baseRows.toSeq.map { case (id, n, v) =>
        Map("id" -> id.orNull, "name" -> n, "val" -> v)
      }
      else dynTables.collectFirst {
        case (t, (_, rows)) if sql.contains(s"`$t`") => rows.toSeq
      }.getOrElse(Seq.empty)
    // emulate the range predicates planQueryRanges emits
    val Range = raw"\(`id` >= (-?\d+) AND `id` <= (-?\d+)\)".r.unanchored
    val First = raw"\(`id` <= (-?\d+) OR `id` IS NULL\)".r.unanchored
    sql match {
      case First(hi) => all.filter(r =>
        r.get("id").forall(v => v == null || v.asInstanceOf[Long] <= hi.toLong))
      case Range(lo, hi) => all.filter(r => r.get("id").exists(v =>
        v != null && v.asInstanceOf[Long] >= lo.toLong && v.asInstanceOf[Long] <= hi.toLong))
      case _ => all
    }
  }

  private def jsonVal(v: Any): String = v match {
    case null => "null"
    case s: String => mapper.writeValueAsString(s)
    case d: Double => d.toString
    case other => other.toString
  }

  private def handleQuery(sql: String): (Int, String, Map[String, String]) = {
    queries.synchronized { queries += sql }
    val q = sql.trim
    def tsvOk(s: String) = (200, s, Map.empty[String, String])
    if (q.startsWith("SELECT name FROM system.databases"))
      tsvOk("default\nmain\n")
    else if (q.startsWith("SELECT name FROM system.tables"))
      tsvOk((Seq("events_http") ++ dynTables.keys.toSeq.sorted).mkString("", "\n", "\n"))
    else if (q.startsWith("SELECT count() FROM system.tables")) {
      val known = Seq("events_http") ++ dynTables.keys
      tsvOk(if (known.exists(t => q.contains(s"name = '$t'"))) "1\n" else "0\n")
    } else if (q.startsWith("SELECT count() FROM `main`.`__graft_epochs`")) {
      val marker = raw"WHERE m = '([^']+)'".r.unanchored
      val seen = q match {
        case marker(m) => dynTables.get("__graft_epochs")
          .exists(_._2.exists(_.get("m").contains(m)))
        case _ => false
      }
      tsvOk(if (seen) "1\n" else "0\n")
    } else if (q.startsWith("SELECT name, type FROM system.columns")) {
      val cols =
        if (q.contains("table = 'events_http'")) colTypes
        else dynTables.collectFirst {
          case (t, (c, _)) if q.contains(s"table = '$t'") => c
        }.getOrElse(Seq.empty)
      tsvOk(cols.map { case (n, t) => s"$n\t$t" }.mkString("", "\n", "\n"))
    } else if (q.startsWith("SELECT engine, sorting_key, partition_key"))
      tsvOk("MergeTree\tid\t\n")
    else if (q.startsWith("SELECT sum(bytes_on_disk)"))
      tsvOk("123456\n")
    else if (q.startsWith("DESCRIBE TABLE")) {
      val inner = q.stripPrefix("DESCRIBE TABLE (")
      val names = selectCols(inner)
      val typesByName = (colTypes ++ dynTables.values.flatMap(_._1)).toMap
      val out = names.map {
        case "1" => "1\tUInt8"
        case n => s"$n\t${typesByName.getOrElse(n, "Nullable(String)")}"
      }
      tsvOk(out.mkString("", "\n", "\n"))
    } else if (q.startsWith("SELECT min(`id`), max(`id`)")) {
      val ids = rowsFor(q).flatMap(r => Option(r("id")).map(_.asInstanceOf[Long]))
      tsvOk(if (ids.isEmpty) "\\N\t\\N\n" else s"${ids.min}\t${ids.max}\n")
    } else if (q.startsWith("CREATE DATABASE") || q.startsWith("DROP DATABASE"))
      tsvOk("")
    else if (q.startsWith("CREATE TABLE")) {
      val Name = raw"CREATE TABLE (?:IF NOT EXISTS )?`main`\.`([^`]+)`".r.unanchored
      q match {
        case Name(t) if !dynTables.contains(t) =>
          if (q.contains(" AS `main`.")) {
            val Src = raw" AS `main`\.`([^`]+)`".r.unanchored
            val srcCols = q match {
              case Src("events_http") => colTypes
              case Src(s) => dynTables.get(s).map(_._1).getOrElse(colTypes)
              case _ => colTypes
            }
            dynTables(t) = (srcCols, mutable.ArrayBuffer.empty)
          } else {
            // balanced-paren parse of the column section
            val start = q.indexOf('(') + 1
            var depth = 1
            var i = start
            while (i < q.length && depth > 0) {
              q.charAt(i) match {
                case '(' => depth += 1
                case ')' => depth -= 1
                case _ => ()
              }
              i += 1
            }
            val section = q.substring(start, i - 1)
            val items = mutable.ArrayBuffer.empty[String]
            val cur = new StringBuilder
            var d = 0
            section.foreach {
              case ',' if d == 0 => items += cur.result(); cur.clear()
              case c =>
                if (c == '(') d += 1 else if (c == ')') d -= 1
                cur.append(c)
            }
            if (cur.nonEmpty) items += cur.result()
            val cols = items.map(_.trim).filter(_.nonEmpty).map { it =>
              val sp = it.indexOf(' ')
              it.substring(0, sp).stripPrefix("`").stripSuffix("`") ->
                it.substring(sp + 1).trim
            }.toSeq
            dynTables(t) = (cols, mutable.ArrayBuffer.empty)
          }
          tsvOk("")
        case _ => tsvOk("")
      }
    } else if (q.startsWith("DROP TABLE")) {
      val Name = raw"`main`\.`([^`]+)`".r.unanchored
      q match { case Name(t) => dynTables.remove(t); case _ => () }
      tsvOk("")
    } else if (q.startsWith("INSERT INTO") && q.contains("FORMAT JSONEachRow")) {
      val Name = raw"INSERT INTO `main`\.`([^`]+)`".r.unanchored
      val t = q match { case Name(x) => x; case _ => fail(s"bad insert: $q") }
      val body = q.substring(q.indexOf("FORMAT JSONEachRow") + "FORMAT JSONEachRow".length)
      val rows = body.split("\n").iterator.filter(_.trim.nonEmpty).map { line =>
        val node = mapper.readTree(line)
        node.properties().asScala.map { e =>
          val v: Any = e.getValue match {
            case n if n.isNull => null
            case n if n.isIntegralNumber => n.asLong
            case n if n.isFloatingPointNumber => n.asDouble
            case n => n.asText
          }
          e.getKey -> v
        }.toMap
      }.toSeq
      dynTables.getOrElseUpdate(t,
        (colTypes, mutable.ArrayBuffer.empty))._2 ++= rows
      tsvOk("")
    } else if (q.startsWith("INSERT INTO") && q.contains("SELECT")) {
      // server-side INSERT SELECT (staged commit): move rows
      val Tgt = raw"INSERT INTO `main`\.`([^`]+)`".r.unanchored
      val Src = raw"FROM `main`\.`([^`]+)`".r.unanchored
      (q, q) match {
        case (Tgt(t), Src(s)) =>
          val moved = dynTables.get(s).map(_._2.toSeq).getOrElse(Seq.empty)
          dynTables.getOrElseUpdate(t, (colTypes, mutable.ArrayBuffer.empty))._2 ++= moved
          (200, "", Map("X-ClickHouse-Summary" ->
            s"""{"written_rows":${moved.size}}"""))
        case _ => tsvOk("")
      }
    } else if (q.toUpperCase.contains("FORMAT JSONCOMPACTEACHROW")) {
      val cols = selectCols(q)
      val rows = rowsFor(q)
      val body = rows.map { r =>
        cols.map {
          case "*" => fail("mock does not expand *")
          case c => jsonVal(r.getOrElse(c, null))
        }.mkString("[", ",", "]")
      }.mkString("", "\n", if (rows.nonEmpty) "\n" else "")
      (200, body, Map.empty[String, String])
    } else (500, s"mock: unhandled query: $q", Map.empty[String, String])
  }

  private lazy val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val (code, resp, headers) =
          try handleQuery(body)
          catch { case e: Throwable => (500, s"mock error: $e", Map.empty[String, String]) }
        headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
        val bytes = resp.getBytes(UTF_8)
        ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
        if (bytes.nonEmpty) {
          val os = ex.getResponseBody
          try os.write(bytes) finally os.close()
        }
        ex.close()
      }
    })
    s.start()
    s
  }

  private lazy val endpoint = s"http://127.0.0.1:${server.getAddress.getPort}"
  private lazy val client = new HttpClickHouseClient(endpoint)

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.driver.maxResultSize", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // unique catalog name per suite (shared JVM session)
    s.conf.set("spark.sql.catalog.chhttp", classOf[graft.catalog.ClickHouseCatalog].getName)
    s.conf.set("spark.sql.catalog.chhttp.endpoint", endpoint)
    s.conf.set("spark.sql.catalog.chhttp.read.streams", "4")
    s.conf.set("spark.sql.catalog.chhttp.read.split_by", "id")
    s
  }

  test("metadata round-trip over the wire protocol") {
    assert(client.listDatabases() == Seq("default", "main"))
    assert(client.listTables("main").contains("events_http"))
    assert(client.tableExists("main", "events_http"))
    assert(!client.tableExists("main", "nope"))
    assert(client.fetchColumns("main", "events_http") == colTypes)
    assert(client.fetchTableOptions("main", "events_http") ==
      Map("engine" -> "MergeTree", "order_by" -> "id"))
    assert(client.tableSizeBytes("main", "events_http").contains(123456L))
  }

  test("planQuery streams JSONCompactEachRow executor-side") {
    val (schema, handles) = client.planQuery(
      "SELECT `id`, `name`, `val` FROM `main`.`events_http`", 1)
    assert(schema.fieldNames.toSeq == Seq("id", "name", "val"))
    assert(handles.size == 1)
    val rows = client.readPartition(handles.head).toSeq
    assert(rows.size == baseRows.size)
    assert(rows.exists(_.isNullAt(0))) // NULL id survives decode
    assert(rows.map(r => Option(r.get(1)).orNull).contains("z"))
  }

  test("range-split read: N disjoint covering slices, nothing lost") {
    queries.synchronized(queries.clear())
    val df = spark.table("chhttp.main.events_http")
    assert(df.rdd.getNumPartitions == 4)
    val got = df.collect()
    assert(got.length == baseRows.size) // all rows exactly once, NULL id incl.
    assert(got.count(_.isNullAt(0)) == 1)
    val rangeQs = queries.synchronized(
      queries.filter(_.contains("WHERE (`id`")).toSeq)
    assert(rangeQs.size == 4)
    // slices are disjoint and cover [1, 21]: range starts are strictly
    // increasing, each next lo = previous hi + 1
    val Range = raw"`id` >= (-?\d+) AND `id` <= (-?\d+)".r.unanchored
    val bounds = rangeQs.flatMap {
      case Range(lo, hi) => Some(lo.toLong -> hi.toLong)
      case _ => None
    }.sorted
    assert(bounds.size == 3) // first slice is the <= OR IS NULL form
    assert(bounds.sliding(2).forall {
      case Seq((_, h1), (l2, _)) => l2 == h1 + 1
      case _ => true
    })
    assert(bounds.last._2 == 21L)
  }

  test("catalog DDL + staged DSv2 write land via wire inserts") {
    spark.sql(
      """CREATE TABLE chhttp.main.scores (id BIGINT, score DOUBLE)
        |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'id')""".stripMargin)
    assert(dynTables.contains("scores"))
    import spark.implicits._
    Seq((100L, 0.5), (101L, 0.7)).toDF("id", "score")
      .writeTo("chhttp.main.scores").append()
    val landed = dynTables("scores")._2
    assert(landed.size == 2)
    assert(landed.exists(r => r("id") == 100L && r("score") == 0.5))
    // the staged protocol went through a side table: create-as + commit
    val staged = queries.synchronized(queries.exists(q =>
      q.startsWith("CREATE TABLE IF NOT EXISTS `main`.`scores__stg_") &&
        q.contains("AS `main`.`scores`")))
    assert(staged)
    assert(dynTables.keys.filter(_.startsWith("scores__stg")).isEmpty) // dropped
  }

  test("insertSelect returns written_rows from the summary header") {
    dynTables("src_copy") = (colTypes, mutable.ArrayBuffer(
      Map[String, Any]("id" -> 7L, "name" -> "s", "val" -> 0.25)))
    client.createTable("main", "dst_copy", colTypes, Map("engine" -> "MergeTree"))
    val n = client.insertSelect("main", "dst_copy",
      "SELECT * FROM `main`.`src_copy`")
    assert(n == 1L)
    assert(dynTables("dst_copy")._2.size == 1)
  }

  test("epoch markers: first commit wins, replay detected") {
    assert(client.tryMarkEpochCommitted("main", "scores", "epoch-7"))
    assert(!client.tryMarkEpochCommitted("main", "scores", "epoch-7"))
    assert(client.tryMarkEpochCommitted("main", "scores", "epoch-8"))
  }

  test("planQueryRanges survives a full-64-bit cursor span (hash cursors): " +
    "`hi - lo` would wrap Long; slices stay disjoint-covering, no row lost") {
    dynTables("hash_t") = (colTypes, mutable.ArrayBuffer(
      Map[String, Any]("id" -> Long.MinValue, "name" -> "lo", "val" -> 0.1),
      Map[String, Any]("id" -> -1L, "name" -> "m1", "val" -> 0.2),
      Map[String, Any]("id" -> 0L, "name" -> "z0", "val" -> 0.3),
      Map[String, Any]("id" -> (Long.MaxValue - 1), "name" -> "hi", "val" -> 0.4),
      Map[String, Any]("id" -> null, "name" -> "nn", "val" -> 0.5)))
    val (schema, handles) = client.planQueryRanges(
      "SELECT `id`, `name`, `val` FROM `main`.`hash_t`", "id", 4)
    assert(handles.size == 4)
    val rows = handles.flatMap(h => client.readPartition(h).toSeq)
    assert(rows.size == 5) // every row exactly once, NULL id included
    assert(rows.count(_.isNullAt(0)) == 1)
    assert(schema.fieldNames.head == "id")
  }

  test("planQueryRanges falls back to one stream for empty results") {
    dynTables("empty_t") = (colTypes, mutable.ArrayBuffer.empty)
    val (_, handles) = client.planQueryRanges(
      "SELECT `id`, `name`, `val` FROM `main`.`empty_t`", "id", 4)
    assert(handles.size == 1)
  }
}
