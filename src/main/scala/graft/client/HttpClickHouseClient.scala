package graft.client

import java.io.{BufferedReader, InputStream, InputStreamReader, OutputStream}
import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.ArrayBuffer

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.types.ClickHouseType

/** [[ClickHouseClient]] over ClickHouse's public HTTP interface
  * (https://clickhouse.com/docs/en/interfaces/http): queries POST to the
  * endpoint, results stream back as `JSONCompactEachRow`, inserts ship as
  * `JSONEachRow` bodies. This is the wire-transport counterpart of the
  * reference's pooled native connection (/root/reference/src/connection.rs:
  * 107-178, 216-296) re-expressed over the protocol every ClickHouse
  * deployment exposes without extra drivers — the whole class uses only the
  * JDK HTTP stack plus Jackson (already on Spark's classpath).
  *
  * Scale shape: the DRIVER only ever runs metadata statements (DESCRIBE,
  * system.* lookups, scalar min/max). Result rows stream EXECUTOR-side:
  * [[planQuery]] returns handles carrying the SQL, and each task opens its
  * own HTTP response stream and decodes incrementally — no materialization
  * anywhere, matching the embedded transport's contract. [[planQueryRanges]]
  * splits one scan into N disjoint cursor ranges so a huge remote table
  * reads in parallel across executors (SURVEY §4 "split by ORDER BY
  * ranges").
  *
  * Hermetic testing: [[HttpClientSpec]] runs this against an in-JVM mock
  * ClickHouse HTTP server (the reference's `mocks` feature,
  * connection/mock.rs); point `CH_ENDPOINT` at a real server to run the
  * same suite over a live wire.
  */
class HttpClickHouseClient(
    val endpoint: String,
    user: String = "default",
    password: String = "",
    defaultDatabase: String = "default",
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 300000)
  extends ClickHouseClient {

  override def connectionKey: String = s"http:$endpoint:$user"

  // session_timezone pins DateTime rendering to UTC so parsed micros are
  // wall-time-stable regardless of server tz; quote_64bit off keeps Int64
  // as JSON numbers
  private def baseSettings: Map[String, String] = Map(
    "session_timezone" -> "UTC",
    "output_format_json_quote_64bit_integers" -> "0")

  // ---- low-level HTTP ----

  private def open(settings: Map[String, String]): HttpURLConnection = {
    val qs = (baseSettings ++ settings).map { case (k, v) =>
      s"${URLEncoder.encode(k, UTF_8)}=${URLEncoder.encode(v, UTF_8)}"
    }.mkString("&")
    val url = URI.create(s"$endpoint/?$qs").toURL
    val c = url.openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod("POST")
    c.setDoOutput(true)
    c.setConnectTimeout(connectTimeoutMs)
    c.setReadTimeout(readTimeoutMs)
    c.setRequestProperty("X-ClickHouse-User", user)
    if (password.nonEmpty) c.setRequestProperty("X-ClickHouse-Key", password)
    c.setRequestProperty("Content-Type", "text/plain; charset=UTF-8")
    c
  }

  private def failFor(c: HttpURLConnection, sql: String): Nothing = {
    val err = Option(c.getErrorStream).map { es =>
      try scala.io.Source.fromInputStream(es, "UTF-8").mkString finally es.close()
    }.getOrElse("")
    throw new RuntimeException(
      s"ClickHouse HTTP ${c.getResponseCode} for: ${sql.take(500)}\n$err")
  }

  /** Driver-side statement: send, return the full (small) response body. */
  private def exec(sql: String, settings: Map[String, String] = Map.empty): String = {
    val c = open(settings)
    val out = c.getOutputStream
    try { out.write(sql.getBytes(UTF_8)) } finally out.close()
    if (c.getResponseCode != 200) failFor(c, sql)
    val in = c.getInputStream
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  /** Like exec but returns a response header (X-ClickHouse-Summary). */
  private def execWithSummary(sql: String): (String, Option[String]) = {
    val c = open(Map("send_progress_in_http_headers" -> "1"))
    val out = c.getOutputStream
    try { out.write(sql.getBytes(UTF_8)) } finally out.close()
    if (c.getResponseCode != 200) failFor(c, sql)
    val in = c.getInputStream
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    (body, Option(c.getHeaderField("X-ClickHouse-Summary")))
  }

  private def tsv(sql: String): Seq[Array[String]] =
    exec(sql).split("\n").iterator.filter(_.nonEmpty).map(_.split("\t", -1)).toSeq

  private def lit(s: String): String = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  // ---- metadata ----

  override def listDatabases(): Seq[String] =
    tsv("SELECT name FROM system.databases ORDER BY name FORMAT TabSeparated").map(_(0))

  override def listTables(db: String): Seq[String] =
    tsv(s"SELECT name FROM system.tables WHERE database = ${lit(db)} " +
      "ORDER BY name FORMAT TabSeparated").map(_(0))

  override def tableExists(db: String, table: String): Boolean =
    tsv(s"SELECT count() FROM system.tables WHERE database = ${lit(db)} " +
      s"AND name = ${lit(table)} FORMAT TabSeparated").head(0).toLong > 0

  override def fetchColumns(db: String, table: String): Seq[(String, String)] =
    tsv(s"SELECT name, type FROM system.columns WHERE database = ${lit(db)} " +
      s"AND table = ${lit(table)} ORDER BY position FORMAT TabSeparated")
      .map(a => a(0) -> a(1))

  override def fetchTableOptions(db: String, table: String): Map[String, String] =
    tsv(s"SELECT engine, sorting_key, partition_key FROM system.tables " +
      s"WHERE database = ${lit(db)} AND name = ${lit(table)} FORMAT TabSeparated")
      .headOption.map { a =>
        Map("engine" -> a(0)) ++
          (if (a.length > 1 && a(1).nonEmpty) Map("order_by" -> a(1)) else Map.empty) ++
          (if (a.length > 2 && a(2).nonEmpty) Map("partition_by" -> a(2)) else Map.empty)
      }.getOrElse(Map.empty)

  override def tableSizeBytes(db: String, table: String): Option[Long] =
    tsv(s"SELECT sum(bytes_on_disk) FROM system.parts WHERE active " +
      s"AND database = ${lit(db)} AND table = ${lit(table)} FORMAT TabSeparated")
      .headOption.flatMap(a => scala.util.Try(a(0).toLong).toOption).filter(_ > 0)

  // ---- DDL ----

  override def createDatabase(db: String, ifNotExists: Boolean = true): Unit = {
    val ine = if (ifNotExists) "IF NOT EXISTS " else ""
    exec(s"CREATE DATABASE $ine`$db`")
    ()
  }

  override def dropDatabase(db: String): Unit = { exec(s"DROP DATABASE IF EXISTS `$db`"); () }

  override def createTable(
      db: String,
      table: String,
      columns: Seq[(String, String)],
      options: Map[String, String]): Unit = {
    columns.foreach { case (_, t) => ClickHouseType.parse(t) } // validate early
    val cols = columns.map { case (n, t) => s"`$n` $t" }.mkString(", ")
    val engine = options.getOrElse("engine", "MergeTree")
    val b = new StringBuilder(s"CREATE TABLE `$db`.`$table` ($cols) ENGINE = $engine")
    // MergeTree family requires ORDER BY; tuple() = unordered
    if (engine.contains("MergeTree"))
      b.append(" ORDER BY ").append(
        options.get("order_by").map(o => s"($o)").getOrElse("tuple()"))
    options.get("partition_by").foreach(p => b.append(s" PARTITION BY ($p)"))
    options.get("ttl").foreach(t => b.append(s" TTL $t"))
    options.get("settings").foreach(s => b.append(s" SETTINGS $s"))
    exec(b.toString)
    ()
  }

  override def dropTable(db: String, table: String): Unit = {
    exec(s"DROP TABLE IF EXISTS `$db`.`$table`"); ()
  }

  // ---- reads ----

  override def planQuery(sql: String, numStreams: Int): (StructType, Seq[ChPartitionHandle]) = {
    val schema = describe(sql)
    (schema, Seq(HttpQueryHandle(endpoint, user, password, sql, schema.json,
      connectTimeoutMs, readTimeoutMs)))
  }

  /** Parallel read of ONE remote query: probe min/max of the split column
    * (one scalar statement), carve [lo, hi] into `numStreams` disjoint
    * covering ranges, and emit one range-bounded handle per stream — each
    * executor task then pulls only its slice, the HTTP analog of
    * per-shard native streams. NULL cursor rows ride with the first range.
    */
  override def planQueryRanges(
      sql: String,
      splitColumn: String,
      numStreams: Int): (StructType, Seq[ChPartitionHandle]) = {
    val schema = describe(sql)
    require(schema.fieldNames.contains(splitColumn),
      s"split column '$splitColumn' not in result schema ${schema.fieldNames.mkString(",")}")
    if (numStreams <= 1) return (schema, Seq(
      HttpQueryHandle(endpoint, user, password, sql, schema.json,
        connectTimeoutMs, readTimeoutMs)))
    val mm = tsv(s"SELECT min(`$splitColumn`), max(`$splitColumn`) FROM ($sql) AS __mm " +
      "FORMAT TabSeparated").head
    val (lo, hi) =
      (scala.util.Try(mm(0).toLong).toOption, scala.util.Try(mm(1).toLong).toOption) match {
        case (Some(a), Some(b)) => (a, b)
        case _ => // empty table or non-integral column: single stream
          return (schema, Seq(HttpQueryHandle(endpoint, user, password, sql,
            schema.json, connectTimeoutMs, readTimeoutMs)))
      }
    // Range arithmetic in BigInt: `hi - lo` overflows Long when the cursor
    // spans more than half the 64-bit range (hash cursors like cityHash64
    // do), and a wrapped-negative span would silently confine every range
    // to range 0 and drop rows. BigInt keeps the slices exact; only the
    // final bounds (each within [lo, hi]) are narrowed back to Long.
    val width = BigInt(hi) - BigInt(lo)
    val n = (BigInt(numStreams) min (width + 1)).toInt
    val span = width / n + 1
    val handles = (0 until n).flatMap { i =>
      val rlo = BigInt(lo) + BigInt(i) * span
      if (rlo > hi) None
      else {
        val rhi = (rlo + span - 1) min BigInt(hi)
        val cond =
          if (i == 0) s"(`$splitColumn` <= ${rhi.toLong} OR `$splitColumn` IS NULL)"
          else s"(`$splitColumn` >= ${rlo.toLong} AND `$splitColumn` <= ${rhi.toLong})"
        Some(HttpQueryHandle(endpoint, user, password,
          s"SELECT * FROM ($sql) AS __rs WHERE $cond", schema.json,
          connectTimeoutMs, readTimeoutMs))
      }
    }
    (schema, handles)
  }

  private def describe(sql: String): StructType = {
    val cols = tsv(s"DESCRIBE TABLE ($sql) FORMAT TabSeparated").map(a => a(0) -> a(1))
    require(cols.nonEmpty, s"DESCRIBE returned no columns for: ${sql.take(200)}")
    ClickHouseType.toStructType(cols)
  }

  override def readPartition(handle: ChPartitionHandle): Iterator[Row] = handle match {
    case h: HttpQueryHandle =>
      val schema = DataType.fromJson(h.schemaJson).asInstanceOf[StructType]
      val de = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(schema)
        .resolveAndBind().createDeserializer()
      readPartitionInternal(h, schema).map(de(_))
    case other => throw new IllegalArgumentException(
      s"not an HTTP handle: ${other.getClass.getName}")
  }

  override def readPartitionInternal(
      handle: ChPartitionHandle,
      schema: StructType): Iterator[InternalRow] = handle match {
    case h: HttpQueryHandle => HttpClickHouseClient.streamRows(h, schema)
    case other => throw new IllegalArgumentException(
      s"not an HTTP handle: ${other.getClass.getName}")
  }

  // ---- writes ----

  override def insert(db: String, table: String, schema: StructType, rows: Seq[Row]): Long = {
    if (rows.isEmpty) return 0L
    val cols = schema.fieldNames.map(n => s"`$n`").mkString(", ")
    val body = new StringBuilder
    rows.foreach { r => HttpClickHouseClient.rowJson(body, r, schema); body.append('\n') }
    exec(s"INSERT INTO `$db`.`$table` ($cols) FORMAT JSONEachRow\n$body")
    rows.length.toLong
  }

  override def insertSelect(db: String, table: String, chSelectSql: String): Long = {
    val (_, summary) = execWithSummary(s"INSERT INTO `$db`.`$table` $chSelectSql")
    summary.flatMap { s =>
      scala.util.Try(new ObjectMapper().readTree(s).get("written_rows").asLong).toOption
    }.getOrElse(0L)
  }

  // ---- staged (exactly-once) writes: stage = side table, commit = server
  // INSERT SELECT + drop, abort = drop. Parts land atomically per INSERT,
  // so a replayed commit converges via the epoch marker below. ----

  private def stageName(table: String, stagingId: String): String =
    s"${table}__stg_${stagingId.replaceAll("[^a-zA-Z0-9]", "_")}"

  override def stageInsert(
      db: String, table: String, schema: StructType, rows: Seq[Row],
      stagingId: String): Long = {
    val stg = stageName(table, stagingId)
    exec(s"CREATE TABLE IF NOT EXISTS `$db`.`$stg` AS `$db`.`$table`")
    insert(db, stg, schema, rows)
  }

  override def commitStaged(db: String, table: String, stagingId: String): Unit = {
    val stg = stageName(table, stagingId)
    exec(s"INSERT INTO `$db`.`$table` SELECT * FROM `$db`.`$stg`")
    exec(s"DROP TABLE IF EXISTS `$db`.`$stg`")
    ()
  }

  override def abortStaged(db: String, table: String, stagingId: String): Unit = {
    exec(s"DROP TABLE IF EXISTS `$db`.`${stageName(table, stagingId)}`"); ()
  }

  /** Durable epoch marker in a server-side table. Best-effort check-then-
    * insert: Spark replays epochs sequentially (never two commits of the
    * same epoch racing), so the non-transactional window is unreachable
    * in practice; a keeper-backed insert token would close it entirely.
    */
  override def tryMarkEpochCommitted(db: String, table: String, marker: String): Boolean = {
    exec(s"CREATE TABLE IF NOT EXISTS `$db`.`__graft_epochs` (m String) " +
      "ENGINE = MergeTree ORDER BY m")
    val seen = tsv(s"SELECT count() FROM `$db`.`__graft_epochs` " +
      s"WHERE m = ${lit(marker)} FORMAT TabSeparated").head(0).toLong > 0
    if (seen) false
    else {
      exec(s"INSERT INTO `$db`.`__graft_epochs` (m) FORMAT JSONEachRow\n" +
        s"""{"m":${HttpClickHouseClient.jsonString(marker)}}""")
      true
    }
  }
}

/** Serializable per-stream handle: carries everything a task needs to open
  * its own HTTP response stream executor-side.
  */
final case class HttpQueryHandle(
    endpoint: String,
    user: String,
    password: String,
    sql: String,
    schemaJson: String,
    connectTimeoutMs: Int,
    readTimeoutMs: Int)
  extends ChPartitionHandle {
  // case-class toString reaches partition debug strings and task-failure
  // logs — never echo the credential
  override def toString: String =
    s"HttpQueryHandle($endpoint,$user,***,${sql.take(120)},...)"
}

object HttpClickHouseClient {

  private val mapper = new ObjectMapper()

  /** Open the handle's query as a streaming JSONCompactEachRow response and
    * decode line-by-line into InternalRow — constant memory, executor-side.
    */
  private[client] def streamRows(
      h: HttpQueryHandle, schema: StructType): Iterator[InternalRow] with AutoCloseable =
    new Iterator[InternalRow] with AutoCloseable {
      private var reader: BufferedReader = _
      private var conn: HttpURLConnection = _
      private var nextLine: String = _
      private var opened = false

      private def ensureOpen(): Unit = if (!opened) {
        opened = true
        val qs = Map(
          "session_timezone" -> "UTC",
          "output_format_json_quote_64bit_integers" -> "0").map { case (k, v) =>
          s"${URLEncoder.encode(k, UTF_8)}=${URLEncoder.encode(v, UTF_8)}"
        }.mkString("&")
        conn = URI.create(s"${h.endpoint}/?$qs").toURL
          .openConnection().asInstanceOf[HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        conn.setConnectTimeout(h.connectTimeoutMs)
        conn.setReadTimeout(h.readTimeoutMs)
        conn.setRequestProperty("X-ClickHouse-User", h.user)
        if (h.password.nonEmpty) conn.setRequestProperty("X-ClickHouse-Key", h.password)
        val out: OutputStream = conn.getOutputStream
        try out.write(s"${h.sql} FORMAT JSONCompactEachRow".getBytes(UTF_8))
        finally out.close()
        if (conn.getResponseCode != 200) {
          val err = Option(conn.getErrorStream).map { es =>
            try scala.io.Source.fromInputStream(es, "UTF-8").mkString finally es.close()
          }.getOrElse("")
          throw new RuntimeException(
            s"ClickHouse HTTP ${conn.getResponseCode} for: ${h.sql.take(500)}\n$err")
        }
        val in: InputStream = conn.getInputStream
        reader = new BufferedReader(new InputStreamReader(in, UTF_8))
        advance()
      }

      private def advance(): Unit = {
        nextLine = reader.readLine()
        while (nextLine != null && nextLine.isEmpty) nextLine = reader.readLine()
        if (nextLine == null) close()
      }

      override def hasNext: Boolean = { ensureOpen(); nextLine != null }

      override def next(): InternalRow = {
        ensureOpen()
        if (nextLine == null) throw new NoSuchElementException
        val arr = mapper.readTree(nextLine)
        val row = new GenericInternalRow(schema.length)
        var i = 0
        while (i < schema.length) {
          row.update(i, fromJson(arr.get(i), schema(i).dataType))
          i += 1
        }
        advance()
        row
      }

      override def close(): Unit = {
        if (reader != null) { try reader.close() catch { case _: Exception => () } }
        if (conn != null) conn.disconnect()
      }
    }

  /** JSON value → Catalyst value for one ClickHouse-rendered field. */
  private[client] def fromJson(n: JsonNode, dt: DataType): Any = {
    if (n == null || n.isNull) return null
    dt match {
      case BooleanType => if (n.isBoolean) n.asBoolean else n.asInt != 0
      case ByteType => n.asInt.toByte
      case ShortType => n.asInt.toShort
      case IntegerType => n.asInt
      case LongType =>
        // UInt64 above Long.MaxValue arrives as a (possibly quoted) big
        // integer; wrap like the parquet path would
        if (n.isBigInteger || (n.isTextual && n.asText.length > 18))
          new java.math.BigInteger(n.asText).longValue
        else n.asLong
      case FloatType => parseDouble(n).toFloat
      case DoubleType => parseDouble(n)
      case StringType => UTF8String.fromString(n.asText)
      case BinaryType => n.asText.getBytes(UTF_8)
      case d: DecimalType =>
        Decimal(new java.math.BigDecimal(n.asText), d.precision, d.scale)
      case DateType =>
        java.time.LocalDate.parse(n.asText).toEpochDay.toInt
      case TimestampType | TimestampNTZType =>
        val t = n.asText
        val ldt = java.time.LocalDateTime.parse(t.replace(' ', 'T'))
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
      case ArrayType(et, _) =>
        val vals = new Array[Any](n.size)
        var i = 0
        while (i < n.size) { vals(i) = fromJson(n.get(i), et); i += 1 }
        new GenericArrayData(vals)
      case MapType(StringType, vt, _) =>
        val keys = ArrayBuffer.empty[Any]
        val vals = ArrayBuffer.empty[Any]
        val it = n.fields()
        while (it.hasNext) {
          val e = it.next()
          keys += UTF8String.fromString(e.getKey)
          vals += fromJson(e.getValue, vt)
        }
        ArrayBasedMapData(keys.toArray, vals.toArray)
      case other =>
        throw new IllegalArgumentException(s"unsupported read type $other")
    }
  }

  private def parseDouble(n: JsonNode): Double =
    if (n.isNumber) n.asDouble
    else n.asText match {
      case "nan" | "NaN" => Double.NaN
      case "inf" | "+inf" | "Infinity" => Double.PositiveInfinity
      case "-inf" | "-Infinity" => Double.NegativeInfinity
      case t => t.toDouble
    }

  private[client] def jsonString(s: String): String =
    mapper.writeValueAsString(s)

  /** Append one external Row as a JSONEachRow object. */
  private[client] def rowJson(b: StringBuilder, r: Row, schema: StructType): Unit = {
    b.append('{')
    var i = 0
    while (i < schema.length) {
      if (i > 0) b.append(',')
      b.append(jsonString(schema(i).name)).append(':')
      valueJson(b, if (r.isNullAt(i)) null else r.get(i), schema(i).dataType)
      i += 1
    }
    b.append('}')
  }

  private def valueJson(b: StringBuilder, v: Any, dt: DataType): Unit = (v, dt) match {
    case (null, _) => b.append("null")
    case (x: Boolean, _) => b.append(if (x) "true" else "false")
    case (x: Byte, _) => b.append(x.toString)
    case (x: Short, _) => b.append(x.toString)
    case (x: Int, _) => b.append(x.toString)
    case (x: Long, _) => b.append(x.toString)
    case (x: Float, _) => b.append(floatRepr(x.toDouble))
    case (x: Double, _) => b.append(floatRepr(x))
    case (x: java.math.BigDecimal, _) => b.append(x.toPlainString)
    case (x: BigDecimal, _) => b.append(x.underlying.toPlainString)
    case (x: String, _) => b.append(jsonString(x))
    case (x: Array[Byte], _) => b.append(jsonString(new String(x, UTF_8)))
    case (x: java.sql.Timestamp, _) =>
      b.append(jsonString(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS").withZone(java.time.ZoneOffset.UTC)
        .format(x.toInstant)))
    case (x: java.time.Instant, _) =>
      b.append(jsonString(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS").withZone(java.time.ZoneOffset.UTC)
        .format(x)))
    case (x: java.sql.Date, _) => b.append(jsonString(x.toString))
    case (x: java.time.LocalDate, _) => b.append(jsonString(x.toString))
    case (x: scala.collection.Seq[_], ArrayType(et, _)) =>
      b.append('[')
      var first = true
      x.foreach { e =>
        if (!first) b.append(',')
        first = false
        valueJson(b, e, et)
      }
      b.append(']')
    case (x, other) => throw new IllegalArgumentException(
      s"unsupported insert value ${x.getClass.getName} for $other")
  }

  private def floatRepr(d: Double): String =
    if (d.isNaN) "\"nan\""
    else if (d.isPosInfinity) "\"inf\""
    else if (d.isNegInfinity) "\"-inf\""
    else d.toString
}
