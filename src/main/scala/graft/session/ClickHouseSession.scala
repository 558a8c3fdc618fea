package graft.session

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.client.{ClickHouseClient, EmbeddedClickHouse}

/** Fluent convenience wrapper (the analog of the reference's
  * `ClickHouseBuilder` / `ClickHouseCatalogBuilder` /
  * `ClickHouseTableCreator` DDL chain, /root/reference/src/builders.rs):
  *
  * {{{
  *   val ch = ClickHouseSession.builder(spark)
  *     .storePath("/data/chstore").catalogName("clickhouse").build()
  *   ch.createDatabase("analytics")
  *   ch.newTable("analytics", "events")
  *     .column("id", "Int64").column("name", "Nullable(String)")
  *     .engine("MergeTree").orderBy("id").create()
  *   ch.table("analytics", "events")          // DataFrame via the catalog
  *   ch.sql("SELECT * FROM clickhouse.analytics.events")
  * }}}
  */
final class ClickHouseSession private (
    val spark: SparkSession,
    val catalogName: String,
    val client: ClickHouseClient) {

  /** Reads resolve through the catalog plugin — full pushdown applies. */
  def table(db: String, name: String): DataFrame =
    spark.table(s"$catalogName.$db.$name")

  def sql(query: String): DataFrame = spark.sql(query)

  /** Raw ClickHouse-SQL passthrough as a LAZY DataFrame: the statement
    * ships verbatim and executes where the data lives (the reference's
    * core contract — any server construct works: FINAL, SAMPLE,
    * LIMIT BY (embedded: rewritten to a row_number window, top level,
    * ORDER BY required), arrayJoin, every server function), streamed over
    * `streams` executor partitions. Schema comes from the server's
    * `DESCRIBE TABLE (SELECT ...)` without executing; Spark transforms
    * compose on top (the frame is a leaf the optimizer cannot reach
    * into, so pushdown INTO the statement is the author's job).
    */
  def chSql(chSelectSql: String, streams: Int = 8): DataFrame = {
    require(streams > 0, s"streams must be positive: $streams")
    // WITH TOTALS + HAVING: pin the one documented totals mode
    // (after_having_exclusive) on the shipped statement, so a real server
    // behaves identically to the embedded rewrite regardless of its
    // configured totals_mode default
    // a trailing FORMAT clause names a wire rendering the connector owns
    // (RowBinary on HTTP, in-process frames embedded) — strip it here so
    // the shipped statement never carries two FORMAT clauses
    val stmt = graft.client.ChSqlTranslator.pinTotalsMode(
      graft.client.ChSqlTranslator.stripFormat(chSelectSql))
    val schema = client.describeQuery(stmt)
    val attrs = schema.fields.toSeq.map(f =>
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        f.name, f.dataType, f.nullable)())
    org.apache.spark.sql.graft.bridge.ofRows(spark,
      graft.pushdown.ClickHouseRemoteNode(attrs, stmt, client, streams))
  }

  def createDatabase(db: String): Unit = client.createDatabase(db)

  /** Run one INSERT statement and return the number of rows it wrote —
    * the SQL-visible count the reference returns as a one-row batch
    * (tests/common/helpers.rs:157-170), which Spark's AppendData only
    * surfaces as the `chRowsInserted` UI metric. Works for both the DSv2
    * write path and the collapsed server-side INSERT SELECT (their
    * commits record on the statement's own thread).
    */
  def insertReturningCount(insertSql: String): Long =
    graft.connector.ChInsertCount.captured {
      spark.sql(insertSql).collect(); ()
    }

  /** Rows committed by the most recent batch insert into `db`.`table`
    * over this session's connection (this JVM); None before any insert.
    */
  def lastInsertCount(db: String, table: String): Option[Long] =
    graft.connector.ChInsertCount.lastFor(client.connectionKey, db, table)

  /** Server-side `INSERT INTO db.table SELECT ...` — the SELECT is
    * ClickHouse SQL executed where the data lives; zero rows transfer.
    */
  def insertSelect(db: String, table: String, chSelectSql: String): Long = {
    val n = client.insertSelect(db, table, chSelectSql)
    graft.connector.ChInsertCount.record(client.connectionKey, db, table, n)
    // the insert may have fired materialized views into other tables
    graft.connector.ChMutations.drainMvRefresh(spark)
    n
  }

  /** `CREATE MATERIALIZED VIEW db.name TO targetDb.targetTable
    * [POPULATE] AS select` — server insert-trigger semantics (per-block
    * transforms, partial aggregates in the target; readers
    * re-aggregate). The select is ClickHouse SQL over exactly one
    * source table. `populate` backfills the target from the source's
    * existing rows strictly before the trigger arms (miss-not-double).
    */
  def createMaterializedView(db: String, name: String, targetDb: String,
      targetTable: String, chSelectSql: String,
      populate: Boolean = false): Unit = {
    client.createMaterializedView(
      db, name, targetDb, targetTable, chSelectSql, populate)
    // the backfill may have fired the target's own views too
    if (populate) graft.connector.ChMutations.drainMvRefresh(spark)
  }
  def materializedViews(db: String): Seq[String] =
    client.listMaterializedViews(db)
  def dropMaterializedView(db: String, name: String): Unit =
    client.dropMaterializedView(db, name)
  def dropDatabase(db: String): Unit = client.dropDatabase(db)
  def dropTable(db: String, name: String): Unit = client.dropTable(db, name)
  def databases: Seq[String] = client.listDatabases()
  def tables(db: String): Seq[String] = client.listTables(db)

  /** Schema evolution with ClickHouse types, same path as SQL ALTER.
    * Every entry point refreshes cached plans over the table — the DDL
    * runs outside Spark's own invalidation hooks (ChMutations.refresh).
    */
  private def alter(db: String, table: String, op: graft.client.ChAlterOp): Unit = {
    client.alterTable(db, table, Seq(op))
    graft.connector.ChMutations.refresh(spark, s"$catalogName.$db.$table")
  }
  def addColumn(db: String, table: String, col: String, chType: String): Unit =
    alter(db, table, graft.client.ChAlterOp.AddColumn(col, chType))
  def dropColumn(db: String, table: String, col: String): Unit =
    alter(db, table, graft.client.ChAlterOp.DropColumn(col))
  def renameColumn(db: String, table: String, from: String, to: String): Unit =
    alter(db, table, graft.client.ChAlterOp.RenameColumn(from, to))
  def modifyColumn(db: String, table: String, col: String, chType: String): Unit =
    alter(db, table, graft.client.ChAlterOp.ModifyType(col, chType))
  def renameTable(db: String, table: String, newDb: String, newTable: String): Unit = {
    // refresh while the OLD name still resolves
    graft.connector.ChMutations.refresh(spark, s"$catalogName.$db.$table")
    client.renameTable(db, table, newDb, newTable)
  }
  def optimizeTable(db: String, table: String, finalize: Boolean = false): Unit = {
    client.optimizeTable(db, table, finalize)
    // OPTIMIZE FINAL changes visible rows on Replacing engines — drop
    // any cached plans over the table (see ChMutations.refresh)
    graft.connector.ChMutations.refresh(spark, s"$catalogName.$db.$table")
  }
  /** `OPTIMIZE TABLE ... FINAL DEDUPLICATE [BY (cols)]`. */
  def optimizeDeduplicate(
      db: String, table: String, byColumns: Seq[String] = Seq.empty): Unit = {
    client.optimizeDeduplicate(db, table, byColumns)
    graft.connector.ChMutations.refresh(spark, s"$catalogName.$db.$table")
  }
  /** `TRUNCATE TABLE` — metadata-speed part removal, table stays. */
  def truncateTable(db: String, table: String): Unit = {
    client.truncateTable(db, table)
    graft.connector.ChMutations.refresh(spark, s"$catalogName.$db.$table")
  }
  /** `EXCHANGE TABLES a AND b` — atomic swap (blue/green publish). */
  def exchangeTables(db: String, a: String, db2: String, b: String): Unit = {
    client.exchangeTables(db, a, db2, b)
    graft.connector.ChMutations.refresh(spark, s"$catalogName.$db.$a")
    graft.connector.ChMutations.refresh(spark, s"$catalogName.$db2.$b")
  }
  /** `ALTER TABLE ... DROP PARTITION <value>` — expire one partition. */
  def dropPartition(db: String, table: String, partitionValue: String): Unit = {
    client.dropPartition(db, table, partitionValue)
    graft.connector.ChMutations.refresh(spark, s"$catalogName.$db.$table")
  }
  /** `ALTER TABLE ... ATTACH PARTITION ... FROM src` for every source
    * partition — metadata-speed part clone between same-structure tables.
    */
  def attachPartitionsFrom(
      db: String, table: String, srcDb: String, srcTable: String): Unit = {
    client.attachPartitionsFrom(db, table, srcDb, srcTable)
    graft.connector.ChMutations.refresh(spark, s"$catalogName.$db.$table")
  }

  def newTable(db: String, name: String): TableCreator =
    new TableCreator(this, db, name)

  /** Mirrors ClickHouseTableCreator (builders.rs:358-401): columns with
    * ClickHouse types + engine options, funneled through the same create
    * path as SQL DDL.
    */
  final class TableCreator private[ClickHouseSession] (
      session: ClickHouseSession, db: String, name: String) {
    private var cols = Vector.empty[(String, String)]
    private var opts = Map("engine" -> "MergeTree")

    def column(colName: String, chType: String): TableCreator = {
      cols :+= (colName -> chType); this
    }
    def engine(e: String): TableCreator = { opts += ("engine" -> e); this }
    def orderBy(keys: String*): TableCreator = {
      opts += ("order_by" -> keys.mkString(", ")); this
    }
    def partitionBy(expr: String): TableCreator = {
      opts += ("partition_by" -> expr); this
    }
    def ttl(expr: String): TableCreator = { opts += ("ttl" -> expr); this }
    def setting(k: String, v: String): TableCreator = { opts += (k -> v); this }

    def create(): Unit = {
      require(cols.nonEmpty, s"table $db.$name needs at least one column")
      session.client.createTable(db, name, cols, opts)
    }
  }
}

object ClickHouseSession {

  def builder(spark: SparkSession): Builder = new Builder(spark)

  final class Builder private[ClickHouseSession] (spark: SparkSession) {
    private var path: Option[String] = None
    private var httpEndpoint: Option[String] = None
    private var name: String = "clickhouse"

    def storePath(p: String): Builder = { path = Some(p); this }
    /** Real HTTP transport — same grammar as the catalog `endpoint`
      * option (`r1|r2` replica sets, `a,b` shards). Mutually exclusive
      * with [[storePath]].
      */
    def endpoint(e: String): Builder = { httpEndpoint = Some(e); this }
    def catalogName(n: String): Builder = { name = n; this }

    /** Registers the catalog plugin + pushdown machinery on the session
      * (the `prepare_session_context` + `build_catalog` chain,
      * builders.rs:94-244).
      */
    def build(): ClickHouseSession = {
      require(path.isEmpty || httpEndpoint.isEmpty,
        "storePath and endpoint are mutually exclusive")
      val key = path.map(("path", _)).orElse(httpEndpoint.map(("endpoint", _)))
        .getOrElse(throw new IllegalArgumentException(
          "storePath or endpoint is required"))
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.catalog.ClickHouseCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.${key._1}", key._2)
      graft.GraftSession.install(spark)
      // always take the registered catalog's own client: it parses the
      // sharded (`a,b`) and replica (`r1|r2`) grammars and keeps pooling
      // and option validation in one place — a bare EmbeddedClickHouse
      // over a comma path would treat the WHOLE string as one store dir
      // (round-13 session-3 fix, found by the sharded-projection spec)
      val client = graft.connector.ChMutations.clientOf(spark, name)
      new ClickHouseSession(spark, name, client)
    }
  }
}
