package graft.catalog

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.client.{ClickHouseClient, EmbeddedClickHouse}
import graft.connector.ClickHouseTable
import graft.types.ClickHouseType

/** Spark catalog plugin exposing a ClickHouse server as a catalog:
  * namespaces = ClickHouse databases, tables = remote tables with schemas
  * fetched from the server (the Spark analog of the reference's
  * `ClickHouseCatalogProvider`/`SchemaProvider`,
  * /root/reference/src/providers/catalog.rs, and its table factory /
  * CREATE EXTERNAL TABLE option grammar, table_factory.rs + utils/params.rs).
  *
  * Register with:
  * {{{
  *   spark.conf.set("spark.sql.catalog.clickhouse", classOf[ClickHouseCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.clickhouse.path", "/path/to/store")
  *   spark.sql("SELECT * FROM clickhouse.db.tbl")
  * }}}
  *
  * Table properties understood by createTable (mirrors utils/params.rs
  * engine/order_by/partition_by/primary_keys/ttl/settings/defaults):
  * `engine` (default MergeTree), `order_by`, `partition_by`, `ttl`,
  * `settings`, `external_paths` (embedded transport: attach existing
  * parquet zero-copy).
  */
class ClickHouseCatalog extends TableCatalog with SupportsNamespaces
  with FunctionCatalog {

  private var catalogName: String = _
  private var client: ClickHouseClient with Serializable = _
  private var readStreams: Int = 4
  private var writeConcurrency: Int = 4
  private var writeBatchSize: Int = 10000
  private var writeDistribute: Boolean = true
  private var writeSortOnInsert: Boolean = false
  private var coerceSchemas: Boolean = true
  private var readDefaults: Map[String, String] = Map.empty

  def clickHouseClient: ClickHouseClient = client

  /** One URL/root → that transport; N → the sharded composite. `shard_by`
    * names the write-routing column and is only meaningful with shards.
    */
  private def shardedOrSingle(
      name: String,
      options: CaseInsensitiveStringMap,
      clients: IndexedSeq[ClickHouseClient with Serializable])
      : ClickHouseClient with Serializable = {
    val shardBy = Option(options.get("shard_by")).map(_.trim).filter(_.nonEmpty)
    if (clients.size == 1) {
      if (shardBy.isDefined) throw new IllegalArgumentException(
        s"option 'shard_by' of catalog '$name' requires a comma-separated " +
          "shard list in endpoint/path (a single store has nothing to route)")
      clients.head
    } else new graft.client.ShardedClickHouseClient(clients, shardBy)
  }

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    // full params.rs-style key validation: unknown keys and mistyped
    // values fail here, at catalog setup, not mid-query
    ChOptions.validateCatalogOptions(name, options.asScala.toMap)
    // transport selection (the reference's mock-vs-real split,
    // connection.rs:1-37): `endpoint` = real ClickHouse over HTTP;
    // `path` = the hermetic embedded store
    client = Option(options.get("endpoint")) match {
      case Some(ep) =>
        // every option reaching the HTTP transport is HONORED or REJECTED
        // here — never accepted-but-inert (the reference errors on
        // unusable params too, utils/params.rs). An ALLOWLIST, not a
        // denylist: any catalog-valid key this transport does not honor
        // (including ones added later) is rejected rather than ignored.
        val inert = options.asScala.keys.map(_.toLowerCase)
          .filterNot(k => ChOptions.HttpHonoredKeys(k) ||
            k.startsWith(ChOptions.SettingsPrefix)).toSeq
        if (inert.nonEmpty)
          throw new IllegalArgumentException(
            s"option(s) ${inert.sorted.mkString(", ")} are not honored by the " +
              s"HTTP transport of catalog '$name' (JDK HTTP keep-alive manages " +
              "connection lifetimes; configure TLS trust via the JVM truststore). " +
              s"Supported here: ${ChOptions.HttpHonoredKeys.toSeq.sorted.mkString(", ")} " +
              "(compression: none|gzip|lz4|zstd)")
        // `endpoint` accepts a comma-separated SHARD list: each URL gets
        // its own transport and the composite executes per shard (the
        // client-side Distributed-table shape; see ShardedClickHouseClient)
        def mkHttp(one: String) = new graft.client.HttpClickHouseClient(
          one.trim.stripSuffix("/"),
          user = Option(options.get("username")).getOrElse("default"),
          password = Option(options.get("password")).getOrElse(""),
          defaultDatabase = Option(options.get("default_database")).getOrElse("default"),
          connectTimeoutMs =
            Option(options.get("pool_connection_timeout")).map(_.toInt).getOrElse(10000),
          compression = Option(options.get("compression")).getOrElse("none"),
          poolMaxSize = Option(options.get("pool_max_size")).map(_.toInt).getOrElse(0),
          retryConnection =
            Option(options.get("pool_retry_connection")).exists(_.toBoolean),
          useTls = Option(options.get("use_tls")).map(_.toBoolean),
          serverSettings = ChOptions.serverSettings(options.asScala.toMap))
        // each comma-separated SHARD may itself be a `|`-separated REPLICA
        // set (ClickHouse's shard-with-replicas cluster entry): reads fail
        // over among replicas, writes pin to the first (the primary; see
        // FailoverClickHouseClient for the exact contract)
        // load_balancing is a replica-set knob — honored-or-rejected PER
        // SHARD: in a mixed endpoint like 'a,b|c' the single-replica
        // shard would silently ignore it (the accepted-but-inert state
        // the option grammar exists to prevent)
        val lb = Option(options.get("load_balancing"))
        // validate on the PARSED shape, not the raw string: "r1|" contains
        // '|' but parses to a single replica, which would make
        // load_balancing silently inert — and an empty segment ("a,,b",
        // "r1|") is always a spec typo, rejected rather than guessed at
        val shardSpecs = ep.split(",", -1).toIndexedSeq.map { spec =>
          val reps = spec.split("\\|", -1).toIndexedSeq.map(_.trim)
          if (reps.exists(_.isEmpty))
            throw new IllegalArgumentException(
              s"endpoint of catalog '$name' has an empty shard/replica " +
                s"segment in '$spec'")
          reps
        }
        if (lb.isDefined && shardSpecs.exists(_.size < 2))
          throw new IllegalArgumentException(
            s"option 'load_balancing' of catalog '$name' requires EVERY " +
              "shard in endpoint to carry a '|'-separated replica set " +
              "(a single-replica shard has nothing to balance)")
        def mkShard(reps: IndexedSeq[String]): graft.client.ClickHouseClient with Serializable = {
          val cs = reps.map(mkHttp)
          if (cs.size == 1) cs.head
          else new graft.client.FailoverClickHouseClient(cs, lb.getOrElse("first"))
        }
        shardedOrSingle(name, options, shardSpecs.map(mkShard))
      case None =>
        val path = Option(options.get("path"))
          .getOrElse(throw new IllegalArgumentException(
            s"catalog $name requires option 'path' (embedded store root) " +
              "or 'endpoint' (ClickHouse HTTP url)"))
        // honored-or-rejected: the embedded store executes locally — a
        // ClickHouse SERVER setting has no server to land on
        val settings = ChOptions.serverSettings(options.asScala.toMap)
        if (settings.nonEmpty)
          throw new IllegalArgumentException(
            s"option(s) ${settings.keys.map(ChOptions.SettingsPrefix + _).toSeq.sorted
              .mkString(", ")} of catalog '$name' carry ClickHouse server " +
              "settings, but the embedded store runs in-process — there is no " +
              "server to honor them (set them on an endpoint-backed catalog)")
        // `path` accepts a comma-separated shard list too — the hermetic
        // cluster (one embedded store per root), so sharded semantics are
        // oracle-testable without a wire. Replica syntax (`|`) is
        // endpoint-only: two embedded roots cannot replicate each other,
        // so accepting it would promise availability the store can't give
        if (path.contains("|"))
          throw new IllegalArgumentException(
            s"catalog '$name': replica syntax ('|') is only valid in " +
              "'endpoint' — embedded store roots do not replicate")
        if (options.containsKey("load_balancing"))
          throw new IllegalArgumentException(
            s"option 'load_balancing' of catalog '$name' is a replica-set " +
              "knob — the embedded store has no replicas to balance")
        val roots = path.split(",", -1).toIndexedSeq.map(_.trim)
        if (roots.exists(_.isEmpty))
          throw new IllegalArgumentException(
            s"path of catalog '$name' has an empty shard segment")
        shardedOrSingle(name, options, roots.map(p => new EmbeddedClickHouse(p)))
    }
    readStreams = Option(options.get("read.streams")).map(_.toInt).getOrElse(4)
    writeConcurrency = Option(options.get("write.concurrency")).map(_.toInt).getOrElse(4)
    writeBatchSize = Option(options.get("write.batch_size")).map(_.toInt).getOrElse(10000)
    writeDistribute = Option(options.get("write.distribute")).forall(_.toBoolean)
    writeSortOnInsert = Option(options.get("write.sort_on_insert")).exists(_.toBoolean)
    // per-catalog schema-coercion toggle (reference builders.rs:131-135):
    // ON casts remote batches whose wire types drift from the declared
    // plan schema (per-batch projection cost); OFF fails fast instead
    coerceSchemas = Option(options.get("coerce_schemas")).forall(_.toBoolean)
    readDefaults = Seq(
      "split_by" -> "read.split_by",
      "bucket_by" -> "read.bucket_by",
      "buckets" -> "read.buckets")
      .flatMap { case (k, opt) => Option(options.get(opt)).map(k -> _) }
      .toMap
    // name → connectionKey registry: lets out-of-band store changes
    // (materialized-view fires) be mapped back to every catalog fronting
    // the same store for Spark-cache refresh (ChMutations.drainMvRefresh)
    ClickHouseCatalog.registered.put(name, client.connectionKey)
  }

  // ---- functions: the co-partitioning bucket transform ----

  /** The `bucket(n, col)` transform that bucketed reads report in their
    * KeyGroupedPartitioning resolves HERE — Spark looks the name up in
    * the scan relation's owning catalog (FunctionCatalog surface) to
    * build the TransformExpression that storage-partitioned joins
    * compare across the two sides.
    */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (client.bucketFamily.isEmpty) Array.empty
    else if (namespace.isEmpty || namespaceExists(namespace))
      Array(Identifier.of(Array.empty, "bucket"))
    else throw new NoSuchNamespaceException(namespace)

  override def loadFunction(
      ident: Identifier): org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    client.bucketFamily match {
      case Some(family) if ident.name.equalsIgnoreCase("bucket") =>
        ChBucketFunction(family)
      case _ =>
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)
    }

  override def name(): String = catalogName

  // ---- namespaces = databases ----

  override def listNamespaces(): Array[Array[String]] =
    client.listDatabases().map(db => Array(db)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    namespace match {
      case Array() => listNamespaces()
      case Array(db) if client.listDatabases().contains(db) => Array.empty
      case _ => throw new NoSuchNamespaceException(namespace)
    }

  override def namespaceExists(namespace: Array[String]): Boolean = namespace match {
    case Array(db) => client.listDatabases().contains(db)
    case _ => false
  }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(
      namespace: Array[String],
      metadata: util.Map[String, String]): Unit = namespace match {
    case Array(db) => client.createDatabase(db)
    case _ => throw new IllegalArgumentException(
      s"ClickHouse namespaces are single-level databases: ${namespace.mkString(".")}")
  }

  override def alterNamespace(
      namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    namespace match {
      case Array(db) if namespaceExists(namespace) =>
        if (!cascade && client.listTables(db).nonEmpty)
          throw new IllegalStateException(s"database $db is not empty")
        client.dropDatabase(db); true
      case _ => false
    }

  // ---- tables ----

  private def dbOf(ident: Identifier): String = ident.namespace() match {
    case Array(db) => db
    case ns => throw new NoSuchTableException(ns :+ ident.name())
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = namespace match {
    case Array(db) =>
      client.listTables(db).map(t => Identifier.of(namespace, t)).toArray
    case _ => throw new NoSuchNamespaceException(namespace)
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().length == 1 && client.tableExists(dbOf(ident), ident.name())

  override def loadTable(ident: Identifier): Table = {
    val db = dbOf(ident)
    if (!client.tableExists(db, ident.name()))
      throw new NoSuchTableException(ident.namespace() :+ ident.name())
    val schema = ClickHouseType.toStructType(client.fetchColumns(db, ident.name()))
    // shard_by matches case-SENSITIVELY everywhere downstream (route(),
    // complete-agg pushdown, collapse attrs — the placement hash works on
    // exact names), while Spark resolves identifiers case-insensitively:
    // a shard_by differing only in case from a real column would silently
    // disable co-location and reject routed inserts with a confusing
    // "not in the insert schema" error. Honored-or-rejected: fail the
    // load with the exact spelling. (Tables without the routing column at
    // all stay loadable — un-routed tables in a sharded catalog are
    // legitimate, they just claim no co-location.)
    client.shardRoutingColumn.foreach { key =>
      // an exact-spelling match wins outright — ClickHouse columns are
      // case-sensitive, so `k` and `K` can legitimately coexist and a
      // correct declaration must not be rejected over the sibling
      if (!schema.fieldNames.contains(key)) {
        schema.fields.find(_.name.equalsIgnoreCase(key)).foreach { f =>
          throw new IllegalArgumentException(
            s"catalog '$catalogName' routes by shard_by '$key', but table " +
              s"$db.${ident.name()} spells the column '${f.name}' — shard_by " +
              "matching is case-sensitive (placement hash, pushdown, " +
              "collapse all use exact names); declare shard_by with the " +
              "exact column spelling")
        }
      }
    }
    new ClickHouseTable(client, db, ident.name(), schema, readStreams,
      writeConcurrency, writeBatchSize, coerceSchemas, readDefaults,
      writeDistribute, writeSortOnInsert)
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val db = dbOf(ident)
    if (client.tableExists(db, ident.name()))
      throw new TableAlreadyExistsException(ident.namespace() :+ ident.name())
    // params.rs-style table-property validation: unknown TBLPROPERTIES
    // error with the valid-key list (Spark-reserved props pass through)
    val props = ChOptions.validateTableProps(
      ident.name(), properties.asScala.toMap)
    val columns = schema.fields.toSeq.map { f =>
      f.name -> ClickHouseType.render(f.dataType, f.nullable)
    }
    val options = Map("engine" -> props.getOrElse("engine", "MergeTree")) ++ props
    client.createTable(db, ident.name(), columns, options)
    loadTable(ident)
  }

  /** ALTER TABLE → remote ClickHouse DDL (one statement, change order
    * preserved). Column changes only; table-property changes and column
    * repositioning have no remote counterpart here and are rejected
    * loudly (honored-or-rejected, params.rs UX). Changes touching the
    * catalog's `shard_by` routing column are rejected — renaming or
    * retyping it would silently re-route every future insert.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    import graft.client.ChAlterOp
    val db = dbOf(ident)
    if (!client.tableExists(db, ident.name()))
      throw new NoSuchTableException(ident.namespace() :+ ident.name())
    val current: Map[String, String] =
      client.fetchColumns(db, ident.name()).toMap
    val routing: Option[String] = client match {
      case s: graft.client.ShardedClickHouseClient => s.shardBy
      case _ => None
    }
    def single(fieldNames: Array[String], what: String): String = {
      if (fieldNames.length != 1) throw new UnsupportedOperationException(
        s"$what on nested field ${fieldNames.mkString(".")}: ClickHouse " +
          "columns are top-level (restructure composite columns with " +
          "MODIFY COLUMN to a new Tuple type instead)")
      fieldNames.head
    }
    def guardRouting(n: String, what: String): String = {
      if (routing.contains(n)) throw new IllegalArgumentException(
        s"$what '$n': column is the catalog's shard_by routing key — " +
          "altering it would re-route future inserts away from existing rows")
      n
    }
    // evolving name → chType view: nullability lookups must see columns
    // ADDED or RENAMED by EARLIER changes in this same batch, or a
    // same-batch add+retype silently drops its Nullable wrapper
    var evolving: Map[String, String] = current
    def nullableOf(n: String): Boolean =
      evolving.get(n).exists(t => ClickHouseType.parse(t).nullable)
    def track(op: ChAlterOp): ChAlterOp = {
      op match {
        case ChAlterOp.AddColumn(n, t, _) => evolving += (n -> t)
        case ChAlterOp.DropColumn(n) => evolving -= n
        case ChAlterOp.RenameColumn(a, b) =>
          evolving.get(a).foreach(t => evolving = evolving - a + (b -> t))
        case ChAlterOp.ModifyType(n, t) => evolving += (n -> t)
        case _ => ()
      }
      op
    }
    val ops: Seq[ChAlterOp] = changes.map(c => track(c match {
      case a: TableChange.AddColumn =>
        if (a.comment() != null) throw new UnsupportedOperationException(
          "ADD COLUMN ... COMMENT: column comments are not forwarded; " +
            "drop the comment clause")
        val pos: Option[Option[String]] = a.position() match {
          case null => None
          case _: TableChange.First => Some(None)
          case after: TableChange.After => Some(Some(after.column()))
          case other => throw new UnsupportedOperationException(
            s"ADD COLUMN position ${other.getClass.getSimpleName}")
        }
        ChAlterOp.AddColumn(single(a.fieldNames, "ADD COLUMN"),
          ClickHouseType.render(a.dataType, a.isNullable), pos)
      case d: TableChange.DeleteColumn =>
        ChAlterOp.DropColumn(
          guardRouting(single(d.fieldNames, "DROP COLUMN"), "DROP COLUMN"))
      case r: TableChange.RenameColumn =>
        ChAlterOp.RenameColumn(
          guardRouting(single(r.fieldNames, "RENAME COLUMN"), "RENAME COLUMN"),
          r.newName)
      case u: TableChange.UpdateColumnType =>
        val n = guardRouting(single(u.fieldNames, "MODIFY COLUMN"), "MODIFY COLUMN")
        ChAlterOp.ModifyType(n, ClickHouseType.render(u.newDataType, nullableOf(n)))
      case u: TableChange.UpdateColumnNullability =>
        val n = guardRouting(single(u.fieldNames, "MODIFY COLUMN"), "MODIFY COLUMN")
        val base = evolving.getOrElse(n, throw new IllegalArgumentException(
          s"MODIFY COLUMN: no such column '$n'"))
        val p = ClickHouseType.parse(base)
        ChAlterOp.ModifyType(n, ClickHouseType.render(p.dataType, u.nullable))
      case p: TableChange.SetProperty if p.property() == "ttl" =>
        ChAlterOp.ModifyTtl(Some(p.value()))
      case p: TableChange.RemoveProperty if p.property() == "ttl" =>
        ChAlterOp.ModifyTtl(None)
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE change ${other.getClass.getSimpleName} has no " +
          "ClickHouse counterpart")
    }))
    client.alterTable(db, ident.name(), ops)
    // DDL runs outside Spark's own invalidation hooks: with a cached
    // plan over the table, resolution keeps serving the pre-evolution
    // relation (AlterTableSpec pins this) — refresh like a mutation
    graft.connector.ChMutations.refresh(
      org.apache.spark.sql.SparkSession.active,
      s"$catalogName.$db.${ident.name()}")
    loadTable(ident)
  }

  /** Remote DROP TABLE, like deregister_table issuing `DROP TABLE IF
    * EXISTS` (providers/catalog.rs:202-240).
    */
  override def dropTable(ident: Identifier): Boolean = {
    val db = dbOf(ident)
    val existed = client.tableExists(db, ident.name())
    // always delegate: client drops are IF-EXISTS idempotent, and on a
    // sharded client tableExists consults only the head shard — a
    // half-build living on a non-head shard must still be cleared
    client.dropTable(db, ident.name())
    existed
  }

  /** RENAME TABLE → the server's `RENAME TABLE a.x TO b.y` (cross-database
    * moves allowed, both namespaces must exist).
    */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val (db, newDb) = (dbOf(oldIdent), dbOf(newIdent))
    if (!client.tableExists(db, oldIdent.name()))
      throw new NoSuchTableException(oldIdent.namespace() :+ oldIdent.name())
    if (client.tableExists(newDb, newIdent.name()))
      throw new TableAlreadyExistsException(newIdent.namespace() :+ newIdent.name())
    // refresh while the OLD name still resolves — drops cached plans
    // over the table before it moves
    graft.connector.ChMutations.refresh(
      org.apache.spark.sql.SparkSession.active,
      s"$catalogName.$db.${oldIdent.name()}")
    client.renameTable(db, oldIdent.name(), newDb, newIdent.name())
  }
}

object ClickHouseCatalog {
  /** catalogName → client connectionKey, populated at initialize — the
    * reverse map out-of-band store changes need to refresh Spark's
    * relation cache (see [[graft.client.MvRefresh]]).
    */
  private[graft] val registered =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
}
