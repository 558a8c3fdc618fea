package graft.client

import java.io.IOException
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** One ClickHouse SHARD as a replica set behind the single-store
  * interface: N transports holding (by the server's replication — e.g.
  * ReplicatedMergeTree / a Distributed table with
  * `internal_replication=true`) the same data, composed for read
  * availability. The client-side analog of ClickHouse's own
  * shard-with-replicas cluster entry; catalogs spell it
  * `endpoint = "http://r1:8123|http://r2:8123"` (and a sharded cluster
  * composes it per shard: `"r1|r2,r3|r4"`).
  *
  * Semantics — honored or rejected, never silently wrong:
  *  - READS (metadata, planQuery*, scalar probes) run on one LIVE
  *    replica: statements try replicas from a sticky cursor and fail
  *    over on transport-level IOException (never on an HTTP error
  *    status — a bad query is bad on every replica). Planned handles
  *    PREFER the replica that planned them; if that replica is dead at
  *    stream-OPEN time (before any row is delivered) the slice re-opens
  *    on a surviving replica when the transport's handles are
  *    self-contained statements ([[ClickHouseClient.rehome]] — HTTP
  *    qualifies). A replica dying MID-STREAM still fails the task
  *    loudly (rows may already be consumed; a silent re-read could
  *    duplicate or reorder) — but the task RETRY starts with zero
  *    delivered rows and fails over at open, so the statement completes
  *    on the surviving replica.
  *  - WRITES (insert, staged protocol, insertSelect, epoch markers) pin
  *    to replica 0 — the write PRIMARY. Staged-insert ids and epoch
  *    markers are replica-local state, so spraying them across replicas
  *    would break exactly-once; a dead primary fails writes loudly
  *    (ClickHouse's own behavior when the targeted replica is down).
  *    Replicating written data to the others is the SERVER's job; with a
  *    non-replicating backend a failover read may observe that replica's
  *    own (possibly older) state — precisely ClickHouse's documented
  *    eventual-consistency caveat for reading replicas.
  *  - DDL and mutations BROADCAST to every replica (the per-replica
  *    CREATE TABLE setup shape / `ON CLUSTER`), keeping schemas aligned
  *    so metadata may be served from any live replica.
  */
class FailoverClickHouseClient(
    val replicas: IndexedSeq[ClickHouseClient],
    val loadBalancing: String = "first")
  extends ClickHouseClient {

  require(replicas.size >= 2,
    s"a replica set needs >= 2 replicas, got ${replicas.size}")
  require(loadBalancing == "first" || loadBalancing == "random",
    s"load_balancing must be 'first' (sticky primary-first: read-your-" +
      s"writes against a lagging replica) or 'random' (spread read load " +
      s"across replicas, ClickHouse's first_or_random analog), got " +
      s"'$loadBalancing'")

  override def connectionKey: String =
    s"replicated[${replicas.map(_.connectionKey).mkString("|")}]"

  // one replica holds the whole data set: single execution domain
  override def singleExecutionDomain: Boolean = true
  override def finalReadExact(db: String, table: String): Boolean =
    replicas.head.finalReadExact(db, table)
  override def bucketFamily: Option[String] = {
    val fams = replicas.map(_.bucketFamily).distinct
    if (fams.length == 1) fams.head else None
  }

  /** Sticky read cursor: starts at the primary so reads see their own
    * writes when replication lags; advances only on transport death.
    */
  private val preferred = new AtomicInteger(0)

  private def withLive[T](f: ClickHouseClient => T): (Int, T) = {
    val start =
      if (loadBalancing == "random")
        java.util.concurrent.ThreadLocalRandom.current().nextInt(replicas.size)
      else preferred.get()
    var lastErr: IOException = null
    var i = 0
    while (i < replicas.size) {
      val idx = (start + i) % replicas.size
      try {
        val r = f(replicas(idx))
        preferred.set(idx)
        return (idx, r)
      } catch {
        case e: IOException =>
          if (lastErr != null) e.addSuppressed(lastErr)
          lastErr = e
          i += 1
      }
    }
    throw new IOException(
      s"all ${replicas.size} replicas failed (last: ${lastErr.getMessage})", lastErr)
  }

  // ---- metadata: any live replica (DDL broadcast keeps them aligned) ----

  override def listDatabases(): Seq[String] = withLive(_.listDatabases())._2
  override def listTables(db: String): Seq[String] = withLive(_.listTables(db))._2
  override def tableExists(db: String, table: String): Boolean =
    withLive(_.tableExists(db, table))._2
  override def fetchColumns(db: String, table: String): Seq[(String, String)] =
    withLive(_.fetchColumns(db, table))._2
  override def fetchTableOptions(db: String, table: String): Map[String, String] =
    withLive(_.fetchTableOptions(db, table))._2
  override def tableSizeBytes(db: String, table: String): Option[Long] =
    withLive(_.tableSizeBytes(db, table))._2

  // ---- DDL: broadcast (per-replica setup / ON CLUSTER) ----

  override def createDatabase(db: String, ifNotExists: Boolean = true): Unit =
    replicas.foreach(_.createDatabase(db, ifNotExists))
  override def dropDatabase(db: String): Unit = replicas.foreach(_.dropDatabase(db))
  override def createTable(
      db: String, table: String,
      columns: Seq[(String, String)], options: Map[String, String]): Unit =
    replicas.foreach(_.createTable(db, table, columns, options))
  override def dropTable(db: String, table: String): Unit =
    replicas.foreach(_.dropTable(db, table))

  // ---- mutations: the PRIMARY only, like inserts. The class model is a
  // server-replicated backend (ReplicatedMergeTree), where an ALTER
  // UPDATE/DELETE replicates BY ITSELF — broadcasting it would apply a
  // non-idempotent assignment (v = v + 1) once per replica: silent data
  // corruption on exactly the backend the write-pinning assumes. One
  // data-change model for every mutation path: issue once at the
  // primary, replication is the server's job, lagging replicas may
  // briefly serve pre-mutation state (the same documented caveat as
  // inserts). DDL stays broadcast: schema objects are per-replica state
  // (the ON CLUSTER analog) and re-applying DDL is idempotent. ----

  override def deleteWhere(db: String, table: String, whereSql: String): Unit =
    primary.deleteWhere(db, table, whereSql)
  override def updateWhere(
      db: String, table: String,
      assignments: Seq[(String, String)], whereSql: String): Unit =
    primary.updateWhere(db, table, assignments, whereSql)

  // ---- reads: plan on a live replica, tag handles with its index ----

  override def planQuery(
      sql: String, numStreams: Int): (StructType, Seq[ChPartitionHandle]) = {
    val (idx, (schema, handles)) = withLive(_.planQuery(sql, numStreams))
    (schema, handles.map(ReplicaHandle(idx, _)))
  }

  override def planQueryRanges(
      sql: String, splitColumn: String,
      numStreams: Int): (StructType, Seq[ChPartitionHandle]) = {
    val (idx, (schema, handles)) =
      withLive(_.planQueryRanges(sql, splitColumn, numStreams))
    (schema, handles.map(ReplicaHandle(idx, _)))
  }

  override def planQueryBuckets(
      sql: String, bucketColumn: String,
      numBuckets: Int): Option[(StructType, Seq[ChPartitionHandle])] = {
    val (idx, planned) =
      withLive(_.planQueryBuckets(sql, bucketColumn, numBuckets))
    planned.map { case (schema, handles) =>
      (schema, handles.map(ReplicaHandle(idx, _)))
    }
  }

  /** Open a partition stream with AT-OPEN failover: the pinned replica is
    * tried first; if the transport dies BEFORE the first element is
    * available (`force` runs the lazy open), the slice re-opens on the
    * next live replica via [[ClickHouseClient.rehome]] — safe because no
    * row of this attempt has been delivered, so the re-opened stream
    * re-derives the WHOLE slice (HTTP handles are self-contained
    * statements). Spark task retries ride the same path: a retry calls
    * readPartition afresh with zero delivered rows, so a replica dying
    * mid-stream fails the task loudly (rows may be consumed — a silent
    * re-read could duplicate) and the RETRY fails over. A transport whose
    * handles cannot re-home keeps the original pinned-loud contract.
    * Caveat (the same one plan-time failover documents): with lagging
    * replication, slices of one statement re-opened on different replicas
    * may observe different snapshots.
    */
  private def openFailover[T](
      handle: ChPartitionHandle)(open: (ClickHouseClient, ChPartitionHandle) => T)(
      force: T => Unit): T = {
    val (pinnedIdx, inner) = handle match {
      case ReplicaHandle(i, h) => (i, h)
      case other => throw new IllegalArgumentException(
        s"replica set got a foreign handle: ${other.getClass.getName}")
    }
    var lastErr: IOException = null
    var i = 0
    while (i < replicas.size) {
      val idx = (pinnedIdx + i) % replicas.size
      val slice =
        if (idx == pinnedIdx) Some(inner) else replicas(idx).rehome(inner)
      slice match {
        case Some(h) =>
          var t: Option[T] = None
          def releaseAttempt(): Unit =
            // release the failed attempt's transport state: the HTTP
            // iterator holds a live connection AND a per-endpoint pool
            // permit from the moment the open started — abandoning it
            // un-closed leaks both (driver-side reads have no task
            // completion listener to clean up after us)
            t.foreach {
              case c: AutoCloseable =>
                try c.close() catch { case _: Exception => () }
              case _ => ()
            }
          try {
            val opened = open(replicas(idx), h)
            t = Some(opened)
            force(opened)
            return opened
          } catch {
            case e: IOException =>
              releaseAttempt()
              if (lastErr != null) e.addSuppressed(lastErr)
              lastErr = e
            case scala.util.control.NonFatal(e) =>
              // non-transport failures (e.g. a truncation verdict's
              // RuntimeException) still clean up — but they do NOT fail
              // over: a non-IO error is an error on every replica
              releaseAttempt()
              throw e
          }
        case None => () // this transport cannot serve the slice — skip
      }
      i += 1
    }
    throw new IOException(
      s"all ${replicas.size} replicas failed opening a partition stream " +
        s"(last: ${Option(lastErr).map(_.getMessage).getOrElse("no replica could serve the slice")})",
      lastErr)
  }

  override def readPartition(handle: ChPartitionHandle): Iterator[Row] =
    openFailover(handle)((c, h) => c.readPartition(h))(_.hasNext)
  override def readPartitionInternal(
      handle: ChPartitionHandle,
      schema: StructType): Iterator[org.apache.spark.sql.catalyst.InternalRow] =
    openFailover(handle)((c, h) => c.readPartitionInternal(h, schema))(_.hasNext)
  override def readPartitionColumnar(
      handle: ChPartitionHandle,
      schema: StructType): Iterator[org.apache.spark.sql.vectorized.ColumnarBatch] =
    openFailover(handle)((c, h) => c.readPartitionColumnar(h, schema))(_.hasNext)

  // ---- writes: the PRIMARY only (replica 0) — staging ids and epoch
  // markers are replica-local, so they must all land on one replica ----

  private def primary: ClickHouseClient = replicas.head

  override def insert(
      db: String, table: String, schema: StructType, rows: Seq[Row]): Long =
    primary.insert(db, table, schema, rows)
  override def insertSelect(db: String, table: String, chSelectSql: String): Long =
    primary.insertSelect(db, table, chSelectSql)
  override def stageInsert(
      db: String, table: String, schema: StructType, rows: Seq[Row],
      stagingId: String): Long =
    primary.stageInsert(db, table, schema, rows, stagingId)
  override def commitStaged(db: String, table: String, stagingId: String): Unit =
    primary.commitStaged(db, table, stagingId)
  override def abortStaged(db: String, table: String, stagingId: String): Unit =
    primary.abortStaged(db, table, stagingId)
  override def tryMarkEpochCommitted(
      db: String, table: String, marker: String): Boolean =
    primary.tryMarkEpochCommitted(db, table, marker)
  override def commitEpochStaged(
      db: String, table: String, epochMarker: String,
      staged: Seq[(String, Int)]): Unit =
    primary.commitEpochStaged(db, table, epochMarker, staged)
}

/** Replica-tagged handle: remembers which replica planned `inner` so the
  * executor-side read streams from the replica whose cursor/spill state
  * the plan created.
  */
final case class ReplicaHandle(replica: Int, inner: ChPartitionHandle)
  extends ChPartitionHandle
