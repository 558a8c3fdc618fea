package graft.client

import java.io.IOException
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** EXCHANGE TABLES is the one non-idempotent metadata broadcast (a retry
  * swaps back), so it gets its own safety battery:
  *  - failover broadcast: pre-probe every replica BEFORE any swap, roll
  *    back already-swapped replicas on a mid-broadcast failure, and raise
  *    an explicit divergence error when the rollback itself fails —
  *    never leave reads silently serving swapped-or-unswapped data by
  *    replica-routing luck;
  *  - embedded store: the three-move swap journals its intent first, so
  *    a crash at ANY point is deterministically repaired (rollback after
  *    one move, roll-forward after two) at the next store open.
  */
class ExchangeSafetySpec extends AnyFunSuite {

  /** Minimal test double: a client whose exchangeTables can be scripted
    * to fail on the Nth call. Only the members the failover EXCHANGE path
    * touches are real.
    */
  private final class ScriptedExchange(
      id: String,
      hasTables: Boolean = true,
      failOnCalls: Set[Int] = Set.empty,
      /** Model a post-commit timeout: the swap LANDS, then the call throws. */
      applyBeforeFail: Boolean = false,
      /** Model a dead replica: the divergence probe itself fails. */
      probeFails: Boolean = false) extends ClickHouseClient {
    var exchangeCalls = 0
    // live per-table schemas — the failover divergence probe reads these
    // through system.columns (query → planQuery/readPartition)
    val schemas = scala.collection.mutable.Map(
      "a" -> Seq("x" -> "Int64"), "b" -> Seq("y" -> "String"))
    private def swap(a: String, b: String): Unit = {
      val t = schemas(a); schemas(a) = schemas(b); schemas(b) = t
    }
    override def connectionKey: String = s"scripted:$id"
    override def tableExists(db: String, table: String): Boolean = hasTables
    override def exchangeTables(db: String, a: String, db2: String, b: String): Unit = {
      exchangeCalls += 1
      if (failOnCalls.contains(exchangeCalls)) {
        if (applyBeforeFail) swap(a, b)
        throw new IOException(s"scripted failure on call $exchangeCalls of $id")
      }
      swap(a, b)
    }
    private case class Probe(rows: Seq[Row]) extends ChPartitionHandle
    override def planQuery(sql: String, numStreams: Int): (StructType, Seq[ChPartitionHandle]) = {
      if (probeFails) throw new IOException(s"scripted probe failure on $id")
      val T = raw"table = '([^']+)'".r.unanchored
      val rows = T.findFirstMatchIn(sql).map(_.group(1))
        .flatMap(schemas.get).getOrElse(Seq.empty)
        .map { case (c, ty) => Row(c, ty) }
      (new StructType(), Seq(Probe(rows)))
    }
    override def readPartition(handle: ChPartitionHandle): Iterator[Row] =
      handle.asInstanceOf[Probe].rows.iterator
    private def nope = throw new UnsupportedOperationException("not in this test")
    override def listDatabases(): Seq[String] = nope
    override def listTables(db: String): Seq[String] = nope
    override def fetchColumns(db: String, table: String): Seq[(String, String)] = nope
    override def fetchTableOptions(db: String, table: String): Map[String, String] = nope
    override def createDatabase(db: String, ifNotExists: Boolean): Unit = nope
    override def dropDatabase(db: String): Unit = nope
    override def createTable(db: String, table: String,
        columns: Seq[(String, String)], options: Map[String, String]): Unit = nope
    override def dropTable(db: String, table: String): Unit = nope
    override def deleteWhere(db: String, table: String, whereSql: String): Unit = nope
    override def updateWhere(db: String, table: String,
        assignments: Seq[(String, String)], whereSql: String): Unit = nope
    override def insert(db: String, table: String, schema: StructType, rows: Seq[Row]): Long = nope
    override def insertSelect(db: String, table: String, chSelectSql: String): Long = nope
    override def stageInsert(db: String, table: String, schema: StructType,
        rows: Seq[Row], stagingId: String): Long = nope
    override def commitStaged(db: String, table: String, stagingId: String): Unit = nope
    override def abortStaged(db: String, table: String, stagingId: String): Unit = nope
  }

  test("failover EXCHANGE pre-probes every replica: a replica missing one " +
    "side refuses BEFORE any swap lands anywhere") {
    val r0 = new ScriptedExchange("r0")
    val r1 = new ScriptedExchange("r1", hasTables = false)
    val fo = new FailoverClickHouseClient(IndexedSeq(r0, r1))
    val e = intercept[IllegalArgumentException](
      fo.exchangeTables("main", "a", "main", "b"))
    assert(e.getMessage.contains("replica 1"), e.getMessage)
    assert(r0.exchangeCalls == 0, "no replica may swap when the probe fails")
    assert(r1.exchangeCalls == 0)
  }

  test("failover EXCHANGE rolls back already-swapped replicas on a " +
    "mid-broadcast failure (retrying the non-idempotent swap restores them)") {
    val r0 = new ScriptedExchange("r0")
    val r1 = new ScriptedExchange("r1", failOnCalls = Set(1))
    val fo = new FailoverClickHouseClient(IndexedSeq(r0, r1))
    val e = intercept[IOException](fo.exchangeTables("main", "a", "main", "b"))
    assert(e.getMessage.contains("scripted failure"), e.getMessage)
    // r0 swapped once, then swapped BACK during rollback — net unswapped
    assert(r0.exchangeCalls == 2, s"r0 calls: ${r0.exchangeCalls}")
    assert(r1.exchangeCalls == 1)
  }

  test("failover EXCHANGE raises an explicit divergence error naming the " +
    "stuck replicas when the rollback itself fails") {
    val r0 = new ScriptedExchange("r0", failOnCalls = Set(2)) // rollback dies
    val r1 = new ScriptedExchange("r1", failOnCalls = Set(1)) // broadcast dies
    val fo = new FailoverClickHouseClient(IndexedSeq(r0, r1))
    val e = intercept[IllegalStateException](
      fo.exchangeTables("main", "a", "main", "b"))
    assert(e.getMessage.contains("diverged"), e.getMessage)
    assert(e.getMessage.contains("replica(s) 0"), e.getMessage)
    assert(e.getMessage.contains("Manual repair"), e.getMessage)
  }

  test("failover EXCHANGE detects a replica that APPLIED the swap before " +
    "failing (post-commit timeout): divergence error naming it, even " +
    "though the rollback of the other replicas succeeded") {
    val r0 = new ScriptedExchange("r0")
    val r1 = new ScriptedExchange("r1", failOnCalls = Set(1),
      applyBeforeFail = true)
    val fo = new FailoverClickHouseClient(IndexedSeq(r0, r1))
    val e = intercept[IllegalStateException](
      fo.exchangeTables("main", "a", "main", "b"))
    assert(e.getMessage.contains("APPLIED the swap"), e.getMessage)
    assert(e.getMessage.contains("replica 1"), e.getMessage)
    assert(r0.exchangeCalls == 2, "other replicas still roll back")
  }

  test("failover EXCHANGE with an unprobeable failed replica states the " +
    "unknown: the error says the replica may be swapped and must be " +
    "verified (a bare rethrow would hide the divergence risk)") {
    val r0 = new ScriptedExchange("r0")
    val r1 = new ScriptedExchange("r1", failOnCalls = Set(1),
      probeFails = true)
    val fo = new FailoverClickHouseClient(IndexedSeq(r0, r1))
    val e = intercept[IllegalStateException](
      fo.exchangeTables("main", "a", "main", "b"))
    assert(e.getMessage.contains("may be swapped"), e.getMessage)
    assert(e.getMessage.contains("verify"), e.getMessage)
  }

  // ---- embedded crash recovery ----

  private def freshStore(tag: String): (EmbeddedClickHouse, Path) = {
    val root = Files.createTempDirectory(s"exch-$tag-")
    val c = new EmbeddedClickHouse(root.toString)
    c.createDatabase("main")
    c.createTable("main", "ta", Seq("x" -> "Int64"),
      Map("engine" -> "MergeTree", "order_by" -> "x"))
    c.createTable("main", "tb", Seq("y" -> "String"),
      Map("engine" -> "MergeTree", "order_by" -> "y"))
    (c, root)
  }

  private def journal(root: Path, tmp: Path): Path = {
    val pa = root.resolve("main").resolve("ta")
    val pb = root.resolve("main").resolve("tb")
    val j = root.resolve("main").resolve(tmp.getFileName.toString + ".meta")
    Files.write(j, Seq(tmp, pa, pb)
      .map(_.toAbsolutePath.toString).mkString("\n").getBytes("UTF-8"))
    j
  }

  test("embedded EXCHANGE crash after move 1 rolls BACK at next store " +
    "open: both tables keep their original identity, journal reclaimed") {
    val (_, root) = freshStore("m1")
    val pa = root.resolve("main").resolve("ta")
    val tmp = root.resolve("main").resolve(
      s".exchange-${java.util.UUID.randomUUID}")
    val j = journal(root, tmp)
    Files.move(pa, tmp) // crash here: a missing, its data stranded in tmp
    val c2 = new EmbeddedClickHouse(root.toString) // open runs recovery
    assert(c2.tableExists("main", "ta"), "ta must be restored")
    assert(c2.fetchColumns("main", "ta").map(_._1) == Seq("x"),
      "rollback must restore ta's ORIGINAL identity")
    assert(c2.fetchColumns("main", "tb").map(_._1) == Seq("y"))
    assert(!Files.exists(j) && !Files.exists(tmp), "journal+tmp reclaimed")
  }

  test("embedded EXCHANGE crash after move 2 rolls FORWARD at next store " +
    "open: the exchange completes, journal reclaimed") {
    val (_, root) = freshStore("m2")
    val pa = root.resolve("main").resolve("ta")
    val pb = root.resolve("main").resolve("tb")
    val tmp = root.resolve("main").resolve(
      s".exchange-${java.util.UUID.randomUUID}")
    val j = journal(root, tmp)
    Files.move(pa, tmp)
    Files.move(pb, pa) // crash here: tb missing, ta holds tb's data
    val c2 = new EmbeddedClickHouse(root.toString)
    assert(c2.tableExists("main", "tb"), "tb must be completed")
    assert(c2.fetchColumns("main", "ta").map(_._1) == Seq("y"),
      "roll-forward must COMPLETE the exchange: ta now holds tb's schema")
    assert(c2.fetchColumns("main", "tb").map(_._1) == Seq("x"))
    assert(!Files.exists(j) && !Files.exists(tmp))
  }

  test("embedded EXCHANGE completes normally and leaves no journal or " +
    "temp dirs behind") {
    val (c, root) = freshStore("ok")
    c.exchangeTables("main", "ta", "main", "tb")
    assert(c.fetchColumns("main", "ta").map(_._1) == Seq("y"))
    assert(c.fetchColumns("main", "tb").map(_._1) == Seq("x"))
    val leftovers = NioFiles.list(root.resolve("main")).iterator
      .filter(_.getFileName.toString.startsWith(".exchange-")).toSeq
    assert(leftovers.isEmpty, leftovers.toString)
  }
}
