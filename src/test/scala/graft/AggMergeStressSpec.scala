package graft
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.session.ClickHouseSession

/** Round-16 merge-path stress: the new TypedImperativeAggregates
  * (windowFunnel / sequenceMatch / sequenceCount / sumMap) must give
  * partition-count-independent results — partial aggregation splits
  * the event stream arbitrarily, so buffers merge out of time order.
  */
class AggMergeStressSpec extends AnyFunSuite {
  test("windowFunnel/sequence/sumMap results are partition-invariant") {
    val spark = SparkSession.builder().master("local[8]")
      .appName("agg-merge-stress")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "13")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft_ams_").toString
    val ch = ClickHouseSession.builder(spark)
      .storePath(root).catalogName("chams").build()
    ch.createDatabase("db")
    ch.newTable("db", "ev").column("g", "Int64").column("t", "Int64")
      .column("e", "String").engine("MergeTree").orderBy("g").create()
    // deterministic pseudo-random event stream, inserted in a SCRAMBLED
    // order so update/merge see time-disordered buffers
    val rng = new scala.util.Random(16L)
    val rows = (for (g <- 1 to 40; i <- 1 to 60) yield {
      val t = i * 7 + (g % 5)
      val e = "ABC".charAt(rng.nextInt(3))
      s"($g, $t, '$e')"
    })
    rng.shuffle(rows).grouped(300).foreach { chunk =>
      ch.insertReturningCount(
        "INSERT INTO chams.db.ev VALUES " + chunk.mkString(", "))
    }
    def run(parts: Int): Map[Long, Seq[Any]] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      ch.chSql(
        """SELECT `g`,
          |  toInt64(windowFunnel(50)(`t`, `e` = 'A', `e` = 'B', `e` = 'C')) AS wf,
          |  toInt64(sequenceMatch('(?1)(?t<=30)(?2)')(`t`, `e` = 'A', `e` = 'B')) AS sm,
          |  sequenceCount('(?1)(?2)')(`t`, `e` = 'A', `e` = 'B') AS sc,
          |  arrayStringConcat(arrayMap(x -> toString(x),
          |    tupleElement(sumMap([`e`], [`t`]), 2)), ',') AS smv,
          |  toInt64(windowFunnel(50, 'strict_order')(`t`, `e` = 'A',
          |    `e` = 'B', `e` = 'C')) AS wfo,
          |  toInt64(windowFunnel(50, 'strict_dedup')(`t`, `e` = 'A',
          |    `e` = 'B', `e` = 'C')) AS wfd,
          |  toInt64(windowFunnel(50, 'strict_increase')(`t`, `e` = 'A',
          |    `e` = 'B', `e` = 'C')) AS wfi,
          |  toInt64(sequenceMatch('(?1)(?t>10)(?2)')(`t`, `e` = 'A',
          |    `e` = 'B')) AS smg,
          |  toInt64(sequenceMatch('(?1)(?t==7)(?2)')(`t`, `e` = 'A',
          |    `e` = 'B')) AS sme,
          |  toInt64(sequenceMatch('(?1).(?2)')(`t`, `e` = 'A',
          |    `e` = 'B')) AS smd
          |FROM `db`.`ev` GROUP BY `g`""".stripMargin).collect()
        .map(r => r.getLong(0) -> (1 to 10).map(r.get))
        .toMap
    }
    val a = run(1)
    val b = run(17)
    val c = run(32)
    assert(a == b, "results differ between 1 and 17 partitions")
    assert(a == c, "results differ between 1 and 32 partitions")
    assert(a.size == 40)
    assert(a.values.exists(v => v(2).asInstanceOf[Long] > 1L),
      "stream too easy: no multi-count group")
    // the strict modes and gap forms must actually discriminate on
    // this stream (else the invariance assert proves nothing for them)
    assert(a.values.exists(v => v(4) != v(0)),
      "stream too easy: strict_order never differs from default")
    assert(a.values.exists(v => v(7).asInstanceOf[Long] == 1L) &&
      a.values.exists(v => v(8).asInstanceOf[Long] == 1L) &&
      a.values.exists(v => v(9).asInstanceOf[Long] == 1L),
      "stream too easy: a round-17 pattern form never matches")
  }
}
