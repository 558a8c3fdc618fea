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
    def run(parts: Int): Map[Long, (Long, Long, Long, String)] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      ch.chSql(
        """SELECT `g`,
          |  toInt64(windowFunnel(50)(`t`, `e` = 'A', `e` = 'B', `e` = 'C')) AS wf,
          |  toInt64(sequenceMatch('(?1)(?t<=30)(?2)')(`t`, `e` = 'A', `e` = 'B')) AS sm,
          |  sequenceCount('(?1)(?2)')(`t`, `e` = 'A', `e` = 'B') AS sc,
          |  arrayStringConcat(arrayMap(x -> toString(x),
          |    tupleElement(sumMap([`e`], [`t`]), 2)), ',') AS smv
          |FROM `db`.`ev` GROUP BY `g`""".stripMargin).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
        .toMap
    }
    val a = run(1)
    val b = run(17)
    val c = run(32)
    assert(a == b, "results differ between 1 and 17 partitions")
    assert(a == c, "results differ between 1 and 32 partitions")
    assert(a.size == 40)
    assert(a.values.exists(_._3 > 1L), "stream too easy: no multi-count group")
  }
}
