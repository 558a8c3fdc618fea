package graft.queries

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The round-13 memo law applied to the r17 corpus-constant memos
  * (VERDICT r17 item 7): evMaxId / autoK key on
  * [[graft.Tables.dataToken]] — (file length, mtime) of the corpus
  * parquet — so an in-place corpus regeneration can never serve a stale
  * constant. The pin: a touched corpus file yields a NEW cache entry
  * (the memo recomputed) instead of a hit on the old key.
  */
class MemoTokenSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .appName("memo-token-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Copy the sf0.001 corpus into a throwaway dir the test may mutate
    * (the real testdata is immutable by contract).
    */
  private def stageCorpus(): String = {
    val src = Paths.get("/root/testdata/sf0.001")
    val dst = Files.createTempDirectory("graft_memo_spec")
    graft.Tables.names.foreach { n =>
      Files.copy(src.resolve(s"$n.parquet"), dst.resolve(s"$n.parquet"),
        StandardCopyOption.COPY_ATTRIBUTES)
    }
    dst.toFile.deleteOnExit()
    dst.toString
  }

  test("dataToken changes when the corpus file is touched, not otherwise") {
    val dir = stageCorpus()
    val t1 = graft.Tables.dataToken(dir, "events")
    val t2 = graft.Tables.dataToken(dir, "events")
    assert(t1 == t2)
    Files.setLastModifiedTime(Paths.get(dir, "events.parquet"),
      FileTime.fromMillis(t1._2 + 1000))
    assert(graft.Tables.dataToken(dir, "events") != t1)
  }

  test("evMaxId memo recomputes after the events corpus changes on disk") {
    val dir = stageCorpus()
    graft.Tables.register(spark, dir)
    def entries = ConnectorQueries.evMaxIdCache.keys
      .count { case (s, d, _) => (s eq spark) && d == dir }
    val v1 = ConnectorQueries.evMaxId(spark, dir)
    assert(entries == 1)
    ConnectorQueries.evMaxId(spark, dir) // same token: memo hit
    assert(entries == 1)
    Files.setLastModifiedTime(Paths.get(dir, "events.parquet"),
      FileTime.fromMillis(System.currentTimeMillis() + 5000))
    val v2 = ConnectorQueries.evMaxId(spark, dir) // new token: recompute
    assert(entries == 2, "touched corpus must invalidate the memo key")
    assert(v1 == v2) // content unchanged, so the recomputed value agrees
  }

  test("autoK memo recomputes after the embeddings corpus changes on disk") {
    val dir = stageCorpus()
    graft.Tables.register(spark, dir)
    def entries = SimilarityQueries.autoKCache.keys
      .count { case (s, d, _) => (s eq spark) && d == dir }
    val k1 = SimilarityQueries.autoK(spark, dir)
    assert(entries == 1)
    SimilarityQueries.autoK(spark, dir)
    assert(entries == 1)
    Files.setLastModifiedTime(Paths.get(dir, "embeddings.parquet"),
      FileTime.fromMillis(System.currentTimeMillis() + 5000))
    val k2 = SimilarityQueries.autoK(spark, dir)
    assert(entries == 2, "touched corpus must invalidate the memo key")
    assert(k1 == k2)
  }
}
