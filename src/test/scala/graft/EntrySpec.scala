package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the driver's t1 smoke: entry() on a plain session. */
class EntrySpec extends AnyFunSuite {

  test("SparkEntry.entry returns rows on sf0.001 with a vanilla session") {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    // every declared oracle has a matching query and vice-versa naming
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
    assert(qs.size >= 60)
  }
}
