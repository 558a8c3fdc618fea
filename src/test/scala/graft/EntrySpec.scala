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

  test("Verify.renderLint flags the renderer-ambiguous result classes " +
    "(DECIMAL / FLOAT columns, doubles in scientific-notation bands) and " +
    "passes exact-integer and in-band double outputs") {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // clean: BIGINT cents + an in-band double — the shape gates must use
    val clean = Seq((1L, 57040L, 570.4)).toDF("k", "cents", "avg_v")
    assert(Verify.renderLint(clean).isEmpty)
    // DECIMAL output column: the r41/r42 trailing-zero hash-flip class
    val dec = clean.select(col("k"), (col("cents") / 100).cast("decimal(18,2)").as("m"))
    assert(Verify.renderLint(dec).exists(_.contains("DECIMAL")))
    // DECIMAL nested inside a struct is still flagged
    val nested = clean.select(struct(
      (col("cents") / 100).cast("decimal(18,2)").as("m")).as("s"))
    assert(Verify.renderLint(nested).exists(_.contains("DECIMAL")))
    // FLOAT promotes with garbage digits through any float64 renderer
    val flt = clean.select(col("avg_v").cast("float").as("f"))
    assert(Verify.renderLint(flt).exists(_.contains("FLOAT")))
    // doubles at renderer notation thresholds are value-flagged...
    val big = Seq((1L, 1.2e17), (2L, 3.0)).toDF("k", "v")
    assert(Verify.renderLint(big).exists(_.contains("scientific-notation")))
    val tiny = Seq((1L, 1.0e-6)).toDF("k", "v")
    assert(Verify.renderLint(tiny).nonEmpty)
    // ...but zero and ordinary magnitudes are not
    val ok = Seq((1L, 0.0), (2L, 1234.5678)).toDF("k", "v")
    assert(Verify.renderLint(ok).isEmpty)
    // the value scan reaches doubles NESTED in arrays and structs
    val arrBad = Seq((1L, Seq(1.0, 3.0e-5))).toDF("k", "vs")
    assert(Verify.renderLint(arrBad).exists(_.contains("scientific-notation")))
    val arrOk = Seq((1L, Seq(1.0, 2.5))).toDF("k", "vs")
    assert(Verify.renderLint(arrOk).isEmpty)
    val structBad = Seq((1L, 2.0e17)).toDF("k", "v")
      .select(col("k"), struct(col("v").as("inner")).as("s"))
    assert(Verify.renderLint(structBad).exists(_.contains("scientific-notation")))
    val mapBad = Seq((1L, Map("a" -> 5.0e-6))).toDF("k", "m")
    assert(Verify.renderLint(mapBad).nonEmpty)
  }
}
