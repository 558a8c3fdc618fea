package graft

import org.scalatest.funsuite.AnyFunSuite

class StarProbeSpec extends AnyFunSuite {
  test("probe: Spark 4.1 star EXCEPT/REPLACE/APPLY/COLUMNS/GROUP BY ALL") {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .appName("star-probe").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    Seq((1, "a", 2.0)).toDF("x", "y", "z").createOrReplaceTempView("star_t")
    def tryq(q: String): Unit =
      try info(q + "  ->  " + spark.sql(q).columns.mkString(","))
      catch { case e: Exception => info(q + "  ->  ERR " + e.getMessage.take(100)) }
    tryq("SELECT * EXCEPT (y) FROM star_t")
    tryq("SELECT * REPLACE (x * 2 AS x) FROM star_t")
    tryq("SELECT * EXCEPT (y, z) FROM star_t")
    tryq("SELECT star_t.* EXCEPT (y) FROM star_t")
    tryq("SELECT * APPLY (upper) FROM star_t")
    tryq("SELECT COLUMNS('[xy]') FROM star_t")
    tryq("SELECT x, count(*) AS n FROM star_t GROUP BY ALL")
  }
}
