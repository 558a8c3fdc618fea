package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: measure LSH/IVF recall@5 vs brute force at a scale dir for
  * several operating points (sweep for the s03/s04 quality gates).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .appName("recall-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.register(spark, dir)

    val e = spark.table("embeddings")
    val probes = e.filter(col("vec_id") < 100)
    val corpus = e.repartition(8)

    // the gates' own baseline — shared so the sweep can't drift from s03/s04
    val exact = graft.queries.SimilarityQueries.exactTop5(spark).cache()
    val total = exact.count().toDouble

    def recall(ann: DataFrame): Double =
      ann.select("probe_id", "neighbor_id").join(exact, Seq("probe_id", "neighbor_id"))
        .count() / total

    println(s"corpus=${corpus.count()}")
    for ((cells, nprobe) <- Seq((16, 12));
         frac <- Seq(1.0, 0.5, 0.25, 0.1)) {
      val idx = graft.ops.AnnIvf.buildIndex(corpus, "vec_id", "embedding",
        numCells = cells, trainSampleFraction = frac, maxIter = 10)
      val r = recall(graft.ops.AnnIvf.annTopK(idx, probes, "vec_id", "embedding",
        k = 5, nprobe = nprobe))
      println(f"IVF cells=$cells nprobe=$nprobe train=$frac recall@5=$r%.3f")
    }
    for ((tables, planes) <- Seq((32, 5))) {
      val r = recall(graft.ops.AnnLsh.annTopK(corpus, probes, "vec_id", "embedding", 64,
        k = 5, numTables = tables, numPlanes = planes))
      println(f"LSH tables=$tables planes=$planes recall@5=$r%.3f")
    }
    spark.stop()
  }
}
