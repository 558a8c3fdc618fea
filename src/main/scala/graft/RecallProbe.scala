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

    val n = corpus.count()
    println(s"corpus=$n autoCells=${graft.ops.AnnIvf.autoCells(n)}")
    // legacy fixed point + the auto-scaled point at several nprobe
    // fractions — the sweep that pins the gates' operating points
    for (cells <- Seq(16, graft.ops.AnnIvf.autoCells(n))) {
      val idx = graft.ops.AnnIvf.buildIndex(corpus, "vec_id", "embedding",
        numCells = cells, trainSampleFraction = 0.5, maxIter = 10)
      for (frac <- Seq(0.25, 0.4, 0.5, 0.6, 0.75)) {
        val nprobe = math.max(1, math.ceil(cells * frac).toInt)
        val r = recall(graft.ops.AnnIvf.annTopK(idx, probes, "vec_id", "embedding",
          k = 5, nprobe = nprobe))
        println(f"IVF cells=$cells nprobe=$nprobe (frac=$frac) train=0.5 recall@5=$r%.3f")
      }
    }
    for ((tables, planes) <- Seq((32, 5))) {
      val r = recall(graft.ops.AnnLsh.annTopK(corpus, probes, "vec_id", "embedding", 64,
        k = 5, numTables = tables, numPlanes = planes))
      println(f"LSH tables=$tables planes=$planes recall@5=$r%.3f")
    }
    spark.stop()
  }
}
