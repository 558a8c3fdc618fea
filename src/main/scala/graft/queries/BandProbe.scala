package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (VERDICT r15 item 7): scaling evidence for the d03/m05
  * hot-bucket cap. Synthesizes a scale-N corpus (shifted copies of
  * `documents`, shingle-disjoint by a per-copy prefix) PLUS a poisoned
  * hot bucket — `poisonRows` identical documents, whose every LSH band
  * collides into one bucket — and records, per scale:
  *
  *  - the analytic UNCAPPED pair count (Σ c·(c−1)/2 over the band
  *    bucket histogram — what the self-join would materialize with no
  *    cap; the poisoned bucket alone contributes ~poisonRows²/2 pairs
  *    PER BAND regardless of corpus size);
  *  - the CAPPED candidate count + wall time (cappedSelfCandidates,
  *    the shipped kernel) and the verify-stage wall time (estJaccard
  *    over those candidates);
  *  - hot-bucket count and worst bucket size.
  *
  * The claim under test: candidate volume and wall time grow ~linearly
  * with the HONEST corpus (shifted copies are near-dup-free, so
  * candidates stay ~flat) while the poisoned quadratic blowup is
  * excluded by the cap at EVERY scale. Results recorded in BASELINE.md
  * (round 16).
  *
  * Usage: runMain graft.queries.BandProbe <sfDir> [scale ...]
  * (default scales 1 10 30; poison fixed at 10000 rows).
  */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val scales = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(1, 10, 30)
    val poisonRows = 10000
    val spark = SparkSession.builder().master("local[8]")
      .appName("band-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .filter(col("text").isNotNull)

    val poison = spark.range(poisonRows)
      .select((-col("id") - 1).as("doc_id"),
        lit("the quick brown fox jumps over the lazy graft probe bucket " +
          "again and again for the degenerate band").as("text"))

    // every word carries a per-copy suffix: copies are SHINGLE-DISJOINT
    // from the base and each other, while the WITHIN-copy similarity
    // structure maps bijectively onto the base corpus — the honest
    // candidate set grows exactly linearly with scale
    def corpus(scale: Int): DataFrame =
      (0 until scale).map { i =>
        if (i == 0) base
        else base.select((col("doc_id") + i * 100000000L).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"$$1zz$i").as("text"))
      }.reduce(_ union _).union(poison)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    scales.foreach { scale =>
      val docs = corpus(scale)
        .repartition(spark.sparkContext.defaultParallelism).cache()
      val nDocs = docs.count()
      val h32 = docs.select(col("doc_id"),
        explode(graft.ops.MinShingleMd5.shingle_md5_hashes(col("text"), 8))
          .as("h"))
      val sigs = DedupQueries.minhashSigsOf(h32).cache()
      val bands = DedupQueries.bandsOf(sigs).cache()
      bands.count() // materialize before timing the join stage
      val hist = bands.groupBy("band", "bucket").agg(count(lit(1)).as("c"))
        .agg(
          sum(col("c") * (col("c") - 1) / 2).as("uncapped_pairs"),
          sum(when(col("c") > DedupQueries.HotBucketCap, 1).otherwise(0))
            .as("hot_buckets"),
          max("c").as("worst_bucket"))
        .collect().head
      val (cands, tCand) = time {
        DedupQueries.cappedSelfCandidates(bands, DedupQueries.HotBucketCap)
          .cache()
      }
      val (nCand, tCandCount) = time(cands.count())
      val (nVerified, tVerify) = time {
        DedupQueries.estJaccard(cands, sigs)
          .filter(col("est_jaccard") >= 0.5).count()
      }
      println(s"""{"scale":$scale,"docs":$nDocs,""" +
        s""""uncapped_pairs_analytic":${hist.getDouble(0).toLong},""" +
        s""""hot_buckets":${hist.getLong(1)},""" +
        s""""worst_bucket":${hist.getLong(2)},""" +
        s""""capped_candidates":$nCand,""" +
        s""""cand_sec":${"%.2f".format(tCand + tCandCount)},""" +
        s""""verified_ge05":$nVerified,""" +
        s""""verify_sec":${"%.2f".format(tVerify)}}""")
      docs.unpersist(); sigs.unpersist(); bands.unpersist(); cands.unpersist()
    }
    spark.stop()
  }
}
