package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement tool (VERDICT r17 item 8): the ConnectedComponents
  * bounded-local-finish crossover at synthetic scale. Sweeps edge counts
  * across the `graft.cc.localFinishMaxEdges` boundary and times label()
  * on three routes per size:
  *
  *   - `hybrid`  — the shipped default (cap 65536): distributed
  *     star-contraction rounds until the LIVE edge set fits the driver
  *     budget, then one bounded collect + union-find.
  *   - `distrib` — cap 0: pure distributed loop to convergence (the
  *     100 TB route; the hybrid must degrade to exactly this when the
  *     live set never fits).
  *   - labels from both routes are asserted equal per size (the spec's
  *     equality pin, re-checked at probe scale).
  *
  * Graph shape: disjoint chains of length `chain` (the worst case for
  * naive propagation — O(log chain) contraction rounds), so the LIVE
  * edge count stays ~n until the first rounds contract it; sizes below
  * the cap local-finish immediately, sizes above it must run distributed
  * rounds first (the crossover the default cap buys).
  *
  * Usage: sbt "runMain graft.CcProbe [edges...]"   (default sweep
  * 65536/4 .. 4M — the 1e5–1e7 class scaled to a local box)
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sizes: Seq[Long] =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(16384L, 65536L, 262144L, 1048576L, 4194304L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cc-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val chain = 64L // components of 65 vertices; rounds ~ log2(64)
    // warmup: JIT the shuffle/codegen paths so size 1 isn't billed startup
    runOnce(spark, 8192L, chain, "65536")

    println("n_edges\troute\twall_s\tcomponents")
    for (n <- sizes) {
      // hybrid FIRST: the second run of a size sees warmer JIT/page
      // cache, so any ordering bias favors the DISTRIBUTED side and the
      // hybrid's reported win is conservative. Note the expected shape:
      // star contraction of a chain graph keeps the live edge set ~n
      // (one edge per non-root vertex), so ABOVE the cap the local
      // finish never engages and the two routes must read EQUAL — the
      // parity there is the "distributed path re-engages, never a
      // driver collect past the cap" pin; the win lives below the cap.
      val (tH, compH) = runOnce(spark, n, chain, "65536")
      val (tD, compD) = runOnce(spark, n, chain, "0")
      require(compD == compH,
        s"route labels diverge at n=$n: $compD vs $compH components")
      println(f"$n\tdistrib\t$tD%.2f\t$compD")
      println(f"$n\thybrid\t$tH%.2f\t$compH")
    }
    spark.stop()
  }

  /** Build the chain graph of `n` edges, run label() under the given
    * cap, and return (wall seconds, distinct component count) — the
    * count both forces full materialization and is the cheap label
    * checksum compared across routes.
    */
  private def runOnce(
      spark: SparkSession, n: Long, chain: Long, cap: String): (Double, Long) = {
    // edge i: u = i + i/chain (skip one id per chain boundary), v = u+1 —
    // disjoint chains of `chain` edges each, deterministic, distributed
    val edges = spark.range(n)
      .select((col("id") + (col("id") / chain).cast("long")).as("u"))
      .select(col("u"), (col("u") + 1L).as("v"))
    val vertices = edges.select(col("u").as("id"))
      .union(edges.select(col("v").as("id"))).distinct()
    spark.conf.set("graft.cc.localFinishMaxEdges", cap)
    try {
      spark.sparkContext.setJobDescription(s"cc-probe n=$n cap=$cap")
      val t0 = System.nanoTime()
      val comps = ops.ConnectedComponents.label(vertices, edges)
        .agg(countDistinct(col("component"))).head().getLong(0)
      ((System.nanoTime() - t0) / 1e9, comps)
    } finally {
      spark.conf.unset("graft.cc.localFinishMaxEdges")
      spark.sparkContext.setJobDescription(null)
    }
  }
}
