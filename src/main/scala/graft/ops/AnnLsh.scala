package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest neighbors via random-hyperplane LSH — the SCALE
  * path for similarity search (the brute-force baseline in
  * [[graft.queries.SimilarityQueries]] is the correctness oracle).
  *
  * Hyperplanes are derived deterministically from md5 (no RNG state to
  * ship), so bucket assignment is reproducible across sessions and
  * engines. `numTables` independent tables of `numPlanes` bits each trade
  * recall against candidate volume: collision probability for angle θ is
  * (1 - θ/π)^numPlanes per table.
  *
  * Scale shape: bucketing is a narrow projection (no shuffle); the
  * candidate join shuffles on (table, bucket) — bounded-width buckets,
  * key cardinality grows with the corpus — then only candidates pay the
  * exact-cosine re-rank. No driver-side materialization anywhere.
  */
object AnnLsh {

  /** Deterministic plane weight for (table, plane, dim) in [-7.5, +7.5]:
    * the first hex digit of md5("t:p:d") minus 7.5.
    */
  private def planeWeight(table: Int, plane: Int, dim: Int): Double = {
    val md = MessageDigest.getInstance("MD5")
    val h = md.digest(s"$table:$plane:$dim".getBytes(StandardCharsets.UTF_8))
    ((h(0) >> 4) & 0xf) - 7.5
  }

  /** Flat [t][p][d] plane matrix for the fused [[LshBucketKeys]] kernel. */
  private def flatPlanes(numTables: Int, numPlanes: Int, dims: Int): Array[Double] = {
    val out = new Array[Double](numTables * numPlanes * dims)
    var i = 0
    for (t <- 0 until numTables; p <- 0 until numPlanes; d <- 0 until dims) {
      out(i) = planeWeight(t, p, d); i += 1
    }
    out
  }

  /** Add bucket rows for each vector: one output row per LSH table.
    * `lsh_key` packs (table, bucket) into one int — the single join
    * column — via the fused [[LshBucketKeys]] kernel (one codegen pass
    * computes all tables x planes sign bits); `lsh_table`/`lsh_bucket`
    * are unpacked views of the key.
    */
  def withBuckets(
      df: DataFrame,
      embCol: String,
      dims: Int,
      numTables: Int = 8,
      numPlanes: Int = 8): DataFrame = {
    val keys = LshBucketKeys(col(embCol), flatPlanes(numTables, numPlanes, dims),
      numTables, numPlanes, dims)
    df.withColumn("lsh_key", explode(keys))
      .withColumn("lsh_table", shiftright(col("lsh_key"), numPlanes))
      .withColumn("lsh_bucket", col("lsh_key").bitwiseAND(lit((1 << numPlanes) - 1)))
  }

  /** Approximate top-k: bucket both sides, join candidates on
    * (table, bucket), exact-cosine re-rank, keep k per probe.
    *
    * @param corpus  (id, emb) rows
    * @param probes  (id, emb) rows (typically far smaller; broadcast)
    */
  def annTopK(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      embCol: String,
      dims: Int,
      k: Int = 5,
      numTables: Int = 8,
      numPlanes: Int = 8): DataFrame =
    annTopKFromBuckets(
      bucketsTable(corpus, idCol, embCol, dims, numTables, numPlanes),
      probes, idCol, embCol, dims, k, numTables, numPlanes)

  /** The corpus bucket assignment as a store-shaped frame (neighbor_id,
    * ne, lsh_key) — at 100 TB this is a PERSISTED artifact written once
    * at ingest; the planes are deterministic functions of (table, plane,
    * dim), so any probe session recomputes identical probe-side keys
    * with no stored quantizer state at all (unlike IVF's centroids).
    */
  def bucketsTable(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      dims: Int,
      numTables: Int = 8,
      numPlanes: Int = 8): DataFrame =
    withBuckets(corpus, embCol, dims, numTables, numPlanes)
      .select(col(idCol).as("neighbor_id"), col(embCol).as("ne"), col("lsh_key"))

  /** Probe against a prepared corpus bucket frame — typically
    * [[bucketsTable]] read back from a connector table (gate s08 drives
    * the persisted cycle).
    */
  def annTopKFromBuckets(
      cb: DataFrame,
      probes: DataFrame,
      idCol: String,
      embCol: String,
      dims: Int,
      k: Int = 5,
      numTables: Int = 8,
      numPlanes: Int = 8): DataFrame = {
    val pb = withBuckets(probes, embCol, dims, numTables, numPlanes)
      .select(col(idCol).as("probe_id"), col(embCol).as("pe"), col("lsh_key"))
    val pe = col("pe")
    val ne = col("ne")
    val cos = vector.vec_dot(pe, ne) /
      sqrt(vector.vec_dot(pe, pe) * vector.vec_dot(ne, ne))
    // compute cosine per bucket collision, THEN dedupe multi-table hits on
    // the scalar id pair: recomputing a 64-dim dot (codegen, ~100ns) is
    // far cheaper than shuffling embedding arrays through a distinct()
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(pb)
      .join(cb, Seq("lsh_key"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"), cos.as("cos"))
      .groupBy("probe_id", "neighbor_id")
      .agg(max("cos").as("cos"))
      .select(col("probe_id"), col("neighbor_id"), col("cos"),
        row_number().over(w).as("rank"))
      .filter(col("rank") <= k)
  }
}
