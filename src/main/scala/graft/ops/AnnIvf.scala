package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbors: a k-means coarse
  * quantizer partitions the corpus into cells; probes search only the
  * `nprobe` nearest cells, then exact-cosine re-rank.
  *
  * Complements [[AnnLsh]]: IVF adapts to the data distribution (cells
  * follow the clusters), LSH is data-independent. Both share the codegen
  * [[DotProduct]] re-rank kernel.
  *
  * Scale shape: training samples the corpus (bounded driver cost for the
  * k x dims centroid matrix, which is small and broadcast); assignment is
  * a narrow projection; the candidate join shuffles on cell id (corpus/k
  * rows per cell on balanced data). Determinism: fixed seed.
  */
object AnnIvf {

  final case class IvfIndex(
      assigned: DataFrame, // idCol, emb, __cell
      centers: Seq[Seq[Double]])

  /** Cell count for a corpus of `n` vectors: k ~ sqrt(n), the classical
    * IVF balance point (probe cost ~ nprobe * n/k rows + k centroid
    * distances — sqrt(n) equalizes the two growth terms), bounded below
    * so no cell can exceed `maxCellRows` however large the corpus grows.
    * A FIXED k does not survive scale-up: at 100x the corpus, cells are
    * corpus/16 and every probe rescans 1/16th of the data.
    */
  def autoCells(n: Long, maxCellRows: Long = 100000L): Int = {
    require(maxCellRows > 0, s"maxCellRows must be positive: $maxCellRows")
    val bySqrt = math.ceil(math.sqrt(math.max(1L, n).toDouble)).toLong
    val byCap = (n + maxCellRows - 1) / maxCellRows
    math.max(2L, math.max(bySqrt, byCap)).min(Int.MaxValue.toLong).toInt
  }

  /** Train the coarse quantizer and assign every corpus vector a cell.
    * `numCells <= 0` auto-scales via [[autoCells]] (one corpus count).
    */
  def buildIndex(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      numCells: Int = -1,
      trainSampleFraction: Double = 1.0,
      seed: Long = 42L,
      maxIter: Int = 8,
      maxCellRows: Long = 100000L): IvfIndex = {
    val k = if (numCells > 0) numCells else autoCells(corpus.count(), maxCellRows)
    val withVec = corpus
      .select(col(idCol), col(embCol))
      .withColumn("__features", array_to_vector(col(embCol).cast("array<double>")))
    val train =
      if (trainSampleFraction >= 1.0) withVec
      else withVec.sample(withReplacement = false, trainSampleFraction, seed)
    // A coarse quantizer doesn't need converged clustering — cells only
    // route probes, and the exact re-rank fixes assignment noise. Random
    // init (k-means|| is itself several passes over the data) and a
    // bounded iteration count keep index build linear and cheap; recall
    // is asserted downstream in OpsSpec either way.
    val model = new KMeans()
      .setK(k).setSeed(seed).setFeaturesCol("__features")
      .setPredictionCol("__cell")
      .setInitMode("random").setMaxIter(maxIter)
      .fit(train)
    // the index IS this assignment — persist it like any ANN index is
    // persisted (callers holding an IvfIndex query it repeatedly)
    val assigned = model.transform(withVec).drop("__features").cache()
    IvfIndex(assigned, model.clusterCenters.toSeq.map(_.toArray.toSeq))
  }

  /** Store-shaped views of an index and reconstruction from them — at
    * 100 TB an ANN index is a PERSISTED artifact (a pair of remote
    * tables written once at ingest), not a session cache. `cellsTable` /
    * `centroidsTable` are what gets written; [[fromTables]] rebuilds a
    * probe-ready index in a session that never trained anything (gate
    * r32 drives the full cycle through the connector).
    */
  def cellsTable(index: IvfIndex, idCol: String, embCol: String): DataFrame =
    index.assigned.select(
      col(idCol), col(embCol), col("__cell").cast("int").as("cell"))

  def centroidsTable(index: IvfIndex, spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    index.centers.zipWithIndex.map { case (c, i) => (i, c) }.toDF("cell", "center")
  }

  /** Rebuild an index from its persisted tables. The centroid matrix is
    * k x dims — tiny by construction — so the driver collect is bounded;
    * the cell assignment stays a DataFrame (streams from the store).
    */
  def fromTables(
      cells: DataFrame, centroids: DataFrame,
      idCol: String, embCol: String): IvfIndex = {
    val byCell = centroids.select("cell", "center").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq)
      .sortBy(_._1)
    // centroid row index IS the cell id after this point: a missing or
    // duplicated cell row would silently shift every center to the wrong
    // index (and every probe to the wrong cells) — fail instead
    val ids = byCell.map(_._1).toSeq
    require(ids == (0 until byCell.length),
      s"centroids table must contain exactly cells 0..k-1, got: ${ids.mkString(", ")}")
    val centers = byCell.map(_._2).toSeq
    IvfIndex(
      cells.select(col(idCol), col(embCol), col("cell").as("__cell")),
      centers)
  }

  /** Approximate top-k: probes search their `nprobe` nearest cells. */
  def annTopK(
      index: IvfIndex,
      probes: DataFrame,
      idCol: String,
      embCol: String,
      k: Int = 5,
      nprobe: Int = 4): DataFrame = {
    val spark = probes.sparkSession
    import spark.implicits._
    val centersDf = index.centers.zipWithIndex
      .map { case (c, i) => (i, c) }
      .toDF("__cell", "center")
    // nearest nprobe cells per probe: k is small → cross join vs centers
    val pe = col("pe")
    val ce = col("center").cast("array<double>")
    val dist2 = vector.vec_dot(pe, pe) - lit(2.0) * vector.vec_dot(pe, ce) +
      vector.vec_dot(ce, ce)
    val wCell = Window.partitionBy("probe_id").orderBy(col("d2"), col("__cell"))
    val probeCells = probes
      .select(col(idCol).as("probe_id"), col(embCol).as("pe"))
      .crossJoin(broadcast(centersDf))
      .select(col("probe_id"), col("pe"), col("__cell"), dist2.as("d2"))
      .select(col("probe_id"), col("pe"), col("__cell"),
        row_number().over(wCell).as("cr"))
      .filter(col("cr") <= nprobe)
      .select("probe_id", "pe", "__cell")
    val corpus = index.assigned
      .select(col(idCol).as("neighbor_id"), col(embCol).as("ne"), col("__cell"))
    val ne = col("ne")
    val pe2 = col("pe")
    val cos = vector.vec_dot(pe2, ne) /
      sqrt(vector.vec_dot(pe2, pe2) * vector.vec_dot(ne, ne))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    // no distinct: a corpus vector lives in exactly ONE cell, so a
    // (probe, neighbor) pair arises at most once across the nprobe cells
    broadcast(probeCells)
      .join(corpus, Seq("__cell"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"), cos.as("cos"))
      .select(col("probe_id"), col("neighbor_id"), col("cos"),
        row_number().over(w).as("rank"))
      .filter(col("rank") <= k)
  }
}
