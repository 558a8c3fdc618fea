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

  // ---- scale-safe stored-index loading -------------------------------
  //
  // fromTables collects all k centroids to the driver. k follows the
  // auto law k = ceil(sqrt(N)): at N ~ 1e11 that is ~3e5 centroids ×
  // dims doubles materialized PER PLANNING — the driver becomes the
  // bottleneck exactly when the index matters most (VERDICT r13 item 3).
  // loadStored keeps the flat path below a driver budget and above it
  // derives a TWO-LEVEL view of the same flat tables: k1 = ceil(sqrt(k))
  // super-centers train over the centroid TABLE (k rows, distributed,
  // driver holds only k1 centers), the original centroids become the
  // sub-center table, and probes ride the annTopK2 composition. The
  // persisted artifact is unchanged — the routing is load-time only.

  /** Max centroids a stored-index load may collect driver-side. 4096 ×
    * 1024-dim doubles ≈ 32 MB — comfortably inside any driver; above it
    * the two-level route keeps driver state at ~sqrt(k).
    */
  val DriverCentroidCap = 4096

  /** A probe-ready stored index, flat or super-quantized. */
  sealed trait StoredIvf {
    /** Total cell count — the auto-k law's k, drives nprobe choices. */
    def numCells: Int
    def topK(probes: DataFrame, idCol: String, embCol: String,
        k: Int, nprobe: Int): DataFrame
  }

  final case class StoredFlat(index: IvfIndex) extends StoredIvf {
    def numCells: Int = index.centers.length
    def topK(probes: DataFrame, idCol: String, embCol: String,
        k: Int, nprobe: Int): DataFrame =
      annTopK(index, probes, idCol, embCol, k, nprobe)
  }

  final case class StoredTwoLevel(index: IvfIndex2, numCells: Int)
    extends StoredIvf {
    // nprobeSuper = ALL supers: the loader's super layer exists for
    // DRIVER SAFETY (never collect k centroids), not probe-cost
    // reduction — ranking every sub-centroid distributed reproduces the
    // flat route's top-nprobe cells EXACTLY (same (d2, cell) order), so
    // the auto-route can never change a result. Callers wanting the
    // clipped-super cost profile use buildIndexTwoLevel/annTopK2
    // deliberately (RecallProbe: clipping 8/10 supers cost 6 recall
    // points at scale=20 — wrong trade for a transparent loader).
    def topK(probes: DataFrame, idCol: String, embCol: String,
        k: Int, nprobe: Int): DataFrame =
      annTopK2(index, probes, idCol, embCol, k,
        nprobeSuper = index.superCenters.length, nprobe = nprobe)
  }

  /** Load a persisted flat index ([[cellsTable]]/[[centroidsTable]]
    * layout), choosing the driver-safe route automatically.
    */
  def loadStored(
      cells: DataFrame, centroids: DataFrame,
      idCol: String, embCol: String,
      driverCentroidCap: Int = DriverCentroidCap,
      seed: Long = 42L): StoredIvf = {
    // one distributed pass validates the contiguous 0..k-1 cell contract
    // (same law fromTables enforces, without collecting the rows)
    val v = centroids.agg(
      count(lit(1)), countDistinct(col("cell")),
      min(col("cell")), max(col("cell"))).collect().head
    val k = v.getLong(0)
    require(k > 0 && v.getLong(1) == k && v.getInt(2) == 0 &&
      v.getInt(3) == k - 1,
      s"centroids table must contain exactly cells 0..k-1, got: " +
        s"${v.getLong(1)} distinct over $k rows in [${v.get(2)}, ${v.get(3)}]")
    if (k <= driverCentroidCap)
      StoredFlat(fromTables(cells, centroids, idCol, embCol))
    else {
      val k1 = math.max(2, math.ceil(math.sqrt(k.toDouble)).toInt)
      val withVec = centroids.select(col("cell"), col("center"))
        .withColumn("__features",
          array_to_vector(col("center").cast("array<double>")))
      val superModel = new KMeans()
        .setK(k1).setSeed(seed).setFeaturesCol("__features")
        .setPredictionCol("__super")
        .setInitMode("random").setMaxIter(8)
        .fit(withVec)
      val subCenters = superModel.transform(withVec)
        .select(col("__super").cast("int").as("super"), col("cell"),
          col("center").cast("array<double>").as("center"))
      // annTopK2 touches `assigned` only through __cell in the re-rank;
      // the per-row __super is never read on the stored route, so a
      // constant stands in for it rather than paying a k-row map join
      val assigned = cells
        .select(col(idCol), col(embCol), col("cell").as("__cell"))
        .withColumn("__super", lit(-1))
      StoredTwoLevel(
        IvfIndex2(assigned,
          superModel.clusterCenters.toSeq.map(_.toArray.toSeq),
          subCenters,
          subsPerSuper = math.max(1, math.ceil(k.toDouble / k1).toInt)),
        k.toInt)
    }
  }

  // ---- incremental index maintenance (VERDICT r14 item 6) -------------
  //
  // At 100 TB embeddings append continuously; rebuilding the quantizer
  // on every batch is a full corpus pass. The append path instead
  // assigns new rows to their nearest EXISTING cell — exactly what the
  // build-time assignment does for rows that arrived a batch later, so
  // probe correctness is untouched (cells only route; the exact re-rank
  // scores whatever lives in them). The cost is staleness: centroids no
  // longer reflect the grown corpus, so cells drift unbalanced as N
  // grows. The contract is [[needsRetrain]]: by the auto-k law the
  // built k was ~sqrt(N0); once sqrt(N) exceeds 2x that (corpus grew
  // ~4x), mean cell occupancy is ~4x the design point and a retrain is
  // due. RecallProbe's incremental mode measures the interim: recall
  // at 2x growth without any retrain stays above the 0.90 gate.

  /** Assign new rows to their nearest existing cell, distributed, with
    * the same driver-safety routes as [[loadStored]]: flat indexes
    * broadcast their (bounded) centroid matrix; two-level loads rank
    * the sub-centroid TABLE (exact flat parity — same (d2, cell) order,
    * ties to the lower cell id, matching the build-time assignment).
    * Returns (idCol, embCol, cell INT) rows, appendable to the
    * persisted [[cellsTable]].
    */
  def assignToStored(
      stored: StoredIvf, rows: DataFrame,
      idCol: String, embCol: String): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val pe = col("pe")
    val subs = stored match {
      case StoredFlat(index) =>
        broadcast(index.centers.zipWithIndex
          .map { case (c, i) => (i, c) }.toDF("cell", "center"))
      case StoredTwoLevel(index, _) =>
        index.subCenters.select(col("cell"), col("center"))
    }
    val ce = col("center").cast("array<double>")
    val d2 = vector.vec_dot(pe, pe) - lit(2.0) * vector.vec_dot(pe, ce) +
      vector.vec_dot(ce, ce)
    val w = Window.partitionBy("__rid").orderBy(col("d2"), col("cell"))
    rows
      .select(col(idCol).as("__rid"), col(embCol).as("pe"))
      .crossJoin(subs)
      .select(col("__rid"), pe, col("cell"), d2.as("d2"))
      .select(col("__rid"), pe, col("cell"), row_number().over(w).as("rn"))
      .filter(col("rn") === 1)
      .select(col("__rid").as(idCol), col("pe").as(embCol),
        col("cell").cast("int").as("cell"))
  }

  /** Retrain threshold: the stored quantizer was sized k0 ~ sqrt(N0);
    * once the CURRENT corpus would auto-size past `factor` x k0 (corpus
    * grew ~factor^2), cells sit far off their design occupancy and the
    * index is due a rebuild. Below that, append via [[assignToStored]].
    */
  def needsRetrain(
      storedK: Long, currentN: Long,
      maxCellRows: Long = 100000L, factor: Double = 2.0): Boolean =
    autoCells(currentN, maxCellRows) > factor * storedK

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
    rerank(probeCells, index.assigned, idCol, embCol, k)
  }

  /** Exact-cosine re-rank of the candidate cells: the shared tail of the
    * flat and two-level probe paths. No distinct needed: a corpus vector
    * lives in exactly ONE cell, so a (probe, neighbor) pair arises at
    * most once across the probed cells.
    */
  private def rerank(
      probeCells: DataFrame,
      assigned: DataFrame,
      idCol: String,
      embCol: String,
      k: Int): DataFrame = {
    val corpus = assigned
      .select(col(idCol).as("neighbor_id"), col(embCol).as("ne"), col("__cell"))
    val ne = col("ne")
    val pe2 = col("pe")
    val cos = vector.vec_dot(pe2, ne) /
      sqrt(vector.vec_dot(pe2, pe2) * vector.vec_dot(ne, ne))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(probeCells)
      .join(corpus, Seq("__cell"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"), cos.as("cos"))
      .select(col("probe_id"), col("neighbor_id"), col("cos"),
        row_number().over(w).as("rank"))
      .filter(col("rank") <= k)
  }

  // ---- Two-level coarse quantizer (the beyond-driver-envelope path) ----
  //
  // The flat builder collects all k = ceil(sqrt(N)) centroids to the
  // driver and trains one k-means whose per-iteration cost is N x k
  // distances. At N ~ 1e11 that is ~1e6 centroids (100s of MB on the
  // driver) and the training dominates the build (VERDICT r12 item 2).
  // The two-level quantizer keeps the SAME auto-k law but splits it:
  // k1 = ceil(sqrt(k)) super-cells train distributed (k1 is tiny — the
  // driver never holds more than k1 x dims), then each super-cell trains
  // its own k2 = ceil(k/k1) sub-centroids LOCALLY inside one executor
  // over a bounded deterministic sample (one shuffle on the super id,
  // never a driver round trip). Total cells ~ k, per-level training cost
  // ~ N x sqrt(k). Sub-centroids stay a DataFrame end to end.

  final case class IvfIndex2(
      assigned: DataFrame, // idCol, emb, __super, __cell
      superCenters: Seq[Seq[Double]],
      subCenters: DataFrame, // super INT, cell INT (global id), center ARRAY<DOUBLE>
      subsPerSuper: Int)

  /** Train the two-level quantizer and assign every corpus vector its
    * global cell id (= super * subsPerSuper + subIndex). `numCells <= 0`
    * auto-scales via [[autoCells]]. `subSampleBudget` is the EXPECTED
    * per-super training sample (hash-deterministic; a pathological skew
    * concentrating the corpus in one super-cell trains that cell on a
    * stride-capped subset).
    */
  def buildIndexTwoLevel(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      numCells: Int = -1,
      seed: Long = 42L,
      maxIter: Int = 8,
      maxCellRows: Long = 100000L,
      subSampleBudget: Int = 4000): IvfIndex2 = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val n = corpus.count()
    val k = if (numCells > 0) numCells else autoCells(n, maxCellRows)
    val k1 = math.max(2, math.ceil(math.sqrt(k.toDouble)).toInt)
    val k2 = math.max(1, math.ceil(k.toDouble / k1).toInt)
    val withVec = corpus
      .select(col(idCol), col(embCol))
      .withColumn("__features", array_to_vector(col(embCol).cast("array<double>")))
    val superModel = new KMeans()
      .setK(k1).setSeed(seed).setFeaturesCol("__features")
      .setPredictionCol("__super")
      .setInitMode("random").setMaxIter(maxIter)
      .fit(withVec)
    val superCenters = superModel.clusterCenters.toSeq.map(_.toArray.toSeq)
    val assignedSuper = superModel.transform(withVec).drop("__features")
    // deterministic hash-sample sized for ~subSampleBudget rows per super
    val keep = math.max(1L, (math.min(1.0,
      subSampleBudget.toDouble * k1 / math.max(1L, n)) * 1000000L).toLong)
    val sampled = assignedSuper
      .filter(pmod(xxhash64(col(idCol), lit(seed)), lit(1000000L)) < lit(keep))
      .select(col("__super"),
        xxhash64(col(idCol)).as("__h"),
        col(embCol).cast("array<double>").as("__e"))
      .as[(Int, Long, Seq[Double])]
    val cap = subSampleBudget * 4
    val subCenters = sampled.groupByKey(_._1)
      .flatMapGroups { (sup, it) =>
        // sort by the id hash so rebuilds see the same point order
        // (mapGroups arrival order is not deterministic)
        val pts0 = it.toArray.sortBy(_._2).map(_._3.toArray)
        val pts =
          if (pts0.length <= cap) pts0
          else Array.tabulate(cap)(j => pts0((j.toLong * pts0.length / cap).toInt))
        localKMeans(pts, k2, maxIter).iterator.zipWithIndex.map {
          case (c, j) => (sup, sup * k2 + j, c.toSeq)
        }
      }
      .toDF("super", "cell", "center")
      .cache()
    // final assignment: one join on the super id (Catalyst broadcasts
    // the grouped sub-centroid table when it fits, shuffles otherwise);
    // each row scans only its OWN super's k2 centers
    val grouped = subCenters
      .groupBy(col("super").as("__super"))
      .agg(collect_list(struct(col("cell"), col("center"))).as("__subs"))
    val assigned = assignedSuper
      .join(grouped, Seq("__super"))
      .withColumn("__cell", nearestSub(
        col(embCol).cast("array<double>"),
        expr("transform(__subs, s -> s.cell)"),
        expr("transform(__subs, s -> s.center)")))
      .drop("__subs")
      .cache()
    IvfIndex2(assigned, superCenters, subCenters, k2)
  }

  /** argmin over THIS row's sub-centroids (aligned cell/center arrays
    * split from one struct array, so pairing is exact); ties break to
    * the lower cell id. A UDF by design: the k2-way argmin over a
    * per-row centroid list has no HOF form that avoids exploding
    * N x k2 rows, and it runs once per corpus row at INDEX BUILD, never
    * in the probe path.
    */
  private val nearestSub =
    udf { (e: Seq[Double], cells: Seq[Int], centers: Seq[Seq[Double]]) =>
      var best = 0
      var bd = Double.MaxValue
      var j = 0
      while (j < centers.length) {
        val c = centers(j)
        var d = 0.0
        var i = 0
        val m = math.min(c.length, e.length)
        while (i < m) { val t = e(i) - c(i); d += t * t; i += 1 }
        if (d < bd || (d == bd && cells(j) < cells(best))) { bd = d; best = j }
        j += 1
      }
      cells(best)
    }

  /** Deterministic local Lloyd's k-means over a bounded sample: striding
    * init over the caller-sorted points, fixed iterations, empty clusters
    * keep their previous center (they route nothing; the exact re-rank
    * absorbs assignment noise the same way the flat builder's bounded
    * iterations do).
    */
  private[ops] def localKMeans(
      points: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    if (points.isEmpty) return Array.empty
    val kk = math.min(k, points.length)
    var centers = Array.tabulate(kk)(j =>
      points((j.toLong * points.length / kk).toInt).clone())
    val dims = points.head.length
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](dims))
      val counts = new Array[Long](kk)
      points.foreach { p =>
        var best = 0
        var bd = Double.MaxValue
        var j = 0
        while (j < kk) {
          val c = centers(j)
          var d = 0.0
          var i = 0
          while (i < dims) { val t = p(i) - c(i); d += t * t; i += 1 }
          if (d < bd) { bd = d; best = j }
          j += 1
        }
        var i = 0
        while (i < dims) { sums(best)(i) += p(i); i += 1 }
        counts(best) += 1
      }
      centers = Array.tabulate(kk) { j =>
        if (counts(j) == 0L) centers(j)
        else {
          val c = sums(j)
          var i = 0
          while (i < dims) { c(i) /= counts(j); i += 1 }
          c
        }
      }
      it += 1
    }
    centers
  }

  /** Store-shaped views of a two-level index (same contract as
    * [[cellsTable]]/[[centroidsTable]]: write once at ingest, probe
    * sessions rebuild from the tables). The super table carries
    * `subs_per_super` as a constant column — the global cell id is
    * `super * subs_per_super + subIndex`, so the rebuild must use the
    * exact build-time value, self-described rather than re-derived.
    */
  def cellsTableTwoLevel(
      index: IvfIndex2, idCol: String, embCol: String): DataFrame =
    index.assigned.select(
      col(idCol), col(embCol),
      col("__super").cast("int").as("super"),
      col("__cell").cast("int").as("cell"))

  def superCentroidsTable(
      index: IvfIndex2, spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    index.superCenters.zipWithIndex
      .map { case (c, i) => (i, c, index.subsPerSuper) }
      .toDF("super", "center", "subs_per_super")
  }

  /** Rebuild a two-level index from its persisted tables. Only the k1
    * super centroids collect to the driver (tiny by construction); the
    * sub-centroid and cell tables stay DataFrames.
    */
  def fromTablesTwoLevel(
      cells: DataFrame,
      superCentroids: DataFrame,
      subCentroids: DataFrame,
      idCol: String,
      embCol: String): IvfIndex2 = {
    val supRows = superCentroids
      .select("super", "center", "subs_per_super").collect()
    require(supRows.nonEmpty, "super-centroid table is empty")
    val k2s = supRows.map(_.getInt(2)).distinct
    require(k2s.length == 1,
      s"super-centroid table carries conflicting subs_per_super: ${k2s.mkString(", ")}")
    val bySup = supRows.map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq)
      .sortBy(_._1)
    val ids = bySup.map(_._1).toSeq
    require(ids == (0 until bySup.length),
      s"super-centroid table must contain exactly supers 0..k1-1, got: ${ids.mkString(", ")}")
    IvfIndex2(
      cells.select(col(idCol), col(embCol),
        col("super").as("__super"), col("cell").as("__cell")),
      bySup.map(_._2).toSeq,
      subCentroids.select("super", "cell", "center"),
      k2s.head)
  }

  /** Two-level approximate top-k: probes pick their `nprobeSuper`
    * nearest super-cells (broadcast k1 centroids — tiny), rank the
    * sub-centroids of ONLY those supers, search the `nprobe` nearest,
    * then exact-cosine re-rank. The full sub-centroid table never
    * broadcasts to the probe path: the per-probe candidate set is
    * nprobeSuper x k2 rows.
    */
  def annTopK2(
      index: IvfIndex2,
      probes: DataFrame,
      idCol: String,
      embCol: String,
      k: Int = 5,
      nprobeSuper: Int = 4,
      nprobe: Int = 16): DataFrame = {
    val spark = probes.sparkSession
    import spark.implicits._
    val k1 = index.superCenters.length
    val pe = col("pe")
    val probesP = probes.select(col(idCol).as("probe_id"), col(embCol).as("pe"))
    val subs = index.subCenters
      .withColumnRenamed("super", "__super")
      .withColumnRenamed("cell", "__cell")
    // Fused probe (optimization r18, guide §2.4): when the caller probes
    // ALL supers (nprobeSuper >= k1 — the loadStored/StoredTwoLevel route
    // and both persisted gates r68/r69 by construction), the super-
    // ranking pass is an IDENTITY: every (probe, super) pair survives the
    // sr filter, so the join to the sub-centroid table reproduces exactly
    // probes × subCenters. Build that product directly and skip the
    // super crossjoin + window + broadcast (2 exchanges and a broadcast
    // build removed from every probe). The __super range filter keeps
    // strict route equality even on a malformed store whose sub table
    // carries an out-of-range super id (the join would drop such rows).
    val cand =
      if (nprobeSuper >= k1)
        probesP.crossJoin(
          subs.filter(col("__super") >= 0 && col("__super") < k1)
            .select("__cell", "center"))
      else {
        val supDf = index.superCenters.zipWithIndex
          .map { case (c, i) => (i, c) }
          .toDF("__super", "scenter")
        val sc = col("scenter").cast("array<double>")
        val d2s = vector.vec_dot(pe, pe) - lit(2.0) * vector.vec_dot(pe, sc) +
          vector.vec_dot(sc, sc)
        val wSup = Window.partitionBy("probe_id").orderBy(col("d2"), col("__super"))
        val probeSupers = probesP
          .crossJoin(broadcast(supDf))
          .select(col("probe_id"), col("pe"), col("__super"), d2s.as("d2"))
          .select(col("probe_id"), col("pe"), col("__super"),
            row_number().over(wSup).as("sr"))
          .filter(col("sr") <= nprobeSuper)
          .select("probe_id", "pe", "__super")
        broadcast(probeSupers)
          .join(subs, Seq("__super"))
          .select("probe_id", "pe", "__cell", "center")
      }
    val ce = col("center").cast("array<double>")
    val d2c = vector.vec_dot(pe, pe) - lit(2.0) * vector.vec_dot(pe, ce) +
      vector.vec_dot(ce, ce)
    val wCell = Window.partitionBy("probe_id").orderBy(col("d2"), col("__cell"))
    val probeCells = cand
      .select(col("probe_id"), col("pe"), col("__cell"), d2c.as("d2"))
      .select(col("probe_id"), col("pe"), col("__cell"),
        row_number().over(wCell).as("cr"))
      .filter(col("cr") <= nprobe)
      .select("probe_id", "pe", "__cell")
    rerank(probeCells, index.assigned, idCol, embCol, k)
  }
}
