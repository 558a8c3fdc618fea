package graft.queries

import graft.{GateQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine top-k (the correctness
  * baseline) and threshold near-duplicate pairs. The scale path (LSH
  * bucketing, see [[graft.ops.AnnLsh]]) is verified against these by
  * recall in ScalaTest.
  *
  * Numerics: both engines compute cosine over float32 vectors cast to
  * double; intermediate products are exact (24-bit x 24-bit mantissas fit
  * in a double), sums are sequential folds, and outputs are rounded to 6
  * decimals on both sides, so the hash-compare is stable.
  *
  * Scale notes:
  *  - The probe side is a FIXED-size set (vec_id < 500), so cost is
  *    probes x corpus, linear in corpus size; the probe set broadcasts.
  *  - Top-k per probe is a window over the probe partition — k small,
  *    partial top-k would be the next optimization (rank pushdown).
  */
object SimilarityQueries {

  private def q(name: String, oracle: String)(
      f: (SparkSession, String) => DataFrame): GateQuery =
    GateQuery(name, (s, dir) => { Tables.register(s, dir); f(s, dir) }, Some(oracle))

  /** dot(a, b) via the native codegen kernel [[graft.ops.DotProduct]] —
    * a fused no-allocation loop, bit-identical to the sequential double
    * fold DuckDB's list_cosine_similarity performs.
    */
  private def dot(a: Column, b: Column): Column = graft.ops.vector.vec_dot(a, b)

  /** The corpus side of every probe×corpus broadcast join. The broadcast
    * join preserves the corpus partitioning, so with the local single-row-
    * group testdata the whole pair loop would run in ONE scan task;
    * repartitioning spreads it across cores. On a real fleet the scan is
    * already thousands of tasks and this shuffle is corpus-linear (no
    * pair blow-up crosses the wire).
    */
  private def corpus(s: SparkSession): DataFrame =
    s.table("embeddings").repartition(s.sparkContext.defaultParallelism)

  private val ivfIndexCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), graft.ops.AnnIvf.IvfIndex]

  /** auto-k for the sf corpus, memoized per (session, dir, data token):
    * gates that need the auto-scaled k on EVERY invocation (r68/r69 probe
    * paths — nprobe derives from it) pay the corpus count ONCE instead of
    * a full scan+shuffle per bench iteration (optimization r17, guide
    * §1.2: don't compute things you throw away). Keyed on
    * [[graft.Tables.dataToken]] (r18, the round-13 memo law): a
    * regenerated embeddings.parquet changes the token and the memo
    * recomputes instead of serving a stale constant.
    */
  private[queries] val autoKCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, (Long, Long)), Int]
  private[queries] def autoK(s: SparkSession, dir: String): Int =
    autoKCache.getOrElseUpdate((s, dir, Tables.dataToken(dir, "embeddings")),
      graft.ops.AnnIvf.autoCells(corpus(s).count()))

  /** s09's half-built + incrementally-grown index (build-once like s04's). */
  private val incIndexCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), graft.ops.AnnIvf.IvfIndex]

  /** Persisted-index stores verified this JVM (gate:tag keyed): the
    * integrity scan (counts + auto-k match, possibly a rebuild) is a
    * persisted-artifact guard, so once a store checks out it stays
    * trusted for the session — repeated gate invocations (bench
    * iterations) must pay the PROBE path only, not re-verification.
    */
  private val verifiedIndexes =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Constant oracle for the ANN quality gates: the Spark side emits this
    * row only when measured recall@5 >= 0.90, so the hash compare IS the
    * quality assertion (rows+schema+hash green instead of `no_oracle`).
    */
  private val RecallOracle =
    """SELECT CAST(100 AS BIGINT) AS n_probes, CAST(5 AS BIGINT) AS k,
      |  CAST(1 AS BIGINT) AS recall_at5_ok""".stripMargin

  /** Exact top-5 per probe (vec_id < 100) — the in-Spark recall baseline,
    * the same brute-force shape s01 hash-verifies against DuckDB. Shared
    * with [[graft.RecallProbe]] so the sweep tool and the gates can never
    * drift on tie-breaks or norms.
    */
  private[graft] def exactTop5(s: SparkSession): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = s.table("embeddings")
    val p = e.filter(col("vec_id") < 100)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      .withColumn("pn", graft.ops.vector.vec_norm_sq(col("pe")))
    val n = corpus(s)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
      .withColumn("nn", graft.ops.vector.vec_norm_sq(col("ne")))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(p).join(n, col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        (dot(col("pe"), col("ne")) / sqrt(col("pn") * col("nn"))).as("cos"))
      .select(col("probe_id"), col("neighbor_id"), row_number().over(w).as("rank"))
      .filter(col("rank") <= 5)
      .select("probe_id", "neighbor_id")
  }

  // the exact baseline is probes×k pairs (bounded: 500) — memoized per
  // (session, dir) so s03 and s04 (and repeated bench iterations) don't
  // recompute the brute-force pass
  private val exactPairsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Set[(Long, Long)]]

  /** recall@5 of `ann` vs the exact baseline → one threshold row. */
  private def recallGate(s: SparkSession, dir: String, ann: DataFrame): DataFrame = {
    import s.implicits._
    val exact = exactPairsCache.getOrElseUpdate((s, dir),
      exactTop5(s).collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    val annPairs = ann.select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (annPairs & exact).size.toDouble / exact.size
    Seq((100L, 5L, if (recall >= 0.90) 1L else 0L))
      .toDF("n_probes", "k", "recall_at5_ok")
  }

  val all: Seq[GateQuery] = Seq(

    // ---- brute-force cosine top-k (ANN correctness baseline) ----
    q("s01_knn_brute_force",
      """WITH pairs AS (
        |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
        |    list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cos
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 100),
        |ranked AS (
        |  SELECT probe_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY probe_id
        |                       ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM pairs)
        |SELECT probe_id, neighbor_id, round(cos, 6) AS cosine, rank
        |FROM ranked WHERE rank <= 5""".stripMargin) { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      val e = s.table("embeddings")
      // norms are computed ONCE per row before the pair join (probes x N),
      // so the join evaluates a single dot product per pair
      val probes = e.filter(col("vec_id") < 100)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
        .withColumn("pn", graft.ops.vector.vec_norm_sq(col("pe")))
      val neighbors = corpus(s)
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
        .withColumn("nn", graft.ops.vector.vec_norm_sq(col("ne")))
      val pairs = broadcast(probes)
        .join(neighbors, col("probe_id") =!= col("neighbor_id"))
        .select(col("probe_id"), col("neighbor_id"),
          (dot(col("pe"), col("ne")) / sqrt(col("pn") * col("nn"))).as("cos"))
      val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
      pairs
        .select(col("probe_id"), col("neighbor_id"), col("cos"),
          row_number().over(w).as("rank"))
        .filter(col("rank") <= 5)
        .select(col("probe_id"), col("neighbor_id"), round(col("cos"), 6).as("cosine"),
          col("rank"))
    },

    // ---- FILTERED vector search (metadata-constrained top-k) ----
    // The vector-DB staple: nearest neighbors restricted by a metadata
    // predicate — here "same label as the probe" (same-class retrieval).
    // The label equality lands IN the join condition, so the pair space
    // prunes BEFORE any dot product is evaluated; at 100 TB the same
    // query buckets by (label, IVF cell) and the filter becomes part of
    // the bucket key — the pre-filter never scans excluded vectors.
    q("s07_knn_filtered",
      """WITH pairs AS (
        |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
        |    list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cos
        |  FROM embeddings a JOIN embeddings b
        |    ON a.vec_id <> b.vec_id AND a.label = b.label
        |  WHERE a.vec_id < 100),
        |ranked AS (
        |  SELECT probe_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY probe_id
        |                       ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM pairs)
        |SELECT probe_id, neighbor_id, round(cos, 6) AS cosine, rank
        |FROM ranked WHERE rank <= 3""".stripMargin) { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      val e = s.table("embeddings")
      val probes = e.filter(col("vec_id") < 100)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
          col("label").as("pl"))
        .withColumn("pn", graft.ops.vector.vec_norm_sq(col("pe")))
      val neighbors = corpus(s)
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"),
          col("label").as("nl"))
        .withColumn("nn", graft.ops.vector.vec_norm_sq(col("ne")))
      val pairs = broadcast(probes)
        .join(neighbors,
          col("probe_id") =!= col("neighbor_id") && col("pl") === col("nl"))
        .select(col("probe_id"), col("neighbor_id"),
          (dot(col("pe"), col("ne")) / sqrt(col("pn") * col("nn"))).as("cos"))
      val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
      pairs
        .select(col("probe_id"), col("neighbor_id"), col("cos"),
          row_number().over(w).as("rank"))
        .filter(col("rank") <= 3)
        .select(col("probe_id"), col("neighbor_id"), round(col("cos"), 6).as("cosine"),
          col("rank"))
    },

    // ---- threshold near-duplicate pairs over a fixed probe band ----
    q("s02_embed_near_dup",
      """SELECT a.vec_id AS a, b.vec_id AS b,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
        |    AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 500
        |  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35""".stripMargin) {
      (s, _) =>
        val e = s.table("embeddings")
        val a = e.filter(col("vec_id") < 500)
          .select(col("vec_id").as("a"), col("embedding").as("ea"))
          .withColumn("na", graft.ops.vector.vec_norm_sq(col("ea")))
        val b = corpus(s).select(col("vec_id").as("b"), col("embedding").as("eb"))
          .withColumn("nb", graft.ops.vector.vec_norm_sq(col("eb")))
        broadcast(a).join(b, col("a") < col("b"))
          .select(col("a"), col("b"),
            (dot(col("ea"), col("eb")) / sqrt(col("na") * col("nb"))).as("cos"))
          .filter(col("cos") >= 0.35)
          .select(col("a"), col("b"), round(col("cos"), 6).as("cosine"))
    },

    // ---- LSH-bucketed ANN, verified by a deterministic recall@5 gate:
    // the query computes BOTH the ANN result and the exact top-5 (in
    // Spark), joins them, and emits a threshold row the DuckDB oracle can
    // check exactly — recall >= 0.90 or the battery fails. The testdata
    // embeddings are near-uniform (max pairwise cosine ~0.43), the
    // hardest case for LSH: holding 0.9 recall needs wide buckets
    // (32 tables x 5 planes). On corpora with real locality (near-dup
    // clusters) the same machinery is sublinear at far leaner settings.
    GateQuery("s03_ann_lsh",
      (s, dir) => {
        Tables.register(s, dir)
        val probes = s.table("embeddings").filter(col("vec_id") < 100)
        val ann = graft.ops.AnnLsh.annTopK(corpus(s), probes, "vec_id", "embedding", 64,
          k = 5, numTables = 32, numPlanes = 5)
        recallGate(s, dir, ann)
      },
      oracle = Some(RecallOracle)),

    // ---- IVF ANN (k-means coarse quantizer), same deterministic
    // recall@5 >= 0.90 gate. The quantizer trains on a 50% SAMPLE of the
    // corpus (fixed seed, deterministic) — the property the 100 TB story
    // rests on: training cost is bounded by the sample, cells only route
    // probes, and exact re-rank fixes quantization noise. RecallProbe
    // sweep: sampled training holds 0.926-0.950 recall at every driver
    // scale factor (full-corpus training measures 0.93-0.95 — sampling
    // costs nothing on this near-uniform corpus, the hardest case).
    GateQuery("s04_ann_ivf",
      (s, dir) => {
        Tables.register(s, dir)
        val probes = s.table("embeddings").filter(col("vec_id") < 100)
        // An IVF index is a build-once offline artifact (like Tables
        // registration): memoize per (session, dir) so repeated runs
        // measure the probe path, not quantizer re-training.
        // AUTO cell count (k ~ sqrt(N), AnnIvf.autoCells) — a fixed k=16
        // dies at 100x corpus (cells grow as corpus/16). Operating point
        // nprobe = ceil(0.75 k): RecallProbe sweep holds recall@5 = 0.964
        // at every driver scale (near-uniform corpus, the hardest case;
        // real near-dup corpora clear 0.90 at far leaner fractions).
        val index = ivfIndexCache.getOrElseUpdate((s, dir),
          graft.ops.AnnIvf.buildIndex(
            corpus(s), "vec_id", "embedding",
            trainSampleFraction = 0.5, maxIter = 10))
        val ann = graft.ops.AnnIvf.annTopK(index, probes, "vec_id", "embedding",
          k = 5, nprobe = math.ceil(0.75 * index.centers.length).toInt)
        recallGate(s, dir, ann)
      },
      oracle = Some(RecallOracle)),

    // ---- the same IVF index as a PERSISTED STORE ARTIFACT: cell
    // assignment + centroids written through the connector once, then a
    // probe-only path rebuilds the index purely from the store tables
    // (no training, no parquet corpus scan for the index side) and must
    // clear the same recall gate. This is the 100 TB shape: the index
    // lives next to the data, probe sessions just read it.
    GateQuery("r32_ann_index_persisted",
      (s, dir) => {
        Tables.register(s, dir)
        ConnectorQueries.harness(s, dir)
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val client = new graft.client.EmbeddedClickHouse(
          s"/root/repo/target/chstore_$tag")
        // build-once, but resilient to a crashed half-build: both index
        // tables must exist AND hold rows from one consistent training
        // run (createTable precedes the append, so existence alone can
        // mask an empty table from a crash between the two)
        def count(t: String): Long =
          if (!client.tableExists("main", t)) -1L
          else client.query(s"SELECT count(*) AS n FROM `main`.`$t`", 1)
            ._2.flatten.headOption.map(_.getLong(0)).getOrElse(-1L)
        // a persisted index is trusted only when BOTH tables hold rows
        // AND the REQUESTED k recorded at build time (ivf_meta) matches
        // the auto-scaled k for the CURRENT corpus — an artifact from an
        // older formula / regenerated corpus (or a half-build) rebuilds
        // instead of silently serving a stale operating point. The
        // recorded value is the formula's k, NOT centers.length: KMeans
        // may legitimately return fewer than k distinct centers on a
        // degenerate corpus, and comparing the centroid COUNT against the
        // formula would rebuild-loop such a store on every fresh JVM.
        def metaK(t: String): Long =
          if (!client.tableExists("main", t)) -1L
          else client.query(s"SELECT max(requested_k) AS k FROM `main`.`$t`", 1)
            ._2.flatten.headOption
            .map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).getOrElse(-1L)
        // JVM-local monitor first (same-JVM file-lock overlap throws),
        // then the inter-process store lock: a concurrent JVM must never
        // scan-verify or probe a half-built index
        SimilarityQueries.synchronized {
        if (!verifiedIndexes.contains(s"r32:$tag"))
          graft.client.StoreLock.withLockNamed(s"ann:r32:$tag") {
          val expectK = autoK(s, dir)
          if (count("ivf_cells") <= 0 || count("ivf_centroids") <= 0 ||
            metaK("ivf_meta") != expectK) {
            Seq("ivf_cells", "ivf_centroids", "ivf_meta").foreach { t =>
              if (client.tableExists("main", t)) client.dropTable("main", t)
            }
            val index = graft.ops.AnnIvf.buildIndex(
              corpus(s), "vec_id", "embedding", numCells = expectK,
              trainSampleFraction = 0.5, maxIter = 10)
            client.createTable("main", "ivf_cells", Seq(
              "vec_id" -> "Nullable(Int64)",
              "embedding" -> "Array(Nullable(Float32))",
              "cell" -> "Nullable(Int32)"), Map("engine" -> "MergeTree"))
            graft.ops.AnnIvf.cellsTable(index, "vec_id", "embedding")
              .writeTo("clickhouse.main.ivf_cells").append()
            client.createTable("main", "ivf_centroids", Seq(
              "cell" -> "Nullable(Int32)",
              "center" -> "Array(Nullable(Float64))"), Map("engine" -> "MergeTree"))
            graft.ops.AnnIvf.centroidsTable(index, s)
              .writeTo("clickhouse.main.ivf_centroids").append()
            // marker LAST: its presence certifies both data tables landed
            client.createTable("main", "ivf_meta",
              Seq("requested_k" -> "Nullable(Int64)"), Map("engine" -> "MergeTree"))
            client.insert("main", "ivf_meta",
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("requested_k",
                  org.apache.spark.sql.types.LongType))),
              Seq(org.apache.spark.sql.Row(expectK.toLong)))
          }
          verifiedIndexes.add(s"r32:$tag")
        }
        }
        // probe-only path: index rebuilt ENTIRELY from the store. The
        // loader picks the driver-safe route itself — flat below the
        // centroid cap (every shipped sf), the two-level derivation
        // above it, so no caller ever collects 1e5+ centroids at scale
        // (VERDICT r13 item 3)
        val stored = graft.ops.AnnIvf.loadStored(
          s.table("clickhouse.main.ivf_cells"),
          s.table("clickhouse.main.ivf_centroids"), "vec_id", "embedding")
        val probes = s.table("embeddings").filter(col("vec_id") < 100)
        val ann = stored.topK(probes, "vec_id", "embedding", k = 5,
          nprobe = math.ceil(0.75 * stored.numCells).toInt)
        recallGate(s, dir, ann)
      },
      oracle = Some(RecallOracle)),

    // ---- the LSH analog of r32: the corpus bucket table as a PERSISTED
    // store artifact. LSH needs no stored quantizer (planes are
    // deterministic), so ONE table suffices: probe sessions recompute
    // their own keys and bucket-join against the stored assignment —
    // written once at ingest, no per-session corpus re-bucketing.
    GateQuery("s08_ann_lsh_persisted",
      (s, dir) => {
        Tables.register(s, dir)
        ConnectorQueries.harness(s, dir)
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val client = new graft.client.EmbeddedClickHouse(
          s"/root/repo/target/chstore_$tag")
        def populated(t: String): Boolean =
          client.tableExists("main", t) &&
            client.query(s"SELECT count(*) AS n FROM `main`.`$t`", 1)
              ._2.flatten.headOption.exists(_.getLong(0) > 0)
        SimilarityQueries.synchronized {
        if (!verifiedIndexes.contains(s"s08:$tag"))
          graft.client.StoreLock.withLockNamed(s"ann:s08:$tag") {
          if (!populated("lsh_buckets")) {
            if (client.tableExists("main", "lsh_buckets")) // drop any half-build
              client.dropTable("main", "lsh_buckets")
            client.createTable("main", "lsh_buckets", Seq(
              "neighbor_id" -> "Nullable(Int64)",
              "ne" -> "Array(Nullable(Float32))",
              "lsh_key" -> "Nullable(Int32)"), Map("engine" -> "MergeTree"))
            graft.ops.AnnLsh.bucketsTable(
              corpus(s), "vec_id", "embedding", 64, numTables = 32, numPlanes = 5)
              .writeTo("clickhouse.main.lsh_buckets").append()
          }
          verifiedIndexes.add(s"s08:$tag")
        }
        }
        val probes = s.table("embeddings").filter(col("vec_id") < 100)
        val ann = graft.ops.AnnLsh.annTopKFromBuckets(
          s.table("clickhouse.main.lsh_buckets"), probes, "vec_id", "embedding",
          64, k = 5, numTables = 32, numPlanes = 5)
        recallGate(s, dir, ann)
      },
      oracle = Some(RecallOracle)),

    // ---- the TWO-LEVEL IVF index as a persisted store artifact (r32's
    // shape for the beyond-driver-envelope quantizer): super centroids,
    // sub-centroids, and cell assignment written through the connector
    // once; probe sessions rebuild from the three tables — only the k1
    // super centroids ever reach the driver. Same deterministic
    // recall@5 >= 0.90 hash gate; operating point = all supers,
    // nprobe = ceil(0.75 k) (RecallProbe: 0.950/0.952/0.968 at
    // sf0.001/0.01/0.1 and 0.984/0.988 at 10x/30x synthetic scale).
    GateQuery("r68_ann_ivf2_persisted",
      (s, dir) => {
        Tables.register(s, dir)
        ConnectorQueries.harness(s, dir)
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val client = new graft.client.EmbeddedClickHouse(
          s"/root/repo/target/chstore_$tag")
        def count(t: String): Long =
          if (!client.tableExists("main", t)) -1L
          else client.query(s"SELECT count(*) AS n FROM `main`.`$t`", 1)
            ._2.flatten.headOption.map(_.getLong(0)).getOrElse(-1L)
        def metaK(t: String): Long =
          if (!client.tableExists("main", t)) -1L
          else client.query(s"SELECT max(requested_k) AS k FROM `main`.`$t`", 1)
            ._2.flatten.headOption
            .map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).getOrElse(-1L)
        val expectK = autoK(s, dir)
        SimilarityQueries.synchronized {
        if (!verifiedIndexes.contains(s"r68:$tag"))
          graft.client.StoreLock.withLockNamed(s"ann:r68:$tag") {
          if (count("ivf2_cells") <= 0 || count("ivf2_super") <= 0 ||
            count("ivf2_sub") <= 0 || metaK("ivf2_meta") != expectK) {
            Seq("ivf2_cells", "ivf2_super", "ivf2_sub", "ivf2_meta").foreach { t =>
              if (client.tableExists("main", t)) client.dropTable("main", t)
            }
            val index = graft.ops.AnnIvf.buildIndexTwoLevel(
              corpus(s), "vec_id", "embedding", numCells = expectK)
            client.createTable("main", "ivf2_cells", Seq(
              "vec_id" -> "Nullable(Int64)",
              "embedding" -> "Array(Nullable(Float32))",
              "super" -> "Nullable(Int32)",
              "cell" -> "Nullable(Int32)"), Map("engine" -> "MergeTree"))
            graft.ops.AnnIvf.cellsTableTwoLevel(index, "vec_id", "embedding")
              .writeTo("clickhouse.main.ivf2_cells").append()
            client.createTable("main", "ivf2_super", Seq(
              "super" -> "Nullable(Int32)",
              "center" -> "Array(Nullable(Float64))",
              "subs_per_super" -> "Nullable(Int32)"), Map("engine" -> "MergeTree"))
            // (center arrays are Float64 on disk, like ivf_centroids)
            graft.ops.AnnIvf.superCentroidsTable(index, s)
              .writeTo("clickhouse.main.ivf2_super").append()
            client.createTable("main", "ivf2_sub", Seq(
              "super" -> "Nullable(Int32)",
              "cell" -> "Nullable(Int32)",
              "center" -> "Array(Nullable(Float64))"), Map("engine" -> "MergeTree"))
            index.subCenters.writeTo("clickhouse.main.ivf2_sub").append()
            // marker LAST: its presence certifies all three tables landed
            client.createTable("main", "ivf2_meta",
              Seq("requested_k" -> "Nullable(Int64)"), Map("engine" -> "MergeTree"))
            client.insert("main", "ivf2_meta",
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("requested_k",
                  org.apache.spark.sql.types.LongType))),
              Seq(org.apache.spark.sql.Row(expectK.toLong)))
          }
          verifiedIndexes.add(s"r68:$tag")
        }
        }
        // probe-only path: index rebuilt ENTIRELY from the store tables
        val stored = graft.ops.AnnIvf.fromTablesTwoLevel(
          s.table("clickhouse.main.ivf2_cells"),
          s.table("clickhouse.main.ivf2_super"),
          s.table("clickhouse.main.ivf2_sub"), "vec_id", "embedding")
        val probes = s.table("embeddings").filter(col("vec_id") < 100)
        val ann = graft.ops.AnnIvf.annTopK2(
          stored, probes, "vec_id", "embedding", k = 5,
          nprobeSuper = stored.superCenters.length,
          nprobe = math.ceil(0.75 * expectK).toInt)
        recallGate(s, dir, ann)
      },
      oracle = Some(RecallOracle)),

    // ---- r32's persisted IVF index on a SHARDED cluster, routed by
    // `cell`: every vector of a cell co-resides on one shard, so a
    // probe's nprobe cell reads touch exactly the shards holding those
    // cells — and at 100 TB the cell table (the corpus) is spread
    // across the cluster instead of capped by one server. Same
    // deterministic recall >= 0.90 hash gate as r32/s04; the gate also
    // requires both shards to hold cells (the placement must actually
    // distribute) before the probe path runs.
    GateQuery("r46_sharded_ann_index",
      (s, dir) => {
        Tables.register(s, dir)
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val cat = s"chshann_$tag"
        val roots = IndexedSeq(
          s"/root/repo/target/chshann0_$tag", s"/root/repo/target/chshann1_$tag")
        s.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.catalog.ClickHouseCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.path", roots.mkString(","))
        s.conf.set(s"spark.sql.catalog.$cat.shard_by", "cell")
        s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.main")
        val clients = roots.map(r => new graft.client.EmbeddedClickHouse(r))
        // union count across shards through the catalog; -1 = missing or
        // unreadable (half-builds where one shard lacks the table)
        def count(t: String): Long =
          scala.util.Try(s.table(s"$cat.main.$t").count()).getOrElse(-1L)
        // same trust rule as r32: rows present AND the build-time
        // requested k (ivf_meta_sh, written to shard 0 as the marker)
        // matches the current corpus's auto-scaled k, or rebuild —
        // comparing the centroid COUNT would rebuild-loop a store whose
        // KMeans legitimately converged to fewer than k centers
        def metaK: Long =
          if (!clients.head.tableExists("main", "ivf_meta_sh")) -1L
          else clients.head.query(
            "SELECT max(requested_k) AS k FROM `main`.`ivf_meta_sh`", 1)
            ._2.flatten.headOption
            .map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).getOrElse(-1L)
        SimilarityQueries.synchronized {
        if (!verifiedIndexes.contains(s"r46:$tag"))
          graft.client.StoreLock.withLockNamed(s"ann:r46:$tag") {
          val expectK = autoK(s, dir)
          if (count("ivf_cells_sh") <= 0 || count("ivf_centroids_sh") <= 0 ||
            metaK != expectK) {
            s.sql(s"DROP TABLE IF EXISTS $cat.main.ivf_cells_sh")
            s.sql(s"DROP TABLE IF EXISTS $cat.main.ivf_centroids_sh")
            if (clients.head.tableExists("main", "ivf_meta_sh"))
              clients.head.dropTable("main", "ivf_meta_sh")
            val index = graft.ops.AnnIvf.buildIndex(
              corpus(s), "vec_id", "embedding", numCells = expectK,
              trainSampleFraction = 0.5, maxIter = 10)
            s.sql(
              s"""CREATE TABLE $cat.main.ivf_cells_sh
                 |(vec_id BIGINT, embedding ARRAY<FLOAT>, cell INT)
                 |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'cell')""".stripMargin)
            graft.ops.AnnIvf.cellsTable(index, "vec_id", "embedding")
              .writeTo(s"$cat.main.ivf_cells_sh").append()
            s.sql(
              s"""CREATE TABLE $cat.main.ivf_centroids_sh
                 |(cell INT, center ARRAY<DOUBLE>)
                 |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'cell')""".stripMargin)
            graft.ops.AnnIvf.centroidsTable(index, s)
              .writeTo(s"$cat.main.ivf_centroids_sh").append()
            // marker LAST (shard 0 only — a 1-row meta table needs no
            // routing): its presence certifies both data tables landed
            clients.head.createTable("main", "ivf_meta_sh",
              Seq("requested_k" -> "Nullable(Int64)"), Map("engine" -> "MergeTree"))
            clients.head.insert("main", "ivf_meta_sh",
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("requested_k",
                  org.apache.spark.sql.types.LongType))),
              Seq(org.apache.spark.sql.Row(expectK.toLong)))
          }
          // the index must actually be distributed across the cluster
          val perShard = clients.map(c =>
            c.query("SELECT count(*) AS n FROM `main`.`ivf_cells_sh`", 1)
              ._2.flatten.head.getLong(0))
          require(perShard.forall(_ > 0), s"cell slices: ${perShard.mkString(",")}")
          verifiedIndexes.add(s"r46:$tag")
        }
        }
        val stored = graft.ops.AnnIvf.fromTables(
          s.table(s"$cat.main.ivf_cells_sh"),
          s.table(s"$cat.main.ivf_centroids_sh"), "vec_id", "embedding")
        val probes = s.table("embeddings").filter(col("vec_id") < 100)
        val ann = graft.ops.AnnIvf.annTopK(
          stored, probes, "vec_id", "embedding", k = 5,
          nprobe = math.ceil(0.75 * stored.centers.length).toInt)
        recallGate(s, dir, ann)
      },
      oracle = Some(RecallOracle)),

    // ---- the TWO-LEVEL IVF index on a SHARDED cluster (r46's placement
    // story for the r68 quantizer): the cell table routes by `cell`, so
    // every vector of a cell co-resides and a probe's nprobe cell reads
    // touch exactly the shards holding those cells; sub-centroids shard
    // by cell alongside, the k1-row super table routes by `super`, the
    // 1-row meta marker pins shard 0. Same recall >= 0.90 hash gate;
    // the gate requires both shards to hold cell slices before probing.
    GateQuery("r69_sharded_ann_ivf2",
      (s, dir) => {
        Tables.register(s, dir)
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val cat = s"chsh2ann_$tag"
        val roots = IndexedSeq(
          s"/root/repo/target/chsh2ann0_$tag", s"/root/repo/target/chsh2ann1_$tag")
        s.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.catalog.ClickHouseCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.path", roots.mkString(","))
        s.conf.set(s"spark.sql.catalog.$cat.shard_by", "cell")
        s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.main")
        val clients = roots.map(r => new graft.client.EmbeddedClickHouse(r))
        def count(t: String): Long =
          scala.util.Try(s.table(s"$cat.main.$t").count()).getOrElse(-1L)
        def metaK: Long =
          if (!clients.head.tableExists("main", "ivf2_meta_sh")) -1L
          else clients.head.query(
            "SELECT max(requested_k) AS k FROM `main`.`ivf2_meta_sh`", 1)
            ._2.flatten.headOption
            .map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).getOrElse(-1L)
        SimilarityQueries.synchronized {
        if (!verifiedIndexes.contains(s"r69:$tag"))
          graft.client.StoreLock.withLockNamed(s"ann:r69:$tag") {
          val expectK = autoK(s, dir)
          if (count("ivf2_cells_sh") <= 0 || count("ivf2_super_sh") <= 0 ||
            count("ivf2_sub_sh") <= 0 || metaK != expectK) {
            Seq("ivf2_cells_sh", "ivf2_super_sh", "ivf2_sub_sh").foreach { t =>
              s.sql(s"DROP TABLE IF EXISTS $cat.main.$t")
            }
            if (clients.head.tableExists("main", "ivf2_meta_sh"))
              clients.head.dropTable("main", "ivf2_meta_sh")
            val index = graft.ops.AnnIvf.buildIndexTwoLevel(
              corpus(s), "vec_id", "embedding", numCells = expectK)
            s.sql(
              s"""CREATE TABLE $cat.main.ivf2_cells_sh
                 |(vec_id BIGINT, embedding ARRAY<FLOAT>, super INT, cell INT)
                 |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'cell')""".stripMargin)
            graft.ops.AnnIvf.cellsTableTwoLevel(index, "vec_id", "embedding")
              .writeTo(s"$cat.main.ivf2_cells_sh").append()
            // the catalog routes every insert by `cell`; the k1-row super
            // table carries a synthetic cell = super so its rows place
            // deterministically (reads never consult it)
            s.sql(
              s"""CREATE TABLE $cat.main.ivf2_super_sh
                 |(cell INT, super INT, center ARRAY<DOUBLE>, subs_per_super INT)
                 |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'super')""".stripMargin)
            graft.ops.AnnIvf.superCentroidsTable(index, s)
              .select(col("super").as("cell"), col("super"), col("center"),
                col("subs_per_super"))
              .writeTo(s"$cat.main.ivf2_super_sh").append()
            s.sql(
              s"""CREATE TABLE $cat.main.ivf2_sub_sh
                 |(super INT, cell INT, center ARRAY<DOUBLE>)
                 |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'cell')""".stripMargin)
            index.subCenters.writeTo(s"$cat.main.ivf2_sub_sh").append()
            // marker LAST (shard 0, 1 row): certifies all three landed
            clients.head.createTable("main", "ivf2_meta_sh",
              Seq("requested_k" -> "Nullable(Int64)"), Map("engine" -> "MergeTree"))
            clients.head.insert("main", "ivf2_meta_sh",
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("requested_k",
                  org.apache.spark.sql.types.LongType))),
              Seq(org.apache.spark.sql.Row(expectK.toLong)))
          }
          // the cell table must actually be distributed across the shards
          val perShard = clients.map(c =>
            c.query("SELECT count(*) AS n FROM `main`.`ivf2_cells_sh`", 1)
              ._2.flatten.head.getLong(0))
          require(perShard.forall(_ > 0), s"cell slices: ${perShard.mkString(",")}")
          verifiedIndexes.add(s"r69:$tag")
        }
        }
        val expectK = autoK(s, dir)
        val stored = graft.ops.AnnIvf.fromTablesTwoLevel(
          s.table(s"$cat.main.ivf2_cells_sh"),
          s.table(s"$cat.main.ivf2_super_sh"),
          s.table(s"$cat.main.ivf2_sub_sh"), "vec_id", "embedding")
        val probes = s.table("embeddings").filter(col("vec_id") < 100)
        val ann = graft.ops.AnnIvf.annTopK2(
          stored, probes, "vec_id", "embedding", k = 5,
          nprobeSuper = stored.superCenters.length,
          nprobe = math.ceil(0.75 * expectK).toInt)
        recallGate(s, dir, ann)
      },
      oracle = Some(RecallOracle)),

    // ---- int8 embedding quantization (the storage/bandwidth side of
    // similarity search at 100 TB: 4x smaller vectors for the ANN coarse
    // pass). Symmetric per-vector scale = 127/max|x|; quantized value =
    // floor(x*scale + 0.5) — floor, NOT round, because both engines
    // compute it as the same IEEE double op (round()'s half-way tie
    // handling differs between Spark and DuckDB). The q8 vector is
    // hash-compared via md5 of its comma-join so the driver compares
    // scalar strings, not engine-specific list renderings.
    q("s05_embed_quantize_int8",
      """WITH q AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS e,
        |    127.0 / list_aggregate(list_transform(embedding::DOUBLE[], x -> abs(x)), 'max')
        |      AS scale
        |  FROM embeddings WHERE vec_id < 300)
        |SELECT vec_id,
        |  md5(array_to_string(list_transform(e,
        |      x -> CAST(floor(x * scale + 0.5) AS BIGINT)), ',')) AS q8_hash,
        |  CAST(list_aggregate(list_transform(e,
        |      x -> CAST(floor(x * scale + 0.5) AS BIGINT)), 'sum') AS BIGINT) AS sum_q,
        |  CAST(len(list_filter(e,
        |      x -> abs(CAST(floor(x * scale + 0.5) AS BIGINT)) = 127)) AS BIGINT) AS n_sat
        |FROM q""".stripMargin) { (s, _) =>
      val ed = transform(col("embedding"), x => x.cast("double"))
      val scale = lit(127.0) / array_max(transform(ed, x => abs(x)))
      val df = s.table("embeddings").filter(col("vec_id") < 300)
        .select(col("vec_id"), ed.as("e"), scale.as("scale"))
      val q8 = transform(col("e"), x => floor(x * col("scale") + 0.5))
      df.select(
        col("vec_id"),
        md5(concat_ws(",", q8.cast("array<string>")).cast("binary")).as("q8_hash"),
        aggregate(q8, lit(0L), (a, x) => a + x).as("sum_q"),
        size(filter(q8, x => abs(x) === 127)).cast("long").as("n_sat"))
    },

    // cross-family composition: embedding near-dup EDGES (the s02 shape)
    // fed through the same transitive-closure clustering d06 uses — A~B
    // and B~C land A,B,C in one cluster even when A~C never crossed the
    // cosine threshold. Oracle = DuckDB recursive closure; Spark side =
    // large-star/small-star contraction, O(log n) rounds, no driver graph.
    q("s06_embed_cluster",
      """WITH RECURSIVE pairs AS (
        |  SELECT a.vec_id AS a, b.vec_id AS b
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE a.vec_id < 500
        |    AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35),
        |edges AS (SELECT a AS u, b AS v FROM pairs
        |          UNION ALL SELECT b, a FROM pairs),
        |reach(id, r) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT reach.id, e.v FROM reach JOIN edges e ON reach.r = e.u)
        |SELECT id AS vec_id, min(r) AS cluster_id
        |FROM reach GROUP BY id""".stripMargin) { (s, _) =>
      val e = s.table("embeddings")
      val a = e.filter(col("vec_id") < 500)
        .select(col("vec_id").as("a"), col("embedding").as("ea"))
        .withColumn("na", graft.ops.vector.vec_norm_sq(col("ea")))
      val b = corpus(s).select(col("vec_id").as("b"), col("embedding").as("eb"))
        .withColumn("nb", graft.ops.vector.vec_norm_sq(col("eb")))
      val edges = broadcast(a).join(b, col("a") < col("b"))
        .filter(dot(col("ea"), col("eb")) / sqrt(col("na") * col("nb")) >= 0.35)
        .select(col("a"), col("b"))
      graft.ops.ConnectedComponents
        .label(e.select("vec_id"), edges)
        .select(col("id").as("vec_id"), col("component").as("cluster_id"))
    },

    // ---- incremental index maintenance (VERDICT r14 item 6): the
    // quantizer trains on HALF the corpus, the other half appends via
    // assignToStored (nearest existing cell — the build-time assignment
    // law applied a batch later; NO retrain), and the recall gate runs
    // over the combined index against the full-corpus exact baseline.
    // This is the 2x-growth staleness point: needsRetrain still says
    // keep appending (auto-k grows as sqrt, so 2x rows is ~1.41x k,
    // under the 2x retrain factor), and recall must hold >= 0.90.
    GateQuery("s09_ann_ivf_incremental",
      (s, dir) => {
        Tables.register(s, dir)
        val base = corpus(s).filter(col("vec_id") % 2 === 0)
        val grown = s.table("embeddings").filter(col("vec_id") % 2 === 1)
        val index = incIndexCache.getOrElseUpdate((s, dir), {
          val built = graft.ops.AnnIvf.buildIndex(
            base, "vec_id", "embedding",
            trainSampleFraction = 0.5, maxIter = 10)
          // append path: assign the grown half to EXISTING cells, union
          // with the persisted-shape cells table — no rebuild anywhere
          val appended = graft.ops.AnnIvf.assignToStored(
            graft.ops.AnnIvf.StoredFlat(built), grown, "vec_id", "embedding")
          val allCells = graft.ops.AnnIvf
            .cellsTable(built, "vec_id", "embedding")
            .unionByName(appended)
            .cache() // the index IS this assignment; probes reuse it
          // staleness contract holds at this growth: no retrain due
          require(!graft.ops.AnnIvf.needsRetrain(
            built.centers.length.toLong, base.count() * 2),
            "2x growth must stay under the retrain threshold")
          graft.ops.AnnIvf.fromTables(
            allCells,
            graft.ops.AnnIvf.centroidsTable(built, s),
            "vec_id", "embedding")
        })
        val probes = s.table("embeddings").filter(col("vec_id") < 100)
        val ann = graft.ops.AnnIvf.annTopK(index, probes, "vec_id", "embedding",
          k = 5, nprobe = math.ceil(0.75 * index.centers.length).toInt)
        recallGate(s, dir, ann)
      },
      oracle = Some(RecallOracle))
  )
}
