package graft.queries

import graft.{GateQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * Random sampling (rand()/TABLESAMPLE) is non-reproducible across runs,
  * engines, and partitionings — a pipeline that re-runs must select the
  * SAME sample or every downstream artifact churns. Both operators here
  * key the sampling decision on md5(doc_id) (identical in Spark and
  * DuckDB, so the DuckDB oracle verifies the exact selected set):
  *
  *  - p01: per-stratum Bernoulli by hash bucket — rate varies by stratum
  *    (down-sample the over-represented language, keep the rest). A pure
  *    narrow filter: no shuffle, scales linearly, fully reproducible.
  *  - p02: fixed-size uniform sample = the k smallest hashes. Spark plans
  *    orderBy+limit as TakeOrderedAndProject (per-partition top-k, then a
  *    k-row merge) — no global sort, driver sees k rows only.
  */
object SamplingQueries {

  private def q(name: String, oracle: String)(
      f: (SparkSession, String) => DataFrame): GateQuery =
    GateQuery(name, (s, dir) => { Tables.register(s, dir); f(s, dir) }, Some(oracle))

  /** Uniform hash bucket in [0, 100) from the doc id — the same
    * arithmetic the oracle runs, so the selected sets are identical.
    */
  private def hashBucket100: org.apache.spark.sql.Column =
    conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % 100

  val all: Seq[GateQuery] = Seq(

    // ---- stratified Bernoulli sampling, deterministic by hash ----
    q("p01_sample_stratified",
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
        |      < CASE WHEN lang = 'en' THEN 10 ELSE 50 END""".stripMargin) { (s, _) =>
      s.table("documents")
        .select(col("doc_id"), col("lang"))
        .filter(hashBucket100 <
          when(col("lang") === "en", 10).otherwise(50))
    },

    // ---- deterministic train/val/test split ----
    // Content-hash bucketing (md5 of the text, not the id) so the split
    // is stable under re-ingestion and id reshuffles — the property a
    // training pipeline needs to avoid train/test leakage across
    // snapshots. Pure projection + one tiny 3-row aggregate: no
    // shuffle of the corpus itself at any scale.
    q("p03_hash_split",
      """SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |            ELSE 'test' END AS split,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM (SELECT n_chars,
        |        ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS b
        |      FROM documents)
        |GROUP BY 1""".stripMargin) { (s, _) =>
      val b = conv(substring(md5(col("text").cast("binary")), 1, 8), 16, 10)
        .cast("long") % 100
      s.table("documents")
        .select(
          when(b < 80, "train").when(b < 90, "val").otherwise("test").as("split"),
          col("n_chars"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
    },

    // ---- token-budget packing (context-window fill planning) ----
    // Assign docs to 2048-token bins by prefix-sum of token counts in
    // doc_id order WITHIN each source — the near-optimal streaming
    // packing when docs are small vs the budget, and the scale-correct
    // shape: packing is per-shard (source), so the window partitions by
    // a real key instead of forcing a single global ordering. All
    // integer arithmetic (floor division), so both engines agree bit-
    // for-bit.
    q("p04_token_pack",
      """WITH t AS (SELECT source, doc_id,
        |             len(string_split(text, ' ')) AS n_tok FROM documents),
        |c AS (SELECT source, n_tok,
        |        sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior
        |      FROM t)
        |SELECT source, CAST(floor(coalesce(prior, 0) / 2048) AS BIGINT) AS bin,
        |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS bin_tokens
        |FROM c GROUP BY source, bin""".stripMargin) { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      s.table("documents")
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).as("n_tok"))
        .select(col("source"), col("n_tok"),
          floor(coalesce(sum("n_tok").over(w), lit(0)) / 2048).cast("long").as("bin"))
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("bin_tokens"))
    },

    // ---- fixed-size uniform sample: k smallest hashes ----
    q("p02_sample_fixed_k",
      """SELECT doc_id FROM documents
        |ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 50""".stripMargin) { (s, _) =>
      s.table("documents")
        .select(col("doc_id"),
          md5(col("doc_id").cast("string").cast("binary")).as("h"))
        .orderBy(col("h"), col("doc_id"))
        .limit(50)
        .select("doc_id")
    },

    // ---- mixture sampling with upsampling (the data-mixing step) ----
    // Training mixes weight sources at different RATES, possibly > 1
    // (multiple epochs of a high-quality source): rate 2.3 means 2 full
    // copies plus a deterministic 30% Bernoulli third copy. The rates
    // live in a SPEC TABLE (basis points), as a mixture config does in
    // production — broadcast-joined, never shuffling the corpus; the
    // copy fan-out is a narrow generator. Reproducible across runs,
    // engines, and partitionings (hash-bucketed, like p01/p03).
    q("p05_sample_mixture",
      """WITH spec AS (
        |  SELECT 'src' || i AS source,
        |    CASE WHEN i < 5 THEN 5000 WHEN i < 10 THEN 23000
        |         ELSE 10000 END AS rate_bp
        |  FROM (SELECT unnest(generate_series(0, 19)) AS i)),
        |n_of AS (
        |  SELECT d.doc_id, d.source,
        |    rate_bp // 10000
        |      + CASE WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
        |               % 10000 < rate_bp % 10000 THEN 1 ELSE 0 END AS n
        |  FROM documents d JOIN spec USING (source))
        |SELECT doc_id, source, unnest(generate_series(0, n - 1)) AS copy
        |FROM n_of WHERE n > 0""".stripMargin) { (s, _) =>
      val spec = s.range(20).select(
        concat(lit("src"), col("id").cast("string")).as("source"),
        when(col("id") < 5, 5000L).when(col("id") < 10, 23000L)
          .otherwise(10000L).as("rate_bp"))
      val bucket = conv(substring(
        md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long") % 10000
      s.table("documents")
        .join(broadcast(spec), "source")
        .select(col("doc_id"), col("source"),
          ((col("rate_bp") / 10000).cast("long")
            + when(bucket < col("rate_bp") % 10000, 1L).otherwise(0L)).as("n"))
        .filter(col("n") > 0)
        .select(col("doc_id"), col("source"),
          explode(sequence(lit(0L), col("n") - 1, lit(1L))).as("copy"))
    }
  )
}
