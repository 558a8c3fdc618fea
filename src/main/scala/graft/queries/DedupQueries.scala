package graft.queries

import graft.{GateQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-training-data pipelines (beyond the
  * reference's surface, per BASELINE.json): exact dedup, n-gram Jaccard,
  * MinHash+LSH, and SimHash. All are expressed as shuffled/bucketed
  * DataFrame pipelines with no driver-side materialization, so they shard
  * at 100 TB.
  *
  * Cross-engine determinism: every hash is md5 (identical in Spark and
  * DuckDB); MinHash takes the lexicographic min over md5 hex digests, so
  * signatures, band buckets, and candidate pairs are bit-identical across
  * engines and the DuckDB oracle verifies the FULL pipeline, not a proxy.
  *
  * Scale notes:
  *  - The document-frequency filter (df <= MaxDf) drops "hot" shingles
  *    before the pair join — the standard trick that bounds the candidate
  *    blow-up: the join key (shingle/bucket) cardinality then scales with
  *    corpus size while bucket width stays bounded.
  *  - MinHash/LSH replaces the quadratic all-pairs join with a per-bucket
  *    join: cost ~ sum_b |bucket_b|^2, controlled by band width.
  */
object DedupQueries {

  private val MaxDf = 100 // drop shingles appearing in more docs than this
  private val NumHashes = 16
  private val BandSize = 4 // 4 bands x 4 rows

  private def q(name: String, oracle: String)(
      f: (SparkSession, String) => DataFrame): GateQuery =
    GateQuery(name, (s, dir) => { Tables.register(s, dir); f(s, dir) }, Some(oracle))

  /** doc_id, sh — distinct word-3-gram shingles per document. */
  private def shingles(s: SparkSession): DataFrame =
    s.table("documents")
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("ts")) - 2),
          i => concat_ws(" ", slice(col("ts"), i, lit(3)))))).as("sh"))

  /** Same shingle derivation in DuckDB SQL (list comprehension + unnest). */
  private val shingleCte =
    """ts AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest([array_to_string(ts[i:i+2], ' ')
      |                 for i in generate_series(1, len(ts)-2)]) AS sh
      |       FROM ts WHERE len(ts) >= 3)""".stripMargin

  /** Rare shingles only: doc_id, sh with document frequency <= MaxDf. */
  private def rareShingles(s: SparkSession): DataFrame = {
    val sh = shingles(s)
    val df = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    // df fits in memory at any scale (bounded by vocab), but is derived —
    // a shuffle join on sh keeps it fully distributed; AQE converts it to
    // a broadcast join when small.
    sh.join(df.filter(col("df") <= MaxDf), "sh").select("doc_id", "sh")
  }

  private val rareCte =
    s"""$shingleCte,
       |dfx AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh),
       |keep AS (SELECT s.doc_id, s.sh FROM sh s JOIN dfx USING (sh)
       |         WHERE df <= $MaxDf)""".stripMargin

  val all: Seq[GateQuery] = Seq(

    // ---- exact dedup: hash-groupBy on content ----
    q("d01_dedup_exact",
      """SELECT md5(text) AS content_hash, count(*) AS n_copies,
        |  min(doc_id) AS keep_id
        |FROM documents GROUP BY md5(text)""".stripMargin) { (s, _) =>
      s.table("documents")
        .groupBy(md5(col("text").cast("binary")).as("content_hash"))
        .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keep_id"))
    },

    // ---- n-gram Jaccard near-dup: shingle join with hot-key filter ----
    q("d02_dedup_ngram_jaccard",
      s"""WITH $rareCte,
         |sizes AS (SELECT doc_id, count(*) AS nsh FROM keep GROUP BY doc_id),
         |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_common
         |          FROM keep x JOIN keep y ON x.sh = y.sh AND x.doc_id < y.doc_id
         |          GROUP BY x.doc_id, y.doc_id)
         |SELECT a, b,
         |  round(n_common / (sa.nsh + sb.nsh - n_common), 6) AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = a
         |JOIN sizes sb ON sb.doc_id = b
         |WHERE n_common / (sa.nsh + sb.nsh - n_common) >= 0.5""".stripMargin) { (s, _) =>
      val keep = rareShingles(s).cache()
      val sizes = keep.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
      val inter = keep.as("x")
        .join(keep.as("y"),
          col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .agg(count(lit(1)).as("n_common"))
      val jac = col("n_common") / (col("sa.nsh") + col("sb.nsh") - col("n_common"))
      inter
        .join(sizes.as("sa"), col("a") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("b") === col("sb.doc_id"))
        .filter(jac >= 0.5)
        .select(col("a"), col("b"), round(jac, 6).as("jaccard"))
    },

    // ---- MinHash + LSH banding ----
    // Signature_i(doc) = lexicographic min over shingles of
    // md5(i || ':' || shingle); band bucket = md5 of its 4 signatures.
    // Candidate pairs share >= 1 band bucket; est_jaccard = matching
    // signature fraction. Full pipeline is oracle-verified.
    q("d03_dedup_minhash_lsh",
      s"""WITH $shingleCte,
         |hx AS (SELECT doc_id, i, min(md5(i || ':' || sh)) AS sig
         |       FROM sh CROSS JOIN (SELECT unnest(generate_series(0, ${NumHashes - 1})) AS i)
         |       GROUP BY doc_id, i),
         |bands AS (SELECT doc_id, i // $BandSize AS band,
         |            md5(array_to_string(list(sig ORDER BY i), '|')) AS bucket
         |          FROM hx GROUP BY doc_id, i // $BandSize),
         |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |         FROM bands x JOIN bands y
         |           ON x.band = y.band AND x.bucket = y.bucket
         |              AND x.doc_id < y.doc_id)
         |SELECT a, b, sum(CASE WHEN ha.sig = hb.sig THEN 1 ELSE 0 END) / ${NumHashes}.0
         |    AS est_jaccard
         |FROM cand
         |JOIN hx ha ON ha.doc_id = a
         |JOIN hx hb ON hb.doc_id = b AND hb.i = ha.i
         |GROUP BY a, b""".stripMargin) { (s, _) =>
      val sh = shingles(s)
      val hx = sh
        .select(col("doc_id"), explode(sequence(lit(0), lit(NumHashes - 1))).as("i"), col("sh"))
        .select(col("doc_id"), col("i"),
          md5(concat(col("i").cast("string"), lit(":"), col("sh")).cast("binary")).as("h"))
        .groupBy("doc_id", "i")
        .agg(min("h").as("sig"))
        .cache()
      val bands = hx
        .groupBy(col("doc_id"), (col("i") / BandSize).cast("int").as("band"))
        .agg(sort_array(collect_list(struct(col("i"), col("sig")))).as("ps"))
        .select(col("doc_id"), col("band"),
          md5(concat_ws("|", transform(col("ps"), p => p.getField("sig"))).cast("binary"))
            .as("bucket"))
      val cand = bands.as("x")
        .join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct()
      cand
        .join(hx.as("ha"), col("a") === col("ha.doc_id"))
        .join(hx.as("hb"), col("b") === col("hb.doc_id") && col("hb.i") === col("ha.i"))
        .groupBy("a", "b")
        .agg((sum(when(col("ha.sig") === col("hb.sig"), 1).otherwise(0)) / NumHashes.toDouble)
          .as("est_jaccard"))
    },

    // ---- SimHash: 16 deterministic md5-derived hyperplane bits ----
    // bit_p(token) = first hex digit of md5(p || ':' || token) >= 8;
    // doc bit p = majority vote over tokens (with multiplicity).
    q("d04_dedup_simhash",
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |bits AS (
        |  SELECT doc_id, p,
        |    sum(CASE WHEN substr(md5(p || ':' || tok), 1, 1) >= '8'
        |             THEN 1 ELSE -1 END) AS vote
        |  FROM toks CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS p)
        |  GROUP BY doc_id, p)
        |SELECT doc_id,
        |  sum(CASE WHEN vote > 0 THEN CAST(round(2 ** p) AS BIGINT) ELSE 0 END) AS simhash
        |FROM bits GROUP BY doc_id""".stripMargin) { (s, _) =>
      val toks = s.table("documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val bits = toks
        .select(col("doc_id"), explode(sequence(lit(0), lit(15))).as("p"), col("tok"))
        .select(col("doc_id"), col("p"),
          when(substring(md5(concat(col("p").cast("string"), lit(":"), col("tok"))
            .cast("binary")), 1, 1) >= "8", 1).otherwise(-1).as("v"))
        .groupBy("doc_id", "p")
        .agg(sum("v").as("vote"))
      bits.groupBy("doc_id")
        .agg(sum(when(col("vote") > 0,
          round(pow(lit(2), col("p"))).cast("bigint")).otherwise(0L)).as("simhash"))
    }
  )
}
