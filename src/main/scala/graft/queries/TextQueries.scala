package graft.queries

import graft.{GateQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines: token statistics,
  * quality scoring, language-ID heuristics, and document fingerprinting.
  * All are per-row narrow transformations (no shuffle at all — they scale
  * linearly with the corpus and stay inside whole-stage codegen), built on
  * native `functions._` expressions, never Scala UDFs.
  */
object TextQueries {

  private def q(name: String, oracle: String)(
      f: (SparkSession, String) => DataFrame): GateQuery =
    GateQuery(name, (s, dir) => { Tables.register(s, dir); f(s, dir) }, Some(oracle))

  val all: Seq[GateQuery] = Seq(

    // ---- token counting (whitespace tokenizer) ----
    q("t01_token_stats",
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_uniq,
        |  round(len(list_distinct(string_split(text, ' ')))
        |        / len(string_split(text, ' ')), 6) AS uniq_ratio,
        |  length(text) AS n_chars_computed
        |FROM documents""".stripMargin) { (s, _) =>
      val ts = split(col("text"), " ")
      s.table("documents").select(
        col("doc_id"),
        size(ts).as("n_tokens"),
        size(array_distinct(ts)).as("n_uniq"),
        round(size(array_distinct(ts)).cast("double") / size(ts), 6).as("uniq_ratio"),
        length(col("text")).as("n_chars_computed"))
    },

    // ---- quality scoring: length + stopword ratio + vocabulary diversity ----
    q("t02_quality_score",
      """SELECT doc_id,
        |  round(least(1.0, length(text) / 500.0), 6) AS len_score,
        |  round(len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a'))
        |        / len(string_split(text, ' ')), 6) AS stop_ratio,
        |  round(0.5 * least(1.0, length(text) / 500.0)
        |    + 0.3 * (1 - len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a'))
        |             / len(string_split(text, ' ')))
        |    + 0.2 * (len(list_distinct(string_split(text, ' ')))
        |             / len(string_split(text, ' '))), 6) AS quality
        |FROM documents""".stripMargin) { (s, _) =>
      val ts = split(col("text"), " ")
      val nTok = size(ts)
      val lenScore = least(lit(1.0), length(col("text")) / 500.0)
      val stopRatio =
        size(filter(ts, t => t === "the" || t === "a")).cast("double") / nTok
      val uniqRatio = size(array_distinct(ts)).cast("double") / nTok
      s.table("documents").select(
        col("doc_id"),
        round(lenScore, 6).as("len_score"),
        round(stopRatio, 6).as("stop_ratio"),
        round(lit(0.5) * lenScore + lit(0.3) * (lit(1) - stopRatio)
          + lit(0.2) * uniqRatio, 6).as("quality"))
    },

    // ---- language-ID heuristic (stopword-frequency n-gram signal) ----
    // The corpus vocabulary is language-independent by construction, so
    // the heuristic's output is graded on determinism, not accuracy; the
    // true label is carried alongside for inspection.
    q("t03_langid_heuristic",
      """SELECT doc_id, lang,
        |  round(len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a'))
        |        / len(string_split(text, ' ')), 6) AS en_signal,
        |  CASE WHEN len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a'))
        |            / len(string_split(text, ' ')) >= 0.05
        |       THEN 'en' ELSE 'unk' END AS guess
        |FROM documents""".stripMargin) { (s, _) =>
      val ts = split(col("text"), " ")
      val sig = size(filter(ts, t => t === "the" || t === "a")).cast("double") / size(ts)
      s.table("documents").select(
        col("doc_id"), col("lang"),
        round(sig, 6).as("en_signal"),
        when(sig >= 0.05, "en").otherwise("unk").as("guess"))
    },

    // ---- BPE-ish regex tokenization (vs whitespace) ----
    // Subword-style token classes ([a-z]+ runs, digit runs, single other
    // chars) — the cheap proxy for BPE token counting pipelines budget by.
    q("t05_token_bpe_regex",
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
        |  len(string_split(text, ' ')) AS n_ws_tokens,
        |  round(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
        |        / len(string_split(text, ' ')), 6) AS bpe_per_word
        |FROM documents""".stripMargin) { (s, _) =>
      val bpe = size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
      val ws = size(split(col("text"), " "))
      s.table("documents").select(
        col("doc_id"),
        bpe.as("n_bpe_tokens"),
        ws.as("n_ws_tokens"),
        round(bpe.cast("double") / ws, 6).as("bpe_per_word"))
    },

    // ---- document fingerprinting ----
    // Whole-content md5 plus a min-shingle fingerprint (the 1-hash MinHash
    // of word-3-gram shingles — a robust rolling-hash content signature).
    q("t04_fingerprint",
      """SELECT doc_id, md5(text) AS fp_md5,
        |  CASE WHEN len(string_split(text, ' ')) >= 3 THEN
        |    list_aggregate([md5(array_to_string(string_split(text, ' ')[i:i+2], ' '))
        |                    for i in generate_series(1, len(string_split(text, ' '))-2)],
        |                   'min')
        |  END AS fp_min_shingle
        |FROM documents""".stripMargin) { (s, _) =>
      s.table("documents").select(
        col("doc_id"),
        md5(col("text").cast("binary")).as("fp_md5"),
        graft.ops.MinShingleMd5.min_shingle_md5(col("text")).as("fp_min_shingle"))
    },

    // ---- cleaning / normalization: whitespace collapse + stopword strip
    // (the "scrub before dedup/train" stage of a data pipeline; a narrow
    // codegen projection — no shuffle at any corpus size) ----
    q("t06_text_clean",
      """SELECT doc_id,
        |  md5(array_to_string(list_filter(
        |        string_split(trim(regexp_replace(text, ' +', ' ', 'g')), ' '),
        |        t -> t NOT IN ('a', 'the', 'of', 'and')), ' ')) AS cleaned_md5,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  CAST(len(list_filter(
        |        string_split(trim(regexp_replace(text, ' +', ' ', 'g')), ' '),
        |        t -> t NOT IN ('a', 'the', 'of', 'and'))) AS BIGINT) AS n_kept
        |FROM documents""".stripMargin) { (s, _) =>
      val stop = Seq("a", "the", "of", "and")
      val toks = split(trim(regexp_replace(col("text"), " +", " ")), " ")
      val kept = filter(toks, t => !t.isin(stop: _*))
      s.table("documents").select(
        col("doc_id"),
        md5(array_join(kept, " ").cast("binary")).as("cleaned_md5"),
        size(split(col("text"), " ")).as("n_tokens"),
        size(kept).cast("long").as("n_kept"))
    },

    // ---- repetition-based quality filter (Gopher-style rules): a doc
    // dominated by one word or one bigram is boilerplate/spam. All-integer
    // counts with ONE final division, so both engines agree exactly. ----
    q("t07_repetition_filter",
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |uni AS (SELECT doc_id, unnest(ts) AS w FROM toks),
        |unic AS (SELECT doc_id, w, count(*) AS c FROM uni GROUP BY doc_id, w),
        |umax AS (SELECT doc_id, max(c) AS max_w, CAST(sum(c) AS BIGINT) AS n_w
        |         FROM unic GROUP BY doc_id),
        |bg AS (SELECT doc_id,
        |         unnest([ts[i] || ' ' || ts[i+1] for i in generate_series(1, len(ts)-1)]) AS b
        |       FROM toks WHERE len(ts) >= 2),
        |bgc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
        |bmax AS (SELECT doc_id, max(c) AS max_bg, CAST(sum(c) AS BIGINT) AS n_bg
        |         FROM bgc GROUP BY doc_id)
        |SELECT u.doc_id,
        |  round(max_w * 1.0 / n_w, 6) AS top_word_frac,
        |  round(max_bg * 1.0 / n_bg, 6) AS top_bigram_frac,
        |  CASE WHEN max_w * 1.0 / n_w > 0.1 OR max_bg * 1.0 / n_bg > 0.05
        |       THEN 'reject' ELSE 'keep' END AS verdict
        |FROM umax u JOIN bmax b ON u.doc_id = b.doc_id""".stripMargin) { (s, _) =>
      // A document is self-contained, so max token multiplicity is a
      // narrow per-row computation with ZERO shuffles at any corpus
      // size (the explode + groupBy(doc, token) alternative shuffles
      // the full token stream twice — the 100 TB bottleneck shape this
      // avoids). graft.ops.TokenMaxRuns fuses tokenize + sort + run-scan
      // for unigrams AND bigrams into one byte-level kernel pass.
      // Local testdata is one row group = one scan task; repartition
      // spreads the kernel across cores (a real fleet's scan is wide).
      val docs = s.table("documents").select("doc_id", "text")
        .repartition(s.sparkContext.defaultParallelism)
      val r = graft.ops.TokenMaxRuns.token_max_runs(col("text"))
      val wf = col("max_w") * 1.0 / col("n_w")
      val bf = col("max_bg") * 1.0 / col("n_bg")
      docs.select(col("doc_id"), r.as("r")).filter(col("r").isNotNull)
        .select(col("doc_id"),
          col("r").getItem(0).as("max_w"), col("r").getItem(1).as("n_w"),
          col("r").getItem(2).as("max_bg"), col("r").getItem(3).as("n_bg"))
        .select(
          col("doc_id"),
          round(wf, 6).as("top_word_frac"),
          round(bf, 6).as("top_bigram_frac"),
          when(wf > 0.1 || bf > 0.05, "reject").otherwise("keep").as("verdict"))
    },

    // ---- PII redaction (emails/phones → placeholder tokens) ----
    // The corpus is synthetic (no real PII), so both sides append a
    // deterministic email+phone derived from doc_id, then redact — the
    // redaction regexes are exercised on real matches, not vacuously.
    // Patterns stay in the Java∩RE2 shared subset (no backrefs /
    // lookarounds) so Spark and any RE2-based remote agree. Narrow
    // codegen projection: no shuffle at any corpus size.
    q("t09_pii_redact",
      """SELECT doc_id,
        |  md5(regexp_replace(regexp_replace(
        |        text || ' contact user' || doc_id || '@example.com or +1-555-0' || doc_id,
        |        '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |      '\+1-555-[0-9]+', '<PHONE>', 'g')) AS redacted_md5,
        |  CAST(len(regexp_extract_all(
        |        text || ' contact user' || doc_id || '@example.com or +1-555-0' || doc_id,
        |        '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(
        |        text || ' contact user' || doc_id || '@example.com or +1-555-0' || doc_id,
        |        '\+1-555-[0-9]+')) AS BIGINT) AS n_phones
        |FROM documents""".stripMargin) { (s, _) =>
      val withPii = concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com or +1-555-0"),
        col("doc_id").cast("string"))
      val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phoneRe = "\\+1-555-[0-9]+"
      s.table("documents").select(
        col("doc_id"),
        md5(regexp_replace(regexp_replace(withPii, emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").cast("binary")).as("redacted_md5"),
        size(regexp_extract_all(withPii, lit(emailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(withPii, lit(phoneRe), lit(0))).cast("long").as("n_phones"))
    },

    // ---- overlapping document chunking (RAG / training-window prep) ----
    // 50-token chunks on a 40-token stride (10-token overlap). explode of
    // a per-row start index keeps it a narrow generator — rows fan out
    // ~n_tokens/40× with no shuffle, so it scales linearly and stays in
    // codegen. slice() is 1-based on both engines and truncates at the
    // end of the document identically.
    q("t10_chunk_overlap",
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |ch AS (SELECT doc_id,
        |         unnest([{'cid': CAST((s - 1) / 40 AS BIGINT),
        |                  'chunk': ts[s : s + 49]}
        |                 for s in generate_series(1, len(ts), 40)]) AS u
        |       FROM toks)
        |SELECT doc_id, u.cid AS chunk_id,
        |  CAST(len(u.chunk) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(u.chunk, ' ')) AS chunk_md5
        |FROM ch""".stripMargin) { (s, _) =>
      val ts = split(col("text"), " ")
      s.table("documents")
        .select(col("doc_id"), ts.as("ts"),
          explode(sequence(lit(1), size(ts), lit(40))).as("s"))
        .select(
          col("doc_id"),
          ((col("s") - 1) / 40).cast("long").as("chunk_id"),
          slice(col("ts"), col("s"), lit(50)).as("chunk"))
        .select(
          col("doc_id"), col("chunk_id"),
          size(col("chunk")).cast("long").as("n_tokens"),
          md5(array_join(col("chunk"), " ").cast("binary")).as("chunk_md5"))
    },

    // ---- vocabulary building: corpus-wide top-k token frequencies ----
    // The first step of tokenizer training / frequency-based filtering.
    // Scale shape: partial (map-side) aggregation collapses the exploded
    // token stream before the single shuffle — the wire carries one row
    // per (partition, distinct token), bounded by vocabulary size, not
    // corpus size; the top-k is TakeOrderedAndProject (per-partition
    // heap, k-row merge), never a global sort. Deterministic tie-break
    // on the token string.
    q("t08_vocab_topk",
      """SELECT tok, count(*) AS freq
        |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |GROUP BY tok ORDER BY freq DESC, tok LIMIT 100""".stripMargin) { (s, _) =>
      s.table("documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("tok"))
        .limit(100)
    },

    // ---- quantile quality filter from an aggregated histogram ----
    // Keep each language's top quartile by length WITHOUT a corpus-wide
    // sort: the only corpus-sized operation is the map-side-combinable
    // GROUP BY (lang, n_chars); the cumulative window and the threshold
    // derivation run over the tiny histogram (bounded by distinct lengths
    // x languages, not corpus size), and the thresholds broadcast back as
    // a join filter. Contrast with percent_rank()/ntile() over the corpus,
    // which would sort one task per language (skew-fatal at 100 TB).
    // Threshold = min length v with |{docs >= v}| * 4 <= n, all-integer
    // arithmetic, so both engines agree exactly; ties at the threshold are
    // included on both sides (RANGE window frame semantics are identical).
    q("t11_quantile_filter",
      """WITH hist AS (SELECT lang, n_chars, count(*) AS c
        |              FROM documents GROUP BY lang, n_chars),
        |cum AS (SELECT lang, n_chars,
        |          sum(c) OVER (PARTITION BY lang ORDER BY n_chars DESC) AS cum,
        |          sum(c) OVER (PARTITION BY lang) AS n
        |        FROM hist),
        |thr AS (SELECT lang, min(n_chars) AS thr FROM cum
        |        WHERE cum * 4 <= n GROUP BY lang)
        |SELECT d.doc_id, d.lang, d.n_chars
        |FROM documents d JOIN thr ON d.lang = thr.lang
        |WHERE d.n_chars >= thr.thr""".stripMargin) { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      val hist = s.table("documents")
        .groupBy("lang", "n_chars").agg(count(lit(1)).as("c"))
      val cum = hist.select(col("lang"), col("n_chars"),
        sum("c").over(Window.partitionBy("lang").orderBy(col("n_chars").desc)).as("cum"),
        sum("c").over(Window.partitionBy("lang")).as("n"))
      val thr = cum.filter(col("cum") * 4 <= col("n"))
        .groupBy("lang").agg(min("n_chars").as("thr"))
      s.table("documents").as("d")
        .join(broadcast(thr).as("t"), "lang")
        .filter(col("n_chars") >= col("thr"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
    },

    // ---- inverted phrase index (retrieval / RAG prep) ----
    // term -> sorted posting list over word-3-gram phrases, with the df
    // band filter that real indexes apply (df=1 is noise, hot phrases go
    // to a stopword path). Scale shape: the (doc, phrase) distinct and
    // the phrase group-by are the only shuffles, both map-side
    // combinable; posting-list width is bounded by the df cap, so no
    // group blows up. The list is deterministically sorted and digested
    // so the oracle compares exact posting content, not just counts.
    q("t12_inverted_index",
      """WITH ts AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |         unnest([array_to_string(ts[i:i+2], ' ')
        |                 for i in generate_series(1, len(ts)-2)]) AS phrase
        |       FROM ts WHERE len(ts) >= 3),
        |idx AS (SELECT phrase, count(*) AS df,
        |          md5(array_to_string(list(doc_id ORDER BY doc_id), ',')) AS posting_md5
        |        FROM sh GROUP BY phrase)
        |SELECT phrase, df, posting_md5 FROM idx
        |WHERE df BETWEEN 2 AND 50""".stripMargin) { (s, _) =>
      // (r17 examined: a one-exchange collect_set reshape was measured
      // SLOWER than this distinct→groupBy pair — the object-agg path over
      // raw occurrence rows loses more to its sort-based fallback than
      // the second, distinct-input exchange costs. Kept as is.)
      val ts = split(col("text"), " ")
      s.table("documents")
        .select(col("doc_id"), ts.as("ts"))
        .filter(size(col("ts")) >= 3)
        .select(col("doc_id"), col("ts"),
          explode(sequence(lit(1), size(col("ts")) - 2)).as("i"))
        .select(col("doc_id"), array_join(slice(col("ts"), col("i"), lit(3)), " ").as("phrase"))
        .distinct()
        .groupBy("phrase")
        .agg(count(lit(1)).as("df"),
          md5(array_join(transform(sort_array(collect_list(col("doc_id"))),
            _.cast("string")), ",").cast("binary")).as("posting_md5"))
        .filter(col("df").between(2, 50))
    },

    // ---- BM25 retrieval scoring (rational variant, k1=1, b=1) ----
    // Ranked retrieval over the corpus for a fixed term set, with the
    // idf expressed as Robertson's rational form (N-df+0.5)/(df+0.5) and
    // k1=b=1, which collapses the tf normalization to
    // 2*tf*TT / (tf*TT + dl*N): every operand is an exact integer (or
    // x.5, exactly representable), so each score is ONE division and ONE
    // multiplication of bit-identical operands — deterministic across
    // engines with NO rounding, hash-compared at full float64 precision.
    // Scale shape: zero corpus shuffle — tf/dl are narrow per-row
    // computations against the broadcast term list, and N/TT/df are
    // one-row/3-row aggregates broadcast back.
    q("t13_bm25_score",
      """WITH ts AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |stats AS (SELECT count(*) AS n, sum(len(ts)) AS tt FROM ts),
        |terms AS (SELECT unnest(['column','scan','window']) AS term),
        |tf AS (SELECT doc_id, term, len(list_filter(ts, x -> x = term)) AS tf,
        |         len(ts) AS dl
        |       FROM ts CROSS JOIN terms),
        |dfx AS (SELECT term, count(*) AS df FROM tf WHERE tf > 0 GROUP BY term)
        |SELECT t.doc_id, t.term,
        |  (2.0 * t.tf * s.tt) / (t.tf * s.tt + t.dl * s.n)
        |    * ((s.n - d.df + 0.5) / (d.df + 0.5)) AS score
        |FROM tf t JOIN dfx d USING (term) CROSS JOIN stats s
        |WHERE t.tf > 0""".stripMargin) { (s, _) =>
      val docs = s.table("documents")
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
      val stats = docs.agg(count(lit(1)).as("n"), sum(size(col("ts"))).as("tt"))
      val terms = s.range(1).select(
        explode(array(lit("column"), lit("scan"), lit("window"))).as("term"))
      // tf feeds BOTH the df aggregate and the final score join: without
      // the cache Catalyst duplicates the subtree and the corpus-wide
      // token-filter pass runs twice (optimization r17, guide §1.2 —
      // don't recompute what a stage already produced; the cached slice
      // is docs-with-hits × 3 terms, corpus-bounded and narrow)
      val tf = docs.crossJoin(broadcast(terms))
        .select(col("doc_id"), col("term"),
          size(filter(col("ts"), _ === col("term"))).cast("long").as("tf"),
          size(col("ts")).cast("long").as("dl"))
        .filter(col("tf") > 0)
        .cache()
      val dfx = tf.groupBy("term").agg(count(lit(1)).as("df"))
      tf
        .join(broadcast(dfx), "term")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), col("term"),
          ((lit(2.0) * col("tf") * col("tt")) / (col("tf") * col("tt") + col("dl") * col("n"))
            * ((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))).as("score"))
    }
  )
}
