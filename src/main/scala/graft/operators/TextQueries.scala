package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis operators over the `documents` table: language ID,
  * quality scoring, token counting, fingerprinting, chunking
  * (SURVEY §"text analysis"; reference behaviors rag.py:44-69 chunking,
  * ingest.py normalizers).
  *
  * All computation is pure column expressions — single scan per query,
  * no UDFs, no shuffle except the final (tiny) aggregation. At 100 TB
  * these are embarrassingly parallel map stages; the groupBys below
  * reduce to at most a few thousand rows before the exchange.
  */
object TextQueries {

  /** Language-ID confusion matrix: labeled lang × predicted lang.
    * The heuristic is the stopword-argmax from TextFunctions.langId.
    */
  def q20LangId(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .withColumn("pred_lang", langId(col("text")))
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("lang", "pred_lang")
  }

  val q20Sql: String = {
    s"""SELECT lang, ${OracleSql.langId("text")} AS pred_lang, COUNT(*) AS cnt
       |FROM documents GROUP BY 1, 2 ORDER BY lang, pred_lang""".stripMargin
  }

  /** Quality-score histogram: floor(score*20) buckets with exact
    * min/max per bucket (min/max of doubles are order-independent,
    * unlike sums — safe to hash-compare).
    */
  /** Per-doc quality score over any (doc_id, text) frame — one
    * row-local native eval (plans.QualityScoreExpr, value-pinned
    * bitwise against the declarative form in SketchExprSpec). The r14
    * decomposed shape (token explode → per-doc hash aggregate → join
    * back) existed because the declarative fused expression
    * re-evaluated the alpha regex and the tokenizer per reference; the
    * native expression computes all four signals in one pass, so the
    * explode/aggregate/join machinery — a corpus-keyed exchange and a
    * doc_id join per consumer — is gone. Shared by q21 and q55.
    */
  private[operators] def qualityScored(docs: DataFrame): DataFrame = {
    docs.select(col("doc_id"),
      graft.functions.TextFunctions.qualityScore(col("text")).as("score"))
  }

  def q21QualityHistogram(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    qualityScored(t.documents.select("doc_id", "text"))
      .groupBy(floor(col("score") * 20.0d).as("bucket"))
      .agg(count(lit(1)).as("cnt"),
        min("score").as("min_score"),
        max("score").as("max_score"))
      .orderBy("bucket")
  }

  val q21Sql: String = {
    val score = OracleSql.qualityScore("text")
    s"""SELECT floor($score * 20.0)::BIGINT AS bucket, COUNT(*) AS cnt,
       |  min($score) AS min_score, max($score) AS max_score
       |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin
  }

  /** Token statistics per language: whitespace-token and BPE-ish
    * subword-token totals (all integer aggregates).
    */
  def q22TokenStats(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .select(col("lang"),
        size(tokens(col("text"))).cast("long").as("ws_tokens"),
        bpeTokenCount(col("text")).cast("long").as("bpe_tokens"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("ws_tokens").as("sum_ws_tokens"),
        max("ws_tokens").as("max_ws_tokens"),
        sum("bpe_tokens").as("sum_bpe_tokens"))
      .orderBy("lang")
  }

  val q22Sql: String =
    s"""SELECT lang, COUNT(*) AS n_docs,
       |  SUM(len(${OracleSql.tokens("text")})::BIGINT)::BIGINT AS sum_ws_tokens,
       |  MAX(len(${OracleSql.tokens("text")})::BIGINT) AS max_ws_tokens,
       |  SUM(${OracleSql.bpeTokenCount("text")}::BIGINT)::BIGINT AS sum_bpe_tokens
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Document fingerprints: polynomial rolling hash + md5, for a
    * deterministic id slice (bounded output at any scale factor).
    */
  def q23Fingerprints(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        rollingFingerprint(col("text")).as("roll_fp"),
        md5(col("text")).as("md5_fp"))
      .orderBy("doc_id")
  }

  val q23Sql: String =
    s"""SELECT doc_id, ${OracleSql.rollingFingerprint("text")} AS roll_fp,
       |  md5(text) AS md5_fp
       |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin

  /** Fixed-size chunking with overlap (reference rag.py:44-69: size
    * 1200 / overlap 200 on legal dockets; 120/20 here because the test
    * documents average ~300 chars). Chunks are trimmed, empty chunks
    * skipped, ids dense after the skip — the reference's exact
    * semantics, expressed as sequence+substring+window instead of a
    * per-row Python loop.
    */
  def q24Chunks(spark: SparkSession, dir: String): DataFrame = {
    val size_ = 120
    val overlap = 20
    val step = size_ - overlap
    val t = Tables(spark, dir)
    val starts = t.documents
      .select(col("doc_id"),
        posexplode(sequence(lit(0),
          greatest(ceil((length(col("text")) - lit(overlap)).cast("double") / step).cast("long") - 1, lit(0))))
          .as(Seq("pos", "k")))
      .select(col("doc_id"), col("pos"), (col("k") * step + 1).as("start"))
    val chunks = starts
      .join(t.documents, "doc_id")
      .select(col("doc_id"), col("pos"),
        trim(col("text").substr(col("start"), lit(size_))).as("chunk"))
      .filter(length(col("chunk")) > 0)
    chunks
      .withColumn("chunk_id",
        row_number().over(Window.partitionBy("doc_id").orderBy("pos")) - 1)
      .select("doc_id", "chunk_id", "chunk")
      .orderBy("doc_id", "chunk_id")
  }

  val q24Sql: String =
    """WITH starts AS (
      |  SELECT doc_id, k, k * 100 + 1 AS start
      |  FROM documents, unnest(generate_series(0,
      |    greatest(ceil((len(text) - 20)::DOUBLE / 100)::BIGINT - 1, 0))) AS u(k)),
      |chunks AS (
      |  SELECT d.doc_id, s.k AS pos, trim(substr(d.text, s.start, 120)) AS chunk
      |  FROM documents d JOIN starts s ON d.doc_id = s.doc_id)
      |SELECT doc_id,
      |  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS chunk_id,
      |  chunk
      |FROM chunks WHERE len(chunk) > 0
      |ORDER BY doc_id, chunk_id""".stripMargin

  /** Exact length percentiles per language (corpus profiling — the
    * length-distribution pass a training pipeline runs before choosing
    * truncation budgets). Exact `percentile` (both engines use linear
    * interpolation over sorted values, so results hash-match); the
    * 100 TB variant swaps in percentile_approx, which is engine-
    * specific and therefore left un-oracled.
    */
  def q27LengthPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .groupBy("lang")
      .agg(
        expr("percentile(n_chars, 0.5)").as("p50"),
        expr("percentile(n_chars, 0.9)").as("p90"),
        expr("percentile(n_chars, 0.99)").as("p99"),
        count(lit(1)).as("n_docs"))
      .orderBy("lang")
  }

  val q27Sql: String =
    """SELECT lang,
      |  quantile_cont(n_chars, 0.5) AS p50,
      |  quantile_cont(n_chars, 0.9) AS p90,
      |  quantile_cont(n_chars, 0.99) AS p99,
      |  COUNT(*) AS n_docs
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** PII-style redaction scrub — a training-data pipeline staple: a
    * cascade of anchored regex rewrites (emails → phones → long digit
    * runs, applied in that order so later patterns see earlier
    * replacements) plus per-class match counts for audit. The corpus
    * text is synthetic word-salad, so a deterministic PII-bearing
    * suffix is appended first to make the scrub observable; patterns
    * stay in the regex subset Java and RE2 interpret identically.
    * Everything is codegen'd string ops — at 100 TB this is a pure
    * map stage, no shuffle.
    */
  def q54Redact(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "\\d{3}[- ]\\d{3,4}"
    val digitsRe = "\\d{4,}"
    t.documents
      .withColumn("aug", concat(substring(col("text"), 1, 80),
        lit(" contact a"), col("doc_id"), lit("@example.com or 555-"),
        col("doc_id") + 1000, lit(" ref "), col("doc_id") * 100000 + 7))
      .select(
        col("doc_id"),
        regexp_count(col("aug"), lit(emailRe)).as("n_email"),
        regexp_count(col("aug"), lit(phoneRe)).as("n_phone"),
        regexp_replace(regexp_replace(regexp_replace(col("aug"),
          emailRe, "[EMAIL]"), phoneRe, "[PHONE]"), digitsRe, "[NUM]")
          .as("redacted"))
      .orderBy("doc_id")
  }

  val q54Sql: String =
    """WITH aug AS (
      |  SELECT doc_id,
      |    substr(text, 1, 80) || ' contact a' || doc_id::VARCHAR ||
      |    '@example.com or 555-' || (doc_id + 1000)::VARCHAR ||
      |    ' ref ' || (doc_id * 100000 + 7)::VARCHAR AS aug
      |  FROM documents)
      |SELECT doc_id,
      |  len(regexp_extract_all(aug, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))::BIGINT AS n_email,
      |  len(regexp_extract_all(aug, '\d{3}[- ]\d{3,4}'))::BIGINT AS n_phone,
      |  regexp_replace(regexp_replace(regexp_replace(aug,
      |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
      |    '\d{3}[- ]\d{3,4}', '[PHONE]', 'g'),
      |    '\d{4,}', '[NUM]', 'g') AS redacted
      |FROM aug ORDER BY doc_id""".stripMargin

  /** Exact corpus-wide heavy hitters via sketch-then-verify: a
    * Misra–Gries sketch (graft_heavy_hitters — mergeable
    * TypedImperativeAggregate, one `capacity`-bounded state per
    * partition crosses the shuffle) nominates candidates, a second
    * pass counts ONLY the candidates exactly (broadcast semi-join —
    * nothing else shuffles), and the top-k is exact because every
    * token with frequency > N/(capacity+1) is guaranteed a counter.
    * At 100 TB the naive groupBy-all-tokens shuffle moves the whole
    * token stream; this moves 1024 rows per partition plus the
    * candidate counts. Capacity 1024 » k=20: a Zipf-shaped corpus has
    * its 20th token far above N/1025.
    */
  def q74HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def toks = t.documents
      .select(explode(tokens(lower(col("text")))).as("tok"))
    val cands = toks
      .agg(call_function("graft_heavy_hitters", col("tok"), lit(1024)).as("sk"))
      .select(explode(col("sk")).as("c"))
      .select(col("c.token").as("tok"))
    toks.join(broadcast(cands), "tok")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(20)
  }

  val q74Sql: String =
    s"""WITH toks AS (
       |  SELECT t.tok AS tok
       |  FROM documents, unnest(${OracleSql.tokens("lower(text)")}) AS t(tok))
       |SELECT tok, COUNT(*)::BIGINT AS cnt
       |FROM toks GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20""".stripMargin

  /** q87: distributed-BPE tokenization of the corpus. Trains 8 merge
    * rules from the corpus's own word-frequency table (one tiny Spark
    * job per round — see [[graft.functions.BpeTokenizer]]), then
    * tokenizes every document with the learned subword vocabulary.
    *
    * The oracle re-derives everything SQL can see — doc count, exact
    * whitespace-token total, exact non-space char total — and pins the
    * BPE-specific outputs as contracts the engine must satisfy: every
    * document reconstructs byte-exactly from its tokens, and the
    * subword token total lands in [n_words, n_nonspace_chars] (merges
    * only ever concatenate within a word). Token-level values are
    * additionally pinned in BpeTokenizerSpec.
    */
  def q87BpeTokenize(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val wordFreq = t.documents
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val merges = graft.functions.BpeTokenizer.train(wordFreq, 8)
    val bpe = udf { (text: String) =>
      val words = text.split("\\s+").filter(_.nonEmpty)
      var nTok = 0L
      var ok = true
      words.foreach { w =>
        val toks = graft.functions.BpeTokenizer.tokenizeWord(w, merges)
        nTok += toks.length
        ok &&= toks.mkString("") == w
      }
      (nTok, ok)
    }
    t.documents
      .select(col("doc_id"), col("text"),
        size(tokens(col("text"))).cast("long").as("n_words"),
        length(regexp_replace(col("text"), "\\s", "")).cast("long").as("n_nonspace"),
        bpe(col("text")).as("b"))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("total_words"),
        sum("n_nonspace").as("total_nonspace_chars"),
        (min(col("b._2")) === true).as("all_roundtrip_ok"),
        (sum(col("b._1")).between(sum("n_words"), sum("n_nonspace")))
          .as("bpe_total_in_bounds"))
  }

  val q87Sql: String =
    s"""SELECT COUNT(*) AS n_docs,
       |  SUM(len(${OracleSql.tokens("text")}))::BIGINT AS total_words,
       |  SUM(len(regexp_replace(text, '\\s', '', 'g')))::BIGINT
       |    AS total_nonspace_chars,
       |  TRUE AS all_roundtrip_ok,
       |  TRUE AS bpe_total_in_bounds
       |FROM documents""".stripMargin

  /** q89: unigram language-model scoring — the "model-based quality
    * filter" shape: train a unigram LM on the corpus itself (token →
    * corpus frequency), score each document by its tokens' average
    * rarity, histogram the scores per language. Rarity uses the
    * frequency CLASS floor(log2(cnt)) = len(bin(cnt))-1, computed in
    * INTEGER arithmetic — a float `ln` differs in the last ulp
    * between libm implementations and would break hash parity; bit
    * length is exact everywhere and preserves the ranking signal.
    *
    * Scale shape: one shuffle builds the vocab, one scores documents;
    * the vocab side of the scoring join is Zipf-compressed (millions
    * of rows from 100 TB of text) and broadcasts or bucket-joins.
    * Low-average-frequency-class docs = rare-token-heavy = the tail a
    * perplexity filter would flag.
    */
  def q89UnigramScore(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val toks = t.documents
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    toks.join(vocab, Seq("tok"))
      .withColumn("fc", (length(bin(col("cnt"))) - 1).cast("long"))
      .groupBy("doc_id", "lang")
      .agg(sum("fc").as("fc_sum"), count(lit(1)).as("n_toks"))
      .withColumn("bucket",
        floor(lit(10.0d) * col("fc_sum") / col("n_toks")).cast("long"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"), min("fc_sum").as("min_fc_sum"),
        max("fc_sum").as("max_fc_sum"))
      .orderBy("lang", "bucket")
  }

  val q89Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, unnest(${OracleSql.tokens("text")}) AS tok
       |  FROM documents),
       |vocab AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
       |scored AS (
       |  SELECT t.doc_id, t.lang,
       |    SUM(len(bin(v.cnt)) - 1)::BIGINT AS fc_sum, COUNT(*) AS n_toks
       |  FROM toks t JOIN vocab v ON t.tok = v.tok
       |  GROUP BY t.doc_id, t.lang)
       |SELECT lang, floor(10.0 * fc_sum / n_toks)::BIGINT AS bucket,
       |  COUNT(*) AS n_docs, MIN(fc_sum)::BIGINT AS min_fc_sum,
       |  MAX(fc_sum)::BIGINT AS max_fc_sum
       |FROM scored GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin

  /** Gopher-style in-document repetition filters (Rae et al. 2021,
    * §A1.1: "fraction of characters in the most common n-gram" and
    * "fraction of characters in duplicated n-grams") — the
    * quality-filter family every large-scale web-corpus pipeline
    * (Gopher, FineWeb, RefinedWeb) applies before training, catching
    * boilerplate and generated-loop spam that per-token stats (q21)
    * miss. Two per-document metrics, word-level:
    *
    *   - `frac2`: chars in the MOST COMMON word 2-gram (all
    *     occurrences; gram length counts the joining space) as a
    *     per-mille of n_chars — Gopher flags > 0.20;
    *   - `frac3`: chars in DUPLICATED word 3-grams (count ≥ 2, all
    *     occurrences) per-mille — flags > 0.15.
    *
    * Both are per-mille INTEGERS via truncating division, so the
    * cross-engine comparison is exact (a double ratio's last ulp is
    * engine-dependent).
    *
    * Execution shape is the point: each document's gram counting runs
    * INSIDE its own row — build the gram array, `array_sort` it, and
    * run-length-scan it with one `aggregate` fold (max run·len for
    * frac2, sum of run·len over runs ≥ 2 for frac3). No explode, no
    * per-gram shuffle: the whole metric pass is a map stage in
    * whole-stage codegen, and the only exchange is the final per-lang
    * rollup (≤ 5 rows). The oracle re-derives the same counts the
    * orthodox way — unnest → group by (doc, gram) — so the fold's
    * run-length identity (sorted array ⇒ runs = occurrence counts) is
    * itself what the gate checks.
    */
  /** Sorted all-occurrence word n-grams of a token-array column (NOT
    * distinct — counts matter), equal grams adjacent for the
    * run-length folds. `toks` must be a MATERIALIZED column reference
    * (see the q107 inlining note), not a raw `tokens(text)` tree.
    */
  private[graft] def sortedGrams(toks: Column, n: Int): Column =
    array_sort(when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))))

  /** Max over grams of count·len — one run-length pass over a sorted
    * gram array (runs = occurrence counts).
    */
  private[graft] def topGramChars(sorted: Column): Column =
    aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (st, g) => {
        val run = when(g === st.getField("prev"), st.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          greatest(st.getField("best"), run * length(g)).as("best"))
      },
      st => st.getField("best"))

  /** Sum over grams with count ≥ 2 of count·len — runs close when the
    * gram changes; the finish clause closes the last run.
    */
  private[graft] def dupGramChars(sorted: Column): Column = {
    def closing(st: Column): Column =
      when(st.getField("run") >= 2L,
        st.getField("run") * length(st.getField("prev"))).otherwise(lit(0L))
    aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("acc")),
      (st, g) => {
        val acc = when(g =!= st.getField("prev"),
          st.getField("acc") + closing(st)).otherwise(st.getField("acc"))
        val run = when(g === st.getField("prev"), st.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"), acc.as("acc"))
      },
      st => st.getField("acc") + closing(st))
  }

  def q105Repetition(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // tokens materialize in their own projection — inlining the split
    // into every lambda element_at would re-tokenize per gram (the
    // q31/q107 lesson)
    def sortedGramsTk(n: Int): Column = sortedGrams(col("tk"), n)
    t.documents
      .select(col("lang"), col("n_chars"), tokens(col("text")).as("tk"))
      .select(col("lang"),
        (lit(1000L) * topGramChars(sortedGramsTk(2))).as("_t2"),
        (lit(1000L) * dupGramChars(sortedGramsTk(3))).as("_d3"),
        greatest(col("n_chars"), lit(1L)).as("_nc"))
      .withColumn("frac2", expr("_t2 div _nc"))
      .withColumn("frac3", expr("_d3 div _nc"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("frac2") > 200, 1)).as("n_fail_top2"),
        count(when(col("frac3") > 150, 1)).as("n_fail_dup3"),
        sum("frac2").as("sum_frac2"),
        sum("frac3").as("sum_frac3"))
      .orderBy("lang")
  }

  val q105Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, greatest(n_chars, 1) AS nc,
       |    ${OracleSql.tokens("text")} AS tk
       |  FROM documents),
       |g2 AS (
       |  SELECT doc_id, g, COUNT(*) * len(g) AS chars
       |  FROM toks, UNNEST(list_transform(generate_series(1, len(tk) - 1),
       |      i -> tk[i] || ' ' || tk[i + 1])) AS u(g)
       |  GROUP BY doc_id, g),
       |g3 AS (
       |  SELECT doc_id, g, COUNT(*) AS cnt, COUNT(*) * len(g) AS chars
       |  FROM toks, UNNEST(list_transform(generate_series(1, len(tk) - 2),
       |      i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS u(g)
       |  GROUP BY doc_id, g),
       |m2 AS (SELECT doc_id, MAX(chars) AS top2 FROM g2 GROUP BY doc_id),
       |m3 AS (SELECT doc_id, SUM(chars) FILTER (WHERE cnt >= 2) AS dup3
       |       FROM g3 GROUP BY doc_id),
       |m AS (SELECT t.doc_id, t.lang,
       |        (1000 * COALESCE(m2.top2, 0)) // t.nc AS frac2,
       |        (1000 * COALESCE(m3.dup3, 0)) // t.nc AS frac3
       |      FROM toks t LEFT JOIN m2 USING (doc_id)
       |                  LEFT JOIN m3 USING (doc_id))
       |SELECT lang, COUNT(*) AS n_docs,
       |  COUNT(*) FILTER (WHERE frac2 > 200) AS n_fail_top2,
       |  COUNT(*) FILTER (WHERE frac3 > 150) AS n_fail_dup3,
       |  SUM(frac2)::BIGINT AS sum_frac2, SUM(frac3)::BIGINT AS sum_frac3
       |FROM m GROUP BY lang ORDER BY lang""".stripMargin

  /** Bigram-LM fluency scoring — the conditional complement of q89's
    * unigram rarity: a corpus-trained bigram model scores each
    * document by how SURPRISING its word transitions are, which is
    * what catches shuffled/templated word salad whose unigrams are
    * individually common (the failure mode a perplexity filter
    * exists for; KenLM-over-CommonCrawl is the classic instance).
    *
    * Per within-document bigram (w1, w2) the surprisal proxy is
    * `bitlen(count(w1·)) − bitlen(count(w1 w2))` ≈ −log2 P(w2|w1) in
    * frequency classes — INTEGER arithmetic end to end (q89's
    * `len(bin(n))−1` trick; libm `ln` drifts in the last ulp across
    * engines, bit length is exact everywhere). `count(w1·)` is the
    * CONTINUATION count (occurrences of w1 as a bigram prefix), so
    * the proxy is a true conditional: surp ≥ 0, and 0 means "w2 is
    * what always follows w1". Per-doc mean surprisal (×10, floored)
    * buckets per language with exact min/max sums.
    *
    * Scale shape: bigram derivation is ROW-LOCAL (transform over the
    * token array — no self-join, no lag window over an exploded
    * table), then one explode feeds two grouped counts (bigram
    * table, prefix table — the same shuffle key modulo the second
    * element) and one scoring join whose model side is
    * Zipf-compressed and broadcastable at corpus scale.
    */
  def q107BigramScore(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // native positional bigrams (graft_word_grams): one eval per row
    // into a tight loop — replaces the tokens-projection + per-element
    // transform lambda, whose interpreted frames were this query's
    // dominant per-task cost (and whose CollapseProject hazard forced
    // the two-projection shape; the native expr tokenizes internally,
    // once)
    val docBigrams = t.documents
      .select(col("doc_id"), col("lang"),
        explode(wordGrams(col("text"), 2)).as("bg"))
    val bgCounts = docBigrams.groupBy("bg").agg(count(lit(1)).as("bg_cnt"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val prefixCounts = bgCounts.groupBy("w1")
      .agg(sum("bg_cnt").as("w1_cnt"))
    val model = bgCounts.join(prefixCounts, Seq("w1"))
      .select(col("bg"),
        ((length(bin(col("w1_cnt"))) - length(bin(col("bg_cnt"))))
          .cast("long")).as("surp"))
    docBigrams.join(model, Seq("bg"))
      .groupBy("doc_id", "lang")
      .agg(sum("surp").as("surp_sum"), count(lit(1)).as("n_bigrams"))
      .withColumn("bucket", expr("(10 * surp_sum) div n_bigrams"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"), min("surp_sum").as("min_surp"),
        max("surp_sum").as("max_surp"))
      .orderBy("lang", "bucket")
  }

  val q107Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, ${OracleSql.tokens("text")} AS tk
       |  FROM documents),
       |db AS (
       |  SELECT doc_id, lang, g AS bg
       |  FROM toks, UNNEST(list_transform(generate_series(1, len(tk) - 1),
       |      i -> tk[i] || ' ' || tk[i + 1])) AS u(g)),
       |bgc AS (SELECT bg, COUNT(*) AS bg_cnt FROM db GROUP BY bg),
       |pfx AS (SELECT split_part(bg, ' ', 1) AS w1, SUM(bg_cnt) AS w1_cnt
       |        FROM bgc GROUP BY 1),
       |model AS (
       |  SELECT bg, (len(bin(w1_cnt)) - len(bin(bg_cnt)))::BIGINT AS surp
       |  FROM bgc JOIN pfx ON split_part(bgc.bg, ' ', 1) = pfx.w1),
       |scored AS (
       |  SELECT d.doc_id, d.lang, SUM(m.surp)::BIGINT AS surp_sum,
       |    COUNT(*) AS n_bigrams
       |  FROM db d JOIN model m ON d.bg = m.bg
       |  GROUP BY d.doc_id, d.lang)
       |SELECT lang, (10 * surp_sum) // n_bigrams AS bucket,
       |  COUNT(*) AS n_docs, MIN(surp_sum)::BIGINT AS min_surp,
       |  MAX(surp_sum)::BIGINT AS max_surp
       |FROM scored GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin

  /** Token co-occurrence PMI — THE statistic embedding pretraining is
    * built on (word2vec negative sampling and GloVe both factorize
    * exactly this matrix): unordered token pairs co-occurring within
    * a ±2 sliding window, scored by pointwise mutual information
    * PMI(a,b) = log( N·c(a,b) / (c(a)·c(b)) ), here in INTEGER
    * frequency classes — `bitlen(N·c_ab) − bitlen(c_a·c_b)` ≈ ⌈PMI⌉₂
    * — so the cross-engine hash is exact (q89's discipline). Output:
    * top-100 pairs by (pmi_class, count, pair), the corpus's most
    * over-associated collocations; rare tight pairs outrank frequent
    * loose ones, which raw co-occurrence counts cannot do.
    *
    * Shape: window pairs derive ROW-LOCALLY (flatten over offsets
    * d ∈ {1,2} of the materialized token array — no self-join of an
    * exploded table), then one explode feeds the pair count; the PMI
    * join sides (pair table, two unigram lookups, the scalar N) are
    * all Zipf-compressed and broadcastable at corpus scale. The
    * final top-100 is a TakeOrderedAndProject.
    */
  def q110CoocPmi(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // native windowed-pair derivation (graft_cooc_pairs, canonical
    // least/greatest order, offsets 1..2): the nested
    // transform/filter/flatten lambda evaluated one interpreted frame
    // per (position, offset) and was this query's dominant single-task
    // cost (r14: 1.2-2.4 s stages); same row-local shape, one eval/row
    val pairRows = t.documents.select(
      explode(coocPairs(col("text"), 2, 0, canonical = true,
        dropSelf = false)).as("pr"))
    val pc = pairRows.groupBy("pr").agg(count(lit(1)).as("c_ab"))
    val tc = t.documents.select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_w"))
    // N from the pair aggregate, NOT a second pass over pairRows: a
    // second reference to the un-shuffled pairRows would re-run the
    // scan + flatten, while the aggregate's exchange is reusable
    val tot = pc.agg(sum("c_ab").as("n"))
    pc.filter(col("c_ab") >= 5)
      .withColumn("w1", substring_index(col("pr"), " ", 1))
      .withColumn("w2", substring_index(col("pr"), " ", -1))
      .join(tc.select(col("w").as("w1"), col("c_w").as("c_a")), Seq("w1"))
      .join(tc.select(col("w").as("w2"), col("c_w").as("c_b")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .withColumn("pmi_class",
        (length(bin(col("n") * col("c_ab"))) -
          length(bin(col("c_a") * col("c_b")))).cast("long"))
      .select("w1", "w2", "c_ab", "pmi_class")
      .orderBy(desc("pmi_class"), desc("c_ab"), asc("w1"), asc("w2"))
      .limit(100)
  }

  val q110Sql: String =
    s"""WITH tk AS (SELECT doc_id, ${OracleSql.tokens("text")} AS t
       |            FROM documents),
       |prs AS (
       |  SELECT least(t[i], t[i+d]) || ' ' || greatest(t[i], t[i+d]) AS pr
       |  FROM tk, UNNEST(generate_series(1, len(t) - 1)) AS u(i),
       |        UNNEST([1, 2]) AS v(d)
       |  WHERE i + d <= len(t)),
       |pc AS (SELECT pr, COUNT(*) AS c_ab FROM prs GROUP BY pr),
       |tc AS (SELECT un.t AS w, COUNT(*) AS c_w
       |       FROM tk, UNNEST(tk.t) AS un(t) GROUP BY un.t),
       |tot AS (SELECT COUNT(*) AS n FROM prs)
       |SELECT split_part(pr, ' ', 1) AS w1, split_part(pr, ' ', 2) AS w2,
       |  c_ab,
       |  (len(bin(tot.n * c_ab)) - len(bin(a.c_w * b.c_w)))::BIGINT
       |    AS pmi_class
       |FROM pc, tot
       |JOIN tc a ON split_part(pc.pr, ' ', 1) = a.w
       |JOIN tc b ON split_part(pc.pr, ' ', 2) = b.w
       |WHERE c_ab >= 5
       |ORDER BY pmi_class DESC, c_ab DESC, w1, w2 LIMIT 100""".stripMargin

  /** q116: quality-filter CASCADE with first-fail attribution — the
    * C4/Gopher/FineWeb-style rule funnel every curation pipeline
    * publishes next to its corpus: ordered rules, each document
    * charged to the FIRST rule it fails (so the per-rule counts sum
    * to n_docs and the funnel is auditable — "how many documents did
    * rule 3 uniquely remove" is unanswerable from independent rule
    * counts). Rules, in order, all integer-exact: token count < 20
    * (too short), chars > 480 (too long), mean word length in tenths
    * outside [41, 48] (Gopher §A1.1's 3-10 char window, scaled to
    * this corpus), fewer than 2 stopword hits (Gopher's "at least 2
    * of a stop set" rule). Output: per-language funnel + survivors.
    *
    * Scale shape: every metric is ROW-LOCAL over the materialized
    * token array (one scan, no explode, no join — the q107 lesson:
    * tokens materialize in their own projection so lambda
    * element_at/size references don't re-tokenize); the only exchange
    * is the 5-row-per-language rollup with map-side partial combine.
    * At 100 TB this is a pure map stage — the funnel aggregate is
    * bytes per executor.
    */
  def q116FilterCascade(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val allStop = stopwords.flatMap(_._2).distinct.sorted
    val base = t.documents.select(col("lang"), col("n_chars"),
      tokens(col("text")).as("tk"), tokens(lower(col("text"))).as("ltk"))
    val scored = base.select(col("lang"), col("n_chars"),
        size(col("tk")).cast("long").as("ntok"),
        aggregate(col("tk"), lit(0L), (acc, s) => acc + length(s)).as("sumlen"),
        size(filter(col("ltk"), s => s.isin(allStop.map(lit): _*)))
          .cast("long").as("stophits"))
      .withColumn("mwl10", expr("(10 * sumlen) div greatest(ntok, 1)"))
      .withColumn("verdict",
        when(col("ntok") < 20, "too_short")
          .when(col("n_chars") > 480, "too_long")
          .when(col("mwl10") < 41 || col("mwl10") > 48, "word_length")
          .when(col("stophits") < 2, "few_stopwords")
          .otherwise(lit("kept")))
    scored.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("verdict") === "too_short", 1)).as("n_too_short"),
        count(when(col("verdict") === "too_long", 1)).as("n_too_long"),
        count(when(col("verdict") === "word_length", 1)).as("n_word_length"),
        count(when(col("verdict") === "few_stopwords", 1)).as("n_few_stopwords"),
        count(when(col("verdict") === "kept", 1)).as("n_kept"))
      .orderBy("lang")
  }

  val q116Sql: String = {
    val allStop = stopwords.flatMap(_._2).distinct.sorted
    s"""WITH base AS (
       |  SELECT lang, n_chars, ${OracleSql.tokens("text")} AS tk,
       |    ${OracleSql.tokens("lower(text)")} AS ltk
       |  FROM documents),
       |m AS (
       |  SELECT lang, n_chars, len(tk)::BIGINT AS ntok,
       |    list_aggregate(list_transform(tk, s -> len(s)), 'sum')::BIGINT AS sumlen,
       |    ${OracleSql.stopHits("ltk", allStop)}::BIGINT AS stophits
       |  FROM base),
       |v AS (
       |  SELECT lang,
       |    CASE WHEN ntok < 20 THEN 'too_short'
       |         WHEN n_chars > 480 THEN 'too_long'
       |         WHEN (10 * sumlen) // greatest(ntok, 1) < 41
       |           OR (10 * sumlen) // greatest(ntok, 1) > 48 THEN 'word_length'
       |         WHEN stophits < 2 THEN 'few_stopwords'
       |         ELSE 'kept' END AS verdict
       |  FROM m)
       |SELECT lang, COUNT(*) AS n_docs,
       |  COUNT(*) FILTER (WHERE verdict = 'too_short') AS n_too_short,
       |  COUNT(*) FILTER (WHERE verdict = 'too_long') AS n_too_long,
       |  COUNT(*) FILTER (WHERE verdict = 'word_length') AS n_word_length,
       |  COUNT(*) FILTER (WHERE verdict = 'few_stopwords') AS n_few_stopwords,
       |  COUNT(*) FILTER (WHERE verdict = 'kept') AS n_kept
       |FROM v GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** q118: corpus DRIFT monitor — the distribution-shift check a
    * continuously-ingesting pipeline runs between a reference corpus
    * snapshot and the current one (vocabulary drift is the early
    * signal of a scraper change, a spam influx, or an upstream format
    * break — you want it before the tokenizer/filter stack silently
    * degrades). Documents split into REF (even doc_id) and CUR (odd
    * doc_id) standing in for two snapshots; token occurrences hash
    * into 512 buckets (the same O(buckets) model trick as q117 — the
    * monitor's state is fixed-size no matter the corpus); each
    * bucket's drift class is the symmetric integer log-ratio
    * `|bitlen(c_ref·N_cur) − bitlen(c_cur·N_ref)|` (cross-multiplied
    * so no division truncates the signal; bitlen is hash-exact where
    * a float KL would drift between engines). The 20 most-drifted
    * buckets come back with each side's most frequent token as the
    * human-readable "what changed" witness (argmax by count, ties to
    * the lexicographically greatest token — max(struct) in Spark, a
    * (count DESC, word DESC) window in the oracle: deterministic in
    * both engines).
    *
    * Scale shape: one scan, row-local tokens, one explode; bucket
    * counts are a 512-row aggregate with map-side combine; the
    * per-(bucket, token) witness aggregate is the only corpus-sized
    * exchange and is itself Zipf-compressed (distinct tokens, not
    * occurrences, cross it pre-combined); totals reduce 512 rows; the
    * top-20 is a TakeOrderedAndProject.
    */
  def q118DriftMonitor(spark: SparkSession, dir: String): DataFrame = {
    val bkts = 512L
    val t = Tables(spark, dir)
    val tok = t.documents
      .select((pmod(col("doc_id"), lit(2L)) === 0).as("is_ref"),
        explode(tokens(col("text"))).as("w"))
      .select(col("is_ref"), col("w"),
        pmod(md5Long60(col("w")), lit(bkts)).as("b"))
    // one pass: per (bucket, token) split counts, then bucket rollup +
    // per-side witness ride the same grouped frame
    val byTok = tok.groupBy("b", "w")
      .agg(count(when(col("is_ref"), 1)).as("cr"),
        count(when(!col("is_ref"), 1)).as("cc"))
      .localCheckpoint(false)
    val byBucket = byTok.groupBy("b")
      .agg(sum("cr").as("c_ref"), sum("cc").as("c_cur"),
        max(struct(col("cr").as("c"), col("w").as("w"))).as("wr"),
        max(struct(col("cc").as("c"), col("w").as("w"))).as("wc"))
      .select(col("b"), col("c_ref"), col("c_cur"),
        col("wr.w").as("top_ref_word"),
        col("wc.w").as("top_cur_word"))
    val totals = byBucket.agg(sum("c_ref").as("n_ref"), sum("c_cur").as("n_cur"))
    byBucket.crossJoin(broadcast(totals))
      .withColumn("drift_class",
        abs(length(bin((col("c_ref") + 1) * (col("n_cur") + lit(bkts)))) -
          length(bin((col("c_cur") + 1) * (col("n_ref") + lit(bkts)))))
          .cast("long"))
      .select("b", "c_ref", "c_cur", "top_ref_word", "top_cur_word",
        "drift_class")
      .orderBy(desc("drift_class"), desc("c_cur"), asc("b"))
      .limit(20)
  }

  val q118Sql: String = {
    val h = OracleSql.md5Long60("w")
    s"""WITH tok AS (
       |  SELECT doc_id % 2 = 0 AS is_ref, unnest(${OracleSql.tokens("text")}) AS w
       |  FROM documents),
       |by_tok AS (
       |  SELECT ($h % 512) AS b, w,
       |    COUNT(*) FILTER (WHERE is_ref) AS cr,
       |    COUNT(*) FILTER (WHERE NOT is_ref) AS cc
       |  FROM tok GROUP BY 1, 2),
       |by_bucket AS (
       |  SELECT b, SUM(cr)::BIGINT AS c_ref, SUM(cc)::BIGINT AS c_cur,
       |    MAX(CASE WHEN rr = 1 THEN w END) AS top_ref_word,
       |    MAX(CASE WHEN rc = 1 THEN w END) AS top_cur_word
       |  FROM (
       |    SELECT *,
       |      ROW_NUMBER() OVER (PARTITION BY b ORDER BY cr DESC, w DESC) AS rr,
       |      ROW_NUMBER() OVER (PARTITION BY b ORDER BY cc DESC, w DESC) AS rc
       |    FROM by_tok)
       |  GROUP BY b),
       |totals AS (
       |  SELECT SUM(c_ref)::BIGINT AS n_ref, SUM(c_cur)::BIGINT AS n_cur
       |  FROM by_bucket)
       |SELECT b, c_ref, c_cur, top_ref_word, top_cur_word,
       |  abs(len(bin((c_ref + 1) * (n_cur + 512))) -
       |      len(bin((c_cur + 1) * (n_ref + 512))))::BIGINT AS drift_class
       |FROM by_bucket, totals
       |ORDER BY drift_class DESC, c_cur DESC, b LIMIT 20""".stripMargin
  }

  /** q132: encoding-quality audit — the mojibake/control-character
    * screen a web-scale curation pipeline runs on every drop (CCNet
    * drops double-encoded pages; bad decode chains leave 'Ã?'
    * digraphs, lost bytes leave control characters). The corpus here
    * is clean ASCII by construction, so — same convention as q114's
    * dirty feed — the auditor's detection power is proven on a
    * deterministic injected corruption: docs with doc_id % 11 = 0 get
    * the classic UTF-8-as-Latin-1 mojibake ('a' → 'Ã¡'), the % 22 = 0
    * subset additionally gains BEL control chars. The operator itself
    * is the metric implementation: per-doc corruption counts as
    * length deltas under char removal (codepoint-exact in both
    * engines, no regex engine variance), verdict classification, and
    * the per-source corruption ledger.
    *
    * Scale shape: pure row-local map stage + one source×verdict
    * aggregate — the cheapest possible screen, which is the point:
    * it runs on EVERYTHING before the expensive stages.
    */
  def q132EncodingAudit(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .select(col("doc_id"), col("source"),
        when(pmod(col("doc_id"), lit(22L)) === 0,
          expr("replace(replace(text, 'a', 'Ã¡'), 'e', concat('e', chr(7)))"))
          .when(pmod(col("doc_id"), lit(11L)) === 0,
            expr("replace(text, 'a', 'Ã¡')"))
          .otherwise(col("text")).as("feed"))
      .select(col("source"),
        (length(col("feed")) - length(expr("replace(feed, 'Ã', '')")))
          .cast("long").as("moji"),
        (length(col("feed")) - length(expr("replace(feed, chr(7), '')")))
          .cast("long").as("ctrl"),
        length(col("feed")).cast("long").as("n"))
      .withColumn("verdict",
        when(col("moji") > 0 && col("ctrl") > 0, "both")
          .when(col("moji") > 0, "mojibake")
          .when(col("ctrl") > 0, "control")
          .otherwise("clean"))
      .groupBy("source", "verdict")
      .agg(count(lit(1)).as("n_docs"),
        sum("moji").as("n_moji_chars"),
        sum("ctrl").as("n_ctrl_chars"),
        expr("(1000 * sum(moji + ctrl)) div sum(n)").as("bad_permille"))
      .orderBy("source", "verdict")
  }

  val q132Sql: String =
    """WITH feed AS (
      |  SELECT doc_id, source,
      |    CASE WHEN doc_id % 22 = 0
      |           THEN replace(replace(text, 'a', 'Ã¡'), 'e', 'e' || chr(7))
      |         WHEN doc_id % 11 = 0 THEN replace(text, 'a', 'Ã¡')
      |         ELSE text END AS feed
      |  FROM documents),
      |scored AS (
      |  SELECT source,
      |    (length(feed) - length(replace(feed, 'Ã', '')))::BIGINT AS moji,
      |    (length(feed) - length(replace(feed, chr(7), '')))::BIGINT AS ctrl,
      |    length(feed)::BIGINT AS n
      |  FROM feed),
      |v AS (
      |  SELECT *, CASE WHEN moji > 0 AND ctrl > 0 THEN 'both'
      |    WHEN moji > 0 THEN 'mojibake' WHEN ctrl > 0 THEN 'control'
      |    ELSE 'clean' END AS verdict
      |  FROM scored)
      |SELECT source, verdict, COUNT(*)::BIGINT AS n_docs,
      |  SUM(moji)::BIGINT AS n_moji_chars, SUM(ctrl)::BIGINT AS n_ctrl_chars,
      |  ((1000 * SUM(moji + ctrl)) // SUM(n))::BIGINT AS bad_permille
      |FROM v GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q154: classifier-AGREEMENT audit — the eval-ops statistic for
    * any labeling stage: how well does the q20 language-ID classifier
    * agree with the corpus's declared labels, per class (recall) and
    * chance-corrected overall (Cohen's kappa — plain accuracy looks
    * great on any skewed corpus; kappa subtracts what a
    * label-marginals-only classifier would score). Kappa in pure
    * integer cross-multiplied form: κ‰ = 1000·(n·diag − Σ row·col)
    * div (n² − Σ row·col) — hash-exact, no float probabilities. The
    * per-lang rows carry recall; the ALL row carries accuracy and
    * kappa (per-lang kappa slots are −1, the same mixed-grain
    * convention as q77's ALL row).
    *
    * Scale shape: one scan with the row-local classifier, a
    * |langs|²-bounded confusion aggregate, then driver-free scalar
    * rollups over those few rows.
    */
  def q154LangIdAgreement(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val conf = t.documents
      .select(col("lang").as("declared"), langId(col("text")).as("predicted"))
      .groupBy("declared", "predicted").agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val perLang = conf.groupBy("declared")
      .agg(sum("n").as("n_docs"),
        sum(when(col("declared") === col("predicted"), col("n"))
          .otherwise(0L)).as("n_correct"))
      .withColumn("grp", col("declared"))
      .withColumn("rate_permille", expr("(1000 * n_correct) div n_docs"))
      .withColumn("kappa_permille", lit(-1L))
      .select("grp", "n_docs", "n_correct", "rate_permille", "kappa_permille")
    val rows = conf.groupBy("declared").agg(sum("n").as("rt"))
    val cols = conf.groupBy("predicted").agg(sum("n").as("ct"))
    val peNum = rows.join(cols, col("declared") === col("predicted"), "inner")
      .agg(coalesce(sum(col("rt") * col("ct")), lit(0L)).as("pe_num"))
    val all = conf.agg(sum("n").as("n_docs"),
        sum(when(col("declared") === col("predicted"), col("n"))
          .otherwise(0L)).as("n_correct"))
      .crossJoin(broadcast(peNum))
      .select(lit("ALL").as("grp"), col("n_docs"), col("n_correct"),
        expr("(1000 * n_correct) div n_docs").as("rate_permille"),
        expr("(1000 * (n_docs * n_correct - pe_num))" +
          " div (n_docs * n_docs - pe_num)").as("kappa_permille"))
    perLang.unionByName(all).orderBy("grp")
  }

  val q154Sql: String = {
    val pred = OracleSql.langId("text")
    s"""WITH conf AS (
       |  SELECT lang AS declared, $pred AS predicted, COUNT(*)::BIGINT AS n
       |  FROM documents GROUP BY 1, 2),
       |per_lang AS (
       |  SELECT declared AS grp, SUM(n)::BIGINT AS n_docs,
       |    SUM(CASE WHEN declared = predicted THEN n ELSE 0 END)::BIGINT
       |      AS n_correct
       |  FROM conf GROUP BY 1),
       |pe AS (
       |  SELECT COALESCE(SUM(r.rt * c.ct), 0)::BIGINT AS pe_num
       |  FROM (SELECT declared, SUM(n) AS rt FROM conf GROUP BY 1) r
       |  JOIN (SELECT predicted, SUM(n) AS ct FROM conf GROUP BY 1) c
       |    ON r.declared = c.predicted),
       |allr AS (
       |  SELECT SUM(n)::BIGINT AS n_docs,
       |    SUM(CASE WHEN declared = predicted THEN n ELSE 0 END)::BIGINT
       |      AS n_correct
       |  FROM conf)
       |SELECT grp, n_docs, n_correct,
       |  ((1000 * n_correct) // n_docs)::BIGINT AS rate_permille,
       |  (-1)::BIGINT AS kappa_permille
       |FROM per_lang
       |UNION ALL
       |SELECT 'ALL', a.n_docs, a.n_correct,
       |  ((1000 * a.n_correct) // a.n_docs)::BIGINT,
       |  ((1000 * (a.n_docs * a.n_correct - p.pe_num))
       |    // (a.n_docs * a.n_docs - p.pe_num))::BIGINT
       |FROM allr a, pe p
       |ORDER BY grp""".stripMargin
  }

  /** q136: vocabulary-growth curve (Heaps' law measurement) — the
    * corpus statistic that sizes tokenizers and vocabulary budgets:
    * how many NEW types (and hapax legomena) appear as the corpus
    * grows quartile by quartile along the doc-id axis. A healthy
    * natural corpus keeps discovering types (V ∝ N^β, β≈0.4-0.6);
    * a flat curve means template/synthetic text, a hapax explosion
    * means OCR noise or encoding damage — both are drop signals
    * before tokenizer training.
    *
    * Single-pass design: the growth curve needs no per-prefix rescan —
    * each type's FIRST document id assigns it to the quartile where it
    * entered the vocabulary (min-aggregate), so one explode feeds (a)
    * the 4-row occurrence rollup and (b) the Zipf-compressed per-type
    * (first_doc, count) aggregate; cumulative vocab is a window over
    * 4 rows. Corpus-sized data crosses the shuffle once, pre-combined.
    */
  def q136VocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val n = t.documents.agg((max("doc_id") + 1).as("n_ids"))
    val tok = t.documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
    val occ = tok.crossJoin(broadcast(n))
      .withColumn("q", least(expr("(4 * doc_id) div n_ids"), lit(3L)))
      .groupBy("q").agg(count(lit(1)).as("n_occurrences"))
    val types = tok.groupBy("w")
      .agg(min("doc_id").as("first_doc"), count(lit(1)).as("cnt"))
      .crossJoin(broadcast(n))
      .withColumn("q", least(expr("(4 * first_doc) div n_ids"), lit(3L)))
      .groupBy("q").agg(count(lit(1)).as("n_new_types"),
        count(when(col("cnt") === 1, 1)).as("n_hapax"))
    occ.join(types, Seq("q"), "left")
      .na.fill(0L, Seq("n_new_types", "n_hapax"))
      .withColumn("cum_types", sum("n_new_types").over(Window.orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("q", "n_occurrences", "n_new_types", "cum_types", "n_hapax")
      .orderBy("q")
  }

  val q136Sql: String = {
    val toks = OracleSql.tokens("text")
    s"""WITH n AS (SELECT (MAX(doc_id) + 1)::BIGINT AS n_ids FROM documents),
       |tok AS (SELECT doc_id, unnest($toks) AS w FROM documents),
       |occ AS (
       |  SELECT least((4 * doc_id) // n_ids, 3)::BIGINT AS q,
       |    COUNT(*)::BIGINT AS n_occurrences
       |  FROM tok, n GROUP BY 1),
       |types AS (
       |  SELECT least((4 * first_doc) // n_ids, 3)::BIGINT AS q,
       |    COUNT(*)::BIGINT AS n_new_types,
       |    COUNT(*) FILTER (WHERE cnt = 1)::BIGINT AS n_hapax
       |  FROM (SELECT w, MIN(doc_id) AS first_doc, COUNT(*) AS cnt
       |        FROM tok GROUP BY w), n
       |  GROUP BY 1)
       |SELECT o.q, o.n_occurrences,
       |  COALESCE(t.n_new_types, 0)::BIGINT AS n_new_types,
       |  SUM(COALESCE(t.n_new_types, 0)) OVER (ORDER BY o.q)::BIGINT AS cum_types,
       |  COALESCE(t.n_hapax, 0)::BIGINT AS n_hapax
       |FROM occ o LEFT JOIN types t USING (q) ORDER BY o.q""".stripMargin
  }

  /** q166: OOV-rate curve vs vocabulary size — the tokenizer-design
    * companion to q136's Heaps curve: q136 says how fast NEW types
    * appear; this says what fraction of RUNNING TOKENS a top-V
    * vocabulary fails to cover, for V ∈ {1k..32k} doublings. The knee
    * of this curve is where a vocabulary budget stops paying — the
    * number a BPE/unigram tokenizer sizing decision actually needs
    * (coverage, not type counts). All integer: covered/oov token
    * sums and a truncating per-mille.
    *
    * Scale shape: the corpus crosses the shuffle once, pre-combined,
    * as (type, count) pairs (Zipf-compressed — vocabulary, not corpus,
    * cardinality); ranks come from a top-32k TakeOrderedAndProject (no
    * full-vocabulary sort), and the six thresholds fold into ONE
    * conditional aggregate (no per-threshold rescan). 1000×sum(cnt)
    * bounds the corpus at ~9e15
    * tokens before int64 overflow — per-shard curves long before that.
    */
  def q166OovCurve(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val sizes = Seq(1000L, 2000L, 4000L, 8000L, 16000L, 32000L)
    // (type, count) pairs cross the shuffle once; totals and the top-32k
    // slice both read the materialized frame
    val counts = t.documents
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    // "Tokens covered by the top-v types" is a TakeOrderedAndProject
    // (bounded per-task heaps, driver-side 1-row sum) per threshold over
    // the checkpointed vocabulary frame — the full-vocabulary global
    // rank window (one-partition sort) this replaces bought nothing the
    // six ordered limits don't.
    val totals = counts.agg(
      count(lit(1)).cast("long").as("n_types"),
      sum("cnt").as("total_tokens"))
    val covered = sizes.map { v =>
      counts.orderBy(desc("cnt"), asc("w")).limit(v.toInt)
        .agg(lit(v).as("vocab_size"), sum("cnt").as("covered_tokens"))
    }.reduce(_ unionByName _)
    covered.crossJoin(totals)
      .select(
        col("vocab_size"),
        least(col("vocab_size"), col("n_types")).as("n_types_used"),
        col("covered_tokens"),
        (col("total_tokens") - col("covered_tokens")).as("oov_tokens"),
        expr("(1000 * (total_tokens - covered_tokens)) div total_tokens")
          .as("oov_permille"))
      .orderBy("vocab_size")
  }

  val q166Sql: String = {
    val toks = OracleSql.tokens("text")
    val sizes = Seq(1000L, 2000L, 4000L, 8000L, 16000L, 32000L)
    val filters = sizes.map(v =>
      s"SUM(cnt) FILTER (WHERE rnk <= $v)::BIGINT AS c$v").mkString(",\n       |    ")
    val caseCov = "CASE vocab_size " +
      sizes.map(v => s"WHEN $v THEN c$v").mkString(" ") + " END"
    s"""WITH vocab AS (
       |  SELECT w, COUNT(*)::BIGINT AS cnt
       |  FROM (SELECT unnest($toks) AS w FROM documents) GROUP BY w),
       |ranked AS (
       |  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS rnk
       |  FROM vocab),
       |agg AS (
       |  SELECT COUNT(*)::BIGINT AS n_types, SUM(cnt)::BIGINT AS total_tokens,
       |    $filters
       |  FROM ranked),
       |sizes(vocab_size) AS (VALUES ${sizes.map(v => s"($v::BIGINT)").mkString(", ")}),
       |cov AS (
       |  SELECT vocab_size, n_types, total_tokens,
       |    $caseCov AS covered_tokens
       |  FROM sizes, agg)
       |SELECT vocab_size, least(vocab_size, n_types)::BIGINT AS n_types_used,
       |  covered_tokens,
       |  (total_tokens - covered_tokens)::BIGINT AS oov_tokens,
       |  ((1000 * (total_tokens - covered_tokens)) // total_tokens)::BIGINT
       |    AS oov_permille
       |FROM cov ORDER BY vocab_size""".stripMargin
  }

  /** q167: tokenizer FERTILITY audit — subword tokens per whitespace
    * word, per (lang, source): the standard multilingual-tokenizer
    * health metric (a language whose fertility is 2-3× the corpus
    * median is being over-segmented — its effective context window
    * and its training-compute share are silently worse). Reports the
    * corpus ratio, the worst single document, and how many documents
    * exceed 2000‰ (two subwords per word) — the actionable tail, not
    * just the mean. q22 reports raw totals; this is the RATIO audit
    * with per-document tails. All integer (truncating per-mille).
    *
    * Scale shape: embarrassingly parallel per-document map, one
    * pre-combined aggregate over (lang, source) — group cardinality,
    * not corpus cardinality, crosses the exchange.
    */
  def q167TokenizerFertility(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val perDoc = t.documents.select(
      col("lang"), col("source"),
      size(tokens(col("text"))).cast("long").as("ws"),
      bpeTokenCount(col("text")).cast("long").as("bpe"))
      .withColumn("f_pm", when(col("ws") > 0, expr("(1000 * bpe) div ws")))
    perDoc.groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("ws").as("n_words"),
        sum("bpe").as("n_tokens"),
        when(sum("ws") > 0, expr("(1000 * sum(bpe)) div sum(ws)"))
          .as("fertility_permille"),
        max("f_pm").as("max_doc_permille"),
        count(when(col("f_pm") >= 2000, 1)).as("n_high_fertility"))
      .orderBy("lang", "source")
  }

  val q167Sql: String = {
    val toks = OracleSql.tokens("text")
    val bpe = OracleSql.bpeTokenCount("text")
    s"""WITH per_doc AS (
       |  SELECT lang, source,
       |    len($toks)::BIGINT AS ws,
       |    $bpe::BIGINT AS bpe
       |  FROM documents),
       |scored AS (
       |  SELECT *, CASE WHEN ws > 0 THEN (1000 * bpe) // ws END AS f_pm
       |  FROM per_doc)
       |SELECT lang, source, COUNT(*)::BIGINT AS n_docs,
       |  SUM(ws)::BIGINT AS n_words, SUM(bpe)::BIGINT AS n_tokens,
       |  CASE WHEN SUM(ws) > 0
       |    THEN ((1000 * SUM(bpe)) // SUM(ws))::BIGINT END
       |    AS fertility_permille,
       |  MAX(f_pm)::BIGINT AS max_doc_permille,
       |  COUNT(*) FILTER (WHERE f_pm >= 2000)::BIGINT AS n_high_fertility
       |FROM scored GROUP BY lang, source ORDER BY lang, source""".stripMargin
  }

  /** q180: length-distribution DECAY profile — the tail-shape check
    * behind truncation and packing decisions: bucket documents by the
    * bit length of n_chars (⌊log₂⌋+1 — octave buckets) and report
    * each bucket's count and its ratio to the previous octave. A
    * power-law tail (web text) holds a near-constant ratio 2^(1−α);
    * a lognormal body (curated books) rises then collapses; a hard
    * cliff at one octave exposes a silent truncation upstream — each
    * shape demands a different max-sequence-length policy. All
    * integer (bit-length bucket, truncating per-milles).
    *
    * Scale shape: one pre-combined aggregate to ≤ 64 octave rows;
    * the lag window rides that frame. Embarrassingly parallel.
    */
  def q180LengthDecay(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val byBucket = t.documents
      .filter(col("n_chars") > 0L)
      .groupBy(length(bin(col("n_chars"))).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_docs"))
    byBucket
      .withColumn("share_permille",
        expr("(1000 * n_docs) div sum(n_docs) over ()"))
      .withColumn("ratio_x1000",
        expr("(1000 * n_docs) div lag(n_docs, 1) over (order by bucket)"))
      .select("bucket", "n_docs", "share_permille", "ratio_x1000")
      .orderBy("bucket")
  }

  val q180Sql: String =
    """SELECT bucket, n_docs,
      |  ((1000 * n_docs) // SUM(n_docs) OVER ())::BIGINT AS share_permille,
      |  ((1000 * n_docs) // LAG(n_docs, 1) OVER (ORDER BY bucket))::BIGINT
      |    AS ratio_x1000
      |FROM (
      |  SELECT length(bin(n_chars)) AS bucket, COUNT(*)::BIGINT AS n_docs
      |  FROM documents WHERE n_chars > 0 GROUP BY 1)
      |ORDER BY bucket""".stripMargin

  /** q184: READABILITY profile (Flesch reading-ease shape) — the
    * audience/register audit per (lang, source): words-per-sentence
    * and syllables-per-word (vowel-run heuristic — the standard
    * dictionary-free approximation) feed the Flesch formula
    * 206.835 − 1.015·wps − 84.6·spw, carried ×1000 in integers end
    * to end. A source whose score collapses (legalese, OCR junk) or
    * saturates (template boilerplate) gets flagged before it skews a
    * training mix that targeted a reading level.
    *
    * Scale shape: three regexp counts per document (one scan, no
    * explode), one pre-combined (lang, source) aggregate.
    */
  def q184Readability(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val perDoc = t.documents.select(col("lang"), col("source"),
      size(tokens(col("text"))).cast("long").as("words"),
      greatest(size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))),
        lit(1)).cast("long").as("sents"),
      size(regexp_extract_all(col("text"), lit("[aeiouyAEIOUY]+"), lit(0)))
        .cast("long").as("sylls"))
    perDoc.groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        expr("(1000 * sum(words)) div sum(sents)").as("wps_x1000"),
        expr("(1000 * sum(sylls)) div greatest(sum(words), 1)")
          .as("spw_x1000"))
      .withColumn("flesch_x1000", expr(
        "206835 - (1015 * wps_x1000) div 1000 - (84600 * spw_x1000) div 1000"))
      .orderBy("lang", "source")
  }

  val q184Sql: String = {
    val toks = OracleSql.tokens("text")
    s"""WITH per_doc AS (
       |  SELECT lang, source,
       |    len($toks)::BIGINT AS words,
       |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT
       |      AS sents,
       |    len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))::BIGINT
       |      AS sylls
       |  FROM documents),
       |agg AS (
       |  SELECT lang, source, COUNT(*)::BIGINT AS n_docs,
       |    ((1000 * SUM(words)) // SUM(sents))::BIGINT AS wps_x1000,
       |    ((1000 * SUM(sylls)) // greatest(SUM(words), 1))::BIGINT
       |      AS spw_x1000
       |  FROM per_doc GROUP BY lang, source)
       |SELECT lang, source, n_docs, wps_x1000, spw_x1000,
       |  (206835 - (1015 * wps_x1000) // 1000
       |    - (84600 * spw_x1000) // 1000)::BIGINT AS flesch_x1000
       |FROM agg ORDER BY lang, source""".stripMargin
  }

  /** q192: incremental OOV DRIFT monitor — the deployed-tokenizer
    * health check on every new drop: the serving vocabulary is frozen
    * (here: top-4k types over the 90% history slice — the stand-in
    * for "the vocab the tokenizer shipped with"), and each incoming
    * batch (the 10% hash slice) is scored against it per source:
    * token OOV share and the count of never-seen types. A batch whose
    * OOV jumps over the q166-curve baseline is the retrain trigger —
    * caught at INGEST, before the model sees garbage segmentations.
    *
    * Scale shape: the history crosses once as Zipf-compressed (type,
    * count) pairs and the frozen vocab is a 4k-row BROADCAST; the
    * batch side joins it map-side — the batch never shuffles for the
    * probe (q111's decontamination shape, applied to vocabulary).
    */
  def q192OovDrift(spark: SparkSession, dir: String): DataFrame = {
    val vocabSize = 4000
    val t = Tables(spark, dir)
    val tok = t.documents.select(col("doc_id"), col("source"),
      explode(tokens(col("text"))).as("w"))
    val isBatch = pmod(col("doc_id"), lit(10L)) === 0L
    // top-4k selection as TakeOrderedAndProject (per-task 4k-row heaps,
    // driver-side merge), not a rank window that would sort the whole
    // vocabulary on one partition — output identical since only
    // rnk <= 4000 rows were ever kept.
    val vocab = tok.filter(!isBatch)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("w")).limit(vocabSize)
      .select(col("w"), lit(true).as("in_vocab"))
    tok.filter(isBatch)
      .join(broadcast(vocab), Seq("w"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("in_vocab").isNull, 1)).as("n_oov_tokens"),
        expr("(1000 * count(case when in_vocab is null then 1 end)) " +
          "div count(1)").as("oov_permille"),
        countDistinct(when(col("in_vocab").isNull, col("w")))
          .as("n_new_types"))
      .orderBy("source")
  }

  val q192Sql: String = {
    val toks = OracleSql.tokens("text")
    s"""WITH tok AS (
       |  SELECT doc_id, source, unnest($toks) AS w FROM documents),
       |vocab AS (
       |  SELECT w FROM (
       |    SELECT w, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w) AS rnk
       |    FROM tok WHERE doc_id % 10 <> 0 GROUP BY w)
       |  WHERE rnk <= 4000),
       |scored AS (
       |  SELECT t.source, t.w, v.w IS NOT NULL AS in_vocab
       |  FROM (SELECT * FROM tok WHERE doc_id % 10 = 0) t
       |  LEFT JOIN vocab v ON t.w = v.w)
       |SELECT source, COUNT(*)::BIGINT AS n_tokens,
       |  COUNT(*) FILTER (WHERE NOT in_vocab)::BIGINT AS n_oov_tokens,
       |  ((1000 * COUNT(*) FILTER (WHERE NOT in_vocab)) // COUNT(*))::BIGINT
       |    AS oov_permille,
       |  COUNT(DISTINCT w) FILTER (WHERE NOT in_vocab)::BIGINT
       |    AS n_new_types
       |FROM scored GROUP BY source ORDER BY source""".stripMargin
  }

  /** q196: CONFIDENCE-CALIBRATION audit (reliability table + ECE) —
    * q154 says how often the q20 language-ID classifier is right;
    * this says whether its CONFIDENCE means anything, which is what a
    * threshold-based routing decision ("trust langid above 0.8")
    * actually consumes. Confidence = the add-one-smoothed posterior
    * share of the top language, (top1 + 1)/(total + 5) in integer ‰ —
    * smoothing makes confidence scale with EVIDENCE MASS (1 hit →
    * 333‰, 20 unanimous hits → 840‰) instead of collapsing to 1000‰
    * whenever one language takes all hits, and zero-hit docs land
    * exactly on the uniform 200‰. Binned into deciles; per
    * bin the empirical accuracy ‰ sits next to the mean claimed
    * confidence ‰ and their gap. The ALL row (bin −1, the q77/q154
    * mixed-grain convention) carries the Expected Calibration Error —
    * the n-weighted mean gap — the single number that says
    * "overconfident by X‰". All counts/ratios integer + truncating
    * division: hash-exact.
    *
    * Scale shape: token lists and the five hit counters materialize in
    * ONE projection (CollapseProject keeps the shared alias — the HOF
    * runs once per row per language, never per reference); the
    * reliability frame is an ≤ 11-row aggregate, the ALL row a fold
    * over it.
    */
  def q196Calibration(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val base = t.documents
      .select(col("lang").as("declared"), tokens(lower(col("text"))).as("ts"))
    val withHits = stopwords.foldLeft(base) { case (df, (lang, ws)) =>
      df.withColumn(s"h_$lang",
        size(filter(col("ts"), tk => tk.isin(ws.map(lit): _*))))
    }
    val hitCols = stopwords.map { case (lang, _) => col(s"h_$lang") }
    val maxHits = greatest(hitCols: _*)
    val predicted = stopwords.foldLeft(when(maxHits <= 0, lit("und"))) {
      case (acc, (lang, _)) => acc.when(col(s"h_$lang") === maxHits, lit(lang))
    }.otherwise(lit("und"))
    val scored = withHits
      .withColumn("predicted", predicted)
      .withColumn("top1", maxHits)
      .withColumn("total", hitCols.reduce(_ + _))
      .withColumn("conf", expr("(1000L * (top1 + 1)) div (total + 5)"))
      .withColumn("ok", (col("predicted") === col("declared")).cast("long"))
    val perBin = scored
      .groupBy(expr("conf div 100").as("bin"))
      .agg(count(lit(1)).as("n_docs"), sum("ok").as("nc"), sum("conf").as("sc"))
      .withColumn("acc_permille", expr("(1000L * nc) div n_docs"))
      .withColumn("conf_permille", expr("sc div n_docs"))
      .withColumn("gap_permille", expr("abs(acc_permille - conf_permille)"))
      .localCheckpoint(false)
    val allRow = perBin.agg(
      sum("n_docs").as("n_docs"),
      expr("(1000L * sum(nc)) div sum(n_docs)").as("acc_permille"),
      expr("sum(sc) div sum(n_docs)").as("conf_permille"),
      expr("sum(n_docs * gap_permille) div sum(n_docs)").as("gap_permille"))
      .withColumn("bin", lit(-1L))
    perBin
      .select(col("bin").cast("long"), col("n_docs"), col("acc_permille"),
        col("conf_permille"), col("gap_permille"))
      .unionByName(allRow)
      .orderBy("bin")
  }

  val q196Sql: String = {
    val toks = OracleSql.tokens("lower(text)")
    val hitExprs = stopwords.map { case (lang, ws) =>
      s"${OracleSql.stopHits("ts", ws)} AS h_$lang"
    }.mkString(",\n      |    ")
    val hs = stopwords.map { case (lang, _) => s"h_$lang" }
    val mx = s"greatest(${hs.mkString(", ")})"
    val whens = stopwords.map { case (lang, _) =>
      s"WHEN h_$lang = $mx THEN '$lang'"
    }.mkString(" ")
    s"""WITH h AS (
       |  SELECT lang AS declared, $hitExprs
       |  FROM (SELECT lang, $toks AS ts FROM documents)),
       |s AS (
       |  SELECT declared,
       |    (CASE WHEN $mx <= 0 THEN 'und' $whens ELSE 'und' END) AS predicted,
       |    $mx AS top1, (${hs.mkString(" + ")}) AS total
       |  FROM h),
       |c AS (
       |  SELECT (1000 * (top1 + 1)) // (total + 5) AS conf,
       |    CASE WHEN predicted = declared THEN 1 ELSE 0 END AS ok
       |  FROM s),
       |b AS (
       |  SELECT conf // 100 AS bin, COUNT(*)::BIGINT AS n_docs,
       |    SUM(ok)::BIGINT AS nc, SUM(conf)::BIGINT AS sc
       |  FROM c GROUP BY 1),
       |pb AS (
       |  SELECT bin, n_docs, nc, sc,
       |    (1000 * nc) // n_docs AS acc_permille,
       |    sc // n_docs AS conf_permille,
       |    abs((1000 * nc) // n_docs - sc // n_docs) AS gap_permille
       |  FROM b)
       |SELECT bin::BIGINT AS bin, n_docs, acc_permille::BIGINT AS acc_permille,
       |  conf_permille::BIGINT AS conf_permille,
       |  gap_permille::BIGINT AS gap_permille
       |FROM pb
       |UNION ALL
       |SELECT -1, SUM(n_docs)::BIGINT,
       |  ((1000 * SUM(nc)) // SUM(n_docs))::BIGINT,
       |  (SUM(sc) // SUM(n_docs))::BIGINT,
       |  (SUM(n_docs * gap_permille) // SUM(n_docs))::BIGINT
       |FROM pb
       |ORDER BY bin""".stripMargin
  }

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q166_oov_curve" -> (q166OovCurve _),
    "q180_length_decay" -> (q180LengthDecay _),
    "q184_readability" -> (q184Readability _),
    "q192_oov_drift" -> (q192OovDrift _),
    "q167_tokenizer_fertility" -> (q167TokenizerFertility _),
    "q136_vocab_growth" -> (q136VocabGrowth _),
    "q154_langid_agreement" -> (q154LangIdAgreement _),
    "q196_calibration" -> (q196Calibration _),
    "q132_encoding_audit" -> (q132EncodingAudit _),
    "q118_drift_monitor" -> (q118DriftMonitor _),
    "q116_filter_cascade" -> (q116FilterCascade _),
    "q110_cooc_pmi" -> (q110CoocPmi _),
    "q107_bigram_score" -> (q107BigramScore _),
    "q105_repetition" -> (q105Repetition _),
    "q89_unigram_score" -> (q89UnigramScore _),
    "q87_bpe_tokenize" -> (q87BpeTokenize _),
    "q74_heavy_hitters" -> (q74HeavyHitters _),
    "q54_redact" -> (q54Redact _),
    "q27_length_percentiles" -> (q27LengthPercentiles _),
    "q20_lang_id" -> (q20LangId _),
    "q21_quality_histogram" -> (q21QualityHistogram _),
    "q22_token_stats" -> (q22TokenStats _),
    "q23_fingerprints" -> (q23Fingerprints _),
    "q24_chunks" -> (q24Chunks _),
  )

  val oracle: Map[String, String] = Map(
    "q166_oov_curve" -> q166Sql,
    "q180_length_decay" -> q180Sql,
    "q184_readability" -> q184Sql,
    "q192_oov_drift" -> q192Sql,
    "q167_tokenizer_fertility" -> q167Sql,
    "q136_vocab_growth" -> q136Sql,
    "q154_langid_agreement" -> q154Sql,
    "q196_calibration" -> q196Sql,
    "q132_encoding_audit" -> q132Sql,
    "q110_cooc_pmi" -> q110Sql,
    "q116_filter_cascade" -> q116Sql,
    "q118_drift_monitor" -> q118Sql,
    "q107_bigram_score" -> q107Sql,
    "q105_repetition" -> q105Sql,
    "q89_unigram_score" -> q89Sql,
    "q87_bpe_tokenize" -> q87Sql,
    "q74_heavy_hitters" -> q74Sql,
    "q54_redact" -> q54Sql,
    "q27_length_percentiles" -> q27Sql,
    "q20_lang_id" -> q20Sql,
    "q21_quality_histogram" -> q21Sql,
    "q22_token_stats" -> q22Sql,
    "q23_fingerprints" -> q23Sql,
    "q24_chunks" -> q24Sql,
  )
}
