package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.md5Long60

/** Reproducible sampling/splitting and cross-dataset decontamination —
  * training-data operations that must be DETERMINISTIC functions of
  * the data (a `rand()` sample is neither reproducible across reruns
  * nor auditable): hash-bucket splits and exact-content overlap
  * removal.
  */
object SamplingQueries {

  /** Deterministic train/val/test assignment: bucket =
    * md5(doc_id) mod 100 → 80/10/10. Stable under reruns, rescaling,
    * and repartitioning (pure function of the key — the property that
    * matters when the corpus is 100 TB and the split must never move
    * a document between sets across pipeline versions). Output: per
    * (lang, split) counts + per-split char volume.
    */
  def q38SplitAssignment(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val bucket = pmod(md5Long60(col("doc_id").cast("string")), lit(100L))
    t.documents
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy("lang", "split")
  }

  val q38Sql: String = {
    val bucket = s"(${OracleSql.md5Long60("doc_id::VARCHAR")} % 100)"
    s"""SELECT lang,
       |  CASE WHEN $bucket < 80 THEN 'train'
       |       WHEN $bucket < 90 THEN 'val' ELSE 'test' END AS split,
       |  COUNT(*) AS n_docs, SUM(n_chars)::BIGINT AS sum_chars
       |FROM documents GROUP BY 1, 2 ORDER BY lang, split""".stripMargin
  }

  /** Decontamination: exact-content overlap between the corpus and an
    * "evaluation set" (here: the test split of q38 stands in for a
    * benchmark). Contaminated = a train document whose md5(text)
    * appears in the eval set — the hash semi-join that, at scale,
    * runs as one shuffle on the 128-bit content key (or a broadcast
    * when the benchmark side is small, as benchmarks are).
    */
  def q39Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val bucket = pmod(md5Long60(col("doc_id").cast("string")), lit(100L))
    val tagged = t.documents
      .withColumn("split", when(bucket < 80, "train").when(bucket < 90, "val")
        .otherwise("test"))
      .withColumn("content_hash", md5(col("text")))
    val evalHashes = tagged.filter(col("split") === "test")
      .select(col("content_hash")).distinct()
    val contaminated = tagged.filter(col("split") === "train")
      .join(broadcast(evalHashes), Seq("content_hash"), "left_semi")
    val clean = tagged.filter(col("split") === "train")
      .join(broadcast(evalHashes), Seq("content_hash"), "left_anti")
    contaminated.agg(count(lit(1)).as("n_contaminated"))
      .crossJoin(clean.agg(count(lit(1)).as("n_clean_train")))
      .crossJoin(evalHashes.agg(count(lit(1)).as("n_eval_hashes")))
  }

  val q39Sql: String = {
    val bucket = s"(${OracleSql.md5Long60("doc_id::VARCHAR")} % 100)"
    s"""WITH tagged AS (
       |  SELECT doc_id, md5(text) AS content_hash,
       |    CASE WHEN $bucket < 80 THEN 'train'
       |         WHEN $bucket < 90 THEN 'val' ELSE 'test' END AS split
       |  FROM documents),
       |eval_hashes AS (
       |  SELECT DISTINCT content_hash FROM tagged WHERE split = 'test')
       |SELECT
       |  (SELECT COUNT(*) FROM tagged t WHERE split = 'train'
       |     AND EXISTS (SELECT 1 FROM eval_hashes e WHERE e.content_hash = t.content_hash)) AS n_contaminated,
       |  (SELECT COUNT(*) FROM tagged t WHERE split = 'train'
       |     AND NOT EXISTS (SELECT 1 FROM eval_hashes e WHERE e.content_hash = t.content_hash)) AS n_clean_train,
       |  (SELECT COUNT(*) FROM eval_hashes) AS n_eval_hashes""".stripMargin
  }

  /** Sequence packing into fixed token budgets, defined declaratively:
    * docs walk in doc_id order within a language and map onto
    * consecutive 2048-token stripes of the cumulative token stream —
    * `bin = floor(pre_doc_cumsum / budget)` over one cumulative
    * window. A stripe assignment (not a stateful greedy reset): the
    * shuffle-once deterministic form of the packing pass a training
    * pipeline runs before batching sequences, trading perfect fill for
    * a single window scan. Output: pack counts and fill levels per
    * (lang, bin) — the stats that tell you padding waste.
    *
    * Scale shape (r9): the per-lang running sum rides the grouped
    * distributed scan ([[ScanOps.runningSums]]), NOT a
    * `Window.partitionBy("lang")` — with ~5 languages that window
    * funnels corpus/5 rows through each task at 100 TB. The scan
    * keeps each lang's rows contiguous across range partitions and
    * stitches with a |langs|·|partitions|-row offset frame.
    */
  def q47SequencePacking(spark: SparkSession, dir: String): DataFrame = {
    val budget = 2048L
    val t = Tables(spark, dir)
    val scored = t.documents
      .select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.bpeTokenCount(col("text")).cast("long").as("toks"))
    ScanOps.runningSums(scored, Seq("lang"), Seq(col("doc_id").asc),
        Seq((col("toks"), "cum")))
      .withColumn("bin", floor((col("cum") - col("toks")).cast("double") / budget).cast("long"))
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("pack_tokens"))
      .orderBy("lang", "bin")
  }

  val q47Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, ${OracleSql.bpeTokenCount("text")}::BIGINT AS toks
       |  FROM documents),
       |packed AS (
       |  SELECT lang, toks,
       |    SUM(toks) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM toks)
       |SELECT lang, floor((cum - toks)::DOUBLE / 2048)::BIGINT AS bin,
       |  COUNT(*) AS n_docs, SUM(toks)::BIGINT AS pack_tokens
       |FROM packed GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin

  /** q213: GREEDY doc-boundary sequence packing — the complement of
    * q47's stripe assignment. q47 splits the cumulative token stream
    * every `budget` tokens: perfect fill, but documents cross window
    * boundaries (fine when attention masks reset at doc boundaries
    * inside a window). This packer NEVER splits a document: docs walk
    * in doc_id order within a language and a window closes when the
    * next doc doesn't fit (first-fit-in-order — the packing rule when
    * a training sequence must hold whole documents). A doc longer
    * than the budget truncates to one full window. Output per
    * language: window count, packed/padding token totals, fill
    * efficiency (permille, exact integer), truncation count — the
    * padding bill for respecting boundaries, next to q47's zero-waste
    * stripes.
    *
    * Scale shape: ONE shuffle (repartition on the packing-group key,
    * sorted within) + a STREAMING per-partition greedy with O(1)
    * state — a group never materializes in memory, so a language of
    * any size packs in one pass. The sequential contract is
    * per-language here because the DuckDB oracle replays it exactly
    * (recursive CTE); at 100 TB the group key becomes (lang, shard) —
    * packing has no cross-shard semantics, so the identical plan fans
    * out over thousands of shards unchanged. The test-scale budget
    * (80) sits inside the corpus's 10-99-token doc range so both the
    * pack-several and the truncate paths carry rows; production uses
    * the model context (2048/4096/...) — the plan does not change.
    */
  def q213GreedyPacking(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val budget = 80L
    val prepped = Tables(spark, dir).documents
      .select(col("lang"), col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("toks"))
      .select(col("lang"), col("doc_id"),
        least(col("toks"), lit(budget)).as("dlen"),
        (col("toks") > budget).cast("int").as("trunc"))
      .repartition(col("lang"))
      .sortWithinPartitions("lang", "doc_id")
      .as[(String, Long, Long, Int)]
    val packed = prepped.mapPartitions { it =>
      var curLang: String = null
      var fill = 0L
      var win = 0L
      it.map { case (lang, _, dlen, trunc) =>
        if (lang != curLang) { curLang = lang; win = 1L; fill = dlen }
        else if (fill + dlen <= budget) fill += dlen
        else { win += 1L; fill = dlen }
        (lang, win, dlen, trunc)
      }
    }.toDF("lang", "win", "dlen", "trunc")
    packed.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        max("win").as("n_windows"),
        sum("dlen").as("packed_tokens"),
        (max("win") * budget - sum("dlen")).as("pad_tokens"),
        expr(s"(sum(dlen) * 1000) div (max(win) * $budget)")
          .as("eff_permille"),
        sum("trunc").cast("long").as("n_truncated"))
      .orderBy("lang")
  }

  val q213Sql: String = {
    val toks = s"len(${OracleSql.tokens("text")})::BIGINT"
    s"""WITH RECURSIVE docs AS (
       |  SELECT lang, least($toks, 80) AS dlen,
       |    CASE WHEN $toks > 80 THEN 1 ELSE 0 END AS trunc,
       |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
       |  FROM documents),
       |pack AS (
       |  SELECT lang, rn, dlen, trunc, dlen AS fill, 1::BIGINT AS win
       |  FROM docs WHERE rn = 1
       |  UNION ALL
       |  SELECT d.lang, d.rn, d.dlen, d.trunc,
       |    CASE WHEN p.fill + d.dlen <= 80 THEN p.fill + d.dlen
       |         ELSE d.dlen END,
       |    CASE WHEN p.fill + d.dlen <= 80 THEN p.win ELSE p.win + 1 END
       |  FROM pack p JOIN docs d ON d.lang = p.lang AND d.rn = p.rn + 1)
       |SELECT lang, COUNT(*)::BIGINT AS n_docs, MAX(win) AS n_windows,
       |  SUM(dlen)::BIGINT AS packed_tokens,
       |  (MAX(win) * 80 - SUM(dlen))::BIGINT AS pad_tokens,
       |  ((SUM(dlen)::BIGINT * 1000) // (MAX(win) * 80))::BIGINT AS eff_permille,
       |  SUM(trunc)::BIGINT AS n_truncated
       |FROM pack GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** The full curation pipeline as ONE query — the composition a
    * training-data team actually ships: inject exact duplicates (the
    * corpus has none), then
    *   1. exact-dedup (keep min doc_id per content hash — one shuffle
    *      on the 128-bit key, q30's shape);
    *   2. quality-filter at score ≥ 0.55 (TextQueries.qualityScored,
    *      the oracle-validated signal);
    *   3. stratified cap: best 200 docs per language by (score desc,
    *      doc_id) — one ranking window per stratum;
    *   4. deterministic hash-bucket split (q38's 80/10/10);
    * and report the resulting mix: docs + char volume + score range
    * per (lang, split). Every stage is a deterministic function of
    * the data — rerun it on 100 TB and the same documents land in the
    * same splits.
    */
  def q55TrainingMix(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val docs = t.documents.select("doc_id", "lang", "n_chars", "text")
    val dup = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 1000000L))
    val keepIds = dup.groupBy(md5(col("text")).as("_h"))
      .agg(min("doc_id").as("doc_id")).drop("_h")
    val kept = dup.join(keepIds, Seq("doc_id"), "left_semi")
    // score attaches as a row-local column (r15 native expression) —
    // the r14 doc_id self-join re-evaluated the whole semi-join subtree
    // a second time just to carry the score back
    val scored = kept.withColumn("score",
        graft.functions.TextFunctions.qualityScore(col("text")))
      .filter(col("score") >= 0.55d)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(desc("score"), asc("doc_id"))
    val bucket = pmod(md5Long60(col("doc_id").cast("string")), lit(100L))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 200)
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        min("score").as("min_score"), max("score").as("max_score"))
      .orderBy("lang", "split")
  }

  val q55Sql: String = {
    val score = OracleSql.qualityScore("text")
    val bucket = s"(${OracleSql.md5Long60("doc_id::VARCHAR")} % 100)"
    s"""WITH dup AS (
       |  SELECT doc_id, lang, n_chars, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, lang, n_chars, text FROM documents),
       |keep AS (SELECT min(doc_id) AS doc_id FROM dup GROUP BY md5(text)),
       |kept AS (SELECT d.* FROM dup d JOIN keep k USING (doc_id)),
       |scored AS (
       |  SELECT *, $score AS score FROM kept),
       |filtered AS (SELECT * FROM scored WHERE score >= 0.55),
       |capped AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
       |    ORDER BY score DESC, doc_id) AS rn
       |  FROM filtered),
       |mixed AS (
       |  SELECT *, CASE WHEN $bucket < 80 THEN 'train'
       |                 WHEN $bucket < 90 THEN 'val' ELSE 'test' END AS split
       |  FROM capped WHERE rn <= 200)
       |SELECT lang, split, COUNT(*) AS n_docs, SUM(n_chars)::BIGINT AS sum_chars,
       |  min(score) AS min_score, max(score) AS max_score
       |FROM mixed GROUP BY 1, 2 ORDER BY lang, split""".stripMargin
  }

  /** Temperature-weighted sampling — the corpus-mixing knob training
    * pipelines use to upweight high-quality documents: sampling mass
    * ∝ score^(1/T) (T=2 here, the flattening root), normalized so the
    * sampled corpus targets 2× the input size. Each document's
    * expected copy count splits into floor + a fractional coin, and
    * the coin is a HASH of the doc id, not rand() — rerun the job on
    * 100 TB and the exact same documents duplicate, which is what
    * makes epoch composition auditable. Normalization needs one
    * scalar aggregate broadcast back over the corpus (a crossJoin of
    * a 1-row side — no shuffle of the big side).
    *
    * The weight quantizes to fixed-point (floor(√score·10⁶), an exact
    * integer) BEFORE the normalizer sum: a float sum's last ulp
    * depends on reduction order, and the normalizer feeds a floor and
    * a hash-coin threshold, so an order-dependent sum could flip a
    * document's repeat count between partitionings (or vs the
    * oracle). Integer sums are order-independent in both engines; the
    * scale cancels out of the expected-copies ratio.
    */
  def q84TemperatureSample(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val docs = t.documents.select("doc_id", "source", "text")
    // row-local score (r15 native expression) — no doc_id self-join
    val scored = docs
      .withColumn("score", graft.functions.TextFunctions.qualityScore(col("text")))
      .withColumn("wt", floor(sqrt(col("score")) * 1000000d).cast("long"))
    val tot = scored.agg(sum("wt").as("total"), count(lit(1)).as("n"))
    val expCopies = lit(2.0d) * col("n") * col("wt") / col("total")
    scored.crossJoin(broadcast(tot))
      .withColumn("exp_c", expCopies)
      .withColumn("repeats", floor(col("exp_c")) +
        when(pmod(md5Long60(col("doc_id").cast("string")), lit(1000000L))
          .cast("double") < (col("exp_c") - floor(col("exp_c"))) * 1000000d, 1L)
          .otherwise(0L))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("repeats").as("n_sampled"),
        min("repeats").as("min_repeats"), max("repeats").as("max_repeats"))
      .orderBy("source")
  }

  val q84Sql: String = {
    val score = OracleSql.qualityScore("text")
    val coin = s"(${OracleSql.md5Long60("doc_id::VARCHAR")} % 1000000)"
    s"""WITH w AS (
       |  SELECT doc_id, source,
       |    floor(sqrt($score) * 1000000)::BIGINT AS wt FROM documents),
       |tot AS (SELECT sum(wt) AS total, count(*) AS n FROM w),
       |rep AS (
       |  SELECT source,
       |    (floor(2.0 * n * wt / total) +
       |     CASE WHEN $coin < (2.0 * n * wt / total - floor(2.0 * n * wt / total)) * 1000000
       |          THEN 1 ELSE 0 END)::BIGINT AS repeats
       |  FROM w, tot)
       |SELECT source, COUNT(*) AS n_docs, SUM(repeats)::BIGINT AS n_sampled,
       |  MIN(repeats)::BIGINT AS min_repeats, MAX(repeats)::BIGINT AS max_repeats
       |FROM rep GROUP BY 1 ORDER BY source""".stripMargin
  }

  /** Weighted sampling WITHOUT replacement, k=200, by priority
    * sampling (Ohlsson's sequential Poisson / Duffield–Lund–Thorup):
    * draw u_i uniform per item, keep the k smallest ranks u_i/w_i —
    * heavier documents sample with probability ≈ proportional to
    * weight, and unlike q84's with-replacement repeats, no document
    * appears twice. Two engineering choices make it exact and
    * 100 TB-shaped:
    *
    *   - u_i is `md5Long60(doc_id)` (a deterministic hash, not
    *     rand()) and the rank is the TRUNCATING INTEGER division
    *     `hash div w` — `floor(hash / w)` in doubles would round
    *     (the hash needs 60 bits, doubles carry 53), so the order
    *     could differ between engines; integer division is exact in
    *     both, and dividing the fixed 60-bit u by w preserves the
    *     u/w ordering at integer resolution.
    *   - the bottom-k executes as `ORDER BY ... LIMIT k` →
    *     TakeOrderedAndProject: each task keeps a k-row heap and only
    *     k rows per partition cross the wire — no full sort, no full
    *     shuffle, at any corpus size. Bottom-k sketches also merge:
    *     per-shard samples union and re-take, which is how the same
    *     sample composes across 100 TB of partitioned input.
    *
    * Ties in rank break by doc_id in BOTH engines, so the kept set is
    * fully deterministic — rerun it and the same 200 documents come
    * back, the property that makes a weighted corpus subsample
    * auditable.
    */
  def q104WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .select(col("doc_id"), col("lang"),
        greatest(col("n_chars"), lit(1L)).as("w"),
        md5Long60(col("doc_id").cast("string")).as("_u"))
      .withColumn("smp_rank", expr("_u div w"))
      .drop("_u")
      .orderBy(col("smp_rank"), col("doc_id"))
      .limit(200)
  }

  val q104Sql: String = {
    val u = OracleSql.md5Long60("doc_id::VARCHAR")
    s"""SELECT doc_id, lang, greatest(n_chars, 1)::BIGINT AS w,
       |  ($u // greatest(n_chars, 1))::BIGINT AS smp_rank
       |FROM documents ORDER BY smp_rank, doc_id LIMIT 200""".stripMargin
  }

  /** q111: PARTIAL decontamination via word 8-gram overlap — the
    * n-gram collision check (GPT-3 appendix C / PaLM style) that
    * catches a training document QUOTING an eval item, which q39's
    * whole-document hash structurally misses (any one-character edit
    * defeats an exact hash; an 8-gram overlap survives it). Split is
    * q38's stable hash bucket; "benchmark" = the test split. Per
    * train document: distinct 8-grams, how many also occur anywhere
    * in the eval set, and the overlap per-mille; the 50 most
    * contaminated come back (ties fully ordered by doc_id).
    *
    * Scale shape: gram derivation is ROW-LOCAL (the codegen'd
    * graft_word_shingles — no self-join); the eval gram set is tiny
    * relative to the corpus (benchmarks are KBs next to a 100 TB
    * crawl) so the membership probe is a BROADCAST semi-join — the
    * train side never shuffles for it; the only exchange is the
    * per-doc rollup on doc_id, and the top-50 is a
    * TakeOrderedAndProject heap. At real scale the eval grams would
    * be distributed as a bloom filter first, with this exact join as
    * the confirm pass on the survivors.
    */
  def q111NgramDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val bucket = pmod(md5Long60(col("doc_id").cast("string")), lit(100L))
    val tagged = t.documents
      .select(col("doc_id"),
        graft.functions.TextFunctions.wordShingles(col("text"), 8).as("grams"),
        when(bucket < 80, "train").when(bucket < 90, "val")
          .otherwise("test").as("split"))
    val evalGrams = tagged.filter(col("split") === "test")
      .select(explode(col("grams")).as("gram")).distinct()
    tagged.filter(col("split") === "train")
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"),
        explode(col("grams")).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"), "left_semi")
      .groupBy("doc_id", "n_grams")
      .agg(count(lit(1)).as("n_hits"))
      .withColumn("permille", expr("(1000 * n_hits) div n_grams"))
      .select("doc_id", "n_grams", "n_hits", "permille")
      .orderBy(desc("permille"), desc("n_hits"), asc("doc_id"))
      .limit(50)
  }

  val q111Sql: String = {
    val bucket = s"(${OracleSql.md5Long60("doc_id::VARCHAR")} % 100)"
    val grams = OracleSql.wordShingles(OracleSql.tokens("text"), 8)
    s"""WITH tagged AS (
       |  SELECT doc_id, $grams AS grams,
       |    CASE WHEN $bucket < 80 THEN 'train'
       |         WHEN $bucket < 90 THEN 'val' ELSE 'test' END AS split
       |  FROM documents),
       |eval_grams AS (
       |  SELECT DISTINCT unnest(grams) AS gram FROM tagged WHERE split = 'test'),
       |train AS (
       |  SELECT doc_id, len(grams)::BIGINT AS n_grams, unnest(grams) AS gram
       |  FROM tagged WHERE split = 'train')
       |SELECT t.doc_id, t.n_grams, COUNT(*)::BIGINT AS n_hits,
       |  ((1000 * COUNT(*)) // t.n_grams)::BIGINT AS permille
       |FROM train t JOIN eval_grams e USING (gram)
       |GROUP BY t.doc_id, t.n_grams
       |ORDER BY permille DESC, n_hits DESC, doc_id LIMIT 50""".stripMargin
  }

  /** q163: GROUP-leakage split audit — the GroupKFold motivation
    * measured: splitting event-level data by ROW hash puts almost
    * every active user on both sides of the train/test boundary, so
    * any model with user-level memory evaluates on users it trained
    * on. The audit runs both strategies side by side — event-hash
    * (the wrong granularity, deliberately) vs user-hash (the group
    * split) — and reports how many users straddle under each. The
    * user-hash row's zero is BY CONSTRUCTION and the spec pins it;
    * the event-hash row's near-1000‰ is the number that justifies
    * group-aware splitting in every pipeline design review.
    *
    * Scale shape: per-strategy, one per-user aggregate (distinct
    * splits per user) + a 1-row rollup.
    */
  def q163GroupLeakage(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def audit(name: String, split: org.apache.spark.sql.Column): DataFrame =
      t.events.select(col("user_id"), split.as("split"))
        .groupBy("user_id")
        .agg(countDistinct("split").as("nsp"))
        .agg(count(lit(1)).as("n_users"),
          count(when(col("nsp") > 1, 1)).as("n_straddling"))
        .select(lit(name).as("strategy"), col("n_users"), col("n_straddling"),
          expr("(1000 * n_straddling) div n_users").as("straddle_permille"))
    def bucket(c: org.apache.spark.sql.Column) =
      pmod(md5Long60(c.cast("string")), lit(100L))
    val byEvent = when(bucket(col("event_id")) < 80, "train").otherwise("test")
    val byUser = when(bucket(col("user_id")) < 80, "train").otherwise("test")
    audit("event_hash", byEvent).unionByName(audit("user_hash", byUser))
      .orderBy("strategy")
  }

  val q163Sql: String = {
    def audit(name: String, expr: String) =
      s"""SELECT '$name' AS strategy, COUNT(*)::BIGINT AS n_users,
         |  COUNT(*) FILTER (WHERE nsp > 1)::BIGINT AS n_straddling,
         |  ((1000 * COUNT(*) FILTER (WHERE nsp > 1)) // COUNT(*))::BIGINT
         |    AS straddle_permille
         |FROM (
         |  SELECT user_id, COUNT(DISTINCT CASE
         |      WHEN (${OracleSql.md5Long60(expr)} % 100) < 80
         |      THEN 'train' ELSE 'test' END) AS nsp
         |  FROM events GROUP BY 1)""".stripMargin
    audit("event_hash", "event_id::VARCHAR") + "\nUNION ALL\n" +
      audit("user_hash", "user_id::VARCHAR") + "\nORDER BY strategy"
  }

  /** q144: A/B experiment readout with A/A CALIBRATION — the
    * experimentation surface over event data: deterministic hash
    * assignment of users to arms (md5 % 2 — the same property that
    * makes q38's splits reproducible makes exposure assignment
    * consistent across sessions), per-arm engagement metrics, and a
    * q143-style Poisson-bootstrap band on the per-user mean. Because
    * the arms here differ ONLY by the hash (an A/A experiment), the
    * two bands MUST overlap — the spec asserts it — which calibrates
    * the readout machinery itself: a pipeline whose A/A shows
    * "significance" has a bug, and this query is the standing check.
    *
    * Scale shape: per-user rollup (one shuffle), then the 32× replica
    * explode collapses into an (arm × 32) aggregate; nothing
    * corpus-sized crosses twice.
    */
  def q144AbReadout(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val perUser = t.events.groupBy("user_id")
      .agg(count(lit(1)).as("n_ev"))
      .withColumn("arm", pmod(md5Long60(col("user_id").cast("string")), lit(2L)))
      .localCheckpoint(false)
    val boot = perUser
      .select(col("user_id"), col("arm"), col("n_ev"),
        explode(sequence(lit(0), lit(31))).as("b"))
      .withColumn("u", pmod(md5Long60(concat(col("b").cast("string"),
        lit("_"), col("user_id").cast("string"))), lit(1000L)))
      .withColumn("w", when(col("u") < 368, 0L).when(col("u") < 736, 1L)
        .when(col("u") < 920, 2L).otherwise(3L))
      .groupBy("arm", "b")
      .agg(expr("(1000 * sum(w * n_ev)) div greatest(sum(w), 1)").as("rep_mean"))
      .groupBy("arm")
      .agg(min("rep_mean").as("boot_lo"), max("rep_mean").as("boot_hi"))
    perUser.groupBy("arm")
      .agg(count(lit(1)).as("n_users"), sum("n_ev").as("n_events"),
        expr("(1000 * sum(n_ev)) div count(1)").as("mean_events_milli"))
      .join(boot, Seq("arm"))
      .orderBy("arm")
  }

  val q144Sql: String = {
    val arm = s"(${OracleSql.md5Long60("user_id::VARCHAR")} % 2)"
    val u = s"(${OracleSql.md5Long60("b::VARCHAR || '_' || user_id::VARCHAR")} % 1000)"
    s"""WITH per_user AS (
       |  SELECT user_id, $arm AS arm, COUNT(*)::BIGINT AS n_ev
       |  FROM events GROUP BY 1, 2),
       |reps AS (
       |  SELECT arm, b,
       |    CASE WHEN $u < 368 THEN 0 WHEN $u < 736 THEN 1
       |         WHEN $u < 920 THEN 2 ELSE 3 END AS w, n_ev
       |  FROM per_user, (SELECT unnest(generate_series(0, 31)) AS b)),
       |per_rep AS (
       |  SELECT arm, b,
       |    ((1000 * SUM(w * n_ev)) // greatest(SUM(w), 1))::BIGINT AS rep_mean
       |  FROM reps GROUP BY 1, 2),
       |boot AS (
       |  SELECT arm, MIN(rep_mean) AS boot_lo, MAX(rep_mean) AS boot_hi
       |  FROM per_rep GROUP BY 1),
       |point AS (
       |  SELECT arm, COUNT(*)::BIGINT AS n_users, SUM(n_ev)::BIGINT AS n_events,
       |    ((1000 * SUM(n_ev)) // COUNT(*))::BIGINT AS mean_events_milli
       |  FROM per_user GROUP BY 1)
       |SELECT p.arm, p.n_users, p.n_events, p.mean_events_milli,
       |  b.boot_lo, b.boot_hi
       |FROM point p JOIN boot b USING (arm) ORDER BY p.arm""".stripMargin
  }

  /** q143: one-pass Poisson BOOTSTRAP — the industrial way to put a
    * confidence interval on a corpus statistic without resampling
    * passes (Chamandy et al., Google): each row joins every replica
    * with a deterministic Poisson(1)-approximate weight (md5 coin
    * against the cumulative pmf thresholds 368/736/920 per mille →
    * w ∈ {0,1,2,3}), so all 32 resampled means fall out of ONE
    * map-side-combined aggregate. Here the statistic is per-language
    * mean document length; the replica min/max spread is the
    * uncertainty band that tells you whether two languages' means
    * actually differ or you just don't have enough documents.
    * Integer weighted means (div) keep every replica hash-exact.
    *
    * Scale shape: a 32× row explode that collapses immediately into
    * the partial aggregate — (langs × 32) rows cross the shuffle, not
    * the corpus; no second pass, no driver-side resampling.
    */
  def q143BootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val perReplica = t.documents
      .select(col("doc_id"), col("lang"), col("n_chars"),
        explode(sequence(lit(0), lit(31))).as("b"))
      .withColumn("u", pmod(md5Long60(concat(col("b").cast("string"),
        lit("_"), col("doc_id").cast("string"))), lit(1000L)))
      .withColumn("w", when(col("u") < 368, 0L).when(col("u") < 736, 1L)
        .when(col("u") < 920, 2L).otherwise(3L))
      .groupBy("lang", "b")
      .agg(expr("sum(w * n_chars) div greatest(sum(w), 1)").as("rep_mean"))
    val boot = perReplica.groupBy("lang")
      .agg(min("rep_mean").as("boot_lo"), max("rep_mean").as("boot_hi"))
    t.documents.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(n_chars) div count(1)").as("mean_chars"))
      .join(boot, Seq("lang"))
      .withColumn("spread", col("boot_hi") - col("boot_lo"))
      .orderBy("lang")
  }

  val q143Sql: String = {
    val u = s"(${OracleSql.md5Long60("b::VARCHAR || '_' || doc_id::VARCHAR")} % 1000)"
    s"""WITH reps AS (
       |  SELECT lang, n_chars, b,
       |    CASE WHEN $u < 368 THEN 0 WHEN $u < 736 THEN 1
       |         WHEN $u < 920 THEN 2 ELSE 3 END AS w
       |  FROM documents, (SELECT unnest(generate_series(0, 31)) AS b)),
       |per_rep AS (
       |  SELECT lang, b,
       |    (SUM(w * n_chars) // greatest(SUM(w), 1))::BIGINT AS rep_mean
       |  FROM reps GROUP BY 1, 2),
       |boot AS (
       |  SELECT lang, MIN(rep_mean) AS boot_lo, MAX(rep_mean) AS boot_hi
       |  FROM per_rep GROUP BY 1),
       |point AS (
       |  SELECT lang, COUNT(*)::BIGINT AS n_docs,
       |    (SUM(n_chars) // COUNT(*))::BIGINT AS mean_chars
       |  FROM documents GROUP BY 1)
       |SELECT p.lang, p.n_docs, p.mean_chars, b.boot_lo, b.boot_hi,
       |  (b.boot_hi - b.boot_lo)::BIGINT AS spread
       |FROM point p JOIN boot b USING (lang) ORDER BY p.lang""".stripMargin
  }

  /** q142: UniMax-style budget allocation (water-filling) — the
    * multilingual mixing rule (Chung et al. 2023): given a total
    * document budget, give every language an equal share EXCEPT that
    * no language is asked for more than it has; the surplus of small
    * languages redistributes to the rest. Mathematically: the water
    * level L* with Σ min(n_i, L*) = B. Computed in closed form over
    * the sorted per-language counts: ascending by n, the breakpoint
    * is the FIRST language whose count exceeds its candidate level
    * (B − prefix) div (langs remaining); everything below it is taken
    * whole, everything above is capped at the breakpoint's level. All
    * integer divisions — the allocation is hash-exact and reproducible.
    *
    * Scale shape: the corpus reduces to one |langs|-row aggregate;
    * the waterfall itself is two windows + a broadcast scalar over
    * those few rows. (This is the answer to "how do I pick per-domain
    * caps" that q55's fixed stratified cap hard-codes.)
    */
  def q142UnimaxAllocation(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val counts = t.documents.groupBy("lang").agg(count(lit(1)).as("n"))
    val budget = t.documents.agg(expr("(count(1) * 2) div 5").as("budget"),
      count(lit(1)).as("n_total"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("n"), col("lang"))
    val leveled = counts.crossJoin(broadcast(budget))
      .withColumn("j", row_number().over(w).cast("long"))
      .withColumn("k", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("prefix",
        coalesce(sum("n").over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("candidate", expr("(budget - prefix) div (k - j + 1)"))
      .withColumn("exceeds", col("n") > col("candidate"))
    // the level is the candidate at the FIRST breakpoint in ascending
    // order (later rows' candidates are meaningless — their prefixes
    // assume smaller langs were taken whole, which stops at j*)
    val level = leveled.filter(col("exceeds"))
      .agg(min(struct(col("j"), col("candidate"))).getField("candidate")
        .as("water_level"))
    leveled.crossJoin(broadcast(level))
      .withColumn("alloc", when(col("water_level").isNull, col("n"))
        .otherwise(least(col("n"), col("water_level"))))
      .withColumn("share_before", expr("(1000 * n) div n_total"))
      .withColumn("share_after", expr("(1000 * alloc) div budget"))
      .select("lang", "n", "alloc", "share_before", "share_after")
      .orderBy("lang")
  }

  val q142Sql: String =
    """WITH counts AS (SELECT lang, COUNT(*)::BIGINT AS n FROM documents GROUP BY 1),
      |b AS (SELECT (COUNT(*) * 2 // 5)::BIGINT AS budget,
      |        COUNT(*)::BIGINT AS n_total FROM documents),
      |lv AS (
      |  SELECT lang, n, budget, n_total,
      |    ROW_NUMBER() OVER (ORDER BY n, lang) AS j,
      |    COUNT(*) OVER () AS k,
      |    COALESCE(SUM(n) OVER (ORDER BY n, lang
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
      |  FROM counts, b),
      |cand AS (
      |  SELECT *, (budget - prefix) // (k - j + 1) AS candidate FROM lv),
      |level AS (
      |  SELECT MAX(CASE WHEN rn = 1 THEN candidate END) AS water_level
      |  FROM (SELECT candidate, ROW_NUMBER() OVER (ORDER BY j) AS rn
      |        FROM cand WHERE n > candidate))
      |SELECT lang, n,
      |  CASE WHEN water_level IS NULL THEN n
      |       ELSE least(n, water_level) END::BIGINT AS alloc,
      |  ((1000 * n) // n_total)::BIGINT AS share_before,
      |  ((1000 * (CASE WHEN water_level IS NULL THEN n
      |                 ELSE least(n, water_level) END)) // budget)::BIGINT
      |    AS share_after
      |FROM cand, level ORDER BY lang""".stripMargin

  /** q137: cross-source score CALIBRATION — scores from different
    * scorers/corpora are not comparable (a 0.6 from a clean-web
    * scraper ≠ a 0.6 from OCR'd scans), so a single global threshold
    * silently skews the training mix toward whichever source's score
    * distribution sits higher. The standard fix is rank normalization
    * within source before thresholding. Both selections are reported
    * side by side: `n_raw_selected` (absolute score ≥ 0.55 — varies
    * wildly per source) vs `n_cal_selected` (within-source per-mille
    * rank ≥ 500 — half of every source by construction). The per-mille
    * rank is pure integer arithmetic ((rk−1)·1000 div (n−1)), never a
    * float percent_rank, so the cut is hash-exact.
    *
    * Scale shape (r9): the within-source rank rides the grouped
    * distributed scan ([[ScanOps.runningSums]] of `lit(1L)` — rank ==
    * row number here because (score, doc_id) is a total order), NOT a
    * `Window.partitionBy("source")`: with a handful of sources that
    * window funnels corpus/|sources| rows through each task at
    * 100 TB. Per-source counts come from a |sources|-row aggregate
    * broadcast back onto the ranked frame.
    */
  def q137ScoreCalibrate(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // one scoring pass (q197's discipline): the scan machinery and the
    // per-source counts both read `scored`; qualityScore per document
    // is the dominant cost and the single-split scan would otherwise
    // run it twice, one task each
    val scored = ScanOps.fanOutSmallScan(
      t.documents.select(col("doc_id"), col("source"), col("text")))
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("score"))
      .localCheckpoint(false)
    val ranked = ScanOps.runningSums(scored, Seq("source"),
      Seq(col("score").asc, col("doc_id").asc), Seq((lit(1L), "rk")))
    val counts = scored.groupBy("source").agg(count(lit(1)).as("cnt"))
    ScanOps.joinKeysNullSafe(ranked, counts, Seq("source"),
        broadcastRight = true)
      .withColumn("pm", expr("((rk - 1) * 1000) div greatest(cnt - 1, 1)"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("score") >= 0.55d, 1)).as("n_raw_selected"),
        count(when(col("pm") >= 500, 1)).as("n_cal_selected"))
      .orderBy("source")
  }

  val q137Sql: String = {
    val score = OracleSql.qualityScore("text")
    s"""WITH scored AS (
       |  SELECT doc_id, source, $score AS score FROM documents),
       |rk AS (
       |  SELECT source, score,
       |    RANK() OVER (PARTITION BY source ORDER BY score, doc_id) AS rk,
       |    COUNT(*) OVER (PARTITION BY source) AS cnt
       |  FROM scored)
       |SELECT source, COUNT(*)::BIGINT AS n_docs,
       |  COUNT(*) FILTER (WHERE score >= 0.55)::BIGINT AS n_raw_selected,
       |  COUNT(*) FILTER (WHERE ((rk - 1) * 1000) // greatest(cnt - 1, 1) >= 500)::BIGINT
       |    AS n_cal_selected
       |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q129: BLOOM-prefiltered decontamination — q111's 100 TB scale
    * path. q111 probes every corpus gram against a broadcast of the
    * raw benchmark gram set; at production benchmark sizes the thing
    * you broadcast instead is a Bloom bitmap (fixed m bits no matter
    * how the benchmark grows), and the exact verify join runs ONLY
    * over the grams the bloom flags. Deterministic k=3 bloom:
    * bit_i(g) = md5Long60("i_" || g) mod 65536, candidate ⟺ all
    * three bits set. The oracle computes exact hits over ALL grams
    * while the engine exact-verifies only candidates — their equality
    * IS the bloom's no-false-negative guarantee, gated per round.
    * False positives are first-class output (per-source FP-gram
    * counts), so the m-vs-benchmark-size trade is measured, not
    * assumed: the report tells you when the bitmap saturates and m
    * must grow.
    *
    * Scale shape: benchmark side reduces to ≤ m distinct set-bit rows
    * (broadcast); corpus side is one scan + one explode; the bloom
    * probe is a broadcast join grouped back per gram; the exact
    * verify touches candidates only.
    */
  def q129BloomDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val m = 65536L
    val t = Tables(spark, dir)
    val bucket = pmod(md5Long60(col("doc_id").cast("string")), lit(100L))
    val tagged = t.documents
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.wordShingles(col("text"), 8).as("grams"),
        when(bucket < 80, "train").when(bucket < 90, "val")
          .otherwise("test").as("split"))
    val evalGrams = tagged.filter(col("split") === "test")
      .select(explode(col("grams")).as("gram")).distinct()
    def bits(g: org.apache.spark.sql.Column) = array((0 to 2).map(i =>
      pmod(md5Long60(concat(lit(s"${i}_"), g)), lit(m))): _*)
    val setBits = evalGrams.select(explode(bits(col("gram"))).as("p")).distinct()
    val corpus = tagged.filter(col("split") === "train")
      .select(col("doc_id"), col("source"),
        size(col("grams")).cast("long").as("n_grams"),
        explode(col("grams")).as("gram"))
    // phase 1 — bloom probe: each of the 3 positions matches setBits at
    // most once (setBits is distinct), so count == 3 ⟺ all bits set
    val candidates = corpus
      .select(col("doc_id"), col("gram"), explode(bits(col("gram"))).as("pp"))
      .join(broadcast(setBits), col("pp") === col("p"))
      .groupBy("doc_id", "gram")
      .agg(count(lit(1)).as("n_set"))
      .filter(col("n_set") === 3)
    // phase 2 — exact verify, candidates only
    val exact = candidates.join(broadcast(evalGrams), Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_exact"))
    val cand = candidates.groupBy("doc_id").agg(count(lit(1)).as("n_cand"))
    tagged.filter(col("split") === "train")
      .select(col("doc_id"), col("source"),
        size(col("grams")).cast("long").as("n_grams"))
      .join(cand, Seq("doc_id"), "left")
      .join(exact, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_cand", "n_exact"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_grams").as("n_grams"),
        sum("n_cand").as("n_candidate_grams"),
        sum("n_exact").as("n_exact_grams"),
        (sum("n_cand") - sum("n_exact")).as("n_false_positive_grams"),
        count(when(col("n_cand") > 0, 1)).as("n_flagged_docs"),
        count(when(col("n_exact") > 0, 1)).as("n_contaminated_docs"))
      .orderBy("source")
  }

  val q129Sql: String = {
    val bucket = s"(${OracleSql.md5Long60("doc_id::VARCHAR")} % 100)"
    val grams = OracleSql.wordShingles(OracleSql.tokens("text"), 8)
    def h(i: Int, g: String) =
      s"(${OracleSql.md5Long60(s"'${i}_' || $g")} % 65536)"
    s"""WITH tagged AS (
       |  SELECT doc_id, source, $grams AS grams,
       |    CASE WHEN $bucket < 80 THEN 'train'
       |         WHEN $bucket < 90 THEN 'val' ELSE 'test' END AS split
       |  FROM documents),
       |eval_grams AS (
       |  SELECT DISTINCT unnest(grams) AS gram FROM tagged WHERE split = 'test'),
       |set_bits AS (
       |  SELECT DISTINCT unnest([${h(0, "gram")}, ${h(1, "gram")}, ${h(2, "gram")}]) AS p
       |  FROM eval_grams),
       |corpus AS (
       |  SELECT doc_id, source, len(grams)::BIGINT AS n_grams, unnest(grams) AS gram
       |  FROM tagged WHERE split = 'train'),
       |cand AS (
       |  SELECT doc_id, gram FROM (
       |    SELECT c.doc_id, c.gram, COUNT(*) AS n_set
       |    FROM (SELECT doc_id, gram,
       |            unnest([${h(0, "gram")}, ${h(1, "gram")}, ${h(2, "gram")}]) AS pp
       |          FROM corpus) c
       |    JOIN set_bits s ON c.pp = s.p
       |    GROUP BY 1, 2)
       |  WHERE n_set = 3),
       |exact AS (
       |  SELECT c.doc_id, COUNT(*) AS n_exact
       |  FROM corpus c JOIN eval_grams e USING (gram) GROUP BY 1),
       |cd AS (SELECT doc_id, COUNT(*) AS n_cand FROM cand GROUP BY 1),
       |per_doc AS (
       |  SELECT doc_id, source, MAX(n_grams) AS n_grams FROM corpus GROUP BY 1, 2)
       |SELECT p.source, COUNT(*)::BIGINT AS n_docs, SUM(p.n_grams)::BIGINT AS n_grams,
       |  SUM(COALESCE(c.n_cand, 0))::BIGINT AS n_candidate_grams,
       |  SUM(COALESCE(e.n_exact, 0))::BIGINT AS n_exact_grams,
       |  (SUM(COALESCE(c.n_cand, 0)) - SUM(COALESCE(e.n_exact, 0)))::BIGINT
       |    AS n_false_positive_grams,
       |  COUNT(*) FILTER (WHERE COALESCE(c.n_cand, 0) > 0)::BIGINT AS n_flagged_docs,
       |  COUNT(*) FILTER (WHERE COALESCE(e.n_exact, 0) > 0)::BIGINT AS n_contaminated_docs
       |FROM per_doc p LEFT JOIN cd c USING (doc_id) LEFT JOIN exact e USING (doc_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q117: DSIR-style importance weighting (Xie et al. 2023 — Data
    * Selection via Importance Resampling): score every document by
    * log p_target(x) − log p_raw(x) under two hashed bag-of-ngram
    * models, where the TARGET model is fit on the trusted slice (here:
    * the English documents, standing in for "looks like Wikipedia")
    * and the RAW model on the whole corpus. High scorers are the raw
    * documents that look most like the target — the principled
    * replacement for a binary quality classifier when composing a
    * training mix. Features are word unigrams + bigrams hashed into
    * 1024 buckets (occurrences, not distinct — DSIR is a
    * multinomial); per-feature log-ratio uses add-one smoothing and
    * the integer frequency-class proxy
    * `bitlen((c_t+1)·(R+B)) − bitlen((c_r+1)·(T+B))` ≈
    * ⌈log2 ratio⌉ (the q89/q107/q110 trick — libm drifts across
    * engines, bit length is exact), summed per document. Top-100 by
    * score = the resampled selection.
    *
    * Scale shape: feature derivation is ROW-LOCAL (tokens + one
    * transform for bigrams, hash after one explode); BOTH models are
    * ≤1024 rows no matter the corpus size → BROADCAST joins (the
    * whole point of hashed DSIR: the model is O(B), not O(vocab));
    * per-doc scores ride one groupBy(doc_id) exchange with map-side
    * combine, and the top-100 is a TakeOrderedAndProject.
    */
  def q117DsirWeights(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    val bkts = 1024L
    val t = Tables(spark, dir)
    val tokenized = t.documents.select(col("doc_id"), col("lang"),
      graft.functions.TextFunctions.tokens(col("text")).as("tk"))
    val tk = col("tk")
    // bigrams from the materialized token array: a native
    // graft_word_grams(text) was A/B'd here (r14) and lost — it
    // re-tokenizes internally, and with the unigram leg also needing
    // `tk`, the double split cost more than the lambda frames saved
    val bigrams: Column = when(size(tk) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(tk) - 1), i =>
        concat_ws(" ", element_at(tk, i), element_at(tk, i + 1))))
    // ONE materialization of the hashed features: md5 over every
    // occurrence is the dominant cost, and both the model pass and the
    // scoring pass consume the identical rows — the lazy localCheckpoint
    // computes them once (the q93 one-union-job pattern). Both model
    // counts ride a single aggregate (a conditional count, not a second
    // pass), and the totals reduce the 1024-row model, never the corpus.
    val feats = tokenized
      .select(col("doc_id"), col("lang"),
        explode(concat(tk, bigrams)).as("f"))
      .select(col("doc_id"), col("lang"),
        pmod(md5Long60(col("f")), lit(bkts)).as("b"))
      .localCheckpoint(false)
    val model = feats.groupBy("b")
      .agg(count(lit(1)).as("c_r"),
        count(when(col("lang") === "en", 1)).as("c_t"))
      .localCheckpoint(false)
    val totals = model.agg(sum("c_r").as("r_tot"), sum("c_t").as("t_tot"))
    feats.join(broadcast(model), Seq("b"))
      .crossJoin(broadcast(totals))
      .withColumn("cls",
        (length(bin((col("c_t") + 1) * (col("r_tot") + bkts))) -
          length(bin((col("c_r") + 1) * (col("t_tot") + bkts)))).cast("long"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_feats"), sum("cls").as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(100)
  }

  val q117Sql: String = {
    val bkts = 1024
    val h = OracleSql.md5Long60("f")
    s"""WITH toks AS (
       |  SELECT doc_id, lang, ${OracleSql.tokens("text")} AS tk FROM documents),
       |feats AS (
       |  SELECT doc_id, lang, ($h % $bkts) AS b
       |  FROM (
       |    SELECT doc_id, lang, UNNEST(list_concat(tk,
       |      list_transform(generate_series(1, len(tk) - 1),
       |        i -> tk[i] || ' ' || tk[i + 1]))) AS f
       |    FROM toks)),
       |raw_cnt AS (SELECT b, COUNT(*)::BIGINT AS c_r FROM feats GROUP BY b),
       |tgt_cnt AS (SELECT b, COUNT(*)::BIGINT AS c_t FROM feats
       |            WHERE lang = 'en' GROUP BY b),
       |totals AS (
       |  SELECT (SELECT SUM(c_r) FROM raw_cnt)::BIGINT AS r_tot,
       |         (SELECT SUM(c_t) FROM tgt_cnt)::BIGINT AS t_tot),
       |model AS (
       |  SELECT r.b, r.c_r, COALESCE(t.c_t, 0) AS c_t
       |  FROM raw_cnt r LEFT JOIN tgt_cnt t USING (b))
       |SELECT f.doc_id, f.lang, COUNT(*)::BIGINT AS n_feats,
       |  SUM(len(bin((m.c_t + 1) * (x.r_tot + $bkts))) -
       |      len(bin((m.c_r + 1) * (x.t_tot + $bkts))))::BIGINT AS score
       |FROM feats f JOIN model m USING (b), totals x
       |GROUP BY f.doc_id, f.lang
       |ORDER BY score DESC, doc_id LIMIT 100""".stripMargin
  }

  /** q173: CURRICULUM interleaving schedule — the deterministic
    * epoch-ordering operator for difficulty-staged training: documents
    * split into 4 difficulty tiers (n_chars as the integer-exact
    * difficulty proxy; a q89 perplexity score is the production
    * drop-in), shuffled WITHIN each tier by a hash coin (reproducible,
    * seed = the id itself), then round-robin interleaved so every
    * training window sees all tiers at the tier's global mix rate —
    * the anti-pattern this kills is a length-sorted epoch where the
    * model sees only short docs for hours. position ≡ tier (mod 4) by
    * construction, so the schedule is collision-free without any
    * coordination. Output = the first 48 schedule slots.
    *
    * Scale shape (r8, de-globalized): the exact global rank is TWO-
    * LEVEL — a per-length base off the length HISTOGRAM (value-domain-
    * sized: ~523 distinct lengths at sf0.1; the only unpartitioned
    * window sorts that bounded frame) plus a within-length rank
    * (partitioned by n_chars), summing to the identical rn0 the old
    * corpus-wide rank window produced by sorting every row on one
    * task. The within-tier shuffle only ever NEEDS the first 12 rows
    * per tier (pos < 48 ⟺ rank ≤ 12 for 4 tiers), so it runs on the
    * TopKPerKey operator (per-task 12-row heaps, partial → final) —
    * the old tier-partitioned window pushed corpus/4 rows through
    * each of 4 tasks. Nothing corpus-sized crosses a single partition
    * at any step.
    */
  def q173CurriculumSchedule(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val n = t.documents.agg(count(lit(1)).as("n_total"))
    val docs = t.documents.select("doc_id", "n_chars")
    val base = docs.groupBy("n_chars").agg(count(lit(1)).as("bc"))
      .withColumn("base", sum("bc").over(
        Window.orderBy("n_chars").rowsBetween(
          Window.unboundedPreceding, Window.currentRow)) - col("bc"))
      .select("n_chars", "base")
    val tiered = docs
      .withColumn("rin", row_number().over(
        Window.partitionBy("n_chars").orderBy("doc_id")).cast("long"))
      .join(broadcast(base), Seq("n_chars"))
      .crossJoin(broadcast(n))
      .withColumn("rn0", col("base") + col("rin") - 1L)
      .withColumn("tier", expr("(4 * rn0) div n_total"))
      .withColumn("coin", md5Long60(col("doc_id").cast("string")))
      .select("tier", "coin", "doc_id", "n_chars")
    graft.plans.TopKPerKey(tiered, Seq("tier"),
        Seq(asc("coin"), asc("doc_id")), 12)
      .withColumn("rt", col("rank").cast("long"))
      .withColumn("pos", (col("rt") - 1L) * 4L + col("tier"))
      .filter(col("pos") < 48L)
      .select("pos", "tier", "doc_id", "n_chars")
      .orderBy("pos")
  }

  val q173Sql: String = {
    val coin = OracleSql.md5Long60("doc_id::VARCHAR")
    s"""WITH n AS (SELECT COUNT(*)::BIGINT AS n_total FROM documents),
       |tiered AS (
       |  SELECT doc_id, n_chars,
       |    (4 * (ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1))
       |      // n_total AS tier,
       |    $coin AS coin
       |  FROM documents, n),
       |sched AS (
       |  SELECT doc_id, n_chars, tier,
       |    (ROW_NUMBER() OVER (PARTITION BY tier ORDER BY coin, doc_id) - 1)
       |      * 4 + tier AS pos
       |  FROM tiered)
       |SELECT pos::BIGINT AS pos, tier::BIGINT AS tier, doc_id, n_chars
       |FROM sched WHERE pos < 48 ORDER BY pos""".stripMargin
  }

  /** q178: NEYMAN optimal allocation — how a 10k-document eval/audit
    * budget should split across language strata: proportional
    * allocation (∝ N_h) oversamples homogeneous strata; Neyman
    * (∝ N_h·S_h) puts samples where the VARIANCE is, minimizing the
    * estimator variance at fixed budget — the survey-sampling design
    * rule behind every stratified eval set. Variance is the exact
    * integer population formula ((n·Σx² − (Σx)²) div n²) and the
    * standard deviation its floor-sqrt — IEEE sqrt is correctly
    * rounded, so both engines floor the same double and every
    * allocation is hash-exact. Both allocations reported side by
    * side; the divergence column ranks strata where the naive design
    * is most wrong.
    *
    * Scale shape: one pre-combined aggregate to |strata| rows of
    * (n, Σx, Σx²) mergeable moments (q95's algebra); everything after
    * runs on that tiny frame. n·Σx² must fit int64 — ~10⁹ docs of
    * 10⁴ chars per stratum (decimal swap documented past that).
    */
  /** q178/q185's shared eval-budget: q185's per-stratum heap k MUST
    * bound every Neyman quota, which holds exactly because both read
    * THIS constant (neyman_n = budget·w div Σw ≤ budget) — a drifted
    * pair would silently truncate strata (ADVICE r10).
    */
  private[operators] val EvalBudget = 10000L

  def q178NeymanAllocation(spark: SparkSession, dir: String): DataFrame = {
    val budget = EvalBudget
    val t = Tables(spark, dir)
    val strata = t.documents.groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("sx"),
        sum(expr("n_chars * n_chars")).as("sxx"))
      .withColumn("sd_chars",
        floor(sqrt(expr("(n * sxx - sx * sx) div (n * n)").cast("double")))
          .cast("long"))
      .withColumn("weight", expr("n * sd_chars"))
    strata
      .withColumn("tot_w", sum("weight").over(Window.partitionBy()))
      .withColumn("tot_n", sum("n").over(Window.partitionBy()))
      .select(col("lang"), col("n").as("n_docs"), col("sd_chars"),
        expr(s"($budget * weight) div tot_w").as("neyman_n"),
        expr(s"($budget * n) div tot_n").as("proportional_n"))
      .withColumn("divergence_x1000", expr(
        "(1000 * neyman_n) div greatest(proportional_n, 1)"))
      .orderBy("lang")
  }

  val q178Sql: String =
    s"""WITH strata AS (
      |  SELECT lang, COUNT(*)::BIGINT AS n, SUM(n_chars)::BIGINT AS sx,
      |    SUM(n_chars * n_chars)::BIGINT AS sxx
      |  FROM documents GROUP BY lang),
      |sd AS (
      |  SELECT lang, n,
      |    floor(sqrt(((n * sxx - sx * sx) // (n * n))::DOUBLE))::BIGINT
      |      AS sd_chars
      |  FROM strata),
      |w AS (
      |  SELECT *, n * sd_chars AS weight,
      |    SUM(n * sd_chars) OVER () AS tot_w, SUM(n) OVER () AS tot_n
      |  FROM sd)
      |SELECT lang, n AS n_docs, sd_chars,
      |  (($EvalBudget * weight) // tot_w)::BIGINT AS neyman_n,
      |  (($EvalBudget * n) // tot_n)::BIGINT AS proportional_n,
      |  ((1000 * (($EvalBudget * weight) // tot_w))
      |    // greatest(($EvalBudget * n) // tot_n, 1))::BIGINT AS divergence_x1000
      |FROM w ORDER BY lang""".stripMargin

  /** q185: quota-sample EXECUTION — q178's allocation turned into an
    * actual deterministic sample: within each language stratum, take
    * the Neyman quota's top-n_h documents by hash coin (seed = the id
    * itself — the same reproducible-shuffle rule as q38/q173). The
    * output ledger proves the draw: per stratum, the target, the
    * achieved count (≡ target unless the stratum is exhausted) and an
    * order-independent XOR fingerprint of the sampled ids (q93's
    * reconciliation trick), so two runs — or two engines — can attest
    * they drew the SAME sample without shipping id lists.
    *
    * Scale shape (r10): the per-stratum draw is a TopKPerKey HEAP with
    * k = the total budget (every quota ≤ budget by construction —
    * neyman_n = budget·w div Σw), so only budget-many rows per stratum
    * ever cross the wire; the rank window rides the heap's bounded
    * output, never the corpus (the previous form ranked ALL documents
    * per language — corpus/|langs| rows through one window task, the
    * exact low-cardinality class the universal plan guard bans; found
    * by that guard in r10). q178's tiny allocation frame broadcasts on;
    * the fingerprint aggregates map-side. As a composition it runs
    * q178 as a subquery — operators are DataFrames, so reuse is free.
    */
  def q185QuotaSample(spark: SparkSession, dir: String): DataFrame = {
    val budget = EvalBudget.toInt // the SHARED constant: heap k ≥ max quota
    val t = Tables(spark, dir)
    val quota = q178NeymanAllocation(spark, dir)
      .select(col("lang"), col("neyman_n"))
    val coins = t.documents.select(col("lang"), col("doc_id"))
      .withColumn("coin", md5Long60(col("doc_id").cast("string")))
    val w = Window.partitionBy("lang")
      .orderBy(col("coin"), col("doc_id"))
    graft.plans.TopKPerKey(coins, Seq("lang"),
      Seq(col("coin").asc, col("doc_id").asc), budget)
      .withColumn("rn", row_number().over(w).cast("long"))
      .join(broadcast(quota), Seq("lang"))
      .filter(col("rn") <= col("neyman_n"))
      .groupBy("lang")
      .agg(max("neyman_n").as("n_target"),
        count(lit(1)).as("n_sampled"),
        expr("bit_xor(coin)").as("sample_fingerprint"))
      .orderBy("lang")
  }

  val q185Sql: String = {
    val coin = OracleSql.md5Long60("doc_id::VARCHAR")
    val quota = q178Sql.replace("ORDER BY lang", "")
    s"""WITH quota AS (
       |  SELECT lang, neyman_n FROM ($quota)),
       |ranked AS (
       |  SELECT lang, doc_id, $coin AS coin,
       |    ROW_NUMBER() OVER (PARTITION BY lang
       |      ORDER BY $coin, doc_id) AS rn
       |  FROM documents)
       |SELECT r.lang, MAX(q.neyman_n)::BIGINT AS n_target,
       |  COUNT(*)::BIGINT AS n_sampled,
       |  bit_xor(r.coin)::BIGINT AS sample_fingerprint
       |FROM ranked r JOIN quota q ON r.lang = q.lang
       |WHERE r.rn <= q.neyman_n
       |GROUP BY r.lang ORDER BY r.lang""".stripMargin
  }

  /** q189: group-aware K-FOLD assignment + balance audit — q163
    * measured WHY event-level splits leak (users straddle); this is
    * the fix executed and then audited: 5 folds by user hash (every
    * user's events land in exactly one fold — GroupKFold), with the
    * balance ledger hash splitting actually needs reviewed: user and
    * event shares per fold and the worst deviation from the 200‰
    * design point (hash imbalance at small group counts is real, and
    * a fold that drifted heavy silently skews every CV estimate).
    *
    * Scale shape: one per-user aggregate (shuffle on user_id), one
    * 5-row fold rollup; windows ride the fold frame.
    */
  def q189KfoldAudit(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val perUser = t.events.select(col("user_id"))
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
      .withColumn("fold",
        pmod(md5Long60(col("user_id").cast("string")), lit(5L)))
    perUser.groupBy("fold")
      .agg(count(lit(1)).as("n_users"), sum("n_events").as("n_events"))
      .withColumn("user_share_permille",
        expr("(1000 * n_users) div sum(n_users) over ()"))
      .withColumn("event_share_permille",
        expr("(1000 * n_events) div sum(n_events) over ()"))
      .withColumn("worst_deviation_permille", max(greatest(
        abs(col("user_share_permille") - 200L),
        abs(col("event_share_permille") - 200L)))
        .over(Window.partitionBy()))
      .select("fold", "n_users", "n_events", "user_share_permille",
        "event_share_permille", "worst_deviation_permille")
      .orderBy("fold")
  }

  val q189Sql: String = {
    val coin = OracleSql.md5Long60("user_id::VARCHAR")
    s"""WITH per_user AS (
       |  SELECT user_id, COUNT(*)::BIGINT AS n_events,
       |    ($coin % 5) AS fold
       |  FROM events GROUP BY user_id),
       |folds AS (
       |  SELECT fold, COUNT(*)::BIGINT AS n_users,
       |    SUM(n_events)::BIGINT AS n_events
       |  FROM per_user GROUP BY fold),
       |shares AS (
       |  SELECT fold, n_users, n_events,
       |    ((1000 * n_users) // SUM(n_users) OVER ())::BIGINT
       |      AS user_share_permille,
       |    ((1000 * n_events) // SUM(n_events) OVER ())::BIGINT
       |      AS event_share_permille
       |  FROM folds)
       |SELECT fold, n_users, n_events, user_share_permille,
       |  event_share_permille,
       |  MAX(greatest(abs(user_share_permille - 200),
       |    abs(event_share_permille - 200))) OVER ()::BIGINT
       |    AS worst_deviation_permille
       |FROM shares ORDER BY fold""".stripMargin
  }

  /** q197: TOKEN-BUDGET selection — "the best docs that fit in a
    * 10%-of-corpus token budget", the slice-construction step between
    * scoring (q21/q55) and training. Deliberately formulated as
    * HISTOGRAM TRUNCATION, not a global quality sort: per-mille
    * quality classes aggregate once (≤ 1001 rows), the class-level
    * cumulative-token walk finds the finest class whose whole cohort
    * still fits, and the corpus-side selection is a map-only filter
    * `qclass ≥ cutoff` — because at 100 TB a rank-then-prefix
    * selection needs a corpus-wide total-order window (one partition,
    * the classic cumsum scale trap) while the histogram pays two scans
    * and a ≤ 1001-row window for a budget error bounded by one class
    * cohort. When the curve must be EXACT at every rank, q200 pays the
    * honest price via the distributed scan ([[ScanOps.runningSums]]) —
    * the trap done without the trap; THIS query remains the cheap
    * single-cutoff form. Reports per-source selection shares plus the ALL row with
    * the cutoff class and budget utilization — under-budget by design,
    * never over.
    *
    * Scale shape: scan 1 = class histogram (map-side combine to
    * ≤ 1001 rows); the cutoff is a broadcast-scalar crossJoin (no
    * driver collect); scan 2 = filtered per-source aggregate. Both
    * scans prune to (source, text) columns.
    */
  def q197BudgetSelect(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // score ONCE: both the class histogram and the selection scan read
    // the identical (source, n_tok, qclass) rows, and tokens() +
    // qualityScore() per document is this query's dominant cost — the
    // lazy checkpoint replaces the second scoring scan with a block
    // read (the narrow 3-column frame is what materializes, never the
    // text). Fanned out first: the single-split scan otherwise scores
    // the whole corpus slice in ONE task (r14).
    val scored = ScanOps.fanOutSmallScan(
      t.documents.select(col("source"), col("text")))
      .select(col("source"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n_tok"),
        floor(graft.functions.TextFunctions.qualityScore(col("text")) * 1000.0d)
          .cast("long").as("qclass"))
      .localCheckpoint(false)
    val classes = scored.groupBy("qclass").agg(sum("n_tok").as("ctoks"))
    val wAll = Window.partitionBy(lit(1))
    val wCum = Window.partitionBy(lit(1)).orderBy(desc("qclass"))
    val cut = classes
      .withColumn("budget", expr("(sum(ctoks) over ()) div 10"))
      .withColumn("cum", sum("ctoks").over(wCum))
      .filter(col("cum") <= col("budget"))
      .agg(min("qclass").as("cutoff_class"), max("budget").as("budget_tokens"))
    val sel = scored.crossJoin(broadcast(cut))
      .filter(col("qclass") >= col("cutoff_class"))
      .localCheckpoint(false)
    val perSource = sel.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sel_tokens"),
        first("cutoff_class").as("cutoff_class"),
        first("budget_tokens").as("budget_tokens"))
      .withColumn("share_permille",
        expr("(1000L * sel_tokens) div sum(sel_tokens) over ()"))
    val allRow = sel.groupBy()
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sel_tokens"),
        first("cutoff_class").as("cutoff_class"),
        first("budget_tokens").as("budget_tokens"))
      .withColumn("source", lit("ALL"))
      .withColumn("share_permille", lit(1000L))
    perSource
      .select("source", "n_docs", "sel_tokens", "share_permille",
        "cutoff_class", "budget_tokens")
      .unionByName(allRow.select("source", "n_docs", "sel_tokens",
        "share_permille", "cutoff_class", "budget_tokens"))
      .orderBy("source")
  }

  val q197Sql: String = {
    val score = OracleSql.qualityScore("text")
    val toks = OracleSql.tokens("text")
    s"""WITH scored AS (
       |  SELECT source, len($toks)::BIGINT AS n_tok,
       |    floor($score * 1000.0)::BIGINT AS qclass
       |  FROM documents),
       |classes AS (
       |  SELECT qclass, SUM(n_tok)::BIGINT AS ctoks
       |  FROM scored GROUP BY 1),
       |cum AS (
       |  SELECT qclass,
       |    SUM(ctoks) OVER ()::BIGINT // 10 AS budget,
       |    SUM(ctoks) OVER (ORDER BY qclass DESC)::BIGINT AS cumtoks
       |  FROM classes),
       |cut AS (
       |  SELECT MIN(qclass) AS cutoff_class, MAX(budget) AS budget_tokens
       |  FROM cum WHERE cumtoks <= budget),
       |sel AS (
       |  SELECT s.* , c.cutoff_class, c.budget_tokens
       |  FROM scored s CROSS JOIN cut c WHERE s.qclass >= c.cutoff_class),
       |per AS (
       |  SELECT source, COUNT(*)::BIGINT AS n_docs,
       |    SUM(n_tok)::BIGINT AS sel_tokens,
       |    ANY_VALUE(cutoff_class) AS cutoff_class,
       |    ANY_VALUE(budget_tokens) AS budget_tokens
       |  FROM sel GROUP BY 1)
       |SELECT source, n_docs, sel_tokens,
       |  ((1000 * sel_tokens) // SUM(sel_tokens) OVER ())::BIGINT
       |    AS share_permille,
       |  cutoff_class, budget_tokens
       |FROM per
       |UNION ALL
       |SELECT 'ALL', COUNT(*)::BIGINT, SUM(n_tok)::BIGINT, 1000::BIGINT,
       |  ANY_VALUE(cutoff_class), ANY_VALUE(budget_tokens)
       |FROM sel
       |ORDER BY source""".stripMargin
  }

  /** q200: quality-rank SELECTION CURVE — the exact "how many tokens
    * do I keep at every quality cutoff" curve that data-mix design
    * reads before committing a threshold: documents ranked by quality
    * class (desc, doc_id tiebreak) with the EXACT cumulative token
    * count at every rank, sampled at the 10 decile ranks. q197 is the
    * cheap single-cutoff cousin that deliberately avoids the global
    * cumsum by histogram truncation (budget error bounded by one
    * class cohort); THIS query is the exact curve — the shape q197's
    * docstring calls the classic cumsum scale trap — made scale-safe
    * by [[ScanOps.runningSums]]: range-partition the order, scan each
    * partition locally, stitch with a partition-count-sized offset
    * frame. No corpus-sized single-partition sort anywhere; the curve
    * is exact at EVERY rank, not class-truncated.
    *
    * Scale shape: one scoring scan; two corpus exchanges (range + pid
    * window — the honest price of exact global order); the decile
    * probe is a 10-row broadcast join. Output: 10 rows.
    */
  def q200SelectionCurve(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // same one-scoring-pass + fan-out discipline as q197: the scan
    // machinery and the decile-cut aggregate both read `scored`
    val scored = ScanOps.fanOutSmallScan(
      t.documents.select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long")
          .as("n_tok"),
        floor(graft.functions.TextFunctions.qualityScore(col("text")) * 1000.0d)
          .cast("long").as("qclass"))
      .localCheckpoint(false)
    val ranked = ScanOps.runningSums(scored,
      Seq(col("qclass").desc, col("doc_id").asc),
      Seq((lit(1L), "rn"), (col("n_tok"), "cum_tokens")))
    val cuts = scored.agg(count(lit(1)).as("n_total"), sum("n_tok").as("t_tok"))
      .select(explode(sequence(lit(1L), lit(10L))).as("decile"),
        col("n_total"), col("t_tok"))
      .withColumn("rank_cut", expr("(decile * n_total) div 10"))
    ranked.join(broadcast(cuts), col("rn") === col("rank_cut"))
      .select(col("decile"), col("rank_cut"),
        col("qclass").as("qclass_at_cut"), col("cum_tokens"),
        expr("(1000 * cum_tokens) div t_tok").as("token_share_permille"))
      .orderBy("decile")
  }

  val q200Sql: String = {
    val score = OracleSql.qualityScore("text")
    val toks = OracleSql.tokens("text")
    s"""WITH scored AS (
       |  SELECT doc_id, len($toks)::BIGINT AS n_tok,
       |    floor($score * 1000.0)::BIGINT AS qclass
       |  FROM documents),
       |ranked AS (
       |  SELECT qclass,
       |    ROW_NUMBER() OVER (ORDER BY qclass DESC, doc_id) AS rn,
       |    (SUM(n_tok) OVER (ORDER BY qclass DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
       |      AS cum_tokens
       |  FROM scored),
       |tot AS (SELECT COUNT(*)::BIGINT AS n_total, SUM(n_tok)::BIGINT AS t_tok
       |        FROM scored)
       |SELECT d.d::BIGINT AS decile, ((d.d * n_total) // 10)::BIGINT AS rank_cut,
       |  r.qclass AS qclass_at_cut, r.cum_tokens,
       |  ((1000 * r.cum_tokens) // t_tok)::BIGINT AS token_share_permille
       |FROM generate_series(1, 10) d(d), tot, ranked r
       |WHERE r.rn = (d.d * n_total) // 10
       |ORDER BY decile""".stripMargin
  }

  /** q201: VERBATIM-NOVELTY curve — the memorization-risk diagnostic
    * (Lee et al. 2021; Carlini et al. 2022 measure memorization
    * exactly this way): for n ∈ {4, 8, 13}, the share of the eval
    * slice's POSITIONAL n-grams that appear verbatim anywhere in
    * train. q111/q129 LIST contaminated documents at one fixed n;
    * this is the aggregate curve those thresholds are read off — low
    * novelty at large n means the eval set cannot measure
    * generalization, falling novelty release-over-release means the
    * crawl is eating its own tail. Positional (not distinct) on the
    * eval side: the metric is "how much of the eval TEXT is covered",
    * so repeated grams count each occurrence; train side dedups to
    * one (n, hash) row per distinct gram.
    *
    * Scale shape: one generate-and-explode per side (the 3 n-values
    * ride one explode — a single pass over each corpus slice), one
    * (n, hash) equi-join; the train side's distinct and the join share
    * the same key. At 100 TB the production path is [[q202NoveltyBloom]]
    * — same curve, bloom-prefiltered train probe (this exact form pins
    * the semantics; q202's seen counts must equal these, which IS the
    * bloom's no-false-negative contract). Output: 3 rows.
    */
  def q201NoveltyCurve(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val isEval = pmod(col("doc_id"), lit(10L)) === 0L
    // graft_posgrams (native, md5 streamed per gram) per n — a short
    // doc yields an empty array, so explode dropping zero rows IS the
    // size >= n filter; value-pinned against the HOF form
    def grams(docs: DataFrame): DataFrame = Seq(4, 8, 13).map { n =>
      docs.select(lit(n.toLong).as("n"),
        explode(graft.functions.TextFunctions.posGramHashes(col("text"), n))
          .as("h"))
    }.reduce(_ unionByName _)
    val train = grams(t.documents.filter(!isEval))
      .distinct().withColumn("seen", lit(true))
    grams(t.documents.filter(isEval))
      .join(train, Seq("n", "h"), "left")
      .groupBy("n")
      .agg(count(lit(1)).as("n_eval_grams"),
        count(when(col("seen"), 1)).as("n_seen_grams"))
      .withColumn("seen_permille",
        expr("(1000 * n_seen_grams) div n_eval_grams"))
      .withColumn("novel_permille", lit(1000L) - col("seen_permille"))
      .orderBy("n")
  }

  val q201Sql: String = {
    val toks = OracleSql.tokens("text")
    val h = OracleSql.md5Long60("array_to_string(ts[i+1:i+n], ' ')")
    s"""WITH toksrc AS (SELECT doc_id, $toks AS ts FROM documents),
       |expl AS (
       |  SELECT doc_id, n, ts, unnest(generate_series(0, len(ts) - n)) AS i
       |  FROM (SELECT doc_id, ts, unnest([4, 8, 13]) AS n FROM toksrc)
       |  WHERE len(ts) >= n),
       |g AS (SELECT doc_id, n::BIGINT AS n, $h AS h FROM expl),
       |train AS (SELECT DISTINCT n, h FROM g WHERE doc_id % 10 <> 0),
       |ev AS (
       |  SELECT e.n, t.h IS NOT NULL AS seen
       |  FROM (SELECT * FROM g WHERE doc_id % 10 = 0) e
       |  LEFT JOIN train t ON e.n = t.n AND e.h = t.h)
       |SELECT n, COUNT(*)::BIGINT AS n_eval_grams,
       |  COUNT(*) FILTER (WHERE seen)::BIGINT AS n_seen_grams,
       |  ((1000 * COUNT(*) FILTER (WHERE seen)) // COUNT(*))::BIGINT
       |    AS seen_permille,
       |  (1000 - (1000 * COUNT(*) FILTER (WHERE seen)) // COUNT(*))::BIGINT
       |    AS novel_permille
       |FROM ev GROUP BY n ORDER BY n""".stripMargin
  }

  /** q202: BLOOM-gated verbatim-novelty curve — q201's wired 100 TB
    * path (the q193 lesson: a scale path that is only documentation
    * rots; this one is code, oracled, and contract-gated). q201's
    * exact form shuffles EVERY distinct train gram into the (n, hash)
    * join; here the bounded side (the eval slice — at production
    * scale a fixed benchmark, KBs–GBs while train is the 100 TB
    * crawl) compiles to a per-n Bloom bitmap (k=2, m=2²⁰ bits —
    * fixed no matter how train grows) whose set-bit rows broadcast,
    * and the train probe is two broadcast SEMI-joins evaluated
    * map-side: only grams with both bits set reach the distinct and
    * the exact verify join. Bloom membership of every eval gram is by
    * construction, so NO false negative is possible — `n_seen_grams`
    * is bit-identical to q201's (the contract the oracle re-proves
    * every round, computing the same md5 bit arithmetic exactly).
    * False positives are first-class output (`n_fp_train_grams` per
    * n), q129-style: the report says when m must grow.
    *
    * Scale shape: eval side one scan → (n,h,occ) rollup (benchmark-
    * sized); set-bit frame ≤ 2·|eval grams| rows broadcast twice;
    * train side one scan, map-side bloom probe, then distinct +
    * verify join over CANDIDATES only — the train shuffle shrinks
    * from |train grams| to |matches| + |false positives|.
    * Output: 3 rows.
    */
  def q202NoveltyBloom(spark: SparkSession, dir: String): DataFrame = {
    val m = 1048576L
    val t = Tables(spark, dir)
    val isEval = pmod(col("doc_id"), lit(10L)) === 0L
    def grams(docs: DataFrame): DataFrame = Seq(4, 8, 13).map { n =>
      docs.select(lit(n.toLong).as("n"),
        explode(graft.functions.TextFunctions.posGramHashes(col("text"), n))
          .as("h"))
    }.reduce(_ unionByName _)
    def bit(i: Int) = pmod(md5Long60(concat(lit(s"${i}_"),
      col("n").cast("string"), lit("_"), col("h").cast("string"))), lit(m))
    // both mid-frames feed two consumers (eval → setBits + the verify
    // join; cand → verify + the per-n candidate rollup) and are
    // deliberately NOT checkpointed: their duplicated exchanges dedupe
    // via AQE runtime stage reuse (same finding as ScanOps.lagged,
    // PLANS.md r9), while a lazy localCheckpoint materializes through
    // the STATIC plan — measured at the sf10 ScaleGen dir it put the
    // full train gram stream on the wire (834 MB, 17× task CPU) where
    // the AQE-planned form shuffles ~nothing
    val eval = grams(t.documents.filter(isEval))
      .groupBy("n", "h").agg(count(lit(1)).as("occ"))
    val setBits = eval.select(col("n"), explode(array(bit(0), bit(1))).as("p"))
      .distinct()
    val cand = grams(t.documents.filter(!isEval))
      .withColumn("b0", bit(0)).withColumn("b1", bit(1))
      .join(broadcast(setBits.select(col("n"), col("p").as("b0"))),
        Seq("n", "b0"), "left_semi")
      .join(broadcast(setBits.select(col("n"), col("p").as("b1"))),
        Seq("n", "b1"), "left_semi")
      .select("n", "h").distinct()
    val evalRoll = eval
      .join(cand.withColumn("seen", lit(true)), Seq("n", "h"), "left")
      .groupBy("n")
      .agg(sum("occ").as("n_eval_grams"),
        sum(when(col("seen"), col("occ")).otherwise(0L)).as("n_seen_grams"),
        count(when(col("seen"), 1)).as("n_matched"))
    val candRoll = cand.groupBy("n").agg(count(lit(1)).as("n_cand_train_grams"))
    evalRoll.join(candRoll, Seq("n"), "left")
      .na.fill(0L, Seq("n_cand_train_grams"))
      .withColumn("seen_permille",
        expr("(1000 * n_seen_grams) div n_eval_grams"))
      .withColumn("novel_permille", lit(1000L) - col("seen_permille"))
      .withColumn("n_fp_train_grams",
        col("n_cand_train_grams") - col("n_matched"))
      .select("n", "n_eval_grams", "n_seen_grams", "seen_permille",
        "novel_permille", "n_cand_train_grams", "n_fp_train_grams")
      .orderBy("n")
  }

  val q202Sql: String = {
    val toks = OracleSql.tokens("text")
    val h = OracleSql.md5Long60("array_to_string(ts[i+1:i+n], ' ')")
    def bit(i: Int) =
      s"(${OracleSql.md5Long60(s"'${i}_' || n::VARCHAR || '_' || h::VARCHAR")} % 1048576)"
    s"""WITH toksrc AS (SELECT doc_id, $toks AS ts FROM documents),
       |expl AS (
       |  SELECT doc_id, n, ts, unnest(generate_series(0, len(ts) - n)) AS i
       |  FROM (SELECT doc_id, ts, unnest([4, 8, 13]) AS n FROM toksrc)
       |  WHERE len(ts) >= n),
       |g AS (SELECT doc_id, n::BIGINT AS n, $h AS h FROM expl),
       |ev AS (SELECT n, h, COUNT(*)::BIGINT AS occ FROM g
       |       WHERE doc_id % 10 = 0 GROUP BY 1, 2),
       |set_bits AS (
       |  SELECT DISTINCT n, unnest([${bit(0)}, ${bit(1)}]) AS p FROM ev),
       |cand AS (
       |  SELECT DISTINCT n, h FROM (
       |    SELECT n, h, ${bit(0)} AS b0, ${bit(1)} AS b1
       |    FROM g WHERE doc_id % 10 <> 0) t
       |  WHERE EXISTS (SELECT 1 FROM set_bits s WHERE s.n = t.n AND s.p = t.b0)
       |    AND EXISTS (SELECT 1 FROM set_bits s WHERE s.n = t.n AND s.p = t.b1)),
       |er AS (
       |  SELECT e.n, SUM(e.occ)::BIGINT AS n_eval_grams,
       |    SUM(CASE WHEN c.h IS NOT NULL THEN e.occ ELSE 0 END)::BIGINT
       |      AS n_seen_grams,
       |    COUNT(c.h)::BIGINT AS n_matched
       |  FROM ev e LEFT JOIN cand c ON e.n = c.n AND e.h = c.h
       |  GROUP BY 1),
       |cr AS (SELECT n, COUNT(*)::BIGINT AS n_cand FROM cand GROUP BY 1)
       |SELECT er.n, n_eval_grams, n_seen_grams,
       |  ((1000 * n_seen_grams) // n_eval_grams)::BIGINT AS seen_permille,
       |  (1000 - (1000 * n_seen_grams) // n_eval_grams)::BIGINT AS novel_permille,
       |  COALESCE(cr.n_cand, 0)::BIGINT AS n_cand_train_grams,
       |  (COALESCE(cr.n_cand, 0) - n_matched)::BIGINT AS n_fp_train_grams
       |FROM er LEFT JOIN cr ON er.n = cr.n
       |ORDER BY er.n""".stripMargin
  }

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q202_novelty_bloom" -> (q202NoveltyBloom _),
    "q201_novelty_curve" -> (q201NoveltyCurve _),
    "q200_selection_curve" -> (q200SelectionCurve _),
    "q197_budget_select" -> (q197BudgetSelect _),
    "q189_kfold_audit" -> (q189KfoldAudit _),
    "q185_quota_sample" -> (q185QuotaSample _),
    "q178_neyman_allocation" -> (q178NeymanAllocation _),
    "q173_curriculum_schedule" -> (q173CurriculumSchedule _),
    "q38_split_assignment" -> (q38SplitAssignment _),
    "q117_dsir_weights" -> (q117DsirWeights _),
    "q39_decontaminate" -> (q39Decontaminate _),
    "q111_ngram_decontaminate" -> (q111NgramDecontaminate _),
    "q129_bloom_decontaminate" -> (q129BloomDecontaminate _),
    "q137_score_calibrate" -> (q137ScoreCalibrate _),
    "q142_unimax_allocation" -> (q142UnimaxAllocation _),
    "q143_bootstrap_ci" -> (q143BootstrapCi _),
    "q144_ab_readout" -> (q144AbReadout _),
    "q163_group_leakage" -> (q163GroupLeakage _),
    "q47_sequence_packing" -> (q47SequencePacking _),
    "q213_greedy_packing" -> (q213GreedyPacking _),
    "q55_training_mix" -> (q55TrainingMix _),
    "q84_temperature_sample" -> (q84TemperatureSample _),
    "q104_weighted_sample" -> (q104WeightedSample _),
  )

  val oracle: Map[String, String] = Map(
    "q202_novelty_bloom" -> q202Sql,
    "q201_novelty_curve" -> q201Sql,
    "q200_selection_curve" -> q200Sql,
    "q197_budget_select" -> q197Sql,
    "q189_kfold_audit" -> q189Sql,
    "q185_quota_sample" -> q185Sql,
    "q178_neyman_allocation" -> q178Sql,
    "q173_curriculum_schedule" -> q173Sql,
    "q38_split_assignment" -> q38Sql,
    "q39_decontaminate" -> q39Sql,
    "q111_ngram_decontaminate" -> q111Sql,
    "q129_bloom_decontaminate" -> q129Sql,
    "q137_score_calibrate" -> q137Sql,
    "q142_unimax_allocation" -> q142Sql,
    "q143_bootstrap_ci" -> q143Sql,
    "q144_ab_readout" -> q144Sql,
    "q163_group_leakage" -> q163Sql,
    "q117_dsir_weights" -> q117Sql,
    "q47_sequence_packing" -> q47Sql,
    "q213_greedy_packing" -> q213Sql,
    "q55_training_mix" -> q55Sql,
    "q84_temperature_sample" -> q84Sql,
    "q104_weighted_sample" -> q104Sql,
  )
}
