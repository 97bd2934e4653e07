package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.tokens

/** Keyword retrieval and event sessionization — the full-text half of
  * the search surface (the reference ships an unused GIN full-text
  * index, schema.sql:141; this is its Spark trajectory: a tokenized
  * inverted index instead of an opaque index structure) and the
  * classic event-analytics operator.
  */
object SearchQueries {

  /** Deterministic TF×rarity keyword search (BM25-shaped, integer
    * arithmetic): score(d) = Σ_t tf(t,d) · W(t) with
    * W(t) = ((N − df_t) · 1_000_000) ÷ df_t (integer division).
    * Integer weights make the sum order-independent and therefore
    * hash-comparable across engines — a float BM25 would drift in the
    * reduction order; the production variant would swap W for real
    * IDF and tolerate approximate comparison.
    *
    * Shape (r10): a term-selective PROBE of the MATERIALIZED postings
    * snapshot (graft.search.PostingsIndex — the stored form of the
    * reference's GIN index, schema.sql:141): bucket directory pruning
    * + term row-group pruning reach df(term)-sized postings, never a
    * corpus tokenize. df per term = the probe's own row count; N reads
    * from the stored stats row. The DuckDB oracle recomputes from
    * documents, so every round re-proves stored-index == recompute.
    */
  def q44KeywordSearch(spark: SparkSession, dir: String): DataFrame =
    graft.search.PostingsIndex.keywordSearch(spark, dir,
      Seq("vector", "merge", "batch"), topK = 20)

  val q44Sql: String =
    """WITH postings AS (
      |  SELECT doc_id, t.term, COUNT(*) AS tf
      |  FROM (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x != '')) AS term
      |        FROM documents) t
      |  WHERE t.term IN ('vector', 'merge', 'batch')
      |  GROUP BY doc_id, t.term),
      |weights AS (
      |  SELECT term,
      |    (((SELECT COUNT(*) FROM documents) - COUNT(DISTINCT doc_id)) * 1000000)
      |      // COUNT(DISTINCT doc_id) AS w
      |  FROM postings GROUP BY term)
      |SELECT p.doc_id, SUM(p.tf * w.w)::BIGINT AS score, COUNT(*) AS n_terms_matched
      |FROM postings p JOIN weights w ON p.term = w.term
      |GROUP BY p.doc_id
      |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  /** q127: TF-IDF discriminative terms per source — the classic IR
    * term weighting (Spärck Jones' inverse document frequency) that
    * answers "which terms characterize THIS corpus slice against the
    * rest", the per-domain fingerprint used for corpus exploration
    * and mixture design. q44 scores ad-hoc queries and q110/q113
    * find corpus-global collocations; this is the per-slice view.
    * Log-tf × idf in hash-exact integer form: idf_class =
    * bitlen(N div df) ≈ floor(log2(N/df))+1 and tf_class = bitlen(tf)
    * (the q89/q107 bit-length trick — no libm log to drift between
    * engines); weight = tf_class · idf_class, top-10 per source by
    * (weight DESC, term ASC).
    *
    * Scale shape: one explode → (doc, source, term) tf aggregate with
    * map-side combine; the (source, term) rollup rides the same frame,
    * and because a doc has exactly one source, df = Σ_sources n_docs —
    * a window over term partitions of the Zipf-compressed (source,
    * term) frame, no second corpus scan; N joins in as a broadcast
    * scalar; the per-source top-10 is a rank window over
    * ≤ |sources|·|vocab| rows.
    */
  def q127TfIdf(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val nTotal = t.documents.agg(count(lit(1)).as("n_total"))
    val bySrcTerm = t.documents
      .select(col("doc_id"), col("source"),
        explode(tokens(lower(col("text")))).as("term"))
      .groupBy("doc_id", "source", "term")
      .agg(count(lit(1)).as("tf"))
      .groupBy("source", "term")
      .agg(sum("tf").as("tf"), count(lit(1)).as("n_docs"))
    bySrcTerm
      .withColumn("df", sum("n_docs").over(Window.partitionBy("term")))
      .crossJoin(broadcast(nTotal))
      .withColumn("idf_class", length(bin(expr("n_total div df"))).cast("long"))
      .withColumn("weight", length(bin(col("tf"))).cast("long") * col("idf_class"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(desc("weight"), asc("term"))))
      .filter(col("rk") <= 10)
      .select(col("source"), col("rk").cast("long").as("rk"), col("term"),
        col("tf"), col("df"), col("idf_class"), col("weight"))
      .orderBy("source", "rk")
  }

  val q127Sql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, source, unnest(${OracleSql.tokens("lower(text)")}) AS term
       |  FROM documents),
       |by_doc AS (
       |  SELECT doc_id, source, term, COUNT(*)::BIGINT AS tf
       |  FROM tok GROUP BY 1, 2, 3),
       |by_src AS (
       |  SELECT source, term, SUM(tf)::BIGINT AS tf, COUNT(*)::BIGINT AS n_docs
       |  FROM by_doc GROUP BY 1, 2),
       |n AS (SELECT COUNT(*)::BIGINT AS n_total FROM documents),
       |w AS (
       |  SELECT source, term, tf,
       |    SUM(n_docs) OVER (PARTITION BY term)::BIGINT AS df
       |  FROM by_src),
       |scored AS (
       |  SELECT source, term, tf, df,
       |    len(bin(n_total // df))::BIGINT AS idf_class,
       |    (len(bin(tf)) * len(bin(n_total // df)))::BIGINT AS weight
       |  FROM w, n),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY source ORDER BY weight DESC, term) AS rk
       |  FROM scored)
       |SELECT source, rk::BIGINT AS rk, term, tf, df, idf_class, weight
       |FROM ranked WHERE rk <= 10 ORDER BY source, rk""".stripMargin

  /** q150: HYBRID retrieval via reciprocal-rank fusion — the modern
    * RAG retrieval pattern: run the lexical ranker (q44's integer
    * BM25 shape) and the dense ranker (cosine against a query
    * embedding) independently, keep each top-50, and fuse by RRF
    * (Cormack et al.): score(d) = Σ_lists 10^6 div (60 + rank_d) —
    * rank-based, so the two engines' incomparable score scales never
    * touch, and integer, so the fusion is hash-exact. Docs found by
    * only one leg still fuse (full outer join); the winners are docs
    * both legs agree on.
    *
    * Scale shape: each leg is its existing top-k heap
    * (TakeOrderedAndProject — k rows per partition cross the wire);
    * the rank windows and the fusion join run over ≤50-row frames.
    */
  def q150HybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // lexical leg (r10): the same stored-index probe as q44 — the
    // materialized postings snapshot, never a corpus tokenize; the
    // rank window rides the 50-row top-k output
    val kw = graft.search.PostingsIndex.keywordSearch(spark, dir,
      Seq("vector", "merge", "batch"), topK = 50)
      .withColumn("rank_kw", row_number().over(
        Window.orderBy(desc("score"), asc("doc_id"))).cast("long"))
      .select("doc_id", "rank_kw")
    val qEmb = t.embeddings.filter(col("vec_id") === 7)
      .select(col("embedding").as("q_emb"))
    val vec = t.embeddings.filter(col("vec_id") =!= 7)
      .crossJoin(broadcast(qEmb))
      .withColumn("cos",
        graft.functions.VectorFunctions.dotFold(col("embedding"), col("q_emb")))
      .orderBy(desc("cos"), asc("vec_id")).limit(50)
      .withColumn("rank_vec", row_number().over(
        Window.orderBy(desc("cos"), asc("vec_id"))).cast("long"))
      .select(col("vec_id").as("doc_id"), col("rank_vec"))
    kw.join(vec, Seq("doc_id"), "full_outer")
      .na.fill(0L, Seq("rank_kw", "rank_vec"))
      .withColumn("rrf_micro",
        expr("(case when rank_kw > 0 then 1000000 div (60 + rank_kw) else 0 end)" +
          " + (case when rank_vec > 0 then 1000000 div (60 + rank_vec) else 0 end)"))
      .orderBy(desc("rrf_micro"), asc("doc_id")).limit(10)
      .select("doc_id", "rank_kw", "rank_vec", "rrf_micro")
  }

  val q150Sql: String = {
    val dot = OracleSql.dotFold("e.embedding", "q.q_emb")
    s"""WITH postings AS (
       |  SELECT doc_id, t.term, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest(${OracleSql.tokens("lower(text)")}) AS term
       |        FROM documents) t
       |  WHERE t.term IN ('vector', 'merge', 'batch')
       |  GROUP BY doc_id, t.term),
       |weights AS (
       |  SELECT term,
       |    (((SELECT COUNT(*) FROM documents) - COUNT(DISTINCT doc_id)) * 1000000)
       |      // COUNT(DISTINCT doc_id) AS w
       |  FROM postings GROUP BY term),
       |kw AS (
       |  SELECT doc_id,
       |    ROW_NUMBER() OVER (ORDER BY SUM(tf * w) DESC, doc_id) AS rank_kw
       |  FROM postings p JOIN weights USING (term)
       |  GROUP BY doc_id
       |  ORDER BY SUM(tf * w) DESC, doc_id LIMIT 50),
       |q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 7),
       |vec AS (
       |  SELECT e.vec_id AS doc_id,
       |    ROW_NUMBER() OVER (ORDER BY $dot DESC, e.vec_id) AS rank_vec
       |  FROM embeddings e, q WHERE e.vec_id <> 7
       |  ORDER BY $dot DESC, e.vec_id LIMIT 50),
       |fused AS (
       |  SELECT COALESCE(k.doc_id, v.doc_id) AS doc_id,
       |    COALESCE(k.rank_kw, 0)::BIGINT AS rank_kw,
       |    COALESCE(v.rank_vec, 0)::BIGINT AS rank_vec
       |  FROM kw k FULL OUTER JOIN vec v ON k.doc_id = v.doc_id)
       |SELECT doc_id, rank_kw, rank_vec,
       |  ((CASE WHEN rank_kw > 0 THEN 1000000 // (60 + rank_kw) ELSE 0 END) +
       |   (CASE WHEN rank_vec > 0 THEN 1000000 // (60 + rank_vec) ELSE 0 END))::BIGINT
       |    AS rrf_micro
       |FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT 10""".stripMargin
  }

  /** q155: source-SIMILARITY matrix — "which scrapes are the same
    * mixture": cosine similarity between per-source unigram count
    * vectors, the domain-similarity statistic mixture-design work
    * (DoReMi-adjacent) uses to decide which sources are redundant
    * with each other BEFORE any per-document dedup. Vectors are
    * per-MILLE term shares, not raw counts — that makes the
    * comparison scale-invariant (distribution, not volume) AND
    * overflow-proof BY CONSTRUCTION at any corpus size: shares sum to
    * ≤1000, so dot ≤ 10⁶, dot² ≤ 10¹², and 1000·dot² ≤ 10¹⁵ — no
    * decimal widening needed ever (the raw-count formulation
    * overflowed int64 at the 10× gate; this one cannot). Squared
    * cosine keeps everything integer (no sqrt): sim²‰ = 1000·dot² div
    * (‖a‖²·‖b‖²). Terms under 1‰ of a source floor to zero — a
    * principled sparsification, documented, identical in both
    * engines.
    *
    * Scale shape: the corpus Zipf-compresses to the (source, term)
    * frame once (localCheckpoint'd, three consumers); pair dots are a
    * self-equi-join ON TERM (cost ∝ Σ_term sources²_present, never
    * docs²); norms broadcast; top-10 is a heap.
    */
  def q155SourceSimilarity(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val counts = t.documents
      .select(col("source"), explode(tokens(lower(col("text")))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("cnt"))
    val vecs = counts
      .withColumn("tot", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")))
      .withColumn("c", expr("(1000 * cnt) div tot"))
      .filter(col("c") > 0)
      .select("source", "term", "c")
      .localCheckpoint(false)
    val norms = vecs.groupBy("source").agg(sum(col("c") * col("c")).as("nsq"))
    vecs.select(col("source").as("sa"), col("term"), col("c").as("ca"))
      .join(vecs.select(col("source").as("sb"), col("term"), col("c").as("cb")),
        Seq("term"))
      .filter(col("sa") < col("sb"))
      .groupBy("sa", "sb").agg(sum(col("ca") * col("cb")).as("dot"))
      .join(broadcast(norms.select(col("source").as("sa"), col("nsq").as("na"))),
        Seq("sa"))
      .join(broadcast(norms.select(col("source").as("sb"), col("nsq").as("nb"))),
        Seq("sb"))
      .withColumn("sim2_permille", expr("(1000 * dot * dot) div (na * nb)"))
      .orderBy(desc("sim2_permille"), asc("sa"), asc("sb"))
      .limit(10)
      .select("sa", "sb", "dot", "sim2_permille")
  }

  val q155Sql: String =
    s"""WITH counts AS (
       |  SELECT source, term, COUNT(*)::BIGINT AS cnt
       |  FROM (SELECT source, unnest(${OracleSql.tokens("lower(text)")}) AS term
       |        FROM documents)
       |  GROUP BY 1, 2),
       |vecs AS (
       |  SELECT source, term,
       |    (1000 * cnt) // SUM(cnt) OVER (PARTITION BY source) AS c
       |  FROM counts
       |  QUALIFY c > 0),
       |norms AS (SELECT source, SUM(c * c)::BIGINT AS nsq FROM vecs GROUP BY 1),
       |dots AS (
       |  SELECT a.source AS sa, b.source AS sb, SUM(a.c * b.c)::BIGINT AS dot
       |  FROM vecs a JOIN vecs b ON a.term = b.term AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT sa, sb, dot,
       |  ((1000 * dot * dot) // (na.nsq * nb.nsq))::BIGINT AS sim2_permille
       |FROM dots
       |JOIN norms na ON na.source = sa
       |JOIN norms nb ON nb.source = sb
       |ORDER BY sim2_permille DESC, sa, sb LIMIT 10""".stripMargin

  /** q152: conversion-LATENCY distribution — the follow-up question
    * to q88's funnel ("DID sessions convert"): how LONG from first
    * view to first purchase within a session, as a 10-minute-bucket
    * histogram with cumulative per-mille — the readout behind "half
    * our conversions happen within N minutes", which sets session
    * timeout and attribution-window policy. Latency is integer
    * seconds (micros floor-divided), buckets integer — hash-exact.
    *
    * Scale shape: q37's session windows (one user_id exchange shared
    * by all three windows), a per-session aggregate, and a tiny
    * bucket rollup with a cumulative window over ≤ buckets rows.
    */
  def q152ConversionLatency(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sessions = t.events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("us", unix_micros(col("ts")))
    val wSess = Window.partitionBy("user_id", "sid")
    val lat = sessions
      .withColumn("first_view",
        min(when(col("event_type") === "view", col("us"))).over(wSess))
      .filter(col("event_type") === "purchase" &&
        col("first_view").isNotNull && col("us") >= col("first_view"))
      .groupBy("user_id", "sid", "first_view")
      .agg(min("us").as("first_purch"))
      .withColumn("latency_s", expr("(first_purch - first_view) div 1000000"))
    lat.groupBy(expr("latency_s div 600").as("bucket_10min"))
      .agg(count(lit(1)).as("n_conversions"))
      .withColumn("cum", sum("n_conversions").over(
        Window.orderBy("bucket_10min").rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum("n_conversions").over(Window.partitionBy()))
      .withColumn("cum_permille", expr("(1000 * cum) div total"))
      .select("bucket_10min", "n_conversions", "cum_permille")
      .orderBy("bucket_10min")
  }

  val q152Sql: String =
    """WITH ordered AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN prev_ts IS NULL
      |      OR epoch_us(ts) // 1000000 - epoch_us(prev_ts) // 1000000 > 1800
      |    THEN 1 ELSE 0 END AS ns
      |  FROM ordered),
      |sess AS (
      |  SELECT user_id, event_type, epoch_us(ts)::BIGINT AS us,
      |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
      |  FROM flagged),
      |fv AS (
      |  SELECT user_id, sid,
      |    MIN(CASE WHEN event_type = 'view' THEN us END) AS first_view
      |  FROM sess GROUP BY 1, 2),
      |lat AS (
      |  SELECT (MIN(s.us) - f.first_view) // 1000000 AS latency_s
      |  FROM sess s JOIN fv f ON s.user_id = f.user_id AND s.sid = f.sid
      |  WHERE s.event_type = 'purchase' AND f.first_view IS NOT NULL
      |    AND s.us >= f.first_view
      |  GROUP BY s.user_id, s.sid, f.first_view),
      |buckets AS (
      |  SELECT latency_s // 600 AS bucket_10min, COUNT(*)::BIGINT AS n_conversions
      |  FROM lat GROUP BY 1)
      |SELECT bucket_10min::BIGINT AS bucket_10min, n_conversions,
      |  ((1000 * SUM(n_conversions) OVER (ORDER BY bucket_10min))
      |    // SUM(n_conversions) OVER ())::BIGINT AS cum_permille
      |FROM buckets ORDER BY bucket_10min""".stripMargin

  /** q149: incremental inverted-index MAINTENANCE — the search-side
    * member of the incremental family (q83 maintains aggregates, q131
    * the dedup index; this maintains q44's postings): the stored
    * index (even docs) merges with the new batch's postings (odd
    * docs) by PLAIN ADDITION — df adds because the doc sets are
    * disjoint, tf adds because counts are counts — and the merged
    * index must equal a full recompute, row for row. The
    * `matches_recompute` column rides every output row as a TRUE
    * contract: a wrong merge algebra flips booleans and fails the
    * hash. At 100 TB this is why you never rescan the corpus to
    * refresh a search index: the delta's postings are the only new
    * work, and the merge is one co-partitioned join.
    */
  def q149IndexMerge(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def postings(df: DataFrame) = df
      .select(col("doc_id"), explode(tokens(lower(col("text")))).as("term"))
      .groupBy("term")
      .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("tf"))
    val docs = t.documents.select(col("doc_id"), col("text"))
    val stored = postings(docs.filter(pmod(col("doc_id"), lit(2L)) === 0))
      .select(col("term"), col("df").as("df_a"), col("tf").as("tf_a"))
    val delta = postings(docs.filter(pmod(col("doc_id"), lit(2L)) === 1))
      .select(col("term"), col("df").as("df_b"), col("tf").as("tf_b"))
    val merged = stored.join(delta, Seq("term"), "full_outer")
      .na.fill(0L, Seq("df_a", "tf_a", "df_b", "tf_b"))
      .select(col("term"), (col("df_a") + col("df_b")).as("df"),
        (col("tf_a") + col("tf_b")).as("tf"))
    val recomputed = postings(docs)
      .select(col("term"), col("df").as("df_r"), col("tf").as("tf_r"))
    merged.join(recomputed, Seq("term"), "full_outer")
      .select(col("term"), col("df"), col("tf"),
        (col("df") === col("df_r") && col("tf") === col("tf_r"))
          .as("matches_recompute"))
      .orderBy(desc("tf"), asc("term"))
      .limit(20)
  }

  val q149Sql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(${OracleSql.tokens("lower(text)")}) AS term
       |  FROM documents)
       |SELECT term, COUNT(DISTINCT doc_id)::BIGINT AS df,
       |  COUNT(*)::BIGINT AS tf, TRUE AS matches_recompute
       |FROM tok GROUP BY term
       |ORDER BY tf DESC, term LIMIT 20""".stripMargin

  /** Gap-based sessionization (30-minute inactivity closes a session):
    * lag + cumulative-sum window assigns session ids, then per-user
    * session stats. One shuffle on user_id; both windows share the
    * partitioning (single exchange).
    */
  def q37Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sessions = t.events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessions
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        (max(col("ts").cast("long")) - min(col("ts").cast("long"))).as("duration_s"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        max("n_events").as("max_session_events"),
        max("duration_s").as("max_session_s"))
      .orderBy("user_id")
  }

  val q37Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800 THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged),
      |per_session AS (
      |  SELECT user_id, session_id, COUNT(*) AS n_events,
      |    max(floor(epoch(ts))::BIGINT) - min(floor(epoch(ts))::BIGINT) AS duration_s
      |  FROM sessions GROUP BY user_id, session_id)
      |SELECT user_id, COUNT(*) AS n_sessions,
      |  MAX(n_events) AS max_session_events,
      |  MAX(duration_s) AS max_session_s
      |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q88: ordered funnel analysis (view → click → purchase) per
    * session, computed as a running STATE MACHINE in window flags —
    * never a self-join per stage (the naive funnel is one join per
    * step, each a full shuffle of the fact table; this is the shape
    * that collapses at 100 TB). Running `max` flags encode "a view
    * happened", "a click after a view happened", and a purchase only
    * advances the funnel when the click-after-view flag is already
    * set, so stages are strictly ordered within the session.
    *
    * Two exchanges total: one on user_id to assign gap sessions
    * (q37's logic), one on (user_id, session_id) for the funnel
    * windows + rollup — at cluster scale the events table is bucketed
    * by user_id and the first vanishes.
    */
  def q88Funnel(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val bySess = Window.partitionBy("user_id", "session_id")
      .orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("sv",
        max(when(col("event_type") === "view", 1L).otherwise(0L)).over(bySess))
      .withColumn("cav",
        when(col("event_type") === "click" && col("sv") === 1L, 1L).otherwise(0L))
      .withColumn("scv", max(col("cav")).over(bySess))
      .withColumn("st",
        when(col("event_type") === "purchase" && col("scv") === 1L, 3L)
          .when(col("cav") === 1L, 2L)
          .when(col("event_type") === "view", 1L)
          .otherwise(0L))
      .groupBy("user_id", "session_id")
      .agg(max("st").as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n_sessions"))
      .orderBy("stage")
  }

  val q88Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800 THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged),
      |s1 AS (
      |  SELECT *, MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER ws AS sv
      |  FROM sess
      |  WINDOW ws AS (PARTITION BY user_id, session_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |s2 AS (
      |  SELECT *, CASE WHEN event_type = 'click' AND sv = 1 THEN 1 ELSE 0 END AS cav
      |  FROM s1),
      |s3 AS (
      |  SELECT *, MAX(cav) OVER ws AS scv
      |  FROM s2
      |  WINDOW ws AS (PARTITION BY user_id, session_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |per_session AS (
      |  SELECT user_id, session_id,
      |    MAX(CASE WHEN event_type = 'purchase' AND scv = 1 THEN 3
      |             WHEN cav = 1 THEN 2
      |             WHEN event_type = 'view' THEN 1 ELSE 0 END) AS stage
      |  FROM s3 GROUP BY user_id, session_id)
      |SELECT stage, COUNT(*) AS n_sessions
      |FROM per_session GROUP BY stage ORDER BY stage""".stripMargin

  /** As-of (backward) join: each purchase matches the most recent
    * click at-or-before it by the same user. Spark has no native
    * AS OF join; the scalable composition is a union of both sides
    * ordered by event time with an ignore-nulls last_value
    * carry-forward — ONE shuffle on the key, no per-row range probe
    * (the naive range-join form explodes to pairs; this walks each
    * user's timeline once). Ties break on event_id via the window
    * order, so the result is deterministic; the oracle runs the
    * identical window composition.
    */
  def q48AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.events
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("last_click_id",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("last_click_id"), col("last_click_ts"))
      .orderBy("user_id", "purchase_id")
  }

  val q48Sql: String =
    """SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
      |  last_click_id, last_click_ts
      |FROM (
      |  SELECT user_id, event_id, ts, event_type,
      |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
      |      OVER w AS last_click_id,
      |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
      |      OVER w AS last_click_ts
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |WHERE event_type = 'purchase'
      |ORDER BY user_id, purchase_id""".stripMargin

  /** Broadcast range join: classify events into value tiers via a
    * `lo <= value < hi` interval join against a tiny tier table.
    * Spark plans the non-equi condition as a BroadcastNestedLoopJoin —
    * correct here because the build side is 4 rows; at scale with a
    * large interval table the shape becomes bin-bucketing (join on
    * `floor(value / binWidth)` equi-keys, then refine), the same
    * discretize-then-verify trade as the LSH dedups.
    */
  def q49RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val tiers = Seq(
      ("small", 0.0d, 1.0d), ("medium", 1.0d, 5.0d),
      ("large", 5.0d, 50.0d), ("huge", 50.0d, 1.0e9d))
      .toDF("tier", "lo", "hi")
    t.events
      .join(broadcast(tiers),
        col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy("tier")
  }

  val q49Sql: String =
    """SELECT tier, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events
      |JOIN (VALUES ('small', 0.0, 1.0), ('medium', 1.0, 5.0),
      |             ('large', 5.0, 50.0), ('huge', 50.0, 1000000000.0)) t(tier, lo, hi)
      |  ON value >= lo AND value < hi
      |GROUP BY tier ORDER BY tier""".stripMargin

  /** q121: first-order Markov transition model over the event stream
    * — the behavioral complement of q107's token bigram model: which
    * event TYPE follows which, conditioned within a session (the
    * transition only counts when the gap to the previous event is
    * ≤ 30 min — q37's session boundary applied to the lag itself, no
    * separate session-id pass). Output: the full transition matrix
    * with conditional per-mille P(to|from) — the model behind funnel
    * plausibility checks, bot detection (impossible transition
    * loops), and simulated-user generation.
    *
    * Scale shape: ONE exchange on user_id for the lag window (shared
    * with everything the session family computes), then the matrix
    * aggregate with map-side combine — the matrix is |types|² rows,
    * so the conditional normalization is a WINDOW over ≤25 rows, not
    * a second pass over the corpus.
    */
  def q121MarkovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val trans = t.events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNotNull &&
        col("ts").cast("long") - col("prev_ts").cast("long") <= 1800)
      .select(col("prev_type").as("from_type"),
        col("event_type").as("to_type"))
    val wf = Window.partitionBy("from_type")
    trans.groupBy("from_type", "to_type").agg(count(lit(1)).as("c_ab"))
      .withColumn("c_from", sum("c_ab").over(wf))
      .withColumn("permille", expr("(1000 * c_ab) div c_from"))
      .select("from_type", "to_type", "c_ab", "permille")
      .orderBy("from_type", "to_type")
  }

  val q121Sql: String =
    """WITH tr AS (
      |  SELECT lag(event_type) OVER w AS from_type, event_type AS to_type,
      |    CASE WHEN lag(ts) OVER w IS NULL THEN NULL
      |         ELSE floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT
      |    END AS gap
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |m AS (
      |  SELECT from_type, to_type, COUNT(*)::BIGINT AS c_ab
      |  FROM tr WHERE from_type IS NOT NULL AND gap <= 1800
      |  GROUP BY 1, 2)
      |SELECT from_type, to_type, c_ab,
      |  ((1000 * c_ab) // SUM(c_ab) OVER (PARTITION BY from_type))::BIGINT
      |    AS permille
      |FROM m ORDER BY from_type, to_type""".stripMargin

  /** q158: session SURPRISAL scoring — q121's transition model turned
    * into a detector (the behavioral twin of q107's text fluency
    * score): every session is scored by the summed surprisal of its
    * transitions, surprisal(t1→t2) = 10 − bitlen(p‰(t2|t1)) ≈
    * −log₂ p (integer-exact, the q89/q107 bit-length trick). High
    * total surprisal = a session walking improbable paths (probe/
    * fraud); LOW average surprisal on a long session = machine-regular
    * navigation — both tails matter, so the report carries the
    * per-transition average alongside the sum, top-20 by total.
    *
    * Scale shape: one user_id exchange shared by the lag windows; the
    * model is a |types|²-row broadcast; per-session rollup + heap.
    */
  def q158SessionSurprisal(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val flagged = t.events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .withColumn("in_session", col("prev_type").isNotNull &&
        col("ts").cast("long") - col("prev_ts").cast("long") <= 1800)
      .withColumn("sid", sum(when(col("prev_ts").isNull ||
        col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L)
        .otherwise(0L)).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint(false)
    val model = flagged.filter(col("in_session"))
      .groupBy(col("prev_type").as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("c_ab"))
      .withColumn("permille", expr(
        "(1000 * c_ab) div sum(c_ab) over (partition by from_type)"))
      .withColumn("surprisal",
        lit(10L) - length(bin(greatest(col("permille"), lit(1L)))).cast("long"))
      .select("from_type", "to_type", "surprisal")
    flagged.filter(col("in_session"))
      .join(broadcast(model),
        col("prev_type") === col("from_type") &&
          col("event_type") === col("to_type"))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_trans"), sum("surprisal").as("total_surprisal"))
      .withColumn("avg_class", expr("total_surprisal div n_trans"))
      .orderBy(desc("total_surprisal"), desc("n_trans"), asc("user_id"),
        asc("sid"))
      .limit(20)
  }

  val q158Sql: String =
    """WITH lagged AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    lag(event_type) OVER w AS prev_type,
      |    CASE WHEN lag(ts) OVER w IS NULL THEN NULL
      |         ELSE floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT
      |    END AS gap
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |flagged AS (
      |  SELECT *, (SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id))::BIGINT AS sid
      |  FROM lagged),
      |tr AS (
      |  SELECT * FROM flagged WHERE prev_type IS NOT NULL AND gap <= 1800),
      |model AS (
      |  SELECT from_type, to_type,
      |    (10 - len(bin(greatest((1000 * c_ab)
      |      // SUM(c_ab) OVER (PARTITION BY from_type), 1))))::BIGINT AS surprisal
      |  FROM (SELECT prev_type AS from_type, event_type AS to_type,
      |          COUNT(*)::BIGINT AS c_ab
      |        FROM tr GROUP BY 1, 2)),
      |scored AS (
      |  SELECT t.user_id, t.sid, COUNT(*)::BIGINT AS n_trans,
      |    SUM(m.surprisal)::BIGINT AS total_surprisal
      |  FROM tr t JOIN model m
      |    ON t.prev_type = m.from_type AND t.event_type = m.to_type
      |  GROUP BY 1, 2)
      |SELECT user_id, sid, n_trans, total_surprisal,
      |  (total_surprisal // n_trans)::BIGINT AS avg_class
      |FROM scored
      |ORDER BY total_surprisal DESC, n_trans DESC, user_id, sid
      |LIMIT 20""".stripMargin

  /** q125: frequent session PATHS — clickstream sequence mining, the
    * order-sensitive step up from q121's one-step transitions: each
    * gap-session's ordered event-type sequence yields its 3-step
    * paths ("view>click>purchase"), counted corpus-wide, top-20. The
    * output is the navigation-pattern table behind funnel design and
    * bot-path detection (a 3-path with near-deterministic repetition
    * is an automation signature q121's pairwise matrix can blur).
    *
    * Scale shape: one exchange on user_id for the session windows;
    * the per-session sequence materializes via
    * sort_array(collect_list(struct)) — deterministic where a bare
    * collect_list is partition-order-dependent — and sessions are
    * gap-bounded so no single group grows with the corpus; path
    * derivation is ROW-LOCAL over the sequence array; the path count
    * is a map-side-combined aggregate over paths drawn from a tiny
    * alphabet (|types|³ distinct), and the top-20 is a heap.
    */
  def q125FrequentPaths(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sessions = t.events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val seqs = sessions.groupBy("user_id", "session_id")
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
        col("event_type")))).as("evs"))
      .select(transform(col("evs"), e => e.getField("event_type")).as("types"))
    val ts2 = col("types")
    val paths = when(size(ts2) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(ts2) - 2), i =>
        concat_ws(">", element_at(ts2, i), element_at(ts2, i + 1),
          element_at(ts2, i + 2))))
    seqs.select(explode(paths).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("path"))
      .limit(20)
  }

  val q125Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800 THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged),
      |seqs AS (
      |  SELECT user_id, session_id,
      |    list(event_type ORDER BY ts, event_id) AS types
      |  FROM sessions GROUP BY user_id, session_id),
      |paths AS (
      |  SELECT unnest(list_transform(generate_series(1, len(types) - 2),
      |    i -> types[i] || '>' || types[i+1] || '>' || types[i+2])) AS path
      |  FROM seqs WHERE len(types) >= 3)
      |SELECT path, COUNT(*)::BIGINT AS n FROM paths
      |GROUP BY path ORDER BY n DESC, path LIMIT 20""".stripMargin

  /** q203: POSITIONAL inverted index + PHRASE query — the FTS
    * capability behind the reference's unused GIN index
    * (schema.sql:141; `to_tsvector` keeps lexeme positions for exactly
    * this). q44 answers bag-of-words queries; phrase search ("table
    * scan" as ADJACENT tokens, not two ANDed terms) needs the index to
    * keep positions: postings are (doc, term, sorted position list),
    * and a phrase hit is pos+1 adjacency between the two terms'
    * lists — computed row-locally as |(pa+1) ∩ pb| once the per-doc
    * lists meet (positions are distinct by construction, so the
    * intersection size IS the occurrence count).
    *
    * Shape (r10): a term-selective probe of the MATERIALIZED postings
    * snapshot (graft.search.PostingsIndex — positions are STORED, the
    * corpus is never re-tokenized) → doc_id equi-join of the two
    * terms' postings (AND semantics) → row-local adjacency → top-20
    * heap (TakeOrderedAndProject, never a global sort). The n-term
    * generalization is PostingsIndex.phraseSearch; this entry keeps
    * the two-term report shape its oracle pins.
    */
  def q203PhraseSearch(spark: SparkSession, dir: String): DataFrame = {
    val (ta, tb) = ("table", "scan")
    val posts = graft.search.PostingsIndex.probe(spark, dir, Seq(ta, tb))
    val a = posts.filter(col("term") === ta)
      .select(col("doc_id"), col("positions").as("pa"), col("tf").as("tf_a"))
    val b = posts.filter(col("term") === tb)
      .select(col("doc_id"), col("positions").as("pb"), col("tf").as("tf_b"))
    a.join(b, Seq("doc_id"))
      .withColumn("n_phrase",
        size(array_intersect(transform(col("pa"), x => x + 1), col("pb")))
          .cast("long"))
      .select("doc_id", "tf_a", "tf_b", "n_phrase")
      .orderBy(desc("n_phrase"), (col("tf_a") + col("tf_b")).desc,
        asc("doc_id"))
      .limit(20)
  }

  val q203Sql: String = {
    val toks = OracleSql.tokens("lower(text)")
    s"""WITH toksrc AS (SELECT doc_id, $toks AS ts FROM documents),
       |pos AS (
       |  SELECT doc_id, i AS pos, ts[i+1] AS term
       |  FROM toksrc, unnest(generate_series(0, len(ts) - 1)) AS u(i)
       |  WHERE ts[i+1] IN ('table', 'scan')),
       |g AS (
       |  SELECT doc_id, term, list_sort(list(pos)) AS positions,
       |    COUNT(*)::BIGINT AS tf
       |  FROM pos GROUP BY 1, 2),
       |a AS (SELECT doc_id, positions AS pa, tf AS tf_a FROM g WHERE term = 'table'),
       |b AS (SELECT doc_id, positions AS pb, tf AS tf_b FROM g WHERE term = 'scan')
       |SELECT a.doc_id, tf_a, tf_b,
       |  len(list_intersect(list_transform(pa, x -> x + 1), pb))::BIGINT
       |    AS n_phrase
       |FROM a JOIN b USING (doc_id)
       |ORDER BY n_phrase DESC, (tf_a + tf_b) DESC, doc_id
       |LIMIT 20""".stripMargin
  }

  /** q205: stored-index INTEGRITY audit — the per-round proof that the
    * MATERIALIZED postings snapshot (PostingsIndex) equals a fresh
    * recompute from the corpus, hash-exactly: the Spark side aggregates
    * the STORED index (df = rows per term, tf = Σ tf), the DuckDB
    * oracle re-derives the same rollup from `documents` — any drift
    * between the index build/merge path and the corpus (a lost doc, a
    * double-merged batch, a stale snapshot after regen) flips counts
    * and fails the hash. This is q149's `matches_recompute` contract
    * promoted from an in-query boolean to an oracle-gated table, and
    * the reference capability matched is that schema.sql:141's GIN
    * index is *stored* — Postgres audits it with amcheck; this engine
    * audits it with the oracle differential.
    *
    * Scale shape: one scan of the index snapshot (vocabulary-sized —
    * Zipf-compressed, orders below the corpus), one map-side-combined
    * aggregate, top-20 heap.
    */
  def q205StoredIndexAudit(spark: SparkSession, dir: String): DataFrame =
    graft.search.PostingsIndex.storedPostings(spark, dir)
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("tf"))
      .orderBy(desc("tf"), asc("term"))
      .limit(20)

  val q205Sql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(${OracleSql.tokens("lower(text)")}) AS term
       |  FROM documents)
       |SELECT term, COUNT(DISTINCT doc_id)::BIGINT AS df,
       |  COUNT(*)::BIGINT AS tf
       |FROM tok GROUP BY term
       |ORDER BY tf DESC, term LIMIT 20""".stripMargin

  /** q206: Okapi BM25 ranked retrieval over the STORED index — what
    * q44's rarity-weight shape graduates into once the index carries
    * doc lengths (PostingsIndex v2 denormalizes dl onto every postings
    * row — the impact-index trade: no probe-time corpus join for the
    * length normalization). Same query terms as q44 so the two ranking
    * functions are directly comparable in the record; exact integer
    * fixed-point (k1=1.2, b=0.75 ×100; idf as the house bitlen log₂,
    * Lucene-style floored) so the oracle hashes identically — see
    * PostingsIndex.bm25Search for the algebra.
    */
  def q206Bm25Ranking(spark: SparkSession, dir: String): DataFrame =
    graft.search.PostingsIndex.bm25Search(spark, dir,
      Seq("vector", "merge", "batch"), topK = 20)

  val q206Sql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(${OracleSql.tokens("lower(text)")}) AS term
       |  FROM documents),
       |dl AS (SELECT doc_id, COUNT(*)::BIGINT AS dl FROM tok GROUP BY 1),
       |st AS (SELECT (SELECT COUNT(*) FROM documents)::BIGINT AS n_docs,
       |              (SELECT COUNT(*) FROM tok)::BIGINT AS t_total),
       |p AS (
       |  SELECT doc_id, term, COUNT(*)::BIGINT AS tf
       |  FROM tok WHERE term IN ('vector', 'merge', 'batch')
       |  GROUP BY 1, 2),
       |w AS (
       |  SELECT term, COUNT(*)::BIGINT AS df,
       |    len(bin(greatest((2 * ((SELECT n_docs FROM st) - COUNT(*)) + 1)
       |      // (2 * COUNT(*) + 1), 1)))::BIGINT AS idf_class
       |  FROM p GROUP BY term),
       |scored AS (
       |  SELECT p.doc_id,
       |    ((220 * p.tf * 1000000) // (100 * p.tf +
       |      (120 * (25 * st.t_total + 75 * d.dl * st.n_docs))
       |        // (100 * st.t_total))) * w.idf_class AS s
       |  FROM p JOIN w USING (term) JOIN dl d USING (doc_id), st)
       |SELECT doc_id, SUM(s)::BIGINT AS score_micro,
       |  COUNT(*)::BIGINT AS n_terms_matched
       |FROM scored GROUP BY doc_id
       |ORDER BY score_micro DESC, doc_id LIMIT 20""".stripMargin

  /** q207: THREE-term phrase search through the parameterized n-term
    * API (PostingsIndex.phraseSearch — iterated pos+k intersect) so
    * the generalized adjacency the engine exposes is itself
    * ORACLE-gated, not just spec-pinned against a driver-side
    * reference: "merge batch row" occurs at every test SF, and the
    * DuckDB twin computes |pa ∩ (pb−1) ∩ (pc−2)| from scratch.
    */
  def q207PhraseTrigram(spark: SparkSession, dir: String): DataFrame =
    graft.search.PostingsIndex.phraseSearch(spark, dir,
      Seq("merge", "batch", "row"), topK = 20)

  val q207Sql: String = {
    val toks = OracleSql.tokens("lower(text)")
    s"""WITH toksrc AS (SELECT doc_id, $toks AS ts FROM documents),
       |pos AS (
       |  SELECT doc_id, i AS pos, ts[i+1] AS term
       |  FROM toksrc, unnest(generate_series(0, len(ts) - 1)) AS u(i)
       |  WHERE ts[i+1] IN ('merge', 'batch', 'row')),
       |g AS (
       |  SELECT doc_id, term, list_sort(list(pos)) AS positions
       |  FROM pos GROUP BY 1, 2),
       |a AS (SELECT doc_id, positions AS pa FROM g WHERE term = 'merge'),
       |b AS (SELECT doc_id, positions AS pb FROM g WHERE term = 'batch'),
       |c AS (SELECT doc_id, positions AS pc FROM g WHERE term = 'row'),
       |m AS (
       |  SELECT a.doc_id,
       |    len(list_intersect(list_intersect(pa,
       |      list_transform(pb, x -> x - 1)),
       |      list_transform(pc, x -> x - 2)))::BIGINT AS n_phrase,
       |    3::BIGINT AS n_terms_used
       |  FROM a JOIN b USING (doc_id) JOIN c USING (doc_id))
       |SELECT doc_id, n_phrase, n_terms_used FROM m WHERE n_phrase > 0
       |ORDER BY n_phrase DESC, doc_id LIMIT 20""".stripMargin
  }

  /** q208: hybrid RRF with the BM25 leg — q150's fusion shape with the
    * lexical ranker upgraded from the TF×rarity weight to the stored-
    * index Okapi BM25 (q206): the composition a production RAG stack
    * actually runs (BM25 + dense, rank-fused). Both legs top-50, RRF =
    * Σ 10⁶ div (60 + rank) — rank-based so the incomparable score
    * scales never touch, integer so the fusion is hash-exact. The
    * lexical leg probes the MATERIALIZED index (no documents scan —
    * same plan guard class as q44/q206).
    */
  /** (r11) Both legs are STORED-index probes now, through the
    * parameterized engine API itself (graft.search.HybridSearch): the
    * lexical leg probes the postings snapshot, the dense leg probes
    * the ANN snapshot's nprobe list dirs — the full embeddings scan
    * the r10 verdict flagged is gone, and this oracle entry pins the
    * API code path, not a twin reimplementation.
    */
  def q208HybridBm25Rrf(spark: SparkSession, dir: String): DataFrame = {
    val qv = graft.rag.AnnStore.vectorOf(spark, dir, 7L)
    graft.search.HybridSearch.hybridSearch(spark, dir,
      Seq("vector", "merge", "batch"), qv, topK = 10, legK = 50,
      excludeId = Some(7L))
  }

  val q208Sql: String = {
    val dot = OracleSql.dotFold("e.embedding", "q.q_emb")
    s"""WITH ${OracleSql.annQuantizerCtes(graft.rag.AnnStore.NumLists)},
       |tok AS (
       |  SELECT doc_id, unnest(${OracleSql.tokens("lower(text)")}) AS term
       |  FROM documents),
       |dlen AS (SELECT doc_id, COUNT(*)::BIGINT AS dl FROM tok GROUP BY 1),
       |st AS (SELECT (SELECT COUNT(*) FROM documents)::BIGINT AS n_docs,
       |              (SELECT COUNT(*) FROM tok)::BIGINT AS t_total),
       |p AS (
       |  SELECT doc_id, term, COUNT(*)::BIGINT AS tf
       |  FROM tok WHERE term IN ('vector', 'merge', 'batch')
       |  GROUP BY 1, 2),
       |w AS (
       |  SELECT term,
       |    len(bin(greatest((2 * ((SELECT n_docs FROM st) - COUNT(*)) + 1)
       |      // (2 * COUNT(*) + 1), 1)))::BIGINT AS idf_class
       |  FROM p GROUP BY term),
       |scored AS (
       |  SELECT p.doc_id, SUM(
       |    ((220 * p.tf * 1000000) // (100 * p.tf +
       |      (120 * (25 * st.t_total + 75 * d.dl * st.n_docs))
       |        // (100 * st.t_total))) * w.idf_class)::BIGINT AS s
       |  FROM p JOIN w USING (term) JOIN dlen d USING (doc_id), st
       |  GROUP BY p.doc_id),
       |kw AS (
       |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS rank_kw
       |  FROM scored ORDER BY s DESC, doc_id LIMIT 50),
       |q AS (SELECT m AS qm, embedding AS q_emb FROM fx WHERE vec_id = 7),
       |plists AS (
       |  SELECT c.list_id FROM ann_cent c, q
       |  ORDER BY ${OracleSql.annScore("q.qm", "c.c")}, c.list_id
       |  LIMIT ${graft.rag.AnnStore.DefaultNprobe}),
       |vec AS (
       |  SELECT e.vec_id AS doc_id,
       |    ROW_NUMBER() OVER (ORDER BY $dot DESC, e.vec_id) AS rank_vec
       |  FROM fx e JOIN ann_asg a USING (vec_id), q
       |  WHERE a.list_id IN (SELECT list_id FROM plists) AND e.vec_id <> 7
       |  ORDER BY $dot DESC, e.vec_id LIMIT 50),
       |fused AS (
       |  SELECT COALESCE(k.doc_id, v.doc_id) AS doc_id,
       |    COALESCE(k.rank_kw, 0)::BIGINT AS rank_kw,
       |    COALESCE(v.rank_vec, 0)::BIGINT AS rank_vec
       |  FROM kw k FULL OUTER JOIN vec v ON k.doc_id = v.doc_id)
       |SELECT doc_id, rank_kw, rank_vec,
       |  ((CASE WHEN rank_kw > 0 THEN 1000000 // (60 + rank_kw) ELSE 0 END) +
       |   (CASE WHEN rank_vec > 0 THEN 1000000 // (60 + rank_vec) ELSE 0 END))::BIGINT
       |    AS rrf_micro
       |FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT 10""".stripMargin
  }

  /** q214: FILTERED hybrid search — q208's two stored-index legs with
    * q212's metadata predicate composed into BOTH: the dense leg
    * pushes `label = 3` into its pruned list scan, the lexical leg
    * keeps only its top-legK BM25 hits that satisfy it (resolved
    * through the id-map sidecar — a pruned bucket read of ≤legK keys,
    * never a corpus scan) and re-ranks among survivors. Pool-then-
    * filter semantics on both legs, with legK/nprobe as the recall
    * knobs (pgvector's iterative-scan guidance). Pins the engine API
    * code path (HybridSearch.hybridSearch(where)).
    */
  def q214FilteredHybrid(spark: SparkSession, dir: String): DataFrame = {
    val qv = graft.rag.AnnStore.vectorOf(spark, dir, 7L)
    graft.search.HybridSearch.hybridSearch(spark, dir,
      Seq("vector", "merge", "batch"), qv, topK = 10, legK = 50,
      nprobe = 8, excludeId = Some(7L),
      where = Some(col("label") === 3))
  }

  val q214Sql: String = {
    val dot = OracleSql.dotFold("e.embedding", "q.q_emb")
    s"""WITH ${OracleSql.annQuantizerCtes(graft.rag.AnnStore.NumLists)},
       |tok AS (
       |  SELECT doc_id, unnest(${OracleSql.tokens("lower(text)")}) AS term
       |  FROM documents),
       |dlen AS (SELECT doc_id, COUNT(*)::BIGINT AS dl FROM tok GROUP BY 1),
       |st AS (SELECT (SELECT COUNT(*) FROM documents)::BIGINT AS n_docs,
       |              (SELECT COUNT(*) FROM tok)::BIGINT AS t_total),
       |p AS (
       |  SELECT doc_id, term, COUNT(*)::BIGINT AS tf
       |  FROM tok WHERE term IN ('vector', 'merge', 'batch')
       |  GROUP BY 1, 2),
       |w AS (
       |  SELECT term,
       |    len(bin(greatest((2 * ((SELECT n_docs FROM st) - COUNT(*)) + 1)
       |      // (2 * COUNT(*) + 1), 1)))::BIGINT AS idf_class
       |  FROM p GROUP BY term),
       |scored AS (
       |  SELECT p.doc_id, SUM(
       |    ((220 * p.tf * 1000000) // (100 * p.tf +
       |      (120 * (25 * st.t_total + 75 * d.dl * st.n_docs))
       |        // (100 * st.t_total))) * w.idf_class)::BIGINT AS s
       |  FROM p JOIN w USING (term) JOIN dlen d USING (doc_id), st
       |  GROUP BY p.doc_id),
       |kw0 AS (SELECT doc_id, s FROM scored ORDER BY s DESC, doc_id LIMIT 50),
       |kw AS (
       |  SELECT k.doc_id,
       |    ROW_NUMBER() OVER (ORDER BY k.s DESC, k.doc_id) AS rank_kw
       |  FROM kw0 k JOIN fx e ON e.vec_id = k.doc_id WHERE e.label = 3),
       |q AS (SELECT m AS qm, embedding AS q_emb FROM fx WHERE vec_id = 7),
       |plists AS (
       |  SELECT c.list_id FROM ann_cent c, q
       |  ORDER BY ${OracleSql.annScore("q.qm", "c.c")}, c.list_id
       |  LIMIT 8),
       |vec AS (
       |  SELECT e.vec_id AS doc_id,
       |    ROW_NUMBER() OVER (ORDER BY $dot DESC, e.vec_id) AS rank_vec
       |  FROM fx e JOIN ann_asg a USING (vec_id), q
       |  WHERE a.list_id IN (SELECT list_id FROM plists)
       |    AND e.vec_id <> 7 AND e.label = 3
       |  ORDER BY $dot DESC, e.vec_id LIMIT 50),
       |fused AS (
       |  SELECT COALESCE(k.doc_id, v.doc_id) AS doc_id,
       |    COALESCE(k.rank_kw, 0)::BIGINT AS rank_kw,
       |    COALESCE(v.rank_vec, 0)::BIGINT AS rank_vec
       |  FROM kw k FULL OUTER JOIN vec v ON k.doc_id = v.doc_id)
       |SELECT doc_id, rank_kw, rank_vec,
       |  ((CASE WHEN rank_kw > 0 THEN 1000000 // (60 + rank_kw) ELSE 0 END) +
       |   (CASE WHEN rank_vec > 0 THEN 1000000 // (60 + rank_vec) ELSE 0 END))::BIGINT
       |    AS rrf_micro
       |FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT 10""".stripMargin
  }

  /** q216: ADAPTIVE filtered hybrid search — q214's pool-then-filter
    * legs with the iterative-scan loop (HybridSearch.
    * hybridSearchAdaptive): while the fused result holds fewer than
    * topK docs, legK and nprobe double together and both stored-index
    * probes re-run, capping at (all lists, maxLegK) — the dense leg's
    * exhaustive rung covers the corpus, so ≥ topK matches corpus-wide
    * guarantee exactly topK fused rows. `nprobe_used`/`leg_k_used`
    * pin the rung the loop landed on; the DuckDB twin replays every
    * rung's two legs and fused count from scratch, so the STOPPING
    * decision is hash-gated, not just the final ranking.
    */
  def q216AdaptiveFilteredHybrid(spark: SparkSession, dir: String): DataFrame = {
    val qv = graft.rag.AnnStore.vectorOf(spark, dir, 7L)
    graft.search.HybridSearch.hybridSearchAdaptive(spark, dir,
      Seq("vector", "merge", "batch"), qv, topK = 10, legK = 50,
      nprobe = 8, excludeId = Some(7L),
      where = Some(col("label") === 3))
  }

  val q216Sql: String = {
    val dot = OracleSql.dotFold("e.embedding", "q.q_emb")
    s"""WITH ${OracleSql.annQuantizerCtes(graft.rag.AnnStore.NumLists)},
       |tok AS (
       |  SELECT doc_id, unnest(${OracleSql.tokens("lower(text)")}) AS term
       |  FROM documents),
       |dlen AS (SELECT doc_id, COUNT(*)::BIGINT AS dl FROM tok GROUP BY 1),
       |st AS (SELECT (SELECT COUNT(*) FROM documents)::BIGINT AS n_docs,
       |              (SELECT COUNT(*) FROM tok)::BIGINT AS t_total),
       |p AS (
       |  SELECT doc_id, term, COUNT(*)::BIGINT AS tf
       |  FROM tok WHERE term IN ('vector', 'merge', 'batch')
       |  GROUP BY 1, 2),
       |w AS (
       |  SELECT term,
       |    len(bin(greatest((2 * ((SELECT n_docs FROM st) - COUNT(*)) + 1)
       |      // (2 * COUNT(*) + 1), 1)))::BIGINT AS idf_class
       |  FROM p GROUP BY term),
       |scored AS (
       |  SELECT p.doc_id, SUM(
       |    ((220 * p.tf * 1000000) // (100 * p.tf +
       |      (120 * (25 * st.t_total + 75 * d.dl * st.n_docs))
       |        // (100 * st.t_total))) * w.idf_class)::BIGINT AS s
       |  FROM p JOIN w USING (term) JOIN dlen d USING (doc_id), st
       |  GROUP BY p.doc_id),
       |rungs AS (SELECT * FROM (VALUES (0, 50, 8), (1, 100, 16),
       |  (2, 200, 16), (3, 400, 16), (4, 800, 16)) AS r(rung, lk, np)),
       |q AS (SELECT m AS qm, embedding AS q_emb FROM fx WHERE vec_id = 7),
       |pl AS (
       |  SELECT c.list_id,
       |    ROW_NUMBER() OVER (ORDER BY ${OracleSql.annScore("q.qm", "c.c")},
       |      c.list_id) AS rn
       |  FROM ann_cent c, q),
       |kw0 AS (
       |  SELECT r.rung, r.lk, s.doc_id, s.s,
       |    ROW_NUMBER() OVER (PARTITION BY r.rung
       |      ORDER BY s.s DESC, s.doc_id) AS pos
       |  FROM scored s CROSS JOIN rungs r),
       |kw AS (
       |  SELECT k.rung, k.doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY k.rung
       |      ORDER BY k.s DESC, k.doc_id) AS rank_kw
       |  FROM kw0 k JOIN fx e ON e.vec_id = k.doc_id
       |  WHERE k.pos <= k.lk AND e.label = 3),
       |vec AS (
       |  SELECT rung, doc_id, rank_vec FROM (
       |    SELECT r.rung, r.lk, e.vec_id AS doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY r.rung
       |        ORDER BY $dot DESC, e.vec_id) AS rank_vec
       |    FROM fx e JOIN ann_asg a USING (vec_id)
       |      JOIN pl pp ON a.list_id = pp.list_id
       |      CROSS JOIN rungs r, q
       |    WHERE pp.rn <= r.np AND e.vec_id <> 7 AND e.label = 3)
       |  WHERE rank_vec <= lk),
       |fused AS (
       |  SELECT COALESCE(k.rung, v.rung) AS rung,
       |    COALESCE(k.doc_id, v.doc_id) AS doc_id,
       |    COALESCE(k.rank_kw, 0)::BIGINT AS rank_kw,
       |    COALESCE(v.rank_vec, 0)::BIGINT AS rank_vec
       |  FROM kw k FULL OUTER JOIN vec v
       |    ON k.rung = v.rung AND k.doc_id = v.doc_id),
       |counts AS (
       |  SELECT r.rung,
       |    (SELECT COUNT(*) FROM fused f WHERE f.rung = r.rung) AS n
       |  FROM rungs r),
       |chosen AS (
       |  SELECT COALESCE(MIN(rung) FILTER (WHERE n >= 10), 4) AS rung
       |  FROM counts)
       |SELECT f.doc_id, f.rank_kw, f.rank_vec,
       |  ((CASE WHEN f.rank_kw > 0 THEN 1000000 // (60 + f.rank_kw) ELSE 0 END) +
       |   (CASE WHEN f.rank_vec > 0 THEN 1000000 // (60 + f.rank_vec) ELSE 0 END))::BIGINT
       |    AS rrf_micro,
       |  (SELECT r.np FROM rungs r, chosen ch WHERE r.rung = ch.rung)::BIGINT
       |    AS nprobe_used,
       |  (SELECT r.lk FROM rungs r, chosen ch WHERE r.rung = ch.rung)::BIGINT
       |    AS leg_k_used
       |FROM fused f, chosen ch
       |WHERE f.rung = ch.rung
       |ORDER BY rrf_micro DESC, doc_id LIMIT 10""".stripMargin
  }

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q208_hybrid_bm25_rrf" -> (q208HybridBm25Rrf _),
    "q214_filtered_hybrid" -> (q214FilteredHybrid _),
    "q216_adaptive_filtered_hybrid" -> (q216AdaptiveFilteredHybrid _),
    "q206_bm25_ranking" -> (q206Bm25Ranking _),
    "q207_phrase_trigram" -> (q207PhraseTrigram _),
    "q205_stored_index_audit" -> (q205StoredIndexAudit _),
    "q203_phrase_search" -> (q203PhraseSearch _),
    "q127_tfidf_terms" -> (q127TfIdf _),
    "q149_index_merge" -> (q149IndexMerge _),
    "q150_hybrid_rrf" -> (q150HybridRrf _),
    "q152_conversion_latency" -> (q152ConversionLatency _),
    "q155_source_similarity" -> (q155SourceSimilarity _),
    "q158_session_surprisal" -> (q158SessionSurprisal _),
    "q125_frequent_paths" -> (q125FrequentPaths _),
    "q121_markov_transitions" -> (q121MarkovTransitions _),
    "q37_sessionize" -> (q37Sessionize _),
    "q44_keyword_search" -> (q44KeywordSearch _),
    "q48_asof_join" -> (q48AsofJoin _),
    "q49_range_join" -> (q49RangeJoin _),
    "q88_funnel" -> (q88Funnel _),
  )

  val oracle: Map[String, String] = Map(
    "q208_hybrid_bm25_rrf" -> q208Sql,
    "q214_filtered_hybrid" -> q214Sql,
    "q216_adaptive_filtered_hybrid" -> q216Sql,
    "q206_bm25_ranking" -> q206Sql,
    "q207_phrase_trigram" -> q207Sql,
    "q205_stored_index_audit" -> q205Sql,
    "q203_phrase_search" -> q203Sql,
    "q127_tfidf_terms" -> q127Sql,
    "q149_index_merge" -> q149Sql,
    "q150_hybrid_rrf" -> q150Sql,
    "q152_conversion_latency" -> q152Sql,
    "q155_source_similarity" -> q155Sql,
    "q158_session_surprisal" -> q158Sql,
    "q125_frequent_paths" -> q125Sql,
    "q121_markov_transitions" -> q121Sql,
    "q37_sessionize" -> q37Sql,
    "q44_keyword_search" -> q44Sql,
    "q48_asof_join" -> q48Sql,
    "q49_range_join" -> q49Sql,
    "q88_funnel" -> q88Sql,
  )
}
