package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.rag.{Embedder, HashingEmbedder, RagPipeline}

/** API response models (reference api.py:76-110 Pydantic models). */
final case class CaseSummary(case_number: String, title: String,
    filed_date: String, judge: Option[String], court: Option[String],
    status: String)
final case class CaseDetail(case_number: String, title: String,
    filed_date: String, judge: Option[String], court: Option[String],
    case_type: Option[String], status: String, docket_text: String)
final case class PartyRow(name: String, normalized_name: String, role: String)
final case class SearchResult(case_number: String, title: String,
    filed_date: String, judge: Option[String], court: Option[String],
    best_similarity: Double, best_chunk_id: Int, best_chunk_snippet: String)
final case class KeywordHit(case_number: String, score: Long,
    n_terms_matched: Long)
final case class Bm25Hit(case_number: String, score_micro: Long,
    n_terms_matched: Long)
final case class PhraseHit(case_number: String, n_phrase: Long,
    n_terms_used: Long)
final case class HybridHit(case_number: String, rank_kw: Long,
    rank_vec: Long, rrf_micro: Long)
final case class AnnSearchHit(case_number: String, best_cosine: Double)

object GraftApi {
  /** The case-attribute equality filters the filtered-search endpoints
    * accept (the engine's q212/q214 `where` predicates surfaced to the
    * REST layer as a JSON object). A key outside this set rejects with
    * IllegalArgumentException — the HTTP layer's 422, the reference's
    * validation convention (api.py:64-73).
    */
  val FilterFields: Set[String] =
    Set("case_number", "status", "filed_year", "judge", "court", "case_type")
}

/** The query facade — the three REST endpoints of the reference
  * (api.py:154-270) as typed methods over registered tables. All
  * filters reach the Parquet scans (predicate pushdown stands in for
  * the reference's B-tree indexes, SURVEY §4); dim joins broadcast.
  */
/** @param searchStore the ingest SnapshotStore carrying the stored
  *   search indexes the streaming commit maintains — the docket
  *   postings tables (StreamingPostings) for the keyword/BM25/phrase
  *   endpoints, and the chunk-ANN tables (RagPipeline.indexChunks)
  *   that let searchDockets probe `nprobe` pruned lists instead of
  *   scanning every chunk embedding.
  */
final class GraftApi(spark: SparkSession, cases: DataFrame, judges: DataFrame,
    courts: DataFrame, caseTypes: DataFrame, parties: DataFrame,
    caseParties: DataFrame, embeddings: Option[DataFrame] = None,
    embedder: Embedder = HashingEmbedder(),
    searchStore: Option[graft.store.SnapshotStore] = None) {
  import spark.implicits._

  private def withDims(df: DataFrame): DataFrame = df
    .join(broadcast(judges.select(col("id").as("judge_id"),
      col("full_name").as("judge"))), Seq("judge_id"), "left")
    .join(broadcast(courts.select(col("id").as("court_id"),
      col("name").as("court"))), Seq("court_id"), "left")

  /** GET /cases?judge=&year= (api.py:154-199): at least one filter
    * required (400 in the reference, api.py:164-168); judge matches
    * normalized_name exactly; newest 200 by filed_date.
    */
  def listCases(judge: Option[String] = None, year: Option[Int] = None,
      limit: Int = 200): Dataset[CaseSummary] = {
    require(judge.isDefined || year.isDefined,
      "at least one filter (judge, year) is required")
    year.foreach(y => require(y >= 1900 && y <= 2100,
      "year must be in [1900, 2100]")) // api.py:156-157
    var df = cases
    judge.foreach { j =>
      val jid = judges.filter(col("normalized_name") === j.toLowerCase)
        .select(col("id").as("judge_id"))
      df = df.join(broadcast(jid), Seq("judge_id"))
    }
    year.foreach { y =>
      // The cases snapshot is hive-partitioned by filed_year
      // (IngestJob writes it; SnapshotStore.write partitionCols), and
      // Spark cannot rewrite year(filed_date)=y into directory
      // pruning — filter on the partition column explicitly so the
      // scan reads ONE year directory instead of the whole snapshot
      // (the B-tree-index equivalent of reference api.py:171-178 at
      // 100 TB). The filed_date predicate stays for inputs that lack
      // the partition column (e.g. ad-hoc DataFrames in tests).
      if (df.columns.contains("filed_year"))
        df = df.filter(col("filed_year") === y)
      df = df.filter(org.apache.spark.sql.functions.year(col("filed_date")) === y)
    }
    withDims(df)
      .select(col("case_number"), coalesce(col("title"), lit("")).as("title"),
        date_format(col("filed_date"), "yyyy-MM-dd").as("filed_date"),
        col("judge"), col("court"), col("status"))
      .orderBy(desc("filed_date"), asc("case_number"))
      .limit(limit)
      .as[CaseSummary]
  }

  /** GET /cases/{case_number} detail row with the case-type dim join
    * (api.py:221-249, J2).
    */
  def getCase(caseNumber: String): Option[CaseDetail] =
    withDims(cases.filter(col("case_number") === caseNumber))
      .join(broadcast(caseTypes.select(col("id").as("case_type_id"),
        col("name").as("case_type"))), Seq("case_type_id"), "left")
      .select(col("case_number"), coalesce(col("title"), lit("")).as("title"),
        date_format(col("filed_date"), "yyyy-MM-dd").as("filed_date"),
        col("judge"), col("court"), col("case_type"), col("status"),
        coalesce(col("docket_text"), lit("")).as("docket_text"))
      .as[CaseDetail].collect().headOption

  /** Parties of a case, ordered by (role, name) (api.py:252-262). */
  def getParties(caseNumber: String): Seq[PartyRow] =
    caseParties
      .join(cases.select(col("id").as("case_id"), col("case_number")), Seq("case_id"))
      .filter(col("case_number") === caseNumber)
      .join(broadcast(parties.select(col("id").as("party_id"), col("name"),
        col("normalized_name"))), Seq("party_id"))
      .select(col("name"), col("normalized_name"), col("role"))
      .orderBy("role", "name")
      .as[PartyRow].collect().toSeq

  /** POST /cases/search (api.py:202-218 → rag.py:158-227). When the
    * search store carries a chunk-ANN index, candidates come from the
    * STORED index's nprobe-pruned lists (the reference's actual plan:
    * its IVFFLAT probe, rag.py:179-180); otherwise the exact chunk
    * scan — same contract, exhaustive pool.
    */
  def searchDockets(query: String, topK: Int = 5): Seq[SearchResult] = {
    require(topK >= 1 && topK <= 50, "top_k must be in [1, 50]") // api.py:66
    require(query != null && query.trim.length >= 2,
      "query must be at least 2 characters") // api.py:64-73
    searchStore.filter(_.currentVersion("chunk_ann_centroids").isDefined) match {
      case Some(st) =>
        RagPipeline.searchStored(st, cases, judges, courts,
          embedder.embed(query), topK).as[SearchResult].collect().toSeq
      case None =>
        val emb = embeddings.getOrElse(
          throw new IllegalStateException("no embedding table loaded"))
        RagPipeline.searchText(emb, cases, judges, courts, query, topK,
          embedder).as[SearchResult].collect().toSeq
    }
  }

  // ---------------------------------------------------------------
  // parameterized full-text endpoints over the STORED docket postings
  // index (the GIN capability, schema.sql:141 — maintained inside the
  // streaming ingest commit, probed here with bucket pruning)
  // ---------------------------------------------------------------

  private def postingsFrames: (DataFrame, DataFrame) = {
    val st = searchStore.getOrElse(
      throw new IllegalStateException("no search index loaded"))
    if (st.currentVersion("postings").isEmpty)
      throw new IllegalStateException("search store has no postings index")
    // the serving view: identical to the raw table on LWW-maintained
    // stores (no tombstones), and the dead-generation filter on
    // segment-maintained ones (StreamingPostings.processBatchAppend)
    (graft.streaming.StreamingPostings.servingPostings(st),
      st.read("postings_stats").get)
  }

  /** Reference validation conventions (api.py:64-73's pattern): at
    * least one non-blank term, k in [1, 50].
    */
  private def validated(terms: Seq[String], topK: Int): Seq[String] = {
    require(topK >= 1 && topK <= 50, "top_k must be in [1, 50]")
    require(terms != null && terms.nonEmpty,
      "at least one search term is required")
    val t = terms.map(s => Option(s).getOrElse("").trim).filter(_.nonEmpty)
    require(t.nonEmpty, "at least one non-blank search term is required")
    t
  }

  /** Resolve doc_id (the case surrogate id the index is keyed by) to
    * case_number, preserving the hit order.
    */
  private def withCaseNumbers(hits: DataFrame, orderCol: String): DataFrame =
    cases.select(col("id").as("doc_id"), col("case_number"))
      .join(broadcast(hits), Seq("doc_id"))
      .orderBy(desc(orderCol), asc("doc_id"))

  /** POST /search/keyword — deterministic TF×rarity ranking over the
    * stored index (PostingsIndex.keywordSearchFrames).
    */
  def keywordSearch(terms: Seq[String], topK: Int = 20): Seq[KeywordHit] = {
    val t = validated(terms, topK)
    val (posts, stats) = postingsFrames
    val hits = graft.search.PostingsIndex.keywordSearchFrames(posts, stats,
      t, topK, numBuckets = graft.search.PostingsIndex.numBucketsOf(stats))
    withCaseNumbers(hits, "score")
      .select("case_number", "score", "n_terms_matched")
      .as[KeywordHit].collect().toSeq
  }

  /** POST /search/bm25 — Okapi BM25 (exact integer fixed-point) over
    * the stored index.
    */
  def bm25Search(terms: Seq[String], topK: Int = 20): Seq[Bm25Hit] = {
    val t = validated(terms, topK)
    val (posts, stats) = postingsFrames
    val hits = graft.search.PostingsIndex.bm25SearchFrames(posts, stats,
      t, topK, numBuckets = graft.search.PostingsIndex.numBucketsOf(stats))
    withCaseNumbers(hits, "score_micro")
      .select("case_number", "score_micro", "n_terms_matched")
      .as[Bm25Hit].collect().toSeq
  }

  /** The cases frame narrowed by the equality-filter object (validated
    * against [[GraftApi.FilterFields]]): scalar attributes filter the
    * (year-partition-pruned) cases scan directly; dim attributes
    * resolve through normalized-name broadcast joins, exactly
    * listCases' conventions.
    */
  private def filteredCases(where: Map[String, String]): DataFrame = {
    where.keys.find(!GraftApi.FilterFields(_)).foreach(k =>
      throw new IllegalArgumentException(s"unknown filter field: $k"))
    var df = cases
    where.foreach {
      case ("case_number", v) => df = df.filter(col("case_number") === v)
      case ("status", v) => df = df.filter(col("status") === v)
      case ("filed_year", v) =>
        val y = v.toIntOption.getOrElse(throw new IllegalArgumentException(
          "filed_year must be an integer"))
        if (df.columns.contains("filed_year"))
          df = df.filter(col("filed_year") === y)
        df = df.filter(org.apache.spark.sql.functions.year(col("filed_date")) === y)
      case ("judge", v) =>
        df = df.join(broadcast(judges
          .filter(col("normalized_name") === v.toLowerCase)
          .select(col("id").as("judge_id"))), Seq("judge_id"))
      case ("court", v) =>
        // normalize the client's value the way ingest normalized the
        // dim ("S.D.N.Y." → "SDNY") — the display form the API itself
        // returns must match, mirroring the judge filter's lowercase
        df = df.join(broadcast(courts
          .filter(col("normalized_name") ===
            graft.functions.DocketFunctions.normCourt(lit(v)))
          .select(col("id").as("court_id"))), Seq("court_id"))
      case ("case_type", v) =>
        df = df.join(broadcast(caseTypes
          .filter(col("name") === v)
          .select(col("id").as("case_type_id"))), Seq("case_type_id"))
      case (k, _) => throw new IllegalArgumentException(s"unknown filter field: $k")
    }
    df
  }

  /** Keep only the hits (a bounded ≤legK frame with a `case_number`
    * column) whose case satisfies the filter object. The hit keys
    * collect ONCE (API-boundary bounded frame, the HybridSearch
    * lexical-leg convention) and ride INTO the cases scan as a literal
    * IN, so the metadata check is a PUSHED-predicate scan — parquet
    * row-group pruning applies — never an unpushed corpus-side join
    * re-run per adaptive rung. The caller materializes `hits` first
    * (it is read twice: the key collect and the survivor filter).
    */
  private def keepFiltered(hits: DataFrame,
      where: Map[String, String]): DataFrame = {
    if (where.isEmpty) return hits
    val keys = hits.select("case_number").distinct().collect()
      .map(_.getString(0)).toSeq
    if (keys.isEmpty) return hits
    val ok = filteredCases(where)
      .filter(col("case_number").isin(keys: _*))
      .select("case_number").collect().map(_.getString(0)).toSeq
    if (ok.isEmpty) hits.filter(lit(false))
    else hits.filter(col("case_number").isin(ok: _*))
  }

  /** POST /search/ann — dense-only case-level search over the STORED
    * chunk-ANN index with optional case-attribute equality filters
    * and the iterative-scan loop: rank cases by their best chunk
    * within nprobe pruned lists, keep cases satisfying the filter,
    * and while fewer than topK survive DOUBLE nprobe and the pool
    * width together (capped at all lists / maxLegK) — the engine's
    * q215 adaptive probe on the docket serving surface.
    */
  def annSearchDockets(query: String, topK: Int = 10,
      where: Map[String, String] = Map.empty,
      maxLegK: Int = 800): Seq[AnnSearchHit] = {
    require(topK >= 1 && topK <= 50, "top_k must be in [1, 50]")
    require(query != null && query.trim.length >= 2,
      "query must be at least 2 characters")
    val st = searchStore.getOrElse(
      throw new IllegalStateException("no search index loaded"))
    val cents = graft.rag.AnnStore.centroidsOf(
      st.read("chunk_ann_centroids").getOrElse(throw new IllegalStateException(
        "search store has no chunk-ANN index")))
    val qv = embedder.embed(query)
    val ranked = graft.rag.AnnStore.probeListsOf(cents, qv, cents.size)
    var np = math.min(graft.rag.AnnStore.DefaultNprobe, ranked.size)
    var legK = math.max(topK * 5, 50)
    while (true) {
      val pool0 = st.read("chunk_ann_assignments").get
        .filter(col("list_id").isin(ranked.take(np): _*))
        .withColumn("cos", graft.functions.VectorFunctions
          .dotFold(col("embedding"), typedlit(qv.toSeq)))
        .groupBy("case_number").agg(max("cos").as("best_cosine"))
        .orderBy(desc("best_cosine"), asc("case_number")).limit(legK)
      // ≤legK rows, read twice under a filter (key collect + survivors)
      val pool = if (where.isEmpty) pool0 else pool0.localCheckpoint(true)
      val rows = keepFiltered(pool, where)
        .orderBy(desc("best_cosine"), asc("case_number")).limit(topK)
        .as[AnnSearchHit].collect().toSeq
      if (rows.length >= topK || (np >= ranked.size && legK >= maxLegK))
        return rows
      np = math.min(np * 2, ranked.size)
      legK = math.min(legK * 2, maxLegK)
    }
    sys.error("unreachable")
  }

  /** POST /search/hybrid — BM25 + dense reciprocal-rank fusion at the
    * CASE level, both legs stored-index probes: the lexical leg ranks
    * cases through the docket postings snapshot, the dense leg ranks
    * cases by their best chunk within the chunk-ANN index's nprobe
    * pruned lists, and integer RRF (Σ 10⁶ div (60 + rank)) fuses the
    * two incomparable scales. Rank 0 marks "not in that leg's
    * top-legK". With a filter object both legs are pool-then-filter
    * (survivors re-rank) and the iterative-scan loop widens legK and
    * nprobe together until topK fused survivors or the caps.
    */
  def hybridSearchDockets(query: String, topK: Int = 10,
      where: Map[String, String] = Map.empty,
      maxLegK: Int = 800): Seq[HybridHit] = {
    require(topK >= 1 && topK <= 50, "top_k must be in [1, 50]")
    require(query != null && query.trim.length >= 2,
      "query must be at least 2 characters")
    val st = searchStore.getOrElse(
      throw new IllegalStateException("no search index loaded"))
    val terms = query.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val (posts, stats) = postingsFrames
    val cents = graft.rag.AnnStore.centroidsOf(
      st.read("chunk_ann_centroids").getOrElse(throw new IllegalStateException(
        "search store has no chunk-ANN index")))
    val qv = embedder.embed(query)
    val ranked = graft.rag.AnnStore.probeListsOf(cents, qv, cents.size)
    var np = math.min(graft.rag.AnnStore.DefaultNprobe, ranked.size)
    var legK = math.max(topK * 5, 50)
    import org.apache.spark.sql.expressions.Window
    while (true) {
      def bounded(df: DataFrame): DataFrame =
        if (where.isEmpty) df else df.localCheckpoint(true)
      val kw = keepFiltered(bounded(withCaseNumbers(
        graft.search.PostingsIndex.bm25SearchFrames(posts, stats, terms, legK,
          numBuckets = graft.search.PostingsIndex.numBucketsOf(stats)),
        "score_micro").select("case_number", "doc_id", "score_micro")), where)
        .withColumn("rank_kw", row_number().over(
          Window.orderBy(desc("score_micro"), asc("doc_id"))).cast("long"))
        .select("case_number", "rank_kw")
      val vec = keepFiltered(bounded(st.read("chunk_ann_assignments").get
        .filter(col("list_id").isin(ranked.take(np): _*))
        .withColumn("cos", graft.functions.VectorFunctions
          .dotFold(col("embedding"), typedlit(qv.toSeq)))
        .groupBy("case_number").agg(max("cos").as("best_cos"))
        .orderBy(desc("best_cos"), asc("case_number")).limit(legK)), where)
        .withColumn("rank_vec", row_number().over(
          Window.orderBy(desc("best_cos"), asc("case_number"))).cast("long"))
        .select("case_number", "rank_vec")
      val fused = kw.join(vec, Seq("case_number"), "full_outer")
        .na.fill(0L, Seq("rank_kw", "rank_vec"))
        .withColumn("rrf_micro",
          expr("(case when rank_kw > 0 then 1000000 div (60 + rank_kw) else 0 end)" +
            " + (case when rank_vec > 0 then 1000000 div (60 + rank_vec) else 0 end)"))
        .orderBy(desc("rrf_micro"), asc("case_number")).limit(topK)
        .select("case_number", "rank_kw", "rank_vec", "rrf_micro")
        .as[HybridHit].collect().toSeq
      if (fused.length >= topK || where.isEmpty ||
        (np >= ranked.size && legK >= maxLegK)) return fused
      np = math.min(np * 2, ranked.size)
      legK = math.min(legK * 2, maxLegK)
    }
    sys.error("unreachable")
  }

  /** POST /search/phrase — n-term positional adjacency over the
    * stored index.
    */
  def phraseSearch(phrase: Seq[String], topK: Int = 20): Seq[PhraseHit] = {
    val t = validated(phrase, topK)
    val (posts, stats) = postingsFrames
    val hits = graft.search.PostingsIndex.phraseSearchFrames(posts, t,
      topK, numBuckets = graft.search.PostingsIndex.numBucketsOf(stats))
    withCaseNumbers(hits, "n_phrase")
      .select("case_number", "n_phrase", "n_terms_used")
      .as[PhraseHit].collect().toSeq
  }
}
