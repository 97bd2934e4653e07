package graft.search

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.rag.AnnStore

/** Hybrid retrieval as a first-class engine API (r10 verdict item 7):
  * the BM25 leg probes the MATERIALIZED postings index
  * ([[PostingsIndex.bm25Search]]) and the dense leg probes the
  * MATERIALIZED ANN index ([[AnnStore.denseSearch]]) — both
  * index-backed, so a hybrid query's cost is df(terms) + nprobe list
  * dirs, never a corpus pass — fused by reciprocal-rank (Cormack et
  * al.): score(d) = Σ_legs 10⁶ div (60 + rank_d), rank-based so the
  * incomparable score scales never touch, integer so the fusion is
  * hash-exact. Docs found by only one leg still fuse (full outer
  * join); the per-leg rank windows ride ≤ legK-row frames.
  *
  * q208 pins this exact composition against the DuckDB oracle with
  * fixed terms/query — the API is the oracled code path, not a
  * parallel reimplementation.
  */
object HybridSearch {

  /** Top-`topK` doc ids by RRF over the two stored-index legs.
    * Returns (doc_id, rank_kw, rank_vec, rrf_micro) — rank 0 marks
    * "not in that leg's top-legK".
    *
    * @param excludeId drop one corpus id from the dense leg (queries
    *   issued "by corpus member" exclude themselves, rag.py's search
    *   never returns the query row)
    * @param where optional metadata predicate (the corpus's metadata
    *   columns) — FILTERED hybrid search: the dense leg pushes it
    *   into the pruned list scan (AnnStore v3's filtered-scan case),
    *   the lexical leg keeps only its top-legK hits that satisfy it,
    *   resolved through the id-map sidecar (a pruned bucket read of
    *   ≤legK keys — never a corpus-side lookback) and RE-RANKED among
    *   the survivors. Both legs are pool-then-filter: a highly
    *   selective predicate thins the pools, so widen legK/nprobe for
    *   recall — the same knob-not-loop guidance as q212.
    */
  def hybridSearch(spark: SparkSession, dir: String, terms: Seq[String],
      queryVec: Array[Float], topK: Int = 10, legK: Int = 50,
      nprobe: Int = AnnStore.DefaultNprobe,
      maxTermDf: Long = PostingsIndex.DefaultMaxTermDf,
      excludeId: Option[Long] = None,
      where: Option[Column] = None): DataFrame = {
    require(terms.nonEmpty, "hybrid search needs at least one term")
    require(topK >= 1 && legK >= topK, "need legK >= topK >= 1")
    val kwHits0 = PostingsIndex.bm25Search(spark, dir, terms, topK = legK,
      maxTermDf = maxTermDf)
    val kwKept = where match {
      case None => kwHits0
      case Some(p) =>
        // the ≤legK-row hit frame collects ONCE (API-boundary bounded
        // frame, the centroid-rank convention): the postings store is
        // probed a single time, the bucket set and the semi-join both
        // ride the local relation, and the metadata check is a pruned
        // id-map bucket read
        import spark.implicits._
        val hits = kwHits0.select("doc_id", "score_micro").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        val hitDf = hits.toDF("doc_id", "score_micro")
        val store = AnnStore.ensure(spark, dir)
        val ok = AnnStore.mapRows(store,
          hitDf.select(col("doc_id").as("id"))).filter(p)
        hitDf.join(ok.select(col("id").as("doc_id")),
          Seq("doc_id"), "left_semi")
    }
    val kw = kwKept
      .withColumn("rank_kw", row_number().over(
        Window.orderBy(desc("score_micro"), asc("doc_id"))).cast("long"))
      .select("doc_id", "rank_kw")
    val vec = AnnStore.denseSearch(spark, dir, queryVec, topK = legK,
      nprobe = nprobe, excludeId = excludeId, where = where)
      .withColumn("rank_vec", row_number().over(
        Window.orderBy(desc("cosine"), asc("id"))).cast("long"))
      .select(col("id").as("doc_id"), col("rank_vec"))
    kw.join(vec, Seq("doc_id"), "full_outer")
      .na.fill(0L, Seq("rank_kw", "rank_vec"))
      .withColumn("rrf_micro",
        expr("(case when rank_kw > 0 then 1000000 div (60 + rank_kw) else 0 end)" +
          " + (case when rank_vec > 0 then 1000000 div (60 + rank_vec) else 0 end)"))
      .orderBy(desc("rrf_micro"), asc("doc_id")).limit(topK)
      .select("doc_id", "rank_kw", "rank_vec", "rrf_micro")
  }

  /** FILTERED hybrid search with the iterative-scan treatment
    * ([[graft.rag.AnnStore.denseSearchAdaptive]]'s loop applied to
    * both legs): while the fused result holds fewer than `topK` docs,
    * DOUBLE legK and nprobe together and re-run the same two pruned
    * index probes, until k fused survivors or both legs hit their
    * caps (nprobe = all lists, legK ≥ maxLegK). At full width the
    * dense leg covers the whole corpus, so whenever ≥ topK matches
    * exist corpus-wide the fused result has exactly topK rows.
    * Per-rung cost stays two index probes + a ≤legK metadata check —
    * the loop trades a bounded number of re-probes for the recall the
    * fixed-width variant documents as a manual knob.
    */
  def hybridSearchAdaptive(spark: SparkSession, dir: String,
      terms: Seq[String], queryVec: Array[Float], topK: Int = 10,
      legK: Int = 50, nprobe: Int = AnnStore.DefaultNprobe,
      maxLegK: Int = 800,
      maxTermDf: Long = PostingsIndex.DefaultMaxTermDf,
      excludeId: Option[Long] = None,
      where: Option[Column] = None): DataFrame = {
    val lists = AnnStore.centroidsLocal(spark, dir).size
    var lk = math.max(legK, topK)
    var np = math.min(math.max(nprobe, 1), lists)
    while (true) {
      val fused = hybridSearch(spark, dir, terms, queryVec, topK = topK,
        legK = lk, nprobe = np, maxTermDf = maxTermDf,
        excludeId = excludeId, where = where)
        .localCheckpoint(true) // ≤topK rows; counted AND returned
      val atCap = np >= lists && lk >= maxLegK
      if (atCap || fused.count() >= topK)
        return fused.withColumn("nprobe_used", lit(np.toLong))
          .withColumn("leg_k_used", lit(lk.toLong))
      np = math.min(np * 2, lists)
      lk = math.min(lk * 2, maxLegK)
    }
    sys.error("unreachable")
  }
}
