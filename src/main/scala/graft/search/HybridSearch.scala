package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    */
  def hybridSearch(spark: SparkSession, dir: String, terms: Seq[String],
      queryVec: Array[Float], topK: Int = 10, legK: Int = 50,
      nprobe: Int = AnnStore.DefaultNprobe,
      maxTermDf: Long = PostingsIndex.DefaultMaxTermDf,
      excludeId: Option[Long] = None): DataFrame = {
    require(terms.nonEmpty, "hybrid search needs at least one term")
    require(topK >= 1 && legK >= topK, "need legK >= topK >= 1")
    val kw = PostingsIndex.bm25Search(spark, dir, terms, topK = legK,
      maxTermDf = maxTermDf)
      .withColumn("rank_kw", row_number().over(
        Window.orderBy(desc("score_micro"), asc("doc_id"))).cast("long"))
      .select("doc_id", "rank_kw")
    val vec = AnnStore.denseSearch(spark, dir, queryVec, topK = legK,
      nprobe = nprobe, excludeId = excludeId)
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
}
