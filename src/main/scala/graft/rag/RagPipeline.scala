package graft.rag

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.DocketScala

/** Pluggable text embedder (SURVEY F13). The reference uses MiniLM
  * (rag.py:26-42); model weights are not hermetic, so the default is a
  * deterministic hashing embedder with the identical contract: a
  * unit-normalized float vector, cosine ≡ dot. Every downstream
  * semantic (candidate pool, best-per-case, top-k, rounding) is
  * embedder-independent.
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]

  /** Batch hook: a real model (ONNX/JNI) overrides this to run one
    * inference call per batch; the default maps singly.
    */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map(embed)
}

final case class HashingEmbedder(dim: Int = 384) extends Embedder {
  override def embed(text: String): Array[Float] = DocketScala.hashEmbed(text, dim)
}

/** The RAG layer (reference rag.py): chunk → embed → backfill →
  * cosine search with case-level aggregation.
  *
  * Scale notes: backfill is an anti-join + flatMap — no driver loop
  * (the reference batches 128 cases per round-trip; a Spark job does
  * the whole corpus in one pass). Search is one scan with a codegen'd
  * dot product and two TakeOrderedAndProject stages — only
  * `max(k*10, 50)` candidate rows and `k` result rows ever cross an
  * exchange. At 100 TB the chunk table gets the hyperplane-LSH cell
  * column of VectorQueries.q41 and a probe scans one cell.
  */
object RagPipeline {

  val ChunkSize = 1200
  val ChunkOverlap = 200
  val SnippetChars = 280

  /** Chunk `docket_text` per case (rag.py:44-69 exact semantics via
    * DocketScala.chunkText). A case whose text yields no chunks gets
    * the reference's sentinel `(0, "")` row (rag.py:146-148), so every
    * case is represented in the embedding table.
    */
  def chunkCases(cases: DataFrame, size: Int = ChunkSize,
      overlap: Int = ChunkOverlap): DataFrame = {
    val chunkUdf = udf((s: String) => {
      val cs = DocketScala.chunkText(s, size, overlap).map(c => (c.chunkId, c.text))
      if (cs.isEmpty) Seq((0, "")) else cs
    })
    cases
      .select(col("case_number"), explode(chunkUdf(col("docket_text"))).as("c"))
      .select(col("case_number"), col("c._1").as("chunk_id"), col("c._2").as("chunk_text"))
  }

  /** Attach an `embedding` column (unit-normalized float vector). */
  def embedChunks(chunks: DataFrame, embedder: Embedder = HashingEmbedder()): DataFrame = {
    val embedUdf = udf((s: String) => embedder.embed(if (s == null) "" else s))
    chunks.withColumn("embedding", embedUdf(col("chunk_text")))
  }

  /** Batched embedding via mapPartitions: rows stream through in
    * `batchSize` groups and each group makes ONE `embedBatch` call —
    * the plumbing shape real model inference needs (weights load once
    * per partition, the accelerator sees full batches, results zip
    * back positionally). Identical output to [[embedChunks]] for any
    * embedder whose embedBatch agrees with embed (tested).
    */
  def embedChunksBatched(chunks: DataFrame, embedder: Embedder = HashingEmbedder(),
      batchSize: Int = 64): DataFrame = {
    import chunks.sparkSession.implicits._
    val cols = chunks.columns
    chunks.select(col("case_number"), col("chunk_id"), col("chunk_text"))
      .as[(String, Int, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val vecs = embedder.embedBatch(batch.map(b => Option(b._3).getOrElse("")))
          batch.lazyZip(vecs).map { case ((cn, cid, txt), v) => (cn, cid, txt, v) }
        }
      }
      .toDF(cols.take(3) :+ "embedding": _*)
  }

  /** Backfill: embed chunks for cases missing from the embedding table
    * (rag.py:94-156 — the LEFT JOIN ... IS NULL scan is an anti-join).
    */
  def backfill(cases: DataFrame, existing: Option[DataFrame],
      embedder: Embedder = HashingEmbedder()): DataFrame = {
    val missing = existing match {
      case Some(e) => cases.join(e.select("case_number").distinct(),
        Seq("case_number"), "left_anti")
      case None => cases
    }
    embedChunks(chunkCases(missing), embedder)
  }

  private def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Cosine search with case-level aggregation (rag.py:158-227):
    *   1. score every chunk (unit vectors ⇒ dot = cosine = 1 - dist);
    *   2. keep the top `max(k*10, 50)` chunks (the reference's
    *      candidate pool, rag.py:201) — TakeOrderedAndProject;
    *   3. join case metadata (broadcast dims);
    *   4. best chunk per case (argmax window, ties to lowest
    *      chunk_id — the reference's dict fold keeps the first-seen
    *      chunk in retrieval order);
    *   5. top-k cases by best similarity, rounded to 4 dp before the
    *      final sort exactly as the reference rounds then sorts
    *      (rag.py:220-226); ties broken by case_number for
    *      determinism where the reference inherits dict order.
    */
  def search(embeddings: DataFrame, cases: DataFrame, judges: DataFrame,
      courts: DataFrame, queryVec: Array[Float], topK: Int = 5): DataFrame = {
    val pool = math.max(topK * 10, 50)
    val scored = embeddings
      .withColumn("similarity", dot(col("embedding"), typedlit(queryVec.toSeq)))
      .orderBy(desc("similarity"), asc("case_number"), asc("chunk_id"))
      .limit(pool)
    val joined = scored
      .join(cases.select(col("case_number"), col("title"), col("filed_date"),
        col("judge_id"), col("court_id")), Seq("case_number"))
      .join(broadcast(judges.select(col("id").as("judge_id"),
        col("full_name").as("judge"))), Seq("judge_id"), "left")
      .join(broadcast(courts.select(col("id").as("court_id"),
        col("name").as("court"))), Seq("court_id"), "left")
    val w = Window.partitionBy("case_number")
      .orderBy(desc("similarity"), asc("chunk_id"))
    joined
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("case_number"), col("title"),
        date_format(col("filed_date"), "yyyy-MM-dd").as("filed_date"),
        col("judge"), col("court"),
        bround(col("similarity"), 4).as("best_similarity"),
        col("chunk_id").as("best_chunk_id"),
        substring(col("chunk_text"), 1, SnippetChars).as("best_chunk_snippet"))
      .orderBy(desc("best_similarity"), asc("case_number"))
      .limit(topK)
  }

  /** IVF-style cell-probe search: the embedding table carries a
    * precomputed hyperplane-LSH `cell` column (see [[withCells]]); the
    * probe computes its cell list driver-side (cells are a pure
    * function of md5-derived constants) and scans ONLY those cells —
    * exact within the probed cells, approximate overall, the same
    * recall/latency knob as the reference's `SET ivfflat.probes = 10`
    * (rag.py:179-180; API.md:239-243), whose default the `probes`
    * default mirrors. Cells beyond the query's own are chosen
    * multi-probe style — flip the lowest-|margin| hyperplanes first
    * (VectorFunctions.multiProbeCellsLocal) — so recall climbs with
    * `probes` where naive single-cell probing silently lost cross-cell
    * neighbors. At 100 TB the table is written partitioned by `cell`,
    * so the IN-filter prunes to exactly `probes` directories.
    */
  def searchCellProbe(embeddingsWithCells: DataFrame, cases: DataFrame,
      judges: DataFrame, courts: DataFrame, queryVec: Array[Float],
      topK: Int = 5, planes: Int = 6, probes: Int = 10): DataFrame = {
    val cells = graft.functions.VectorFunctions
      .multiProbeCellsLocal(queryVec, planes, probes)
    search(embeddingsWithCells.filter(col("cell").isin(cells: _*))
      .drop("cell"), cases, judges, courts, queryVec, topK)
  }

  /** Attach the hyperplane-LSH cell column (layout/bucketing key).
    * `dim` must match the embedding dimensionality.
    */
  def withCells(embeddings: DataFrame, planes: Int = 6, dim: Int = 384): DataFrame =
    embeddings.withColumn("cell",
      graft.functions.VectorFunctions.hyperplaneSignature(
        col("embedding"), planes, dim))

  /** Materialize the chunk-ANN index into an ingest store — the
    * reference's `CREATE INDEX ... USING ivfflat` on the embedding
    * table (rag.py:83-86) as two stored tables:
    * chunk_ann_centroids(list_id, centroid) and
    * chunk_ann_assignments (the chunk rows + list_id,
    * hive-partitioned by list_id). Uses [[AnnStore]]'s deterministic
    * exact-integer quantizer; seed order is (case_number, chunk_id)
    * so rebuilds are reproducible. `lists` clamps to the corpus size
    * (pgvector's own small-table degradation).
    */
  def indexChunks(store: graft.store.SnapshotStore,
      chunkEmbeddings: DataFrame, lists: Int = AnnStore.NumLists): Unit = {
    val spark = chunkEmbeddings.sparkSession
    import spark.implicits._
    val n = chunkEmbeddings.count()
    val l = math.max(1, math.min(lists.toLong, n).toInt)
    val cents = AnnStore.trainCentroids(chunkEmbeddings, "embedding",
      Seq(col("case_number"), col("chunk_id")), l)
    store.write("chunk_ann_centroids",
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
        .toDF("list_id", "centroid"))
    val assigned = AnnStore.assignListId(chunkEmbeddings, "embedding", cents)
    store.write("chunk_ann_assignments",
      assigned.repartition(l, col("list_id"))
        .sortWithinPartitions("list_id", "case_number", "chunk_id"),
      partitionCols = Seq("list_id"))
    store.write("chunk_ann_case_map", caseMapOf(assigned),
      partitionCols = Seq("case_bucket"))
  }

  /** Hive-bucket count of the case→list sidecar map (the id-map
    * treatment applied to the serving chunk index: a delta's
    * prior-list lookup prunes to its own case buckets instead of
    * probing the full assignments table per merge).
    */
  val CaseBuckets = 64

  /** Attach `case_bucket = crc32(case_number) % CaseBuckets` — the
    * hive-partition key of the case-keyed serving tables
    * (case_chunk_embeddings, chunk_ann_case_map): a pure function of
    * the merge key, so every per-batch merge's touched set is the
    * batch's own buckets and no collide probe ever runs.
    */
  def withCaseBucket(df: DataFrame): DataFrame =
    df.withColumn("case_bucket",
      pmod(crc32(col("case_number")), lit(CaseBuckets.toLong)).cast("int"))

  /** Project assigned chunk rows onto the case→list sidecar map:
    * one row per DISTINCT (case_number, list_id), partitioned by
    * `case_bucket`.
    */
  private def caseMapOf(assigned: DataFrame): DataFrame =
    withCaseBucket(assigned.select(col("case_number"), col("list_id")).distinct())
      .repartition(CaseBuckets, col("case_bucket"))
      .sortWithinPartitions("case_bucket", "case_number")

  /** Distinct case buckets of a frame (the collide/touched hint for
    * case-bucketed merges — bucket is a function of the key).
    */
  def caseBucketsOf(df: DataFrame): Seq[Int] =
    withCaseBucket(df.select("case_number")).select("case_bucket")
      .distinct().collect().map(_.getInt(0)).sorted.toSeq

  /** One-time layout migration: rewrite a case-keyed serving table
    * hive-partitioned by `case_bucket` if it predates the bucketed
    * layout (no-op otherwise). Merges afterwards are partition-scoped
    * to the batch's own buckets.
    */
  def ensureCaseBucketed(store: graft.store.SnapshotStore,
      table: String): Unit =
    store.read(table).foreach { cur =>
      if (!cur.columns.contains("case_bucket"))
        store.write(table,
          withCaseBucket(cur).repartition(CaseBuckets, col("case_bucket"))
            .sortWithinPartitions("case_bucket", "case_number"),
          partitionCols = Seq("case_bucket"))
    }

  /** Incrementally fold a chunk DELTA into the stored chunk-ANN
    * index: the delta's chunks assign map-side against the STORED
    * centroids (pgvector's insert path — ivfflat never retrains on
    * insert) and merge last-write-wins ON THE CASE — a re-ingested
    * case replaces ALL its chunk rows, so a case whose text shrank
    * loses its stale high-chunk_id rows (the same per-document
    * replacement rule as the postings index) — rewriting only the
    * touched list partitions. The merge's collide set (which lists
    * hold a re-ingested case's PRIOR chunks) comes from the
    * case-bucketed sidecar map, pruned to the delta's own buckets —
    * per-delta cost is O(touched buckets + touched lists), with no
    * unpruned scan of the assignments table anywhere. Falls back to a
    * full [[indexChunks]] build when no index exists yet. Occupancy
    * drift is the retrain-trigger problem StreamingAnn owns for the
    * corpus index; here a caller rebuilds via [[indexChunks]] when it
    * cares.
    */
  def mergeChunkIndex(store: graft.store.SnapshotStore,
      delta: DataFrame): Unit = {
    store.read("chunk_ann_centroids") match {
      case None => indexChunks(store,
        delta.select("case_number", "chunk_id", "chunk_text", "embedding"))
      case Some(centFrame) =>
        val cents = AnnStore.centroidsOf(centFrame)
        val assignedDelta = AnnStore.assignListId(
          delta.select("case_number", "chunk_id", "chunk_text", "embedding"),
          "embedding", cents.map(_._2))
          .localCheckpoint(true) // read by two merges + two collects
        // one-time migration for stores indexed before the case map
        // existed (a single full pass, after which merges are pruned)
        if (store.currentVersion("chunk_ann_case_map").isEmpty)
          store.write("chunk_ann_case_map",
            caseMapOf(store.read("chunk_ann_assignments").get),
            partitionCols = Seq("case_bucket"))
        // prior lists of the delta's cases through the sidecar map —
        // pruned to the delta's own case buckets, and handed to the
        // merge as its collide set so no full-table probe runs. A
        // crash-replay reads a possibly part-updated map, but a prior
        // row it misses can only live in the delta's OWN new lists,
        // which the merge rewrites regardless (batch partition values).
        val deltaBuckets = assignedDelta
          .select(pmod(crc32(col("case_number")), lit(CaseBuckets.toLong))
            .cast("int").as("b"))
          .distinct().collect().map(_.getInt(0)).sorted.toSeq
        val priorLists = store.read("chunk_ann_case_map").get
          .filter(col("case_bucket").isin(deltaBuckets: _*))
          .join(graft.store.SnapshotStore.broadcastIfSmall(
            assignedDelta.select("case_number").distinct()),
            Seq("case_number"), "left_semi")
          .select("list_id").distinct().collect()
          .map(_.getAs[Number](0).intValue).sorted.toSeq
        store.mergeLastWriteWins("chunk_ann_assignments", assignedDelta,
          keys = Seq("case_number"),
          partitionCols = Seq("list_id"),
          sortCols = Seq("case_number", "chunk_id"),
          collideHint = Some(priorLists))
        // the map merges AFTER the assignments (stale-map replays keep
        // a moved case's old lists visible); its own collide set is
        // the delta's buckets — the partition value is a pure function
        // of the key
        store.mergeLastWriteWins("chunk_ann_case_map",
          caseMapOf(assignedDelta), keys = Seq("case_number"),
          partitionCols = Seq("case_bucket"),
          sortCols = Seq("case_number"),
          collideHint = Some(deltaBuckets))
        ()
    }
  }

  /** [[search]] through the STORED chunk-ANN index: centroids rank
    * driver-side, candidates come from `nprobe` pruned list
    * directories (the IVFFLAT probe, rag.py:179-180) instead of a
    * full chunk-table scan; scoring/argmax/top-k semantics are
    * [[search]]'s own, applied to the pruned pool.
    */
  def searchStored(store: graft.store.SnapshotStore, cases: DataFrame,
      judges: DataFrame, courts: DataFrame, queryVec: Array[Float],
      topK: Int = 5, nprobe: Int = AnnStore.DefaultNprobe): DataFrame = {
    val cents = AnnStore.centroidsOf(store.read("chunk_ann_centroids").get)
    val lists = AnnStore.probeListsOf(cents, queryVec,
      math.min(nprobe, cents.size))
    val cand = store.read("chunk_ann_assignments").get
      .filter(col("list_id").isin(lists: _*)).drop("list_id")
    search(cand, cases, judges, courts, queryVec, topK)
  }

  /** Text-query convenience over [[search]]. */
  def searchText(embeddings: DataFrame, cases: DataFrame, judges: DataFrame,
      courts: DataFrame, query: String, topK: Int = 5,
      embedder: Embedder = HashingEmbedder()): DataFrame = {
    require(query != null && query.trim.length >= 2,
      "query must be at least 2 characters") // api.py:64-73
    search(embeddings, cases, judges, courts, embedder.embed(query), topK)
  }
}
