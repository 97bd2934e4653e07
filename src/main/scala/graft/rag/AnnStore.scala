package graft.rag

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.store.SnapshotStore

/** The MATERIALIZED ANN index — the stored form of the reference's
  * IVFFLAT index (rag.py:83-86: `CREATE INDEX ... USING ivfflat
  * (embedding vector_cosine_ops) WITH (lists = 100)`, probed with
  * `SET ivfflat.probes` at rag.py:179-180). Postgres STORES that
  * index and every query walks `probes` inverted lists; until round
  * 11 the engine's production search compositions scanned the full
  * embeddings table per query — exact, but CPU/IO-linear in the
  * corpus, the same wrong plan class the r10 postings materialization
  * fixed on the lexical side. This module applies the identical
  * treatment to vectors:
  *
  *   ann_centroids(list_id, centroid: array<long>)   — tiny (lists × dim)
  *   ann_assignments(id, embedding, list_id)
  *     hive-partitioned by list_id, files sorted by id
  *   ann_stats(n_vectors, n_lists)                   — occupancy scalars
  *
  * built once per corpus into a [[SnapshotStore]] (versioned commits,
  * vacuum, incremental merge — the same protocol as every engine
  * table) and probed with PARTITION PRUNING: the query ranks
  * centroids DRIVER-side (a lists-row computation), and the scan
  * reads exactly `nprobe` list directories of the corpus — the same
  * I/O shape as pgvector's list walk. Maintenance is incremental
  * ([[graft.streaming.StreamingAnn]]): new vectors assign MAP-side
  * against the stored centroids inside the streaming commit, merging
  * last-write-wins on id; a re-ingested vector MOVES lists correctly
  * because the LWW merge rewrites both its old and new list
  * partitions. Centroid drift is watched by the occupancy skew ratio
  * (q164's audit as a stored scalar) — when it crosses the retrain
  * threshold the maintenance job flags `needs_retrain` and
  * [[graft.streaming.StreamingAnn.retrain]] re-trains from the
  * current assignments.
  *
  * The coarse quantizer is DETERMINISTIC, EXACT-INTEGER k-means (one
  * Lloyd refinement from lowest-id seeds): components fix-point to
  * `floor(x · 2^20)` (float→double, power-of-two multiply, floor —
  * all exact, the q123 trick), centroid means are truncating integer
  * divisions of order-independent long sums, and assignment minimizes
  * `ssq(c) − 2·dot(m, c)` in pure long arithmetic (on unit vectors,
  * argmin L2 ≡ argmax cosine; ssq(m) is constant per row and drops
  * out). Zero float reductions cross rows, so the DuckDB oracle
  * recomputes the quantizer bit-identically and every probe result
  * hash-compares — a trained-float k-means (MLlib, [[IvfIndex]])
  * would make each assignment a rounding bet between engines. MLlib
  * KMeans remains the production-trainer option where oracle
  * exactness is not required (q115 seeds it properly); the stored
  * layout and probe shape are identical either way.
  */
object AnnStore {

  /** Inverted-list count. 16 keeps test-scale lists populated
    * (pgvector guidance wants ≥ ~39 vectors/list; the test corpora
    * carry 500-2000); production follows the reference's
    * `lists = 100` upward with corpus size. Like
    * PostingsIndex.NumBuckets the count is self-describing: probes
    * rank the STORED centroids table, so a constant change can never
    * mis-route a probe — it just forces a rebuild (fingerprint).
    */
  val NumLists = 16

  /** Default probe width — the reference's recall/latency knob
    * (`ivfflat.probes = 10` of 100 lists, rag.py:179-180). 4 of 16
    * lists is a deliberately WIDER read fraction (1/4 vs the
    * reference's 1/10) so the small test lists keep recall@10
    * meaningful: a 1/16 probe of a 500-vector corpus would read only
    * ~31 candidates for a top-10.
    */
  val DefaultNprobe = 4

  /** Fixed-point scale for the quantizer (2^20 — exact float→int,
    * matches q123's int8-calibration trick).
    */
  val ScaleBits: Long = 1L << 20

  // ---------------------------------------------------------------
  // exact-integer quantizer primitives (Spark + driver twins)
  // ---------------------------------------------------------------

  /** Fix-point a float/double vector column: floor(x · 2^20) per
    * component. Exact in both engines (DuckDB twin:
    * OracleSql.microVec).
    */
  def microCol(emb: Column): Column =
    transform(emb, x => floor(x.cast("double") * ScaleBits).cast("long"))

  /** Per-centroid assignment scores for a fix-pointed vector column:
    * score_i = ssq(c_i) − 2·dot(m, c_i), all long arithmetic — the
    * L2 objective with the per-row constant dropped. Row-local fold,
    * so no cross-row reduction order exists to drift.
    */
  def scoresCol(mCol: Column, centroids: Seq[Array[Long]]): Column =
    transform(typedlit(centroids.map(_.toSeq)),
      c => aggregate(zip_with(mCol, c, (x, y) => y * y - lit(2L) * x * y),
        lit(0L), (acc, x) => acc + x))

  /** Driver twins of [[microCol]]/[[scoresCol]] — probes rank
    * centroids on the driver so the list filter is a LITERAL
    * predicate Catalyst prunes directories with.
    */
  def microLocal(v: Array[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * ScaleBits).toLong)

  def scoreLocal(m: Array[Long], c: Array[Long]): Long = {
    var s = 0L
    var i = 0
    while (i < c.length) { s += c(i) * c(i) - 2L * m(i) * c(i); i += 1 }
    s
  }

  /** Attach `list_id` = argmin score (ties → lowest list) to a frame
    * with an embedding column — the map-side assignment both the
    * build and the streaming maintenance use (centroids ride along as
    * a literal; no join, no shuffle).
    */
  def assignListId(df: DataFrame, embCol: String,
      centroids: Seq[Array[Long]]): DataFrame =
    df.withColumn("_s", scoresCol(microCol(col(embCol)), centroids))
      .withColumn("list_id",
        (expr("array_position(_s, array_min(_s))") - 1).cast("int"))
      .drop("_s")

  /** One deterministic Lloyd refinement from lowest-`seedOrder` seeds:
    * seeds = first `lists` vectors, assign all, per-list integer-mean
    * update (empty lists keep their seed), return the refined
    * centroids driver-side (lists × dim longs — KBs).
    */
  def trainCentroids(emb: DataFrame, embCol: String,
      seedOrder: Seq[Column], lists: Int = NumLists): Seq[Array[Long]] = {
    val seeds = emb.orderBy(seedOrder: _*).limit(lists)
      .select(microCol(col(embCol)).as("m")).collect()
      .map(_.getSeq[Long](0).toArray).toSeq
    require(seeds.size == lists,
      s"corpus has fewer than $lists vectors — lower NumLists")
    val a0 = emb.select(microCol(col(embCol)).as("m"))
      .withColumn("_s", scoresCol(col("m"), seeds))
      .withColumn("list_id",
        (expr("array_position(_s, array_min(_s))") - 1).cast("int"))
    val updated = a0
      .select(col("list_id"), posexplode(col("m")).as(Seq("pos", "xi")))
      .groupBy("list_id", "pos")
      .agg(expr("sum(xi) div count(1)").as("cm"))
      .groupBy("list_id")
      .agg(expr("transform(array_sort(collect_list(struct(pos, cm))), s -> s.cm)")
        .as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toArray).toMap
    (0 until lists).map(i => updated.getOrElse(i, seeds(i)))
  }

  /** Rank lists for a query vector: nprobe nearest stored centroids
    * by the integer score, ties → lowest list_id. Driver-side.
    */
  def probeListsOf(centroids: Seq[(Int, Array[Long])], vec: Array[Float],
      nprobe: Int): Seq[Int] = {
    require(nprobe >= 1, "nprobe must be >= 1")
    val m = microLocal(vec)
    centroids.map { case (i, c) => (scoreLocal(m, c), i) }
      .sortBy(identity).take(nprobe).map(_._2)
  }

  // ---------------------------------------------------------------
  // per-corpus-dir index store (memoized on disk, fingerprint-guarded)
  // ---------------------------------------------------------------

  /** Layout version (fingerprint carries it AND the list count — the
    * PostingsIndex v3 lesson applied from day one: a constant change
    * rebuilds, never mis-probes).
    * v2: the id cluster sort survives the write (the FileFormatWriter
    * unstable-sort fix, SCALING.md r11) — rebuilds v1 stores whose
    * files the broken builder left unsorted.
    * v3: assignment rows carry the embedding table's metadata columns
    * (e.g. `label`) so FILTERED ANN search pushes its predicate into
    * the pruned list scan — pgvector's filtered-scan case without a
    * heap lookback.
    * v4: adds `ann_id_map(id, list_id)` hive-partitioned by
    * `id_bucket = pmod(id, IdBuckets)` — the id→list sidecar that
    * makes the streaming maintenance's prior-list lookup a
    * partition-PRUNED read (O(batch id-buckets)) instead of a
    * column-pruned full-assignments probe per micro-batch, the same
    * treatment StreamingPostings' registry got in r11.
    * v5: the id map carries the embedding table's metadata columns
    * (everything but the vector), so an id-keyed METADATA lookup —
    * filtered hybrid search's lexical-leg predicate — is the same
    * pruned bucket read; the map stays narrow (no embeddings).
    */
  private val Format = "v5"

  /** Hive-bucket count of the id→list sidecar map (pmod(id, _)) —
    * bounds a micro-batch's prior-list lookup to the batch's own id
    * buckets. Self-describing like NumLists: the fingerprint carries
    * it, so a constant change rebuilds rather than mis-probes.
    */
  val IdBuckets = 64

  private def indexRoot(dir: String): String = {
    val base = sys.env.getOrElse("GRAFT_ANN_ROOT",
      Paths.get(sys.props("java.io.tmpdir"), "graft-ann").toString)
    val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    Paths.get(base, safe).toString
  }

  /** Zero-Spark corpus fingerprint over the embeddings table (names +
    * sizes + mtimes — same contract as PostingsIndex).
    */
  private def corpusFingerprint(dir: String): String = {
    val p = Paths.get(dir, "embeddings.parquet")
    if (!Files.exists(p)) return "absent"
    val entries =
      if (Files.isDirectory(p)) {
        val s = Files.walk(p)
        try s.iterator().asScala.filter(Files.isRegularFile(_)).map { f =>
          s"${p.relativize(f)}:${Files.size(f)}:${Files.getLastModifiedTime(f).toMillis}"
        }.toSeq.sorted
        finally s.close()
      } else Seq(s"${p.getFileName}:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}")
    java.security.MessageDigest.getInstance("MD5")
      .digest(entries.mkString("|").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  private def withBuildLock[A](root: String)(body: => A): A = {
    Files.createDirectories(Paths.get(root))
    val ch = java.nio.channels.FileChannel.open(
      Paths.get(root, "_build.lock"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      val lock = ch.lock()
      try body finally lock.release()
    } finally ch.close()
  }

  /** The ANN store for a corpus dir, building on first touch (or
    * after a corpus regen / format / list-count change). The build is
    * the only full corpus pass; probes read the stored snapshot with
    * list pruning. Cross-JVM safe (file lock, re-check under it).
    */
  def ensure(spark: SparkSession, dir: String): SnapshotStore = synchronized {
    val root = indexRoot(dir)
    val store = new SnapshotStore(spark, root)
    val fp = s"$Format:l$NumLists:i$IdBuckets:${corpusFingerprint(dir)}"
    val fpFile = Paths.get(root, "_corpus_fingerprint")
    def fresh = Files.exists(fpFile) &&
      Files.readString(fpFile).trim == fp &&
      store.currentVersion("ann_centroids").isDefined &&
      store.currentVersion("ann_assignments").isDefined &&
      store.currentVersion("ann_id_map").isDefined &&
      store.currentVersion("ann_stats").isDefined
    if (fresh) return store
    withBuildLock(root) {
      if (!fresh) {
        // keep EVERY embedding-table column (label, ...): filtered
        // search pushes metadata predicates into the pruned list scan
        val emb = Tables(spark, dir).embeddings
          .withColumnRenamed("vec_id", "id")
        val cents = trainCentroids(emb, "embedding", Seq(col("id")))
        writeIndex(spark, store, emb, cents)
        Files.writeString(fpFile, fp) // LAST: a crashed build rebuilds
        Seq("ann_centroids", "ann_assignments", "ann_id_map", "ann_stats",
          "ann_list_stats").foreach(store.vacuum(_, keepLast = 1))
      }
    }
    store
  }

  /** Write the four index tables from scratch — shared by [[ensure]]
    * and [[graft.streaming.StreamingAnn.retrain]]. `emb` must carry
    * (id, embedding) and may carry metadata columns, which ride onto
    * the assignment rows (filtered search reads them with the scan).
    * One file per list dir, rows sorted by id (point lookups prune
    * row groups).
    */
  private[graft] def writeIndex(spark: SparkSession, store: SnapshotStore,
      emb: DataFrame, cents: Seq[Array[Long]]): Unit = {
    import spark.implicits._
    store.write("ann_centroids",
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
        .toDF("list_id", "centroid"))
    val assigned = assignListId(emb, "embedding", cents)
    store.write("ann_assignments",
      assigned.repartition(cents.size, col("list_id"))
        .sortWithinPartitions("list_id", "id"),
      partitionCols = Seq("list_id"))
    store.write("ann_id_map", idMapOf(assigned), partitionCols = Seq("id_bucket"))
    val listStats = store.read("ann_assignments").get
      .groupBy(col("list_id").cast("long").as("list_id"))
      .agg(count(lit(1)).as("n_vectors"))
    store.write("ann_list_stats", listStats)
    store.write("ann_stats", statsFromListStats(store, cents.size))
  }

  /** Project an assigned frame onto the id→list sidecar map's rows:
    * (id, list_id, metadata..., id_bucket = pmod(id, IdBuckets)) —
    * every column EXCEPT the embedding, so the map doubles as the
    * pruned id-keyed metadata lookup (filtered search's lexical leg)
    * while staying narrow. The map is hive-partitioned by `id_bucket`
    * and each file sorts by id, so a lookup reads only its keys' own
    * buckets and prunes row groups inside them.
    */
  private[graft] def idMapOf(assigned: DataFrame): DataFrame =
    assigned.drop("embedding")
      .withColumn("id_bucket",
        pmod(col("id"), lit(IdBuckets.toLong)).cast("int"))
      .repartition(IdBuckets, col("id_bucket"))
      .sortWithinPartitions("id_bucket", "id")

  /** The global stats row derived from the ≤ lists-row subtotal table
    * (never a corpus scan): totals plus the occupancy skew ratio
    * max/mean ×1000 (q164's audit) and the retrain flag.
    */
  private[graft] def statsFromListStats(store: SnapshotStore, lists: Int,
      retrainSkewX1000: Long = 4000L): DataFrame =
    store.read("ann_list_stats").get
      .agg(coalesce(sum("n_vectors"), lit(0L)).as("n_vectors"),
        coalesce(max("n_vectors"), lit(0L)).as("max_list"))
      .withColumn("n_lists", lit(lists.toLong))
      .withColumn("skew_x1000",
        expr("(max_list * 1000 * n_lists) div greatest(n_vectors, 1)"))
      .withColumn("needs_retrain", col("skew_x1000") > retrainSkewX1000)
      .select("n_vectors", "n_lists", "skew_x1000", "needs_retrain")

  /** Drop the memoized index for a corpus dir (next touch rebuilds). */
  def invalidate(dir: String): Unit = synchronized {
    centroidCache.clear()
    vectorCache.clear()
    val root = Paths.get(indexRoot(dir))
    if (Files.isDirectory(root)) {
      val w = Files.walk(root)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      finally w.close()
    }
  }

  private[graft] val centroidCache = scala.collection.concurrent.TrieMap
    .empty[(String, Long), Seq[(Int, Array[Long])]]

  /** Evict a root's memo entries for every version except the current
    * one — ordinary streaming maintenance bumps versions without ever
    * calling [[invalidate]], and a long-lived serving process would
    * otherwise strand each superseded version's entries forever.
    */
  private def evictStale[K, V](cache: scala.collection.concurrent.TrieMap[K, V],
      isStale: K => Boolean): Unit =
    cache.keysIterator.filter(isStale).foreach(cache.remove)

  /** Stored centroids, collected once per (store root, version) —
    * lists × dim longs, the "broadcast the codebook" step of every
    * IVF probe. Superseded versions' entries evict on access.
    */
  def centroidsLocal(spark: SparkSession, dir: String): Seq[(Int, Array[Long])] = {
    val store = ensure(spark, dir)
    val v = store.currentVersion("ann_centroids").getOrElse(-1L)
    val root = indexRoot(dir)
    evictStale(centroidCache, (k: (String, Long)) => k._1 == root && k._2 != v)
    centroidCache.getOrElseUpdate((root, v),
      centroidsOf(store.read("ann_centroids").get))
  }

  /** Collect a centroids frame driver-side, sorted by list_id. */
  def centroidsOf(centroids: DataFrame): Seq[(Int, Array[Long])] =
    centroids.select("list_id", "centroid").collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1).toArray)
      .sortBy(_._1).toSeq

  /** The stored assignments snapshot (audits, probes). */
  def assignments(spark: SparkSession, dir: String): DataFrame =
    ensure(spark, dir).read("ann_assignments").get

  /** Prior-list rows (id, list_id) for a key frame, through the
    * sidecar map: the scan carries a LITERAL `id_bucket IN (...)`
    * partition filter (the keys' own buckets — ≤ IdBuckets values
    * regardless of batch size), so the lookup reads O(touched
    * id-buckets) of the map, never the assignments table. This is
    * what the streaming maintenance uses to find a re-ingested
    * vector's OLD list and to hand the LWW merge its collide set.
    */
  def priorListRows(store: SnapshotStore, ids: DataFrame): DataFrame =
    mapRows(store, ids).select("id", "list_id")

  /** The sidecar map's full rows (id, list_id, metadata...) for a key
    * frame — the same pruned-bucket read as [[priorListRows]], used as
    * the id-keyed metadata lookup by filtered hybrid search.
    */
  def mapRows(store: SnapshotStore, ids: DataFrame): DataFrame = {
    val buckets = ids
      .select(pmod(col("id"), lit(IdBuckets.toLong)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).sorted.toSeq
    store.read("ann_id_map").get
      .filter(col("id_bucket").isin(buckets: _*))
      // measured-size hint: a feed-derived key frame's estimate can
      // demote this to a map-shuffling sort-merge join (SnapshotStore
      // .broadcastIfSmall)
      .join(SnapshotStore.broadcastIfSmall(ids.select("id")),
        Seq("id"), "left_semi")
  }

  private[graft] val vectorCache = scala.collection.concurrent.TrieMap
    .empty[(String, Long, Long), Array[Float]]

  /** Hard cap on memoized query vectors: past it the memo resets
    * wholesale (it is a cache, not a correctness structure — the
    * coarse reset keeps the heap bounded for a serving process that
    * answers by-corpus-member queries over an arbitrarily large id
    * space within one index version).
    */
  private[graft] val MaxVectorCacheEntries = 4096

  /** Point lookup of a stored vector by id (the "query by corpus
    * member" convenience the search entries use): resolve the id's
    * list through the sidecar map (one pruned bucket dir), then read
    * that single list partition — two pruned point reads, never a
    * full-assignments or raw-embeddings scan. Memoized per (store,
    * version, id); superseded versions' entries evict on access and
    * the memo is size-capped, so a long-lived serving loop holds the
    * heap flat.
    */
  def vectorOf(spark: SparkSession, dir: String, id: Long): Array[Float] = {
    val store0 = ensure(spark, dir)
    val v = store0.currentVersion("ann_assignments").getOrElse(-1L)
    val root = indexRoot(dir)
    evictStale(vectorCache,
      (k: (String, Long, Long)) => k._1 == root && k._2 != v)
    if (vectorCache.size >= MaxVectorCacheEntries) vectorCache.clear()
    vectorCache.getOrElseUpdate((root, v, id),
      vectorOfUncached(spark, dir, id))
  }

  private def vectorOfUncached(spark: SparkSession, dir: String,
      id: Long): Array[Float] = {
    val store = ensure(spark, dir)
    val bucket = ((id % IdBuckets + IdBuckets) % IdBuckets).toInt
    val listRows = store.read("ann_id_map").get
      .filter(col("id_bucket") === bucket && col("id") === id)
      .select("list_id").limit(1).collect()
    require(listRows.nonEmpty, s"no stored vector with id $id")
    val listId = listRows(0).getInt(0)
    // a segment-maintained store can hold several GENERATIONS of the id
    // in this list (re-ingest into the same list before a fold) — the
    // live row is the max-seq one; batch-built stores have no seq
    val asg = store.read("ann_assignments").get
      .filter(col("list_id") === listId && col("id") === id)
    val rows = (if (asg.columns.contains("seq"))
      asg.orderBy(desc_nulls_last("seq")) else asg)
      .select("embedding").limit(1).collect()
    require(rows.nonEmpty, s"no stored vector with id $id")
    rows(0).getSeq[Float](0).toArray
  }

  /** Approximate top-k by cosine through the stored index: rank
    * centroids driver-side, scan ONLY the `nprobe` list directories
    * (literal IN → partition pruning), exact re-rank within — the
    * IVFFLAT probe (rag.py:179-180) as a Spark plan. Returns
    * (id, cosine), ordered.
    */
  /** @param where optional metadata predicate over the assignment
    *   rows (the index carries the embedding table's metadata
    *   columns) — FILTERED ANN search, pgvector's filtered-scan case:
    *   the predicate composes with the list pruning and pushes into
    *   the same Parquet scan, no corpus-side lookback. Filtering
    *   SHRINKS the candidate pool, so at fixed nprobe a highly
    *   selective predicate may return < topK rows — widen nprobe for
    *   recall, exactly pgvector's iterative-scan guidance.
    */
  def denseSearch(spark: SparkSession, dir: String, vec: Array[Float],
      topK: Int = 10, nprobe: Int = DefaultNprobe,
      excludeId: Option[Long] = None,
      where: Option[Column] = None): DataFrame = {
    val lists = probeListsOf(centroidsLocal(spark, dir), vec, nprobe)
    val base = assignments(spark, dir)
      .filter(col("list_id").isin(lists: _*))
    val filtered = where.fold(base)(base.filter)
    val cand = excludeId.fold(filtered)(x => filtered.filter(col("id") =!= x))
    cand
      .withColumn("cosine", graft.functions.VectorFunctions
        .dotFold(col("embedding"), typedlit(vec.toSeq)))
      .orderBy(desc("cosine"), asc("id"))
      .limit(topK)
      .select(col("id"), col("cosine"))
  }

  /** FILTERED ANN search with pgvector's iterative-scan behavior
    * (`ivfflat.iterative_scan`): a selective predicate thins the
    * candidate pool inside a fixed-nprobe probe, so instead of handing
    * the user a manual widen-nprobe knob, probe `startNprobe` lists
    * and — while fewer than `topK` candidates survive the predicate —
    * DOUBLE the probe width, a driver-side loop over the same pruned
    * plans, until k survivors or every list has been read. The last
    * rung is the exhaustive probe, so whenever ≥ topK matches exist
    * corpus-wide the result has exactly topK rows.
    *
    * Cost shape: probe ranks are computed ONCE (driver-side, lists
    * rows) and each rung counts survivors over only the lists it
    * NEWLY uncovered (probe prefixes nest), so across all rungs the
    * counting pass reads each probed list dir exactly once; the final
    * top-k re-reads the chosen width. `nprobe_used` rides the result —
    * the per-query cost row of the recall/cost curve (q211) the
    * adaptive loop landed on.
    */
  def denseSearchAdaptive(spark: SparkSession, dir: String,
      vec: Array[Float], topK: Int = 10, startNprobe: Int = DefaultNprobe,
      excludeId: Option[Long] = None,
      where: Option[Column] = None): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val cents = centroidsLocal(spark, dir)
    val ranked = probeListsOf(cents, vec, cents.size)
    def survivorsIn(listSlice: Seq[Int]): Long = {
      if (listSlice.isEmpty) return 0L
      val base = assignments(spark, dir)
        .filter(col("list_id").isin(listSlice: _*))
      val filtered = where.fold(base)(base.filter)
      excludeId.fold(filtered)(x => filtered.filter(col("id") =!= x)).count()
    }
    var np = math.min(math.max(startNprobe, 1), ranked.size)
    var covered = 0
    var survivors = 0L
    while ({
      survivors += survivorsIn(ranked.slice(covered, np))
      covered = np
      survivors < topK && np < ranked.size
    }) np = math.min(np * 2, ranked.size)
    denseSearch(spark, dir, vec, topK = topK, nprobe = np,
      excludeId = excludeId, where = where)
      .withColumn("nprobe_used", lit(np.toLong))
  }
}
