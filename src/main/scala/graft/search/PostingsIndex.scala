package graft.search

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.tokens
import graft.store.SnapshotStore

/** The MATERIALIZED positional inverted index — the stored form of the
  * reference's GIN full-text index (schema.sql:141: `to_tsvector`
  * keeps lexeme positions; Postgres STORES that index and probes it
  * per query). Until round 9 the engine's q44/q203 re-derived postings
  * from a full corpus tokenize per query — correct, but the wrong PLAN
  * for a production index at 100 TB (CPU-linear in the corpus per
  * query instead of term-selective). This module makes the index a
  * first-class stored table:
  *
  *   postings(term, doc_id, positions: array<int>, tf)
  *     hive-partitioned by term_bucket = crc32(term) % [[NumBuckets]]
  *   postings_stats(n_docs)   — the scalar every IDF weight needs
  *
  * built once per corpus into a [[SnapshotStore]] (same versioned
  * commit protocol as every other engine table, so time travel /
  * vacuum / incremental merge all apply), and probed with PARTITION
  * PRUNING: a query's terms hash to a handful of buckets, so the scan
  * touches |buckets(query)| directories of a |corpus-vocabulary| index
  * — the directory-pruning equivalent of walking a GIN posting tree.
  * At cluster scale term_bucket count rises with vocabulary volume and
  * the same probe prunes 1/NumBuckets of the index per term; the term
  * equality predicate also pushes into Parquet row-group stats within
  * each bucket (terms are the natural sort/cluster key of a bucket).
  *
  * Maintenance is incremental — [[graft.streaming.StreamingPostings]]
  * merges each micro-batch's postings with last-write-wins on doc_id
  * (a re-ingested doc REPLACES all its rows, including rows for terms
  * it no longer contains), the q149 lesson wired into the streaming
  * commit: the delta's postings are the only new work, the corpus is
  * never rescanned.
  *
  * Hot-term gate ([[DefaultMaxTermDf]]): a probe on stopword-grade
  * terms makes the join sides df(term)-sized — the q193 `maxSeedDf`
  * lesson in FTS form. [[keywordSearch]] DROPS over-cap terms from
  * scoring (certified lower-bound scores over the surviving terms);
  * [[phraseSearch]] treats a dropped term as a POSITION GAP — the
  * surviving terms must still sit at their original phrase offsets —
  * which is exactly Postgres's stopword phrase semantics (`to_tsquery`
  * drops stopwords from a phrase and matches the rest at `<N>`
  * distance). Both defaults are inert at every test SF (pinned in
  * PostingsIndexSpec); production sets the df budget.
  */
object PostingsIndex {

  /** FLOOR bucket count for the hive layout — the count small corpora
    * get. Since r14 the BUILD DERIVES the actual count from corpus
    * size ([[bucketsFor]]) instead of trusting this constant at every
    * scale (16 buckets of a 100 TB index would be ~6 TB partitions):
    * `postings_stats.num_buckets` records whatever the build chose, so
    * probes derive their bucket predicate from the STORED layout and
    * streaming maintenance buckets its batches with the stored count —
    * a probe or merge can never silently mis-hash across a
    * bucket-count change, and a re-scaled corpus simply rebuilds at
    * its own width (the fingerprint covers the corpus bytes).
    */
  val NumBuckets = 16

  /** Build-time bucket-count derivation: the smallest power of two ≥
    * [[NumBuckets]] that keeps ≤ `targetDocsPerBucket` documents'
    * postings per bucket, capped at 65536 dirs. Power-of-two steps
    * keep dir counts tame; ~1M docs per bucket ≈ a few GB of postings
    * at web-document sizes — large enough to amortize task overhead,
    * small enough that one bucket's rewrite is never a hotspot. (The
    * same shape as AnnStore's lists-scale-with-corpus note, executed.)
    */
  def bucketsFor(nDocs: Long,
      targetDocsPerBucket: Long = 1000000L): Int = {
    var b = NumBuckets
    while (b < 65536 && nDocs / b > targetDocsPerBucket) b <<= 1
    b
  }

  /** Inert-by-construction default for the hot-term df cap (no
    * achievable corpus here reaches 2^40 docs per term); production
    * sets a stopword df budget and gets certified-subset semantics.
    */
  val DefaultMaxTermDf: Long = 1L << 40

  /** JVM twin of the bucket expression — the probe computes its
    * buckets DRIVER-side so the partition filter is a literal
    * predicate Catalyst can prune directories with (crc32 is exact
    * across both: java.util.zip.CRC32 == Spark's crc32, unsigned).
    */
  def bucketOf(term: String, numBuckets: Int = NumBuckets): Long = {
    val c = new java.util.zip.CRC32()
    c.update(term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    c.getValue % numBuckets
  }

  private def bucketCol(term: Column, numBuckets: Int): Column =
    pmod(crc32(term), lit(numBuckets.toLong))

  /** Positional postings of a documents frame — one row per (term,
    * doc), positions sorted (distinct by construction, so
    * |intersection| counts phrase occurrences exactly), with the doc
    * LENGTH denormalized onto every row (`dl` = Σ tf over the doc) —
    * the impact-index trade: a slightly wider index so BM25's length
    * normalization needs NO probe-time join against a corpus-sized
    * doclen table. One corpus scan; the dl join is build-time only.
    */
  def buildPostings(docs: DataFrame,
      numBuckets: Int = NumBuckets): DataFrame = {
    val perTermDoc = docs
      .select(col("doc_id"), posexplode(tokens(lower(col("text")))))
      .toDF("doc_id", "pos", "term")
      .groupBy("term", "doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("positions"),
        count(lit(1)).as("tf"))
    val dl = perTermDoc.groupBy("doc_id").agg(sum("tf").as("dl"))
    perTermDoc.join(dl, Seq("doc_id"))
      .withColumn("term_bucket", bucketCol(col("term"), numBuckets))
  }

  // ---------------------------------------------------------------
  // per-corpus-dir index store (memoized on disk, fingerprint-guarded)
  // ---------------------------------------------------------------

  private def indexRoot(dir: String): String = {
    val base = sys.env.getOrElse("GRAFT_INDEX_ROOT",
      Paths.get(sys.props("java.io.tmpdir"), "graft-postings").toString)
    val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    Paths.get(base, safe).toString
  }

  /** Zero-Spark corpus fingerprint: file names + sizes + mtimes of the
    * documents table. A regenerated corpus (same path, new bytes)
    * invalidates the stored index; an unchanged corpus reuses it
    * across JVMs (Verify, Bench, tests) without a rebuild.
    */
  private def corpusFingerprint(dir: String): String = {
    val p = Paths.get(dir, "documents.parquet")
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

  /** The index store for a corpus dir, building (or rebuilding after a
    * corpus change) on first touch. The build is the ONLY full corpus
    * scan in this module; every probe afterwards reads the stored
    * snapshot. Synchronized: suites sharing the JVM may race here.
    */
  /** Index layout version — bumping it forces a rebuild of stores
    * written by an older code version (the fingerprint file carries
    * it, so a layout change can never silently probe an old schema).
    * v2: postings carry `dl`, stats carry `total_tokens` (BM25).
    * v3: bucket files SORTED by term (row-group pruning actually
    * fires), stats carry `num_buckets` (probes derive buckets from
    * the stored layout), fingerprint carries the bucket count.
    * v4: the bucket sort actually SURVIVES the write — v3's sort was
    * scrambled by FileFormatWriter's implicit partition-cols sort
    * (SCALING.md r11); the bump rebuilds any store laid down by the
    * broken builder.
    * v5: the bucket count DERIVES from corpus size at build time
    * ([[bucketsFor]]); the fingerprint no longer pins the constant
    * (the corpus bytes it already covers determine the derived count).
    */
  private val Format = "v5"

  /** Cross-JVM (Verify ∥ Bench ∥ sbt test) build guard: the memoized
    * store lives at a SHARED default root, so two processes seeing
    * the same stale fingerprint must not interleave rebuild writes —
    * one builds under the file lock, the other blocks then sees a
    * fresh fingerprint and probes. The in-JVM `synchronized` still
    * serializes suite threads (an OverlappingFileLockException would
    * otherwise fire before the second thread ever blocked).
    */
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

  def ensure(spark: SparkSession, dir: String): SnapshotStore = synchronized {
    val root = indexRoot(dir)
    val store = new SnapshotStore(spark, root)
    val fp = s"$Format:auto:${corpusFingerprint(dir)}"
    val fpFile = Paths.get(root, "_corpus_fingerprint")
    def fresh = Files.exists(fpFile) &&
      Files.readString(fpFile).trim == fp &&
      store.currentVersion("postings").isDefined &&
      store.currentVersion("postings_stats").isDefined
    if (fresh) return store
    withBuildLock(root) {
      // re-check under the lock: another JVM may have built while we
      // blocked — its fingerprint write is the last step, so a match
      // here proves a complete store
      if (!fresh) {
        val docs = Tables(spark, dir).documents.select("doc_id", "text")
        // the layout width derives from the corpus (bucketsFor) and is
        // RECORDED in the stats row — probes and maintenance read it
        // from there, so the derivation can evolve without mis-hashing
        val buckets = bucketsFor(docs.count())
        // one shuffle partition per bucket → one file per hive dir,
        // sorted by term so the probe's term equality prunes row
        // groups via Parquet min/max stats (terms are the cluster key
        // of a bucket — r10 verdict item 3 made this claim true)
        store.write("postings",
          buildPostings(docs, buckets).repartition(buckets, col("term_bucket"))
            .sortWithinPartitions("term_bucket", "term"),
          partitionCols = Seq("term_bucket"))
        // total_tokens = Σ tf over the STORED index (each token counted
        // once) — no second tokenize pass; n_docs counts every document,
        // including token-less ones that produce no postings
        store.write("postings_stats",
          docs.agg(count(lit(1)).as("n_docs")).crossJoin(
            store.read("postings").get
              .agg(coalesce(sum("tf"), lit(0L)).as("total_tokens")))
            .withColumn("num_buckets", lit(buckets.toLong)))
        Files.writeString(fpFile, fp) // LAST: a crashed build rebuilds
        // a rebuild (corpus regen / format bump) adds a full new version
        // next to the stale one — reclaim the old copies, keep current
        store.vacuum("postings", keepLast = 1)
        store.vacuum("postings_stats", keepLast = 1)
      }
    }
    store
  }

  /** Drop the memoized index for a corpus dir (next touch rebuilds) —
    * the scale harness uses this to time a FORCED fresh build.
    */
  def invalidate(dir: String): Unit = synchronized {
    val root = Paths.get(indexRoot(dir))
    if (Files.isDirectory(root)) {
      val w = Files.walk(root)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      finally w.close()
    }
  }

  /** The full stored postings snapshot (audits, integrity oracles). */
  def storedPostings(spark: SparkSession, dir: String): DataFrame =
    ensure(spark, dir).read("postings").get

  /** One-row corpus stats (n_docs, total_tokens, num_buckets) — IDF
    * weights and BM25's length normalization read THIS, never a
    * documents count at probe time.
    */
  def stats(spark: SparkSession, dir: String): DataFrame =
    ensure(spark, dir).read("postings_stats").get

  /** Bucket count RECORDED IN a stats row — probes hash their terms
    * with the stored layout's count, never the compile-time constant
    * (which may have changed since the index was written). Bounded
    * 1-row collect; pre-v3 stats without the column fall back to the
    * constant (their stores rebuild on next `ensure` anyway — the
    * fingerprint carries the format version).
    */
  def numBucketsOf(statsRow: DataFrame): Int =
    if (statsRow.columns.contains("num_buckets"))
      statsRow.select("num_buckets").collect()(0).getLong(0).toInt
    else NumBuckets

  private val bucketCountCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long), Int]

  /** Stored bucket count for a corpus dir's memoized index, cached per
    * (store root, stats version) so repeated probes skip the 1-row
    * job.
    */
  def storedNumBuckets(spark: SparkSession, dir: String): Int = {
    val store = ensure(spark, dir)
    val v = store.currentVersion("postings_stats").getOrElse(-1L)
    bucketCountCache.getOrElseUpdate((indexRoot(dir), v),
      numBucketsOf(store.read("postings_stats").get))
  }

  /** Term-selective probe of the stored index: literal bucket
    * predicate (directory pruning) + term equality (row-group
    * pruning). Returns (term, doc_id, positions, tf, term_bucket) for
    * exactly the query terms — the plan contains NO documents scan
    * (guarded in PlanGuardsSpec).
    */
  /** Frame form of the probe — `postings` is any stored postings
    * snapshot (the per-corpus memoized one, or an ingest store's
    * docket index). Pruning still applies when the frame reads the
    * hive layout: the bucket predicate is literal.
    */
  def probeOf(postings: DataFrame, terms: Seq[String],
      numBuckets: Int = NumBuckets): DataFrame = {
    require(terms.nonEmpty, "probe needs at least one term")
    // the index stores lowercase terms (buildPostings lowercases the
    // corpus) — normalize HERE so a mixed-case query hashes to the
    // stored bucket instead of silently missing
    val norm = terms.map(_.toLowerCase).distinct
    val buckets = norm.map(bucketOf(_, numBuckets)).distinct
    postings.filter(col("term_bucket").isin(buckets: _*) &&
      col("term").isin(norm.map(lit): _*))
  }

  def probe(spark: SparkSession, dir: String, terms: Seq[String]): DataFrame =
    probeOf(storedPostings(spark, dir), terms, storedNumBuckets(spark, dir))

  // ---------------------------------------------------------------
  // query surface (SURVEY §2.9 search endpoints, parameterized)
  // ---------------------------------------------------------------

  /** Deterministic TF×rarity keyword search over the STORED index —
    * q44's integer BM25 shape (score = Σ_t tf·W(t), W(t) =
    * ((N−df)·10⁶) div df) as a term-selective probe. df per term =
    * the probe's own row count (one row per (term, doc)); N reads
    * from postings_stats. Terms with df > `maxTermDf` drop from
    * scoring — surviving scores are a certified LOWER BOUND (q193
    * semantics), and at any test SF the default cap drops nothing.
    */
  def keywordSearch(spark: SparkSession, dir: String, terms: Seq[String],
      topK: Int = 20, maxTermDf: Long = DefaultMaxTermDf): DataFrame =
    keywordSearchFrames(storedPostings(spark, dir), stats(spark, dir),
      terms, topK, maxTermDf, storedNumBuckets(spark, dir))

  /** Frame form — search ANY stored postings snapshot (e.g. an ingest
    * store's docket_text index) with its stats row.
    */
  def keywordSearchFrames(postings: DataFrame, statsRow: DataFrame,
      terms: Seq[String], topK: Int = 20,
      maxTermDf: Long = DefaultMaxTermDf,
      numBuckets: Int = NumBuckets): DataFrame = {
    val p = probeOf(postings, terms, numBuckets)
    val nTotal = statsRow.select(col("n_docs").as("n_total"))
    val weights = p.groupBy("term")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxTermDf) // hot-term gate (certified subset)
      .crossJoin(broadcast(nTotal))
      .withColumn("w", expr("((n_total - df) * 1000000L) div df"))
    p.join(broadcast(weights.select("term", "w")), Seq("term"))
      .groupBy("doc_id")
      .agg(sum(col("tf") * col("w")).as("score"),
        count(lit(1)).as("n_terms_matched"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(topK)
  }

  /** Okapi BM25 ranked retrieval over the stored index — the scoring
    * the reference's GIN index would feed (`ts_rank` is Postgres's
    * analogue), in EXACT integer fixed-point so both engines hash the
    * same bytes:
    *
    *   score(d) = Σ_t idf_class(t) · tfnorm_micro(t, d)
    *   tfnorm_micro = (220 · tf · 10⁶) div
    *     (100·tf + (120·(25·T + 75·dl·N)) div (100·T))
    *     — Okapi's tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with
    *     k1=1.2, b=0.75 as ×100 fixed-point and avgdl = T/N expanded
    *     so the only rounding is two truncating divisions, mirrored
    *     verbatim in the oracle;
    *   idf_class = bitlen(max((2(N−df)+1) div (2df+1), 1))
    *     — the house integer log₂ of the Robertson–Sparck Jones idf
    *     (N−df+0.5)/(df+0.5), floored at one class so a matched term
    *     never scores negative (Lucene's BM25 floors idf the same
    *     way).
    *
    * dl rides ON the postings row (see [[buildPostings]]) and N/T on
    * the stats row, so the probe stays df-bounded with zero
    * corpus-sized joins. Hot-term gate as in [[keywordSearch]].
    */
  def bm25Search(spark: SparkSession, dir: String, terms: Seq[String],
      topK: Int = 20, maxTermDf: Long = DefaultMaxTermDf): DataFrame =
    bm25SearchFrames(storedPostings(spark, dir), stats(spark, dir),
      terms, topK, maxTermDf, storedNumBuckets(spark, dir))

  /** Frame form — see [[keywordSearchFrames]]. */
  def bm25SearchFrames(postings: DataFrame, statsRow: DataFrame,
      terms: Seq[String], topK: Int = 20,
      maxTermDf: Long = DefaultMaxTermDf,
      numBuckets: Int = NumBuckets): DataFrame = {
    val p = probeOf(postings, terms, numBuckets)
    val weights = p.groupBy("term")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxTermDf)
      .crossJoin(broadcast(statsRow))
      .withColumn("idf_class", length(bin(greatest(
        expr("(2 * (n_docs - df) + 1) div (2 * df + 1)"), lit(1L))))
        .cast("long"))
    p.join(broadcast(weights.select("term", "idf_class", "n_docs",
      "total_tokens")), Seq("term"))
      .withColumn("tfnorm_micro", expr(
        "(220 * tf * 1000000) div (100 * tf + " +
          "(120 * (25 * total_tokens + 75 * dl * n_docs)) div (100 * total_tokens))"))
      .groupBy("doc_id")
      .agg(sum(expr("tfnorm_micro * idf_class")).as("score_micro"),
        count(lit(1)).as("n_terms_matched"))
      .orderBy(desc("score_micro"), asc("doc_id"))
      .limit(topK)
  }

  /** N-term PHRASE search over the stored index: the phrase's terms
    * must appear at consecutive positions (term i at offset i), i.e.
    * the occurrence-start set is ∩_i (positions(term_i) − i), computed
    * ROW-locally once the per-doc position lists meet on ONE doc_id
    * equi-join (AND semantics via the all-terms-present count filter).
    * Repeated terms work (the same list intersects at each of its
    * offsets). Terms with df > `maxTermDf` become POSITION GAPS —
    * Postgres's stopword phrase semantics: the surviving terms must
    * still sit at their original offsets, so results are a certified
    * match on the surviving pattern. Returns (doc_id, n_phrase,
    * n_terms_used), top-k by occurrence count.
    */
  def phraseSearch(spark: SparkSession, dir: String, phrase: Seq[String],
      topK: Int = 20, maxTermDf: Long = DefaultMaxTermDf): DataFrame =
    phraseSearchFrames(storedPostings(spark, dir), phrase, topK, maxTermDf,
      storedNumBuckets(spark, dir))

  /** Frame form — see [[keywordSearchFrames]]. */
  def phraseSearchFrames(postings: DataFrame, phrase: Seq[String],
      topK: Int = 20, maxTermDf: Long = DefaultMaxTermDf,
      numBuckets: Int = NumBuckets): DataFrame = {
    require(phrase.nonEmpty, "phrase needs at least one term")
    val norm = phrase.map(_.toLowerCase)
    // ONE index probe serves both the df gate and the per-doc frame
    // (r10 verdict minor): the pruned probe materializes once
    // (df-bounded — |query terms| posting lists), the df collect and
    // the position intersect both read the materialized blocks
    val p = probeOf(postings, norm.distinct, numBuckets).localCheckpoint(true)
    // bounded driver-side frame (≤ |phrase| rows): df per query term,
    // to decide which survive the hot-term gate — the same k-row
    // "seeds frame" pattern as the vector-family calibration collects
    val dfs: Map[String, Long] = p.groupBy("term")
      .agg(count(lit(1)).as("df")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val surviving = norm.zipWithIndex
      .filter { case (t, _) => dfs.getOrElse(t, 0L) <= maxTermDf }
    val spark2 = postings.sparkSession
    import spark2.implicits._
    if (surviving.isEmpty)
      return Seq.empty[(Long, Long, Long)]
        .toDF("doc_id", "n_phrase", "n_terms_used")
    val terms = surviving.map(_._1).distinct
    val perDoc = p.filter(col("term").isin(terms.map(lit): _*))
      .groupBy("doc_id")
      .agg(map_from_entries(collect_list(
        struct(col("term"), col("positions")))).as("tm"),
        count(lit(1)).as("n_present"))
      .filter(col("n_present") === terms.size) // AND semantics
    val starts = surviving.tail.foldLeft(
      transform(element_at(col("tm"), lit(surviving.head._1)),
        x => x - surviving.head._2)) { case (acc, (t, off)) =>
      array_intersect(acc,
        transform(element_at(col("tm"), lit(t)), x => x - off))
    }
    perDoc
      .withColumn("n_phrase", size(starts).cast("long"))
      .filter(col("n_phrase") > 0)
      .select(col("doc_id"), col("n_phrase"),
        lit(surviving.size.toLong).as("n_terms_used"))
      .orderBy(desc("n_phrase"), asc("doc_id"))
      .limit(topK)
  }
}
