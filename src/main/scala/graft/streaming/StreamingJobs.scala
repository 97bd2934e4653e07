package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import graft.ingest.IngestJob
import graft.store.SnapshotStore

/** Streaming surface (SURVEY §2.10). The reference names streaming
  * only as future work (README.md:244-245); the engine gets it for
  * free because the batch ingest is a deterministic function
  * `RawBatch → TableDeltas`: a `foreachBatch` wrapper replays exactly
  * the batch semantics over a file (or Kafka) stream, and the
  * variation counters (G9) are `flatMapGroupsWithState`-shaped.
  */
object StreamingIngest {

  /** Continuous ingest: watch `inputDir` for JSON docket files; each
    * micro-batch runs the batch IngestJob and merges its deltas into
    * the snapshot store with the same semantics as a manual run
    * (upsert cases, insert-if-absent dims, additive variations,
    * append ledgers). runId = micro-batch id; epochTs is injectable
    * for deterministic tests.
    */
  /** @param retainVersions when set, vacuum each merged table down to
    *   the newest N snapshot versions after every batch — continuous
    *   merges otherwise accumulate a full table copy per micro-batch.
    *   Leave None if external readers time-travel into old versions
    *   (single-writer assumption: vacuum deletes files a concurrent
    *   reader of an OLD version could still hold open).
    */
  def start(spark: SparkSession, inputDir: String, checkpointDir: String,
      store: SnapshotStore, epochTs: Long => Timestamp =
        _ => new Timestamp(System.currentTimeMillis()),
      retainVersions: Option[Int] = None,
      embedder: Option[graft.rag.Embedder] = None,
      compactEvery: Int = 0): StreamingQuery = {
    val raw = spark.readStream
      .schema(IngestJob.rawSchema)
      .option("multiLine", true)
      .json(inputDir)
    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(store, batch, batchId, s"stream:$inputDir", inputDir,
          epochTs(batchId), compactEvery = compactEvery, embedder = embedder)
        retainVersions.foreach(n =>
          store.tables().foreach(t => store.vacuum(t, keepLast = n)))
      }
      .start()
  }

  /** Bucket fan-out of the ingest tables and ledgers — ONE constant,
    * shared by [[bucketed]], [[ensureBucketed]], and every consumer
    * that re-derives a bucket from a key (the quarantine JSONL rewrite
    * prunes on it): a drifted copy of this literal would silently
    * match zero partitions.
    */
  private[streaming] val BucketCount = 64L

  /** 64-way bucket column derived from a hash-of-key surrogate id —
    * the hive-partition key of the corpus-scaled ingest tables
    * (parties, case_parties, party_name_variations) and the ledgers.
    */
  private[streaming] def bucketed(df: DataFrame, bucketCol: String,
      of: org.apache.spark.sql.Column): DataFrame =
    df.withColumn(bucketCol, pmod(of, lit(BucketCount)).cast("int"))

  private[streaming] def bucketsOf(df: DataFrame, bucketCol: String): Seq[Int] =
    df.select(bucketCol).distinct().collect().map(_.getInt(0)).sorted.toSeq

  /** One-time layout migration: rewrite a pre-bucket table
    * hive-partitioned on the derived bucket (no-op otherwise).
    */
  private[streaming] def ensureBucketed(store: SnapshotStore, table: String,
      bucketCol: String, of: org.apache.spark.sql.Column): Unit =
    store.read(table).foreach { cur =>
      if (!cur.columns.contains(bucketCol)) {
        store.write(table,
          cur.withColumn(bucketCol, pmod(of, lit(BucketCount)).cast("int"))
            .repartition(col(bucketCol)),
          partitionCols = Seq(bucketCol))
        ()
      }
    }

  /** Merge one IngestResult's tables into a store — SHARED by the
    * streaming micro-batch commit and the CLI batch ingest so the
    * layout choreography can never drift between the two entrances.
    *
    * Layouts: courts / judges / case_types are genuinely dim-sized
    * (entity vocabularies, not corpus-scaled) — an unpartitioned
    * merge rewrites KBs and stays the simpler layout. parties,
    * case_parties, and party_name_variations GROW WITH THE CORPUS:
    * they merge partition-scoped on a bucket derived from the
    * hash-of-key surrogate id, so a batch rewrites only its own
    * buckets, and — the bucket being a pure function of the merge
    * key — the collide set is the batch's own buckets, no probe.
    * Ledgers append into the run's own bucket partition (a run-scoped
    * report read prunes to it). ensureBucketed migrates pre-bucket
    * stores once, then every merge is O(batch).
    */
  def mergeResult(store: SnapshotStore, r: graft.ingest.IngestResult): Unit = {
    store.mergeLastWriteWins("cases", r.cases, Seq("case_number"),
      partitionCols = Seq("filed_year"))
    store.mergeInsertIfAbsent("courts", r.courts, Seq("normalized_name"))
    store.mergeInsertIfAbsent("judges", r.judges, Seq("normalized_name"))
    store.mergeInsertIfAbsent("case_types", r.caseTypes, Seq("name"))
    val partiesB = bucketed(r.parties, "p_bucket", col("id"))
    ensureBucketed(store, "parties", "p_bucket", col("id"))
    store.mergeInsertIfAbsent("parties", partiesB, Seq("normalized_name"),
      partitionCols = Seq("p_bucket"),
      collideHint = Some(bucketsOf(partiesB, "p_bucket")))
    val cpB = bucketed(r.caseParties, "cp_bucket", col("case_id"))
    ensureBucketed(store, "case_parties", "cp_bucket", col("case_id"))
    store.mergeInsertIfAbsent("case_parties", cpB,
      Seq("case_id", "party_id", "role"),
      partitionCols = Seq("cp_bucket"),
      collideHint = Some(bucketsOf(cpB, "cp_bucket")))
    store.mergeAdditive("court_name_variations", r.courtVariations,
      Seq("court_id", "raw_name"), Seq("seen_count"),
      Seq("first_seen_at"), Seq("last_seen_at"))
    store.mergeAdditive("judge_name_variations", r.judgeVariations,
      Seq("judge_id", "raw_name"), Seq("seen_count"),
      Seq("first_seen_at"), Seq("last_seen_at"))
    val pvB = bucketed(r.partyVariations, "v_bucket", col("party_id"))
    ensureBucketed(store, "party_name_variations", "v_bucket", col("party_id"))
    store.mergeAdditive("party_name_variations", pvB,
      Seq("party_id", "raw_name"), Seq("seen_count"),
      Seq("first_seen_at"), Seq("last_seen_at"),
      partitionCols = Seq("v_bucket"),
      collideHint = Some(bucketsOf(pvB, "v_bucket")))
    if (!r.quarantine.isEmpty) {
      ensureBucketed(store, "quarantine", "run_bucket", col("run_id"))
      store.append("quarantine",
        bucketed(r.quarantine, "run_bucket", col("run_id")),
        partitionCols = Seq("run_bucket"))
      ()
    }
    if (!r.errors.isEmpty) {
      ensureBucketed(store, "ingest_errors", "run_bucket", col("run_id"))
      store.append("ingest_errors",
        bucketed(r.errors, "run_bucket", col("run_id")),
        partitionCols = Seq("run_bucket"))
      ()
    }
  }

  /** One micro-batch's store merge. IDEMPOTENT on `batchId`: after a
    * crash between the sink commit and the checkpoint commit,
    * foreachBatch REPLAYS the batch — without this guard the replay
    * would double the additive variation counters and duplicate every
    * ledger append. The run ledger doubles as the commit log: a batch
    * whose run_id is already recorded was fully merged (it is appended
    * last), so the replay is a no-op.
    */
  /** @param embedder when set, the SAME idempotent commit also keeps
    *   the RAG serving tables fresh: the batch's upserted cases
    *   re-chunk + re-embed (case-keyed LWW, so a re-ingested case
    *   whose text shrinks LOSES its stale chunk rows) into
    *   `case_chunk_embeddings`, and the chunk-ANN index extends
    *   incrementally against its stored centroids (first batch
    *   trains). The reference runs backfill as a separate cron
    *   (rag.py); a continuous pipeline folds it into ingest so
    *   searchDockets never serves a case whose chunks lag its text.
    */
  def processBatch(store: SnapshotStore, batch: DataFrame, batchId: Long,
      sourceName: String, sourceUri: String, ts: Timestamp,
      compactEvery: Int = 0,
      embedder: Option[graft.rag.Embedder] = None): Unit = {
    val alreadyDone = store.read("ingest_runs").exists(
      _.filter(col("run_id") === batchId).limit(1).count() > 0)
    if (alreadyDone) return
    // classify inserted/updated against the snapshot the reference way
    // (xmax=0, ingest.py:627): a streamed case_number that already
    // exists in the store is an update, not an insert
    val prior = store.read("cases").map(_.select("case_number"))
    val r = IngestJob.run(batch.sparkSession,
      IngestJob.withSeq(batch.sparkSession, batch),
      runId = batchId, sourceName = sourceName,
      sourceUri = sourceUri, ts = ts, priorCaseNumbers = prior)
    mergeResult(store, r)
    // FTS index maintenance inside the SAME idempotent commit — the
    // reference's GIN index on cases.docket_text (schema.sql:141) as a
    // stored docket-postings table: LWW on the case's surrogate id, so
    // an upserted case replaces its postings exactly like its row.
    // StreamingPostings carries its own batch marker, so a crash-replay
    // of THIS batch skips the already-merged index work.
    StreamingPostings.processBatch(store,
      r.cases.select(col("id").as("doc_id"),
        coalesce(col("docket_text"), lit("")).as("text")), batchId,
      compactEvery = compactEvery)
    // RAG serving tables inside the same commit (see the scaladoc):
    // chunk + embed ONLY the batch's cases, replace per CASE (LWW on
    // case_number drops a shrunken case's stale chunk rows), and
    // extend the chunk-ANN index against its stored centroids — every
    // step idempotent (deterministic content, LWW merges), so the
    // run-ledger replay guard plus crash re-runs both stay safe
    embedder.foreach { emb =>
      val chunks = graft.rag.RagPipeline.embedChunks(
        graft.rag.RagPipeline.chunkCases(
          r.cases.select("case_number", "docket_text")), emb)
        .localCheckpoint(true) // consumed by two merges
      // the serving table is hive-partitioned by case_bucket (a pure
      // function of the merge key), so the per-batch merge rewrites
      // ONLY the batch's own buckets — no full-table rewrite, no
      // collide probe. ensureCaseBucketed migrates pre-bucket stores.
      graft.rag.RagPipeline.ensureCaseBucketed(store, "case_chunk_embeddings")
      store.mergeLastWriteWins("case_chunk_embeddings",
        graft.rag.RagPipeline.withCaseBucket(chunks),
        Seq("case_number"), partitionCols = Seq("case_bucket"),
        sortCols = Seq("case_number", "chunk_id"),
        collideHint = Some(graft.rag.RagPipeline.caseBucketsOf(chunks)))
      if (store.currentVersion("chunk_ann_centroids").isEmpty)
        graft.rag.RagPipeline.indexChunks(store,
          store.read("case_chunk_embeddings").get
            .select("case_number", "chunk_id", "chunk_text", "embedding"))
      else graft.rag.RagPipeline.mergeChunkIndex(store, chunks)
    }
    // the commit marker: MUST stay the last write (see idempotency note)
    store.append("ingest_runs", r.runLedger)
    // post-commit maintenance: every partition-scoped merge adds a file
    // pile to the touched partitions, so long-running streams compact on
    // a cadence. Content-neutral, so replay/crash around it is safe.
    // The RAG serving/chunk-index tables ride the same cadence when
    // maintained (their per-batch merges pile files exactly like cases;
    // cluster sorts survive the rewrite so pruned probes keep their
    // row-group selectivity).
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
      store.compact("cases", maxFilesPerPartition = 4)
      if (embedder.isDefined) {
        store.compact("case_chunk_embeddings", maxFilesPerPartition = 4,
          sortCols = Seq("case_number", "chunk_id"))
        store.compact("chunk_ann_assignments", maxFilesPerPartition = 4,
          sortCols = Seq("case_number", "chunk_id"))
        store.compact("chunk_ann_case_map", maxFilesPerPartition = 4,
          sortCols = Seq("case_number"))
      }
    }
    ()
  }
}

/** Continuous near-duplicate filtering — the streaming face of the
  * batch dedup family (DedupQueries q33/q36): each micro-batch's
  * documents are simhash-banded and joined against the ACCUMULATED
  * signature store, so a doc within Hamming ≤ `maxHamming` of any
  * previously kept doc (or of an earlier doc in the same batch) is
  * diverted to `near_dups`; novel docs land in `kept` and append
  * their signatures. State is the banded signature table itself —
  * PRE-BANDED (4 rows per kept doc) and hive-partitioned by the band
  * key, so it doubles as the LSH index: a batch's probe reads only
  * the key dirs its own band keys name (literal IN → directory
  * pruning), never a full scan + re-explode of the accumulated
  * corpus. Snapshot-versioned and shared with batch consumers rather
  * than opaque operator state; per-batch work is the band-equi-join
  * shape that scales (cost tracks collisions, never batch × corpus).
  * Idempotent on batchId via the same ledger-as-commit-log protocol
  * as StreamingIngest.
  */
object StreamingNearDup {
  import graft.functions.TextFunctions._

  private val bands = 4

  private[streaming] def banded(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), col("sh"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sh"), b * 8).bitwiseAND(255L).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("sh"), col("bk.band"), col("bk.key"))

  /** The banded signature rows of a `(doc_id, text)` frame — the
    * store's row shape, derived purely from the text (what lets the
    * CDC follower compute a victim's OLD band keys from the feed's
    * `before.text` instead of probing the index).
    */
  private[streaming] def bandedSignaturesOf(docs: DataFrame): DataFrame =
    banded(docs.select(col("doc_id"),
      simHash32(tokens(col("text"))).as("sh")))

  /** One-time layout migration: rewrite a per-doc (doc_id, sh)
    * signature table into the PRE-BANDED, key-partitioned probe
    * layout (the store IS the LSH index: a batch's probe reads only
    * the ≤256 key dirs its own band keys name, never a full scan +
    * re-explode of the accumulated corpus).
    */
  private def ensureBandedSignatures(store: SnapshotStore): Unit =
    store.read("signatures").foreach { cur =>
      if (!cur.columns.contains("key")) {
        store.write("signatures",
          banded(cur.select("doc_id", "sh")).repartition(col("key"))
            .sortWithinPartitions("key", "band"),
          partitionCols = Seq("key"))
        ()
      }
    }

  /** One micro-batch: returns (kept, nearDups) after merging into the
    * store. Public so tests (and batch callers) can drive it directly.
    */
  def processBatch(store: SnapshotStore, batch: DataFrame, batchId: Long,
      maxHamming: Int = 2, compactEvery: Int = 0): Unit = {
    val alreadyDone = store.read("neardup_batches").exists(
      _.filter(col("batch_id") === batchId).limit(1).count() > 0)
    if (alreadyDone) return
    val spark = batch.sparkSession
    val sigs = batch
      .select(col("doc_id"), col("text"),
        simHash32(tokens(col("text"))).as("sh"))
      .localCheckpoint(true) // tiny; read by several joins below
    val newBanded = banded(sigs.select("doc_id", "sh"))
      .localCheckpoint(true) // read by the key collect, 2 joins, the write
    ensureBandedSignatures(store)
    // vs prior corpus: any stored signature within the Hamming bound.
    // The store is pre-banded and key-partitioned, so the probe reads
    // ONLY the key dirs the batch's own band keys name (literal IN →
    // directory pruning) — cost tracks matching keys, not the corpus.
    val dupVsPrior = store.read("signatures") match {
      case Some(prior) =>
        val batchKeys = newBanded.select("key").distinct().collect()
          .map(_.getAs[Number](0).longValue).sorted.toSeq
        newBanded.join(prior.filter(col("key").isin(batchKeys: _*))
          .select(col("band"), col("key"), col("sh").as("p_sh")),
          Seq("band", "key"))
          .filter(hamming32(col("sh"), col("p_sh")) <= maxHamming)
          .select("doc_id").distinct()
      case None => sigs.select("doc_id").limit(0)
    }
    // within-batch: the EARLIER doc (min doc_id) survives, exactly the
    // batch family's canonical keep-rule
    val dupInBatch = newBanded.select(col("doc_id").as("a_id"),
      col("sh").as("a_sh"), col("band"), col("key"))
      .join(newBanded.select(col("doc_id").as("b_id"), col("sh").as("b_sh"),
        col("band"), col("key")), Seq("band", "key"))
      .filter(col("a_id") < col("b_id"))
      .filter(hamming32(col("a_sh"), col("b_sh")) <= maxHamming)
      .select(col("b_id").as("doc_id")).distinct()
    val dupIds = dupVsPrior.unionByName(dupInBatch).distinct()
    val kept = sigs.join(dupIds, Seq("doc_id"), "left_anti")
      .localCheckpoint(true) // read by two appends
    val dups = sigs.join(dupIds, Seq("doc_id"), "left_semi")
    // appends land partition-scoped: signatures into the batch's own
    // key dirs (pre-banded — the probe layout), kept/near_dups into
    // doc-id buckets — never a full rewrite of a corpus-scaled table
    store.append("signatures",
      newBanded.join(kept.select("doc_id"), Seq("doc_id"), "left_semi"),
      partitionCols = Seq("key"))
    StreamingIngest.ensureBucketed(store, "kept", "doc_bucket", col("doc_id"))
    store.append("kept",
      StreamingIngest.bucketed(kept.select("doc_id", "text"),
        "doc_bucket", col("doc_id")),
      partitionCols = Seq("doc_bucket"))
    if (!dups.isEmpty) {
      StreamingIngest.ensureBucketed(store, "near_dups", "doc_bucket",
        col("doc_id"))
      store.append("near_dups",
        StreamingIngest.bucketed(dups.select("doc_id", "text"),
          "doc_bucket", col("doc_id")),
        partitionCols = Seq("doc_bucket"))
      ()
    }
    // commit marker LAST (see StreamingIngest.processBatch)
    store.append("neardup_batches", {
      import spark.implicits._
      Seq(batchId).toDF("batch_id")
    })
    // post-commit maintenance, content-neutral (replay-safe): every
    // bucketed append adds a file per touched partition, so
    // long-running streams compact the accumulating tables on a
    // cadence (the postings/cases OPTIMIZE rhythm)
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
      store.compact("signatures", maxFilesPerPartition = 4)
      store.compact("kept", maxFilesPerPartition = 4)
      store.compact("near_dups", maxFilesPerPartition = 4)
    }
    ()
  }

  /** Watch `inputDir` for JSON files of `{doc_id, text}` documents. */
  def start(spark: SparkSession, inputDir: String, checkpointDir: String,
      store: SnapshotStore, maxHamming: Int = 2,
      compactEvery: Int = 0): StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    spark.readStream.schema(schema).option("multiLine", true).json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(store, batch, batchId, maxHamming, compactEvery)
      }
      .start()
  }
}

/** Continuous inverted-index maintenance — the streaming face of the
  * MATERIALIZED postings snapshot (graft.search.PostingsIndex, the
  * engine's stored GIN equivalent): each micro-batch's documents
  * tokenize ONCE (the delta is the only new work — q149's lesson as a
  * running service, the corpus is never rescanned) and merge into the
  * stored index with LAST-WRITE-WINS ON doc_id: a re-ingested doc
  * replaces ALL its postings rows, including rows for terms it no
  * longer contains — the correctness case a term-keyed additive merge
  * would silently corrupt. The stats row (n_docs + total_tokens —
  * IDF's N and BM25's avgdl) maintains from a last-write-wins
  * (doc_id, dl) registry, so re-ingests neither double-count the
  * corpus size nor leave a stale length in the normalization.
  *
  * The whole merge is idempotent BY CONSTRUCTION (two LWW merges +
  * a recomputed scalar), so a crash anywhere inside the batch
  * replays safely; the ledger marker additionally makes the replay a
  * no-op (same protocol as StreamingIngest). Probes see either the
  * old snapshot or the new one — never a half-merged index (the
  * SnapshotStore pointer swap).
  *
  * Stats maintenance is O(touched buckets), not O(corpus) (r10
  * verdict minor): the (doc_id, dl) registry is hive-partitioned by
  * `doc_bucket = pmod(doc_id, DocRegistryBuckets)`, a batch
  * recomputes the (n_docs, total_tokens) SUBTOTALS of only the
  * buckets it touched (a partition-pruned literal-IN scan), and the
  * global stats row sums ≤ DocRegistryBuckets subtotal rows. Every
  * step remains a deterministic function of the post-merge store
  * state — a delta-additive counter would instead double-apply on a
  * crash replay between the registry merge and the stats write.
  */
object StreamingPostings {

  /** Hive-bucket count for the (doc_id, dl) registry. Per-batch stats
    * cost tracks touched buckets × bucket size, so a production
    * deployment raises it with the corpus exactly like
    * PostingsIndex.NumBuckets (and like it, the layout is
    * self-describing — pmod of the stored partition column).
    */
  val DocRegistryBuckets = 64

  /** The TERM-bucket count this store's postings are hashed with: the
    * stored stats row's `num_buckets` when the index exists, else the
    * compile-time floor (first batch of a fresh store). Every merge
    * path buckets its batch with this, so maintenance follows an index
    * built at any derived width (PostingsIndex.bucketsFor).
    */
  private def storedBuckets(store: SnapshotStore): Int =
    store.read("postings_stats")
      .map(graft.search.PostingsIndex.numBucketsOf)
      .getOrElse(graft.search.PostingsIndex.NumBuckets)

  /** The per-bucket (n_docs, total_tokens) subtotals of the touched
    * registry buckets — factored out so the plan is testable: the
    * registry scan must carry a `doc_bucket` partition filter (the
    * whole point — the corpus-sized registry is never rescanned).
    * LEFT join from the touched-key frame: a bucket a DELETION fully
    * drained still gets an explicit zero row, so its stale subtotal
    * can never survive the merge.
    */
  def touchedBucketTotals(store: SnapshotStore,
      touched: Seq[Long]): DataFrame = {
    val reg = store.read("indexed_docs").get
    val spark = reg.sparkSession
    import spark.implicits._
    touched.toDF("doc_bucket").join(
      reg.filter(col("doc_bucket").isin(touched: _*))
        // hive partition values read back as int — pin long so the
        // subtotal table's schema is merge-stable across batches
        .groupBy(col("doc_bucket").cast("long").as("doc_bucket"))
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum("dl"), lit(0L)).as("total_tokens")),
      Seq("doc_bucket"), "left")
      .na.fill(0L, Seq("n_docs", "total_tokens"))
  }

  /** One-time registry migration: attach the `term_buckets` column
    * (each doc's posting partitions) to a registry written before the
    * sidecar column existed — one pass over postings + registry, after
    * which every merge is bucket-pruned. No-op on current layouts.
    */
  def ensureRegistryTermBuckets(store: SnapshotStore): Unit =
    store.read("indexed_docs").foreach { reg =>
      if (!reg.columns.contains("term_buckets")) {
        // hive partition values read back as int — pin long so the
        // migrated column matches the batch-built array<bigint>
        val tb = store.read("postings").get.groupBy("doc_id")
          .agg(sort_array(collect_set(col("term_bucket").cast("long")))
            .as("term_buckets"))
        store.write("indexed_docs",
          reg.join(tb, Seq("doc_id"), "left")
            .withColumn("term_buckets",
              coalesce(col("term_buckets"), typedlit(Seq.empty[Long])))
            .repartition(col("doc_bucket")),
          partitionCols = Seq("doc_bucket"))
        ()
      }
    }

  /** One micro-batch of `{doc_id, text}` documents into the index at
    * `store`. Partition-scoped: only the term_bucket hive partitions
    * the batch (or a re-ingested doc's prior rows) touch are
    * rewritten; untouched buckets re-link — and the collide set (a
    * re-ingested doc's PRIOR buckets) comes from the registry's
    * term_buckets sidecar, pruned to the batch's own doc buckets, so
    * no merge step reads the index or the registry unpruned.
    * `compactEvery` > 0 runs the store's small-file compaction on that
    * batch cadence (every partition-scoped merge adds a file pile to
    * the touched buckets — the same OPTIMIZE rhythm StreamingIngest
    * uses for cases).
    */
  /** @param recordMarker when false, the shared `postings_batches`
    *   replay-skip ledger is neither consulted nor written — for
    *   callers that carry their OWN idempotency marker (the CDC
    *   follower keys on (index, table, version) in `cdc_applied`).
    *   Reusing the writers' batch-id ledger from a second protocol
    *   would silently replay-skip a real merge whenever the two id
    *   spaces collide (streaming micro-batches start at 0, CLI run
    *   ids at 1, CDC target versions wherever the table is). The
    *   merge body is idempotent by construction (LWW merges +
    *   recomputed stats), so markerless replays converge.
    */
  def processBatch(store: SnapshotStore, batch: DataFrame, batchId: Long,
      compactEvery: Int = 0, recordMarker: Boolean = true): Unit = {
    val alreadyDone = recordMarker && store.read("postings_batches").exists(
      _.filter(col("batch_id") === batchId).limit(1).count() > 0)
    if (alreadyDone) return
    val spark = batch.sparkSession
    // bucket the batch with the STORED layout's count, never the
    // compile-time floor — builds derive their width from corpus size
    // (PostingsIndex.bucketsFor), and a merge hashed with a different
    // count would scatter rows into partitions probes never read
    val numBuckets = storedBuckets(store)
    val posts = graft.search.PostingsIndex
      .buildPostings(batch.select("doc_id", "text"), numBuckets)
      .localCheckpoint(true) // small (one batch); read by two merges
    // doc registry carries dl so total_tokens stays exact across
    // re-ingests (LWW, not insert-if-absent: a re-ingested doc's
    // length changes); token-less docs register with dl = 0. It also
    // records each doc's TERM BUCKETS — the sidecar that lets the
    // postings merge find a re-ingested doc's prior partitions with a
    // doc_bucket-pruned lookup instead of a full-index key probe.
    val batchDl = batch.select("doc_id").distinct()
      .join(posts.select("doc_id", "dl").distinct(), Seq("doc_id"), "left")
      .na.fill(0L, Seq("dl"))
      .join(posts.groupBy("doc_id")
        .agg(sort_array(collect_set(col("term_bucket"))).as("term_buckets")),
        Seq("doc_id"), "left")
      .withColumn("term_buckets",
        coalesce(col("term_buckets"), typedlit(Seq.empty[Long])))
      .withColumn("doc_bucket",
        pmod(col("doc_id"), lit(DocRegistryBuckets.toLong)))
      .localCheckpoint(true) // read by the merges AND the touched probe
    // bounded driver frame (≤ DocRegistryBuckets values): which
    // registry buckets this batch touched
    val touched = batchDl.select("doc_bucket").distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    ensureRegistryTermBuckets(store)
    // prior term buckets of the batch's docs, looked up through the
    // pruned registry — the postings merge's collide set. A registry
    // that never existed next to a non-empty postings table (a store
    // maintained by an older protocol) falls back to the merge's own
    // full-index probe rather than risk a stale-row miss.
    val collide: Option[Seq[Any]] = store.read("indexed_docs") match {
      case Some(reg) =>
        Some(reg.filter(col("doc_bucket").isin(touched: _*))
          .join(graft.store.SnapshotStore.broadcastIfSmall(
            batchDl.select("doc_id")), Seq("doc_id"), "left_semi")
          .select(explode(col("term_buckets")).as("b")).distinct()
          .collect().map(_.getLong(0)).sorted.toSeq)
      case None if store.currentVersion("postings").isEmpty => Some(Nil)
      case None => None
    }
    // a store previously maintained under the segment protocol carries
    // a `seq` column: the LWW merge must match the stored schema, and
    // stamping the rows at currentVersion+1 outranks every outstanding
    // tombstone (dead_below is always ≤ that), so the serving view
    // keeps them
    val postsAligned =
      if (store.read("postings").exists(_.columns.contains("seq")))
        posts.withColumn("seq",
          lit(store.currentVersion("postings").map(_ + 1).getOrElse(0L)))
      else posts
    // keyScope = ALL batch docs: a doc re-ingested with token-less
    // text emits ZERO postings rows but must still DELETE its stale
    // ones — the batch is the complete new posting state of its docs
    store.mergeLastWriteWins("postings", postsAligned, Seq("doc_id"),
      partitionCols = Seq("term_bucket"), sortCols = Seq("term"),
      collideHint = collide,
      keyScope = Some(batchDl.select("doc_id")))
    // the registry merges AFTER the postings (a crash between the two
    // replays with the STALE registry: old term buckets stay visible —
    // a correct superset; prior rows already moved live in the batch's
    // own buckets, which the merge rewrites regardless). Its partition
    // value is pmod of the key, so its collide set is the batch's own
    // buckets — no probe.
    store.mergeLastWriteWins("indexed_docs", batchDl, Seq("doc_id"),
      partitionCols = Seq("doc_bucket"), collideHint = Some(touched))
    store.mergeLastWriteWins("registry_stats",
      touchedBucketTotals(store, touched), Seq("doc_bucket"))
    store.write("postings_stats",
      store.read("registry_stats").get
        .agg(coalesce(sum("n_docs"), lit(0L)).as("n_docs"),
          coalesce(sum("total_tokens"), lit(0L)).as("total_tokens"))
        .withColumn("num_buckets",
          lit(numBuckets.toLong)))
    // commit marker LAST (see StreamingIngest.processBatch)
    if (recordMarker) store.append("postings_batches", {
      import spark.implicits._
      Seq(batchId).toDF("batch_id")
    })
    // post-commit maintenance, content-neutral (replay-safe)
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      store.compact("postings", maxFilesPerPartition = 4,
        sortCols = Seq("term"))
    ()
  }

  // ---- the SEGMENT maintenance path (opt-in, the 100 TB shape) -------
  //
  // The default [[processBatch]] is wall-flat across corpus decades but
  // BYTE-linear: a doc batch's terms hash across every term bucket, so
  // the LWW merge's touched-partition rewrite degenerates to the whole
  // postings table per batch — fine at 500k docs (seconds), a bonfire
  // at 100 TB. The segment protocol is Lucene's answer on the snapshot
  // store: per batch, (1) tombstone the batch's docs below a fresh
  // sequence number (a tiny LWW table — "rows of these docs older than
  // seq s are dead"), then (2) APPEND the batch's postings as new
  // files carrying seq = s ([[SnapshotStore.appendFiles]], O(batch)
  // bytes). Probes read [[servingPostings]] — the appended rows minus
  // a broadcast tombstone filter — and [[foldPostings]] rewrites the
  // table applying the filter on a cadence, amortizing the one
  // O(corpus) pass over N O(batch) merges.
  //
  // Crash ordering: tombstone FIRST, append SECOND, ledger marker last.
  // A crash between the two leaves the batch's docs transiently ABSENT
  // (benign for an index; the mandated replay re-tombstones at a HIGHER
  // seq and re-appends, so the half-applied attempt's rows — if any —
  // die under the new tombstone: replays can never double-count a
  // term). Fold is idempotent for the same reason: surviving rows keep
  // their seq, so re-applying an un-cleared tombstone filters nothing.
  // Single maintainer per index (the follower/stream contract): seq
  // derives from the postings version line, which only that
  // maintainer advances.

  /** One micro-batch under the SEGMENT protocol — same replacement
    * semantics as [[processBatch]] (a re-ingested doc loses ALL its
    * old rows, token-less re-ingests drop the doc), O(batch) write
    * cost. Registry and stats maintenance are identical (already
    * O(touched doc buckets)). `foldEvery` > 0 runs [[foldPostings]]
    * on that batch cadence — the amortization knob.
    */
  def processBatchAppend(store: SnapshotStore, batch: DataFrame,
      batchId: Long, foldEvery: Int = 0, recordMarker: Boolean = true): Unit = {
    val alreadyDone = recordMarker && store.read("postings_batches").exists(
      _.filter(col("batch_id") === batchId).limit(1).count() > 0)
    if (alreadyDone) return
    val spark = batch.sparkSession
    import spark.implicits._
    val numBuckets = storedBuckets(store)
    val posts = graft.search.PostingsIndex
      .buildPostings(batch.select("doc_id", "text"), numBuckets)
      .localCheckpoint(true)
    val batchDl = batch.select("doc_id").distinct()
      .join(posts.select("doc_id", "dl").distinct(), Seq("doc_id"), "left")
      .na.fill(0L, Seq("dl"))
      .join(posts.groupBy("doc_id")
        .agg(sort_array(collect_set(col("term_bucket"))).as("term_buckets")),
        Seq("doc_id"), "left")
      .withColumn("term_buckets",
        coalesce(col("term_buckets"), typedlit(Seq.empty[Long])))
      .withColumn("doc_bucket",
        pmod(col("doc_id"), lit(DocRegistryBuckets.toLong)))
      .localCheckpoint(true)
    // strictly increasing under the single-maintainer contract: every
    // prior segment append (and every fold) bumped the version line
    val seq = store.currentVersion("postings").map(_ + 1).getOrElse(0L)
    // 1. tombstone: the batch is the complete new state of its docs
    store.mergeLastWriteWins("postings_tombstones",
      batchDl.select("doc_id").withColumn("dead_below", lit(seq)),
      Seq("doc_id"))
    // 2. the segment: new files only, every prior file linked forward
    store.appendFiles("postings", posts.withColumn("seq", lit(seq)),
      partitionCols = Seq("term_bucket"), sortCols = Seq("term"))
    // registry + stats: the existing idempotent choreography — EXCEPT
    // term_buckets, which must UNION the prior generations' buckets: a
    // segment store keeps a doc's old rows physically alive until the
    // fold, and the erasure path's collide hint must cover every
    // partition any generation sits in (a latest-only registry missed
    // an old generation's bucket and the erasure left its row alive —
    // spec-pinned). Supersets are always safe for collide hints; folds
    // drop the dead rows and the next re-ingest re-tightens the set.
    val touched = batchDl.select("doc_bucket").distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    ensureRegistryTermBuckets(store)
    val regDl = store.read("indexed_docs") match {
      case Some(reg) =>
        val prior = reg.filter(col("doc_bucket").isin(touched: _*))
          .join(graft.store.SnapshotStore.broadcastIfSmall(
            batchDl.select("doc_id")), Seq("doc_id"), "left_semi")
          .select(col("doc_id"),
            col("term_buckets").cast("array<long>").as("prior_tb"))
        batchDl.join(prior, Seq("doc_id"), "left")
          .withColumn("term_buckets", sort_array(array_distinct(concat(
            col("term_buckets"),
            coalesce(col("prior_tb"), typedlit(Seq.empty[Long]))))))
          .drop("prior_tb")
      case None => batchDl
    }
    store.mergeLastWriteWins("indexed_docs", regDl, Seq("doc_id"),
      partitionCols = Seq("doc_bucket"), collideHint = Some(touched))
    store.mergeLastWriteWins("registry_stats",
      touchedBucketTotals(store, touched), Seq("doc_bucket"))
    store.write("postings_stats",
      store.read("registry_stats").get
        .agg(coalesce(sum("n_docs"), lit(0L)).as("n_docs"),
          coalesce(sum("total_tokens"), lit(0L)).as("total_tokens"))
        .withColumn("num_buckets",
          lit(numBuckets.toLong)))
    if (recordMarker) store.append("postings_batches",
      Seq(batchId).toDF("batch_id"))
    if (foldEvery > 0 && (batchId + 1) % foldEvery == 0) { foldPostings(store); () }
    ()
  }

  /** The probe-facing view of a segment-maintained postings table:
    * appended rows minus the tombstoned generations. Pre-segment rows
    * (no `seq` column / null seq) read as generation 0. The tombstone
    * side is small by construction (only docs replaced since the last
    * fold) and broadcast by measured size, so a probe pays one
    * map-side filter over its term-pruned rows — never a corpus join.
    * On a store with no tombstones (a batch-built index, or right
    * after a fold) the view is the raw table.
    */
  def servingPostings(store: SnapshotStore): DataFrame = {
    val base0 = store.read("postings").get
    val base = (if (base0.columns.contains("seq"))
      base0.withColumn("seq", coalesce(col("seq"), lit(0L)))
    else base0.withColumn("seq", lit(0L)))
    store.read("postings_tombstones") match {
      case None => base
      case Some(t) =>
        base.join(graft.store.SnapshotStore.broadcastIfSmall(
          t.select("doc_id", "dead_below")), Seq("doc_id"), "left")
          .filter(col("dead_below").isNull || col("seq") >= col("dead_below"))
          .drop("dead_below")
    }
  }

  /** Fold the segments: drop dead generations and clear their spent
    * tombstones. Two shapes behind one knob:
    *
    *   - `maxBuckets = Int.MaxValue` (default): ONE full-table rewrite
    *     of the serving view, files re-clustered by term — the
    *     compacting fold, O(corpus) when it fires.
    *   - bounded `maxBuckets`: an INCREMENTAL, doc-scoped fold — pick
    *     tombstoned docs (smallest bucket footprints first) until
    *     their generations' term buckets fill the budget, then one
    *     partition-scoped LWW merge replaces exactly those docs' rows
    *     with their live generation (keyScope drops every generation,
    *     the batch is the serving rows) and clears ONLY their
    *     tombstones. No single round ever pays more than `maxBuckets`
    *     bucket rewrites; successive rounds converge to the full
    *     fold's fixed point (tombstones drain monotonically). This is
    *     Lucene's per-segment merge on the snapshot store — the r13
    *     full fold was one O(corpus) job whenever it fired (3.3 GB
    *     input at sf10); the bounded form caps every round.
    *
    * Idempotent in both shapes: a crash between the rewrite and the
    * clear re-applies tombstones to rows that already survived them
    * (seq is preserved, so the filter keeps everything), and the next
    * fold clears them. A doc whose tombstone row predates the doc
    * registry (legacy store) folds through the full shape only.
    */
  def foldPostings(store: SnapshotStore,
      maxBuckets: Int = Int.MaxValue): Option[Long] = {
    val t = store.read("postings_tombstones").getOrElse(return None)
    if (t.isEmpty) return None
    val spark = t.sparkSession
    import spark.implicits._
    if (maxBuckets == Int.MaxValue || store.read("indexed_docs").isEmpty) {
      val folded = servingPostings(store)
        .localCheckpoint(true) // sever from the version being replaced
        .repartition(col("term_bucket"))
        .sortWithinPartitions("term_bucket", "term")
      val v = store.write("postings", folded, partitionCols = Seq("term_bucket"))
      store.write("postings_tombstones", t.filter(lit(false)))
      return Some(v)
    }
    // tombstoned docs with the buckets ANY generation can sit in — the
    // registry's term_buckets is a superset by construction (it unions
    // prior generations on every segment append)
    val tsDocs = t.select("doc_id").distinct()
      .withColumn("doc_bucket",
        pmod(col("doc_id"), lit(DocRegistryBuckets.toLong)))
      .localCheckpoint(true)
    val regBuckets = tsDocs.select("doc_bucket").distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    val allBuckets = (0L until graft.search.PostingsIndex
      .numBucketsOf(store.read("postings_stats").get).toLong).toSeq
    val reg = store.read("indexed_docs").get
    val known = reg.filter(col("doc_bucket").isin(regBuckets: _*))
      .join(graft.store.SnapshotStore.broadcastIfSmall(
        tsDocs.select("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("term_buckets").cast("array<long>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // a tombstoned doc missing from the registry (shouldn't happen —
    // defensive) could sit anywhere: it folds only when the budget
    // covers every bucket
    val docBuckets = tsDocs.select("doc_id").collect().map(_.getLong(0))
      .map(id => id -> known.getOrElse(id, allBuckets)).toSeq
    // greedy: smallest footprints first, always at least one doc
    val sorted = docBuckets.sortBy { case (id, bs) => (bs.size, id) }
    val chosenIds = Seq.newBuilder[Long]
    var union = Set.empty[Long]
    var taken = 0
    sorted.foreach { case (id, bs) =>
      val u = union ++ bs
      if (taken == 0 || u.size <= maxBuckets) {
        chosenIds += id; union = u; taken += 1
      }
    }
    val ids = chosenIds.result()
    val buckets = union.toSeq.sorted
    val chosenDf = ids.toDF("doc_id").localCheckpoint(true)
    val live = servingPostings(store)
      .filter(col("term_bucket").isin(buckets: _*))
      .join(graft.store.SnapshotStore.broadcastIfSmall(chosenDf),
        Seq("doc_id"), "left_semi")
      .localCheckpoint(true) // sever from the version being replaced
    val v = store.mergeLastWriteWins("postings", live, Seq("doc_id"),
      partitionCols = Seq("term_bucket"), sortCols = Seq("term"),
      collideHint = Some(buckets), keyScope = Some(chosenDf))
    // clear ONLY the folded docs' tombstones — and only after their
    // dead rows are physically gone (the crash-ordering discipline)
    store.mergeLastWriteWins("postings_tombstones", t.filter(lit(false)),
      Seq("doc_id"), keyScope = Some(chosenDf))
    Some(v)
  }

  /** Watch `inputDir` for JSON files of `{doc_id, text}` documents.
    * Maintains through the SEGMENT protocol by default (r14: O(batch)
    * write cost per micro-batch, fold every `foldEvery` batches);
    * `segment = false` keeps the simple LWW mode with its
    * `compactEvery` cadence.
    */
  def start(spark: SparkSession, inputDir: String, checkpointDir: String,
      store: SnapshotStore, compactEvery: Int = 0,
      segment: Boolean = true, foldEvery: Int = 8): StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    spark.readStream.schema(schema).option("multiLine", true).json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (segment) processBatchAppend(store, batch, batchId, foldEvery)
        else processBatch(store, batch, batchId, compactEvery)
      }
      .start()
  }
}

/** Continuous ANN-index maintenance — the streaming face of the
  * MATERIALIZED ANN snapshot (graft.rag.AnnStore), on
  * StreamingPostings' exact protocol: each micro-batch's vectors
  * assign MAP-side against the STORED centroids (the lists×dim
  * codebook rides as a literal — no join, no shuffle in the scoring
  * stage) and merge LAST-WRITE-WINS on id. A re-ingested vector
  * MOVES lists correctly: the LWW merge's collide probe finds its
  * old list partition, so both the old and the new list dirs
  * rewrite and every other list re-links. Per-list occupancy
  * subtotals recompute for the TOUCHED lists only (batch's lists ∪
  * prior lists of batch ids — a partition-pruned scan; departures
  * write explicit zeros so a drained list never keeps a stale
  * count), and the stats row — with the q164-style occupancy skew
  * ratio and the retrain flag — sums the ≤ lists-row subtotal table.
  * Idempotent on batchId via the ledger marker; every step is a
  * deterministic function of post-merge store state, so crash
  * replays converge (the delta-counter alternative would
  * double-apply between the merge and the stats write).
  *
  * Centroid drift: when occupancy skew crosses the threshold the
  * stats row flags `needs_retrain`; [[retrain]] re-trains the
  * deterministic quantizer on the CURRENT assignments and rewrites
  * the index (a new snapshot version — probes see old or new, never
  * half). `retrainOnSkew = true` wires the trigger into the commit
  * itself.
  */
object StreamingAnn {
  import graft.rag.AnnStore

  /** One micro-batch of `(id, embedding)` vectors into the ANN store.
    * The store must hold a trained index already (AnnStore.ensure or
    * writeIndex) — maintenance extends an index, it does not invent
    * the codebook.
    */
  /** @param compactEvery > 0 runs the store's small-file compaction on
    *   that batch cadence (mirroring StreamingIngest / StreamingNearDup
    *   / StreamingPostings): every partition-scoped LWW merge adds a
    *   file pile to the touched list partitions, and a long-lived
    *   maintenance stream would otherwise degrade exactly the pruned
    *   probes the index exists for.
    */
  /** @param recordMarker as in [[StreamingPostings.processBatch]]:
    *   false skips the shared `ann_batches` ledger for callers with
    *   their own idempotency namespace (the CDC follower).
    */
  def processBatch(store: SnapshotStore, batch: DataFrame, batchId: Long,
      retrainSkewX1000: Long = 4000L, retrainOnSkew: Boolean = false,
      compactEvery: Int = 0, recordMarker: Boolean = true): Unit = {
    val alreadyDone = recordMarker && store.read("ann_batches").exists(
      _.filter(col("batch_id") === batchId).limit(1).count() > 0)
    if (alreadyDone) return
    val spark = batch.sparkSession
    import spark.implicits._
    val cents = AnnStore.centroidsOf(store.read("ann_centroids").getOrElse(
      throw new IllegalStateException(
        "ann store has no centroids — build the index before streaming " +
          "maintenance (AnnStore.ensure / writeIndex)")))
    // pass the batch's columns through: the stored rows carry the
    // corpus's metadata columns, so batches must ship the same schema
    val assignedBatch = AnnStore.assignListId(
      batch.dropDuplicates("id"),
      "embedding", cents.map(_._2))
      .localCheckpoint(true) // read by the merge, the probe, and touched
    val batchLists = assignedBatch.select("list_id").distinct().collect()
      .map(_.getAs[Number](0).longValue).toSeq
    // prior lists of re-ingested ids — the lookup that makes a MOVED
    // vector's old list part of the touched set. Goes through the
    // id-bucketed sidecar map (ann_id_map, AnnStore v4): the scan is
    // partition-pruned to the batch's own id buckets, so per-batch
    // cost is O(touched buckets), never an assignments-table scan —
    // and the result doubles as the LWW merge's collide set, so the
    // merge skips its own full-table key probe too.
    val priorListVals = AnnStore
      .priorListRows(store, assignedBatch.select("id"))
      .select("list_id").distinct().collect()
      .map(_.getInt(0)).sorted.toSeq
    val priorLists = priorListVals.map(_.toLong)
    // durable TOUCHED-SET INTENT, appended BEFORE any mutation: after
    // a crash mid-batch the replay recomputes priorLists from the
    // post-merge store — where a moved vector's OLD list is invisible
    // — so without this record the old list's count would go stale.
    // Replay unions every intent row for the batch (idempotent: a
    // superset touched set only recomputes extra exact subtotals).
    store.append("ann_touched_intents",
      Seq((batchId, (batchLists ++ priorLists).distinct.sorted))
        .toDF("batch_id", "list_ids"))
    val touched = store.read("ann_touched_intents").get
      .filter(col("batch_id") === batchId)
      .select(explode(col("list_ids")).as("l"))
      .distinct().collect().map(_.getLong(0)).sorted.toSeq
    // a store previously maintained under the segment protocol carries
    // a `seq` column — align the LWW batch with it (stamped past every
    // outstanding tombstone, mirroring StreamingPostings.processBatch)
    val batchAligned =
      if (store.read("ann_assignments").exists(_.columns.contains("seq")))
        assignedBatch.withColumn("seq",
          lit(store.currentVersion("ann_assignments").map(_ + 1).getOrElse(0L)))
      else assignedBatch
    // collide set = the sidecar lookup's prior lists (exact): the
    // merge rewrites batch ∪ prior lists and probes NOTHING unpruned
    store.mergeLastWriteWins("ann_assignments", batchAligned, Seq("id"),
      partitionCols = Seq("list_id"), sortCols = Seq("id"),
      collideHint = Some(priorListVals))
    // maintain the sidecar map AFTER the assignments merge (a crash
    // between the two replays with the STALE map — the old list stays
    // visible, the recomputed collide set is a correct superset; the
    // reverse order would hide a moved vector's old list from the
    // replay). Bucket is a pure function of the key, so the collide
    // set is the batch's own buckets — no probe either.
    val batchBuckets = assignedBatch
      .select(pmod(col("id"), lit(AnnStore.IdBuckets.toLong)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).sorted.toSeq
    store.mergeLastWriteWins("ann_id_map", AnnStore.idMapOf(assignedBatch),
      Seq("id"), partitionCols = Seq("id_bucket"), sortCols = Seq("id"),
      collideHint = Some(batchBuckets))
    // LEFT join from the touched-key frame: a list every batch vector
    // LEFT still gets a (possibly zero) row — counts never go stale.
    // SERVING view (= the raw table on a pure-LWW store): a mixed
    // store's dead generations must not inflate a list's occupancy.
    val listTotals = touched.toDF("list_id").join(
      servingAssignments(store)
        .filter(col("list_id").isin(touched: _*))
        .groupBy(col("list_id").cast("long").as("list_id"))
        .agg(count(lit(1)).as("n_vectors")),
      Seq("list_id"), "left").na.fill(0L, Seq("n_vectors"))
    store.mergeLastWriteWins("ann_list_stats", listTotals, Seq("list_id"))
    store.write("ann_stats",
      AnnStore.statsFromListStats(store, cents.size, retrainSkewX1000))
    // commit marker LAST (see StreamingIngest.processBatch)
    if (recordMarker) store.append("ann_batches", Seq(batchId).toDF("batch_id"))
    // post-commit maintenance, content-neutral (replay-safe): the
    // retrain trigger — a rewritten index is a NEW snapshot version
    // assigning the same vectors, so a crash replay of this batch
    // skips via the marker and probes keep working either way
    if (retrainOnSkew && needsRetrain(store)) retrain(spark, store)
    // compaction cadence (see the param doc): both probed tables keep
    // their cluster sort through the rewrite (id — point lookups
    // prune row groups)
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
      store.compact("ann_assignments", maxFilesPerPartition = 4,
        sortCols = Seq("id"))
      store.compact("ann_id_map", maxFilesPerPartition = 4,
        sortCols = Seq("id"))
    }
    ()
  }

  // ---- the SEGMENT maintenance path (the 100 TB shape) ---------------
  //
  // The LWW [[processBatch]] rewrites every touched list per batch —
  // O(touched lists × list size) bytes, the same class the r13 postings
  // segment work fixed (and exactly what pgvector does NOT do: its
  // IVFFLAT insert appends a tuple to a list page, rag.py:83-86's index
  // never rewrites a list on insert). The segment protocol is the
  // postings one applied to vectors: per batch, (1) tombstone the
  // batch's ids below a fresh sequence number — the tombstone row also
  // records the id's GENERATION LISTS (every list any physical
  // generation sits in: the id map only tracks the current one, and
  // erasure/folds must find them all); (2) APPEND the assignments as
  // new files carrying seq ([[SnapshotStore.appendFiles]], O(batch)
  // bytes). Probes read [[servingAssignments]]; [[foldAnn]] rewrites on
  // a cadence. Crash ordering and replay convergence are identical to
  // StreamingPostings.processBatchAppend (tombstone first, marker last,
  // replays re-tombstone at a higher seq).

  /** One micro-batch under the SEGMENT protocol — same replacement
    * semantics as [[processBatch]] (a re-ingested vector leaves its old
    * list), O(batch) write cost. Occupancy subtotals recompute over the
    * SERVING view of the touched lists; `foldEvery` > 0 runs
    * [[foldAnn]] on that batch cadence.
    */
  def processBatchAppend(store: SnapshotStore, batch: DataFrame,
      batchId: Long, retrainSkewX1000: Long = 4000L,
      retrainOnSkew: Boolean = false, foldEvery: Int = 0,
      recordMarker: Boolean = true): Unit = {
    val alreadyDone = recordMarker && store.read("ann_batches").exists(
      _.filter(col("batch_id") === batchId).limit(1).count() > 0)
    if (alreadyDone) return
    val spark = batch.sparkSession
    import spark.implicits._
    val cents = AnnStore.centroidsOf(store.read("ann_centroids").getOrElse(
      throw new IllegalStateException(
        "ann store has no centroids — build the index before streaming " +
          "maintenance (AnnStore.ensure / writeIndex)")))
    val assignedBatch = AnnStore.assignListId(
      batch.dropDuplicates("id"), "embedding", cents.map(_._2))
      .localCheckpoint(true)
    val batchLists = assignedBatch.select("list_id").distinct().collect()
      .map(_.getAs[Number](0).longValue).toSeq
    // the batch ids' CURRENT lists (pruned sidecar lookup) — the lists
    // their latest live generation occupies, whose occupancy changes
    val priorRows = AnnStore
      .priorListRows(store, assignedBatch.select("id"))
      .localCheckpoint(true)
    val priorLists = priorRows.select("list_id").distinct().collect()
      .map(_.getAs[Number](0).longValue).sorted.toSeq
    // durable touched-set intent BEFORE any mutation (see processBatch:
    // after a crash the replay can no longer see a moved vector's old
    // list through the post-merge id map)
    store.append("ann_touched_intents",
      Seq((batchId, (batchLists ++ priorLists).distinct.sorted))
        .toDF("batch_id", "list_ids"))
    val touched = store.read("ann_touched_intents").get
      .filter(col("batch_id") === batchId)
      .select(explode(col("list_ids")).as("l"))
      .distinct().collect().map(_.getLong(0)).sorted.toSeq
    // strictly increasing under the single-maintainer contract
    val seq = store.currentVersion("ann_assignments").map(_ + 1).getOrElse(0L)
    // 1. tombstone FIRST, carrying the union of every generation's
    // list: prior tombstone's gen_lists ∪ the current-map list ∪ the
    // new list — the physical-location superset erasure and folds need
    val priorTomb = store.read("ann_tombstones") match {
      case Some(t) => t
        .join(graft.store.SnapshotStore.broadcastIfSmall(
          assignedBatch.select("id")), Seq("id"), "left_semi")
        .select(col("id"), col("gen_lists").as("old_gl"))
      case None => Seq.empty[(Long, Seq[Long])].toDF("id", "old_gl")
    }
    val tombBatch = assignedBatch.select(col("id"),
        col("list_id").cast("long").as("new_list"))
      .join(priorRows.select(col("id"),
        col("list_id").cast("long").as("prior_list")), Seq("id"), "left")
      .join(priorTomb, Seq("id"), "left")
      .withColumn("gen_lists", sort_array(array_distinct(concat(
        coalesce(col("old_gl"), typedlit(Seq.empty[Long])),
        when(col("prior_list").isNotNull, array(col("prior_list")))
          .otherwise(typedlit(Seq.empty[Long])),
        array(col("new_list"))))))
      .select(col("id"), lit(seq).as("dead_below"), col("gen_lists"))
    store.mergeLastWriteWins("ann_tombstones", tombBatch, Seq("id"))
    // 2. the segment: new files only, every prior file retained forward
    store.appendFiles("ann_assignments",
      assignedBatch.withColumn("seq", lit(seq)),
      partitionCols = Seq("list_id"), sortCols = Seq("id"))
    // 3. the id map tracks the CURRENT list exactly as in the LWW path
    val batchBuckets = assignedBatch
      .select(pmod(col("id"), lit(AnnStore.IdBuckets.toLong)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).sorted.toSeq
    store.mergeLastWriteWins("ann_id_map", AnnStore.idMapOf(assignedBatch),
      Seq("id"), partitionCols = Seq("id_bucket"), sortCols = Seq("id"),
      collideHint = Some(batchBuckets))
    // 4. LIVE occupancy of the touched lists — the serving view, so a
    // moved vector's dead generation never inflates its old list
    val listTotals = touched.toDF("list_id").join(
      servingAssignments(store)
        .filter(col("list_id").isin(touched: _*))
        .groupBy(col("list_id").cast("long").as("list_id"))
        .agg(count(lit(1)).as("n_vectors")),
      Seq("list_id"), "left").na.fill(0L, Seq("n_vectors"))
    store.mergeLastWriteWins("ann_list_stats", listTotals, Seq("list_id"))
    store.write("ann_stats",
      AnnStore.statsFromListStats(store, cents.size, retrainSkewX1000))
    if (recordMarker) store.append("ann_batches", Seq(batchId).toDF("batch_id"))
    if (retrainOnSkew && needsRetrain(store)) retrain(spark, store)
    if (foldEvery > 0 && (batchId + 1) % foldEvery == 0) { foldAnn(store); () }
    ()
  }

  /** The probe-facing view of a segment-maintained assignments table:
    * appended rows minus the tombstoned generations (pre-segment rows
    * read as generation 0; the tombstone side broadcasts by measured
    * size). On an LWW/batch-built store the view is the raw table.
    */
  def servingAssignments(store: SnapshotStore): DataFrame = {
    val base0 = store.read("ann_assignments").get
    val base = if (base0.columns.contains("seq"))
      base0.withColumn("seq", coalesce(col("seq"), lit(0L)))
    else base0.withColumn("seq", lit(0L))
    store.read("ann_tombstones") match {
      case None => base
      case Some(t) =>
        base.join(graft.store.SnapshotStore.broadcastIfSmall(
          t.select("id", "dead_below")), Seq("id"), "left")
          .filter(col("dead_below").isNull || col("seq") >= col("dead_below"))
          .drop("dead_below")
    }
  }

  /** Fold the vector segments — [[StreamingPostings.foldPostings]]'s
    * twin: default = one full rewrite of the serving view (re-clustered
    * by list); bounded `maxLists` = an incremental id-scoped fold that
    * rewrites at most that many list partitions per round (the
    * tombstones' `gen_lists` say exactly where each id's dead
    * generations sit) and clears only the folded ids' tombstones.
    * Same idempotency argument (seq preserved → re-applied tombstones
    * filter nothing).
    */
  def foldAnn(store: SnapshotStore,
      maxLists: Int = Int.MaxValue): Option[Long] = {
    val t = store.read("ann_tombstones").getOrElse(return None)
    if (t.isEmpty) return None
    val spark = t.sparkSession
    import spark.implicits._
    if (maxLists == Int.MaxValue) {
      val folded = servingAssignments(store)
        .localCheckpoint(true) // sever from the version being replaced
        .repartition(col("list_id"))
        .sortWithinPartitions("list_id", "id")
      val v = store.write("ann_assignments", folded,
        partitionCols = Seq("list_id"))
      store.write("ann_tombstones", t.filter(lit(false)))
      return Some(v)
    }
    val idLists = t.select("id", "gen_lists").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq
    val sorted = idLists.sortBy { case (id, ls) => (ls.size, id) }
    val chosenIds = Seq.newBuilder[Long]
    var union = Set.empty[Long]
    var taken = 0
    sorted.foreach { case (id, ls) =>
      val u = union ++ ls
      if (taken == 0 || u.size <= maxLists) {
        chosenIds += id; union = u; taken += 1
      }
    }
    val ids = chosenIds.result()
    val lists: Seq[Any] = union.toSeq.sorted.map(_.toInt)
    val chosenDf = ids.toDF("id").localCheckpoint(true)
    val live = servingAssignments(store)
      .filter(col("list_id").isin(lists: _*))
      .join(graft.store.SnapshotStore.broadcastIfSmall(chosenDf),
        Seq("id"), "left_semi")
      .localCheckpoint(true)
    val v = store.mergeLastWriteWins("ann_assignments", live, Seq("id"),
      partitionCols = Seq("list_id"), sortCols = Seq("id"),
      collideHint = Some(lists), keyScope = Some(chosenDf))
    store.mergeLastWriteWins("ann_tombstones", t.filter(lit(false)),
      Seq("id"), keyScope = Some(chosenDf))
    Some(v)
  }

  /** Does the stored stats row flag occupancy skew past threshold? */
  def needsRetrain(store: SnapshotStore): Boolean =
    store.read("ann_stats").exists(
      _.select("needs_retrain").collect().headOption.exists(_.getBoolean(0)))

  /** Re-train the deterministic quantizer on the CURRENT assignments
    * and rewrite the whole index (new snapshot versions of all four
    * tables) — the occupancy-drift response q164's audit calls for.
    */
  def retrain(spark: SparkSession, store: SnapshotStore,
      lists: Int = AnnStore.NumLists): Unit = {
    // the SERVING view, not the raw table: a segment store's raw rows
    // include dead generations (duplicate ids) that would both skew the
    // quantizer and write duplicate assignment rows
    val emb = servingAssignments(store).drop("list_id", "seq")
      .localCheckpoint(true) // sever from the versions being replaced
    val cents = AnnStore.trainCentroids(emb, "embedding",
      Seq(col("id")), lists)
    AnnStore.writeIndex(spark, store, emb, cents)
    // the rewritten index has no generations left — spent tombstones
    // would otherwise re-kill the survivors' rows (writeIndex rows
    // carry no seq: they read as generation 0)
    store.read("ann_tombstones").foreach { t =>
      store.write("ann_tombstones", t.filter(lit(false))); () }
  }

  /** Watch `inputDir` for JSON files of `{id, embedding: [...]}`.
    * Maintains through the SEGMENT protocol by default (r14 — see
    * [[processBatchAppend]]); `segment = false` keeps the LWW mode.
    */
  def start(spark: SparkSession, inputDir: String, checkpointDir: String,
      store: SnapshotStore, retrainOnSkew: Boolean = false,
      compactEvery: Int = 0,
      segment: Boolean = true, foldEvery: Int = 8): StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    spark.readStream.schema(schema).option("multiLine", true).json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (segment) processBatchAppend(store, batch, batchId,
          retrainOnSkew = retrainOnSkew, foldEvery = foldEvery)
        else processBatch(store, batch, batchId,
          retrainOnSkew = retrainOnSkew, compactEvery = compactEvery)
      }
      .start()
  }
}

/** Right-to-be-forgotten EXECUTION through the stored indexes — the
  * cascade q179 sizes as a dry run, actually applied: a tombstone set
  * of ids is removed from the postings index (postings rows, registry
  * row, stats) and/or the ANN index (assignment row, id-map row, list
  * stats) with the SAME pruned machinery maintenance uses — keyScope
  * merges ("the batch is the complete new state of these keys", here
  * the EMPTY state) with sidecar-derived collide hints — so the whole
  * cascade costs O(tombstones × touched buckets/lists) and never
  * rewrites or rescans a corpus-scaled table. Naturally idempotent:
  * re-deleting an absent key is a no-op, so crash replays converge
  * without a ledger. (Postgres serves this as DELETE + index
  * maintenance in one transaction; the lakehouse form is these
  * versioned partition-scoped merges followed by `vacuum` of the old
  * versions — which is what makes the bytes actually DISAPPEAR, the
  * part a GDPR erasure requires.)
  */
object IndexDeletes {

  /** Remove `ids` (a frame with a `doc_id` column) from a stored
    * postings index maintained under the StreamingPostings protocol.
    * Stats recompute exactly (drained registry buckets get explicit
    * zero subtotals); `num_buckets` is re-recorded from the STORED
    * stats row, never the compile-time constant. Returns the tables it
    * rewrote, so callers can scope their post-erasure vacuum to them.
    *
    * A legacy-protocol store holding a postings table but NO doc
    * registry (a pre-registry batch build) still deletes correctly:
    * the LWW merge falls back to its own column-pruned key probe for
    * the collide set, and stats recompute from the surviving postings
    * rows (a legacy build indexed no token-less docs, so the
    * registry-free recount is exact for such stores).
    */
  def deleteFromPostings(store: SnapshotStore, ids: DataFrame): Seq[String] = {
    if (store.currentVersion("postings").isEmpty) return Nil
    StreamingPostings.ensureRegistryTermBuckets(store)
    val idsB = ids.select(col("doc_id")).distinct()
      .withColumn("doc_bucket", pmod(col("doc_id"),
        lit(StreamingPostings.DocRegistryBuckets.toLong)))
      .localCheckpoint(true)
    val touched = idsB.select("doc_bucket").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    def emptyOf(table: String) = store.read(table).get.filter(lit(false))
    // a segment-maintained store (processBatchAppend) also tracks the
    // victims in the tombstone table — an ERASURE leaves no row at all,
    // unlike a logical delete. The clear runs AFTER the postings/registry
    // erase (see the end of this method): clearing first would open a
    // crash window where previously-tombstoned generations resurrect
    // into servingPostings with no replay marker to force a re-run —
    // whereas a leftover tombstone for a doc with no physical rows is
    // harmless.
    val result = store.read("indexed_docs") match {
      case Some(reg) =>
        val priorTermBuckets = reg
          .filter(col("doc_bucket").isin(touched: _*))
          .join(idsB.select("doc_id"), Seq("doc_id"), "left_semi")
          .select(explode(col("term_buckets")).as("b")).distinct()
          .collect().map(_.getLong(0)).sorted.toSeq
        val storedBuckets = graft.search.PostingsIndex.numBucketsOf(
          store.read("postings_stats").get)
        store.mergeLastWriteWins("postings", emptyOf("postings"), Seq("doc_id"),
          partitionCols = Seq("term_bucket"), sortCols = Seq("term"),
          collideHint = Some(priorTermBuckets),
          keyScope = Some(idsB.select("doc_id")))
        store.mergeLastWriteWins("indexed_docs", emptyOf("indexed_docs"),
          Seq("doc_id"), partitionCols = Seq("doc_bucket"),
          collideHint = Some(touched),
          keyScope = Some(idsB.select("doc_id")))
        store.mergeLastWriteWins("registry_stats",
          StreamingPostings.touchedBucketTotals(store, touched),
          Seq("doc_bucket"))
        store.write("postings_stats",
          store.read("registry_stats").get
            .agg(coalesce(sum("n_docs"), lit(0L)).as("n_docs"),
              coalesce(sum("total_tokens"), lit(0L)).as("total_tokens"))
            .withColumn("num_buckets", lit(storedBuckets.toLong)))
        Seq("postings", "indexed_docs", "registry_stats", "postings_stats")
      case None =>
        store.mergeLastWriteWins("postings", emptyOf("postings"), Seq("doc_id"),
          partitionCols = Seq("term_bucket"), sortCols = Seq("term"),
          keyScope = Some(idsB.select("doc_id")))
        if (store.currentVersion("postings_stats").isEmpty) Seq("postings")
        else {
          val storedBuckets = graft.search.PostingsIndex.numBucketsOf(
            store.read("postings_stats").get)
          store.write("postings_stats",
            store.read("postings").get.select("doc_id", "dl").distinct()
              .agg(count(lit(1)).as("n_docs"),
                coalesce(sum("dl"), lit(0L)).as("total_tokens"))
              .withColumn("num_buckets", lit(storedBuckets.toLong)))
          Seq("postings", "postings_stats")
        }
    }
    store.read("postings_tombstones") match {
      case Some(t) if !t.join(idsB.select("doc_id"),
          Seq("doc_id"), "left_semi").isEmpty =>
        store.mergeLastWriteWins("postings_tombstones",
          emptyOf("postings_tombstones"), Seq("doc_id"),
          keyScope = Some(idsB.select("doc_id")))
        result :+ "postings_tombstones"
      case _ => result
    }
  }

  /** Remove `caseNumbers` (a frame with a `case_number` column) from
    * the RAG serving tables: the chunk/embedding rows and the
    * chunk-ANN index rows (assignments + the case→list sidecar map).
    * Shared by [[forgetCases]] and the CDC follower's delete leg.
    * Cost: O(victims × touched buckets/lists) — collide sets come
    * from the case-bucket pure function and the pruned sidecar map,
    * never a full assignments scan. Returns the tables rewritten.
    */
  def deleteFromRagServing(store: SnapshotStore,
      caseNumbers: DataFrame): Seq[String] = {
    val touched = Seq.newBuilder[String]
    def emptyOf(table: String) = store.read(table).get.filter(lit(false))
    val cnDf = caseNumbers.select("case_number").distinct()
      .localCheckpoint(true) // read by the bucket collect + three merges
    val cnBuckets = graft.rag.RagPipeline
      .withCaseBucket(cnDf).select("case_bucket")
      .distinct().collect().map(_.getInt(0)).sorted.toSeq
    if (cnBuckets.isEmpty) return Nil
    if (store.currentVersion("case_chunk_embeddings").isDefined) {
      graft.rag.RagPipeline.ensureCaseBucketed(store, "case_chunk_embeddings")
      store.mergeLastWriteWins("case_chunk_embeddings",
        emptyOf("case_chunk_embeddings"), Seq("case_number"),
        partitionCols = Seq("case_bucket"),
        sortCols = Seq("case_number", "chunk_id"),
        collideHint = Some(cnBuckets), keyScope = Some(cnDf))
      touched += "case_chunk_embeddings"
    }
    if (store.currentVersion("chunk_ann_assignments").isDefined) {
      // pre-sidecar stores (no case map yet) fall back to the merge's
      // own column-pruned collide probe; sidecar stores hand it over
      val priorLists: Option[Seq[Any]] =
        store.read("chunk_ann_case_map").map(_.filter(
          col("case_bucket").isin(cnBuckets: _*))
          .join(graft.store.SnapshotStore.broadcastIfSmall(cnDf),
            Seq("case_number"), "left_semi")
          .select("list_id").distinct().collect()
          .map(_.getAs[Number](0).intValue).sorted.toSeq)
      store.mergeLastWriteWins("chunk_ann_assignments",
        emptyOf("chunk_ann_assignments"), Seq("case_number"),
        partitionCols = Seq("list_id"),
        sortCols = Seq("case_number", "chunk_id"),
        collideHint = priorLists, keyScope = Some(cnDf))
      touched += "chunk_ann_assignments"
      store.read("chunk_ann_case_map").foreach { _ =>
        store.mergeLastWriteWins("chunk_ann_case_map",
          emptyOf("chunk_ann_case_map"), Seq("case_number"),
          partitionCols = Seq("case_bucket"),
          sortCols = Seq("case_number"),
          collideHint = Some(cnBuckets), keyScope = Some(cnDf))
        touched += "chunk_ann_case_map"
      }
    }
    touched.result()
  }

  /** Remove `ids` (a frame with a `doc_id` column) from a stored
    * near-dup signature index (the banded, key-partitioned layout
    * [[CdcIndexMaintenance.followNearDup]] maintains). `priorKeys`,
    * when the caller can derive them (the CDC feed's `before.text`
    * re-hashes to the victim's old band keys — a pure computation),
    * prunes the merge to the victims' own key dirs; otherwise the
    * merge's own column-pruned probe finds them.
    */
  def deleteFromSignatures(store: SnapshotStore, ids: DataFrame,
      priorKeys: Option[Seq[Any]] = None): Seq[String] = {
    if (store.currentVersion("signatures").isEmpty) return Nil
    val idsOnly = ids.select("doc_id").distinct()
    def emptyOf(table: String) = store.read(table).get.filter(lit(false))
    store.mergeLastWriteWins("signatures", emptyOf("signatures"),
      Seq("doc_id"), partitionCols = Seq("key"), sortCols = Seq("band"),
      collideHint = priorKeys, keyScope = Some(idsOnly))
    Seq("signatures")
  }

  /** What a [[forgetCases]] run actually rewrote: the tables (scope a
    * post-erasure `vacuum` to exactly these — other tables' version
    * history and CDC surface are unrelated to the erasure and
    * survive) and the ingest run ids whose quarantine rows were
    * touched (drives the per-run quarantine JSONL rewrite).
    */
  final case class ForgetReport(tables: Seq[String], quarantineRuns: Seq[Long])

  /** Expunge cases END-TO-END from an ingest store — the legal-domain
    * erasure (a sealed/expunged docket, the GDPR erasure shape): the
    * case row, its party LINKS, its chunk/embedding rows, its
    * chunk-ANN index rows, its docket postings, AND every raw-record
    * copy in the ingest ledgers — the quarantine envelope embeds the
    * full raw docket (ingest.py:170-202 parity) and the error
    * ledger's `details` embeds raw + normalized_attempt
    * (ingest.py:218-224 parity), so a docket that ever failed
    * validation would otherwise survive its own expungement verbatim.
    * Shared entities (parties, judges, courts and their variation
    * counters) survive — only the links die, exactly what expungement
    * requires.
    *
    * Cost shape: the tombstone set is request-sized, so the id/year
    * resolution collects bounded frames and every case-keyed table
    * merge prunes to the victims' own buckets/partitions. The ledgers
    * are RUN-bucketed (not case-bucketed), so FINDING a victim's
    * ledger rows costs one column-pruned scan per ledger (only the
    * raw case_number, record_hash and run_bucket columns are read);
    * the REWRITE is again O(touched run buckets). Erasures are rare —
    * that scan is the honest price of erasing from an append-only
    * audit ledger without a per-case index over it.
    *
    * Follow with `vacuum` of the REPORTED tables to reclaim the old
    * versions' files — that is what makes the bytes disappear.
    *
    * @param quarantineJsonlDir when the store's CLI ingests also wrote
    *   per-run quarantine JSONL files (`<dir>/ingest_run_<id>`,
    *   ingest.py:170-202's side file), pass that directory and each
    *   touched run's file is rewritten without the victims (deleted
    *   outright when the run has no surviving quarantine rows).
    */
  def forgetCases(store: SnapshotStore, caseNumbers: Seq[String],
      quarantineJsonlDir: Option[String] = None): ForgetReport = {
    if (caseNumbers.isEmpty) return ForgetReport(Nil, Nil)
    val touched = Seq.newBuilder[String]
    def emptyOf(table: String) = store.read(table).get.filter(lit(false))
    store.read("cases").foreach { cases =>
      val spark = cases.sparkSession
      import spark.implicits._
      val cnDf = caseNumbers.toDF("case_number")
      // resolve surrogate ids + filed years BEFORE the case rows die
      val victims = cases.join(cnDf, Seq("case_number"), "left_semi")
        .select("id", "filed_year").collect()
      val victimIds = victims.map(_.getLong(0)).toSeq.distinct.sorted
      val victimYears: Seq[Any] = victims.map(_.get(1)).toSeq.distinct
      if (victimIds.nonEmpty) {
        // 1. docket postings (doc_id = the case surrogate id)
        touched ++= deleteFromPostings(store, victimIds.toDF("doc_id"))
        // 2. serving chunk tables (case-keyed, case-bucketed)
        touched ++= deleteFromRagServing(store, cnDf)
        // 3. party LINKS (delete-by-case: LWW on case_id alone with an
        // empty batch — coarser than the upsert key on purpose). A store
        // last written by pre-bucket code migrates first — the merge's
        // layout-change fallback cannot partition prior rows by a
        // column they don't carry.
        if (store.currentVersion("case_parties").isDefined) {
          StreamingIngest.ensureBucketed(store, "case_parties", "cp_bucket",
            col("case_id"))
          val cpB = StreamingIngest.bucketed(victimIds.toDF("case_id"),
            "cp_bucket", col("case_id"))
          store.mergeLastWriteWins("case_parties", emptyOf("case_parties"),
            Seq("case_id"), partitionCols = Seq("cp_bucket"),
            collideHint = Some(StreamingIngest.bucketsOf(cpB, "cp_bucket")),
            keyScope = Some(cpB.select("case_id")))
          touched += "case_parties"
        }
        // 4. the case rows themselves (filed_year partitions pruned to
        // the victims' own years)
        store.mergeLastWriteWins("cases", emptyOf("cases"), Seq("case_number"),
          partitionCols = Seq("filed_year"),
          collideHint = Some(victimYears), keyScope = Some(cnDf))
        touched += "cases"
      }
    }
    // 5. the raw-record ledgers — runs even when the docket NEVER
    // ingested successfully (a permanently-quarantined record has no
    // case row, yet its raw bytes sit in the envelope)
    val quarantinedRuns = purgeLedger(store, "quarantine",
      trim(coalesce(col("raw.case_number"), lit(""))), caseNumbers, touched)
    purgeLedger(store, "ingest_errors",
      coalesce(col("case_number"),
        trim(coalesce(col("details.raw.case_number"), lit("")))),
      caseNumbers, touched)
    quarantineJsonlDir.foreach(rewriteQuarantineJsonl(store, _, quarantinedRuns))
    ForgetReport(touched.result().distinct, quarantinedRuns)
  }

  /** Expunge every row of a run-bucketed ledger whose raw record names
    * one of `caseNumbers`: one column-pruned scan finds the victims'
    * (record_hash, run_bucket, run_id) frame — bounded by victims ×
    * their failed runs — then a keyScope LWW merge on record_hash
    * rewrites only the touched run buckets. Returns the touched run
    * ids (ascending). The record hash is F7's canonical hash of the
    * raw record, so retries of the same record in other runs share it
    * and die in the same merge.
    */
  private def purgeLedger(store: SnapshotStore, table: String,
      caseNumberCol: Column, caseNumbers: Seq[String],
      touched: scala.collection.mutable.Builder[String, Seq[String]]): Seq[Long] = {
    if (store.currentVersion(table).isEmpty) return Nil
    StreamingIngest.ensureBucketed(store, table, "run_bucket", col("run_id"))
    val cur = store.read(table).get
    val spark = cur.sparkSession
    import spark.implicits._
    val victims = cur.filter(caseNumberCol.isin(caseNumbers: _*))
      .select("record_hash", "run_bucket", "run_id").distinct().collect()
    if (victims.isEmpty) return Nil
    val hashes = victims.map(_.getString(0)).toSeq.distinct
    val buckets: Seq[Any] = victims.map(_.getInt(1)).toSeq.distinct.sorted
    store.mergeLastWriteWins(table, cur.filter(lit(false)),
      Seq("record_hash"), partitionCols = Seq("run_bucket"),
      collideHint = Some(buckets),
      keyScope = Some(hashes.toDF("record_hash")))
    touched += table
    victims.map(_.getLong(2)).toSeq.distinct.sorted
  }

  /** Rewrite each touched run's quarantine JSONL side file from the
    * (already purged) quarantine table — envelope field order = schema
    * order, exactly the CLI ingest's original write — deleting the
    * file outright when the run has no surviving quarantine rows.
    */
  private def rewriteQuarantineJsonl(store: SnapshotStore, dir: String,
      runs: Seq[Long]): Unit = {
    if (runs.isEmpty) return
    val purged = store.read("quarantine").getOrElse(return)
    runs.foreach { r =>
      val path = Paths.get(dir, s"ingest_run_$r")
      if (Files.exists(path)) {
        // run_bucket is pmod(run_id, BucketCount) — filter it
        // explicitly so the read prunes to the run's own bucket dir.
        // SHARED constant with StreamingIngest.bucketed: a drifted
        // literal here would match nothing, `remaining.isEmpty` would
        // read true, and the run's whole JSONL file — other records'
        // surviving quarantine lines included — would be deleted.
        val b = StreamingIngest.BucketCount
        val remaining = purged
          .filter(col("run_bucket") === (((r % b) + b) % b).toInt &&
            col("run_id") === r)
          .select("run_id", "error_code", "why", "raw", "ts", "record_hash")
        if (remaining.isEmpty) {
          val w = Files.walk(path)
          try w.sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(Files.delete)
          finally w.close()
        } else remaining.coalesce(1).write.mode("overwrite").json(path.toString)
      }
    }
  }

  /** Remove `ids` (a frame with an `id` column) from a stored ANN
    * index (AnnStore tables, StreamingAnn's stats protocol — drained
    * lists get explicit zero occupancy). Segment-maintained stores
    * (StreamingAnn.processBatchAppend) erase EVERY physical
    * generation: the victims' lists are the current-map list ∪ the
    * tombstone rows' `gen_lists`, occupancy recomputes over the
    * serving view, and the victims' tombstone rows clear LAST (a
    * leftover tombstone for a rowless id is harmless; the reverse
    * order could resurrect dead generations on a crash).
    */
  def deleteFromAnn(store: SnapshotStore, ids: DataFrame): Unit = {
    if (store.currentVersion("ann_assignments").isEmpty) return
    val spark = ids.sparkSession
    import spark.implicits._
    val idsOnly = ids.select("id").distinct().localCheckpoint(true)
    val mapListVals = graft.rag.AnnStore.priorListRows(store, idsOnly)
      .select("list_id").distinct().collect()
      .map(_.getAs[Number](0).intValue).toSeq
    // a segment store's victims may hold dead generations in OTHER
    // lists — the tombstone rows recorded them
    val tombListVals: Seq[Int] = store.read("ann_tombstones").map(
      _.join(graft.store.SnapshotStore.broadcastIfSmall(idsOnly),
        Seq("id"), "left_semi")
        .select(explode(col("gen_lists")).as("l")).distinct()
        .collect().map(_.getLong(0).toInt).toSeq).getOrElse(Nil)
    val priorListVals = (mapListVals ++ tombListVals).distinct.sorted
    val idBuckets = idsOnly
      .select(pmod(col("id"), lit(graft.rag.AnnStore.IdBuckets.toLong))
        .cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).sorted.toSeq
    def emptyOf(table: String) = store.read(table).get.filter(lit(false))
    store.mergeLastWriteWins("ann_assignments", emptyOf("ann_assignments"),
      Seq("id"), partitionCols = Seq("list_id"), sortCols = Seq("id"),
      collideHint = Some(priorListVals), keyScope = Some(idsOnly))
    store.mergeLastWriteWins("ann_id_map", emptyOf("ann_id_map"), Seq("id"),
      partitionCols = Seq("id_bucket"), collideHint = Some(idBuckets),
      keyScope = Some(idsOnly))
    val touched = priorListVals.map(_.toLong)
    val listTotals = touched.toDF("list_id").join(
      graft.streaming.StreamingAnn.servingAssignments(store)
        .filter(col("list_id").isin(touched: _*))
        .groupBy(col("list_id").cast("long").as("list_id"))
        .agg(count(lit(1)).as("n_vectors")),
      Seq("list_id"), "left").na.fill(0L, Seq("n_vectors"))
    store.mergeLastWriteWins("ann_list_stats", listTotals, Seq("list_id"))
    val lists = store.read("ann_centroids").get.count().toInt
    store.write("ann_stats",
      graft.rag.AnnStore.statsFromListStats(store, lists))
    // the erasure leaves no row at all — tombstones included, cleared
    // AFTER the physical erase
    store.read("ann_tombstones") match {
      case Some(t) if !t.join(idsOnly, Seq("id"), "left_semi").isEmpty =>
        store.mergeLastWriteWins("ann_tombstones", emptyOf("ann_tombstones"),
          Seq("id"), keyScope = Some(idsOnly))
        ()
      case _ => ()
    }
  }
}

/** CDC-driven index maintenance — follow a snapshot table by DELTAS.
  * The store's change feed ([[graft.store.SnapshotStore.readChanges]])
  * already gives the row-level diff between two retained versions; this
  * applies it to the stored search indexes, so ANY writer of the base
  * table (a backfill job, a compaction-free bulk merge, another
  * pipeline entirely) keeps the indexes fresh without the indexer
  * re-reading the snapshot — the lakehouse CDF→index pattern that
  * makes a 100 TB table followable: the CDF read is two
  * partition-pruned version scans joined on the key, and the index
  * work is O(changed rows), never O(corpus). Inserts/updates re-index
  * through the ordinary micro-batch merge (LWW on the doc/vector key —
  * an updated row replaces ALL its index rows); deletes run the
  * tombstone cascade with its explicit drained-bucket zeros.
  *
  * Idempotent per version transition: each applied (index, table,
  * version) records in the follower's OWN `cdc_applied` marker table —
  * NOT the writers' postings_batches/ann_batches batch-id ledgers,
  * whose id spaces (streaming micro-batches from 0, CLI run ids from
  * 1) are unrelated to table versions: reusing them would silently
  * replay-skip a real feed application whenever ids collide — so
  * re-applying the same (from, to) advance is a no-op, and the delete
  * legs are naturally idempotent.
  */
object CdcIndexMaintenance {

  /** Has this follower already applied `version` of `table` to
    * `indexName`? The marker namespace is the follower's own, keyed
    * (index, table, version) — immune to every other writer protocol
    * sharing the store.
    */
  private def cdcApplied(store: SnapshotStore, indexName: String,
      table: String, version: Long): Boolean =
    store.read("cdc_applied").exists(
      _.filter(col("index_name") === indexName &&
        col("table_name") === table &&
        col("version") === version).limit(1).count() > 0)

  /** Commit marker for one feed application — appended LAST, so a
    * crash mid-apply replays the (idempotent-by-construction) body.
    */
  private def markCdcApplied(store: SnapshotStore, indexName: String,
      table: String, version: Long): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    store.append("cdc_applied",
      Seq((indexName, table, version))
        .toDF("index_name", "table_name", "version"))
    ()
  }

  /** Apply the (from → to] change feed of a `(doc_id, text)` table in
    * `store` to the postings index in the SAME store. Returns the
    * number of changed keys applied (0 when either version is gone —
    * vacuumed feeds need a fresh full build, surfaced to the caller).
    */
  /** @param segment apply upserts through the SEGMENT protocol
    *   (tombstone + new-files-only append, O(batch) bytes —
    *   StreamingPostings.processBatchAppend, the default since r14)
    *   instead of the LWW whole-bucket rewrite; deletes still run the
    *   eager erase.
    */
  def applyToPostings(store: SnapshotStore, docsTable: String,
      fromVersion: Long, toVersion: Long, segment: Boolean = true): Long = {
    if (cdcApplied(store, "postings", docsTable, toVersion)) return 0L
    val changes = store.readChanges(docsTable, fromVersion, toVersion,
      Seq("doc_id")).getOrElse(return 0L)
      .localCheckpoint(true) // read by both legs + the count
    val upserts = changes.filter(col("op").isin("insert", "update"))
      .select(col("doc_id"), coalesce(col("after.text"), lit("")).as("text"))
    if (segment)
      StreamingPostings.processBatchAppend(store, upserts,
        batchId = toVersion, recordMarker = false)
    else StreamingPostings.processBatch(store, upserts, batchId = toVersion,
      recordMarker = false)
    IndexDeletes.deleteFromPostings(store,
      changes.filter(col("op") === "delete").select("doc_id"))
    val n = changes.count()
    markCdcApplied(store, "postings", docsTable, toVersion)
    n
  }

  /** Apply the (from → to] change feed of an `(id, embedding, ...)`
    * table in `store` to the ANN index in the same store (the index
    * must exist — maintenance extends, it does not invent centroids).
    */
  /** @param segment apply upserts through the SEGMENT protocol
    *   (tombstone + new-files-only append, O(batch) bytes —
    *   StreamingAnn.processBatchAppend) instead of the LWW
    *   touched-list rewrite; deletes still run the eager erase.
    */
  def applyToAnn(store: SnapshotStore, vecTable: String,
      fromVersion: Long, toVersion: Long, segment: Boolean = true): Long = {
    if (cdcApplied(store, "ann", vecTable, toVersion)) return 0L
    val cur = store.readVersion(vecTable, toVersion).getOrElse(return 0L)
    val changes = store.readChanges(vecTable, fromVersion, toVersion,
      Seq("id")).getOrElse(return 0L)
      .localCheckpoint(true)
    // upserted rows re-read from the TARGET version (the feed's
    // `after` struct carries every non-key column, but re-selecting
    // through a semi join keeps the batch schema identical to the
    // stored assignment rows regardless of the table's column set)
    val upserts = cur.join(
      graft.store.SnapshotStore.broadcastIfSmall(
        changes.filter(col("op").isin("insert", "update")).select("id")),
      Seq("id"), "left_semi")
    if (segment)
      StreamingAnn.processBatchAppend(store, upserts, batchId = toVersion,
        recordMarker = false)
    else StreamingAnn.processBatch(store, upserts, batchId = toVersion,
      recordMarker = false)
    IndexDeletes.deleteFromAnn(store,
      changes.filter(col("op") === "delete").select("id"))
    val n = changes.count()
    markCdcApplied(store, "ann", vecTable, toVersion)
    n
  }

  /** Apply the (from → to] change feed of a `(doc_id, text)` table to
    * the near-dup SIGNATURE index (the banded, key-partitioned LSH
    * probe layout): upserted docs' banded rows replace their prior
    * rows LWW-on-doc_id, deleted docs' rows die. The merge's collide
    * set — which band-key partitions hold a changed doc's PRIOR rows —
    * derives PURELY from the feed: `before.text` re-hashes to the old
    * signature, so no sidecar and no index probe exist on this path at
    * all; per-step cost is O(changed docs × bands).
    */
  def applyToSignatures(store: SnapshotStore, docsTable: String,
      fromVersion: Long, toVersion: Long): Long = {
    if (cdcApplied(store, "neardup", docsTable, toVersion)) return 0L
    val changes = store.readChanges(docsTable, fromVersion, toVersion,
      Seq("doc_id")).getOrElse(return 0L)
      .localCheckpoint(true) // read by 2 key collects + merge + count
    val newBanded = StreamingNearDup.bandedSignaturesOf(
      changes.filter(col("op").isin("insert", "update"))
        .select(col("doc_id"), coalesce(col("after.text"), lit("")).as("text")))
      .localCheckpoint(true) // read by the key collect and the merge
    def keysOf(df: DataFrame): Seq[Any] = df.select("key").distinct()
      .collect().map(_.getAs[Number](0).longValue).toSeq
    val oldKeys = keysOf(StreamingNearDup.bandedSignaturesOf(
      changes.filter(col("op").isin("update", "delete"))
        .select(col("doc_id"), coalesce(col("before.text"), lit("")).as("text"))))
    val touched = (oldKeys ++ keysOf(newBanded)).distinct.sorted(
      Ordering.by((a: Any) => a.asInstanceOf[Long]))
    // keyScope = EVERY changed doc (deletes included): the batch is
    // the complete new signature state of its docs
    store.mergeLastWriteWins("signatures", newBanded, Seq("doc_id"),
      partitionCols = Seq("key"), sortCols = Seq("band"),
      collideHint = Some(touched),
      keyScope = Some(changes.select("doc_id")))
    val n = changes.count()
    markCdcApplied(store, "neardup", docsTable, toVersion)
    n
  }

  /** Apply the (from → to] change feed of a cases-shaped table
    * (`case_number`, `docket_text`) to the RAG serving tables: the
    * chunk/embedding table and the chunk-ANN index. Upserted cases
    * re-chunk + re-embed and replace per CASE (a shrunken case loses
    * its stale chunk rows); deleted cases run the serving-table
    * tombstone cascade. Per-step cost is O(changed cases × chunks) —
    * the merges prune to the cases' own buckets/lists through the
    * case-bucket pure function and the sidecar map.
    */
  def applyToRag(store: SnapshotStore, casesTable: String,
      fromVersion: Long, toVersion: Long,
      embedder: graft.rag.Embedder): Long = {
    if (cdcApplied(store, "rag", casesTable, toVersion)) return 0L
    val changes = store.readChanges(casesTable, fromVersion, toVersion,
      Seq("case_number")).getOrElse(return 0L)
      .localCheckpoint(true)
    val upserts = changes.filter(col("op").isin("insert", "update"))
      .select(col("case_number"), col("after.docket_text").as("docket_text"))
    mergeRagChunks(store, upserts, embedder)
    IndexDeletes.deleteFromRagServing(store,
      changes.filter(col("op") === "delete").select("case_number"))
    val n = changes.count()
    markCdcApplied(store, "rag", casesTable, toVersion)
    n
  }

  /** Chunk + embed `cases` and fold them into the serving tables —
    * the exact choreography StreamingIngest's embedder path commits
    * per micro-batch, shared so the follower can never drift from it.
    */
  private def mergeRagChunks(store: SnapshotStore, cases: DataFrame,
      embedder: graft.rag.Embedder): Unit = {
    if (cases.isEmpty) return
    val chunks = graft.rag.RagPipeline.embedChunks(
      graft.rag.RagPipeline.chunkCases(
        cases.select("case_number", "docket_text")), embedder)
      .localCheckpoint(true) // consumed by two merges
    graft.rag.RagPipeline.ensureCaseBucketed(store, "case_chunk_embeddings")
    store.mergeLastWriteWins("case_chunk_embeddings",
      graft.rag.RagPipeline.withCaseBucket(chunks),
      Seq("case_number"), partitionCols = Seq("case_bucket"),
      sortCols = Seq("case_number", "chunk_id"),
      collideHint = Some(graft.rag.RagPipeline.caseBucketsOf(chunks)))
    if (store.currentVersion("chunk_ann_centroids").isEmpty)
      graft.rag.RagPipeline.indexChunks(store,
        store.read("case_chunk_embeddings").get
          .select("case_number", "chunk_id", "chunk_text", "embedding"))
    else graft.rag.RagPipeline.mergeChunkIndex(store, chunks)
  }

  /** What one follower advance did: `bootstrap` (index built from the
    * current snapshot), `steps` (that many version feeds applied),
    * `resync` (a feed gap was vacuumed away — full reconcile against
    * the current snapshot), or `current` (nothing to do).
    */
  final case class FollowReport(action: String, appliedVersion: Long,
      steps: Int)

  private def cursorOf(store: SnapshotStore, indexName: String,
      table: String): Option[Long] =
    store.read("cdc_cursors").flatMap(
      _.filter(col("index_name") === indexName &&
        col("table_name") === table)
        .select("applied_version").collect().headOption.map(_.getLong(0)))

  private def advanceCursor(store: SnapshotStore, indexName: String,
      table: String, version: Long): Unit = {
    val spark = store.read(table).get.sparkSession
    import spark.implicits._
    store.mergeLastWriteWins("cdc_cursors",
      Seq((indexName, table, version))
        .toDF("index_name", "table_name", "applied_version"),
      Seq("index_name", "table_name"))
    // marker retention: the follower resumes at cursor+1 and never
    // re-checks versions at or below the committed cursor, so their
    // markers are dead — pruning here keeps cdc_applied
    // O(in-flight applies), not O(every version ever followed). A
    // crash before the prune just leaves dead rows until the next
    // advance. KEYED merge, not replacement: a whole-table write of a
    // frame checkpointed from the prior version would clobber a
    // concurrent follower's just-appended in-flight marker (the
    // checkpointed frame predates it and replays verbatim on a lost
    // claim race) — the keyScope delete removes exactly THIS
    // (index, table)'s dead rows and re-reads the prior inside the
    // claim window, so other followers' markers always survive.
    store.read("cdc_applied").foreach { m =>
      val dead = m.filter(
        col("index_name") === indexName && col("table_name") === table &&
          col("version") <= version)
        .select("index_name", "table_name", "version")
        .localCheckpoint(true)
      if (!dead.isEmpty) {
        store.mergeLastWriteWins("cdc_applied", dead.filter(lit(false)),
          Seq("index_name", "table_name", "version"),
          keyScope = Some(dead))
        ()
      }
    }
  }

  /** The shared follower skeleton: advance `indexName` from its
    * persisted cursor to `table`'s current version — one feed
    * application per version step (each step's diff is minimal and
    * replay-safe: the `cdc_applied` marker keys on the target
    * version). Recovery paths: no cursor → `fullSync` bootstrap from
    * the current snapshot; a vacuumed version gap → `fullSync` RESYNC
    * (the honest O(corpus) price of losing the feed, paid once, after
    * which following is O(changes) again). Run on any cadence;
    * idempotent — the cursor advance is the commit marker, and every
    * body is idempotent by construction.
    */
  private def follow(store: SnapshotStore, indexName: String,
      table: String)(fullSync: Long => Unit)(
      applyStep: (Long, Long) => Unit): FollowReport = {
    val cur = store.currentVersion(table).getOrElse(
      return FollowReport("current", -1L, 0))
    def resync(action: String): FollowReport = {
      fullSync(cur)
      advanceCursor(store, indexName, table, cur)
      FollowReport(action, cur, 0)
    }
    cursorOf(store, indexName, table) match {
      case None => resync("bootstrap")
      case Some(a) if a >= cur => FollowReport("current", a, 0)
      case Some(a) =>
        val feedsReadable = (a to cur).forall(v =>
          store.readVersion(table, v).isDefined)
        if (!feedsReadable) resync("resync")
        else {
          ((a + 1) to cur).foreach(v => applyStep(v - 1, v))
          advanceCursor(store, indexName, table, cur)
          FollowReport("steps", cur, (cur - a).toInt)
        }
    }
  }

  /** The postings FOLLOWER. Resync re-ingests the current snapshot
    * (LWW makes it correct) then deletes registry keys the snapshot
    * no longer holds — one column-pruned anti join.
    */
  /** @param segment maintain through the segment protocol (see
    *   [[applyToPostings]]) — the DEFAULT since r14: per-step write
    *   cost is O(batch) bytes where the LWW mode rewrites every
    *   touched term bucket (measured r13: merge byte ratio 1.34 vs
    *   2.27 over the chain decade). Bootstraps/resyncs keep the LWW
    *   full rebuild (they ARE the corpus pass); LWW stepping remains
    *   the simple mode for small corpora. `foldEvery` > 0 folds the
    *   segments every N feed steps (default 8 — tombstones stay
    *   bounded by 8 steps' doc churn); `foldMaxBuckets` bounds each
    *   fold round's rewrite (Int.MaxValue = the full compacting fold).
    */
  def followPostings(store: SnapshotStore,
      docsTable: String = "docs", segment: Boolean = true,
      foldEvery: Int = 8,
      foldMaxBuckets: Int = Int.MaxValue): FollowReport = {
    def docsNow = store.read(docsTable).get.select("doc_id", "text")
    val r = follow(store, "postings", docsTable) { cur =>
      StreamingPostings.processBatch(store, docsNow, batchId = cur,
        recordMarker = false)
      store.read("indexed_docs").foreach { reg =>
        IndexDeletes.deleteFromPostings(store,
          reg.select("doc_id").join(docsNow.select("doc_id"),
            Seq("doc_id"), "left_anti"))
        ()
      }
    }(applyToPostings(store, docsTable, _, _, segment))
    if (segment && foldEvery > 0 && r.steps > 0 &&
      (r.appliedVersion + 1) % foldEvery == 0) {
      StreamingPostings.foldPostings(store, foldMaxBuckets); ()
    }
    r
  }

  /** The ANN follower — [[followPostings]]'s vector twin, same
    * segment-by-default contract (`segment`/`foldEvery`/`foldMaxLists`
    * mirror the postings knobs). Bootstrap additionally TRAINS the
    * deterministic quantizer when no index exists yet; resync
    * re-assigns the current snapshot against the STORED centroids and
    * deletes id-map keys the snapshot dropped.
    */
  def followAnn(store: SnapshotStore,
      vecTable: String = "vecs", segment: Boolean = true,
      foldEvery: Int = 8,
      foldMaxLists: Int = Int.MaxValue): FollowReport = {
    def vecsNow = store.read(vecTable).get
    val r = follow(store, "ann", vecTable) { cur =>
      if (store.currentVersion("ann_centroids").isEmpty) {
        val spark = vecsNow.sparkSession
        val cents = graft.rag.AnnStore.trainCentroids(
          vecsNow, "embedding", Seq(col("id")))
        graft.rag.AnnStore.writeIndex(spark, store, vecsNow, cents)
      } else {
        StreamingAnn.processBatch(store, vecsNow, batchId = cur,
          recordMarker = false)
        store.read("ann_id_map").foreach { idMap =>
          IndexDeletes.deleteFromAnn(store,
            idMap.select("id").join(vecsNow.select("id"),
              Seq("id"), "left_anti"))
          ()
        }
      }
    }(applyToAnn(store, vecTable, _, _, segment))
    if (segment && foldEvery > 0 && r.steps > 0 &&
      (r.appliedVersion + 1) % foldEvery == 0) {
      StreamingAnn.foldAnn(store, foldMaxLists); ()
    }
    r
  }

  /** The near-dup SIGNATURE follower: keeps the banded signature
    * index (the LSH probe table every batch/stream dedup consumer
    * joins against) in step with a `(doc_id, text)` table maintained
    * by ANY writer — every live doc carries its banded rows, a
    * re-ingested doc's rows move key dirs, a deleted doc's rows die.
    * Bootstrap/resync rewrites the table from the snapshot (equal to
    * a from-scratch build by construction); steps cost
    * O(changed docs × bands), the old keys derived from the feed's
    * `before.text` with no index probe.
    *
    * NOTE: this maintains the INDEX-of-a-table contract. The
    * [[StreamingNearDup]] filter pipeline writes the same table under
    * kept-only semantics — run one protocol per store, not both.
    */
  def followNearDup(store: SnapshotStore,
      docsTable: String = "docs"): FollowReport = {
    def docsNow = store.read(docsTable).get.select("doc_id", "text")
    follow(store, "neardup", docsTable) { _ =>
      store.write("signatures",
        StreamingNearDup.bandedSignaturesOf(docsNow)
          .repartition(col("key")).sortWithinPartitions("key", "band"),
        partitionCols = Seq("key"))
      ()
    }(applyToSignatures(store, docsTable, _, _))
  }

  /** The RAG serving follower: keeps `case_chunk_embeddings` and the
    * chunk-ANN index in step with a cases-shaped table maintained by
    * ANY writer — the continuous-ingest embedder path's tables,
    * without requiring ingest to be the one doing the writing.
    * Bootstrap/resync re-chunks + re-embeds the current snapshot
    * (LWW per case), then deletes serving rows for cases the snapshot
    * no longer holds (one column-pruned anti join); steps cost
    * O(changed cases × chunks).
    */
  def followRag(store: SnapshotStore, casesTable: String = "cases",
      embedder: graft.rag.Embedder =
        graft.rag.HashingEmbedder()): FollowReport = {
    def casesNow = store.read(casesTable).get
      .select("case_number", "docket_text")
    follow(store, "rag", casesTable) { _ =>
      mergeRagChunks(store, casesNow, embedder)
      store.read("case_chunk_embeddings").foreach { served =>
        IndexDeletes.deleteFromRagServing(store,
          served.select("case_number").distinct()
            .join(casesNow.select("case_number"),
              Seq("case_number"), "left_anti"))
        ()
      }
    }(applyToRag(store, casesTable, _, _, embedder))
  }
}

/** Continuous eval-set decontamination — the streaming face of q111:
  * each micro-batch's documents are word-8-gram'd ROW-LOCALLY and
  * probed against the (static, broadcast) benchmark gram set; a
  * document whose overlap exceeds `maxPermille` is diverted to
  * `contaminated`, the rest land in `clean`. The benchmark side never
  * grows with the stream (eval sets are KBs next to a crawl), so
  * per-batch cost is one map stage + one broadcast semi-join + one
  * per-doc rollup — the exact q111 shape, applied incrementally.
  * Idempotent on batchId via the same ledger-as-commit-log protocol
  * as StreamingIngest/StreamingNearDup.
  */
object StreamingDecontaminate {
  import graft.functions.TextFunctions._

  /** One micro-batch. `evalGrams` must have a `gram` string column
    * (typically precomputed once from the benchmark and stored).
    */
  def processBatch(store: SnapshotStore, evalGrams: DataFrame,
      batch: DataFrame, batchId: Long, maxPermille: Long = 100L,
      compactEvery: Int = 0): Unit = {
    val alreadyDone = store.read("decon_batches").exists(
      _.filter(col("batch_id") === batchId).limit(1).count() > 0)
    if (alreadyDone) return
    val spark = batch.sparkSession
    val grams = batch
      .select(col("doc_id"), col("text"),
        wordShingles(col("text"), 8).as("grams"))
      .localCheckpoint(true) // tiny; read by both routing joins below
    val dirtyIds = grams
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"),
        explode(col("grams")).as("gram"))
      .join(broadcast(evalGrams.select("gram").distinct()),
        Seq("gram"), "left_semi")
      .groupBy("doc_id", "n_grams")
      .agg(count(lit(1)).as("n_hits"))
      .filter(expr("(1000 * n_hits) div n_grams") > maxPermille)
      .select("doc_id")
    val clean = grams.join(dirtyIds, Seq("doc_id"), "left_anti")
    val dirty = grams.join(dirtyIds, Seq("doc_id"), "left_semi")
    // doc-bucketed appends: the routed tables are corpus-scaled, so
    // each batch lands in its own ≤64 partitions instead of rewriting
    // the accumulated table (same layout as StreamingNearDup's kept)
    StreamingIngest.ensureBucketed(store, "clean", "doc_bucket", col("doc_id"))
    store.append("clean",
      StreamingIngest.bucketed(clean.select("doc_id", "text"),
        "doc_bucket", col("doc_id")),
      partitionCols = Seq("doc_bucket"))
    if (!dirty.isEmpty) {
      StreamingIngest.ensureBucketed(store, "contaminated", "doc_bucket",
        col("doc_id"))
      store.append("contaminated",
        StreamingIngest.bucketed(dirty.select("doc_id", "text"),
          "doc_bucket", col("doc_id")),
        partitionCols = Seq("doc_bucket"))
      ()
    }
    // commit marker LAST (see StreamingIngest.processBatch)
    store.append("decon_batches", {
      import spark.implicits._
      Seq(batchId).toDF("batch_id")
    })
    // post-commit compaction cadence for the accumulating routed tables
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
      store.compact("clean", maxFilesPerPartition = 4)
      store.compact("contaminated", maxFilesPerPartition = 4)
    }
    ()
  }

  /** Watch `inputDir` for JSON files of `{doc_id, text}` documents. */
  def start(spark: SparkSession, inputDir: String, checkpointDir: String,
      store: SnapshotStore, evalGrams: DataFrame,
      maxPermille: Long = 100L): StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    spark.readStream.schema(schema).option("multiLine", true).json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(store, evalGrams, batch, batchId, maxPermille)
      }
      .start()
  }
}

/** Event-stream analytics: watermarked tumbling-window aggregation and
  * an arbitrary-stateful running counter.
  */
object EventStreams {

  /** Tumbling-window counts/sums per event_type with a watermark —
    * late events beyond the watermark are dropped, state is bounded
    * (the 100 TB/day concern: without the watermark, window state
    * grows forever).
    */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
      window: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup: drop events whose `event_id` was already
    * seen within the watermark horizon — bounded state (the unbounded
    * variant would grow a key per event forever; the watermark is what
    * makes exact dedup viable on an infinite stream).
    */
  def dedupStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked stream-stream interval join: match each action event
    * to the click by the same user within the preceding hour. Both
    * sides carry watermarks and the join condition bounds event time
    * on both ends, so Spark can expire state — the requirements that
    * make an infinite-stream join feasible.
    */
  def clickToAction(clicks: DataFrame, actions: DataFrame,
      watermark: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("click_ts", watermark)
    val a = actions.withWatermark("action_ts", watermark)
    a.join(c,
      expr("""click_user = action_user AND
              click_ts <= action_ts AND
              click_ts >= action_ts - INTERVAL 1 HOUR"""))
  }

  /** Streaming sessionization (the continuous twin of batch q37):
    * Spark's native `session_window` merges events into gap-separated
    * sessions per user and — with the watermark — emits a session
    * exactly once, when event time passes its close. State is bounded
    * by open sessions only; no custom flatMapGroupsWithState needed
    * (the built-in operator already maintains merging session state,
    * so this stays whole-stage-planned — "let Catalyst do it").
    */
  def sessionizedCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Stream-static enrichment: a micro-batch stream left-joined to a
    * broadcast dimension (the streaming twin of the batch engine's J1
    * dim joins) with a per-(dim-attribute) windowed rollup behind it.
    * The static side re-resolves per micro-batch, so a snapshot-store
    * dim picked up between batches is reflected without restarting
    * the query.
    */
  def enrichedCounts(events: DataFrame, userDim: DataFrame,
      watermark: String = "10 minutes", window: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(broadcast(userDim), Seq("user_id"), "left")
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        coalesce(col("tier"), lit("unknown")).as("tier"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("tier"), col("n_events"))

  final case class EventRow(event_id: Long, user_id: Long,
      ts: java.sql.Timestamp, event_type: String, value: Double)
  final case class AsofMatch(event_id: Long, user_id: Long,
      click_ts: java.sql.Timestamp, click_value: Double,
      view_ts: Option[java.sql.Timestamp], view_value: Option[Double])

  /** Streaming as-of enrichment — the continuous twin of the batch
    * asofJoin (TemporalQueries/q75): each click emits with the same
    * user's latest view at-or-before it. Per-key state is ONE row (the
    * latest view), so state size is O(distinct users) regardless of
    * stream length — the property that keeps an infinite-stream as-of
    * feasible where the stream-stream interval join (clickToAction)
    * must buffer a whole horizon of both sides.
    *
    * Rows are replayed in event-time order WITHIN each micro-batch
    * (views before clicks on ties, same as the batch operator); across
    * batches the state is monotone, so semantics match batch exactly
    * under per-key in-order arrival. A view arriving AFTER a click it
    * should have matched (cross-batch late data) cannot retro-emit —
    * that is the streaming trade-off, stated rather than hidden.
    */
  def asofEnrich(events: Dataset[EventRow]): Dataset[AsofMatch] = {
    import events.sparkSession.implicits._
    def micros(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Double), AsofMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[(Long, Double)]) =>
          val sorted = rows.toSeq.sortBy(r =>
            (micros(r.ts), if (r.event_type == "view") 0 else 1))
          var st = state.getOption
          val out = Seq.newBuilder[AsofMatch]
          sorted.foreach { r =>
            if (r.event_type == "view") st = Some((micros(r.ts), r.value))
            else if (r.event_type == "click") out += AsofMatch(
              r.event_id, user, r.ts, r.value,
              st.map(s => java.sql.Timestamp.from(
                java.time.Instant.ofEpochSecond(s._1 / 1000000L,
                  (s._1 % 1000000L) * 1000L))),
              st.map(_._2))
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }

  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long)

  /** Timeout-closed streaming sessionization — the batch gap
    * sessionizer (q37/q94's first stage) as continuous state with
    * EVENT-TIME TIMEOUT: a user's open session lives in state and
    * closes either when a same-batch event arrives past the gap, or —
    * the part only a timeout can do — when the WATERMARK passes
    * `last_event + gap` with no successor at all: the session that
    * simply ended. Without the timeout, a user who walks away leaks an
    * open session in state forever; with it, state stays O(active
    * users) and every session eventually emits exactly once.
    *
    * The caller must put a watermark on `ts` before grouping (the
    * timeout clock IS the watermark). Emits only CLOSED sessions
    * (Append mode).
    */
  def sessionizeStream(events: Dataset[EventRow], gapSec: Long = 1800L):
      Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    def micros(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    val gapUs = gapSec * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[(Long, Long, Long)]) =>
          val out = Seq.newBuilder[SessionOut]
          if (state.hasTimedOut) {
            val (s, e, n) = state.get
            out += SessionOut(user, s, e, n)
            state.remove()
          } else {
            val sorted = rows.toSeq.sortBy(r => (micros(r.ts), r.event_id))
            var st = state.getOption
            sorted.foreach { r =>
              val t = micros(r.ts)
              st match {
                case Some((s, e, n)) if t - e <= gapUs =>
                  st = Some((s, math.max(e, t), n + 1))
                case Some((s, e, n)) =>
                  out += SessionOut(user, s, e, n)
                  st = Some((t, t, 1L))
                case None =>
                  st = Some((t, t, 1L))
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s._2 + gapUs) / 1000L + 1L)
            }
          }
          out.result().iterator
      }
  }

  final case class Scd2Row(user_id: Long, attr: String,
      valid_from_us: Long, valid_to_us: Long)

  /** Streaming SCD Type-2 apply — the continuous twin of the batch
    * history build (TemporalQueries.q82Scd2History): per user, an
    * attribute change CLOSES the open version (emitting its finished
    * `[valid_from, valid_to)` interval) and opens a new one held in
    * state. Per-key state is ONE (attr, from) pair, so state size is
    * O(distinct users) for any stream length. Only closed intervals
    * emit (Append mode); the open tail version lives in state until
    * the next change — its batch counterpart is q82's
    * `is_current = true` row. Same cross-batch in-order caveat as
    * [[asofEnrich]].
    */
  def scd2Apply(events: Dataset[EventRow]): Dataset[Scd2Row] = {
    import events.sparkSession.implicits._
    def micros(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(String, Long), Scd2Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[(String, Long)]) =>
          val sorted = rows.toSeq.sortBy(r => (micros(r.ts), r.event_id))
          var st = state.getOption // (open attr, valid_from micros)
          val out = Seq.newBuilder[Scd2Row]
          sorted.foreach { r =>
            val t = micros(r.ts)
            st match {
              case Some((attr, from)) if attr != r.event_type =>
                out += Scd2Row(user, attr, from, t)
                st = Some((r.event_type, t))
              case None =>
                st = Some((r.event_type, t))
              case _ => () // same attr: the open interval continues
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }

  final case class DocIn(doc_id: Long, lang: String, w: Long)
  final case class SampleOut(lang: String, version: Long, doc_id: Long,
    w: Long, smp_rank: Long)

  /** JVM twin of TextFunctions.md5Long60 (first 60 bits of the MD5 of
    * the string) — the shared deterministic-uniform the batch q104 and
    * this stream both rank by, so their samples are comparable.
    */
  private[graft] def md5Long60Jvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Streaming twin of q104's priority sample: a per-language bottom-k
    * weighted sample WITHOUT replacement, maintained incrementally —
    * the state is the current k smallest (rank = hash div weight,
    * doc_id) and a merge with each batch's arrivals re-takes the
    * bottom k. Because the rank is a pure function of the document
    * (not of arrival order or batch boundaries), the maintained sample
    * after ANY prefix of the stream equals the batch bottom-k over the
    * same rows — bottom-k sketches are mergeable, which is exactly why
    * this streams — and replayed documents dedup by id, so at-least-
    * once delivery cannot bias the sample. Emits the group's full
    * sample with a bumped `version` only when a batch changes it;
    * consumers take the max version per language.
    */
  def prioritySampleStream(docs: Dataset[DocIn], k: Int): Dataset[SampleOut] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.lang)
      .flatMapGroupsWithState[(Long, Seq[(Long, Long, Long)]), SampleOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (lang, rows, state: GroupState[(Long, Seq[(Long, Long, Long)])]) =>
          val (ver, cur) = state.getOption.getOrElse(
            (0L, Seq.empty[(Long, Long, Long)]))
          val incoming = rows.map { d =>
            val w = math.max(d.w, 1L)
            (md5Long60Jvm(d.doc_id.toString) / w, d.doc_id, w)
          }
          val merged = (cur ++ incoming)
            .groupBy(_._2).map(_._2.head).toSeq // replay-idempotent by id
            .sortBy(t => (t._1, t._2)).take(k)
          if (merged == cur) Iterator.empty
          else {
            val v = ver + 1
            state.update((v, merged))
            merged.iterator.map { case (r, id, w) =>
              SampleOut(lang, v, id, w, r) }
          }
      }
  }

  final case class TypedEvent(event_type: String, us: Long)
  final case class DecayedOut(event_type: String, anchor_week: Long,
      n_events: Long, decayed_mass: Long)

  /** Continuous decayed counters — q141's trending/popularity mass
    * maintained as streaming state: per event type, integer
    * power-of-two half-life decay over ABSOLUTE week buckets (anchor
    * = the max week seen so far; q141's batch form anchors on the
    * exact max timestamp, so the two are siblings with a documented
    * anchor convention, pinned equal to a same-convention sequential
    * reference in StreamingSpec). State is the per-week count map,
    * pruned past 30 half-lives (those buckets shift to zero mass
    * anyway), so state size is bounded by the decay horizon — the
    * re-base on anchor advance is exact because (x >> a) >> d
    * ≡ x >> (a + d) for power-of-two decay.
    */
  def decayedCountsStream(ds: Dataset[TypedEvent]): Dataset[DecayedOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState[(Long, Long, Map[Long, Long]), DecayedOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (tpe, rows, state: GroupState[(Long, Long, Map[Long, Long])]) =>
          val (n0, anchor0, buckets0) = state.getOption
            .getOrElse((0L, Long.MinValue, Map.empty[Long, Long]))
          var n = n0
          var anchor = anchor0
          var buckets = buckets0
          rows.foreach { e =>
            val w = Math.floorDiv(e.us, 604800000000L)
            buckets = buckets.updated(w, buckets.getOrElse(w, 0L) + 1L)
            n += 1L
            if (w > anchor) anchor = w
          }
          buckets = buckets.filter { case (w, _) => anchor - w <= 30L }
          state.update((n, anchor, buckets))
          val mass = buckets.map { case (w, c) =>
            c * (1000000L >> math.min(anchor - w, 30L).toInt)
          }.sum
          Iterator(DecayedOut(tpe, anchor, n, mass))
      }
  }

  final case class Seen(key: String, raw: String)
  final case class SeenCount(key: String, raw: String, seenCount: Long)

  /** Continuous G9: running per-(key, raw) seen counts via
    * flatMapGroupsWithState — the streaming form of the variation
    * ledger's additive merge.
    */
  def runningSeenCounts(ds: Dataset[Seen]): Dataset[SeenCount] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(s => (s.key, s.raw))
      .flatMapGroupsWithState[Long, SeenCount](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case ((key, raw), rows, state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          Iterator(SeenCount(key, raw, total))
      }
  }
}
