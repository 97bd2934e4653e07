package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.TextFunctions.tokens
import graft.operators.{DedupQueries, TemporalQueries}

/** Scale-decade stress harness: runs the quadratic-risk operators on
  * ScaleGen scratch dirs (typically sf0.1 and sf1, same generator) and
  * prints one JSON line per (dir, query) with wall seconds, total
  * shuffle-write bytes, and the max/total task time — the inputs for
  * SCALING.md's scaling-exponent table. Exponent = log10(metric@sf1 /
  * metric@sf0.1) when the dirs are a decade apart.
  *
  * Queries run UNBOUNDED (no doc_id slices): this harness exists to
  * measure how candidate generation grows with the corpus, which the
  * oracle-anchored bounded variants deliberately cap.
  */
object ScaleBench {

  private final class TaskAgg extends SparkListener {
    val shuffleWrite = new AtomicLong
    val inputRead = new AtomicLong
    val maxTaskMs = new AtomicLong
    val sumTaskMs = new AtomicLong
    val nTasks = new AtomicLong
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        inputRead.addAndGet(m.inputMetrics.bytesRead)
      }
      if (e.taskInfo != null) {
        val d = e.taskInfo.duration
        maxTaskMs.accumulateAndGet(d, (a: Long, b: Long) => math.max(a, b))
        sumTaskMs.addAndGet(d)
        nTasks.incrementAndGet()
      }
    }
  }

  /** With SPARK_GRAFT_SCALE_EXPLAIN=1, q80_ppjoin (the one entry
    * whose plan shape the skew work keeps changing) prints its
    * formatted plan before running.
    */
  private val explain = sys.env.get("SPARK_GRAFT_SCALE_EXPLAIN").contains("1")

  /** Fresh batch ids for the maintenance-decade entries (each rep
    * must not replay-skip on the ledger marker). Seeded from the clock
    * so ids stay fresh across JVM runs against the PERSISTED scratch
    * stores too — a fixed seed made every rerun's batches replay-skip
    * on markers a previous session had already committed, silently
    * measuring the no-op path.
    */
  private val maintBatchId = new AtomicLong(System.currentTimeMillis())

  /** One (doc_id, bigram set) frame shared by the q80 entries, so the
    * full join and its candidate-only stage measure the SAME corpus —
    * the generation-vs-verification subtraction depends on it.
    */
  private def bigramSets(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir).documents
      .select(col("doc_id"), tokens(lower(col("text"))).as("ts"))
    base.select(col("doc_id"),
      array_distinct(transform(
        sequence(lit(0), greatest(size(col("ts")) - 2, lit(0))),
        i => array_join(slice(col("ts"), i + 1, lit(2)), " "))).as("toks"))
  }

  /** Full-corpus prefix-filtered Jaccard join over word bigrams — the
    * unbounded form of q80 (the generator's constructed near-dups are
    * the expected hits). 0.65 sits under the constructed twins' ~0.73
    * bigram Jaccard.
    */
  private def ppjoin(spark: SparkSession, dir: String): DataFrame =
    DedupQueries.prefixJaccardPairs(bigramSets(spark, dir), 0.65)

  private def candidates(spark: SparkSession, dir: String): Long =
    DedupQueries.prefixCandidates(
      bigramSets(spark, dir), 0.65, 2000000L, 8000, 8)._2.count()

  private def bpeMerges(spark: SparkSession, dir: String,
      nMerges: Int = 1000): Int = {
    val freq = Tables(spark, dir).documents
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    graft.functions.BpeTokenizer.train(freq, nMerges).length
  }

  private val queries: Seq[(String, (SparkSession, String) => Long)] = Seq(
    "q32_minhash_lsh" -> ((s, d) => DedupQueries.q32DedupMinhashLsh(s, d).count()),
    "q131_incr_dedup" -> ((s, d) => DedupQueries.q131IncrementalDedup(s, d).count()),
    "q135_split_leak" -> ((s, d) => DedupQueries.q135SplitLeakage(s, d).count()),
    "q129_bloom_decon" -> ((s, d) =>
      graft.operators.SamplingQueries.q129BloomDecontaminate(s, d).count()),
    "q36_simhash_cc" -> ((s, d) => DedupQueries.q36DedupCluster(s, d).count()),
    "q80_ppjoin" -> ((s, d) => {
      val q = ppjoin(s, d)
      if (explain) q.explain("formatted")
      q.count()
    }),
    // candidate stage alone (same 0.65 threshold): subtract from
    // q80_ppjoin to see the generation-vs-verification cost split
    "q80_candidates" -> ((s, d) => candidates(s, d)),
    "q94_interval_join" -> ((s, d) =>
      TemporalQueries.q94IntervalJoin(s, d).collect()
        .map(_.getLong(1)).sum),
    "q99_triangle" -> ((s, d) =>
      TemporalQueries.q99TriangleCount(s, d).collect().head.getLong(2)),
    "q87_bpe_train1000" -> ((s, d) => bpeMerges(s, d).toLong),
    // vocab-scale argmax stress: the 32k-merge cap exercises the local
    // trainer's lazy max-heap (rows = merges actually learned before
    // the pair supply runs dry)
    "q87_bpe_train32k" -> ((s, d) => bpeMerges(s, d, 32000).toLong),
    // flash-crowd pair (for --skew dirs): the same interval join with
    // the density-conditional salting ON (default) vs forced OFF —
    // compare max_task_ms to see the straggler the salting removes
    "q94_skew_salted" -> ((s, d) =>
      TemporalQueries.overlappingSessionPairs(s, d).count()),
    "q94_skew_unsalted" -> ((s, d) =>
      TemporalQueries.overlappingSessionPairs(s, d,
        hotDensity = Int.MaxValue).count()),
    // PageRank over the co-presence graph (q99's edge derivation —
    // ≥60s session overlap): rounds are zipPartitions exchanges over
    // the persisted adjacency list, so the decade should be linear in
    // edges; the --skew flash-crowd axis makes one cell's pair space
    // a dense hub neighborhood, stressing the per-partition LongMap
    // accumulation instead of a shuffle key (contributions to a hub
    // pre-combine map-side — the hot key never concentrates a task)
    "q100_pagerank" -> ((s, d) => {
      val edges = TemporalQueries.overlappingSessionPairs(s, d)
        .filter(col("overlap_us") >= 60000000L)
        .select(col("sid_a.user_id").as("ua"), col("sid_b.user_id").as("ub"))
        .filter(col("ua") =!= col("ub"))
      // scale 1e9, NOT the query's 1e12: this graph grows with the
      // dir, and the kernel's 85*S*N < 2^63 bound caps S=1e12 at
      // ~1e5 nodes (sf10 crosses it); S=1e9 is safe to ~1e8 nodes
      graft.operators.GraphQueries
        .pageRank(edges, 5, 1000000000L).count()
    }),
    // HITS on the same co-presence edges (as a digraph): the exchange
    // is the PageRank shape plus one tiny max action per half-round —
    // this entry exists to confirm the normalization actions don't
    // change the decade behavior (HitsScale=1e6 keeps the
    // maxDegree*S^2 < 2^63 normalization bound at the skew axis's
    // 12k-degree hubs)
    "q102_hits" -> ((s, d) => {
      val edges = TemporalQueries.overlappingSessionPairs(s, d)
        .filter(col("overlap_us") >= 60000000L)
        .select(col("sid_a.user_id").as("ua"), col("sid_b.user_id").as("ub"))
        .filter(col("ua") =!= col("ub"))
      graft.operators.GraphQueries
        .hits(edges, 5, graft.operators.GraphQueries.HitsScale).count()
    }),
    // label propagation over the same co-presence graph: seeds =
    // every third user labeled user_id % 8 (8 labels, inside the
    // 32-slot dense vote vector). The exchange is the PageRank shape
    // but each receiver accumulates a 32-long array instead of one
    // long — the decade should stay edge-linear, and the --skew hub
    // axis stresses the same map-side pre-combination (a hub's
    // thousands of votes collapse into ONE array before the shuffle)
    "q106_label_prop" -> ((s, d) => {
      val edges = TemporalQueries.overlappingSessionPairs(s, d)
        .filter(col("overlap_us") >= 60000000L)
        .select(col("sid_a.user_id").as("ua"), col("sid_b.user_id").as("ub"))
        .filter(col("ua") =!= col("ub"))
      // seeds from the base table, NOT from `edges` — a seed frame
      // derived off the edge list would re-run the whole interval
      // join a second time inside the kernel's seed materialization
      // (measured 6× end-to-end at sf1); kernels take seeds as an
      // independent input for exactly this reason
      val seeds = graft.Tables(s, d).events
        .select(col("user_id").as("id")).distinct()
        .filter(col("id") % 3 === 0)
        .select(col("id"), (col("id") % 8).as("lab"))
      graft.operators.GraphQueries.labelPropagate(edges, seeds, 3).count()
    }),
    // k-core peel on the same co-presence graph: the rounds are
    // window counts over a shrinking edge list with loop-sized
    // partitions, so the decade should track the edge derivation
    // (the q94/q99 curve), not the peel
    "q108_kcore" -> ((s, d) =>
      graft.operators.TemporalQueries.q108KCore(s, d).count()),
    // ANN family: exact scan vs cell probe vs compressed-codes scan
    // round-7 curation operators. q111/q117 are map-stage + broadcast
    // shapes that should measure linear; q113 composes the row-local
    // pair derivation with the weighted kernel (slots ∝ co-occurrence
    // count, loop state ∝ Heaps vocabulary).
    "q111_ngram_decon" -> ((s, d) =>
      graft.operators.SamplingQueries.q111NgramDecontaminate(s, d).count()),
    "q113_textrank" -> ((s, d) =>
      graft.operators.GraphQueries.q113Textrank(s, d).count()),
    "q117_dsir" -> ((s, d) =>
      graft.operators.SamplingQueries.q117DsirWeights(s, d).count()),
    // SemDeDup at the balanced sizing rule k = ⌈√n⌉ (assignment n·k +
    // pairs n²/k are both n^1.5 there): the measured exponent should
    // land near 1.5 on a --vecs decade, the documented cost of the
    // flat quantizer before the LSH-cell path (q35, linear) takes over
    "q112_semdedup_sqrtk" -> ((s, d) => {
      val n = graft.Tables(s, d).embeddings.count()
      val k = math.ceil(math.sqrt(n.toDouble)).toInt
      DedupQueries.semdedupLedger(s, d, k).count()
    }),
    // the documented linear continuation: the SAME dedup ledger over
    // hyperplane-LSH cells (q35's quantizer — assignment is one
    // row-local signature, O(n·planes), vs the flat quantizer's O(n·k)
    // dots), 256 cells. Measures the claim that swapping the coarse
    // quantizer removes the n^1.5 term.
    "q112_semdedup_cells" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.functions.VectorFunctions._
      val vecs = graft.Tables(s, d).embeddings
        .select(col("vec_id"), col("embedding"),
          hyperplaneSignature(col("embedding"), 8).as("cluster_id"))
      val a = vecs.select(col("cluster_id"), col("vec_id").as("a_id"),
        col("embedding").as("a_e"))
      val b = vecs.select(col("cluster_id"), col("vec_id").as("b_id"),
        col("embedding").as("b_e"))
      val pairs = a.join(b, Seq("cluster_id"))
        .filter(col("a_id") < col("b_id"))
        .filter(dotFold(col("a_e"), col("b_e")) >= 0.4d)
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_dup_pairs"),
          countDistinct("b_id").as("n_dropped"))
      vecs.groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
        .join(pairs, Seq("cluster_id"), "left")
        .count()
    }),
    // session-bounded transition matrix + robust volume anomalies:
    // both reduce the event stream to a tiny matrix (|types|² /
    // (type, day)) in one pass — the decade should be wall-flat
    // work-linear
    "q138_pit" -> ((s, d) =>
      TemporalQueries.q138PitJoin(s, d).collect().map(_.getLong(2)).sum),
    "q143_bootstrap" -> ((s, d) =>
      graft.operators.SamplingQueries.q143BootstrapCi(s, d).count()),
    "q121_markov" -> ((s, d) =>
      graft.operators.SearchQueries.q121MarkovTransitions(s, d).count()),
    "q122_anomaly" -> ((s, d) =>
      graft.operators.TemporalQueries.q122VolumeAnomaly(s, d).count()),
    // OOV curve: the corpus crosses once as (type, count); the rank
    // window sorts only the Heaps-law vocabulary — the decade should
    // show sub-linear wall (vocab ∝ n^0.5-ish), linear shuffle
    "q166_oov" -> ((s, d) =>
      graft.operators.TextQueries.q166OovCurve(s, d).count()),
    // canonical selection = q36's CC machinery + one argmax window
    // over near-dup-sized partitions — the decade should track q36's
    // measured exponents, the window adding only the rollup
    "q172_canonical" -> ((s, d) =>
      DedupQueries.q172CanonicalSelect(s, d).count()),
    // substring-span seed-and-chain: the quadratic risk is the seed
    // equi-join on the 8-gram hash (per-gram density² output). The
    // generator's near-dups are edit-style, so seeds stay sparse and
    // the decade should be scan/shuffle-linear with tiny join output
    "q193_substr" -> ((s, d) =>
      DedupQueries.q193SubstringDedup(s, d).count()),
    // the df-gate's reason to exist, measured: the same corpus with a
    // 50-token boilerplate span injected into every 10th document. The
    // span's 43 positional grams each reach df = |docs|/10, so the
    // UNGATED seed join pays 43 · d²/200 rows on hot keys (quadratic
    // in the corpus) while the gated run drops them up front and stays
    // output-linear — the certified-lower-bound trade documented on
    // q193SubstringDedup.
    "q193_boiler_gated" -> ((s, d) =>
      q193BoilerSeeds(s, d, DedupQueries.Q193MaxSeedDf)),
    "q193_boiler_ungated" -> ((s, d) => q193BoilerSeeds(s, d, 0)),
    // r8 de-globalizations, measured across the decade: q173's
    // two-level rank + TopKPerKey heap (was: corpus rank window +
    // corpus/4-per-task tier windows), q157's frequency-histogram
    // median (was: distinct-key rank window), q190's value-histogram
    // median fold (was: |users| rank window). All three should be
    // wall-flat-ish with scan/shuffle-linear work and NO single task
    // carrying the corpus.
    "q173_curriculum" -> ((s, d) =>
      graft.operators.SamplingQueries.q173CurriculumSchedule(s, d).count()),
    "q157_skew" -> ((s, d) =>
      graft.operators.ProfileQueries.q157SkewAdvisor(s, d).count()),
    "q190_bot" -> ((s, d) =>
      TemporalQueries.q190BotScore(s, d).count()),
    // the distributed prefix scan (q200): exact global cumsum via
    // range exchange + pid-local windows + a partition-count-sized
    // offset stitch — wall/shuffle should be scan-linear, max task
    // bounded by one range partition, never the corpus
    "q200_scan_curve" -> ((s, d) =>
      graft.operators.SamplingQueries.q200SelectionCurve(s, d).count()),
    // PassJoin: candidates are the (seg, len, piece) equi-join —
    // quadratic only where many prefixes share a verbatim 13-char
    // segment; the probe explode is a constant ≤45× row factor
    "q194_editdist" -> ((s, d) =>
      DedupQueries.q194EditDistanceJoin(s, d).count()),
    "q40_ann_brute" -> ((s, d) =>
      graft.operators.VectorQueries.q40AnnBruteForce(s, d).count()),
    // r9 de-globalizations: the low-cardinality window family moved
    // onto the grouped scan/lag — wall should track the corpus scan
    // and MAX TASK must stay one-range-split-sized where the old
    // partitionBy(lang)/(source)/(event_type) windows grew linearly
    // (corpus/|groups| rows per task)
    "q47_packing" -> ((s, d) =>
      graft.operators.SamplingQueries.q47SequencePacking(s, d).count()),
    "q137_calibrate" -> ((s, d) =>
      graft.operators.SamplingQueries.q137ScoreCalibrate(s, d).count()),
    "q156_burst" -> ((s, d) =>
      TemporalQueries.q156Burstiness(s, d).count()),
    // r9b self-audit members of the same family (ProfileQueries):
    // ntile, winsorize cuts, weighted-percentile cumsum — same bound
    "q133_equidepth" -> ((s, d) =>
      graft.operators.ProfileQueries.q133EquiDepth(s, d).count()),
    "q160_winsorize" -> ((s, d) =>
      graft.operators.ProfileQueries.q160WinsorizedMeans(s, d).count()),
    "q187_wpercentiles" -> ((s, d) =>
      graft.operators.ProfileQueries.q187WeightedPercentiles(s, d).count()),
    // q195 at the default 4% eval slice vs a 10× slice: the grouped
    // scan's per-task memory must be |tests|-INDEPENDENT (the pair
    // frame grows 10×, but every partition stays one range split);
    // the old per-query window would hold 10× the partitions here
    "q195_shapley" -> ((s, d) =>
      graft.operators.VectorQueries.q195KnnShapley(s, d).count()),
    "q195_shapley_10x" -> ((s, d) =>
      graft.operators.VectorQueries.q195KnnShapley(s, d, 10L).count()),
    // exact novelty join vs its bloom-gated swap (q202): same curve,
    // train-side shuffle cut to matches + false positives
    "q201_novelty" -> ((s, d) =>
      graft.operators.SamplingQueries.q201NoveltyCurve(s, d).count()),
    "q202_novelty_bloom" -> ((s, d) =>
      graft.operators.SamplingQueries.q202NoveltyBloom(s, d).count()),
    "q41_ann_cell" -> ((s, d) =>
      graft.operators.VectorQueries.q41AnnLsh(s, d).count()),
    "q86_ann_ivfpq" -> ((s, d) =>
      graft.operators.VectorQueries.q86AnnIvfPq(s, d).count()),
    // r10 FTS decade: the index BUILD is the corpus-linear one-time
    // cost (one scan → postings agg → bucketed write), measured
    // separately from the per-query PROBES, which ride partition
    // pruning and should be df-bounded, not corpus-bounded. The
    // build entry forces a fresh build by clearing the memoized
    // store; the probe entries then reuse it (the production ratio).
    "q205_index_build" -> ((s, d) => {
      graft.search.PostingsIndex.invalidate(d)
      graft.search.PostingsIndex.storedPostings(s, d).count()
    }),
    "q44_keyword_probe" -> ((s, d) =>
      graft.operators.SearchQueries.q44KeywordSearch(s, d).count()),
    "q206_bm25_probe" -> ((s, d) =>
      graft.operators.SearchQueries.q206Bm25Ranking(s, d).count()),
    "q203_phrase_probe" -> ((s, d) =>
      graft.operators.SearchQueries.q203PhraseSearch(s, d).count()),
    // k-anonymity census: one pre-combined aggregate to the
    // (lang, source, octave) class grid — wall should be scan-linear,
    // the rollup grid-sized
    "q204_kanon" -> ((s, d) =>
      graft.operators.ProfileQueries.q204KAnonymity(s, d).count()),
    // the hot-term gate's reason to exist, measured (r9's exact
    // concern: a phrase of stopword-grade terms makes both join sides
    // df-sized). 'the' and 'scan' are base-vocabulary terms whose df
    // grows with the corpus; the gated run caps at the RARER term's
    // df, so the hotter term becomes a position gap (Postgres
    // stopword semantics) and its df-sized postings never ship.
    "q203_hotterms_ungated" -> ((s, d) =>
      graft.search.PostingsIndex.phraseSearch(s, d,
        Seq("the", "scan"), topK = 20).count()),
    "q203_hotterms_gated" -> ((s, d) => {
      import org.apache.spark.sql.functions.{count => cnt, lit}
      val dfs = graft.search.PostingsIndex.probe(s, d, Seq("the", "scan"))
        .groupBy("term").agg(cnt(lit(1)).as("df")).collect()
        .map(r => r.getLong(1))
      graft.search.PostingsIndex.phraseSearch(s, d,
        Seq("the", "scan"), topK = 20, maxTermDf = dfs.min).count()
    }),
    // r10 reshape (found by the universal window guard): the quota
    // draw rides a budget-bounded TopKPerKey heap — max task must stay
    // heap-sized where the old per-lang corpus rank window grew
    // corpus/|langs| per task
    "q185_quota" -> ((s, d) =>
      graft.operators.SamplingQueries.q185QuotaSample(s, d).count()),
    // r11 ANN decade: the stored-index BUILD (train + assign + write,
    // forced fresh) is the corpus-linear one-time cost; the probes
    // should track nprobe/lists of the INDEX bytes, not the corpus
    "ann_index_build" -> ((s, d) => {
      graft.rag.AnnStore.invalidate(d)
      graft.rag.AnnStore.assignments(s, d).count()
    }),
    "q210_ann_probe" -> ((s, d) =>
      graft.operators.VectorQueries.q210AnnProbeTopk(s, d).count()),
    // the adaptive filtered probe: its survivor-count rungs must read
    // pruned list dirs only, so the decade should track the fixed
    // probes (index bytes), never the corpus
    "q215_adaptive_probe" -> ((s, d) =>
      graft.operators.VectorQueries.q215AdaptiveFilteredAnn(s, d).count()),
    // the adaptive filtered HYBRID loop (r12 verdict item 4): both
    // bounded legs widen together; like q215 the per-rung work reads
    // pruned index dirs (lexical: term buckets; dense: probe lists)
    // plus bounded-key pushed lookups — the decade must track the
    // index, never the corpus
    "q216_adaptive_hybrid" -> ((s, d) =>
      graft.operators.SearchQueries.q216AdaptiveFilteredHybrid(s, d).count()),
    "q43_ann_search" -> ((s, d) =>
      graft.operators.VectorQueries.q43SearchTopk(s, d).count()),
    "q208_hybrid" -> ((s, d) =>
      graft.operators.SearchQueries.q208HybridBm25Rrf(s, d).count()),
    // r11b maintenance decade: ONE micro-batch (50 re-ingested docs /
    // vectors) against an EXISTING store built over the whole corpus.
    // With the sidecar collide lookups (registry term_buckets,
    // ann_id_map) the per-batch cost must be ~FLAT across corpus
    // decades — every scan in the batch path is partition-pruned to
    // the batch's own buckets/lists, so wall tracks batch size and
    // bucket width, not corpus size. The first rep pays the one-time
    // store build; best-of-reps reads the steady-state batch cost.
    "postings_maintain_batch" -> ((s, d) => {
      val root = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft-scale-postmaint",
        d.replaceAll("[^A-Za-z0-9._-]", "_")).toString
      val store = new graft.store.SnapshotStore(s, root)
      if (store.currentVersion("postings").isEmpty)
        graft.streaming.StreamingPostings.processBatch(store,
          Tables(s, d).documents.select("doc_id", "text"), 0L)
      val batch = Tables(s, d).documents
        .filter(pmod(col("doc_id"), lit(97L)) === 1L).limit(50)
        .select(col("doc_id"),
          concat(col("text"), lit(" deltatok")).as("text"))
      // compaction cadence ON (compactEvery = 1 relative to this
      // batch id): the steady-state cost a long-lived stream pays,
      // including its OPTIMIZE rhythm, not just the merge
      graft.streaming.StreamingPostings.processBatch(store, batch,
        maintBatchId.incrementAndGet(), compactEvery = 1)
      batch.count()
    }),
    // r13 SEGMENT maintenance: the same 50-doc batch through
    // processBatchAppend — tombstone + new-files-only append — whose
    // write cost must be O(batch) in BYTES, not just wall-flat like
    // the LWW row (which rewrites every term bucket per batch). The
    // fold entry measures the amortized O(corpus) pass the cadence
    // knob spreads over N batches (it appends one batch first so the
    // fold always has tombstones to spend).
    "postings_append_maintain" -> ((s, d) => {
      val root = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft-scale-postseg",
        d.replaceAll("[^A-Za-z0-9._-]", "_")).toString
      val store = new graft.store.SnapshotStore(s, root)
      if (store.currentVersion("postings").isEmpty)
        graft.streaming.StreamingPostings.processBatchAppend(store,
          Tables(s, d).documents.select("doc_id", "text"), 0L)
      val batch = Tables(s, d).documents
        .filter(pmod(col("doc_id"), lit(97L)) === 1L).limit(50)
        .select(col("doc_id"),
          concat(col("text"), lit(" deltatok")).as("text"))
      graft.streaming.StreamingPostings.processBatchAppend(store, batch,
        maintBatchId.incrementAndGet())
      batch.count()
    }),
    "postings_fold" -> ((s, d) => {
      val root = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft-scale-postseg",
        d.replaceAll("[^A-Za-z0-9._-]", "_")).toString
      val store = new graft.store.SnapshotStore(s, root)
      if (store.currentVersion("postings").isEmpty)
        graft.streaming.StreamingPostings.processBatchAppend(store,
          Tables(s, d).documents.select("doc_id", "text"), 0L)
      val batch = Tables(s, d).documents
        .filter(pmod(col("doc_id"), lit(97L)) === 2L).limit(50)
        .select("doc_id", "text")
      graft.streaming.StreamingPostings.processBatchAppend(store, batch,
        maintBatchId.incrementAndGet())
      graft.streaming.StreamingPostings.foldPostings(store)
      store.vacuum("postings", keepLast = 1).size.toLong
    }),
    "ann_maintain_batch" -> ((s, d) => {
      val root = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft-scale-annmaint",
        d.replaceAll("[^A-Za-z0-9._-]", "_")).toString
      val store = new graft.store.SnapshotStore(s, root)
      if (store.currentVersion("ann_centroids").isEmpty) {
        val emb = Tables(s, d).embeddings.withColumnRenamed("vec_id", "id")
        val cents = graft.rag.AnnStore.trainCentroids(
          emb, "embedding", Seq(col("id")))
        graft.rag.AnnStore.writeIndex(s, store, emb, cents)
      }
      val batch = Tables(s, d).embeddings.withColumnRenamed("vec_id", "id")
        .filter(pmod(col("id"), lit(97L)) === 1L).limit(50)
      graft.streaming.StreamingAnn.processBatch(store, batch,
        maintBatchId.incrementAndGet(), compactEvery = 1)
      batch.count()
    }),
    // r14 ANN SEGMENT maintenance (the default path): the same 50-
    // vector batch through processBatchAppend — merge BYTES must be
    // O(batch) where the LWW row rewrites every touched list per batch
    // (O(touched lists × list size)); the fold entry measures the
    // amortized pass the cadence spreads over N batches.
    "ann_append_maintain" -> ((s, d) => {
      val root = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft-scale-annseg",
        d.replaceAll("[^A-Za-z0-9._-]", "_")).toString
      val store = new graft.store.SnapshotStore(s, root)
      if (store.currentVersion("ann_centroids").isEmpty) {
        val emb = Tables(s, d).embeddings.withColumnRenamed("vec_id", "id")
        val cents = graft.rag.AnnStore.trainCentroids(
          emb, "embedding", Seq(col("id")))
        graft.rag.AnnStore.writeIndex(s, store, emb, cents)
      }
      val batch = Tables(s, d).embeddings.withColumnRenamed("vec_id", "id")
        .filter(pmod(col("id"), lit(97L)) === 1L).limit(50)
      graft.streaming.StreamingAnn.processBatchAppend(store, batch,
        maintBatchId.incrementAndGet())
      batch.count()
    }),
    "ann_fold" -> ((s, d) => {
      val root = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft-scale-annseg",
        d.replaceAll("[^A-Za-z0-9._-]", "_")).toString
      val store = new graft.store.SnapshotStore(s, root)
      if (store.currentVersion("ann_centroids").isEmpty) {
        val emb = Tables(s, d).embeddings.withColumnRenamed("vec_id", "id")
        val cents = graft.rag.AnnStore.trainCentroids(
          emb, "embedding", Seq(col("id")))
        graft.rag.AnnStore.writeIndex(s, store, emb, cents)
      }
      val batch = Tables(s, d).embeddings.withColumnRenamed("vec_id", "id")
        .filter(pmod(col("id"), lit(97L)) === 2L).limit(50)
      graft.streaming.StreamingAnn.processBatchAppend(store, batch,
        maintBatchId.incrementAndGet())
      graft.streaming.StreamingAnn.foldAnn(store)
      store.vacuum("ann_assignments", keepLast = 1).size.toLong
    }),
    "neardup_maintain_batch" -> ((s, d) => {
      val root = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft-scale-ndmaint",
        d.replaceAll("[^A-Za-z0-9._-]", "_")).toString
      val store = new graft.store.SnapshotStore(s, root)
      if (store.currentVersion("signatures").isEmpty)
        graft.streaming.StreamingNearDup.processBatch(store,
          Tables(s, d).documents.select("doc_id", "text"), 0L)
      val batch = Tables(s, d).documents
        .filter(pmod(col("doc_id"), lit(97L)) === 1L).limit(50)
        .select("doc_id", "text")
      graft.streaming.StreamingNearDup.processBatch(store, batch,
        maintBatchId.incrementAndGet(), compactEvery = 1)
      batch.count()
    }),
    // r12 erasure decade: the forget path's index legs + scoped vacuum
    // against the SAME corpus-scaled stores the maintain entries build
    // — 50 fresh tombstones per rep (the id slice rotates so every rep
    // deletes rows that exist). Cost must track tombstones × touched
    // buckets/lists — every scan in the delete path partition-prunes
    // through the sidecars (registry term_buckets, ann_id_map) — NOT
    // corpus size; the scoped vacuum is the bytes-disappear step.
    "forget_batch" -> ((s, d) => {
      import s.implicits._
      val postStore = new graft.store.SnapshotStore(s,
        java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"), "graft-scale-postmaint",
          d.replaceAll("[^A-Za-z0-9._-]", "_")).toString)
      if (postStore.currentVersion("postings").isEmpty)
        graft.streaming.StreamingPostings.processBatch(postStore,
          Tables(s, d).documents.select("doc_id", "text"), 0L)
      val annStore = new graft.store.SnapshotStore(s,
        java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"), "graft-scale-annmaint",
          d.replaceAll("[^A-Za-z0-9._-]", "_")).toString)
      if (annStore.currentVersion("ann_centroids").isEmpty) {
        val emb = Tables(s, d).embeddings.withColumnRenamed("vec_id", "id")
        val cents = graft.rag.AnnStore.trainCentroids(
          emb, "embedding", Seq(col("id")))
        graft.rag.AnnStore.writeIndex(s, annStore, emb, cents)
      }
      val slice = maintBatchId.incrementAndGet() % 90L + 2L
      val docIds = Tables(s, d).documents
        .filter(pmod(col("doc_id"), lit(97L)) === slice).limit(50)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      val vecIds = Tables(s, d).embeddings
        .filter(pmod(col("vec_id"), lit(97L)) === slice).limit(50)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      val touched = graft.streaming.IndexDeletes.deleteFromPostings(
        postStore, docIds.toDF("doc_id"))
      graft.streaming.IndexDeletes.deleteFromAnn(annStore,
        vecIds.toDF("id"))
      touched.foreach(postStore.vacuum(_, keepLast = 1))
      Seq("ann_assignments", "ann_id_map", "ann_list_stats", "ann_stats")
        .foreach(annStore.vacuum(_, keepLast = 1))
      (docIds.size + vecIds.size).toLong
    }),
    // r13 erasure decade, QUARANTINE-ONLY victims: dockets that never
    // ingested (null filed_date → BAD_DATE → quarantine + error
    // ledger, no case row), so the forget path runs ONLY the ledger
    // legs — one column-pruned scan per ledger to find the victims'
    // (record_hash, run_bucket) rows, then run-bucket-scoped rewrites.
    // The scan is the honest O(ledger) price of erasing from an
    // append-only audit ledger; the decade row pins what it costs as
    // the corpus (and with it the ledger) grows 10×.
    "forget_quarantined_batch" -> ((s, d) => {
      import s.implicits._
      val root = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft-scale-qforget",
        d.replaceAll("[^A-Za-z0-9._-]", "_")).toString
      val store = new graft.store.SnapshotStore(s, root)
      if (store.currentVersion("quarantine").isEmpty) {
        // every 37th docket carries an unparseable filed_date and
        // quarantines; the rest ingest normally (the ledgers sit next
        // to a real corpus-scaled store, as in production)
        val raw = Tables(s, d).documents.select(
          concat(lit("Q-"), col("doc_id")).as("case_number"),
          lit("S.D.N.Y.").as("court"),
          concat(lit("Case "), col("doc_id")).as("title"),
          when(pmod(col("doc_id"), lit(37L)) === 3L,
            lit(null).cast("string"))
            .otherwise(date_format(date_add(to_date(lit("2020-01-01")),
              (col("doc_id") % 900).cast("int")), "yyyy-MM-dd"))
            .as("filed_date"),
          lit("Plain Tiff (plaintiff)").as("parties"),
          lit("civil").as("case_type"),
          lit("Judge Scale").as("judge"),
          col("text").as("docket_text"),
          lit("active").as("status"),
          col("doc_id").as("_seq"))
        val r = graft.ingest.IngestJob.run(s, raw, runId = 1L,
          sourceName = "scale", sourceUri = d,
          ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
        graft.streaming.StreamingIngest.mergeResult(store, r)
        store.append("ingest_runs", r.runLedger)
      }
      // 50 fresh quarantine-only victims per rep (the slice rotates)
      val slice = maintBatchId.incrementAndGet() % 30L + 2L
      val victims = Tables(s, d).documents
        .filter(pmod(col("doc_id"), lit(37L)) === 3L &&
          pmod(col("doc_id"), lit(31L)) === slice % 31L)
        .limit(50)
        .select(concat(lit("Q-"), col("doc_id"))).collect()
        .map(_.getString(0)).toSeq
      val report = graft.streaming.IndexDeletes.forgetCases(store, victims)
      report.tables.foreach(store.vacuum(_, keepLast = 1))
      victims.size.toLong
    }),
    // r13 end-to-end chain (r12 verdict item 7): ONE production-loop
    // round against a corpus-scaled store — a writer merges a 50-row
    // batch into the bucketed base tables, the CDC followers step both
    // indexes from the (partition-restricted) feed, a query serves
    // from the followed indexes, a 10-row tombstone delete feeds
    // through, and the touched tables vacuum. Every stage's cost must
    // track its own input (batch / changed partitions / tombstones /
    // index bytes), never the corpus; the first rep pays the one-time
    // corpus bootstrap outside the steady-state min.
    "chain_batch" -> ((s, d) => chainRound(s, d, segment = false)),
    // the same loop with the postings follower in SEGMENT mode
    // (tombstone + new-files append, fold every 8 steps): the
    // follow-postings stage stops rewriting the corpus-wide term
    // buckets per batch
    "chain_batch_segment" -> ((s, d) => chainRound(s, d, segment = true)),
    // r11 A/B for the bucket sort (verdict item 3): the SAME probe
    // against a term-SORTED store (production layout) vs an UNSORTED
    // twin written without the cluster key — input_mb is the metric
    // the row-group term pruning moves
    "q44_probe_sorted" -> ((s, d) =>
      graft.operators.SearchQueries.q44KeywordSearch(s, d).count()),
    "q44_probe_unsorted" -> ((s, d) => {
      val root = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft-scale-unsorted",
        d.replaceAll("[^A-Za-z0-9._-]", "_")).toString
      val store = new graft.store.SnapshotStore(s, root)
      if (store.currentVersion("postings").isEmpty) {
        val docs = Tables(s, d).documents.select("doc_id", "text")
        store.write("postings",
          graft.search.PostingsIndex.buildPostings(docs)
            .repartition(graft.search.PostingsIndex.NumBuckets,
              col("term_bucket")),
          partitionCols = Seq("term_bucket"))
        store.write("postings_stats",
          docs.agg(count(lit(1)).as("n_docs")).crossJoin(
            store.read("postings").get
              .agg(coalesce(sum("tf"), lit(0L)).as("total_tokens")))
            .withColumn("num_buckets",
              lit(graft.search.PostingsIndex.NumBuckets.toLong)))
      }
      graft.search.PostingsIndex.keywordSearchFrames(
        store.read("postings").get, store.read("postings_stats").get,
        Seq("vector", "merge", "batch"), topK = 20).count()
    }),
  )

  /** One end-to-end chain round (see the chain_batch entry comment).
    * `segment` switches the postings follower to the O(batch)
    * tombstone+append protocol with an 8-step fold cadence.
    */
  private def chainRound(s: org.apache.spark.sql.SparkSession, d: String,
      segment: Boolean): Long = {
    locally {
      import s.implicits._
      import graft.streaming.CdcIndexMaintenance
      val root = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"),
        if (segment) "graft-scale-chainseg" else "graft-scale-chain",
        d.replaceAll("[^A-Za-z0-9._-]", "_")).toString
      val store = new graft.store.SnapshotStore(s, root)
      // 1024-way buckets: a 50-row batch of ARBITRARY keys touches
      // ≤50 partitions ≈ 5% of the fan-out, so the partition-scoped
      // merge (and the restricted change feed behind the followers)
      // moves O(batch × bucket width), not O(corpus). At 64 buckets
      // the same batch touched ~40/64 dirs — most of the corpus
      // rewritten per round (measured: chain shuffle tracked the
      // corpus 10×). Production sizes fan-out with the table for
      // exactly this reason.
      def docsB(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("d_bucket", pmod(col("doc_id"), lit(1024L)).cast("int"))
      def vecsB(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("v_bucket", pmod(col("id"), lit(1024L)).cast("int"))
      if (store.currentVersion("docs").isEmpty) {
        store.write("docs",
          docsB(Tables(s, d).documents.select("doc_id", "text"))
            .repartition(col("d_bucket")), partitionCols = Seq("d_bucket"))
        store.write("vecs",
          vecsB(Tables(s, d).embeddings.withColumnRenamed("vec_id", "id"))
            .repartition(col("v_bucket")), partitionCols = Seq("v_bucket"))
        CdcIndexMaintenance.followPostings(store, "docs",
          segment = segment, foldEvery = if (segment) 8 else 0)
        CdcIndexMaintenance.followAnn(store, "vecs",
        segment = segment, foldEvery = if (segment) 8 else 0)
      }
      val slice = maintBatchId.incrementAndGet() % 90L + 2L
      def bucketsOf(df: org.apache.spark.sql.DataFrame, c: String): Seq[Any] =
        df.select(c).distinct().collect().map(_.get(0)).toSeq
      // 1. a writer lands a 50-row batch in each base table
      val docBatch = docsB(Tables(s, d).documents
        .filter(pmod(col("doc_id"), lit(97L)) === slice).limit(50)
        .select(col("doc_id"), concat(col("text"), lit(" chaintok")).as("text")))
        .localCheckpoint(true)
      store.mergeLastWriteWins("docs", docBatch, Seq("doc_id"),
        partitionCols = Seq("d_bucket"),
        collideHint = Some(bucketsOf(docBatch, "d_bucket")))
      val vecBatch = vecsB(Tables(s, d).embeddings
        .withColumnRenamed("vec_id", "id")
        .filter(pmod(col("id"), lit(97L)) === slice).limit(50))
        .localCheckpoint(true)
      store.mergeLastWriteWins("vecs", vecBatch, Seq("id"),
        partitionCols = Seq("v_bucket"),
        collideHint = Some(bucketsOf(vecBatch, "v_bucket")))
      // 2. the followers step both indexes from the restricted feed
      CdcIndexMaintenance.followPostings(store, "docs",
        segment = segment, foldEvery = if (segment) 8 else 0)
      CdcIndexMaintenance.followAnn(store, "vecs",
        segment = segment, foldEvery = if (segment) 8 else 0)
      // 3. serve from the followed indexes: BM25 over the stored
      // postings + a dense probe over the stored ANN lists
      val stats = store.read("postings_stats").get
      graft.search.PostingsIndex.bm25SearchFrames(
        graft.streaming.StreamingPostings.servingPostings(store), stats,
        Seq("vector", "merge", "batch"), topK = 10,
        numBuckets = graft.search.PostingsIndex.numBucketsOf(stats)).count()
      val cents = graft.rag.AnnStore.centroidsOf(
        store.read("ann_centroids").get)
      val qv = vecBatch.select("embedding").limit(1).collect()
        .head.getSeq[Float](0).toArray
      val probeLists = graft.rag.AnnStore.probeListsOf(cents, qv, 4)
      graft.streaming.StreamingAnn.servingAssignments(store)
        .filter(col("list_id").isin(probeLists: _*))
        .withColumn("cosine", graft.functions.VectorFunctions
          .dotFold(col("embedding"), typedlit(qv.toSeq)))
        .orderBy(desc("cosine"), asc("id")).limit(10).count()
      // 4. a writer tombstones 10 rows; the followers feed the deletes
      val dead = docBatch.limit(10).localCheckpoint(true)
      store.mergeLastWriteWins("docs", docsB(dead.filter(lit(false))),
        Seq("doc_id"), partitionCols = Seq("d_bucket"),
        collideHint = Some(bucketsOf(dead, "d_bucket")),
        keyScope = Some(dead.select("doc_id")))
      val deadVecs = vecBatch.limit(10).localCheckpoint(true)
      store.mergeLastWriteWins("vecs", vecsB(deadVecs.filter(lit(false))),
        Seq("id"), partitionCols = Seq("v_bucket"),
        collideHint = Some(bucketsOf(deadVecs, "v_bucket")),
        keyScope = Some(deadVecs.select("id")))
      CdcIndexMaintenance.followPostings(store, "docs",
        segment = segment, foldEvery = if (segment) 8 else 0)
      CdcIndexMaintenance.followAnn(store, "vecs",
        segment = segment, foldEvery = if (segment) 8 else 0)
      // 5. reclaim: vacuum the tables this round touched (the
      // segment variant keeps postings_tombstones bounded via the
      // fold cadence, so it rides the same list)
      Seq("docs", "vecs", "postings", "postings_tombstones",
        "indexed_docs", "registry_stats",
        "postings_stats", "ann_assignments", "ann_id_map",
        "ann_list_stats", "ann_stats", "ann_tombstones",
        "cdc_cursors", "cdc_applied", "ann_touched_intents")
        .foreach(t => if (store.currentVersion(t).isDefined)
          store.vacuum(t, keepLast = 1))
      100L
    }
  }

  /** Seed-join row count for [[DedupQueries.q193Grams]] over a
    * boilerplate-heavy twist of the corpus: every 10th document gains
    * one shared 50-token span. Measures the seed equi-join's output —
    * the quantity the df-gate exists to bound.
    */
  private def q193BoilerSeeds(spark: SparkSession, dir: String,
      maxSeedDf: Int): Long = {
    val boiler = (1 to 50).map(i => s"boilertok$i").mkString(" ")
    val docs = Tables(spark, dir).documents.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(10L)) === 0L,
        concat(col("text"), lit(" " + boiler)))
        .otherwise(col("text")).as("text"))
    // The UNGATED run exists to MEASURE the quadratic at scales where
    // it is merely expensive; past ~100k docs it is 43·C(n/10, 2) seed
    // rows (5.4e13 at sf10) — refuse rather than hang the harness.
    if (maxSeedDf <= 0 && docs.count() > 100000L) return -1L
    val g = DedupQueries.q193Grams(docs, maxSeedDf)
    g.as("a").join(g.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .count()
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val sc = spark.sparkContext
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "2").toInt
    val only = sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(",").toSet)
    for (dir <- args; (name, run) <- queries
        if only.forall(_.contains(name))) {
      var best: (Double, TaskAgg, Long) = null
      for (_ <- 1 to reps) {
        val agg = new TaskAgg
        sc.addSparkListener(agg)
        val t0 = System.nanoTime()
        val rows = run(spark, dir)
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // let the async listener bus drain
        sc.removeSparkListener(agg)
        if (best == null || secs < best._1) best = (secs, agg, rows)
        spark.sqlContext.clearCache()
      }
      val (secs, agg, rows) = best
      println(f"""{"dir": "$dir", "query": "$name", "secs": $secs%.2f, """ +
        f""""rows": $rows, "shuffle_mb": ${agg.shuffleWrite.get / 1e6}%.1f, """ +
        f""""max_task_ms": ${agg.maxTaskMs.get}, """ +
        f""""input_mb": ${agg.inputRead.get / 1e6}%.1f, """ +
        f""""sum_task_ms": ${agg.sumTaskMs.get}, "n_tasks": ${agg.nTasks.get}}""")
    }
  }
}
