package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards for the shapes PLANS.md documents:
  * the point is that a future edit silently reintroducing a shuffle or
  * losing a broadcast FAILS here, not in a bench report three rounds
  * later. All collectors recurse through AQE's leaf wrappers
  * (AdaptiveSparkPlanExec / QueryStageExec hold their subtree in a
  * field, invisible to a plain collect).
  */
class PlanGuardsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def collectNodes[T](df: DataFrame)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    df.collect() // finalize the adaptive plan first
    def go(p: SparkPlan): Seq[T] = {
      val here = p.collect {
        case a: AdaptiveSparkPlanExec => go(a.executedPlan)
        case q: QueryStageExec => go(q.plan)
        case n if pf.isDefinedAt(n) => Seq(pf(n))
      }
      here.flatten
    }
    go(df.queryExecution.executedPlan)
  }

  test("q32 shuffles exactly once: the result sort (signature is row-local)") {
    // r14: the signature is a row-local graft_minhash fold — the old
    // posting explode + 16-min aggregate (and its exchange) is gone; a
    // reintroduced signature shuffle fails here
    val df = operators.DedupQueries.q32DedupMinhashLsh(spark, dir)
    val shuffles = collectNodes(df) { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 1,
      s"q32 grew a shuffle (${shuffles.size}):\n${df.queryExecution.executedPlan}")
    assert(shuffles.nonEmpty, "expected the result-sort exchange")
  }

  test("q195's fused scan: the full pair frame crosses exactly two " +
    "exchanges (range + one cell window), both windows share one sort") {
    // r14 fused the two chained grouped scans (rank, then the h-cumsum
    // over the same order) into one ranged layout: the h window must
    // ride the rank window's hash exchange — a reintroduced second
    // full-frame exchange or per-query window fails HERE. The lazy
    // checkpoint truncates the final report's plan, so the guard reads
    // the pre-rollup frame.
    val ranked = operators.VectorQueries.q195Ranked(spark, dir, 1L)
    def hasAgg(p: SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
      case a: AdaptiveSparkPlanExec => hasAgg(a.executedPlan)
      case q: QueryStageExec => hasAgg(q.plan)
      case other => other.children.exists(hasAgg)
    }
    // Exchanges whose input is NOT pre-reduced by an aggregate carry
    // the full pair frame: exactly ONE may exist in the visible plan —
    // the cell-window hash exchange (the range exchange sits behind the
    // layout checkpoint). Everything else must ride a partial aggregate
    // (cell-count-sized offset frames).
    val fullFrame = collectNodes(ranked) {
      case s: ShuffleExchangeLike if !hasAgg(s) => s
    }
    assert(fullFrame.size <= 1,
      s"q195 ranked shuffles the pair frame more than once " +
        s"(${fullFrame.size}):\n${ranked.queryExecution.executedPlan}")
    val wins = collectNodes(ranked) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // 2 cell windows (rank, hloc) + the rank-offset frame's 2 windows
    assert(wins.size == 4,
      s"expected 4 windows (2 cell + 2 offset), got ${wins.size}:\n" +
        s"${ranked.queryExecution.executedPlan}")
    val perQueryWins = wins.filter(_.partitionSpec.size < 2)
      .filterNot(w => hasAgg(w.child)) // offset frames are bounded
    assert(perQueryWins.isEmpty,
      s"q195 grew a per-query (train-sized) window:\n" +
        s"${ranked.queryExecution.executedPlan}")
    // the h window must RIDE the rank window's exchange: two cell
    // windows, at most one full-frame exchange between scan and both
    val cellWins = wins.filter(_.partitionSpec.size == 2)
    assert(cellWins.size == 2,
      s"expected the two fused cell windows, got ${cellWins.size}:\n" +
        s"${ranked.queryExecution.executedPlan}")
  }

  test("q13 broadcasts all three dimension joins") {
    val df = operators.CoreQueries.q13RevenueByNation(spark, dir)
    val bhj = collectNodes(df) { case b: BroadcastHashJoinExec => b }
    assert(bhj.size >= 3,
      s"expected >=3 broadcast joins, got ${bhj.size}:\n${df.queryExecution.executedPlan}")
  }

  test("q36's signature stage plans without an aggregate exchange") {
    // the per-row graft_simhash fold replaced the explode + 32-sum
    // aggregate; the edge GENERATION up to the band join must not
    // shuffle the corpus (the band self-join itself may)
    val sig = Tables(spark, dir).documents
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.TextFunctions.simHash32(
          graft.functions.TextFunctions.tokens(
            org.apache.spark.sql.functions.col("text"))).as("sh"))
    val shuffles = collectNodes(sig) { case s: ShuffleExchangeLike => s }
    assert(shuffles.isEmpty,
      s"signature stage should be shuffle-free:\n${sig.queryExecution.executedPlan}")
  }

  test("q82 SCD2: both windows ride ONE exchange on the key") {
    // lag (change detect) + lead (interval close) share partitioning
    // and sort; a second exchange means someone broke the shared-sort
    // contract and the 100 TB plan now shuffles the fact table twice
    // (the final presentation orderBy adds a range exchange; allow 2).
    val df = operators.TemporalQueries.q82Scd2History(spark, dir)
    val shuffles = collectNodes(df) { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 2,
      s"q82 grew an exchange (${shuffles.size}):\n${df.queryExecution.executedPlan}")
  }

  test("q85 profiler: ONE pass over the table (a single scan node)") {
    val df = operators.ProfileQueries.q85Profile(spark, dir)
    val scans = collectNodes(df) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 1,
      s"profiler must not scan per column (${scans.size} scans):\n" +
        df.queryExecution.executedPlan)
  }

  test("q86 IVF-PQ: codebook and distance-table sides broadcast; one agg shuffle") {
    val df = operators.VectorQueries.q86AnnIvfPq(spark, dir)
    val bcast = collectNodes(df) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      case b: BroadcastHashJoinExec => b
    }
    assert(bcast.size >= 5, // 1 encode crossJoin + 4 ADC joins (+ dt internals)
      s"expected broadcast joins in the ADC scan, got ${bcast.size}:\n" +
        df.queryExecution.executedPlan)
    val shuffles = collectNodes(df) { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 2,
      s"q86 should shuffle only the encode aggregate (+top-k), got " +
        s"${shuffles.size}:\n${df.queryExecution.executedPlan}")
  }

  test("prefixJaccardPairs dictionary join is size-conditional: broadcast " +
      "small, shuffled-hash past the cap — same pairs either way") {
    import org.apache.spark.sql.functions.{col, lower}
    import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
    val sets = Tables(spark, dir).documents
      .filter(col("doc_id") < 40)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(lower(col("text"))).as("toks"))
    // pin auto-broadcast off so the ONLY broadcast in the plan is the
    // explicit dictionary hint (AQE would otherwise broadcast every
    // tiny test-scale join and blind the assertion)
    val conf = spark.conf
    val old = (conf.get("spark.sql.autoBroadcastJoinThreshold"),
      scala.util.Try(
        conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")).toOption
        .filter(_ != null))
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val small = operators.DedupQueries.prefixJaccardPairs(sets, 0.5)
      assert(collectNodes(small) { case b: BroadcastHashJoinExec => b }.nonEmpty,
        s"small dictionary must broadcast:\n${small.queryExecution.executedPlan}")
      val large = operators.DedupQueries
        .prefixJaccardPairs(sets, 0.5, dictBroadcastMax = 0L)
      assert(collectNodes(large) { case b: BroadcastHashJoinExec => b }.isEmpty,
        s"over-cap dictionary must not broadcast:\n" +
          large.queryExecution.executedPlan)
      // over the cap the dict join must be shuffled-hash (dict build
      // side), never sort-merge — sorting the full postings stream is
      // the measured pessimization (SCALING.md round 6, 56→39s at sf10)
      assert(collectNodes(large) { case s: ShuffledHashJoinExec => s }.nonEmpty,
        s"expected a shuffled-hash dictionary join:\n" +
          large.queryExecution.executedPlan)
      val k = Seq("a_id", "b_id", "jaccard")
      assert(small.orderBy(k.map(col): _*).collect().toSeq ==
        large.orderBy(k.map(col): _*).collect().toSeq,
        "the join strategy changed the result")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", old._1)
      old._2 match {
        case Some(v) =>
          conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("q94 interval join: candidates meet via an EQUI-join, never nested-loop") {
    val df = operators.TemporalQueries.q94IntervalJoin(spark, dir)
    val nlj = collectNodes(df) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(nlj.isEmpty,
      s"the binned form must never plan a nested-loop/cartesian join:\n" +
        df.queryExecution.executedPlan)
  }

  test("q104 priority sample runs as a top-k heap, never a global sort") {
    // ORDER BY rank LIMIT k must plan TakeOrderedAndProject (k rows per
    // partition cross the wire); a SortExec would mean the whole corpus
    // sorts for a 200-row sample
    val df = operators.SamplingQueries.q104WeightedSample(spark, dir)
    val topk = collectNodes(df) {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }
    val sorts = collectNodes(df) {
      case s: org.apache.spark.sql.execution.SortExec => s
    }
    assert(topk.nonEmpty,
      s"expected TakeOrderedAndProject:\n${df.queryExecution.executedPlan}")
    assert(sorts.isEmpty,
      s"a global sort defeats the bottom-k heap:\n${df.queryExecution.executedPlan}")
  }

  test("q105 repetition metrics: single scan, only the per-lang rollup shuffles") {
    val df = operators.TextQueries.q105Repetition(spark, dir)
    val scans = collectNodes(df) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val shuffles = collectNodes(df) { case s: ShuffleExchangeLike => s }
    assert(scans.size == 1,
      s"gram counting must stay inside one scan of documents:\n" +
        df.queryExecution.executedPlan)
    // partial agg -> exchange -> final agg (+ the orderBy's tiny range
    // exchange over <=5 rows): never a per-gram explode shuffle
    assert(shuffles.size <= 2,
      s"q105 grew a shuffle (${shuffles.size}):\n${df.queryExecution.executedPlan}")
  }

  test("q111: eval-gram probe is a broadcast semi-join; train side shuffles once") {
    val df = operators.SamplingQueries.q111NgramDecontaminate(spark, dir)
    val bhj = collectNodes(df) { case b: BroadcastHashJoinExec => b }
    assert(bhj.exists(_.joinType.sql == "LEFT SEMI"),
      s"eval grams must broadcast (the benchmark is KBs at any corpus " +
        s"size):\n${df.queryExecution.executedPlan}")
    val shuffles = collectNodes(df) { case s: ShuffleExchangeLike => s }
    // eval-gram distinct + per-doc rollup; the top-50 is a heap, not a sort
    assert(shuffles.size <= 2,
      s"q111 grew a shuffle (${shuffles.size}):\n${df.queryExecution.executedPlan}")
  }

  test("q117: both DSIR model joins broadcast (models are O(buckets), not O(vocab))") {
    val df = operators.SamplingQueries.q117DsirWeights(spark, dir)
    val bhj = collectNodes(df) { case b: BroadcastHashJoinExec => b }
    assert(bhj.size >= 1,
      s"the bucket-model join must broadcast:\n${df.queryExecution.executedPlan}")
  }

  test("q112: within-cluster pair discovery is an equi-join, never cartesian") {
    val df = operators.DedupQueries.q112Semdedup(spark, dir)
    val cart = collectNodes(df) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(cart.isEmpty,
      s"q112 must join on cluster_id:\n${df.queryExecution.executedPlan}")
  }

  test("q129: bloom bit probe AND exact verify both broadcast (the corpus " +
    "side never shuffles for membership)") {
    val df = operators.SamplingQueries.q129BloomDecontaminate(spark, dir)
    val bhj = collectNodes(df) { case b: BroadcastHashJoinExec => b }
    // set-bit inner join + eval-gram LEFT SEMI verify; both sides are
    // bounded (<= m bits / benchmark KBs) no matter the corpus size
    assert(bhj.size >= 2,
      s"expected broadcast probe + verify:\n${df.queryExecution.executedPlan}")
    assert(bhj.exists(_.joinType.sql == "LEFT SEMI"),
      s"exact verify must stay a broadcast semi-join:\n${df.queryExecution.executedPlan}")
  }

  test("q131: the incremental probe meets history via an EQUI-join on " +
    "(band, key) — never a cartesian, never a broadcast of either corpus side") {
    val df = operators.DedupQueries.q131IncrementalDedup(spark, dir)
    val cart = collectNodes(df) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(cart.isEmpty,
      s"band probe must stay an equi-join:\n${df.queryExecution.executedPlan}")
    val bnl = collectNodes(df) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bnl.isEmpty,
      s"no nested-loop anywhere in the probe:\n${df.queryExecution.executedPlan}")
  }

  test("q134: HRW shard assignment is a pure projection — only the rollup " +
    "and its 8-row sort shuffle") {
    val df = operators.LayoutQueries.q134RendezvousShards(spark, dir)
    val shuffles = collectNodes(df) { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 2,
      s"q134 grew a shuffle (${shuffles.size}):\n${df.queryExecution.executedPlan}")
    // both assignments come from ONE scan — no self-join, no second pass
    val scans = collectNodes(df) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 1,
      s"expected a single documents scan:\n${df.queryExecution.executedPlan}")
  }

  test("q168 silhouette: seeds are literals — scoring is map-only, " +
    "only the 8-row rollup and its sort shuffle") {
    val df = operators.VectorQueries.q168Silhouette(spark, dir)
    val shuffles = collectNodes(df) { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 2,
      s"q168 grew a shuffle (${shuffles.size}):\n${df.queryExecution.executedPlan}")
    // one embeddings scan in the returned plan: no per-row seed join
    val scans = collectNodes(df) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 1,
      s"expected a single embeddings scan:\n${df.queryExecution.executedPlan}")
    val joins = collectNodes(df) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty,
      s"q168 scoring must not join:\n${df.queryExecution.executedPlan}")
  }

  test("q195/q166/q192/q190 report stages: no unpartitioned WindowExec " +
    "(corpus-sized frames must never sort on one partition)") {
    // q195's top/bottom-20, q166/q192's vocab tops and q190's median all
    // moved off global rank windows (r8); a reintroduced unpartitioned
    // window would silently funnel a corpus-sized frame through a single
    // task at 100 TB — fail HERE instead.
    val dfs = Seq(
      "q195" -> operators.VectorQueries.q195KnnShapley(spark, dir),
      "q166" -> operators.TextQueries.q166OovCurve(spark, dir),
      "q192" -> operators.TextQueries.q192OovDrift(spark, dir),
      "q190" -> operators.TemporalQueries.q190BotScore(spark, dir))
    dfs.foreach { case (name, df) =>
      val global = collectNodes(df) {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }
      assert(global.isEmpty,
        s"$name grew an unpartitioned window:\n${df.queryExecution.executedPlan}")
    }
    val topk = collectNodes(dfs.head._2) {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }
    assert(topk.size >= 2,
      s"q195's report must be two TakeOrderedAndProject branches:\n" +
        s"${dfs.head._2.queryExecution.executedPlan}")
    // q195 (r8b): NO window partitioned by query_id alone — that shape
    // holds one query's whole train set in a single task. Every window
    // must either span (group, pid) cells (partitionSpec >= 2 exprs)
    // or ride a bounded aggregate (the scan's offset frames).
    def hasAggBelow195(p: SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
      case a: AdaptiveSparkPlanExec => hasAggBelow195(a.executedPlan)
      case q: QueryStageExec => hasAggBelow195(q.plan)
      case other => other.children.exists(hasAggBelow195)
    }
    val fatWin = collectNodes(dfs.head._2) {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.size < 2 && !hasAggBelow195(w.child) => w
    }
    assert(fatWin.isEmpty,
      s"q195 grew a per-query (train-sized) window partition:\n" +
        s"${dfs.head._2.queryExecution.executedPlan}")
    // q157: the key-frequency profile folds a histogram — the
    // distinct-key frame must never rank on one partition
    val q157 = operators.ProfileQueries.q157SkewAdvisor(spark, dir)
    val g157 = collectNodes(q157) {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(g157.isEmpty,
      s"q157 grew an unpartitioned window:\n${q157.queryExecution.executedPlan}")
    // q173: the within-tier shuffle is a 12-row TopKPerKey heap, and
    // the only unpartitioned window rides the LENGTH HISTOGRAM (an
    // aggregate output, value-domain-sized) — never raw corpus rows
    val q173 = operators.SamplingQueries.q173CurriculumSchedule(spark, dir)
    val heap = collectNodes(q173) {
      case t: graft.plans.TopKPerKeyExec => t
    }
    assert(heap.nonEmpty,
      s"q173 lost its TopKPerKey heap:\n${q173.queryExecution.executedPlan}")
    def hasAggBelow(p: SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
      case a: AdaptiveSparkPlanExec => hasAggBelow(a.executedPlan)
      case q: QueryStageExec => hasAggBelow(q.plan)
      case other => other.children.exists(hasAggBelow)
    }
    val corpusWin = collectNodes(q173) {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty && !hasAggBelow(w.child) => w
    }
    assert(corpusWin.isEmpty,
      s"q173's unpartitioned window must ride the length histogram " +
        s"(an aggregate), not the corpus:\n${q173.queryExecution.executedPlan}")
    // q200: the distributed scan's only unpartitioned window is the
    // partition-count-sized offset cumsum (an aggregate output); the
    // per-rank running sums must ride the __pid-partitioned window
    val q200 = operators.SamplingQueries.q200SelectionCurve(spark, dir)
    val scanWin = collectNodes(q200) {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty && !hasAggBelow(w.child) => w
    }
    assert(scanWin.isEmpty,
      s"q200's scan grew a corpus-sized unpartitioned window:\n" +
        s"${q200.queryExecution.executedPlan}")
  }

  test("q47/q137/q156: no corpus-input window partitioned only by a " +
    "bounded-cardinality key (the low-cardinality window family stays dead)") {
    // r9: the last corpus-through-few-tasks shapes — partitionBy(lang)/
    // (source)/(event_type) put corpus/|groups| rows through each window
    // task at 100×. All three now ride the grouped ScanOps scan/lag,
    // whose windows either span (group, __pid) cells (partitionSpec >= 2
    // exprs) or ride a bounded aggregate (offset/carry frames). A
    // reintroduced single-key window over raw corpus rows fails HERE.
    def hasAggBelow(p: SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
      case a: AdaptiveSparkPlanExec => hasAggBelow(a.executedPlan)
      case q: QueryStageExec => hasAggBelow(q.plan)
      case other => other.children.exists(hasAggBelow)
    }
    val dfs = Seq(
      "q47" -> operators.SamplingQueries.q47SequencePacking(spark, dir),
      "q137" -> operators.SamplingQueries.q137ScoreCalibrate(spark, dir),
      "q156" -> operators.TemporalQueries.q156Burstiness(spark, dir),
      // r9b: the ProfileQueries members of the same class (found by
      // self-audit): ntile, winsorize cuts, weighted-percentile cumsum
      "q133" -> operators.ProfileQueries.q133EquiDepth(spark, dir),
      "q160" -> operators.ProfileQueries.q160WinsorizedMeans(spark, dir),
      "q187" -> operators.ProfileQueries.q187WeightedPercentiles(spark, dir))
    dfs.foreach { case (name, df) =>
      val fat = collectNodes(df) {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.size < 2 && !hasAggBelow(w.child) => w
      }
      assert(fat.isEmpty,
        s"$name grew a low-cardinality corpus window:\n" +
          s"${df.queryExecution.executedPlan}")
    }
  }

  test("scan stitch join reuses the cell window's hash partitioning — no " +
    "corpus re-exchange on the unbounded-groups (no-broadcast) fallback") {
    // r9c: the stitch keys are STRUCT-wrapped so NULL groups survive a
    // plain EqualTo (null-safe) AND the shuffle-join fallback can reuse
    // HashPartitioning(group, __pid) from the cell window — a `<=>`
    // join would rewrite keys to (coalesce, isnull) and force the
    // corpus through one more exchange exactly when groups are too
    // many to broadcast. Asserted by disabling broadcast and checking
    // no ShuffleExchange sits between the corpus WindowExec and the
    // stitch join's streamed side.
    import org.apache.spark.sql.functions.col
    val conf = spark.conf
    val old = (conf.get("spark.sql.autoBroadcastJoinThreshold"),
      scala.util.Try(
        conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")).toOption
        .filter(_ != null))
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = operators.ScanOps.runningSums(
        Tables(spark, dir).documents
          .select(col("lang"), col("doc_id"), col("n_chars")),
        Seq("lang"), Seq(col("doc_id").asc),
        Seq((col("n_chars").cast("long"), "cum")))
      // Some(true) = an exchange sits above the first WindowExec on
      // this path; Some(false) = the window is reached exchange-free
      def exchangeAboveWindow(p: SparkPlan): Option[Boolean] = p match {
        case _: ShuffleExchangeLike => Some(true)
        case _: org.apache.spark.sql.execution.window.WindowExec => Some(false)
        case a: AdaptiveSparkPlanExec => exchangeAboveWindow(a.executedPlan)
        case q: QueryStageExec => exchangeAboveWindow(q.plan)
        case other =>
          other.children.iterator.flatMap(exchangeAboveWindow).nextOption()
      }
      val joins = collectNodes(df) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }
      assert(joins.nonEmpty,
        s"expected a shuffled stitch join with broadcast off:\n" +
          s"${df.queryExecution.executedPlan}")
      val misaligned = joins.filter(j =>
        exchangeAboveWindow(j.children.head).contains(true))
      assert(misaligned.isEmpty,
        s"stitch join re-exchanges the windowed corpus side:\n" +
          s"${df.queryExecution.executedPlan}")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", old._1)
      old._2 match {
        case Some(v) => conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("q203 phrase search: term-selective postings meet on an equi-join, " +
    "report is a top-k heap — no cartesian, no global sort") {
    val df = operators.SearchQueries.q203PhraseSearch(spark, dir)
    val bad = collectNodes(df) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty,
      s"q203 must join postings on doc_id:\n${df.queryExecution.executedPlan}")
    val topk = collectNodes(df) {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }
    assert(topk.nonEmpty,
      s"q203's top-20 must be a heap:\n${df.queryExecution.executedPlan}")
    val sorts = collectNodes(df) {
      case s: org.apache.spark.sql.execution.SortExec => s
    }
    assert(sorts.isEmpty,
      s"a global sort defeats the top-k heap:\n${df.queryExecution.executedPlan}")
  }

  test("q44/q203/q205/q150 probe the STORED postings index: no documents " +
    "scan in any probe plan; the postings scans prune term_bucket dirs") {
    // r10: the materialized-index contract — schema.sql:141's GIN index
    // is STORED; a probe that re-tokenizes the corpus is the wrong plan
    // at 100 TB no matter how fast it tests. A documents.parquet scan
    // reappearing in these plans means someone un-materialized the
    // index; a postings scan without a partition filter means the
    // bucket pruning (the directory-level GIN walk) silently died.
    val dfs = Seq(
      "q44" -> operators.SearchQueries.q44KeywordSearch(spark, dir),
      "q203" -> operators.SearchQueries.q203PhraseSearch(spark, dir),
      "q205" -> operators.SearchQueries.q205StoredIndexAudit(spark, dir),
      "q206" -> operators.SearchQueries.q206Bm25Ranking(spark, dir),
      "q207" -> operators.SearchQueries.q207PhraseTrigram(spark, dir),
      "q208" -> operators.SearchQueries.q208HybridBm25Rrf(spark, dir),
      "q150" -> operators.SearchQueries.q150HybridRrf(spark, dir))
    dfs.foreach { case (name, df) =>
      val scans = collectNodes(df) {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      val docScans = scans.filter(_.relation.location.rootPaths
        .exists(_.toString.contains("documents")))
      assert(docScans.isEmpty,
        s"$name scans the corpus instead of the stored index:\n" +
          s"${df.queryExecution.executedPlan}")
      // q150's embeddings leg legitimately scans embeddings.parquet
      // (the exact-fusion baseline); q208's dense leg reads the
      // stored ANN snapshot; every OTHER scan must be an index-store
      // read
      val stray = scans.filterNot(f => f.relation.location.rootPaths.exists(
        p => p.toString.contains("postings") ||
          p.toString.contains("embeddings") ||
          p.toString.contains("ann_")))
      assert(stray.isEmpty,
        s"$name reads an unexpected table:\n${stray.map(_.relation.location.rootPaths)}")
    }
    // term-selective entries must prune: every postings (non-stats)
    // scan carries a partition filter on term_bucket (q205 audits the
    // WHOLE index by design — no term predicate to prune with; q207
    // rides phraseSearch's SINGLE materialized probe — checked below)
    dfs.filterNot(d => d._1 == "q205" || d._1 == "q207").foreach {
      case (name, df) =>
        val postingsScans = collectNodes(df) {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.relation.location.rootPaths.exists(p =>
              p.toString.contains("/postings/")) => f
        }
        assert(postingsScans.nonEmpty, s"$name lost its postings scan")
        assert(postingsScans.forall(_.partitionFilters.nonEmpty),
          s"$name probes without bucket pruning:\n" +
            s"${df.queryExecution.executedPlan}")
    }
    // r11: phraseSearch materializes its pruned probe ONCE (the df
    // gate and the position intersect share it — one postings scan
    // per query, not two), so q207's returned plan reads the
    // checkpointed probe and contains NO file scan at all; the probe
    // frame itself still prunes (covered by the probeOf check above
    // via q203, which shares probe()).
    val q207Scans = collectNodes(dfs.toMap.apply("q207")) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(q207Scans.isEmpty,
      "q207 re-scans the index: phraseSearch must reuse its single " +
        "materialized probe for both the df gate and the intersect")
  }

  test("q43/q208/q210 probe the STORED ANN index: no embeddings scan " +
    "in any search plan; assignment scans prune list_id dirs") {
    // r11: the r10 lexical materialized-index contract applied to the
    // vector side (verdict item 1) — the reference STORES its IVFFLAT
    // (rag.py:83-86) and walks `probes` lists per query; a search
    // plan that scans the full embeddings table is CPU/IO-linear in
    // the corpus per query, the wrong class at 100 TB. The query
    // vector itself comes from a bounded stored-index point lookup at
    // plan-construction time, so the returned plan must contain ZERO
    // embeddings.parquet scans and its ann_assignments scans must
    // carry a list_id partition filter (the directory-level list
    // walk). q209/q211 audit the WHOLE index by design and are
    // exempt; q211's exact-truth leg REQUIRES a full assignments pass
    // (recall is measured against the exact answer).
    val dfs = Seq(
      "q43" -> operators.VectorQueries.q43SearchTopk(spark, dir),
      "q208" -> operators.SearchQueries.q208HybridBm25Rrf(spark, dir),
      "q210" -> operators.VectorQueries.q210AnnProbeTopk(spark, dir),
      "q212" -> operators.VectorQueries.q212FilteredAnn(spark, dir),
      "q214" -> operators.SearchQueries.q214FilteredHybrid(spark, dir),
      // q215's adaptive loop returns the chosen rung's denseSearch
      // plan — same pruning contract as the fixed-width probes. (q216
      // is not listable here: hybridSearchAdaptive returns an
      // API-boundary localCheckpointed ≤topK frame whose leg plans
      // are exactly q214's, already guarded above.)
      "q215" -> operators.VectorQueries.q215AdaptiveFilteredAnn(spark, dir))
    dfs.foreach { case (name, df) =>
      val scans = collectNodes(df) {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      val embScans = scans.filter(_.relation.location.rootPaths
        .exists(_.toString.contains("embeddings.parquet")))
      assert(embScans.isEmpty,
        s"$name scans the raw embeddings table instead of the stored " +
          s"ANN index:\n${df.queryExecution.executedPlan}")
      val annScans = scans.filter(_.relation.location.rootPaths
        .exists(_.toString.contains("ann_assignments")))
      assert(annScans.nonEmpty, s"$name lost its ANN probe scan")
      assert(annScans.forall(_.partitionFilters.nonEmpty),
        s"$name probes without list pruning:\n" +
          s"${df.queryExecution.executedPlan}")
    }
  }

  test("UNIVERSAL window-class guard: across ALL registry entries, no " +
    "WindowExec funnels corpus-scaled rows through a bounded partition key") {
    // r10 (verdict item 2): the r8/r9 guard pinned a NAMED list of
    // plans; entry #206 could silently reintroduce the shape. This
    // iterates every SparkEntry.queries plan (AQE off — the property
    // is static, no execution needed) and asserts the class property:
    // a WindowExec is an offender when its partitionSpec has <2
    // exprs, nothing below it bounds the frame (aggregate or limit),
    // and its single partition key is not one whose cardinality
    // SCALES WITH the corpus (per-partition rows bounded by design).
    // Exceptions are explicit and justified below.
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.{BaseLimitExec, TakeOrderedAndProjectExec}
    def boundedBelow(p: SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
      case _: BaseLimitExec => true
      case _: TakeOrderedAndProjectExec => true
      case t: graft.plans.TopKPerKeyExec => t.k > 0 // grouped heap output
      case a: AdaptiveSparkPlanExec => boundedBelow(a.executedPlan)
      case q: QueryStageExec => boundedBelow(q.plan)
      case other => other.children.exists(boundedBelow)
    }
    // single-key partitions whose key count scales with the corpus —
    // per-key rows are bounded by design (a user's events, a doc's
    // tokens, a pair's spans), so the window never sees corpus/|groups|
    val scalingKeys = Set(
      "user_id", // session family: events per user bounded (q37/q48/...)
      "doc_id",  // per-document frames: tokens/chunks per doc bounded
      "vec_id", "query_id", // per-vector / per-eval-query frames
      "case_id", "case_number", // per-case docket frames
      "__pid", // ScanOps cell windows: one scan partition per task
      "comp",  // q172: components scale with corpus; per-comp rows =
               // dup-cluster size, the bound the CC loop materializes
      "span",  // q76 C4 dedup: distinct 10-gram spans scale with the
               // corpus; per-span rows = that span's duplication count
      "h"      // q193 positional grams: distinct hashes scale with the
               // corpus; the window computes the df the maxSeedDf gate
               // caps (sf10-measured, SCALING.md r8)
    )
    val exceptions: Map[String, String] = Map(
      "q46_window_analytics" ->
        ("input bounded by the pushed o_orderkey < 2000 range predicate " +
          "— constant rows at any SF, the analytic-sweep fixture"),
      "q173_curriculum_schedule" ->
        ("its unpartitioned window rides the LENGTH HISTOGRAM (an " +
          "aggregate output severed by localCheckpoint); pinned by the " +
          "dedicated q173 plan test above"),
      "q176_theil_sen" ->
        ("the rank window rides the (type, day)-matrix pair frame — an " +
          "aggregate output severed from the plan by localCheckpoint; " +
          "days²-bounded per type, never raw events"),
      "q214_filtered_hybrid" ->
        ("its rank windows ride the ≤legK-row BM25 hit frame — a top-k " +
          "output severed by the single-probe localCheckpoint (the same " +
          "frame q208 shows WITH its TakeOrdered below); the stored-ANN " +
          "plan guard pins the probe scans")
    )
    val conf = spark.conf
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        if (!exceptions.contains(name)) {
          val plan =
            try fn(spark, dir).queryExecution.executedPlan
            catch { case e: Throwable =>
              fail(s"$name failed to plan under the guard: $e") }
          def scanWindows(p: SparkPlan): Seq[WindowExec] = {
            val here = p.collect {
              case a: AdaptiveSparkPlanExec => scanWindows(a.executedPlan)
              case q: QueryStageExec => scanWindows(q.plan)
              case w: WindowExec => Seq(w)
            }
            here.flatten
          }
          scanWindows(plan).foreach { w =>
            val refs = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
            val scaling = w.partitionSpec.size == 1 &&
              refs.exists(r => scalingKeys.exists(k =>
                r == k || r.startsWith(k + "#") || r.stripSuffix("s") == k))
            if (w.partitionSpec.size < 2 && !boundedBelow(w.child) && !scaling)
              offenders += s"$name: partitionSpec=${w.partitionSpec.map(_.sql)}"
          }
        }
      }
    } finally conf.set("spark.sql.adaptive.enabled", oldAqe)
    assert(offenders.isEmpty,
      s"corpus-through-bounded-key windows reintroduced:\n" +
        offenders.mkString("\n"))
  }

  test("q179 deletion cascade: every hop is a semi/equi join — no " +
    "nested-loop, no cartesian") {
    val df = operators.ProfileQueries.q179DeletionCascade(spark, dir)
    val bnl = collectNodes(df) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
        // the 1-row × 1-row ledger assembly is the only allowed NL shape
        if !j.left.toString.contains("count") => j
    }
    val cart = collectNodes(df) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(cart.isEmpty,
      s"q179 grew a cartesian:\n${df.queryExecution.executedPlan}")
    val hops = collectNodes(df) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if j.joinType.toString == "LeftSemi" ||
          j.joinType.toString == "LeftOuter" => j
    }
    assert(hops.size >= 3,
      s"expected the three equi-join hops:\n${df.queryExecution.executedPlan}")
  }
}
