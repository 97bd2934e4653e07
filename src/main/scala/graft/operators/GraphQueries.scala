package graft.operators

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables

/** Iterative link-analysis ranking over a transaction graph — the
  * "which documents/entities matter" primitive a training-data
  * pipeline runs to weight a crawl graph or a citation network
  * before sampling (quality-weighted mixing wants a per-source
  * importance score, and PageRank over the reference graph is the
  * standard one).
  *
  * The graph here is the customer↔supplier bipartite graph induced
  * by orders⋈lineitem (who trades with whom); node ids are
  * disambiguated as 2·custkey / 2·suppkey+1 so the two key spaces
  * cannot collide. Undirected (both orientations emitted), so every
  * node with an edge has out-degree ≥ 1 and there is no dangling
  * mass to redistribute — the recurrence stays a pure local message
  * exchange in BOTH engines.
  *
  * **Fixed-point integer arithmetic** (the q84 pattern): ranks are
  * BIGINTs scaled by 1e12; each round is
  * `r'(v) = (15·S)/100 + (85 · Σ_{u→v} r(u) div deg(u)) / 100`
  * with truncating integer division throughout. Double arithmetic
  * would make the oracle hash a bet on summation order; integer sums
  * are order-independent, so the DuckDB twin (the same five rounds
  * unrolled as CTEs) matches bit-for-bit. The truncation loses < deg
  * ulps of mass per node per round — ranking-irrelevant at S=1e12.
  * Overflow bound: the damped sum is ≤ 85·S·N, so S=1e12 is safe to
  * N≈10^5 nodes; at larger N pass a smaller `scale` (S=1e6 is safe
  * to N≈10^11 — the bound is `85·S·N < 2^63`).
  *
  * **Execution** (the GraphOps pattern — RDD loop, not a DataFrame
  * loop): the graph lives as a persisted ADJACENCY LIST
  * `RDD[(src, Array[dst])]` hash-partitioned by src ONCE; each round
  * is a `zipPartitions` rank exchange with primitive `LongMap`
  * accumulation, and only the pre-combined contribution messages
  * (reduceByKey) cross the wire — the minimum movement the algorithm
  * needs on a 1000-executor cluster. A DataFrame loop would re-plan
  * and re-shuffle the edge table every round; an RDD cogroup loop
  * (the first version) paid ~0.9s/round in per-edge tuple boxing.
  * Iteration count is FIXED (5), not convergence-tested, so the
  * oracle can unroll the same five rounds; lineage depth is bounded
  * by the same constant.
  */
object GraphQueries {

  val Scale: Long = 1000000000000L // 1e12; see overflow bound above
  val Iterations: Int = 5

  /** q100: five fixed rounds of damped PageRank (d=0.85) over the
    * undirected customer↔supplier trade graph. Output one row per
    * node that trades: (node_id, kind, entity_id, pr_rank).
    */
  /** The customer↔supplier trade graph both queries rank: one row per
    * (2·custkey, 2·suppkey+1) trading pair. No `.distinct()` — the
    * kernel's adjacency build deduplicates (src, dst) per partition,
    * saving the extra full shuffle. ONE definition shared by q100 and
    * q101 so the Spark side cannot diverge between them (the SQL twin
    * prefix is shared the same way — `graphCtes`).
    *
    * MEMOIZED per scale dir (the QualityQueries.cache pattern): five
    * queries (q100/q101/q102/q103/q106) consume this identical
    * orders⋈lineitem derivation, and each kernel's first action would
    * otherwise re-run the join — localCheckpoint materializes it once
    * per dir and truncates the lineage, so every kernel's edge-RDD
    * read starts from the checkpointed rows (~0.3-0.5s saved per
    * query after the first).
    */
  private val pairsCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  private def tradePairs(t: Tables): DataFrame =
    pairsCache.getOrElseUpdate(t.dir,
      t.orders.select(col("o_orderkey"), col("o_custkey"))
        .join(t.lineitem.select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"),
          (col("l_suppkey") * 2 + 1).as("s"))
        .localCheckpoint())

  private def rankOutput(ranks: DataFrame, rankCol: String): DataFrame =
    ranks.select(col("node_id"),
      when(pmod(col("node_id"), lit(2L)) === 0, lit("customer"))
        .otherwise(lit("supplier")).as("kind"),
      shiftright(col("node_id"), 1).as("entity_id"),
      col("pr_rank").as(rankCol))

  def q100PageRank(spark: SparkSession, dir: String): DataFrame =
    rankOutput(
      pageRank(tradePairs(Tables(spark, dir)), Iterations, Scale),
      "pr_rank")

  /** The loop. `pairs` is one row per undirected edge (c, s); both
    * orientations are emitted internally and duplicate (src, dst)
    * pairs are collapsed during the adjacency build (callers need no
    * upstream `distinct` — one less full shuffle). Returns
    * (node_id, pr_rank) for every node appearing in an edge.
    *
    * Representation: an ADJACENCY LIST `RDD[(Long, Array[Long])]`,
    * hash-partitioned by src and persisted — degree is the array
    * length, so nothing else rides the loop. Per round the rank
    * exchange is `zipPartitions` against the co-partitioned rank RDD
    * with primitive `LongMap` accumulation (no cogroup, no per-edge
    * tuple boxing; the first version's RDD `join` cost ~0.9s/round on
    * 1.2M directed edges — this form is ~100× less allocation). The
    * per-partition accumulator pre-combines contributions, so the
    * round's ONE shuffle (reduceByKey) moves at most
    * |nodes|·|partitions| longs, never |edges|.
    *
    * @param partitions loop width override for tests; production
    *   sizes it from the edge count (~2M edges/partition).
    */
  def pageRank(pairs: DataFrame, iterations: Int, scale: Long,
      partitions: Option[Int] = None): DataFrame =
    run(pairs, iterations, scale, partitions, seeds = None)

  /** Personalized PageRank: identical recurrence, but the teleport
    * mass lands ONLY on `seeds` (first column = node id) and the
    * initial rank is `scale` for seeds, 0 elsewhere — rank measures
    * proximity to the seed set instead of global importance (the
    * seed-weighted crawl/citation scoring a curation pipeline uses to
    * upweight documents near a trusted set). Seeds without any edge
    * do not appear in the output (rank is defined over the graph's
    * nodes, exactly like the oracle's `deg` table).
    */
  def personalizedPageRank(pairs: DataFrame, seeds: DataFrame,
      iterations: Int, scale: Long,
      partitions: Option[Int] = None): DataFrame =
    run(pairs, iterations, scale, partitions, Some(seeds))

  /** Weighted PageRank under MULTI-EDGE semantics: `pairs` may repeat
    * an edge, degree is total multiplicity, and an edge of weight w
    * carries w·(rank div degree) per round — integer-exact, so the
    * oracle (SUM(w · (r // d)) over a grouped-weight edge table)
    * matches bit-for-bit. This is the natural weighting for
    * interaction graphs where the weight IS a repetition count
    * (trades, co-occurrences, link multiplicity). Each duplicate
    * occupies one adjacency slot, so weights are assumed bounded
    * (here: lineitems per (customer, supplier) pair, ≤ ~30); a
    * huge-weight corpus would want a (dst, w)-packed adjacency
    * instead — same recurrence, different representation.
    */
  def weightedPageRank(pairs: DataFrame, iterations: Int, scale: Long,
      partitions: Option[Int] = None): DataFrame =
    run(pairs, iterations, scale, partitions, seeds = None, multi = true)

  /** Adjacency-list build shared by the PageRank and HITS kernels:
    * partition the edge list by src once, then per-partition group
    * into (src, sorted Array[dst]) — all (src, *) rows land in one
    * partition, so per-partition dedup is global dedup and callers
    * need no upstream `distinct` (one less full shuffle). With
    * `dedup = false` parallel edges are KEPT: degree becomes the
    * total multiplicity and each duplicate slot carries one unit of
    * contribution — multi-edge (weighted) graph semantics.
    */
  private def buildAdjacency(edges: RDD[(Long, Long)],
      part: HashPartitioner,
      dedup: Boolean = true): RDD[(Long, Array[Long])] =
    edges.partitionBy(part)
      .mapPartitions({ it =>
        val m = collection.mutable.LongMap
          .empty[collection.mutable.ArrayBuilder.ofLong]
        it.foreach { case (src, dst) =>
          m.getOrElseUpdate(src, new collection.mutable.ArrayBuilder.ofLong) += dst
        }
        m.iterator.map { case (src, b) =>
          val a = b.result()
          java.util.Arrays.sort(a)
          if (!dedup) (src, a)
          else {
            var n = 0
            var j = 0
            while (j < a.length) { // in-place dedup of the sorted run
              if (n == 0 || a(j) != a(n - 1)) { a(n) = a(j); n += 1 }
              j += 1
            }
            (src, java.util.Arrays.copyOf(a, n))
          }
        }
      }, preservesPartitioning = true)

  private def run(pairs: DataFrame, iterations: Int, scale: Long,
      partitions: Option[Int], seeds: Option[DataFrame],
      multi: Boolean = false): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val raw: RDD[(Long, Long)] = pairs
      .select(col(pairs.columns(0)).cast("long"),
        col(pairs.columns(1)).cast("long")).rdd
      .map(r => (r.getLong(0), r.getLong(1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = raw.count() // also materializes the cache the
    // adjacency build reads — the upstream join runs ONCE, not twice
    if (nEdges == 0) {
      raw.unpersist(false)
      return Seq.empty[(Long, Long)].toDF("node_id", "pr_rank")
    }
    val loopParts = partitions.getOrElse(
      math.max(1L, 2L * nEdges / 2000000L).toInt)
    val part = new HashPartitioner(loopParts)
    // adjacency: both orientations, partitioned by src once
    //
    // Object-form cache, NOT _SER: Java-serialized adjacency cost
    // ~3x per-round deserialization at 60M edges (19s vs 16s loops,
    // 6.3s vs 2.2s at sf0.1), and the memory hazard SER would hedge
    // — two multi-GB copies coexisting across back-to-back runs,
    // measured 43s GC-thrash — is retired structurally by the
    // eager checkpoint + unpersist at the end of this method.
    val adj: RDD[(Long, Array[Long])] = buildAdjacency(
      raw.flatMap { case (c, s) => Iterator((c, s), (s, c)) }, part,
      dedup = !multi)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nNodes = adj.count() // materialize NOW, while raw is still
    // cached; then raw can go. adj itself must stay persisted for the
    // (lazy) returned frame's action — the original version
    // unpersisted before the action and silently recomputed the whole
    // edge lineage every round; the ContextCleaner reclaims adj once
    // the result frame is dropped.
    raw.unpersist(false)
    // the documented overflow bound, enforced: a node's contribution
    // sum is < N·scale, and the update multiplies it by 85 — a graph
    // past the bound must pass a smaller scale (silent Long wrap
    // would produce plausible-looking garbage ranks)
    require(nNodes < Long.MaxValue / 85L / scale,
      s"85*scale*nNodes overflows Long for nNodes=$nNodes at " +
        s"scale=$scale — pass a smaller scale (bound: 85*S*N < 2^63)")
    val teleport = (15L * scale) / 100L
    require(seeds.isEmpty || teleport > 0L,
      s"scale=$scale gives an all-zero teleport (15*scale/100 == 0); " +
        "personalized ranks would be identically zero")
    // per-node seed flag (1 = seed), co-partitioned with adj: the
    // teleport base and the initial mass BOTH derive from it, so seed
    // membership is never inferred from a derived value (a
    // teleport-of-zero must not erase the seeds' initial mass). For
    // global PageRank the flag is the constant 1. PERSISTED in both
    // branches — it is one long per node, and deriving it from adj
    // lazily would deserialize the whole adjacency a second time per
    // round inside the rank rebuild (measured ~2s/pass at 60M edges).
    val seedFlag: RDD[(Long, Long)] = (seeds match {
      case None => adj.mapValues(_ => 1L)
      case Some(sd) =>
        val seedIds = sd
          .select(col(sd.columns(0)).cast("long")).rdd
          .map(r => (r.getLong(0), ()))
          .partitionBy(part)
        adj.zipPartitions(seedIds, preservesPartitioning = true) {
          (ai, si) =>
            val ss = collection.mutable.LongMap.empty[Unit]
            si.foreach { case (k, _) => ss(k) = () }
            ai.map { case (src, _) =>
              (src, if (ss.contains(src)) 1L else 0L) }
        }
    }).persist(StorageLevel.MEMORY_AND_DISK)
    // persisted but lazily materialized by round 1's exchange (the
    // eager foreachPartition job bought nothing — r14); the persist is
    // what matters, so later rounds read blocks instead of re-deriving
    // through the adjacency
    var ranks: RDD[(Long, Long)] = seedFlag.mapValues(_ * scale)
    var i = 0
    // Width-1 loops claim the partitioner (r15): with ONE partition
    // every dst key provably lives in it, so the claim is exact and
    // reduceByKey runs narrow — the whole fixed-round loop collapses
    // into a single shuffle-free stage (5 exchange walls gone). At any
    // width > 1 the claim would be WRONG — the emitted keys are dst,
    // which live in OTHER partitions; claiming the src partitioner
    // would make reduceByKey skip the shuffle and strand every
    // cross-partition contribution (caught by the spec's
    // partitioner-width invariance test) — so it stays off.
    val widthOne = loopParts == 1
    while (i < iterations) {
      val contribs = adj
        .zipPartitions(ranks, preservesPartitioning = widthOne) { (ai, ri) =>
          val rank = collection.mutable.LongMap.empty[Long]
          ri.foreach { case (k, v) => rank(k) = v }
          val acc = collection.mutable.LongMap.empty[Long]
          ai.foreach { case (src, dsts) =>
            val c = rank.getOrElse(src, 0L) / dsts.length
            var j = 0
            while (j < dsts.length) {
              val d = dsts(j)
              acc(d) = acc.getOrElse(d, 0L) + c
              j += 1
            }
          }
          acc.iterator
        }
        .reduceByKey(part, _ + _) // the round's ONE shuffle
      ranks = seedFlag // narrow: rebuild the full node set with defaults
        .zipPartitions(contribs, preservesPartitioning = true) { (fi, ci) =>
          val cm = collection.mutable.LongMap.empty[Long]
          ci.foreach { case (k, v) => cm(k) = v }
          fi.map { case (src, flag) =>
            (src, flag * teleport + (85L * cm.getOrElse(src, 0L)) / 100L) }
        }
      i += 1
    }
    // Materialize the final ranks (one long per node) and truncate
    // their lineage, so the multi-GB adjacency can be released NOW
    // instead of lingering until the ContextCleaner notices — two
    // coexisting cached adjacencies measurably GC-thrashed
    // back-to-back sf10 runs (16s → 43s for the identical job). The
    // kernel is eager as a result, which an iterative loop would
    // effectively be at first action anyway.
    ranks.localCheckpoint()
    ranks.count()
    adj.unpersist(false)
    seedFlag.unpersist(false)
    ranks.toDF()
      .select(col("_1").as("node_id"), col("_2").as("pr_rank"))
  }

  /** The CTE prefix both SQL twins share — the same trade graph as
    * `tradePairs` plus edges/deg (`//` is DuckDB's truncating integer
    * division; all values are positive so it agrees with Scala's `/`
    * on Long).
    */
  private val graphCtes: String =
    """pairs AS (
      |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |edges AS (SELECT c AS src, s AS dst FROM pairs
      |          UNION ALL SELECT s AS src, c AS dst FROM pairs),
      |deg AS (SELECT src AS id, COUNT(*)::BIGINT AS d FROM edges GROUP BY 1)"""
      .stripMargin

  /** The unrolled rounds all PageRank SQL twins share: `teleSql` is
    * the SQL expression for the node's teleport term (a constant for
    * q100, a seed-masked CASE for q101 — `deg LEFT JOIN seeds sd` is
    * in scope when `seedJoin` is set); `contribSql` is one edge's
    * contribution (`p.r // d.d` unweighted, `e.w * (p.r // d.d)` for
    * the multi-edge weighted variant).
    */
  private def roundCtes(teleSql: String, seedJoin: Boolean,
      contribSql: String = "p.r // d.d"): String =
    (1 to Iterations).map { k =>
      val sj = if (seedJoin) " LEFT JOIN seeds sd ON deg.id = sd.id" else ""
      s"""r$k AS (SELECT deg.id,
         |  (($teleSql) + (85 * COALESCE(m.s, 0)) // 100)::BIGINT AS r
         |  FROM deg$sj LEFT JOIN (
         |    SELECT e.dst AS id, SUM($contribSql)::BIGINT AS s
         |    FROM edges e JOIN deg d ON e.src = d.id
         |    JOIN r${k - 1} p ON e.src = p.id
         |    GROUP BY e.dst) m ON deg.id = m.id)"""
        .stripMargin
    }.mkString(",\n")

  private def rankOutputSql(rankCol: String): String =
    s"""SELECT id AS node_id,
       |  CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       |  id // 2 AS entity_id, r AS $rankCol
       |FROM r${Iterations}""".stripMargin

  /** DuckDB twin of q100: the same five rounds unrolled as CTEs, same
    * integer recurrence.
    */
  val q100Sql: String = {
    val teleport = (15L * Scale) / 100L
    s"""WITH $graphCtes,
       |r0 AS (SELECT id, ${Scale}::BIGINT AS r FROM deg),
       |${roundCtes(teleport.toString, seedJoin = false)}
       |${rankOutputSql("pr_rank")}""".stripMargin
  }

  /** q101: personalized PageRank from the BUILDING-segment customers
    * — "how close is each trading party to the BUILDING market" as a
    * seed-relative importance score. Same graph, same fixed-point
    * arithmetic; only the teleport vector changes.
    */
  def q101SegmentPpr(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val seeds = t.customer
      .filter(col("c_mktsegment") === "BUILDING")
      .select((col("c_custkey") * 2).as("node_id"))
    rankOutput(
      personalizedPageRank(tradePairs(t), seeds, Iterations, Scale),
      "ppr_rank")
  }

  /** DuckDB twin of q101: q100's unrolled CTEs with the teleport and
    * initial mass masked to the seed set.
    */
  val q101Sql: String = {
    val teleport = (15L * Scale) / 100L
    s"""WITH $graphCtes,
       |seeds AS (SELECT c_custkey * 2 AS id FROM customer
       |          WHERE c_mktsegment = 'BUILDING'),
       |r0 AS (SELECT deg.id,
       |  (CASE WHEN sd.id IS NOT NULL THEN ${Scale} ELSE 0 END)::BIGINT AS r
       |  FROM deg LEFT JOIN seeds sd ON deg.id = sd.id),
       |${roundCtes(
            s"CASE WHEN sd.id IS NOT NULL THEN $teleport ELSE 0 END",
            seedJoin = true)}
       |${rankOutputSql("ppr_rank")}""".stripMargin
  }

  /** q103: weighted PageRank — the same trade graph, but every
    * lineitem counts: a (customer, supplier) pair that trades 30
    * line items pulls 30× the rank of a one-line relationship
    * (multi-edge semantics; see [[weightedPageRank]]). `tradePairs`
    * is already one row per order⋈lineitem match, so the weighted
    * kernel consumes it as-is — the unweighted q100 is the one that
    * collapses it.
    */
  def q103WeightedPageRank(spark: SparkSession, dir: String): DataFrame =
    rankOutput(
      weightedPageRank(tradePairs(Tables(spark, dir)), Iterations, Scale),
      "wpr_rank")

  /** DuckDB twin of q103: grouped-weight edge table, degree = total
    * multiplicity, contribution = w · (r // d) per edge group.
    */
  val q103Sql: String = {
    val teleport = (15L * Scale) / 100L
    s"""WITH wpairs AS (
       |  SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s,
       |         COUNT(*)::BIGINT AS w
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2),
       |edges AS (SELECT c AS src, s AS dst, w FROM wpairs
       |          UNION ALL SELECT s AS src, c AS dst, w FROM wpairs),
       |deg AS (SELECT src AS id, SUM(w)::BIGINT AS d FROM edges GROUP BY 1),
       |r0 AS (SELECT id, ${Scale}::BIGINT AS r FROM deg),
       |${roundCtes(teleport.toString, seedJoin = false,
            contribSql = "e.w * (p.r // d.d)")}
       |${rankOutputSql("wpr_rank")}""".stripMargin
  }

  // ------------------------------------------------------------------
  // q102: HITS hubs & authorities
  // ------------------------------------------------------------------

  /** Fixed-point scale for HITS. Smaller than PageRank's 1e12 because
    * the normalization multiplies a raw sum (≤ maxDegree·S) by S
    * before dividing: the per-round overflow bound is
    * `maxRawSum · S < 2^63`, i.e. maxDegree · S² < 2^63 — S=1e6 is
    * safe to ~9×10^6 max degree (enforced per round, never silent).
    */
  val HitsScale: Long = 1000000L

  /** q102: HITS hubs/authorities over the DIRECTED bipartite trade
    * graph (customer → supplier). Five rounds of the mutual
    * recurrence — auth(s) = Σ_{c→s} hub(c), hub(c) = Σ_{c→s} auth(s)
    * — each half-round L∞-normalized (divide by the max, truncating):
    * the max is order-independent and integer division is exact, so
    * the DuckDB twin (the same rounds unrolled as CTEs with scalar
    * MAX subqueries) matches bit-for-bit. Hub scores weight "good
    * aggregators" (customers whose suppliers are widely demanded) and
    * authority scores "widely demanded sources" — the classic
    * crawl-graph quality-weighting pair a curation pipeline uses
    * alongside PageRank to pick seed documents and demote spam.
    */
  def q102Hits(spark: SparkSession, dir: String): DataFrame =
    hits(tradePairs(Tables(spark, dir)), Iterations, HitsScale)
      .select(col("node_id"),
        when(pmod(col("node_id"), lit(2L)) === 0, lit("customer"))
          .otherwise(lit("supplier")).as("kind"),
        shiftright(col("node_id"), 1).as("entity_id"),
        col("hub_rank"), col("auth_rank"))

  /** The HITS loop on an arbitrary directed edge list (general
    * digraph — a node may carry both scores; on the bipartite trade
    * graph each carries one and the other is 0). Returns
    * (node_id, hub_rank, auth_rank) for every node with an edge.
    *
    * Same execution scheme as [[pageRank]]: two persisted adjacency
    * lists (forward by src, reverse by dst — the SAME partitioner, so
    * the final hub⋈auth outer join is narrow), zipPartitions exchange
    * with LongMap pre-combination, one reduceByKey shuffle per
    * half-round. The L∞ normalization needs the round's max — one
    * tiny `values.max` action per half-round over a persisted
    * one-long-per-node RDD, which also materializes it (the kernel is
    * eager like pageRank; all caches are released before returning).
    */
  def hits(pairs: DataFrame, iterations: Int, scale: Long,
      partitions: Option[Int] = None): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    require(scale > 0L, s"scale must be positive, got $scale")
    require(iterations > 0, s"iterations must be positive, got $iterations")
    // every round's max raw sum is ≥ scale (the previous max holder
    // sends `scale` somewhere), so scale² ≥ 2^63 overflows UNCONDITIONALLY
    // — reject on the driver; the data-dependent bound is re-checked per
    // round (from the task on the width-1 path, where the partition max
    // is the global max and normalization folds into the stage)
    require(scale <= Long.MaxValue / scale,
      s"HITS normalization overflows Long at any input: scale=$scale has " +
        "scale*scale >= 2^63 (bound: maxRawSum*scale < 2^63, and " +
        "maxRawSum >= scale by induction) — pass a smaller scale")
    val raw: RDD[(Long, Long)] = pairs
      .select(col(pairs.columns(0)).cast("long"),
        col(pairs.columns(1)).cast("long")).rdd
      .map(r => (r.getLong(0), r.getLong(1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = raw.count()
    if (nEdges == 0) {
      raw.unpersist(false)
      return Seq.empty[(Long, Long, Long)]
        .toDF("node_id", "hub_rank", "auth_rank")
    }
    val loopParts = partitions.getOrElse(
      math.max(1L, 2L * nEdges / 2000000L).toInt)
    val part = new HashPartitioner(loopParts)
    val fwd = buildAdjacency(raw, part).persist(StorageLevel.MEMORY_AND_DISK)
    val rev = buildAdjacency(raw.map(_.swap), part)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the two adjacency materializations are independent — overlap them
    // (guide §2.6) instead of paying two serial job walls
    locally {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      Seq(Future(fwd.count()), Future(rev.count()))
        .foreach(Await.result(_, Duration.Inf))
    }
    raw.unpersist(false)
    val retired = collection.mutable.ArrayBuffer.empty[RDD[_]]

    // one half-round: sum the sender scores into each receiver via the
    // sender-side adjacency; emission is structural (a receiver gets an
    // entry whenever an edge points at it, even for a zero sum), so the
    // node set never shrinks across rounds. Width-1 loops claim the
    // partitioner (exact with one partition — see the pageRank loop's
    // comment), so reduceByKey runs narrow and the whole loop chains
    // into one shuffle-free stage.
    val widthOne = part.numPartitions == 1
    def exchange(adj: RDD[(Long, Array[Long])],
        scores: RDD[(Long, Long)]): RDD[(Long, Long)] =
      adj.zipPartitions(scores, preservesPartitioning = widthOne) { (ai, si) =>
        val score = collection.mutable.LongMap.empty[Long]
        si.foreach { case (k, v) => score(k) = v }
        val acc = collection.mutable.LongMap.empty[Long]
        ai.foreach { case (src, dsts) =>
          val r = score.getOrElse(src, 0L)
          var j = 0
          while (j < dsts.length) {
            val d = dsts(j)
            acc(d) = acc.getOrElse(d, 0L) + r
            j += 1
          }
        }
        acc.iterator
      }.reduceByKey(part, _ + _) // the half-round's ONE shuffle

    // L∞ normalization: rescale so the max is exactly `scale`. The max
    // element is ≥ scale·1 > 0 by induction (the previous round's max
    // holder sends `scale` somewhere), so the division is always
    // defined.
    //
    // Width 1 (r15): the partition max IS the global max, so the
    // rescale folds INTO the stage as a two-pass max-then-scale over
    // the buffered partition — no driver action, no persist; ten
    // max() job walls per run disappear and the full ten-half-round
    // loop lazily chains into the final count's single stage. The
    // overflow guard throws from the task instead of the driver —
    // same abort, different wrapper.
    //
    // Width > 1: persist the raw sums, take the max (the action that
    // materializes them), rescale — a global max across partitions
    // needs a driver combine, and one tiny action per half-round over
    // a persisted one-long-per-node RDD is the cheapest correct form.
    def normalized(rawScores: RDD[(Long, Long)]): RDD[(Long, Long)] =
      if (widthOne) {
        rawScores.mapPartitions({ it =>
          val buf = it.toArray
          if (buf.isEmpty) Iterator.empty
          else {
            var mx = Long.MinValue
            buf.foreach { kv => if (kv._2 > mx) mx = kv._2 }
            require(mx <= Long.MaxValue / scale,
              s"HITS normalization overflows Long: round max $mx at " +
                s"scale=$scale (bound: maxRawSum*scale < 2^63) — " +
                "pass a smaller scale")
            val m = mx
            buf.iterator.map { case (k, v) => (k, v * scale / m) }
          }
        }, preservesPartitioning = true)
      } else {
        rawScores.persist(StorageLevel.MEMORY_AND_DISK)
        retired += rawScores
        val mx = rawScores.values.max()
        require(mx <= Long.MaxValue / scale,
          s"HITS normalization overflows Long: round max $mx at " +
            s"scale=$scale (bound: maxRawSum*scale < 2^63) — " +
            "pass a smaller scale")
        rawScores.mapValues(v => v * scale / mx)
      }

    // persisted but NOT eagerly materialized: the first half-round's
    // exchange computes it once (a dedicated foreachPartition job here
    // bought nothing — r14)
    var hub: RDD[(Long, Long)] = fwd.mapValues(_ => scale)
      .persist(StorageLevel.MEMORY_AND_DISK)
    retired += hub
    var auth: RDD[(Long, Long)] = null
    var i = 0
    while (i < iterations) {
      auth = normalized(exchange(fwd, hub))
      if (widthOne && i == iterations - 1) {
        // the LAST auth is read twice (the final hub exchange and the
        // output join); the width>1 path persists every half-round's
        // raw sums via normalized(), the lazy width-1 chain must pin
        // this one double-consumed node itself or the whole chain
        // re-evaluates once more
        auth.persist(StorageLevel.MEMORY_AND_DISK)
        retired += auth
      }
      hub = normalized(exchange(rev, auth))
      i += 1
    }
    // both sides carry `part`, so the outer join is narrow
    val out = hub.fullOuterJoin(auth, part)
      .map { case (id, (h, a)) => (id, h.getOrElse(0L), a.getOrElse(0L)) }
    out.localCheckpoint()
    out.count()
    fwd.unpersist(false)
    rev.unpersist(false)
    retired.foreach(_.unpersist(false))
    out.toDF()
      .select(col("_1").as("node_id"), col("_2").as("hub_rank"),
        col("_3").as("auth_rank"))
  }

  /** DuckDB twin of q102: the same five rounds unrolled, each
    * half-round normalized with `MAX(..) OVER ()` (a whole-frame
    * window, NOT a scalar subquery — a subquery would reference each
    * round's CTE twice, and an engine that inlines CTEs re-evaluates
    * the whole chain per reference: 2^rounds blowup, measured as a
    * 15-minute oracle before the rewrite; the window form keeps every
    * CTE single-referenced, a linear chain) and `//` truncating
    * division — bit-exact against the kernel.
    */
  val q102Sql: String = {
    val s = HitsScale
    val rounds = (1 to Iterations).map { k =>
      s"""a$k AS (
         |  SELECT p.s AS id, (SUM(h.r) * $s //
         |    MAX(SUM(h.r)) OVER ())::BIGINT AS r
         |  FROM pairs p JOIN h${k - 1} h ON p.c = h.id GROUP BY p.s),
         |h$k AS (
         |  SELECT p.c AS id, (SUM(a.r) * $s //
         |    MAX(SUM(a.r)) OVER ())::BIGINT AS r
         |  FROM pairs p JOIN a$k a ON p.s = a.id GROUP BY p.c)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |h0 AS (SELECT DISTINCT c AS id, ${s}::BIGINT AS r FROM pairs),
       |$rounds
       |SELECT id AS node_id, 'customer' AS kind, id // 2 AS entity_id,
       |       r AS hub_rank, 0::BIGINT AS auth_rank FROM h${Iterations}
       |UNION ALL
       |SELECT id, 'supplier', id // 2, 0::BIGINT, r FROM a${Iterations}"""
      .stripMargin
  }

  // ------------------------------------------------------------------
  // q106: semi-supervised label propagation
  // ------------------------------------------------------------------

  /** Rounds for label propagation. Three is where this bipartite
    * seeding stabilizes: round 1 labels the far side from the seeds,
    * round 2 labels the unseeded near side, round 3 re-votes the far
    * side now that BOTH sides vote (the first round whose electorate
    * is the full labeled graph).
    */
  val LpIterations: Int = 3

  /** Synchronous weighted label propagation (Raghavan et al. 2007's
    * LPA made deterministic): seed nodes carry fixed labels; each
    * round every node re-takes the label with the LARGEST total edge
    * weight among its labeled neighbors' previous-round labels, ties
    * to the SMALLEST label id, seeds clamped. Non-seed labels are
    * re-derived every round (not sticky), so round k is a pure
    * function of round k-1 — which is what lets the oracle unroll the
    * rounds as single-reference CTEs and hash-match bit-for-bit (all
    * arithmetic is integer vote sums; no convergence test, fixed
    * round count, same reasons as PageRank's).
    *
    * This is the label-spreading pass a web-corpus curation pipeline
    * runs to extend a small trusted/spam/domain-topic seed annotation
    * over the hyperlink (or co-occurrence) graph — the graph-side
    * complement of the per-document quality filters: a page earns its
    * neighbors' label before any of its own content is scored.
    *
    * Execution is the PageRank scheme on the shared adjacency build
    * (multi-edge: parallel slots ARE the vote weights): per round one
    * zipPartitions vote emission accumulates each receiver's votes as
    * a DENSE 32-slot long array keyed by receiver — labels must fit
    * the 32-label domain, checked against the seed range — so the
    * round's ONE shuffle (reduceByKey on the node partitioner,
    * element-wise array merge) moves |nodes| compact primitive-array
    * records, not |nodes|·|labels| rows, and the argmax is a
    * `mapValues` scan of 32 slots that keeps the partitioner — the
    * seed-clamp merge with the co-partitioned seed RDD is narrow.
    * Nothing edge-sized ever crosses the wire after the adjacency
    * build. (The first version shuffled per-(node, label) packed
    * keys plus a second reduceByKey of boxed (weight, label) tuples —
    * the dense-vector form replaced ~25 hashed map probes per
    * receiver with one array index and cut the shuffled record count
    * 25×.)
    *
    * Returns (node_id, label) for every labeled node after
    * `iterations` rounds (seeds always included, even edge-less ones;
    * unreachable non-seeds stay absent).
    */
  def labelPropagate(pairs: DataFrame, seeds: DataFrame, iterations: Int,
      partitions: Option[Int] = None): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    require(iterations > 0, s"iterations must be positive, got $iterations")
    val raw: RDD[(Long, Long)] = pairs
      .select(col(pairs.columns(0)).cast("long"),
        col(pairs.columns(1)).cast("long")).rdd
      .map(r => (r.getLong(0), r.getLong(1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = raw.count()
    val seedPairs: RDD[(Long, Long)] = seeds
      .select(col(seeds.columns(0)).cast("long"),
        col(seeds.columns(1)).cast("long")).rdd
      .map(r => (r.getLong(0), r.getLong(1)))
    if (nEdges == 0) {
      raw.unpersist(false)
      // no edges: nothing propagates; the seeds are the fixed point
      return seedPairs.toDF().select(col("_1").as("node_id"),
        col("_2").as("label"))
    }
    val loopParts = partitions.getOrElse(
      math.max(1L, 2L * nEdges / 2000000L).toInt)
    val part = new HashPartitioner(loopParts)
    val adj = buildAdjacency(
      raw.flatMap { case (c, s) => Iterator((c, s), (s, c)) }, part,
      dedup = false) // parallel slots = vote weights
      .persist(StorageLevel.MEMORY_AND_DISK)
    adj.count()
    raw.unpersist(false)
    val seedsRdd = seedPairs.partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nSeeds = seedsRdd.count()
    if (nSeeds == 0) {
      adj.unpersist(false)
      seedsRdd.unpersist(false)
      return Seq.empty[(Long, Long)].toDF("node_id", "label")
    }
    // each receiver's votes live in a dense 32-slot array — one array
    // index per vote instead of a hashed probe into a |nodes|·|labels|
    // keyspace, and 25× fewer (and primitive-compact) shuffle records
    val (labMin, labMax) = seedsRdd.values
      .aggregate((Long.MaxValue, Long.MinValue))(
        (a, v) => (math.min(a._1, v), math.max(a._2, v)),
        (a, b) => (math.min(a._1, b._1), math.max(a._2, b._2)))
    require(labMin >= 0L && labMax < 32L,
      s"labels must be in [0, 32) to index the dense vote vector, got " +
        s"[$labMin, $labMax] — remap labels to a dense small domain first")
    var labels: RDD[(Long, Long)] = seedsRdd
    var i = 0
    // width-1 loops claim the partitioner (exact with one partition —
    // see the pageRank loop's comment): the vote reduceByKey runs
    // narrow and the fixed rounds chain into one shuffle-free stage
    val widthOne = loopParts == 1
    while (i < iterations) {
      val votes = adj.zipPartitions(labels,
          preservesPartitioning = widthOne) { (ai, li) =>
        val lab = collection.mutable.LongMap.empty[Long]
        li.foreach { case (k, v) => lab(k) = v }
        val acc = collection.mutable.LongMap.empty[Array[Long]]
        ai.foreach { case (src, dsts) =>
          val l = lab.getOrElse(src, -1L).toInt
          if (l >= 0) {
            var j = 0
            while (j < dsts.length) {
              val arr = acc.getOrElseUpdate(dsts(j), new Array[Long](32))
              arr(l) += 1L
              j += 1
            }
          }
        }
        acc.iterator
      }.reduceByKey(part, { (a, b) => // the round's ONE shuffle
        var k = 0
        while (k < 32) { a(k) += b(k); k += 1 }
        a
      })
      // argmax over 32 slots; ascending scan with strict > breaks ties
      // to the smaller label id. mapValues keeps `part`, so the clamp
      // below is narrow. Every emitted record holds ≥ 1 vote, so the
      // argmax is always defined.
      val best = votes.mapValues { arr =>
        var bl = 0
        var bw = arr(0)
        var k = 1
        while (k < 32) {
          if (arr(k) > bw) { bw = arr(k); bl = k }
          k += 1
        }
        bl.toLong
      }
      // seed clamp, narrow: both sides carry `part`
      labels = seedsRdd.zipPartitions(best,
        preservesPartitioning = true) { (si, bi) =>
        val seed = collection.mutable.LongMap.empty[Long]
        si.foreach { case (k, v) => seed(k) = v }
        bi.collect { case (k, l) if !seed.contains(k) => (k, l) } ++
          seed.iterator
      }
      i += 1
    }
    labels.localCheckpoint()
    labels.count()
    adj.unpersist(false)
    seedsRdd.unpersist(false)
    labels.toDF().select(col("_1").as("node_id"), col("_2").as("label"))
  }

  /** q106: propagate customer NATION labels over the trade graph —
    * seed = high-balance customers (c_acctbal > 5000, ~45% of them),
    * label = their nation; three weighted rounds (every lineitem is
    * one vote) assign each supplier, and then each unseeded customer,
    * to the nation whose trade volume dominates its neighborhood.
    * Output: node counts and entity-id range per (kind, label).
    */
  def q106LabelProp(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val seeds = t.customer.filter(col("c_acctbal") > 5000.0d)
      .select((col("c_custkey") * 2).as("node_id"),
        col("c_nationkey").cast("long").as("label"))
    labelPropagate(tradePairs(t), seeds, LpIterations)
      .select(
        when(pmod(col("node_id"), lit(2L)) === 0, lit("customer"))
          .otherwise(lit("supplier")).as("kind"),
        col("label"), shiftright(col("node_id"), 1).as("entity_id"))
      .groupBy("kind", "label")
      .agg(count(lit(1)).as("n_nodes"),
        min("entity_id").as("min_entity"), max("entity_id").as("max_entity"))
      .orderBy("kind", "label")
  }

  /** DuckDB twin of q106: the same three rounds unrolled. Each round
    * references the previous round's CTE exactly ONCE (the vote join)
    * — the non-sticky semantics is what makes that possible; a
    * keep-previous fallback would reference it twice and an
    * inlining engine re-evaluates the chain exponentially (the q102
    * lesson). `seeds` is re-referenced per round, but it is a plain
    * base-table filter — re-inlining it is a constant-cost scan.
    */
  val q106Sql: String = {
    val rounds = (1 to LpIterations).map { k =>
      s"""v$k AS (
         |  SELECT e.dst AS id, p.lab, SUM(e.w) AS wsum,
         |    ROW_NUMBER() OVER (PARTITION BY e.dst
         |      ORDER BY SUM(e.w) DESC, p.lab) AS rn
         |  FROM edges e JOIN l${k - 1} p ON e.src = p.id
         |  GROUP BY e.dst, p.lab),
         |l$k AS (
         |  SELECT id, lab FROM seeds
         |  UNION ALL
         |  SELECT v.id, v.lab FROM v$k v
         |  WHERE v.rn = 1
         |    AND NOT EXISTS (SELECT 1 FROM seeds s WHERE s.id = v.id))"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH epairs AS (
       |  SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s,
       |         COUNT(*)::BIGINT AS w
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2),
       |edges AS (SELECT c AS src, s AS dst, w FROM epairs
       |          UNION ALL SELECT s AS src, c AS dst, w FROM epairs),
       |seeds AS (SELECT c_custkey * 2 AS id, c_nationkey::BIGINT AS lab
       |          FROM customer WHERE c_acctbal > 5000),
       |l0 AS (SELECT id, lab FROM seeds),
       |$rounds
       |SELECT CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       |  lab AS label, COUNT(*) AS n_nodes,
       |  MIN(id // 2)::BIGINT AS min_entity, MAX(id // 2)::BIGINT AS max_entity
       |FROM l${LpIterations} GROUP BY 1, 2 ORDER BY kind, label""".stripMargin
  }

  // ------------------------------------------------------------------
  // q113: TextRank keyword extraction
  // ------------------------------------------------------------------

  /** q113: TextRank (Mihalcea & Tarau 2004) — keyword extraction as
    * PageRank over the word CO-OCCURRENCE graph, the composition of
    * q110's pair derivation with q103's weighted kernel: content
    * words (length ≥ 4, the cheap stopword surrogate) co-occurring
    * within a ±2 window are edges, multiplicity IS the edge weight,
    * and five damped fixed-point rounds rank every vocabulary word by
    * how central it is to the corpus's co-occurrence structure. The
    * top-30 are the corpus keywords — the keyphrase signal a curation
    * pipeline extracts per document/domain for topic balancing and
    * indexing. Node ids are md5Long60(word) in BOTH engines, so the
    * oracle (the same derivation + q103's unrolled weighted rounds)
    * matches bit-for-bit.
    *
    * Scale shape: pair derivation is ROW-LOCAL (flatten over the
    * materialized token array — no exploded self-join); the kernel's
    * adjacency build groups occurrences into multi-edge slots with
    * one partitionBy, and each round shuffles only pre-combined
    * contributions (|vocab| rows — vocabulary grows by Heaps' law,
    * ~√corpus, so the loop state at 100 TB input is GBs, not TBs).
    * The rank→word resolution joins on the unique node id; the
    * top-30 is a TakeOrderedAndProject.
    */
  def q113Textrank(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.{coocPairs, md5Long60, tokensMinLen}
    val t = Tables(spark, dir)
    // native tokens with the length>=4 filter fused (r15) — the HOF
    // filter paid one interpreted lambda frame per token
    val toks = t.documents.select(tokensMinLen(col("text"), 4).as("tk"))
    val tk = col("tk")
    // native windowed-pair derivation over the length≥4 content words
    // (graft_cooc_pairs: ordered pairs, self-loops dropped) — replaces
    // the per-(position, offset) interpreted lambda (r14)
    val prsCol = coocPairs(col("text"), 2, 4, canonical = false,
      dropSelf = true)
    // hash the occurrences DIRECTLY (r15 reversal of the r14 hash-the-
    // vocabulary shape): with the native thread-local md5 a digest is
    // ~100ns, so 2 digests per pair row are far cheaper than the two
    // broadcast dictionary joins (and their vocab checkpoint) that the
    // r14 shape paid to avoid them when md5 still went through the
    // hex-string detour. Every pair word is length>=4 by construction,
    // so the dropped inner joins never filtered anything — identical
    // pair multiset, identical node ids.
    val vocab = toks.select(explode(tk).as("word")).distinct()
      .withColumn("node_id", md5Long60(col("word")))
    val occ = t.documents.select(explode(prsCol).as("pr"))
      .select(substring_index(col("pr"), " ", 1).as("w1"),
        substring_index(col("pr"), " ", -1).as("w2"))
    val pairs = occ
      .select(md5Long60(col("w1")).as("a"), md5Long60(col("w2")).as("b"))
    val ranks = weightedPageRank(pairs, Iterations, Scale)
    ranks.join(vocab, Seq("node_id"))
      .select(col("word"), col("pr_rank").as("tr_rank"))
      .orderBy(desc("tr_rank"), asc("word"))
      .limit(30)
  }

  /** DuckDB twin of q113: q110's pair CTE (length-filtered,
    * self-loops dropped) feeding q103's grouped-weight edge table and
    * unrolled weighted rounds, resolved back to words at the end.
    */
  val q113Sql: String = {
    val teleport = (15L * Scale) / 100L
    val h1 = OracleSql.md5Long60("split_part(pr, ' ', 1)")
    val h2 = OracleSql.md5Long60("split_part(pr, ' ', 2)")
    val hw = OracleSql.md5Long60("un.t")
    s"""WITH toks AS (
       |  SELECT list_filter(${OracleSql.tokens("text")}, w -> len(w) >= 4) AS t
       |  FROM documents),
       |occ AS (
       |  SELECT t[i] || ' ' || t[i+d] AS pr
       |  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i),
       |        UNNEST([1, 2]) AS v(d)
       |  WHERE i + d <= len(t) AND t[i] != t[i+d]),
       |wpairs AS (
       |  SELECT $h1 AS c, $h2 AS s, COUNT(*)::BIGINT AS w
       |  FROM occ GROUP BY 1, 2),
       |edges AS (SELECT c AS src, s AS dst, w FROM wpairs
       |          UNION ALL SELECT s AS src, c AS dst, w FROM wpairs),
       |deg AS (SELECT src AS id, SUM(w)::BIGINT AS d FROM edges GROUP BY 1),
       |r0 AS (SELECT id, ${Scale}::BIGINT AS r FROM deg),
       |${roundCtes(teleport.toString, seedJoin = false,
              contribSql = "e.w * (p.r // d.d)")},
       |vocab AS (
       |  SELECT DISTINCT un.t AS word, $hw AS id
       |  FROM toks, UNNEST(toks.t) AS un(t))
       |SELECT v.word, r.r AS tr_rank
       |FROM r${Iterations} r JOIN vocab v USING (id)
       |ORDER BY tr_rank DESC, word LIMIT 30""".stripMargin
  }

  // ------------------------------------------------------------------
  // q120: market-basket co-occurrence (association mining)
  // ------------------------------------------------------------------

  /** q120: market-basket association mining over the trade
    * transactions — "suppliers that serve the same customers more
    * than their popularity predicts", the support+lift shape of
    * Apriori's first pass and of item-item collaborative filtering
    * (and q110's transactional sibling: same integer PMI classes,
    * baskets instead of token windows). Basket = a customer's distinct
    * supplier set (reuses the memoized tradePairs derivation); pairs
    * with support ≥ 5 score `bitlen(n_ab·N) − bitlen(n_a·n_b)` ≈
    * ⌈log2 lift⌉, top-50.
    *
    * Scale shape (r15): baskets materialize as ONE array row per
    * customer (`collect_set` — map-side partial dedup, one corpus
    * shuffle keyed by cust) and the C(k,2) pair expansion is a native
    * row-local expression (`graft_sorted_pairs`) exploded straight
    * into the pair aggregate's map-side combine — the r14 self-join
    * form paid the same one cust-keyed shuffle TWICE (both join
    * sides), plus a distinct shuffle and the sort-merge machinery,
    * to produce the identical pair multiset. Cost is still ∝ Σ C(k,2),
    * which the k ≤ 100 basket cap bounds (the standard market-basket
    * guard: a degenerate "customer" touching everything would
    * otherwise blow up the pair stage); the cap is now a row-local
    * `size(set) <= 100` filter instead of a counted semi-join.
    * Supplier totals and the scalar N fall out of the same basket
    * frame (three consumers — one lazy checkpoint of |customers|
    * array rows, where r14 checkpointed the full |baskets| pair
    * frame); both broadcast; the top-50 is a TakeOrderedAndProject.
    */
  def q120Copurchase(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.sortedPairs
    val bsets = tradePairs(Tables(spark, dir))
      .select(shiftright(col("c"), 1).as("cust"),
        shiftright(col("s"), 1).as("supp"))
      .groupBy("cust").agg(collect_set(col("supp")).as("supps"))
      .filter(size(col("supps")) <= 100)
      .localCheckpoint(false)
    val totals = bsets.select(explode(col("supps")).as("supp"))
      .groupBy("supp").agg(count(lit(1)).as("n_s"))
    val nCust = bsets.agg(count(lit(1)).as("n"))
    // fan the |customers|-row basket frame out before the C(k,2)
    // explosion (identity on any multi-split input): the checkpoint
    // lands on a handful of post-AQE partitions, and the expansion —
    // not the scan — is this query's task-sum
    ScanOps.fanOutSmallScan(bsets)
      .select(sortedPairs(col("supps")).as("prs"))
      .select(explode(col("prs")).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 5)
      .select(shiftright(col("pk"), 32).as("s1"),
        col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("s2"),
        col("n_ab"))
      .join(broadcast(totals.select(col("supp").as("s1"), col("n_s").as("n_a"))),
        Seq("s1"))
      .join(broadcast(totals.select(col("supp").as("s2"), col("n_s").as("n_b"))),
        Seq("s2"))
      .crossJoin(broadcast(nCust))
      .withColumn("lift_class",
        (length(bin(col("n_ab") * col("n"))) -
          length(bin(col("n_a") * col("n_b")))).cast("long"))
      .select("s1", "s2", "n_ab", "lift_class")
      .orderBy(desc("lift_class"), desc("n_ab"), asc("s1"), asc("s2"))
      .limit(50)
  }

  val q120Sql: String =
    s"""WITH baskets AS (
       |  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |capped AS (
       |  SELECT * FROM baskets WHERE cust IN (
       |    SELECT cust FROM baskets GROUP BY cust HAVING COUNT(*) <= 100)),
       |totals AS (SELECT supp, COUNT(*)::BIGINT AS n_s FROM capped GROUP BY supp),
       |nc AS (SELECT COUNT(DISTINCT cust)::BIGINT AS n FROM capped),
       |co AS (
       |  SELECT a.supp AS s1, b.supp AS s2, COUNT(*)::BIGINT AS n_ab
       |  FROM capped a JOIN capped b ON a.cust = b.cust AND a.supp < b.supp
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 5)
       |SELECT s1, s2, n_ab,
       |  (len(bin(n_ab * nc.n)) - len(bin(ta.n_s * tb.n_s)))::BIGINT AS lift_class
       |FROM co JOIN totals ta ON co.s1 = ta.supp
       |        JOIN totals tb ON co.s2 = tb.supp, nc
       |ORDER BY lift_class DESC, n_ab DESC, s1, s2 LIMIT 50""".stripMargin

  /** q161: graph COARSENING — the multilevel trick behind every
    * scalable graph-partitioning/community pipeline (METIS, Louvain):
    * collapse the customer↔supplier trade graph onto its nation
    * labels and work on the |nations|² super-graph, which stays
    * 25×25 no matter how many billions of fine edges exist. The
    * coarse edge weight is the fine-edge multiplicity (so total mass
    * is CONSERVED — the spec sums the full coarse matrix against the
    * fine pair count), and each super-edge carries its distinct
    * endpoint counts — the "how concentrated is this trade corridor"
    * signal.
    *
    * Scale shape: the fine edges reduce in ONE aggregate after two
    * broadcast dim joins; everything after runs on ≤625 rows.
    */
  def q161GraphCoarsen(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val pairs = t.orders.select(col("o_orderkey"), col("o_custkey"))
      .join(t.lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
    val cn = t.customer.select(col("c_custkey").as("ck"),
      col("c_nationkey").as("cnk"))
    val sn = t.supplier.select(col("s_suppkey").as("sk"),
      col("s_nationkey").as("snk"))
    pairs.join(broadcast(cn), Seq("ck")).join(broadcast(sn), Seq("sk"))
      .groupBy("cnk", "snk")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct("ck").as("n_cust"), countDistinct("sk").as("n_supp"))
      .join(broadcast(t.nation.select(col("n_nationkey").as("cnk"),
        col("n_name").as("cust_nation"))), Seq("cnk"))
      .join(broadcast(t.nation.select(col("n_nationkey").as("snk"),
        col("n_name").as("supp_nation"))), Seq("snk"))
      .select("cust_nation", "supp_nation", "n_pairs", "n_cust", "n_supp")
      .orderBy(desc("n_pairs"), asc("cust_nation"), asc("supp_nation"))
      .limit(50)
  }

  val q161Sql: String =
    """WITH fine AS (
      |  SELECT o_custkey AS ck, l_suppkey AS sk
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |coarse AS (
      |  SELECT c.c_nationkey AS cnk, s.s_nationkey AS snk,
      |    COUNT(*)::BIGINT AS n_pairs,
      |    COUNT(DISTINCT f.ck)::BIGINT AS n_cust,
      |    COUNT(DISTINCT f.sk)::BIGINT AS n_supp
      |  FROM fine f
      |  JOIN customer c ON f.ck = c.c_custkey
      |  JOIN supplier s ON f.sk = s.s_suppkey
      |  GROUP BY 1, 2)
      |SELECT nc.n_name AS cust_nation, ns.n_name AS supp_nation,
      |  n_pairs, n_cust, n_supp
      |FROM coarse
      |JOIN nation nc ON cnk = nc.n_nationkey
      |JOIN nation ns ON snk = ns.n_nationkey
      |ORDER BY n_pairs DESC, cust_nation, supp_nation LIMIT 50""".stripMargin

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q161_graph_coarsen" -> (q161GraphCoarsen _),
    "q120_copurchase" -> (q120Copurchase _),
    "q113_textrank" -> (q113Textrank _),
    "q100_pagerank" -> (q100PageRank _),
    "q101_ppr_segment" -> (q101SegmentPpr _),
    "q102_hits" -> (q102Hits _),
    "q103_pagerank_weighted" -> (q103WeightedPageRank _),
    "q106_label_prop" -> (q106LabelProp _),
  )

  val oracle: Map[String, String] = Map(
    "q161_graph_coarsen" -> q161Sql,
    "q120_copurchase" -> q120Sql,
    "q113_textrank" -> q113Sql,
    "q100_pagerank" -> q100Sql,
    "q101_ppr_segment" -> q101Sql,
    "q102_hits" -> q102Sql,
    "q103_pagerank_weighted" -> q103Sql,
    "q106_label_prop" -> q106Sql,
  )
}
