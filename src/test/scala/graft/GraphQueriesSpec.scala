package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphQueries

/** Fixed-point PageRank kernel on hand-built graphs where the
  * recurrence can be computed by hand (or by a tiny in-test
  * reference), plus the invariants the integer formulation promises:
  * determinism under repartitioning and bounded mass loss.
  */
class GraphQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val S = GraphQueries.Scale

  private def pr(pairs: Seq[(Long, Long)], iters: Int,
      parts: Option[Int] = None): Map[Long, Long] = {
    import spark.implicits._
    GraphQueries.pageRank(pairs.toDF("c", "s"), iters, S, parts)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** In-test sequential reference: the exact same integer recurrence
    * over an undirected edge list, computed single-threaded.
    */
  private def reference(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val edges = pairs.flatMap { case (c, s) => Seq((c, s), (s, c)) }
    val deg = edges.groupBy(_._1).map { case (k, es) => k -> es.size.toLong }
    val teleport = (15L * S) / 100L
    var ranks = deg.map { case (k, _) => k -> S }
    for (_ <- 1 to iters) {
      val contribs = edges
        .map { case (src, dst) => dst -> ranks(src) / deg(src) }
        .groupBy(_._1).map { case (k, cs) => k -> cs.map(_._2).sum }
      ranks = deg.map { case (k, _) =>
        k -> (teleport + (85L * contribs.getOrElse(k, 0L)) / 100L) }
    }
    ranks
  }

  test("single edge: both endpoints fix at exactly S") {
    // deg=1 both sides, each round r' = 0.15S + 0.85r; from r=S this
    // is the fixed point (up to truncation: 0.15S + 0.85S = S).
    val got = pr(Seq((2L, 3L)), iters = 5)
    assert(got.keySet == Set(2L, 3L))
    // truncating division loses <100 units/round on S=1e12
    got.values.foreach(v => assert(math.abs(v - S) < 1000L))
  }

  test("star graph: hub outranks leaves and matches the sequential reference") {
    // node 1 trades with nodes 10..14 (pageRank takes node ids as-is;
    // the 2k/2k+1 key disambiguation lives in q100PageRank)
    val pairs = (10L to 14L).map(s => (1L, s))
    val got = pr(pairs, iters = 5)
    val want = reference(pairs, iters = 5)
    assert(got == want)
    val hub = got(1L)
    val leaves = (10L to 14L).map(got)
    assert(leaves.forall(_ < hub), s"hub $hub must outrank leaves $leaves")
    assert(leaves.distinct.size == 1, "symmetric leaves rank equally")
  }

  test("asymmetric graph matches the sequential reference bit-for-bit") {
    // two customers, overlapping suppliers, uneven degrees
    val pairs = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 12L), (2L, 13L),
      (3L, 13L), (3L, 10L), (3L, 14L), (3L, 15L))
    val got = pr(pairs, iters = 5)
    assert(got == reference(pairs, iters = 5))
  }

  test("result is invariant to the loop partitioner width") {
    val pairs = Seq((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L), (3L, 13L))
    val p1 = pr(pairs, iters = 5, parts = Some(1))
    val p7 = pr(pairs, iters = 5, parts = Some(7))
    assert(p1 == p7)
  }

  test("total mass stays within the truncation bound") {
    // Undirected graph: no dangling mass, so sum(ranks) would be
    // exactly N·S in real arithmetic; truncation loses < deg units
    // per node per round.
    val pairs = Seq((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L),
      (3L, 12L), (3L, 13L), (4L, 13L), (4L, 10L))
    val got = pr(pairs, iters = 5)
    val n = got.size.toLong
    val total = got.values.sum
    assert(total <= n * S)
    // max loss: iters * (sum of degrees + n truncations) ≈ tiny
    assert(n * S - total < 5L * 1000L, s"lost ${n * S - total} units")
  }

  test("empty edge set yields an empty frame") {
    assert(pr(Seq.empty, iters = 3).isEmpty)
  }

  // ---- personalized variant ----

  private def ppr(pairs: Seq[(Long, Long)], seeds: Seq[Long], iters: Int,
      parts: Option[Int] = None): Map[Long, Long] = {
    import spark.implicits._
    GraphQueries.personalizedPageRank(
      pairs.toDF("c", "s"), seeds.toDF("node_id"), iters, S, parts)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Sequential reference with seed-masked teleport + initial mass. */
  private def referenceP(pairs: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int): Map[Long, Long] = {
    val edges = pairs.flatMap { case (c, s) => Seq((c, s), (s, c)) }
    val deg = edges.groupBy(_._1).map { case (k, es) => k -> es.size.toLong }
    val teleport = (15L * S) / 100L
    var ranks = deg.map { case (k, _) => k -> (if (seeds(k)) S else 0L) }
    for (_ <- 1 to iters) {
      val contribs = edges
        .map { case (src, dst) => dst -> ranks(src) / deg(src) }
        .groupBy(_._1).map { case (k, cs) => k -> cs.map(_._2).sum }
      ranks = deg.map { case (k, _) =>
        k -> ((if (seeds(k)) teleport else 0L) +
          (85L * contribs.getOrElse(k, 0L)) / 100L) }
    }
    ranks
  }

  test("personalized: matches the sequential reference bit-for-bit") {
    val pairs = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 12L), (2L, 13L),
      (3L, 13L), (3L, 10L), (3L, 14L), (3L, 15L))
    val seeds = Seq(1L)
    assert(ppr(pairs, seeds, iters = 5) ==
      referenceP(pairs, seeds.toSet, iters = 5))
  }

  test("personalized: rank decays with distance from the seed") {
    // path 1 - 10 - 2 - 11 - 3 : seed at node 1
    val pairs = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L))
    val got = ppr(pairs, Seq(1L), iters = 6)
    assert(got(1L) > got(10L), "seed outranks its neighbor")
    assert(got(10L) > got(11L), "closer to seed outranks farther")
    // no assertion on the path's far endpoint: a degree-1 node
    // returns ALL its mass to its neighbor each round, so endpoint
    // ranks can exceed interior ones — decay is not monotone in hops
  }

  test("personalized: empty seed set drains all rank to zero") {
    val pairs = Seq((1L, 10L), (2L, 10L))
    val got = ppr(pairs, Seq.empty, iters = 5)
    assert(got.values.forall(_ == 0L))
    assert(got.keySet == Set(1L, 2L, 10L))
  }

  test("guards: overflow-prone scale and zero-teleport scale are rejected") {
    import spark.implicits._
    val pairs = Seq((1L, 10L), (2L, 10L)).toDF("c", "s")
    val seeds = Seq(1L).toDF("node_id")
    // 3 nodes at scale=2^62: 85*S*N wraps — must throw, not wrap
    val e1 = intercept[IllegalArgumentException] {
      GraphQueries.pageRank(pairs, 1, Long.MaxValue / 2)
    }
    assert(e1.getMessage.contains("overflows"))
    // scale=6 → teleport = 0: personalized ranks would all be zero
    val e2 = intercept[IllegalArgumentException] {
      GraphQueries.personalizedPageRank(pairs, seeds, 1, 6L)
    }
    assert(e2.getMessage.contains("teleport"))
  }

  test("personalized: seeds without edges are ignored, invariant to partitioning") {
    val pairs = Seq((1L, 10L), (2L, 10L), (2L, 11L))
    val seeds = Seq(1L, 99L) // 99 has no edge
    val p1 = ppr(pairs, seeds, iters = 5, parts = Some(1))
    val p5 = ppr(pairs, seeds, iters = 5, parts = Some(5))
    assert(p1 == p5)
    assert(!p1.contains(99L))
    assert(p1 == referenceP(pairs, Set(1L), iters = 5))
  }

  // ---- weighted (multi-edge) PageRank ----

  private def wpr(pairs: Seq[(Long, Long)], iters: Int,
      parts: Option[Int] = None): Map[Long, Long] = {
    import spark.implicits._
    GraphQueries.weightedPageRank(pairs.toDF("c", "s"), iters, S, parts)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Multi-edge sequential reference: duplicates kept, degree = total
    * multiplicity, each duplicate carries one `rank div deg` unit.
    */
  private def referenceW(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val edges = pairs.flatMap { case (c, s) => Seq((c, s), (s, c)) }
    val deg = edges.groupBy(_._1).map { case (k, es) => k -> es.size.toLong }
    val teleport = (15L * S) / 100L
    var ranks = deg.map { case (k, _) => k -> S }
    for (_ <- 1 to iters) {
      val contribs = edges
        .map { case (src, dst) => dst -> ranks(src) / deg(src) }
        .groupBy(_._1).map { case (k, cs) => k -> cs.map(_._2).sum }
      ranks = deg.map { case (k, _) =>
        k -> (teleport + (85L * contribs.getOrElse(k, 0L)) / 100L) }
    }
    ranks
  }

  test("weighted: multi-edge graph matches the sequential reference bit-for-bit") {
    // edge (1,10) three times, (1,11) once, plus a disjoint pair
    val pairs = Seq((1L, 10L), (1L, 10L), (1L, 10L), (1L, 11L),
      (2L, 11L), (2L, 12L), (2L, 12L))
    assert(wpr(pairs, iters = 5) == referenceW(pairs, iters = 5))
  }

  test("weighted: a heavier edge pulls more rank than a lighter one") {
    // node 1 trades 4× with 10 and 1× with 11 — 10 must outrank 11
    val pairs = Seq((1L, 10L), (1L, 10L), (1L, 10L), (1L, 10L), (1L, 11L))
    val got = wpr(pairs, iters = 5)
    assert(got(10L) > got(11L),
      s"heavy neighbor ${got(10L)} must outrank light ${got(11L)}")
    // and the unweighted kernel sees them identically
    val un = pr(pairs, iters = 5)
    assert(un(10L) == un(11L))
  }

  test("weighted: collapses to unweighted when every multiplicity is 1") {
    val pairs = Seq((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L), (3L, 13L))
    assert(wpr(pairs, iters = 5) == pr(pairs, iters = 5))
  }

  test("weighted: invariant to the loop partitioner width") {
    val pairs = Seq((1L, 10L), (1L, 10L), (2L, 10L), (2L, 11L), (2L, 11L),
      (3L, 12L))
    assert(wpr(pairs, iters = 5, parts = Some(1)) ==
      wpr(pairs, iters = 5, parts = Some(7)))
  }

  // ---- HITS hubs & authorities ----

  private val HS = GraphQueries.HitsScale

  private def hits(pairs: Seq[(Long, Long)], iters: Int,
      parts: Option[Int] = None,
      scale: Long = HS): Map[Long, (Long, Long)] = {
    import spark.implicits._
    GraphQueries.hits(pairs.toDF("c", "s"), iters, scale, parts)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  /** Sequential reference: same recurrence, same truncating L∞
    * normalization, over a distinct directed edge list.
    */
  private def referenceHits(pairs: Seq[(Long, Long)], iters: Int,
      scale: Long = HS): Map[Long, (Long, Long)] = {
    val es = pairs.distinct
    var hub = es.map(_._1).distinct.map(_ -> scale).toMap
    var auth = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      val ar = es.groupBy(_._2).map { case (s, e) =>
        s -> e.map(x => hub.getOrElse(x._1, 0L)).sum }
      val amax = ar.values.max
      auth = ar.map { case (k, v) => k -> v * scale / amax }
      val hr = es.groupBy(_._1).map { case (c, e) =>
        c -> e.map(x => auth.getOrElse(x._2, 0L)).sum }
      val hmax = hr.values.max
      hub = hr.map { case (k, v) => k -> v * scale / hmax }
    }
    val ids = hub.keySet ++ auth.keySet
    ids.map(id =>
      id -> (hub.getOrElse(id, 0L), auth.getOrElse(id, 0L))).toMap
  }

  test("hits: bipartite star — hub center and all authorities peg at scale") {
    // customer 1 supplies from 10..14: hub(1) is the only hub (max →
    // exactly S); each supplier's raw auth is equal, so all peg at S
    val pairs = (10L to 14L).map(s => (1L, s))
    val got = hits(pairs, iters = 5)
    assert(got(1L) == (HS, 0L))
    (10L to 14L).foreach(s => assert(got(s) == (0L, HS)))
  }

  test("hits: asymmetric bipartite graph matches the sequential reference") {
    val pairs = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 12L), (2L, 13L),
      (3L, 13L), (3L, 10L), (3L, 14L), (3L, 15L), (4L, 10L))
    assert(hits(pairs, iters = 5) == referenceHits(pairs, iters = 5))
  }

  test("hits: general digraph — a mid-path node carries both scores") {
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val got = hits(pairs, iters = 5)
    assert(got == referenceHits(pairs, iters = 5))
    val (h2, a2) = got(2L)
    assert(h2 > 0L && a2 > 0L, s"node 2 must be both hub and authority: $h2/$a2")
  }

  test("hits: max hub and max authority are exactly scale every run") {
    val pairs = Seq((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L), (3L, 13L))
    val got = hits(pairs, iters = 5)
    assert(got.values.map(_._1).max == HS)
    assert(got.values.map(_._2).max == HS)
  }

  test("hits: result is invariant to the loop partitioner width") {
    val pairs = Seq((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L), (3L, 13L),
      (4L, 10L), (4L, 13L))
    assert(hits(pairs, iters = 5, parts = Some(1)) ==
      hits(pairs, iters = 5, parts = Some(7)))
  }

  test("hits: duplicate edges collapse (same result as the distinct list)") {
    val pairs = Seq((1L, 10L), (1L, 10L), (1L, 11L), (2L, 11L), (2L, 11L))
    assert(hits(pairs, iters = 5) == hits(pairs.distinct, iters = 5))
  }

  test("hits: empty edge set yields an empty frame; bad scale rejected") {
    assert(hits(Seq.empty, iters = 3).isEmpty)
    import spark.implicits._
    val df = Seq((1L, 10L)).toDF("c", "s")
    val e = intercept[IllegalArgumentException] {
      GraphQueries.hits(df, 1, Long.MaxValue / 2)
    }
    assert(e.getMessage.contains("overflow"))
  }

  // ---- label propagation ----

  private def lp(pairs: Seq[(Long, Long)], seeds: Seq[(Long, Long)],
      iters: Int, parts: Option[Int] = None): Map[Long, Long] = {
    import spark.implicits._
    GraphQueries.labelPropagate(
      pairs.toDF("c", "s"), seeds.toDF("id", "lab"), iters, parts)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Sequential reference: synchronous rounds, weighted votes over
    * the undirected multi-edge list, max weight then smallest label,
    * seeds clamped, non-sticky for everyone else.
    */
  private def referenceLp(pairs: Seq[(Long, Long)],
      seeds: Map[Long, Long], iters: Int): Map[Long, Long] = {
    val edges = pairs.flatMap { case (c, s) => Seq((c, s), (s, c)) }
    var labels = seeds
    for (_ <- 1 to iters) {
      val best = edges
        .flatMap { case (src, dst) => labels.get(src).map(l => (dst, l)) }
        .groupBy(identity).map { case ((dst, l), occ) => (dst, l, occ.size.toLong) }
        .groupBy(_._1).map { case (dst, vs) =>
          dst -> vs.map(v => (v._3, v._2)).reduce((a, b) =>
            if (a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)) a else b)._2 }
      labels = best ++ seeds
    }
    labels
  }

  test("lp: bipartite two-community graph matches the sequential reference") {
    // seeds 1→lab 3, 2→lab 7; suppliers 10,11 trade mostly with 1,
    // suppliers 12,13 mostly with 2; customer 4 unseeded in between
    val pairs = Seq((1L, 10L), (1L, 10L), (1L, 11L), (2L, 12L), (2L, 12L),
      (2L, 13L), (4L, 11L), (4L, 12L))
    val seeds = Map(1L -> 3L, 2L -> 7L)
    val got = lp(pairs, seeds.toSeq, iters = 3)
    assert(got == referenceLp(pairs, seeds, iters = 3))
    assert(got(10L) == 3L && got(11L) == 3L)
    assert(got(12L) == 7L && got(13L) == 7L)
  }

  test("lp: equal votes break to the smaller label id") {
    // node 10 hears one vote each for labels 5 and 2 → takes 2
    val pairs = Seq((1L, 10L), (2L, 10L))
    val got = lp(pairs, Seq((1L, 5L), (2L, 2L)), iters = 1)
    assert(got(10L) == 2L)
  }

  test("lp: seeds are clamped against any majority") {
    // seed 1 (lab 0) trades only with suppliers that re-vote lab 9
    // back at it — 1 must stay 0
    val pairs = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 10L),
      (2L, 11L), (2L, 11L))
    val seeds = Seq((1L, 0L), (2L, 9L))
    val got = lp(pairs, seeds, iters = 3)
    assert(got(1L) == 0L, "seed must keep its label")
    assert(got(10L) == 9L && got(11L) == 9L, "2's double edges outvote 1")
    assert(got == referenceLp(pairs, seeds.toMap, iters = 3))
  }

  test("lp: parallel edges are vote weights") {
    // 10 hears 3 votes for lab 8 (triple edge) vs 1 for lab 1
    val pairs = Seq((1L, 10L), (2L, 10L), (2L, 10L), (2L, 10L))
    val got = lp(pairs, Seq((1L, 1L), (2L, 8L)), iters = 1)
    assert(got(10L) == 8L)
  }

  test("lp: result is invariant to the loop partitioner width") {
    val pairs = Seq((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L), (3L, 13L),
      (3L, 13L), (4L, 10L))
    val seeds = Seq((1L, 2L), (2L, 5L), (3L, 1L))
    assert(lp(pairs, seeds, iters = 3, parts = Some(1)) ==
      lp(pairs, seeds, iters = 3, parts = Some(7)))
  }

  test("lp: seeded random graph matches the sequential reference") {
    val rnd = new scala.util.Random(20260814L)
    val pairs = Seq.fill(300)(
      (rnd.nextInt(20).toLong, 100L + rnd.nextInt(25).toLong))
    val seeds = (0L until 20L by 3L).map(c => c -> (c % 30L / 3L)).toSeq
    val got = lp(pairs, seeds, iters = 3, parts = Some(5))
    assert(got == referenceLp(pairs, seeds.toMap, iters = 3))
  }

  test("lp: empty seeds yield empty; no edges return the seeds; bad labels rejected") {
    import spark.implicits._
    assert(lp(Seq((1L, 10L)), Seq.empty, iters = 2).isEmpty)
    assert(lp(Seq.empty, Seq((1L, 4L), (2L, 6L)), iters = 2) ==
      Map(1L -> 4L, 2L -> 6L))
    val e = intercept[IllegalArgumentException] {
      GraphQueries.labelPropagate(Seq((1L, 10L)).toDF("c", "s"),
        Seq((1L, 40L)).toDF("id", "lab"), 1)
    }
    assert(e.getMessage.contains("[0, 32)"))
  }
}
