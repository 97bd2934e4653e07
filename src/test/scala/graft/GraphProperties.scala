package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.GraphOps
import graft.rag.WordPieceTokenizer

/** Property tests for the round-3 primitives:
  *   - distributed connected components vs a driver-side union-find
  *     reference on random graphs;
  *   - WordPiece greedy segmentation invariants on words composed from
  *     the vocab (coverage, continuation marking, idempotent casing).
  */
object GraphProperties extends Properties("Graph") {
  private lazy val spark = TestSpark.spark

  // each CC case runs a full distributed loop (several Spark jobs);
  // a dozen random graphs give the coverage without minutes of wall
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val graphGen: Gen[(Seq[Long], Seq[(Long, Long)])] = for {
    n <- Gen.choose(1, 24)
    nodes = (0L until n.toLong)
    nEdges <- Gen.choose(0, 30)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0L, n.toLong - 1)
      b <- Gen.choose(0L, n.toLong - 1)
    } yield (a, b))
  } yield (nodes, edges.filter(e => e._1 != e._2))

  /** Reference union-find (path compression, driver-side). */
  private def unionFind(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(v => v -> v): _*)
    def find(v: Long): Long = {
      var r = v
      while (parent(r) != r) r = parent(r)
      var c = v
      while (parent(c) != r) { val next = parent(c); parent(c) = r; c = next }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // normalize: component label = min member id
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, vs) => vs.map(_ -> vs.min) }
  }

  property("connectedComponents == union-find on random graphs") =
    forAll(graphGen) { case (nodes, edges) =>
      import spark.implicits._
      val got = GraphOps.connectedComponents(
        nodes.toDF("id"), edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == unionFind(nodes, edges)
    }

  // the same contract with the loop FORCED to several partitions: the
  // local-contraction fast path can no longer solve the graph alone, so
  // this exercises the cross-partition stitching rounds production
  // would run at cluster scale (the single-partition runs above solve
  // everything in the union-find contraction)
  property("connectedComponents stitches across forced partitions") =
    forAll(graphGen) { case (nodes, edges) =>
      import spark.implicits._
      val rows = GraphOps.connectedComponents(
        nodes.toDF("id"), edges.toDF("src", "dst"), partitions = Some(4))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      // exactly one row per vertex (a multi-partition vertex picking up
      // one seed root per partition would duplicate its label row), and
      // the labels match the reference
      rows.length == nodes.size && rows.toMap == unionFind(nodes, edges)
    }

  // -------------------------------------------------- WordPiece props
  private val pieces = Seq("a", "ab", "abc", "b", "bc", "c", "##a",
    "##ab", "##b", "##bc", "##c", "##cc")
  private val vocab: Map[String, Int] =
    (Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]") ++ pieces).zipWithIndex.toMap
  private val inv = vocab.map(_.swap)
  private val tok = new WordPieceTokenizer(vocab)

  // cap at the tokenizer's HF-compatible maxWordChars=100: longer
  // words are DEFINED to collapse to [UNK] (pinned below), so the
  // coverage property only claims what holds under the cap
  private val wordGen: Gen[String] = for {
    first <- Gen.oneOf(pieces.filterNot(_.startsWith("##")))
    rest <- Gen.listOf(Gen.oneOf(pieces.filter(_.startsWith("##"))))
  } yield {
    val sb = new StringBuilder(first)
    rest.foreach { p =>
      val s = p.stripPrefix("##")
      if (sb.length + s.length <= 100) sb ++= s
    }
    sb.toString
  }

  property("wordpiece: segmentation covers the word exactly") =
    forAll(wordGen) { w =>
      val ids = tok.tokenize(w)
      val toks = ids.map(inv)
      // a word composed from vocab pieces never degrades to UNK, the
      // first piece is a root, continuations carry ##, and the pieces
      // re-concatenate to the word
      toks.nonEmpty &&
        !toks.contains("[UNK]") &&
        !toks.head.startsWith("##") &&
        toks.tail.forall(_.startsWith("##")) &&
        (toks.head + toks.tail.map(_.stripPrefix("##")).mkString) == w
    }

  property("wordpiece: case-insensitive") =
    forAll(wordGen) { w => tok.tokenize(w.toUpperCase) == tok.tokenize(w) }

  property("wordpiece: words beyond maxWordChars collapse to [UNK]") =
    forAll(wordGen, Gen.choose(101, 160)) { (w, len) =>
      val long = (w * ((len / math.max(w.length, 1)) + 1)).take(len)
      val ids = tok.tokenize(long)
      ids.map(inv) == Seq("[UNK]")
    }

  // ---- rank kernels vs sequential references on random graphs ----
  //
  // The fixed cases in GraphQueriesSpec pin hand-checkable shapes;
  // these run the same bit-exact comparison on arbitrary small
  // graphs (each case is a full eager RDD loop — the 12-case budget
  // above applies). Iterations = 3 keeps a case under a second.

  import graft.operators.GraphQueries

  private val S = GraphQueries.Scale
  private val prIters = 3

  // random pair lists over a small id space; duplicates allowed (the
  // unweighted kernels dedup, the weighted one keeps multiplicity)
  private val pairsGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(1, 15)
    pairs <- Gen.listOfN(n, for {
      a <- Gen.choose(0L, 7L)
      b <- Gen.choose(8L, 14L) // disjoint ranges: no self-loops
    } yield (a, b))
  } yield pairs

  private def refPr(pairs: Seq[(Long, Long)], seeds: Option[Set[Long]],
      multi: Boolean): Map[Long, Long] = {
    val base = if (multi) pairs else pairs.distinct
    val edges = base.flatMap { case (c, s) => Seq((c, s), (s, c)) }
    val deg = edges.groupBy(_._1).map { case (k, es) => k -> es.size.toLong }
    val teleport = (15L * S) / 100L
    val isSeed = (k: Long) => seeds.forall(_.contains(k))
    var ranks = deg.map { case (k, _) => k -> (if (isSeed(k)) S else 0L) }
    for (_ <- 1 to prIters) {
      val contribs = edges
        .map { case (src, dst) => dst -> ranks(src) / deg(src) }
        .groupBy(_._1).map { case (k, cs) => k -> cs.map(_._2).sum }
      ranks = deg.map { case (k, _) =>
        k -> ((if (isSeed(k)) teleport else 0L) +
          (85L * contribs.getOrElse(k, 0L)) / 100L) }
    }
    ranks
  }

  private def collectRanks(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  property("pageRank equals the sequential reference on random graphs") =
    forAll(pairsGen) { pairs =>
      import spark.implicits._
      collectRanks(GraphQueries.pageRank(
        pairs.toDF("c", "s"), prIters, S)) ==
        refPr(pairs, None, multi = false)
    }

  property("personalized pageRank equals the seed-masked reference") =
    forAll(pairsGen, Gen.someOf(0L to 14L)) { (pairs, seedSel) =>
      import spark.implicits._
      val seeds = seedSel.toSet
      collectRanks(GraphQueries.personalizedPageRank(
        pairs.toDF("c", "s"), seeds.toSeq.toDF("node_id"), prIters, S)) ==
        refPr(pairs, Some(seeds), multi = false)
    }

  property("weighted pageRank equals the multi-edge reference") =
    forAll(pairsGen) { pairs =>
      import spark.implicits._
      collectRanks(GraphQueries.weightedPageRank(
        pairs.toDF("c", "s"), prIters, S)) ==
        refPr(pairs, None, multi = true)
    }

  private def refHits(pairs: Seq[(Long, Long)], iters: Int,
      scale: Long): Map[Long, (Long, Long)] = {
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
    (hub.keySet ++ auth.keySet).map(id =>
      id -> (hub.getOrElse(id, 0L), auth.getOrElse(id, 0L))).toMap
  }

  property("hits equals the sequential reference on random digraphs") =
    forAll(pairsGen) { pairs =>
      import spark.implicits._
      GraphQueries.hits(pairs.toDF("c", "s"), prIters,
          GraphQueries.HitsScale)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap ==
        refHits(pairs, prIters, GraphQueries.HitsScale)
    }

  /** Sequential label propagation: weighted votes over the undirected
    * multi-edge list, max weight then smallest label, seeds clamped,
    * non-sticky (mirrors GraphQueriesSpec.referenceLp).
    */
  private def refLp(pairs: Seq[(Long, Long)], seeds: Map[Long, Long],
      iters: Int): Map[Long, Long] = {
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

  property("label propagation equals the sequential reference, forced partitions") =
    forAll(pairsGen, Gen.someOf(0L to 14L), Gen.choose(1, 5)) {
      (pairs, seedSel, parts) =>
        import spark.implicits._
        val seeds = seedSel.map(id => id -> (id % 31L)).toMap
        GraphQueries.labelPropagate(pairs.toDF("c", "s"),
            seeds.toSeq.toDF("id", "lab"), GraphQueries.LpIterations,
            Some(parts))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
          refLp(pairs, seeds, GraphQueries.LpIterations)
    }
}
