package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer with DISTRIBUTED training — the
  * canonical subword vocabulary build a training pipeline runs over
  * its corpus before tokenizing it.
  *
  * Training is the classic word-frequency formulation: symbol
  * sequences start as characters, and each round merges the globally
  * most frequent adjacent pair. Every round is one Spark job over the
  * DISTINCT-WORD table (already tiny relative to the corpus — Zipf
  * collapses 100 TB of text to millions of distinct words), shaped
  * as: pair explode → partial-combined sum aggregate → limit-1
  * TakeOrdered. Per-round driver state is ONE merge rule; the symbol
  * table updates as a map stage. Tie-breaks are lexicographic on the
  * pair, so training is deterministic on any cluster layout.
  *
  * Tokenization applies the learned merges in rank order per word —
  * the standard apply-merges-in-order algorithm, identical to how
  * training rewrote its symbol table, so tokenizing the training
  * corpus reproduces training's final symbol sequences exactly.
  */
object BpeTokenizer {

  /** One merge pass: adjacent (a, b) → a+b, left-to-right,
    * non-overlapping (after a merge the scan resumes AFTER the merged
    * token — "aaa" under (a,a) is ["aa","a"], never ["a","aa"]).
    */
  def applyMerge(seq: IndexedSeq[String], a: String, b: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < seq.length) {
      if (i + 1 < seq.length && seq(i) == a && seq(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += seq(i)
        i += 1
      }
    }
    out.toIndexedSeq
  }

  /** Tokenize one word by applying `merges` in training order. */
  def tokenizeWord(word: String, merges: Seq[(String, String)]): IndexedSeq[String] =
    merges.foldLeft(word.map(_.toString): IndexedSeq[String]) { (s, m) =>
      if (s.length < 2) s else applyMerge(s, m._1, m._2)
    }

  private val charSplit = udf((w: String) => w.map(_.toString))

  /** Adjacent symbol pairs as structs; empty for 1-symbol sequences
    * (zip_with of two 0-length slices — no `sequence(0, -1)` trap).
    */
  private def adjacentPairs(sym: org.apache.spark.sql.Column) = {
    val n = greatest(size(sym) - 1, lit(0))
    zip_with(slice(sym, lit(1), n), slice(sym, lit(2), n),
      (x, y) => struct(x.as("a"), y.as("b")))
  }

  /** Pick the longest prefix of the count-ordered candidates that is
    * provably SEQUENTIAL-EQUIVALENT to merge one at a time:
    *
    *  - members must be pairwise symbol-disjoint — disjoint merges
    *    commute and leave each other's counts exact;
    *  - the scan stops at the FIRST candidate sharing a symbol with
    *    the batch (`wStop` = its weight): merging can only create or
    *    re-weight pairs that share a symbol with a merged pair, and
    *    every such progenitor sorts at or below the first conflicter,
    *    so no created pair can out-rank a member with w > wStop;
    *  - members tying wStop are dropped (a created pair could tie
    *    them and win the lexicographic tie-break) — except the head,
    *    which is the round's argmax and always correct.
    *
    * When the collected page is exhausted without conflict, unseen
    * candidates bound wStop instead (their w ≤ the page's last).
    *
    * Self-pairs (a,a) are the one shape the progenitor argument does
    * not cover (see the comment in the body) and always train as a
    * batch of one.
    */
  private[graft] def selectBatch(top: Seq[(String, String, Long)],
      pageFull: Boolean, maxBatch: Int): Seq[(String, String)] = {
    // SELF-PAIRS (a,a) break the progenitor argument above: merging
    // (a,a) creates (aa,a)/(a,aa) pairs whose progenitor is the
    // member ITSELF, so no conflicter bounds their weight — they can
    // weigh up to the member's own application count and out-rank any
    // later member (found by BpeProperties: {"  "x2, "aaa"x5} — the
    // head (a,a)=10 creates (aa,a)=5, which sequentially out-ranks
    // (' ',' ')=2, so the batch [(a,a), (' ',' ')] is not
    // sequential-equivalent). A self-pair is therefore safe only as a
    // batch of ONE: as the head it trains alone; met mid-scan it
    // stops the batch like a conflicter.
    if (top.head._1 == top.head._2)
      return Seq((top.head._1, top.head._2))
    val batch = scala.collection.mutable.ArrayBuffer(top.head)
    val used = scala.collection.mutable.Set(top.head._1, top.head._2)
    var wStop = if (pageFull) top.last._3 else 0L
    var i = 1
    var stopped = false
    while (i < top.length && !stopped) {
      val (a, b, w) = top(i)
      if (w < 2L || a == b || used.contains(a) || used.contains(b)) {
        wStop = math.max(wStop, w); stopped = true
      } else {
        batch += top(i); used += a; used += b
      }
      i += 1
    }
    (batch.head +: batch.tail.filter(_._3 > wStop))
      .take(maxBatch).map(t => (t._1, t._2)).toSeq
  }

  /** Driver-local trainer over a collected word-frequency table, with
    * the same delta formulation as the distributed loop: a pair→weight
    * map plus a pair→containing-words index, so each merge re-counts
    * only the words it touches.
    *
    * The per-merge argmax is a LAZY MAX-HEAP with stale-entry
    * skipping, not an O(distinct pairs) scan: every time a pair's
    * weight changes it is re-pushed at its new weight, and a popped
    * entry counts only if it still matches the live weight — the
    * classic lazy-deletion heap, O(log P) amortized per merge instead
    * of a full P-scan (at vocab scale, 32k merges × a multi-million-
    * pair scan was the dominant cost of the local path). The heap
    * invariant — every live (pair, weight ≥ 2) has a matching entry —
    * holds because the initial build pushes all of them and each
    * merge re-pushes exactly the pairs it touched.
    */
  private[graft] def trainLocal(words: Seq[(String, Long)],
      nMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val tbl = words.map { case (w, c) =>
      (mutable.ArrayBuffer[String](w.map(_.toString): _*), c)
    }.toArray
    val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    val where = mutable.Map.empty[(String, String), mutable.Set[Int]]
    for (((s, c), i) <- tbl.zipWithIndex; k <- 0 until s.length - 1) {
      val p = (s(k), s(k + 1))
      counts(p) += c
      where.getOrElseUpdate(p, mutable.Set.empty) += i
    }
    // max-heap: higher weight first, ties to the lexicographically
    // smaller pair — the same total order as the distributed loop's
    // ORDER BY w DESC, a ASC, b ASC
    val ord: Ordering[((String, String), Long)] =
      new Ordering[((String, String), Long)] {
        def compare(x: ((String, String), Long),
            y: ((String, String), Long)): Int = {
          val c = java.lang.Long.compare(x._2, y._2)
          if (c != 0) c
          else {
            val ca = y._1._1.compareTo(x._1._1)
            if (ca != 0) ca else y._1._2.compareTo(x._1._2)
          }
        }
      }
    val heap = mutable.PriorityQueue.empty[((String, String), Long)](ord)
    for ((p, w) <- counts if w >= 2L) heap.enqueue((p, w))
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < nMerges && !done) {
      var best: ((String, String), Long) = null
      while (best == null && heap.nonEmpty) {
        val e = heap.dequeue()
        if (counts(e._1) == e._2) best = e
      }
      if (best == null) done = true
      else {
        val (a, b) = best._1
        merges += ((a, b))
        val touched = mutable.Set.empty[(String, String)]
        for (i <- where.getOrElse((a, b), mutable.Set.empty).toArray) {
          val (s, c) = tbl(i)
          for (k <- 0 until s.length - 1) {
            val p = (s(k), s(k + 1))
            counts(p) -= c
            if (counts(p) == 0L) counts.remove(p)
            where.get(p).foreach(_ -= i)
            touched += p
          }
          val ns = applyMerge(s.toIndexedSeq, a, b)
          s.clear(); s ++= ns
          for (k <- 0 until s.length - 1) {
            val p = (s(k), s(k + 1))
            counts(p) += c
            where.getOrElseUpdate(p, mutable.Set.empty) += i
            touched += p
          }
        }
        for (p <- touched) {
          val w = counts(p)
          if (w >= 2L) heap.enqueue((p, w))
        }
      }
    }
    merges.toSeq
  }

  /** Train `nMerges` merge rules from a `(word, cnt)` frequency table.
    * Stops early when no pair occurs at least twice (weighted).
    *
    * SIZE-CONDITIONAL, like every other small-side choice in this
    * engine: BPE training's input is the DISTINCT-WORD table, which
    * Zipf collapses a corpus onto — 100 TB of text still yields only
    * millions of rows. Up to `maxLocalWords` rows the table collects
    * and trains on the driver ([[trainLocal]], zero jobs per merge —
    * the aggregation that builds the table is the part that must be
    * distributed, not the merge loop); past it, the distributed
    * incremental loop below takes over.
    *
    * The distributed loop scales to real vocabulary sizes through
    * three levers the naive recount-everything loop lacks:
    *
    *  - INCREMENTAL pair counts: the (a, b) → weight table is
    *    maintained across rounds by a delta — only words that
    *    actually contain a merged pair are re-counted (old adjacent
    *    pairs at −cnt, new ones at +cnt), the classic delta
    *    formulation. A Zipf corpus touches a small fraction of
    *    distinct words per merge, so each round's job is bounded by
    *    the affected words, not the vocabulary.
    *  - BATCHED merges: each round collects a page of top candidates
    *    and applies the longest provably order-equivalent prefix
    *    ([[selectBatch]]), cutting the round count (and with it the
    *    driver round-trips that dominate at 32k-merge scale) without
    *    changing the learned sequence.
    *  - BOUNDED lineage: both state frames re-root on a lazy
    *    localCheckpoint every `checkpointEvery` rounds — without it
    *    the per-round plan nesting makes Catalyst analysis itself
    *    the bottleneck long before 1,000 merges.
    *
    * ONE job per round: the candidate-page collect materializes the
    * round's delta-updated state as a side effect, and the previous
    * round's caches unpersist only after their successor is pinned.
    * Tiny-data iterative rounds are scheduling-bound, so the loop
    * runs with few shuffle partitions and AQE off (AQE submits every
    * shuffle stage as its own job), restoring both confs on exit.
    */
  def train(words: DataFrame, nMerges: Int, batchTop: Int = 64,
      checkpointEvery: Int = 8,
      maxLocalWords: Long = 1000000L): Seq[(String, String)] = {
    if (maxLocalWords > 0L) {
      val w = words.persist()
      try {
        if (w.count() <= maxLocalWords)
          return trainLocal(w.select("word", "cnt").collect()
            .map(r => (r.getString(0), r.getLong(1))).toSeq, nMerges)
      } finally w.unpersist()
    }
    val conf = words.sparkSession.conf
    val oldShuffle = conf.get("spark.sql.shuffle.partitions")
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.shuffle.partitions", "8")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var syms = words
        .select(col("cnt"), charSplit(col("word")).as("sym"))
        .persist()
      var pc = syms
        .select(col("cnt"), explode(adjacentPairs(col("sym"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("w"))
        .persist()
      // the frame holding the round's cached symbol data (the initial
      // charSplit, then each round's `annotated`); its `syms`
      // projection reads through the cache without a second copy
      var symsCache: DataFrame = syms
      var prevSyms: DataFrame = null
      var prevPc: DataFrame = null
      var done = false
      var round = 0
      while (merges.size < nMerges && !done) {
        val top = pc
          .orderBy(desc("w"), asc("a"), asc("b"))
          .limit(batchTop)
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
          .toSeq
        if (prevSyms != null) { prevSyms.unpersist(); prevSyms = null }
        if (prevPc != null) { prevPc.unpersist(); prevPc = null }
        if (top.isEmpty || top.head._3 < 2L) done = true
        else {
          val batch = selectBatch(top, top.length == batchTop,
            nMerges - merges.size)
          merges ++= batch
          val batchKeys = batch.map { case (a, b) => a + " " + b }
          val mergeBatch = udf((s: Seq[String]) =>
            batch.foldLeft(s.toIndexedSeq) { (acc, m) =>
              if (acc.length < 2) acc else applyMerge(acc, m._1, m._2)
            })
          val annotated = syms
            .withColumn("hit", arrays_overlap(
              transform(adjacentPairs(col("sym")),
                p => concat_ws(" ", p.getField("a"), p.getField("b"))),
              typedlit(batchKeys)))
            .withColumn("sym2",
              when(col("hit"), mergeBatch(col("sym"))).otherwise(col("sym")))
            .persist()
          val aff = annotated.filter(col("hit"))
          val delta = aff
            .select((-col("cnt")).as("d"), explode(adjacentPairs(col("sym"))).as("p"))
            .unionAll(aff.select(col("cnt").as("d"),
              explode(adjacentPairs(col("sym2"))).as("p")))
            .groupBy(col("p.a").as("a"), col("p.b").as("b"))
            .agg(sum("d").as("w"))
          prevPc = pc
          pc = pc.unionAll(delta)
            .groupBy("a", "b").agg(sum("w").as("w"))
            .filter(col("w") > 0)
          prevSyms = symsCache
          symsCache = annotated
          syms = annotated.select(col("cnt"), col("sym2").as("sym"))
          if (round % checkpointEvery == checkpointEvery - 1) {
            // re-root both state frames: the checkpointed plans become
            // leaves, so per-round nesting cannot compound
            pc = pc.localCheckpoint(false)
            syms = syms.localCheckpoint(false)
          } else {
            pc = pc.persist()
          }
        }
        round += 1
      }
      symsCache.unpersist()
      pc.unpersist()
      if (prevSyms != null) prevSyms.unpersist()
      if (prevPc != null) prevPc.unpersist()
      merges.toSeq
    } finally {
      conf.set("spark.sql.shuffle.partitions", oldShuffle)
      conf.set("spark.sql.adaptive.enabled", oldAqe)
    }
  }
}
