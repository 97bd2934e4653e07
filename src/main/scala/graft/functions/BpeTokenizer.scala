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
  private val mergeOne =
    udf((s: Seq[String], a: String, b: String) => applyMerge(s.toIndexedSeq, a, b))

  /** Adjacent symbol pairs as structs; empty for 1-symbol sequences
    * (zip_with of two 0-length slices — no `sequence(0, -1)` trap).
    */
  private def adjacentPairs(sym: org.apache.spark.sql.Column) = {
    val n = greatest(size(sym) - 1, lit(0))
    zip_with(slice(sym, lit(1), n), slice(sym, lit(2), n),
      (x, y) => struct(x.as("a"), y.as("b")))
  }

  /** Train `nMerges` merge rules from a `(word, cnt)` frequency table.
    * Stops early when no pair occurs at least twice (weighted).
    *
    * ONE job per round: the pair-count action materializes the
    * current symbol table into its cache as a side effect (no
    * separate count()), and the previous round's cache unpersists
    * only after its successor is pinned. Tiny-data iterative rounds
    * are scheduling-bound, so the loop runs with few shuffle
    * partitions and AQE off (AQE submits every shuffle stage as its
    * own job), restoring both confs on exit.
    */
  def train(words: DataFrame, nMerges: Int): Seq[(String, String)] = {
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
      var prev: DataFrame = null
      var done = false
      var round = 0
      while (round < nMerges && !done) {
        val top = syms
          .select(col("cnt"), explode(adjacentPairs(col("sym"))).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum("cnt").as("w"))
          .orderBy(desc("w"), asc("a"), asc("b"))
          .limit(1)
          .collect()
        if (prev != null) { prev.unpersist(); prev = null }
        if (top.isEmpty || top(0).getLong(2) < 2L) done = true
        else {
          val (a, b) = (top(0).getString(0), top(0).getString(1))
          merges += ((a, b))
          prev = syms
          syms = syms
            .withColumn("sym", mergeOne(col("sym"), lit(a), lit(b)))
            .persist()
        }
        round += 1
      }
      syms.unpersist()
      if (prev != null) prev.unpersist()
      merges.toSeq
    } finally {
      conf.set("spark.sql.shuffle.partitions", oldShuffle)
      conf.set("spark.sql.adaptive.enabled", oldAqe)
    }
  }
}
