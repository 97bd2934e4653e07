package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BpeTokenizer

/** Distributed BPE training + tokenization (q87). */
class BpeTokenizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("applyMerge is left-to-right non-overlapping") {
    assert(BpeTokenizer.applyMerge(Vector("a", "a", "a"), "a", "a") ==
      Vector("aa", "a"))
    assert(BpeTokenizer.applyMerge(Vector("a", "b", "a", "b"), "a", "b") ==
      Vector("ab", "ab"))
    assert(BpeTokenizer.applyMerge(Vector("x"), "a", "b") == Vector("x"))
    assert(BpeTokenizer.applyMerge(Vector(), "a", "b") == Vector())
  }

  test("train learns the hand-computed merge sequence") {
    import spark.implicits._
    // "abab"×3 + "ab"×2: round 1 pair weights (a,b)=8, (b,a)=3 → merge
    // (a,b); round 2 leaves only (ab,ab)=3 → merge; round 3: no pairs.
    val words = Seq(("abab", 3L), ("ab", 2L)).toDF("word", "cnt")
    val merges = BpeTokenizer.train(words, 5)
    assert(merges == Seq(("a", "b"), ("ab", "ab")))
    assert(BpeTokenizer.tokenizeWord("ababab", merges) == Vector("abab", "ab"))
    assert(BpeTokenizer.tokenizeWord("abba", merges) ==
      Vector("ab", "b", "a"))
  }

  test("train stops when no pair is weighted >= 2") {
    import spark.implicits._
    val words = Seq(("ab", 1L), ("cd", 1L)).toDF("word", "cnt")
    assert(BpeTokenizer.train(words, 5) == Seq())
  }

  test("a self-pair head trains as a batch of one (BpeProperties counterexample)") {
    import spark.implicits._
    // {"  "×2, "aaa"×5}: round-1 weights (a,a)=10, (' ',' ')=2 —
    // symbol-disjoint, so the old batch rule committed BOTH. But
    // merging (a,a) CREATES (aa,a)=5, which sequentially out-ranks
    // (' ',' ')=2: the correct sequence is (a,a), (aa,a). A self-pair
    // merge can create pairs whose progenitor is the member itself,
    // so it must never share a batch.
    val words = Seq(("  ", 2L), ("aaa", 5L)).toDF("word", "cnt")
    val got = BpeTokenizer.train(words, 2, batchTop = 4,
      checkpointEvery = 3, maxLocalWords = 0L)
    assert(got == Seq(("a", "a"), ("aa", "a")))
    // selectBatch unit shape: self-pair head alone; mid-scan
    // self-pair stops the batch like a conflicter
    assert(BpeTokenizer.selectBatch(
      Seq(("a", "a", 10L), (" ", " ", 2L)), pageFull = false, 8) ==
      Seq(("a", "a")))
    assert(BpeTokenizer.selectBatch(
      Seq(("a", "b", 10L), ("c", "c", 6L), ("d", "e", 5L)),
      pageFull = false, 8) == Seq(("a", "b")))
  }

  test("corpus training is deterministic and round-trips every word") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.tokens
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val freq = docs.select(explode(tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val m1 = BpeTokenizer.train(freq, 6)
    val m2 = BpeTokenizer.train(freq, 6)
    assert(m1 == m2)
    assert(m1.length == 6)
    val words = freq.select("word").collect().map(_.getString(0))
    words.foreach { w =>
      val toks = BpeTokenizer.tokenizeWord(w, m1)
      assert(toks.mkString("") == w, s"round-trip failed for '$w'")
    }
    // merges must actually compress: some word tokenizes to fewer
    // symbols than characters
    assert(words.exists(w =>
      BpeTokenizer.tokenizeWord(w, m1).length < w.length))
  }
}
