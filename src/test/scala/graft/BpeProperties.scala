package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.BpeTokenizer

/** BPE kernel invariants on arbitrary inputs (the corpus-level
  * behavior is pinned in BpeTokenizerSpec; these cover the pure
  * functions on adversarial strings, including non-ASCII).
  */
object BpeProperties extends Properties("Bpe") {

  private val wordGen: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'é', '語')).map(_.mkString))

  private val mergesGen: Gen[List[(String, String)]] =
    Gen.listOf(for {
      a <- Gen.oneOf("a", "b", "c", "ab", "bc", "é")
      b <- Gen.oneOf("a", "b", "c", "ab", "bc", "é")
    } yield (a, b))

  property("applyMerge preserves concatenation") =
    forAll(wordGen, Gen.oneOf("a", "b", "ab"), Gen.oneOf("a", "b", "c")) {
      (w, a, b) =>
        val seq: IndexedSeq[String] = w.map(_.toString)
        BpeTokenizer.applyMerge(seq, a, b).mkString("") == w
    }

  property("applyMerge output never contains the adjacent pair") =
    forAll(wordGen) { w =>
      val out = BpeTokenizer.applyMerge(w.map(_.toString), "a", "b")
      !out.iterator.sliding(2).withPartial(false)
        .exists(p => p.head == "a" && p.last == "b")
    }

  property("tokenizeWord round-trips under any merge list") =
    forAll(wordGen, mergesGen) { (w, merges) =>
      BpeTokenizer.tokenizeWord(w, merges).mkString("") == w
    }

  property("tokenizeWord never emits more symbols than characters") =
    forAll(wordGen, mergesGen) { (w, merges) =>
      w.isEmpty || BpeTokenizer.tokenizeWord(w, merges).length <= w.length
    }

  // --- distributed trainer vs a driver-side sequential reference ---
  //
  // The incremental/batched trainer must learn the EXACT sequence the
  // textbook one-merge-at-a-time loop learns: this pins both the
  // delta pair-count maintenance (a wrong delta shifts some round's
  // argmax) and selectBatch's order-equivalence rule (an unsafe batch
  // reorders merges). batchTop=4 forces the truncated-page wStop path.

  private lazy val spark = TestSpark.spark

  private def refTrain(words: Seq[(String, Long)], n: Int): Seq[(String, String)] = {
    var tbl: Seq[(IndexedSeq[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString): IndexedSeq[String], c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var go = true
    while (out.size < n && go) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      for ((s, c) <- tbl; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) += c
      val best = counts.toSeq
        .sortBy { case ((a, b), w) => (-w, a, b) }.headOption
      best match {
        case Some(((a, b), w)) if w >= 2L =>
          out += ((a, b))
          tbl = tbl.map { case (s, c) =>
            (BpeTokenizer.applyMerge(s, a, b), c) }
        case _ => go = false
      }
    }
    out.toSeq
  }

  private val tableGen: Gen[(Seq[(String, Long)], Int)] = for {
    nWords <- Gen.choose(1, 12)
    words <- Gen.listOfN(nWords, for {
      len <- Gen.choose(0, 8)
      w <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', 'd', 'e', 'f')).map(_.mkString)
      c <- Gen.choose(1L, 5L)
    } yield (w, c))
    n <- Gen.choose(1, 12)
  } yield (words, n)

  property("batched incremental training equals sequential training") = {
    import spark.implicits._
    forAll(tableGen) { case (words, n) =>
      val df = words.toDF("word", "cnt")
      // maxLocalWords = 0 forces the DISTRIBUTED incremental loop
      val got = BpeTokenizer.train(df, n, batchTop = 4, checkpointEvery = 3,
        maxLocalWords = 0L)
      got == refTrain(words, n)
    }
  }

  // Self-pair-dense axis: words over {a,b} with long repeat runs, so
  // (a,a)/(b,b) merges — the shape whose created pairs the batch
  // safety argument cannot bound (the progenitor is the member
  // itself; see selectBatch) — dominate every round instead of
  // appearing in ~1/600 random tables. This is the generator that
  // would have caught the self-pair batching bug on every run.
  private val runTableGen: Gen[(Seq[(String, Long)], Int)] = for {
    nWords <- Gen.choose(1, 8)
    words <- Gen.listOfN(nWords, for {
      runs <- Gen.choose(1, 4)
      w <- Gen.listOfN(runs, for {
        ch <- Gen.oneOf('a', 'b')
        len <- Gen.choose(1, 5)
      } yield ch.toString * len).map(_.mkString)
      c <- Gen.choose(1L, 5L)
    } yield (w, c))
    n <- Gen.choose(1, 10)
  } yield (words, n)

  property("batched training equals sequential on self-pair-dense tables") = {
    import spark.implicits._
    forAll(runTableGen) { case (words, n) =>
      val df = words.toDF("word", "cnt")
      val got = BpeTokenizer.train(df, n, batchTop = 4, checkpointEvery = 3,
        maxLocalWords = 0L)
      got == refTrain(words, n)
    }
  }

  property("driver-local delta training equals sequential training") =
    forAll(tableGen) { case (words, n) =>
      BpeTokenizer.trainLocal(words, n) == refTrain(words, n)
    }

  property("driver-local training equals sequential on self-pair-dense tables") =
    forAll(runTableGen) { case (words, n) =>
      BpeTokenizer.trainLocal(words, n) == refTrain(words, n)
    }
}
