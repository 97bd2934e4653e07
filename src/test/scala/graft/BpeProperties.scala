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
}
