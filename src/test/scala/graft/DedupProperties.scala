package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.DedupQueries

/** Property: the prefix-filtered similarity join finds EXACTLY the
  * pairs an all-pairs scan finds — the prefix principle must lose
  * nothing at any threshold, set size, or token-frequency skew (the
  * generator mixes a small hot vocabulary with rare tokens to stress
  * the rarest-first ordering).
  */
object DedupProperties extends Properties("PrefixJaccard") {
  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val vocabHot = (0 until 6).map(i => s"hot$i")
  private val vocabRare = (0 until 40).map(i => s"rare$i")

  private val caseGen: Gen[(Seq[Seq[String]], Double)] = for {
    nDocs <- Gen.choose(2, 18)
    docs <- Gen.listOfN(nDocs, for {
      nHot <- Gen.choose(0, 5)
      nRare <- Gen.choose(0, 6)
      hot <- Gen.pick(nHot, vocabHot)
      rare <- Gen.pick(nRare, vocabRare)
    } yield (hot ++ rare).toSeq)
    t <- Gen.oneOf(0.5, 0.7, 0.9)
  } yield (docs.map(_.distinct), t)

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty || b.isEmpty) 0.0
    else a.intersect(b).size.toDouble / a.union(b).size.toDouble

  property("prefix filter loses no qualifying pair") = forAll(caseGen) {
    case (docs, t) =>
      import spark.implicits._
      val sets = docs.zipWithIndex.map { case (toks, i) => (i.toLong, toks) }
        .toDF("doc_id", "toks")
      val got = DedupQueries.prefixJaccardPairs(sets, t)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      // hotPostings = 0 forces EVERY token through the salted
      // triangle-partitioned path — salting must be result-invariant
      val gotSalted = DedupQueries
        .prefixJaccardPairs(sets, t, hotPostings = 0, salts = 4)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val want = (for {
        a <- docs.indices; b <- docs.indices if a < b
        if jaccard(docs(a).toSet, docs(b).toSet) >= t
      } yield (a.toLong, b.toLong)).toSet
      got == want && gotSalted == want
  }
}
