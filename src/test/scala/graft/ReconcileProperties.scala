package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.VectorFunctions.md5Long60Local
import graft.operators.IncrementalQueries

/** Property: the Merkle bucket-checksum diff finds EXACTLY the drifted
  * keys — no false negatives (every deleted/modified key is counted in
  * its bucket), no false positives (clean replicas diff to zero rows),
  * on random tables with random drift.
  *
  * "No false negatives" holds UP TO HASH COLLISION, like any
  * checksum-based reconciliation: compensating drift inside one bucket
  * (row-hash xors cancelling with counts unchanged) is undetectable —
  * a ~2⁻⁶⁰-per-bucket event with the 60-bit row hash (see
  * merkleDiff's docstring). The generator draws payloads whose hash
  * deltas are effectively random, so the property tests the
  * construction, not a cryptographic absolute.
  */
object ReconcileProperties extends Properties("MerkleDiff") {
  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val buckets = 16

  private val caseGen: Gen[(Map[Long, Long], Set[Long], Map[Long, Long])] = for {
    n <- Gen.choose(1, 60)
    payloads <- Gen.listOfN(n, Gen.choose(0L, 1000L))
    base = payloads.zipWithIndex.map { case (p, k) => k.toLong -> p }.toMap
    deleted <- Gen.someOf(base.keys.toSeq)
    modified <- Gen.someOf((base.keys.toSet -- deleted).toSeq)
    deltas <- Gen.listOfN(modified.size, Gen.choose(1L, 99L))
  } yield (base, deleted.toSet, modified.zip(deltas).toMap)

  property("diff locates exactly the drifted keys") = forAll(caseGen) {
    case (base, deleted, modified) =>
      import spark.implicits._
      val v2 = base.toSeq.toDF("k", "p")
      val v1 = base.toSeq
        .filterNot { case (k, _) => deleted.contains(k) }
        .map { case (k, p) => (k, p + modified.getOrElse(k, 0L)) }
        .toDF("k", "p")
      val diff = IncrementalQueries.merkleDiff(v1, v2, "k", "p", buckets)
        .collect()
      val drifted = deleted ++ modified.keySet
      val gotChanged = diff.map(_.getAs[Long]("n_changed_keys")).sum
      val gotBuckets = diff.map(_.getAs[Long]("bucket")).toSet
      val wantBuckets = drifted.map(k => md5Long60Local(k.toString) % buckets)
      gotChanged == drifted.size && gotBuckets == wantBuckets
  }

  property("identical replicas diff to zero rows") = forAll(Gen.choose(1, 40)) { n =>
    import spark.implicits._
    val t = (0 until n).map(i => (i.toLong, i * 7L)).toDF("k", "p")
    IncrementalQueries.merkleDiff(t, t, "k", "p", buckets).count() == 0L
  }
}
