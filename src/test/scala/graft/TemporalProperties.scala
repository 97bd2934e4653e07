package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.TemporalQueries

/** Property: the distributed as-of join equals a driver-side brute
  * force (per left row: the qualifying right row with the greatest
  * ts <= left.ts) on random event histories. Right-side (key, ts)
  * pairs are unique by construction — the operator's documented
  * determinism precondition (q75 verifies it holds on the corpus).
  */
object TemporalProperties extends Properties("AsofJoin") {
  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val caseGen: Gen[(Seq[(Long, Long)], Seq[(Long, Long, Double)])] = for {
    nKeys <- Gen.choose(1, 4)
    nLeft <- Gen.choose(0, 25)
    left <- Gen.listOfN(nLeft, for {
      k <- Gen.choose(0L, nKeys.toLong - 1)
      ts <- Gen.choose(0L, 50L)
    } yield (k, ts))
    rightRaw <- Gen.listOfN(30, for {
      k <- Gen.choose(0L, nKeys.toLong - 1)
      ts <- Gen.choose(0L, 50L)
      v <- Gen.choose(-100, 100)
    } yield (k, ts, v.toDouble))
  } yield (left, rightRaw.groupBy(r => (r._1, r._2)).values.map(_.head).toSeq)

  property("equals driver-side brute force") = forAll(caseGen) {
    case (left, right) =>
      import spark.implicits._
      val leftDf = left.zipWithIndex.map { case ((k, ts), i) =>
        (i.toLong, k, new Timestamp(ts * 1000L))
      }.toDF("event_id", "user_id", "ts")
      val rightDf = right.map { case (k, ts, v) =>
        (k, new Timestamp(ts * 1000L), v)
      }.toDF("user_id", "ts", "v")
      val got = TemporalQueries
        .asofJoin(leftDf, rightDf, "user_id", "ts", Seq("v"))
        .select("event_id", "v").as[(Long, Option[Double])]
        .collect().toMap
      val want = left.zipWithIndex.map { case ((k, lts), i) =>
        val cands = right.filter(r => r._1 == k && r._2 <= lts)
        i.toLong -> (if (cands.isEmpty) None
                     else Some(cands.maxBy(_._2)._3))
      }.toMap
      got == want
  }
}
