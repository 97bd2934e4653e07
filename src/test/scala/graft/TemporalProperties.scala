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

  /** SCD2 history build vs a driver-side collapse of the same random
    * change streams: intervals tile each key's timeline (first change
    * opens, each close is the next change's instant, exactly one open
    * row per key) and consecutive versions never share an attribute.
    */
  private val scd2Gen: Gen[Seq[(Long, Long, String)]] = for {
    nKeys <- Gen.choose(1, 4)
    rows <- Gen.listOfN(40, for {
      k <- Gen.choose(0L, nKeys.toLong - 1)
      ts <- Gen.choose(0L, 30L)
      a <- Gen.oneOf("red", "green", "blue")
    } yield (k, ts, a))
  } yield rows.groupBy(r => (r._1, r._2)).values.map(_.head).toSeq

  property("scd2 equals driver-side change collapse") = forAll(scd2Gen) { rows =>
    import spark.implicits._
    val df = rows.zipWithIndex.map { case ((k, ts, a), i) =>
      (k, i.toLong, new Timestamp(ts * 1000L), a)
    }.toDF("user_id", "event_id", "ts", "attr")
    val got = TemporalQueries
      .scd2History(df, "user_id", "ts", "event_id", "attr")
      .select("user_id", "attr", "valid_from_us", "valid_to_us")
      .as[(Long, String, Long, Option[Long])].collect().toSet
    val want = rows.groupBy(_._1).flatMap { case (k, hist) =>
      val changes = hist.sortBy(_._2)
        .foldLeft(Vector.empty[(Long, String)]) { (acc, r) =>
          if (acc.nonEmpty && acc.last._2 == r._3) acc
          else acc :+ (r._2 * 1000000L, r._3)
        }
      changes.zipWithIndex.map { case ((from, a), i) =>
        (k, a, from,
          if (i + 1 < changes.length) Some(changes(i + 1)._1) else None)
      }
    }.toSet
    got == want
  }
}
