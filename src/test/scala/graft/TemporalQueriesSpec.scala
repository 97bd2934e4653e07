package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TemporalQueries

/** As-of join semantics on hand-built frames (the q75 DuckDB ASOF
  * differential is the corpus-scale gate; these pin the edge cases).
  */
class TemporalQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asof join picks the latest right row at-or-before, inclusive on ties") {
    val right = Seq(
      (1L, ts(10), "r10"), (1L, ts(20), "r20"), (1L, ts(30), "r30"),
      (2L, ts(100), "r100"))
      .toDF("user_id", "ts", "tag")
    val left = Seq(
      (101L, 1L, ts(5)),   // before any right row -> null
      (102L, 1L, ts(20)),  // exact tie -> inclusive, matches r20
      (103L, 1L, ts(25)),  // between -> r20
      (104L, 1L, ts(99)),  // after all -> r30
      (105L, 2L, ts(100)), // tie on the other key -> r100
      (106L, 3L, ts(50)))  // key with no right rows -> null
      .toDF("event_id", "user_id", "ts")
    val got = TemporalQueries
      .asofJoin(left, right, "user_id", "ts", Seq("tag"))
      .select("event_id", "tag").as[(Long, Option[String])]
      .collect().toMap
    assert(got == Map(
      101L -> None, 102L -> Some("r20"), 103L -> Some("r20"),
      104L -> Some("r30"), 105L -> Some("r100"), 106L -> None))
  }

  test("asof join plans a single shuffle on the key") {
    val right = Seq((1L, ts(10), "a")).toDF("user_id", "ts", "tag")
    val left = Seq((7L, 1L, ts(15))).toDF("event_id", "user_id", "ts")
    val df = TemporalQueries.asofJoin(left, right, "user_id", "ts", Seq("tag"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the AQE plan string repeats the tree (Final + Initial) — count
    // distinct exchange nodes by plan_id, not raw matches
    val exchanges = "Exchange hashpartitioning[^\n]*plan_id=(\\d+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet.size
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n$plan")
  }
}
