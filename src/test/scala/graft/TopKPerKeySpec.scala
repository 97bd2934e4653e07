package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{TopKPerKey, TopKPerKeyExec}

/** The custom grouped-top-k operator must match the window row_number
  * form exactly (given a total order) and plan as partial → exchange →
  * final with only k·keys rows crossing the shuffle.
  */
class TopKPerKeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val events = spark.read
    .parquet("/root/testdata/sf0.01/events.parquet")

  test("matches window row_number for k=1 and k=5") {
    for (k <- Seq(1, 5)) {
      val custom = TopKPerKey(events, Seq("user_id"),
        Seq(desc("value"), asc("event_id")), k)
        .select("user_id", "rank", "event_id", "value")
      val w = Window.partitionBy("user_id").orderBy(desc("value"), asc("event_id"))
      val windowed = events
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("user_id", "rank", "event_id", "value")
      assert(custom.exceptAll(windowed).count() == 0, s"k=$k extra rows")
      assert(windowed.exceptAll(custom).count() == 0, s"k=$k missing rows")
    }
  }

  test("plans as partial + final around one exchange") {
    val df = TopKPerKey(events, Seq("user_id"), Seq(desc("value"), asc("event_id")), 3)
    // AQE wraps the plan, so match on the rendered tree: final (rank
    // attr, partial=false) above the exchange, partial=true below it
    val planStr = df.queryExecution.executedPlan.toString
    val lines = planStr.linesIterator.toSeq
    val finalIdx = lines.indexWhere(l => l.contains("TopKPerKey") && l.contains("false, rank"))
    val exchangeIdx = lines.indexWhere(l => l.contains("Exchange hashpartitioning"))
    val partialIdx = lines.indexWhere(l => l.contains("TopKPerKey") && l.trim.endsWith("true"))
    assert(finalIdx >= 0 && exchangeIdx > finalIdx && partialIdx > exchangeIdx, planStr)
  }

  test("rank column is dense 1..k per key") {
    val df = TopKPerKey(events, Seq("user_id"), Seq(desc("value"), asc("event_id")), 3)
    val bad = df.groupBy("user_id")
      .agg(count(lit(1)).as("n"), min("rank").as("mn"), max("rank").as("mx"))
      .filter(col("mn") =!= 1 || col("mx") =!= col("n") || col("n") > 3)
    assert(bad.count() == 0)
  }

  test("collect() with the operator as plan root returns UnsafeRow-backed results") {
    // regression: the final phase used to emit GenericInternalRow, which
    // getByteArrayRdd cannot serialize — a bare .collect() (no projection
    // above the operator) threw ClassCastException
    val df = TopKPerKey(events, Seq("user_id"), Seq(desc("value"), asc("event_id")), 2)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getInt(r.fieldIndex("rank")) >= 1))
  }

  test("works after filters and projections") {
    val filtered = events.filter(col("event_type") === "click")
      .select("user_id", "event_id", "value")
    val df = TopKPerKey(filtered, Seq("user_id"), Seq(desc("value"), asc("event_id")), 2)
    assert(df.columns.toSeq == Seq("user_id", "event_id", "value", "rank"))
    assert(df.count() > 0)
  }
}
