package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalQueries

/** Hot-cell behavior of the binned interval join: one flash-crowd
  * cell holding half the corpus must neither change results nor stay
  * a single-task straggler once density-conditional salting engages.
  *
  * Balance is asserted on the DETERMINISTIC per-join-key candidate
  * product (max |A-bucket|·|B-bucket| over (cell, lo, hi) keys) — the
  * quantity salting actually controls; a task's work is the sum of
  * its keys' products, so key-level balance bounds task-level skew
  * without racing wall-clock noise.
  */
class IntervalSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val gridUs = 600L * 1000000L

  // 400 sessions piled into cell 0 (every pair overlaps), 20 long
  // sessions spanning cells 0-3 (multi-cell dedup coverage), 400
  // singleton sessions alone in their own cold cells
  private def fixture = {
    val hot = (0 until 400).map { i =>
      (i.toLong, i * 1000L, i * 1000L + 300000000L)
    }
    val long = (0 until 20).map { i =>
      (500L + i, i * 2000L, 3L * gridUs + i * 1000L)
    }
    val cold = (0 until 400).map { i =>
      (1000L + i, (10L + i) * gridUs + i * 1000L, (10L + i) * gridUs + i * 1000L + 1000000L)
    }
    (hot ++ long ++ cold, hot ++ long ++ cold)
  }

  private def expectedPairs(rows: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    (for {
      a <- rows; b <- rows if a._1 < b._1
      if a._2 <= b._3 && b._2 <= a._3
    } yield (a._1, b._1, math.min(a._3, b._3) - math.max(a._2, b._2))).toSet

  test("salting is result-invariant on a 50%-in-one-cell fixture") {
    import spark.implicits._
    val (rows, _) = fixture
    val sess = rows.toDF("sid", "start_us", "end_us")
    val want = expectedPairs(rows)
    val unsalted = TemporalQueries
      .overlappingIntervalPairs(sess, gridUs, hotDensity = Int.MaxValue, salts = 8)
      .as[(Long, Long, Long)].collect().toSet
    val salted = TemporalQueries
      .overlappingIntervalPairs(sess, gridUs, hotDensity = 100, salts = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(unsalted == want, "unsalted pairs differ from the all-pairs scan")
    assert(salted == want, "salting changed the result")
  }

  test("salting splits the hot cell's candidate work ≥8×") {
    import spark.implicits._
    val (rows, _) = fixture
    val sess = rows.toDF("sid", "start_us", "end_us")
    val cells = sess
      .select(explode(sequence(expr(s"start_us div $gridUs"),
        expr(s"end_us div $gridUs"))).as("cell"), col("sid"))
    // unsalted: each cell is one join key with density² candidates
    val unsaltedMax = cells.groupBy("cell").count()
      .agg(max(col("count") * col("count"))).as[Long].head()
    // salted: mirror the bucket assignment (pmod(xxhash64(sid), k));
    // key (cell, lo, hi) pairs bucket lo against bucket hi
    val buckets = cells
      .withColumn("b", pmod(xxhash64(col("sid")), lit(8)))
      .groupBy("cell", "b").count()
    val saltedMax = buckets.as("x").join(buckets.as("y"),
        col("x.cell") === col("y.cell") && col("x.b") <= col("y.b"))
      .agg(max(col("x.count") * col("y.count"))).as[Long].head()
    assert(unsaltedMax >= 400L * 400L, "fixture lost its hot cell")
    assert(saltedMax * 8 <= unsaltedMax,
      s"expected ≥8× balance win, got $unsaltedMax -> $saltedMax")
  }
}
