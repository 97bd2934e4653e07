package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CoreQueries

/** Specs for query shapes without a DuckDB oracle. */
class CoreQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx_count_distinct lands within the configured error bound") {
    val r = CoreQueries.q19ApproxDistinct(spark, "/root/testdata/sf0.01")
      .collect()(0)
    val exactCust = r.getAs[Long]("exact_cust").toDouble
    val approxCust = r.getAs[Long]("approx_cust").toDouble
    val exactDates = r.getAs[Long]("exact_dates").toDouble
    val approxDates = r.getAs[Long]("approx_dates").toDouble
    // rsd = 0.02; allow 5 sigma
    assert(math.abs(approxCust - exactCust) / exactCust < 0.10,
      s"cust: $approxCust vs $exactCust")
    assert(math.abs(approxDates - exactDates) / exactDates < 0.10,
      s"dates: $approxDates vs $exactDates")
  }
}
