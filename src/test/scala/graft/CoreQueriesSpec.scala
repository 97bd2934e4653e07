package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CoreQueries

/** Specs for query shapes without a DuckDB oracle. */
class CoreQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx_count_distinct lands within the configured error bound") {
    val r = CoreQueries.q19ApproxDistinct(spark, "/root/testdata/sf0.01")
      .collect()(0)
    // the query itself asserts |approx - exact| <= 5% * exact; these
    // booleans are what the driver hashes against literal TRUEs
    assert(r.getAs[Boolean]("approx_cust_ok"),
      s"cust approx outside 5% of ${r.getAs[Long]("exact_cust")}")
    assert(r.getAs[Boolean]("approx_dates_ok"),
      s"dates approx outside 5% of ${r.getAs[Long]("exact_dates")}")
    assert(r.getAs[Long]("exact_cust") > 0 && r.getAs[Long]("exact_dates") > 0)
  }
}
