package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning — the optimizer feature that, at
  * 100 TB, keeps a fact⋈fact join from shuffling rows the other side's
  * selective filter will drop anyway: Catalyst builds a bloom filter
  * over the filtered (creation) side's join keys and applies it as a
  * pre-shuffle semi-filter on the huge (application) side. This spec
  * pins that the engine's session configuration actually gets the
  * injection on the canonical shape (lineitem ⋈ σ(orders)) — if a conf
  * regression turned it off, 100 TB plans would silently shuffle the
  * full fact table.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("selective fact-fact join gets a bloom runtime filter on the big side") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // forbid broadcast so the join is a genuine shuffle join (the
      // 100 TB shape), and drop the size thresholds to test-data scale
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      val t = Tables(spark, "/root/testdata/sf0.01")
      val urgent = t.orders.filter(col("o_orderpriority") === "1-URGENT")
      val joined = t.lineitem
        .join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") &&
        optimized.contains("bloom_filter_agg"),
        s"no bloom runtime filter injected:\n$optimized")
      // and the filtered result is still correct
      val n = joined.collect().map(_.getAs[Long]("n")).sum
      val expect = t.lineitem.join(urgent, col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expect)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
