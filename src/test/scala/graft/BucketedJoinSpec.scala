package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing evidence: two tables bucketed on the join key join
  * WITHOUT an exchange — the co-located-join layout the fact-to-fact
  * joins (orders⋈lineitem at 100 TB) rely on. Asserted from the
  * physical plan, not claimed from documentation.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed fact-to-fact join plans without a shuffle exchange") {
    // external-table paths in a temp dir (warehouse.dir is static conf;
    // explicit paths sidestep it)
    val wh = Files.createTempDirectory("graft-warehouse").toString
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")

    // disable broadcast so the join must pick a key-distributed plan
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
      val plan = joined.queryExecution.executedPlan.toString
      // both sides read pre-bucketed: the join itself needs no exchange
      // (the only exchange allowed is the tiny post-agg one)
      val joinSection = plan.split("HashAggregate").last
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
        !joinSection.contains("Exchange hashpartitioning(o_orderkey"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      // result sanity vs the unbucketed join
      val expect = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
      assert(joined.exceptAll(expect).count() == 0)
      assert(expect.exceptAll(joined).count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
