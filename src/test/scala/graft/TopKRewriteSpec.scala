package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TopKPerKeyPlan

/** The row_number ≤ k idiom must replan onto TopKPerKeyPlan with the
  * original attribute preserved, residual predicates kept, and
  * multi-window-function plans left untouched.
  */
class TopKRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val events = spark.read
    .parquet("/root/testdata/sf0.01/events.parquet")

  private def hasTopK(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect { case t: TopKPerKeyPlan => t }.nonEmpty

  test("row_number <= k rewrites to the custom operator") {
    val w = Window.partitionBy("user_id").orderBy(desc("value"), asc("event_id"))
    val df = events.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    assert(hasTopK(df), df.queryExecution.optimizedPlan.toString)
    // the rn column survives with correct values
    val bad = df.groupBy("user_id").agg(max("rn").as("mx"))
      .filter(col("mx") > 3)
    assert(bad.count() == 0)
  }

  test("rn === 1 (argmax) rewrites; extra conjuncts are preserved") {
    val w = Window.partitionBy("user_id").orderBy(desc("value"), asc("event_id"))
    val df = events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
    assert(hasTopK(df), df.queryExecution.optimizedPlan.toString)
    assert(df.filter(col("event_type") === "error").count() == 0)
    // equality with the unrewritable two-window form of the same query
    val w2 = Window.partitionBy("user_id").orderBy(desc("value"), asc("event_id"))
    val reference = events
      .withColumn("rn", row_number().over(w2))
      .withColumn("rk", rank().over(w2)) // second window fn blocks the rule
      .filter(col("rn") === 1 && col("event_type") =!= "error")
      .drop("rk")
    assert(df.exceptAll(reference).count() == 0)
    assert(reference.exceptAll(df).count() == 0)
  }

  test("spark.graft.rewrite.topk=false disables the rewrite") {
    val w = Window.partitionBy("user_id").orderBy(desc("value"), asc("event_id"))
    spark.conf.set(graft.plans.TopKRewrite.ConfKey, "false")
    try {
      val df = events.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      assert(!hasTopK(df), "rewrite fired despite the conf gate")
    } finally spark.conf.unset(graft.plans.TopKRewrite.ConfKey)
  }

  test("plans with other window functions are not rewritten") {
    val w = Window.partitionBy("user_id").orderBy(desc("value"))
    val df = events.withColumn("rk", rank().over(w)).filter(col("rk") <= 2)
    assert(!hasTopK(df))
  }

  test("unpartitioned row_number is not rewritten") {
    val w = Window.orderBy(desc("value"), asc("event_id"))
    val df = events.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
    assert(!hasTopK(df))
  }
}
