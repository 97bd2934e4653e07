package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewTools

/** Salted join must be result-identical to the plain join and must
  * actually spread a hot key across salt buckets.
  */
class SkewToolsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join == plain join on a skewed key distribution") {
    val events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    import spark.implicits._
    // event_type is the skewed key: 5 values over 10k rows
    val dim = Seq(("click", 1.0), ("view", 0.5), ("purchase", 10.0),
      ("error", 0.0), ("signup", 5.0)).toDF("event_type", "weight")
    val plain = events.join(dim, Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        sum((col("value") * col("weight")).cast("decimal(18,6)")).as("wsum"))
    val salted = SkewTools.saltedJoin(events, dim, "event_type",
      col("event_id"), salts = 8)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        sum((col("value") * col("weight")).cast("decimal(18,6)")).as("wsum"))
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("q78 executes a salted SHUFFLE join, not a broadcast") {
    val df = SkewTools.q78SaltedJoin(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      s"broadcast would bypass the salt:\n$plan")
    assert(plan.matches("(?s).*hashpartitioning\\(event_type[^)]*_salt.*"),
      s"join must shuffle on (event_type, _salt):\n$plan")
  }

  test("hot key scatters across all salt buckets") {
    val events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    val buckets = events
      .withColumn("_salt", pmod(xxhash64(col("event_id")), lit(8)))
      .filter(col("event_type") === "click")
      .select("_salt").distinct().count()
    assert(buckets == 8)
  }
}
