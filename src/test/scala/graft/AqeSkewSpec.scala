package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE runtime skew-join splitting — the other half of the skew story
  * next to SkewTools' deterministic salting: for sort-merge joins, AQE
  * detects oversized partitions at runtime and splits them across
  * tasks WITHOUT changing results. GraftSession enables it
  * (`spark.sql.adaptive.skewJoin.enabled`); this spec proves the
  * feature actually fires on a hot-key join at test scale (thresholds
  * lowered to test-data sizes) — a conf regression would otherwise
  * only show up as a straggler task on the cluster.
  */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE splits the skewed partition of a hot-key sort-merge join") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.shuffle.partitions", "8")
      import spark.implicits._
      // one key owns ~99% of the left rows: the canonical straggler.
      // Distinct right-side data so the two exchanges are not reused
      // (a self-joined ReusedExchange hides per-side skew stats).
      val leftRows = (1 to 60000).map(i => (0L, i.toLong)) ++
        (1 to 600).map(i => (i.toLong % 7 + 1, i.toLong))
      val rightRows = (0 to 7).flatMap(k => (1 to 50).map(i => (k.toLong, i * 10L)))
      // an incompressible payload must survive into the shuffle: skew
      // detection reads COMPRESSED map-output sizes, and 60k copies of
      // the same key alone lz4-compress to under any threshold
      val left = leftRows.toDF("k", "a")
        .withColumn("s", md5(col("a").cast("string")))
      val right = rightRows.toDF("k", "b")
      // a global aggregate places no distribution requirement on the
      // join output — a groupBy on the join key would, and AQE rightly
      // refuses to split a partition the next operator needs intact
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), max(col("s")).as("m"))
      val got = joined.collect()(0).getLong(0)
      val rightCounts = rightRows.groupBy(_._1).view.mapValues(_.size.toLong)
      val expected = leftRows.groupBy(_._1).view.mapValues(_.size.toLong)
        .map { case (k, c) => c * rightCounts.getOrElse(k, 0L) }.sum
      assert(got == expected, "skew split must not change the join result")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
