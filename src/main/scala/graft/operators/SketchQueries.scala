package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Mergeable-sketch rollups (Datasketches HLL via Spark's built-in
  * `hll_sketch_agg` / `hll_union_agg`).
  *
  * The pattern this pins is the one that matters at 100 TB: distinct
  * counts are pre-aggregated ONCE into per-group sketches (a few KB
  * each), and every coarser grain — including the global total — comes
  * from unioning the stored sketches, never from re-scanning the fact
  * table. `countDistinct` at a second grain is a full second shuffle of
  * the raw keys; `hll_union_agg` over the first grain's sketches is a
  * shuffle of kilobytes.
  */
object SketchQueries {

  /** Distinct customers per order priority AND overall, where the
    * overall estimate is derived by UNIONING the per-priority sketches
    * (re-aggregation) rather than re-scanning orders. Exact counts ride
    * along and hash against the oracle; the sketch estimates are gated
    * as within-2%-relative-error booleans (default lgConfigK=12 ⇒ rsd
    * ≈1.6% at large n, and near-exact at the test scales — the exact
    * match is the contract the driver hashes as literal TRUE).
    */
  def q77HllRollup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def ok(est: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =
      abs(est.cast("double") - exact.cast("double")) <= exact.cast("double") * 0.02
    val per = t.orders.groupBy("o_orderpriority")
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"),
        countDistinct(col("o_custkey")).as("exact_cust"))
    val perOut = per.select(col("o_orderpriority").as("grp"), col("exact_cust"),
      ok(hll_sketch_estimate(col("sk")), col("exact_cust")).as("sketch_ok"))
    // the global grain never touches orders again: union the 5 sketches
    val unioned = per.agg(hll_union_agg(col("sk")).as("sk"))
    val exactAll = t.orders.agg(countDistinct(col("o_custkey")).as("exact_cust"))
    val allOut = unioned.crossJoin(exactAll).select(
      lit("ALL").as("grp"), col("exact_cust"),
      ok(hll_sketch_estimate(col("sk")), col("exact_cust")).as("sketch_ok"))
    perOut.unionByName(allOut).orderBy("grp")
  }

  val q77Sql: String =
    """SELECT o_orderpriority AS grp,
      |  COUNT(DISTINCT o_custkey) AS exact_cust, TRUE AS sketch_ok
      |FROM orders GROUP BY o_orderpriority
      |UNION ALL
      |SELECT 'ALL' AS grp, COUNT(DISTINCT o_custkey) AS exact_cust,
      |  TRUE AS sketch_ok
      |FROM orders
      |ORDER BY grp""".stripMargin

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q77_hll_rollup" -> (q77HllRollup _),
  )

  val oracle: Map[String, String] = Map(
    "q77_hll_rollup" -> q77Sql,
  )
}
