package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Physical-layout tooling: Z-order (Morton) clustering — the
  * multi-dimensional sort a lakehouse OPTIMIZE ZORDER runs so that ONE
  * file layout serves selective predicates on EITHER dimension.
  *
  * A single-column sort gives each file a tight range on that column
  * and the full range on every other; interleaving the bits of two
  * columns makes file boundaries trace a space-filling curve, so every
  * file covers a bounded BOX in (x, y) — min/max footer stats then
  * prune scans for x-slices AND y-slices. Curve buckets here are the
  * bits above 16 (boxes of ~256 customers × ~512 days), deep enough
  * that every test scale populates multiple boxes. The curve is pure integer
  * bit arithmetic (no library, no floats), so the oracle computes the
  * identical values. ZOrderSpec pins the actual pruning win on files
  * written in this order.
  */
object LayoutQueries {

  /** Morton-interleave the low 16 bits of `x` (even positions) and
    * `y` (odd positions) into a 32-bit Z-value.
    */
  def zInterleave16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** DuckDB twin of [[zInterleave16]]. */
  def zInterleave16Sql(x: String, y: String): String =
    (0 until 16).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** q90: Z-value clustering audit over orders on the 2-D key
    * (customer, order day): rows map onto the Morton curve, and the
    * top-4-bit curve buckets report their (x, y) bounding boxes — the
    * boxes a z-sorted file layout would expose to min/max pruning.
    * Every box bounds BOTH dimensions (a customer-sorted layout would
    * show day ranges spanning the full calendar). Pure projection +
    * one tiny aggregate: at 100 TB this is the audit you run after an
    * OPTIMIZE ZORDER pass to see clustering quality.
    */
  def q90ZorderCluster(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val x = pmod(col("o_custkey"), lit(65536L))
    val y = datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01")))
      .cast("long")
    t.orders
      .select(x.as("x"), y.as("y"))
      .withColumn("z", zInterleave16(col("x"), col("y")))
      .withColumn("bucket", shiftright(col("z"), 16))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"))
      .orderBy("bucket")
  }

  val q90Sql: String = {
    val z = zInterleave16Sql("x", "y")
    s"""WITH keyed AS (
       |  SELECT o_custkey % 65536 AS x,
       |    date_diff('day', DATE '1995-01-01', o_orderdate::DATE)::BIGINT AS y
       |  FROM orders),
       |zvals AS (SELECT x, y, $z AS z FROM keyed)
       |SELECT z >> 16 AS bucket, COUNT(*) AS n_rows,
       |  MIN(x)::BIGINT AS x_min, MAX(x)::BIGINT AS x_max,
       |  MIN(y)::BIGINT AS y_min, MAX(y)::BIGINT AS y_max
       |FROM zvals GROUP BY 1 ORDER BY bucket""".stripMargin
  }

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q90_zorder_cluster" -> (q90ZorderCluster _),
  )

  val oracle: Map[String, String] = Map(
    "q90_zorder_cluster" -> q90Sql,
  )
}
