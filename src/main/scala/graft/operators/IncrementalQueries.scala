package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Incremental view maintenance: keep an aggregate current by folding
  * a change batch into the previously materialized result instead of
  * rescanning the base table. The operator only works when every
  * measure is MERGEABLE (count/sum/min/max — and sketches, see q77);
  * money rides as integer cents so partial+final addition is exact
  * and associative, never a float whose value depends on reduction
  * order.
  *
  * This is the batch twin of the reference's ON CONFLICT counter
  * accumulation (ingest.py:405-416) and of SnapshotStore.mergeAdditive
  * — at 100 TB the "v1" side is a stored aggregate of a few thousand
  * rows, so maintenance cost is O(|delta| + |groups|), not O(|base|).
  */
object IncrementalQueries {

  /** q83: maintain a per-priority order aggregate under a 10% delta
    * batch. v1 = orders with o_orderkey % 10 != 0 (the "already
    * materialized" state), delta = the remaining rows (the change
    * batch). The engine computes partial aggregates of each side and
    * merges them — the delta-apply plan never touches v1's base rows
    * again. The oracle recomputes from the full table, proving the
    * incremental result IS the full result.
    */
  def q83IncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir).orders
    val cents = round(col("o_totalprice") * 100).cast("long")
    def partial(df: DataFrame): DataFrame = df
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(cents).as("cents"),
        min(col("o_orderdate")).as("first_date"),
        max(col("o_orderdate")).as("last_date"))
    val v1 = partial(orders.filter(pmod(col("o_orderkey"), lit(10L)) =!= 0L))
    val delta = partial(orders.filter(pmod(col("o_orderkey"), lit(10L)) === 0L))
    v1.unionByName(delta)
      .groupBy("o_orderpriority")
      .agg(sum("n").as("n_orders"), sum("cents").as("total_cents"),
        min("first_date").as("first_date"), max("last_date").as("last_date"))
      .orderBy("o_orderpriority")
  }

  val q83Sql: String =
    """SELECT o_orderpriority,
      |  COUNT(*) AS n_orders,
      |  SUM(round(o_totalprice * 100)::BIGINT)::BIGINT AS total_cents,
      |  min(o_orderdate) AS first_date,
      |  max(o_orderdate) AS last_date
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q83_incremental_agg" -> (q83IncrementalAgg _),
  )

  val oracle: Map[String, String] = Map(
    "q83_incremental_agg" -> q83Sql,
  )
}
