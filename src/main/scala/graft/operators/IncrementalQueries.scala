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

  /** q92: Merkle-style table reconciliation — "are these two 100 TB
    * replicas identical, and if not, WHERE?" answered without a
    * row-by-row compare: each side reduces to 256 bucket checksums
    * (order-independent bit_xor of row hashes — one aggregate pass,
    * 256 rows out), and only the buckets whose checksums disagree are
    * drilled with a row-level join. v2 is the orders table; v1
    * simulates a drifted replica (keys % 997 == 0 missing, keys
    * % 1009 == 0 with a shifted price), so ~30 dirty keys land in a
    * handful of buckets and the drill join touches ONLY those — the
    * bucket filter pushes down ahead of the join, so the expensive
    * pass reads a few hundred rows, not the table.
    */
  /** Generic Merkle-style diff of two keyed tables: per-bucket xor
    * checksums on each side, then a row-level drill join over ONLY the
    * buckets whose (checksum, count) disagree. Output: one row per
    * dirty bucket with both side counts and the drilled number of
    * differing keys (missing on either side, or same key + different
    * payload).
    *
    * Detection is PROBABILISTIC, up to hash collision: drift is
    * invisible exactly when a bucket's (bit_xor of 60-bit row hashes,
    * count) both survive — e.g. two modified rows whose row-hash xors
    * cancel. For k drifted rows in a bucket that's a ~2⁻⁶⁰ event per
    * bucket (the xor of k ≥ 1 independent 60-bit deltas is uniform),
    * the same class of guarantee as any checksum-based reconciliation
    * — not an exact one. ReconcileProperties holds modulo the same
    * bound.
    */
  def merkleDiff(v1: DataFrame, v2: DataFrame, key: String, payload: String,
      buckets: Int): DataFrame = {
    import graft.functions.TextFunctions.md5Long60
    def keyed(df: DataFrame): DataFrame = df
      .withColumn("bucket",
        pmod(md5Long60(col(key).cast("string")), lit(buckets.toLong)))
      .withColumn("rh",
        md5Long60(concat(col(key).cast("string"), lit(":"),
          col(payload).cast("string"))))
    def checksums(df: DataFrame): DataFrame = keyed(df)
      .groupBy("bucket")
      .agg(expr("bit_xor(rh)").as("h"), count(lit(1)).as("n"))
    val dirty = checksums(v1).as("a")
      .join(checksums(v2).as("b"), Seq("bucket"), "full_outer")
      .filter(coalesce(col("a.h"), lit(0L)) =!= coalesce(col("b.h"), lit(0L)) ||
        coalesce(col("a.n"), lit(0L)) =!= coalesce(col("b.n"), lit(0L)))
      .select(col("bucket"), coalesce(col("a.n"), lit(0L)).as("n_v1"),
        coalesce(col("b.n"), lit(0L)).as("n_v2"))
    val dirtyBuckets = dirty.select("bucket")
    val d1 = keyed(v1).join(broadcast(dirtyBuckets), Seq("bucket"))
    val d2 = keyed(v2).join(broadcast(dirtyBuckets), Seq("bucket"))
    val drill = d1.select(col("bucket"), col(key).as("__k"), col("rh").as("rh1"))
      .join(d2.select(col("bucket"), col(key).as("__k"), col("rh").as("rh2")),
        Seq("bucket", "__k"), "full_outer")
      .filter(col("rh1").isNull || col("rh2").isNull || col("rh1") =!= col("rh2"))
      .groupBy("bucket").agg(count(lit(1)).as("n_changed_keys"))
    dirty.join(drill, Seq("bucket"), "left")
      .na.fill(0L, Seq("n_changed_keys"))
      .orderBy("bucket")
  }

  def q92MerkleDiff(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir).orders
    val cents = round(col("o_totalprice") * 100).cast("long")
    val v2 = orders.select(col("o_orderkey").as("k"), cents.as("cents"))
    val v1 = v2.filter(pmod(col("k"), lit(997L)) =!= 0L)
      .withColumn("cents", col("cents") +
        when(pmod(col("k"), lit(1009L)) === 0L, 100L).otherwise(0L))
    merkleDiff(v1, v2, "k", "cents", 256)
  }

  val q92Sql: String = {
    val bucket = s"(${OracleSql.md5Long60("k::VARCHAR")} % 256)"
    val rh = OracleSql.md5Long60("k::VARCHAR || ':' || cents::VARCHAR")
    s"""WITH v2 AS (
       |  SELECT o_orderkey AS k, round(o_totalprice * 100)::BIGINT AS cents
       |  FROM orders),
       |v1 AS (
       |  SELECT k, cents + CASE WHEN k % 1009 = 0 THEN 100 ELSE 0 END AS cents
       |  FROM v2 WHERE k % 997 <> 0),
       |k1 AS (SELECT k, cents, $bucket AS bucket, $rh AS rh FROM v1),
       |k2 AS (SELECT k, cents, $bucket AS bucket, $rh AS rh FROM v2),
       |c1 AS (SELECT bucket, bit_xor(rh) AS h, COUNT(*) AS n FROM k1 GROUP BY 1),
       |c2 AS (SELECT bucket, bit_xor(rh) AS h, COUNT(*) AS n FROM k2 GROUP BY 1),
       |dirty AS (
       |  SELECT COALESCE(c1.bucket, c2.bucket) AS bucket,
       |    COALESCE(c1.n, 0) AS n_v1, COALESCE(c2.n, 0) AS n_v2
       |  FROM c1 FULL OUTER JOIN c2 ON c1.bucket = c2.bucket
       |  WHERE COALESCE(c1.h, 0) <> COALESCE(c2.h, 0)
       |     OR COALESCE(c1.n, 0) <> COALESCE(c2.n, 0)),
       |drill AS (
       |  SELECT COALESCE(a.bucket, b.bucket) AS bucket,
       |    COUNT(*) AS n_changed_keys
       |  FROM (SELECT * FROM k1 WHERE bucket IN (SELECT bucket FROM dirty)) a
       |  FULL OUTER JOIN
       |       (SELECT * FROM k2 WHERE bucket IN (SELECT bucket FROM dirty)) b
       |    ON a.bucket = b.bucket AND a.k = b.k
       |  WHERE a.rh IS NULL OR b.rh IS NULL OR a.rh <> b.rh
       |  GROUP BY 1)
       |SELECT d.bucket, d.n_v1, d.n_v2,
       |  COALESCE(dr.n_changed_keys, 0) AS n_changed_keys
       |FROM dirty d LEFT JOIN drill dr ON d.bucket = dr.bucket
       |ORDER BY d.bucket""".stripMargin
  }

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q83_incremental_agg" -> (q83IncrementalAgg _),
    "q92_merkle_diff" -> (q92MerkleDiff _),
  )

  val oracle: Map[String, String] = Map(
    "q83_incremental_agg" -> q83Sql,
    "q92_merkle_diff" -> q92Sql,
  )
}
