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

  /** Rendezvous (highest-random-weight) shard of `key` among shards
    * 0..n-1: argmax over md5-derived weights, ties (cryptographically
    * negligible, but defined) to the highest shard id in BOTH engines.
    */
  def hrwShard(key: Column, n: Int): Column =
    array_max(array((0 until n).map(s => struct(
      graft.functions.TextFunctions
        .md5Long60(concat(lit(s"${s}_"), key.cast("string"))).as("h"),
      lit(s.toLong).as("s"))): _*)).getField("s")

  /** q134: rendezvous-sharding elasticity audit — the shard-assignment
    * layout for a serving tier (embedding index shards, cache nodes):
    * each doc goes to argmax_s md5(s || doc_id) (Thaler–Ravishankar
    * HRW). The audit reports per-shard balance AND what happens when
    * one shard is ADDED (8 → 9): with HRW, a doc either stays put or
    * moves to the NEW shard — never between old shards — so scaling
    * out reshuffles only ~1/(n+1) of the corpus. n_moved_elsewhere is
    * first-class output and must be 0: the invariant is visible in
    * the report, re-derived by the oracle, and asserted in the spec.
    * (Plain `hash mod n` moves (n-1)/n of all keys on the same event
    * — this operator is why you don't shard that way.)
    *
    * Scale shape: pure row-local projection (2·n md5s per row) + one
    * n-row aggregate; no shuffle beyond the rollup.
    */
  def q134RendezvousShards(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .select(col("doc_id"), col("n_chars"),
        hrwShard(col("doc_id"), 8).as("shard"),
        hrwShard(col("doc_id"), 9).as("shard_after"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("n_chars_total"),
        count(when(col("shard_after") === 8, 1)).as("n_moved_to_new"),
        count(when(col("shard_after") =!= col("shard") &&
          col("shard_after") =!= 8, 1)).as("n_moved_elsewhere"))
      .orderBy("shard")
  }

  val q134Sql: String = {
    def h(s: Int) = OracleSql.md5Long60(s"'${s}_' || doc_id::VARCHAR")
    def shard(n: Int): String = {
      val g = (0 until n).map(h).mkString("greatest(", ", ", ")")
      val whens = (n - 1).to(1, -1)
        .map(s => s"WHEN ${h(s)} = $g THEN $s").mkString(" ")
      s"(CASE $whens ELSE 0 END)"
    }
    s"""WITH assigned AS (
       |  SELECT doc_id, n_chars, ${shard(8)}::BIGINT AS shard,
       |    ${shard(9)}::BIGINT AS shard_after
       |  FROM documents)
       |SELECT shard, COUNT(*)::BIGINT AS n_docs,
       |  SUM(n_chars)::BIGINT AS n_chars_total,
       |  COUNT(*) FILTER (WHERE shard_after = 8)::BIGINT AS n_moved_to_new,
       |  COUNT(*) FILTER (WHERE shard_after <> shard AND shard_after <> 8)::BIGINT
       |    AS n_moved_elsewhere
       |FROM assigned GROUP BY shard ORDER BY shard""".stripMargin
  }

  /** q151: COMPACTION planner — the OPTIMIZE/bin-packing pass every
    * lakehouse table needs once small files accumulate: group the
    * per-(source, lang) partition sizes (the "files"), order
    * descending, and assign files to target-size output bins by
    * next-fit — bin b = exclusive-running-total div target, a pure
    * window expression, so the whole plan is computed declaratively
    * (no driver-side loop over file lists) and deterministically.
    * Greedy next-fit-decreasing overshoots a bin by less than one
    * file, which the fill report makes visible (fill_permille can
    * exceed 1000 by design — that's the documented semantics, not a
    * bug; bins also never underfill below target except the last).
    *
    * Scale shape: the corpus reduces to the |files| manifest in one
    * aggregate; planning is one window over the manifest — the same
    * shape at 100 TB, where the manifest is the table's file listing.
    */
  def q151CompactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val target = 8192L
    val t = Tables(spark, dir)
    val files = t.documents.groupBy("source", "lang")
      .agg(sum("n_chars").as("sz"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("sz").desc, col("source"), col("lang"))
    files
      .withColumn("prev", coalesce(sum("sz").over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("bin", expr(s"prev div $target"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_files"), sum("sz").as("total_chars"),
        max("sz").as("largest_file"),
        expr(s"(1000 * sum(sz)) div $target").as("fill_permille"))
      .orderBy("bin")
  }

  val q151Sql: String =
    """WITH files AS (
      |  SELECT source, lang, SUM(n_chars)::BIGINT AS sz
      |  FROM documents GROUP BY 1, 2),
      |planned AS (
      |  SELECT sz,
      |    COALESCE(SUM(sz) OVER (ORDER BY sz DESC, source, lang
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      // 8192 AS bin
      |  FROM files)
      |SELECT bin::BIGINT AS bin, COUNT(*)::BIGINT AS n_files,
      |  SUM(sz)::BIGINT AS total_chars, MAX(sz)::BIGINT AS largest_file,
      |  ((1000 * SUM(sz)) // 8192)::BIGINT AS fill_permille
      |FROM planned GROUP BY 1 ORDER BY 1""".stripMargin

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q90_zorder_cluster" -> (q90ZorderCluster _),
    "q134_rendezvous_shards" -> (q134RendezvousShards _),
    "q151_compaction_plan" -> (q151CompactionPlan _),
  )

  val oracle: Map[String, String] = Map(
    "q90_zorder_cluster" -> q90Sql,
    "q134_rendezvous_shards" -> q134Sql,
    "q151_compaction_plan" -> q151Sql,
  )
}
