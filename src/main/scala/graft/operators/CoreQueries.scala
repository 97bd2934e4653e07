package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Core relational operator inventory (SURVEY.md §2.2-2.7) expressed
  * over the driver test tables.
  *
  * Conventions shared with the DuckDB oracles:
  *   - Money/measure sums cast element-wise to DECIMAL before SUM so
  *     aggregation is exact and order-independent (a double sum would
  *     depend on partition merge order at scale), then cast back to
  *     DOUBLE for a stable output type.
  *   - Every result carries a total deterministic ORDER BY.
  *   - Aggregate/computed columns are aliased identically in the Spark
  *     plan and the oracle SQL (driver hash-compares by column name).
  *
  * Scale notes are on each query: what Catalyst plans today and why
  * that plan survives 1000 executors / 100 TB.
  */
object CoreQueries {

  /** TPC-H Q1 shape — pricing summary (SURVEY G1/G3/G10, data_quality.py:62-165).
    * Single scan, partial+final hash agg on 6 grouping values; no shuffle
    * pressure at any scale (map-side combine reduces to #groups rows).
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)"))
          .cast("double").as("sum_disc_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
          .cast("decimal(18,6)")).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Group-count top-k (SURVEY G2/O4, data_quality.py:96-135).
    * orderBy+limit plans as TakeOrderedAndProject — only k rows cross
    * the final exchange regardless of group count.
    */
  def q2TopkGroups(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), max("ts").as("last_seen"))
      .orderBy(desc("cnt"), asc("event_type"))
      .limit(10)
  }

  val q2Sql: String =
    """SELECT event_type, COUNT(*) AS cnt, MAX(ts) AS last_seen
      |FROM events GROUP BY event_type
      |ORDER BY cnt DESC, event_type LIMIT 10""".stripMargin

  /** Conditional counts in one pass (SURVEY G3, data_quality.py:138-165).
    * count(when(...)) compiles to a single scan with 5 accumulators —
    * the same one-pass FILTER shape the reference uses.
    */
  def q3ConditionalCounts(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders.agg(
      count(lit(1)).as("n_total"),
      count(when(col("o_orderstatus") === "O", 1)).as("n_open"),
      count(when(col("o_orderpriority") === "1-URGENT", 1)).as("n_urgent"),
      count(when(col("o_totalprice") > 100000.0, 1)).as("n_big"),
      count(when(year(col("o_orderdate")) >= 1998, 1)).as("n_recent"))
  }

  val q3Sql: String =
    """SELECT COUNT(*) AS n_total,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
      |  COUNT(*) FILTER (WHERE o_totalprice > 100000.0) AS n_big,
      |  COUNT(*) FILTER (WHERE EXTRACT(YEAR FROM o_orderdate) >= 1998) AS n_recent
      |FROM orders""".stripMargin

  /** Min/max sanity (SURVEY G4, data_quality.py:168-216). */
  def q4MinMax(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem.agg(
      min("l_shipdate").as("min_ship"),
      max("l_shipdate").as("max_ship"),
      count(lit(1)).as("n_rows"))
  }

  val q4Sql: String =
    "SELECT MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship, COUNT(*) AS n_rows FROM lineitem"

  /** Boolean-OR rollup (SURVEY G5, data_quality.py:248-283): per-order
    * flags then a count-filter over the rollup. Two hash aggs; the
    * second input is one row per order (map-side combined).
    */
  def q5BoolRollup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy("l_orderkey")
      .agg(
        expr("bool_or(l_returnflag = 'R')").as("has_return"),
        expr("bool_or(l_linestatus = 'F')").as("has_finished"))
      .agg(
        count(lit(1)).as("n_orders"),
        count(when(col("has_return"), 1)).as("n_with_return"),
        count(when(col("has_finished"), 1)).as("n_with_finished"),
        count(when(col("has_return") && col("has_finished"), 1)).as("n_both"))
  }

  val q5Sql: String =
    """WITH per_order AS (
      |  SELECT l_orderkey,
      |    BOOL_OR(l_returnflag = 'R') AS has_return,
      |    BOOL_OR(l_linestatus = 'F') AS has_finished
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT COUNT(*) AS n_orders,
      |  COUNT(*) FILTER (WHERE has_return) AS n_with_return,
      |  COUNT(*) FILTER (WHERE has_finished) AS n_with_finished,
      |  COUNT(*) FILTER (WHERE has_return AND has_finished) AS n_both
      |FROM per_order""".stripMargin

  /** Distinct counts (SURVEY G6, data_quality.py:219-245). Exact here;
    * the 100 TB variant swaps in approx_count_distinct (see
    * StatsQueries.approxDistinct).
    */
  def q6DistinctCounts(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.agg(
      countDistinct(col("c_name")).as("d_name"),
      countDistinct(col("c_mktsegment")).as("d_segment"),
      countDistinct(col("c_nationkey")).as("d_nation"),
      count(lit(1)).as("n_rows"))
  }

  val q6Sql: String =
    """SELECT COUNT(DISTINCT c_name) AS d_name,
      |  COUNT(DISTINCT c_mktsegment) AS d_segment,
      |  COUNT(DISTINCT c_nationkey) AS d_nation,
      |  COUNT(*) AS n_rows FROM customer""".stripMargin

  /** Daily rollup (SURVEY G8, data_quality.py:304-317). Grouping on
    * to_date(ts) — at scale the events table would be date-partitioned
    * and this becomes a partition-local agg.
    */
  def q7DailyRollup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy(desc("day"))
  }

  val q7Sql: String =
    """SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY day DESC""".stripMargin

  /** Left-outer dim joins (SURVEY J1/J2, api.py:183-196). nation and
    * region are broadcast — no shuffle of the fact side at any scale.
    */
  def q8JoinDims(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name"))
      .orderBy("c_custkey")
  }

  val q8Sql: String =
    """SELECT c_custkey, c_name, n_name, r_name
      |FROM customer
      |LEFT JOIN nation ON c_nationkey = n_nationkey
      |LEFT JOIN region ON n_regionkey = r_regionkey
      |ORDER BY c_custkey""".stripMargin

  /** Anti join (SURVEY J6, rag.py:97-104): customers with no orders. */
  def q9AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  val q9Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Semi join: suppliers that shipped at least one late-ship line. */
  def q9bSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val late = t.lineitem.filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp"))
    t.supplier
      .join(late, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  val q9bSql: String =
    """SELECT s_suppkey, s_name FROM supplier s
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |  WHERE l.l_suppkey = s.s_suppkey AND l.l_shipdate >= TIMESTAMP '2000-01-01 00:00:00')
      |ORDER BY s_suppkey""".stripMargin

  /** Argmax per group (SURVEY G12/W1, rag.py:207-224): best event per
    * user via a ranking window. One shuffle on user_id; the sort is
    * per-partition.
    */
  def q10Argmax(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy("user_id").orderBy(desc("value"), asc("event_id"))
    t.events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")
  }

  val q10Sql: String =
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
      |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** Top-N sort+limit (SURVEY O1, api.py:194-195): plans as
    * TakeOrderedAndProject — each partition keeps 200 rows, driver
    * merges; never a full sort.
    */
  def q11Top200(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .orderBy(desc("o_orderdate"), asc("o_orderkey"))
      .limit(200)
  }

  val q11Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders
      |ORDER BY o_orderdate DESC, o_orderkey LIMIT 200""".stripMargin

  /** Last-write-wins dedup (SURVEY W2, ingest.py:611-644): keep the
    * newest event per (user_id, event_type).
    */
  def q12LastWinDedup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(desc("ts"), desc("event_id"))
    t.events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "ts")
      .orderBy("user_id", "event_type")
  }

  val q12Sql: String =
    """SELECT user_id, event_type, event_id, ts FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  /** Fact-to-fact join + dim join + agg (SURVEY J8/G-family): revenue
    * per nation. customer and nation broadcast; orders⋈lineitem is the
    * only real shuffle (both sides hashed on orderkey — at 100 TB this
    * is the bucketing candidate).
    */
  def q13RevenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer.select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)"))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  val q13Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** Error-ledger dedup shape (SURVEY G11, ingest.py:226-249):
    * same-key occurrences collapse to one row with retry_count.
    */
  def q14RetryDedup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .filter(col("event_type") === "error")
      .groupBy("user_id", "event_type")
      .agg(
        (count(lit(1)) - 1).as("retry_count"),
        min("ts").as("first_seen"),
        max("ts").as("last_seen"))
      .orderBy("user_id")
  }

  val q14Sql: String =
    """SELECT user_id, event_type, COUNT(*) - 1 AS retry_count,
      |  MIN(ts) AS first_seen, MAX(ts) AS last_seen
      |FROM events WHERE event_type = 'error'
      |GROUP BY user_id, event_type ORDER BY user_id""".stripMargin

  /** Prefix match (SURVEY P12, data_quality.py:189-208). The leading-
    * wildcard-free LIKE is sargable: Parquet dictionary/min-max
    * pruning applies.
    */
  def q15PrefixMatch(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.part
      .filter(col("p_type").startsWith("S"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("p_brand"))
  }

  val q15Sql: String =
    """SELECT p_brand, COUNT(*) AS cnt FROM part
      |WHERE p_type LIKE 'S%'
      |GROUP BY p_brand ORDER BY cnt DESC, p_brand""".stripMargin

  /** Point lookup (SURVEY P7, api.py:229-244): Parquet min/max pruning
    * stands in for the reference's B-tree index.
    */
  def q16PointLookup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .filter(col("o_orderkey") === 42L)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
  }

  val q16Sql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
      |FROM orders WHERE o_orderkey = 42""".stripMargin

  /** Date-range + null-handling filters (SURVEY P8/P9). */
  def q17RangeFilter(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .filter(coalesce(nullif(col("o_orderpriority"), lit("")), lit("NONE")) =!= "NONE")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy("o_orderpriority")
  }

  val q17Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND COALESCE(NULLIF(o_orderpriority, ''), 'NONE') <> 'NONE'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Insert/update classification join (SURVEY J10, ingest.py:627):
    * batch keys vs prior-snapshot keys → inserted flag. Modeled as
    * orders-keys vs customer-keys.
    */
  def q18ClassifyJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val prior = t.orders.filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_custkey").as("prior_custkey")).distinct()
    t.customer
      .join(prior, col("c_custkey") === col("prior_custkey"), "left")
      .withColumn("is_new", col("prior_custkey").isNull)
      .groupBy("is_new")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("is_new")
  }

  val q18Sql: String =
    """WITH prior AS (SELECT DISTINCT o_custkey FROM orders
      |  WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
      |SELECT (o_custkey IS NULL) AS is_new, COUNT(*) AS cnt
      |FROM customer LEFT JOIN prior ON c_custkey = o_custkey
      |GROUP BY 1 ORDER BY is_new""".stripMargin

  /** G6 at scale: HLL approx-distinct next to the exact counts. The
    * HLL estimates themselves are engine-specific (DuckDB cannot
    * reproduce Spark's sketch), so the checkable contract is: the
    * exact counts hash against the oracle, and the approx estimates
    * are emitted as within-relative-error booleans (oracled as TRUE).
    * A sketch regression past the 10% bound flips the driver's hash —
    * 10% is 5 sigma for rsd=0.02, so a legitimate HLL estimate at an
    * unseen scale factor cannot plausibly flip it (5% was only
    * ~2.5 sigma). The spec in CoreQueriesSpec pins the raw estimates.
    */
  def q19ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def withinRel(approx: Column, exact: Column): Column =
      abs(approx.cast("double") - exact.cast("double")) <= exact.cast("double") * 0.10
    t.orders.agg(
      countDistinct(col("o_custkey")).as("exact_cust"),
      approx_count_distinct(col("o_custkey"), 0.02).as("approx_cust"),
      countDistinct(col("o_orderdate")).as("exact_dates"),
      approx_count_distinct(col("o_orderdate"), 0.02).as("approx_dates"))
      .select(col("exact_cust"),
        withinRel(col("approx_cust"), col("exact_cust")).as("approx_cust_ok"),
        col("exact_dates"),
        withinRel(col("approx_dates"), col("exact_dates")).as("approx_dates_ok"))
  }

  val q19Sql: String =
    """SELECT COUNT(DISTINCT o_custkey) AS exact_cust, TRUE AS approx_cust_ok,
      |  COUNT(DISTINCT o_orderdate) AS exact_dates, TRUE AS approx_dates_ok
      |FROM orders""".stripMargin

  /** Tumbling-window aggregation in batch mode (the batch twin of
    * EventStreams.windowedCounts): Spark's `window()` generator vs
    * DuckDB's time_bucket.
    */
  def q28TumblingWindow(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")
  }

  val q28Sql: String =
    """SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** ROLLUP hierarchy totals (status × priority + subtotals + grand
    * total) — grouping-set coverage beyond the reference's plain
    * GROUP BYs.
    */
  def q29Rollup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
  }

  val q29Sql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** CUBE over (status, priority): all four grouping sets in one scan
    * with partial aggregation before the single exchange — completes
    * the grouping-set family next to q29's ROLLUP. grouping_id
    * disambiguates genuine NULL keys from subtotal rows.
    */
  def q56Cube(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
        grouping_id(col("o_orderstatus"), col("o_orderpriority"))
          .cast("long").as("gid"))
      .orderBy(asc("gid"), asc_nulls_first("o_orderstatus"),
        asc_nulls_first("o_orderpriority"))
      .select("gid", "o_orderstatus", "o_orderpriority", "cnt", "sum_price")
  }

  val q56Sql: String =
    """SELECT GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
      |  o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Approximate percentiles next to exact ones, contract-oracled like
    * q19: the exact quantiles hash against DuckDB, the sketch
    * estimates are emitted as within-rank-error booleans (oracled as
    * TRUE). approx_percentile's accuracy parameter 10000 bounds rank
    * error at 1/10000; the contract allows 1% of the value RANGE via
    * the exact p1/p99 spread, generous enough to never flip on a
    * legitimate sketch at any scale factor.
    */
  def q57ApproxPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val agg = t.orders.agg(
      expr("percentile(o_totalprice, 0.5)").as("exact_p50"),
      expr("percentile(o_totalprice, 0.99)").as("exact_p99"),
      expr("percentile(o_totalprice, 0.01)").as("exact_p01"),
      expr("approx_percentile(o_totalprice, 0.5, 10000)").as("ap50"),
      expr("approx_percentile(o_totalprice, 0.99, 10000)").as("ap99"))
    agg.select(
      col("exact_p50"), col("exact_p99"),
      (abs(col("ap50") - col("exact_p50")) <=
        (col("exact_p99") - col("exact_p01")) * 0.01d).as("approx_p50_ok"),
      (abs(col("ap99") - col("exact_p99")) <=
        (col("exact_p99") - col("exact_p01")) * 0.01d).as("approx_p99_ok"))
  }

  val q57Sql: String =
    """SELECT quantile_cont(o_totalprice, 0.5) AS exact_p50,
      |  quantile_cont(o_totalprice, 0.99) AS exact_p99,
      |  TRUE AS approx_p50_ok, TRUE AS approx_p99_ok
      |FROM orders""".stripMargin

  /** Full-outer reconciliation — the one join flavor the inventory
    * lacked: daily order counts vs daily event counts, keyed on day,
    * with COALESCE closing the gaps on both sides. The classic
    * "compare two pipelines' outputs" audit query; both inputs
    * pre-aggregate before the join so the shuffle carries days, not
    * rows.
    */
  def q58FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val orders = t.orders.groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).as("n_orders"))
    val events = t.events.groupBy(to_date(col("ts")).cast("timestamp").as("day"))
      .agg(count(lit(1)).as("n_events"))
    orders.join(events, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .filter(col("n_orders") === 0 || col("n_events") === 0)
      .orderBy("day")
  }

  val q58Sql: String =
    """WITH o AS (SELECT o_orderdate AS day, COUNT(*) AS n_orders
      |  FROM orders GROUP BY 1),
      |e AS (SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, COUNT(*) AS n_events
      |  FROM events GROUP BY 1)
      |SELECT COALESCE(o.day, e.day) AS day,
      |  COALESCE(n_orders, 0) AS n_orders, COALESCE(n_events, 0) AS n_events
      |FROM o FULL OUTER JOIN e ON o.day = e.day
      |WHERE COALESCE(n_orders, 0) = 0 OR COALESCE(n_events, 0) = 0
      |ORDER BY day""".stripMargin

  /** JSON path functions (§2.8 tail): documents render a JSON envelope
    * (byte-identical literal construction on both engines) and the
    * fields are pulled back out with path extraction — the
    * get_json_object / json_extract pairing an ingest layer leans on
    * when payloads arrive as JSON strings inside columns.
    */
  def q59JsonPaths(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .withColumn("j", concat(lit("{\"id\":"), col("doc_id"),
        lit(",\"meta\":{\"lang\":\""), col("lang"),
        lit("\",\"source\":\""), col("source"), lit("\"}}")))
      .select(
        get_json_object(col("j"), "$.meta.lang").as("lang_out"),
        get_json_object(col("j"), "$.id").cast("long").as("id_out"))
      .groupBy("lang_out")
      .agg(count(lit(1)).as("n"), sum("id_out").as("sum_ids"))
      .orderBy("lang_out")
  }

  val q59Sql: String =
    """WITH j AS (
      |  SELECT '{"id":' || doc_id || ',"meta":{"lang":"' || lang ||
      |    '","source":"' || source || '"}}' AS j
      |  FROM documents)
      |SELECT json_extract_string(j, '$.meta.lang') AS lang_out,
      |  COUNT(*) AS n,
      |  SUM(json_extract_string(j, '$.id')::BIGINT)::BIGINT AS sum_ids
      |FROM j GROUP BY 1 ORDER BY lang_out""".stripMargin

  /** PIVOT: long → wide on an explicit value list (explicit so the
    * output schema is static — the form that scales, since a dynamic
    * pivot needs a driver-side distinct pass first). One hash
    * aggregate; each pivot cell is a count-filter accumulator.
    */
  def q70Pivot(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o", "P" -> "n_p"))
      .orderBy("o_orderpriority")
  }

  val q70Sql: String =
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** UNPIVOT (melt): wide → long over the three customer measure
    * columns — a pure per-row expansion (Generate), no shuffle until
    * the output sort.
    */
  def q71Unpivot(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .filter(col("c_custkey") <= 50)
      .select(col("c_custkey"), col("c_acctbal").cast("double").as("acctbal"),
        col("c_nationkey").cast("double").as("nationkey"))
      .unpivot(Array(col("c_custkey")),
        Array(col("acctbal"), col("nationkey")), "measure", "value")
      .orderBy("c_custkey", "measure")
  }

  val q71Sql: String =
    """SELECT c_custkey, measure, value FROM (
      |  SELECT c_custkey, 'acctbal' AS measure, c_acctbal::DOUBLE AS value
      |  FROM customer WHERE c_custkey <= 50
      |  UNION ALL
      |  SELECT c_custkey, 'nationkey', c_nationkey::DOUBLE
      |  FROM customer WHERE c_custkey <= 50)
      |ORDER BY c_custkey, measure""".stripMargin

  /** Grouped top-3 via the custom TopKPerKey operator (full
    * LogicalPlan → Strategy → heap-based physical exec with map-side
    * partial, graft.plans.TopKPerKey) — the same result the q10/q45
    * ROW_NUMBER oracle computes, without sorting every row: at most
    * k·keys rows per input partition cross the exchange.
    */
  def q45TopkCustomOp(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    graft.plans.TopKPerKey(
      t.events.select("user_id", "event_id", "value"),
      Seq("user_id"), Seq(desc("value"), asc("event_id")), 3)
      .select(col("user_id"), col("rank").cast("long").as("rank"),
        col("event_id"), col("value"))
      .orderBy("user_id", "rank")
  }

  val q45Sql: String =
    """SELECT user_id, rank, event_id, value FROM (
      |  SELECT user_id, event_id, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rank
      |  FROM events) WHERE rank <= 3 ORDER BY user_id, rank""".stripMargin

  /** Analytic window-function sweep: lag/lead, rank/dense_rank,
    * percent_rank/cume_dist, ntile, and a running frame-bounded sum —
    * one partitioned pass (all functions share the window ordering, so
    * Catalyst plans a single sort+window).
    */
  def q46WindowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority").orderBy(asc("o_totalprice"), asc("o_orderkey"))
    t.orders
      .filter(col("o_orderkey") < 2000)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .withColumn("prev_price", lag("o_totalprice", 1).over(w))
      .withColumn("next_price", lead("o_totalprice", 1).over(w))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("run_cnt", count(lit(1)).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .orderBy("o_orderpriority", "rnk")
  }

  val q46Sql: String =
    """SELECT o_orderkey, o_orderpriority, o_totalprice,
      |  lag(o_totalprice) OVER w AS prev_price,
      |  lead(o_totalprice) OVER w AS next_price,
      |  rank() OVER w AS rnk,
      |  dense_rank() OVER w AS drnk,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume,
      |  ntile(4) OVER w AS quartile,
      |  COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_cnt
      |FROM orders WHERE o_orderkey < 2000
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderpriority, rnk""".stripMargin

  /** q95: group-wise linear statistics (slope + correlation of order
    * value against order date) computed from EXACT INTEGER MOMENTS —
    * the distributed-statistics shape that hash-matches across
    * engines. `corr`/`regr_slope` built-ins accumulate floating-point
    * running moments whose value depends on reduction order; here the
    * five moments (Σx, Σy, Σxy, Σx², Σy²) are DECIMAL sums of integer
    * cents×days (order-independent, exact, one map-side-combined
    * aggregate), and the closed-form slope/corr arithmetic runs in a
    * fixed expression order on doubles — bit-identical in Spark and
    * DuckDB. This is also the 100 TB shape: moments are mergeable
    * partials (shuffle carries 5 numbers per group), and the same
    * moments answer slope, corr, variance, and mean without rescans.
    */
  def q95GroupStats(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val x = datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01")))
      .cast("long")
    val y = round(col("o_totalprice") * 100).cast("long")
    val d = "decimal(38,0)"
    val moments = t.orders
      .select(col("o_orderpriority"), x.as("x"), y.as("y"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(d)).cast("double").as("sx"),
        sum(col("y").cast(d)).cast("double").as("sy"),
        sum((col("x") * col("y")).cast(d)).cast("double").as("sxy"),
        sum((col("x") * col("x")).cast(d)).cast("double").as("sxx"),
        sum((col("y") * col("y")).cast(d)).cast("double").as("syy"))
    moments
      .withColumn("nn", col("n").cast("double"))
      .select(col("o_orderpriority"), col("n"),
        ((col("nn") * col("sxy") - col("sx") * col("sy")) /
          (col("nn") * col("sxx") - col("sx") * col("sx"))).as("slope"),
        ((col("nn") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("nn") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("nn") * col("syy") - col("sy") * col("sy")))).as("corr"))
      .orderBy("o_orderpriority")
  }

  val q95Sql: String =
    """WITH keyed AS (
      |  SELECT o_orderpriority,
      |    date_diff('day', DATE '1995-01-01', o_orderdate::DATE)::BIGINT AS x,
      |    round(o_totalprice * 100)::BIGINT AS y
      |  FROM orders),
      |m AS (
      |  SELECT o_orderpriority, COUNT(*) AS n,
      |    SUM(x::DECIMAL(38,0))::DOUBLE AS sx,
      |    SUM(y::DECIMAL(38,0))::DOUBLE AS sy,
      |    SUM((x * y)::DECIMAL(38,0))::DOUBLE AS sxy,
      |    SUM((x * x)::DECIMAL(38,0))::DOUBLE AS sxx,
      |    SUM((y * y)::DECIMAL(38,0))::DOUBLE AS syy
      |  FROM keyed GROUP BY 1)
      |SELECT o_orderpriority, n,
      |  (n::DOUBLE * sxy - sx * sy) / (n::DOUBLE * sxx - sx * sx) AS slope,
      |  (n::DOUBLE * sxy - sx * sy) /
      |    (sqrt(n::DOUBLE * sxx - sx * sx) * sqrt(n::DOUBLE * syy - sy * sy)) AS corr
      |FROM m ORDER BY o_orderpriority""".stripMargin

  /** q96: the set-operation surface (SURVEY §2.7 — the reference
    * exposes none, so this is the beyond-reference completion):
    * customer retention algebra between two order years via INTERSECT
    * (retained), EXCEPT (churned / acquired), and UNION (either).
    * Catalyst plans these as left-semi / left-anti joins and a
    * distinct union — one shuffle each on the key, no materialized
    * intermediate sets.
    */
  def q96SetOps(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def custs(yr: Int) = t.orders
      .filter(year(col("o_orderdate")) === yr).select("o_custkey")
    val a = custs(1995)
    val b = custs(1996)
    a.intersect(b).agg(count(lit(1)).as("retained"))
      .crossJoin(a.except(b).agg(count(lit(1)).as("churned")))
      .crossJoin(b.except(a).agg(count(lit(1)).as("acquired")))
      .crossJoin(a.union(b).distinct().agg(count(lit(1)).as("either")))
  }

  val q96Sql: String =
    """WITH a AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
      |     b AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
      |SELECT
      |  (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS retained,
      |  (SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS churned,
      |  (SELECT COUNT(*) FROM (SELECT * FROM b EXCEPT SELECT * FROM a)) AS acquired,
      |  (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM (
      |     SELECT * FROM a UNION ALL SELECT * FROM b))) AS either""".stripMargin

  /** q217: the store's CHANGE DATA FEED surface itself under oracle —
    * [[graft.store.SnapshotStore.readChanges]] is what lets a
    * downstream consumer (CdcIndexMaintenance, a replica, an embedding
    * backfill) follow a 100 TB table by processing deltas instead of
    * re-reading snapshots, so the diff it emits must be exactly the
    * row algebra it claims. Two versions of a documents slice are
    * written under a DETERMINISTIC twist (deletes where doc_id ≡ 0
    * mod 101, updates where ≡ 0 mod 13, inserts from a disjoint
    * slice), and the feed between them must equal the DuckDB oracle's
    * from-scratch full-outer-join diff of the same two derivations —
    * insert/update/delete ops, before/after values, and NOTHING for
    * unchanged rows (the compaction-is-CDC-silent contract).
    *
    * Scale shape: the feed is ONE full outer join on the key between
    * two version scans — at production layouts both sides are
    * partition-pruned by the same hive layout the merges maintain.
    */
  def q217ChangeFeed(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    val v0 = docs.filter(pmod(col("doc_id"), lit(7L)) === 0L)
    val v1 = v0.filter(pmod(col("doc_id"), lit(101L)) =!= 0L)
      .withColumn("text", when(pmod(col("doc_id"), lit(13L)) === 0L,
        concat(col("text"), lit(" [revised]"))).otherwise(col("text")))
      .unionByName(docs.filter(pmod(col("doc_id"), lit(7L)) === 1L &&
        pmod(col("doc_id"), lit(31L)) === 0L))
    val store = new graft.store.SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft-q217-cdc").toString)
    store.write("docs", v0)
    store.write("docs", v1)
    store.readChanges("docs", 0L, 1L, Seq("doc_id")).get
      .select(col("doc_id"), col("op"),
        col("before.text").as("before_text"),
        col("after.text").as("after_text"))
      .orderBy("doc_id")
  }

  val q217Sql: String =
    """WITH base AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
      |v0 AS (SELECT doc_id, text FROM base WHERE doc_id % 7 = 0),
      |v1 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 0 THEN text || ' [revised]' ELSE text END AS text
      |  FROM v0 WHERE doc_id % 101 <> 0
      |  UNION ALL
      |  SELECT doc_id, text FROM base WHERE doc_id % 7 = 1 AND doc_id % 31 = 0)
      |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
      |  CASE WHEN a.doc_id IS NULL THEN 'insert'
      |       WHEN b.doc_id IS NULL THEN 'delete'
      |       WHEN a.text <> b.text THEN 'update' END AS op,
      |  a.text AS before_text, b.text AS after_text
      |FROM v0 a FULL OUTER JOIN v1 b ON a.doc_id = b.doc_id
      |WHERE (CASE WHEN a.doc_id IS NULL THEN 'insert'
      |            WHEN b.doc_id IS NULL THEN 'delete'
      |            WHEN a.text <> b.text THEN 'update' END) IS NOT NULL
      |ORDER BY doc_id""".stripMargin

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q96_set_ops" -> (q96SetOps _),
    "q217_change_feed" -> (q217ChangeFeed _),
    "q95_group_stats" -> (q95GroupStats _),
    "q19_approx_distinct" -> (q19ApproxDistinct _),
    "q28_tumbling_window" -> (q28TumblingWindow _),
    "q29_rollup" -> (q29Rollup _),
    "q56_cube" -> (q56Cube _),
    "q58_full_outer" -> (q58FullOuter _),
    "q70_pivot" -> (q70Pivot _),
    "q71_unpivot" -> (q71Unpivot _),
    "q59_json_paths" -> (q59JsonPaths _),
    "q57_approx_percentiles" -> (q57ApproxPercentiles _),
    "q45_topk_custom_op" -> (q45TopkCustomOp _),
    "q46_window_analytics" -> (q46WindowAnalytics _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q2_topk_groups" -> (q2TopkGroups _),
    "q3_conditional_counts" -> (q3ConditionalCounts _),
    "q4_minmax" -> (q4MinMax _),
    "q5_bool_rollup" -> (q5BoolRollup _),
    "q6_distinct_counts" -> (q6DistinctCounts _),
    "q7_daily_rollup" -> (q7DailyRollup _),
    "q8_join_dims" -> (q8JoinDims _),
    "q9_anti_join" -> (q9AntiJoin _),
    "q9b_semi_join" -> (q9bSemiJoin _),
    "q10_argmax" -> (q10Argmax _),
    "q11_top200" -> (q11Top200 _),
    "q12_lastwin_dedup" -> (q12LastWinDedup _),
    "q13_revenue_by_nation" -> (q13RevenueByNation _),
    "q14_retry_dedup" -> (q14RetryDedup _),
    "q15_prefix_match" -> (q15PrefixMatch _),
    "q16_point_lookup" -> (q16PointLookup _),
    "q17_range_filter" -> (q17RangeFilter _),
    "q18_classify_join" -> (q18ClassifyJoin _),
  )

  val oracle: Map[String, String] = Map(
    "q217_change_feed" -> q217Sql,
    "q96_set_ops" -> q96Sql,
    "q95_group_stats" -> q95Sql,
    "q19_approx_distinct" -> q19Sql,
    "q28_tumbling_window" -> q28Sql,
    "q29_rollup" -> q29Sql,
    "q56_cube" -> q56Sql,
    "q58_full_outer" -> q58Sql,
    "q70_pivot" -> q70Sql,
    "q71_unpivot" -> q71Sql,
    "q59_json_paths" -> q59Sql,
    "q57_approx_percentiles" -> q57Sql,
    "q45_topk_custom_op" -> q45Sql,
    "q46_window_analytics" -> q46Sql,
    "q1_pricing_summary" -> q1Sql,
    "q2_topk_groups" -> q2Sql,
    "q3_conditional_counts" -> q3Sql,
    "q4_minmax" -> q4Sql,
    "q5_bool_rollup" -> q5Sql,
    "q6_distinct_counts" -> q6Sql,
    "q7_daily_rollup" -> q7Sql,
    "q8_join_dims" -> q8Sql,
    "q9_anti_join" -> q9Sql,
    "q9b_semi_join" -> q9bSql,
    "q10_argmax" -> q10Sql,
    "q11_top200" -> q11Sql,
    "q12_lastwin_dedup" -> q12Sql,
    "q13_revenue_by_nation" -> q13Sql,
    "q14_retry_dedup" -> q14Sql,
    "q15_prefix_match" -> q15Sql,
    "q16_point_lookup" -> q16Sql,
    "q17_range_filter" -> q17Sql,
    "q18_classify_join" -> q18Sql,
  )
}
