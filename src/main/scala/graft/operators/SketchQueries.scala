package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** q91: sketch-based SET-INTERSECTION estimation — the audience-
    * overlap / cross-epoch-contamination question ("how many customers
    * ordered in BOTH years?") answered from per-segment HLL sketches
    * by inclusion-exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B),
    * where the union estimate UNIONS THE STORED SKETCHES — no second
    * scan of the fact table, no shuffle of raw keys. At 100 TB the
    * exact answer is a full self-join of distinct key sets; the
    * sketch answer is arithmetic over a few KB.
    *
    * Exact counts ride along and hash against the oracle; the
    * inclusion-exclusion estimate is gated as a boolean with the
    * error bound scaled by the UNION estimate, not the intersection:
    * est_i = est_A + est_B − est_∪ subtracts three estimates whose
    * absolute errors each scale with the magnitudes they measure
    * (≤ union), so the intersection's RELATIVE error is amplified by
    * (|A|+|B|)/|A∩B| and a small-intersection corpus would flip an
    * intersection-scaled gate on pure approximation noise. Bound
    * derivation: Spark's default HLL lgK=12 → rsd ≈ 1.04/√4096 ≈
    * 1.63%; three ≤-union-magnitude terms at 1σ sum to ≈ 4.9% of the
    * union, so 5%·est_∪ holds to ~1σ-per-term — loose enough to be
    * stable, tight enough that a real defect (a broken union or a
    * mis-merged sketch) still trips it.
    */
  def q91SketchIntersect(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val a = t.orders.filter(year(col("o_orderdate")) === 1995)
    val b = t.orders.filter(year(col("o_orderdate")) === 1996)
    val skA = a.agg(hll_sketch_agg(col("o_custkey")).as("ska"),
      countDistinct(col("o_custkey")).as("n_a_exact"))
    val skB = b.agg(hll_sketch_agg(col("o_custkey")).as("skb"),
      countDistinct(col("o_custkey")).as("n_b_exact"))
    val exactI = a.select("o_custkey").intersect(b.select("o_custkey"))
      .agg(count(lit(1)).as("n_intersect_exact"))
    skA.crossJoin(skB).crossJoin(exactI)
      .withColumn("est_union", hll_sketch_estimate(
        hll_union(col("ska"), col("skb"))))
      .withColumn("est_intersect",
        hll_sketch_estimate(col("ska")) + hll_sketch_estimate(col("skb"))
          - col("est_union"))
      .select(col("n_a_exact"), col("n_b_exact"), col("n_intersect_exact"),
        (abs(col("est_intersect") - col("n_intersect_exact").cast("double"))
          <= col("est_union") * 0.05d)
          .as("inclusion_exclusion_ok"))
  }

  val q91Sql: String =
    """SELECT
      |  (SELECT COUNT(DISTINCT o_custkey) FROM orders
      |     WHERE year(o_orderdate) = 1995) AS n_a_exact,
      |  (SELECT COUNT(DISTINCT o_custkey) FROM orders
      |     WHERE year(o_orderdate) = 1996) AS n_b_exact,
      |  (SELECT COUNT(*) FROM (
      |     SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |     INTERSECT
      |     SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996))
      |    AS n_intersect_exact,
      |  TRUE AS inclusion_exclusion_ok""".stripMargin

  /** q119: Count-Min Sketch frequency estimation (Cormode &
    * Muthukrishnan 2005) — the OTHER mergeable frequency sketch next
    * to q74's Misra–Gries: MG answers "which items are heavy", CMS
    * answers "how often is THIS item, approximately, with a one-sided
    * ε·N error bound" for any item, in d·w integers of state no
    * matter the stream. Here d=4 rows × w=256 buckets build from the
    * token stream in ONE aggregate (the sketch is additive, so the
    * map-side partial combine IS the per-partition sketch and the
    * shuffle moves ≤ d·w rows per partition — the mergeability that
    * lets 100 TB of shards union their sketches in kilobytes). The
    * exact top-20 tokens ride along and each gets its CMS estimate =
    * min over rows of its bucket count; `overestimate = estimate −
    * exact` is ≥ 0 BY THE CMS GUARANTEE (one-sided error), which the
    * oracle re-derives and CurationQueriesSpec asserts.
    *
    * Row hashes are md5Long60("i:token") mod w — independent per row
    * and identical in both engines, no shipped constants.
    */
  def q119CmsEstimate(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.{md5Long60, tokens}
    val d = 4
    val w = 256L
    val t = Tables(spark, dir)
    def buckets(tok: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(d - 1)), i =>
        struct(i.as("i"),
          pmod(md5Long60(concat(i.cast("string"), lit(":"), tok)), lit(w))
            .as("b")))
    // hash the VOCABULARY, not the stream (the q113 lesson): the CMS
    // is additive, so bucket counts are sums of per-token counts —
    // build the sketch from the Zipf-compressed exact-count table
    // (4·|vocab| digests) instead of 4 md5s per occurrence. The
    // grouped table is consumed by the sketch, the top-20, and the
    // probe — one lazy checkpoint.
    val exact = t.documents.select(explode(tokens(col("text"))).as("tk"))
      .groupBy("tk").agg(count(lit(1)).as("exact"))
      .localCheckpoint(false)
    val top = exact.orderBy(desc("exact"), asc("tk")).limit(20)
    val cms = exact.select(col("exact"), explode(buckets(col("tk"))).as("ib"))
      .groupBy(col("ib.i").as("i"), col("ib.b").as("b"))
      .agg(sum("exact").as("c"))
    top.select(col("tk"), col("exact"), explode(buckets(col("tk"))).as("ib"))
      .select(col("tk"), col("exact"), col("ib.i").as("i"), col("ib.b").as("b"))
      .join(broadcast(cms), Seq("i", "b"))
      .groupBy("tk", "exact")
      .agg(min("c").as("estimate"))
      .withColumn("overestimate", col("estimate") - col("exact"))
      .orderBy(desc("exact"), asc("tk"))
  }

  val q119Sql: String = {
    val h = (tok: String) => OracleSql.md5Long60(s"i::VARCHAR || ':' || $tok")
    s"""WITH tok AS (
       |  SELECT unnest(${OracleSql.tokens("text")}) AS tk FROM documents),
       |exact AS (SELECT tk, COUNT(*)::BIGINT AS exact FROM tok GROUP BY tk),
       |top AS (SELECT tk, exact FROM exact ORDER BY exact DESC, tk LIMIT 20),
       |cms AS (
       |  SELECT i, (${h("tk")} % 256) AS b, COUNT(*)::BIGINT AS c
       |  FROM tok, UNNEST(generate_series(0, 3)) AS u(i)
       |  GROUP BY 1, 2),
       |probe AS (
       |  SELECT t.tk, t.exact, u.i AS i, (${h("t.tk")} % 256) AS b
       |  FROM top t, UNNEST(generate_series(0, 3)) AS u(i))
       |SELECT p.tk, p.exact, MIN(c.c)::BIGINT AS estimate,
       |  (MIN(c.c) - p.exact)::BIGINT AS overestimate
       |FROM probe p JOIN cms c USING (i, b)
       |GROUP BY p.tk, p.exact
       |ORDER BY exact DESC, tk""".stripMargin
  }

  /** q128: mergeable equi-width histogram quantiles — the one-pass
    * percentile sketch next to q77's HLL (distincts), q119's CMS
    * (frequencies) and q74's Misra–Gries (heavy hitters): per-group
    * value distributions reduce to 64 fixed-width bins (width 8 over
    * [0, 512), tail clamped into the last bin), and any per-mille
    * quantile is answered from the cumulative bin counts with error
    * bounded by the bin width. q27 computes the same percentiles
    * EXACTLY via a full sort; this is the 100 TB path — O(langs·64)
    * state crosses the shuffle with map-side combine, no global sort,
    * and bins from different partitions/days/corpora merge by plain
    * addition (the same merge algebra the other sketches pin).
    * est_bin is provably the bin CONTAINING the exact disc-quantile
    * (cum(bin(v)−1) < target ≤ cum(bin(v))) — the spec asserts that
    * sandwich against a sequential exact reference.
    */
  def q128HistogramQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val binW = 8L
    val t = Tables(spark, dir)
    val bins = t.documents
      .select(col("lang"), least(expr(s"n_chars div $binW"), lit(63L)).as("bin"))
      .groupBy("lang", "bin").agg(count(lit(1)).as("c"))
    val cum = bins
      .withColumn("cum", sum("c").over(Window.partitionBy("lang").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_total", sum("c").over(Window.partitionBy("lang")))
    val targets = Seq(500L, 900L, 990L).toDF("pm")
    cum.crossJoin(broadcast(targets))
      .filter(col("cum") * 1000 >= col("pm") * col("n_total"))
      .groupBy("lang", "pm")
      .agg(min("bin").as("est_bin"), max("n_total").as("n_total"))
      .withColumn("est_upper", (col("est_bin") + 1) * binW)
      .select("lang", "pm", "est_bin", "est_upper", "n_total")
      .orderBy("lang", "pm")
  }

  val q128Sql: String =
    """WITH bins AS (
      |  SELECT lang, least(n_chars // 8, 63)::BIGINT AS bin, COUNT(*)::BIGINT AS c
      |  FROM documents GROUP BY 1, 2),
      |cum AS (
      |  SELECT lang, bin, c,
      |    SUM(c) OVER (PARTITION BY lang ORDER BY bin)::BIGINT AS cum,
      |    SUM(c) OVER (PARTITION BY lang)::BIGINT AS n_total
      |  FROM bins),
      |t AS (SELECT unnest([500, 900, 990]) AS pm)
      |SELECT lang, pm::BIGINT AS pm, MIN(bin)::BIGINT AS est_bin,
      |  ((MIN(bin) + 1) * 8)::BIGINT AS est_upper,
      |  MAX(n_total)::BIGINT AS n_total
      |FROM cum, t WHERE cum * 1000 >= pm * n_total
      |GROUP BY lang, pm ORDER BY lang, pm""".stripMargin

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q128_histogram_quantiles" -> (q128HistogramQuantiles _),
    "q119_cms_estimate" -> (q119CmsEstimate _),
    "q77_hll_rollup" -> (q77HllRollup _),
    "q91_sketch_intersect" -> (q91SketchIntersect _),
  )

  val oracle: Map[String, String] = Map(
    "q128_histogram_quantiles" -> q128Sql,
    "q77_hll_rollup" -> q77Sql,
    "q91_sketch_intersect" -> q91Sql,
    "q119_cms_estimate" -> q119Sql,
  )
}
