package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Data profiling — the ANALYZE-style one-pass column statistics sweep
  * every curation pipeline runs before touching a new corpus drop:
  * null counts, distinct cardinalities, and min/max per column, all
  * out of ONE aggregate over the table (never one scan per column).
  *
  * Scale notes: multiple exact COUNT(DISTINCT)s in one aggregate plan
  * as a single Expand (+1 row copy per distinct column) feeding one
  * shuffle — the standard exact plan. At 100 TB you flip the exact
  * distincts to `approx_count_distinct` (q19's contract) and the
  * Expand disappears; everything else in the pass is a plain
  * partial+final aggregate.
  */
object ProfileQueries {

  private val cols = Seq("doc_id", "lang", "n_chars", "source", "text")

  /** q85: profile every column of `documents` into tidy rows
    * (column_name, n_null, n_distinct, min_val, max_val) — min/max
    * surfaced as strings so one schema carries all column types
    * (cast AFTER the aggregate, so numeric columns keep numeric
    * ordering).
    */
  def q85Profile(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val aggs = cols.flatMap { c =>
      Seq(count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max").mkString(", ")
    docs.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_null, n_distinct, min_val, max_val)")
      .orderBy("column_name")
  }

  val q85Sql: String = cols.map { c =>
    s"""SELECT '$c' AS column_name,
       |  COUNT(*) - COUNT($c) AS n_null,
       |  COUNT(DISTINCT $c) AS n_distinct,
       |  min($c)::VARCHAR AS min_val, max($c)::VARCHAR AS max_val
       |FROM documents""".stripMargin
  }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")

  /** q93: interchange-format fidelity audit — the "did the export
    * lose anything?" check run before handing a corpus drop to
    * another system: events round-trip through CSV, JSONL, and ORC (written
    * with explicit schemas/formats, read back with explicit schemas —
    * never inference) and each read-back must reproduce the parquet
    * truth EXACTLY, compared by an order-independent integer
    * fingerprint (bit_xor of a row hash over id, type, and the
    * microsecond timestamp) plus row count. The fingerprint is the
    * only honest cross-format equality check at 100 TB — sorting two
    * copies of a table to diff them is a full shuffle each; the xor
    * fingerprint is one map-side-combined aggregate per copy.
    *
    * The oracle re-derives count + fingerprint from parquet and pins
    * both round-trip verdicts as TRUE contracts.
    *
    * This operator is an AUDIT, not a query: it runs eagerly (write →
    * read back → fingerprint) and returns the verdicts as a literal
    * row, so the scratch export is deleted the moment the fingerprints
    * exist — repeated verify/bench runs leave no temp litter.
    */
  def q93FormatRoundtrip(spark: SparkSession, dir: String): DataFrame =
    q93FormatRoundtrip(spark, dir, None)

  /** `scratchRoot`: explicit export root for the audit's scratch files
    * — on a cluster, a shared-store URI (any Hadoop filesystem: hdfs,
    * s3a, file) visible to all executors; the default (None) is a
    * driver-local temp dir, which is only correct in local mode. Each
    * audit writes under a unique subdirectory of the root and deletes
    * it in a finally block — the same delete-after-audit lifecycle on
    * either path, via the Hadoop FileSystem API so the cleanup follows
    * the URI's scheme rather than assuming a local disk.
    */
  def q93FormatRoundtrip(spark: SparkSession, dir: String,
      scratchRoot: Option[String]): DataFrame = {
    import graft.functions.TextFunctions.md5Long60
    val t = Tables(spark, dir)
    val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val base = t.events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"))
    def fingerprint(df: org.apache.spark.sql.DataFrame, tag: String) = df
      .withColumn("rh", md5Long60(concat(
        col("event_id").cast("string"), lit(":"), col("event_type"),
        lit(":"), unix_micros(col("ts")).cast("string"))))
      .agg(count(lit(1)).as("n"), expr("bit_xor(rh)").as("fp"))
      .select(lit(tag).as("t"), col("n"), col("fp"))
    val out = scratchRoot match {
      case Some(root) => new org.apache.hadoop.fs.Path(root,
        s"graft-fmt-${java.util.UUID.randomUUID()}")
      case None => new org.apache.hadoop.fs.Path(
        java.nio.file.Files.createTempDirectory("graft-fmt").toUri)
    }
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      // The three exports are independent jobs — submit them
      // concurrently (guide §2.6: actions are only sequential because
      // the driver calls them sequentially) instead of paying three
      // serial write walls; each also fans its rows out first, because
      // the single-split events scan otherwise makes every export one
      // task of row-at-a-time CSV/JSON serialization (r14: the three
      // writes were ~2/3 of this audit's wall). bit_xor fingerprints
      // are order- and file-layout-independent, so neither change
      // touches the audit's verdicts.
      val par = spark.sparkContext.defaultParallelism
      val src = base.repartition(par)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val writes = Seq(
        Future(src.write.option("header", "true")
          .option("timestampFormat", tsFmt).csv(s"$out/csv")),
        Future(src.write.option("timestampFormat", tsFmt)
          .json(s"$out/json")),
        Future(src.write.orc(s"$out/orc")))
      // settle ALL three before rethrowing the first failure — a
      // sequential Await would propagate while sibling writes still
      // run, leaving partial output dirs racing the cleanup below
      // (ADVICE r14)
      val settled = writes.map(w => scala.util.Try(Await.result(w, Duration.Inf)))
      settled.collectFirst { case scala.util.Failure(e) => throw e }
      val schema = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING"
      // ONE action for all four fingerprints: the union's branches
      // run as parallel stages of a single job
      val fps = fingerprint(base, "p")
        .unionAll(fingerprint(spark.read.schema(schema)
          .option("header", "true").option("timestampFormat", tsFmt)
          .csv(s"$out/csv"), "c"))
        .unionAll(fingerprint(spark.read.schema(schema)
          .option("timestampFormat", tsFmt).json(s"$out/json"), "j"))
        .unionAll(fingerprint(spark.read.schema(schema).orc(s"$out/orc"), "o"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      val (p, c, j, o) = (fps("p"), fps("c"), fps("j"), fps("o"))
      import spark.implicits._
      Seq((p._1, p._2, c == p, j == p, o == p))
        .toDF("n_rows", "fingerprint", "csv_roundtrip_ok", "json_roundtrip_ok",
          "orc_roundtrip_ok")
    } finally fs.delete(out, true)
  }

  val q93Sql: String = {
    val rh = OracleSql.md5Long60(
      "event_id::VARCHAR || ':' || event_type || ':' || epoch_us(ts)::BIGINT::VARCHAR")
    s"""SELECT COUNT(*) AS n_rows, bit_xor($rh) AS fingerprint,
       |  TRUE AS csv_roundtrip_ok, TRUE AS json_roundtrip_ok,
       |  TRUE AS orc_roundtrip_ok
       |FROM events""".stripMargin
  }

  /** q130: k-anonymity audit — the privacy profile a curation
    * pipeline runs before releasing a dataset: group records by their
    * quasi-identifier tuple (here nation × market segment × account-
    * balance band) and report the equivalence-class size distribution.
    * Every record in a k=1 class is uniquely re-identifiable from the
    * quasi-identifiers alone (Sweeney's k-anonymity); the histogram
    * tells you the release's k and how many rows must be generalized
    * or suppressed to raise it. The balance band is floor(bal/1000) —
    * one IEEE double divide + floor, bit-identical across engines.
    *
    * Scale shape: one map-side-combined aggregate on the QI tuple
    * (output bounded by QI-space cardinality, not row count), then a
    * 5-row bucket rollup.
    */
  def q130KAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
      .agg(count(lit(1)).as("k"))
      .withColumn("bucket",
        when(col("k") === 1, "k=1")
          .when(col("k") === 2, "k=2")
          .when(col("k") <= 5, "k=3-5")
          .when(col("k") <= 10, "k=6-10")
          .otherwise("k>10"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_classes"), sum("k").as("n_rows"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("min_k")
  }

  val q130Sql: String =
    """WITH classes AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    floor(c_acctbal / 1000)::BIGINT AS bal_band, COUNT(*)::BIGINT AS k
      |  FROM customer GROUP BY 1, 2, 3),
      |bucketed AS (
      |  SELECT k, CASE WHEN k = 1 THEN 'k=1' WHEN k = 2 THEN 'k=2'
      |    WHEN k <= 5 THEN 'k=3-5' WHEN k <= 10 THEN 'k=6-10'
      |    ELSE 'k>10' END AS bucket
      |  FROM classes)
      |SELECT bucket, COUNT(*)::BIGINT AS n_classes, SUM(k)::BIGINT AS n_rows,
      |  MIN(k)::BIGINT AS min_k, MAX(k)::BIGINT AS max_k
      |FROM bucketed GROUP BY bucket ORDER BY min_k""".stripMargin

  /** q133: equi-DEPTH histogram — the cost-based-optimizer statistic
    * (equal ROW counts per bucket, variable width) that q128's
    * equi-width sketch complements: depth histograms answer
    * selectivity ("what fraction of rows is < x") with uniform
    * resolution in rank space, which is what join/filter cardinality
    * estimation wants. ntile(8) over a fully-deterministic order
    * (value, then doc_id as the tie-break) so both engines cut the
    * ties identically.
    *
    * Scale shape (r9): the per-lang rank rides the grouped distributed
    * scan ([[ScanOps.runningSums]]) — `ntile(k)` is pure arithmetic on
    * (rank, group size): the first n%k buckets hold n/k+1 rows, the
    * rest n/k (the formula is property-pinned against Spark's ntile
    * window on random inputs). A `Window.partitionBy(lang)` here puts
    * corpus/|langs| rows through each task at 100 TB; the scan keeps
    * every sort one range partition. (q128's no-sort sketch remains
    * the bounded-error alternative when even the scan is too much.)
    */
  def q133EquiDepth(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val scored = t.documents.select(col("lang"), col("n_chars"), col("doc_id"))
    val ranked = ScanOps.runningSums(scored, Seq("lang"),
      Seq(col("n_chars").asc, col("doc_id").asc), Seq((lit(1L), "rn")))
    val counts = scored.groupBy("lang").agg(count(lit(1)).as("n"))
    ScanOps.joinKeysNullSafe(ranked, counts, Seq("lang"),
        broadcastRight = true)
      .withColumn("bucket", expr(ntileExpr(8)))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("n_chars").as("lo"), max("n_chars").as("hi"))
      .select(col("lang"), col("bucket"), col("n_rows"), col("lo"), col("hi"))
      .orderBy("lang", "bucket")
  }

  /** ntile(k) as arithmetic on (rn, n) — Spark's NTile semantics
    * verbatim: bucket sizes n/k (+1 for the first n%k buckets). When
    * n < k the ELSE branch's n/k divisor is 0, but every row satisfies
    * the THEN condition (rn ≤ n%k = n), so it never evaluates.
    */
  private[graft] def ntileExpr(k: Int): String =
    s"CASE WHEN rn <= (n % $k) * (n div $k + 1)" +
      s" THEN (rn - 1) div (n div $k + 1) + 1" +
      s" ELSE (n % $k) + (rn - 1 - (n % $k) * (n div $k + 1)) div (n div $k) + 1 END"

  val q133Sql: String =
    """WITH b AS (
      |  SELECT lang, n_chars,
      |    NTILE(8) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS bucket
      |  FROM documents)
      |SELECT lang, bucket::BIGINT AS bucket, COUNT(*)::BIGINT AS n_rows,
      |  MIN(n_chars)::BIGINT AS lo, MAX(n_chars)::BIGINT AS hi
      |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q146: corpus CONCENTRATION audit — the data-governance number
    * behind "80% of our tokens come from three domains": the Gini
    * coefficient of per-source volume (0 = perfectly even, →1000‰ =
    * one source is the corpus) plus top-1/top-3 shares. A training
    * mix that looks diverse by source COUNT can be wildly concentrated
    * by VOLUME; this is the one-row report that says so. Gini from
    * the ascending-rank identity G = (2Σi·xᵢ − (n+1)S)/(nS), all
    * integer arithmetic with one final floor division — hash-exact.
    *
    * Scale shape: corpus → |sources| rows in one aggregate; the rank
    * window and the final fold run over those few rows.
    */
  def q146Concentration(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents.groupBy("source").agg(sum("n_chars").as("chars"))
      .withColumn("i", row_number().over(
        Window.orderBy(col("chars"), col("source"))).cast("long"))
      .withColumn("k", count(lit(1)).over(Window.partitionBy()))
      .withColumn("s", sum("chars").over(Window.partitionBy()))
      .agg(max("k").as("n_sources"),
        max("s").as("total_chars"),
        expr("(1000 * (2 * sum(i * chars) - (max(k) + 1) * max(s)))" +
          " div (max(k) * max(s))").as("gini_permille"),
        expr("(1000 * max(case when i = k then chars end)) div max(s)")
          .as("top1_share_permille"),
        expr("(1000 * sum(case when i > k - 3 then chars end)) div max(s)")
          .as("top3_share_permille"))
  }

  val q146Sql: String =
    """WITH per AS (
      |  SELECT source, SUM(n_chars)::BIGINT AS chars
      |  FROM documents GROUP BY 1),
      |rk AS (
      |  SELECT *, ROW_NUMBER() OVER (ORDER BY chars, source) AS i,
      |    COUNT(*) OVER () AS k, SUM(chars) OVER ()::BIGINT AS s
      |  FROM per)
      |SELECT MAX(k)::BIGINT AS n_sources, MAX(s)::BIGINT AS total_chars,
      |  ((1000 * (2 * SUM(i * chars) - (MAX(k) + 1) * MAX(s)))
      |    // (MAX(k) * MAX(s)))::BIGINT AS gini_permille,
      |  ((1000 * MAX(CASE WHEN i = k THEN chars END)) // MAX(s))::BIGINT
      |    AS top1_share_permille,
      |  ((1000 * SUM(CASE WHEN i > k - 3 THEN chars END)) // MAX(s))::BIGINT
      |    AS top3_share_permille
      |FROM rk""".stripMargin

  /** q147: functional-dependency audit — profiling's rule-discovery
    * step (Metanome-style): does column A determine column B? An FD
    * A→B holds iff |distinct A| = |distinct (A, B)|; the violation
    * count is their difference (extra (A, B) combinations beyond one
    * per A). Checked here over customer⋈nation for a mix of FDs that
    * hold structurally (nationkey → nation name, nationkey →
    * regionkey), hold incidentally, or fail (mktsegment → nationkey)
    * — the audit distinguishes schema facts from coincidences, which
    * is what makes discovered FDs trustworthy inputs to normalization
    * or error detection.
    *
    * Scale shape: each FD is two distinct-counts; all FDs compute in
    * ONE aggregate pass each over the (broadcast-joined) frame, and
    * the report is |FDs| rows.
    */
  def q147FdAudit(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val f = t.customer.join(broadcast(t.nation),
      col("c_nationkey") === col("n_nationkey"))
    val fds = Seq(
      ("c_nationkey -> n_name", col("c_nationkey"), col("n_name")),
      ("c_nationkey -> n_regionkey", col("c_nationkey"), col("n_regionkey")),
      ("c_mktsegment -> c_nationkey", col("c_mktsegment"), col("c_nationkey")),
      ("c_custkey -> c_mktsegment", col("c_custkey"), col("c_mktsegment")))
    fds.map { case (name, lhs, rhs) =>
      f.agg(countDistinct(lhs).as("n_lhs"),
          countDistinct(lhs, rhs).as("n_pairs"))
        .select(lit(name).as("fd"), col("n_lhs"), col("n_pairs"),
          (col("n_pairs") === col("n_lhs")).as("holds"),
          (col("n_pairs") - col("n_lhs")).as("n_violating_combos"))
    }.reduce(_ unionByName _).orderBy("fd")
  }

  val q147Sql: String = {
    def fd(name: String, lhs: String, rhs: String) =
      s"""SELECT '$name' AS fd, COUNT(DISTINCT $lhs)::BIGINT AS n_lhs,
         |  COUNT(DISTINCT ($lhs, $rhs))::BIGINT AS n_pairs,
         |  COUNT(DISTINCT ($lhs, $rhs)) = COUNT(DISTINCT $lhs) AS holds,
         |  (COUNT(DISTINCT ($lhs, $rhs)) - COUNT(DISTINCT $lhs))::BIGINT
         |    AS n_violating_combos
         |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin
    Seq(fd("c_nationkey -> n_name", "c_nationkey", "n_name"),
      fd("c_nationkey -> n_regionkey", "c_nationkey", "n_regionkey"),
      fd("c_mktsegment -> c_nationkey", "c_mktsegment", "c_nationkey"),
      fd("c_custkey -> c_mktsegment", "c_custkey", "c_mktsegment"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY fd")
  }

  /** q148: referential-integrity audit — the orphan-key sweep run on
    * every warehouse load: for each declared FK, how many child rows
    * (and distinct keys) point at nothing. The three TPC-H edges hold
    * (zero rows — the audit proves the LOAD is clean, which is the
    * normal, boring, essential answer); a fourth, deliberately dirty
    * edge (events with every 101st event's user shifted out of key
    * range — q114's injected-defect convention) pins the detection
    * power: the spec asserts the orphan set is exactly the injection.
    *
    * Scale shape: each edge is ONE LEFT OUTER join from the child onto
    * the parent's distinct keys (broadcast where the parent is a dim)
    * + one aggregate computing total/orphan/distinct-orphan counts in
    * the same pass — r14 folded the original anti-join + separate
    * child-count + crossJoin (two child scans, three exchanges per
    * edge; 27 jobs for a 1.5 s-of-task-time query) into it. A child
    * row is orphan iff its probe misses, so `__pk IS NULL` after the
    * outer join is exactly the anti-join membership (null child keys
    * never match, as in the anti form), and the unmatched-count rides
    * the single scan; edges are independent jobs unioned into the
    * |FKs|-row report.
    */
  def q148RiAudit(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def audit(name: String, child: DataFrame, key: String,
        parent: DataFrame, pkey: String, bcast: Boolean): DataFrame = {
      val pk = parent.select(col(pkey).as("__pk")).distinct()
      child.select(col(key).as("__k"))
        .join(if (bcast) broadcast(pk) else pk,
          col("__k") === col("__pk"), "left_outer")
        .agg(count(lit(1)).as("n_child_rows"),
          count(when(col("__pk").isNull, 1)).as("n_orphan_rows"),
          countDistinct(when(col("__pk").isNull, col("__k")))
            .as("n_orphan_keys"))
        .select(lit(name).as("fk"), col("n_child_rows"),
          col("n_orphan_rows"), col("n_orphan_keys"))
    }
    val dirtyEvents = t.events.select(
      (col("user_id") + when(pmod(col("event_id"), lit(101L)) === 0, 1000000L)
        .otherwise(0L)).as("user_id"))
    Seq(
      audit("customer.c_nationkey -> nation", t.customer, "c_nationkey",
        t.nation, "n_nationkey", bcast = true),
      audit("events_dirty.user_id -> customer", dirtyEvents, "user_id",
        t.customer, "c_custkey", bcast = true),
      audit("lineitem.l_orderkey -> orders", t.lineitem, "l_orderkey",
        t.orders, "o_orderkey", bcast = false),
      audit("orders.o_custkey -> customer", t.orders, "o_custkey",
        t.customer, "c_custkey", bcast = true))
      .reduce(_ unionByName _).orderBy("fk")
  }

  val q148Sql: String = {
    def fk(name: String, childSql: String, key: String, parent: String,
        pkey: String) =
      s"""SELECT '$name' AS fk,
         |  (SELECT COUNT(*) FROM $childSql) AS n_child_rows,
         |  COUNT(*)::BIGINT AS n_orphan_rows,
         |  COUNT(DISTINCT $key)::BIGINT AS n_orphan_keys
         |FROM $childSql c WHERE NOT EXISTS
         |  (SELECT 1 FROM $parent p WHERE p.$pkey = c.$key)""".stripMargin
    val dirty = "(SELECT user_id + CASE WHEN event_id % 101 = 0" +
      " THEN 1000000 ELSE 0 END AS user_id FROM events)"
    Seq(
      fk("customer.c_nationkey -> nation", "customer", "c_nationkey",
        "nation", "n_nationkey"),
      fk("events_dirty.user_id -> customer", dirty, "user_id",
        "customer", "c_custkey"),
      fk("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      fk("orders.o_custkey -> customer", "orders", "o_custkey",
        "customer", "c_custkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY fk")
  }

  /** q157: join-SKEW advisor — the pre-flight diagnostic for
    * `SkewTools.saltedJoin`: profile a join key's frequency
    * distribution (max key share, max/median ratio) and emit a
    * salt/ok verdict BEFORE the join runs, instead of discovering the
    * straggler in the stage timeline. Two keys profiled side by side:
    * the natural events.user_id (near-uniform — verdict `ok`, the
    * honest common case) and a constructed hot key (every 5th event
    * collapsed onto user 0 — the q114/q132/q148 injected-defect
    * convention) that the advisor MUST flag (`salt`, spec-pinned).
    * Median key frequency via the frequency-histogram fold (exact —
    * the q190 pattern), never a rank over the distinct-key frame.
    *
    * Scale shape: one aggregate per key to the distinct-key frame,
    * then a second aggregate to the FREQUENCY histogram (domain-sized,
    * ~50 rows) whose sorted fold yields the exact median — the
    * distinct-key frame (billions of keys at 100 TB) never sorts.
    */
  def q157SkewAdvisor(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def profile(name: String, keyed: DataFrame): DataFrame = {
      // Lower-median key frequency off the FREQUENCY HISTOGRAM (the
      // q190 fold): the per-key counts frame is key-cardinality-sized
      // (billions of keys at 100 TB), so never rank it on one
      // partition — group it by count value (~50 distinct frequencies
      // here; bounded by the frequency domain), fold the sorted
      // histogram to the (n_keys+1) div 2 cut. Value-identical to the
      // rn = (nk+1) div 2 rank selection it replaces.
      val counts = keyed.groupBy("k").agg(count(lit(1)).as("c"))
      counts.groupBy("c").agg(count(lit(1)).as("kc"))
        .agg(sort_array(collect_list(struct(col("c"), col("kc")))).as("hv"),
          sum(expr("c * kc")).as("n_rows"),
          sum("kc").as("n_keys"),
          max("c").as("max_key_rows"))
        .withColumn("tgt", expr("(n_keys + 1) div 2"))
        // nullif: the fold's -1 "not reached" sentinel surfaces only on
        // an EMPTY keyed frame, where the oracle's rank form yields
        // NULL — keep the engines aligned on that edge (it also feeds
        // skew_ratio, which goes NULL by null-division either way)
        .withColumn("p50_key_rows", expr(
          "nullif(aggregate(hv, named_struct('cum', 0L, 'm', -1L), (acc, x) -> " +
            "IF(acc.m >= 0L, acc, named_struct('cum', acc.cum + x.kc, " +
            "'m', IF(acc.cum + x.kc >= tgt, x.c, -1L))), " +
            "acc -> acc.m), -1L)"))
        .select(lit(name).as("join_key"), col("n_rows"), col("n_keys"),
          col("max_key_rows"), col("p50_key_rows"),
          expr("(1000 * max_key_rows) div n_rows").as("max_share_permille"),
          expr("max_key_rows div p50_key_rows").as("skew_ratio"))
        .withColumn("verdict",
          when(col("skew_ratio") >= 10, "salt").otherwise(lit("ok")))
    }
    val natural = t.events.select(col("user_id").as("k"))
    val hot = t.events.select(
      when(pmod(col("event_id"), lit(5L)) === 0, 0L)
        .otherwise(col("user_id")).as("k"))
    profile("events.user_id", natural)
      .unionByName(profile("events.user_id_hot", hot))
      .orderBy("join_key")
  }

  val q157Sql: String = {
    def profile(name: String, keyExpr: String) =
      s"""SELECT '$name' AS join_key, SUM(c)::BIGINT AS n_rows,
         |  COUNT(*)::BIGINT AS n_keys, MAX(c)::BIGINT AS max_key_rows,
         |  MAX(CASE WHEN rn = (nk + 1) // 2 THEN c END)::BIGINT AS p50_key_rows,
         |  ((1000 * MAX(c)) // SUM(c))::BIGINT AS max_share_permille,
         |  (MAX(c) // MAX(CASE WHEN rn = (nk + 1) // 2 THEN c END))::BIGINT
         |    AS skew_ratio,
         |  CASE WHEN MAX(c) // MAX(CASE WHEN rn = (nk + 1) // 2 THEN c END) >= 10
         |    THEN 'salt' ELSE 'ok' END AS verdict
         |FROM (
         |  SELECT c, ROW_NUMBER() OVER (ORDER BY c, k) AS rn,
         |    COUNT(*) OVER () AS nk
         |  FROM (SELECT $keyExpr AS k, COUNT(*)::BIGINT AS c
         |        FROM events GROUP BY 1))""".stripMargin
    profile("events.user_id", "user_id") + "\nUNION ALL\n" +
      profile("events.user_id_hot",
        "CASE WHEN event_id % 5 = 0 THEN 0 ELSE user_id END") +
      "\nORDER BY join_key"
  }

  /** q160: WINSORIZED means — the robust location estimate for
    * metric reporting (a handful of outliers should not move a
    * dashboard): clamp each value into [p5, p95] (exact
    * disc-quantiles via the rank window) before averaging. Reported
    * beside the raw mean with the clip count, so the outlier
    * influence is visible, not hidden; q122's median/MAD flags
    * anomalous GROUPS, this stabilizes the per-group NUMBER. All
    * integer: quantiles are rank-selected values, the winsorized mean
    * is an integer division.
    *
    * Scale shape (r9): the per-lang rank rides the grouped distributed
    * scan ([[ScanOps.runningSums]] — the old per-lang rank window put
    * corpus/|langs| rows through each task); the p5/p95 cuts collapse
    * to a |langs|-row frame in one conditional aggregate and broadcast
    * back onto a plain second scan for the clamp-and-average rollup.
    * (At 100 TB swap in q128's sketch bounds when two scans are too
    * many.)
    */
  def q160WinsorizedMeans(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val docs = t.documents.select(col("lang"), col("doc_id"), col("n_chars"))
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    val cuts = ScanOps.joinKeysNullSafe(
        ScanOps.runningSums(docs, Seq("lang"),
          Seq(col("n_chars").asc, col("doc_id").asc), Seq((lit(1L), "rn"))),
        counts, Seq("lang"), broadcastRight = true)
      .groupBy("lang")
      .agg(max(when(
          expr("1000 * rn >= 50 * n and 1000 * (rn - 1) < 50 * n"),
          col("n_chars"))).as("p5"),
        max(when(
          expr("1000 * rn >= 950 * n and 1000 * (rn - 1) < 950 * n"),
          col("n_chars"))).as("p95"))
    ScanOps.joinKeysNullSafe(docs, cuts, Seq("lang"), broadcastRight = true)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(n_chars) div count(1)").as("raw_mean"),
        expr("sum(greatest(least(n_chars, p95), p5)) div count(1)")
          .as("winsor_mean"),
        count(when(col("n_chars") < col("p5") ||
          col("n_chars") > col("p95"), 1)).as("n_clipped"))
      .orderBy("lang")
  }

  val q160Sql: String =
    """WITH rk AS (
      |  SELECT lang, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY lang) AS n
      |  FROM documents),
      |cuts AS (
      |  SELECT *,
      |    MAX(CASE WHEN 1000 * rn >= 50 * n AND 1000 * (rn - 1) < 50 * n
      |        THEN n_chars END) OVER (PARTITION BY lang) AS p5,
      |    MAX(CASE WHEN 1000 * rn >= 950 * n AND 1000 * (rn - 1) < 950 * n
      |        THEN n_chars END) OVER (PARTITION BY lang) AS p95
      |  FROM rk)
      |SELECT lang, COUNT(*)::BIGINT AS n_docs,
      |  (SUM(n_chars) // COUNT(*))::BIGINT AS raw_mean,
      |  (SUM(greatest(least(n_chars, p95), p5)) // COUNT(*))::BIGINT
      |    AS winsor_mean,
      |  COUNT(*) FILTER (WHERE n_chars < p5 OR n_chars > p95)::BIGINT
      |    AS n_clipped
      |FROM cuts GROUP BY lang ORDER BY lang""".stripMargin

  /** q162: l-DIVERSITY audit — k-anonymity's necessary companion
    * (Machanavajjhala et al.): a QI class can satisfy k ≥ 5 and still
    * leak, if all its members share the same SENSITIVE value
    * (attribute disclosure — "I don't know which row you are, but
    * everyone in your class has X"). Per q130's QI classes (nation ×
    * balance band), count distinct sensitive values (market segment
    * standing in); the histogram of l values and the count of
    * k-anonymous-but-l=1 classes is the residual-risk report q130
    * alone cannot see.
    *
    * Scale shape: one QI-bounded aggregate with a distinct count,
    * then a tiny l-histogram rollup.
    */
  def q162LDiversity(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .groupBy(col("c_nationkey"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
      .agg(count(lit(1)).as("k"), countDistinct("c_mktsegment").as("l"))
      .groupBy("l")
      .agg(count(lit(1)).as("n_classes"), sum("k").as("n_rows"),
        count(when(col("k") >= 5, 1)).as("n_k_anonymous"),
        count(when(col("k") >= 5 && col("l") === 1, 1))
          .as("n_k_anon_but_exposed"))
      .orderBy("l")
  }

  val q162Sql: String =
    """WITH classes AS (
      |  SELECT c_nationkey, floor(c_acctbal / 1000)::BIGINT AS bal_band,
      |    COUNT(*)::BIGINT AS k,
      |    COUNT(DISTINCT c_mktsegment)::BIGINT AS l
      |  FROM customer GROUP BY 1, 2)
      |SELECT l, COUNT(*)::BIGINT AS n_classes, SUM(k)::BIGINT AS n_rows,
      |  COUNT(*) FILTER (WHERE k >= 5)::BIGINT AS n_k_anonymous,
      |  COUNT(*) FILTER (WHERE k >= 5 AND l = 1)::BIGINT
      |    AS n_k_anon_but_exposed
      |FROM classes GROUP BY l ORDER BY l""".stripMargin

  /** q170: BENFORD first-digit audit — the synthetic/fabricated-data
    * detector: organically-grown monetary amounts follow Benford's law
    * (P(first digit d) = log₁₀(1+1/d)); uniform generators, copy-paste
    * duplication, and fabricated records do not. Per monetary column,
    * the observed first-significant-digit histogram sits beside the
    * Benford expectation and a χ²-style integer distance — a distance
    * far above its siblings flags the column (or the source that fed
    * it) for provenance review before it trains anything. First digit
    * comes from integer cents (floor(|x|·100) — floor is IEEE-exact,
    * no rounding-mode divergence between engines); all shares are
    * truncating per-mille.
    *
    * Scale shape: three independent narrow scans, each reducing
    * map-side to a ≤9-row digit histogram; the χ² window runs over 27
    * rows. Embarrassingly parallel at any corpus size.
    */
  def q170BenfordAudit(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val exp = Seq(301L, 176L, 125L, 97L, 79L, 67L, 58L, 51L, 46L)
    def digits(df: DataFrame, name: String, c: String): DataFrame =
      df.select(floor(abs(col(c)) * 100.0d).cast("long").as("cents"))
        .filter(col("cents") > 0L)
        .select(substring(col("cents").cast("string"), 1, 1).cast("long")
          .as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
        .select(lit(name).as("column_name"), col("digit"), col("n"))
    val obs =
      digits(t.orders, "o_totalprice", "o_totalprice")
        .unionByName(digits(t.lineitem, "l_extendedprice", "l_extendedprice"))
        .unionByName(digits(t.customer, "c_acctbal", "c_acctbal"))
    val expDf = spark.createDataFrame(
      spark.sparkContext.parallelize(exp.zipWithIndex.map {
        case (pm, i) => org.apache.spark.sql.Row((i + 1).toLong, pm)
      }),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("digit",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("exp_permille",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val wCol = Window.partitionBy("column_name")
    obs
      .withColumn("total", sum("n").over(wCol))
      .withColumn("obs_permille", expr("(1000 * n) div total"))
      .join(broadcast(expDf), Seq("digit"))
      .withColumn("chi2_x1000", sum(
        expr("((obs_permille - exp_permille) * (obs_permille - exp_permille)) " +
          "div exp_permille")).over(wCol))
      .select("column_name", "digit", "n", "obs_permille", "exp_permille",
        "chi2_x1000")
      .orderBy("column_name", "digit")
  }

  val q170Sql: String = {
    val exp = Seq(301L, 176L, 125L, 97L, 79L, 67L, 58L, 51L, 46L)
    val expRows = exp.zipWithIndex
      .map { case (pm, i) => s"(${i + 1}::BIGINT, $pm::BIGINT)" }.mkString(", ")
    def digits(table: String, c: String) =
      s"""SELECT '$c' AS column_name,
         |    substr(cents::VARCHAR, 1, 1)::BIGINT AS digit,
         |    COUNT(*)::BIGINT AS n
         |  FROM (SELECT floor(abs($c) * 100.0)::BIGINT AS cents FROM $table)
         |  WHERE cents > 0 GROUP BY 1, 2"""
    s"""WITH obs AS (
       |${digits("orders", "o_totalprice")}
       |  UNION ALL
       |${digits("lineitem", "l_extendedprice")}
       |  UNION ALL
       |${digits("customer", "c_acctbal")}),
       |expected(digit, exp_permille) AS (VALUES $expRows),
       |shares AS (
       |  SELECT column_name, digit, n,
       |    ((1000 * n) // SUM(n) OVER (PARTITION BY column_name))::BIGINT
       |      AS obs_permille
       |  FROM obs)
       |SELECT s.column_name, s.digit, s.n, s.obs_permille, e.exp_permille,
       |  SUM(((s.obs_permille - e.exp_permille)
       |       * (s.obs_permille - e.exp_permille)) // e.exp_permille)
       |    OVER (PARTITION BY s.column_name)::BIGINT AS chi2_x1000
       |FROM shares s JOIN expected e USING (digit)
       |ORDER BY s.column_name, s.digit""".stripMargin
  }

  /** q171: join-CARDINALITY estimator audit — the CBO sanity check:
    * the textbook uniform-containment estimate |A ⋈ B| ≈
    * |A|·|B| / max(ndv(A.k), ndv(B.k)) is what cost-based optimizers
    * (and this engine's own broadcast/salting decisions — q157) plan
    * with; this measures it against the TRUE join cardinality for the
    * star-schema's four FK edges. err_permille far from 1000 marks a
    * key where uniformity is violated (skew, orphans) and any plan
    * built on the estimate — join order, broadcast threshold, shuffle
    * partition count — inherits the error. All integer arithmetic.
    *
    * Scale shape (r14 reshape): per edge, ONE exchange — union both
    * sides' keys side-tagged, group by key to per-key (cl, cr)
    * counts, and a final scalar aggregate reads every statistic off
    * that frame: n/ndv per side as conditional sums, and the true
    * join cardinality as Σ cl·cr over non-null keys (the equi-join
    * count by definition, without materializing a single joined row).
    * The original shape paid two extra full scans per side (separate
    * stat aggregates) plus the join's own shuffle and two crossJoins
    * — 29 jobs for ~1 s of task time; this is 4 independent
    * two-stage aggregates. Exact ndv — swap in q19's HLL contract at
    * 100 TB. Σ cl·cr and n_left·n_right overflow int64 only past ~3e9
    * rows per side/key — per-shard audits long before that
    * (documented bound).
    */
  def q171JoinCardinality(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def audit(name: String, left: DataFrame, lk: String,
        right: DataFrame, rk: String): DataFrame = {
      val keyed = left.select(col(lk).as("__k"), lit(1L).as("__l"),
          lit(0L).as("__r"))
        .unionByName(right.select(col(rk).as("__k"), lit(0L).as("__l"),
          lit(1L).as("__r")))
        .groupBy("__k").agg(sum("__l").as("cl"), sum("__r").as("cr"))
      keyed.agg(
          coalesce(sum("cl"), lit(0L)).as("n_left"),
          count(when(col("__k").isNotNull && col("cl") > 0, 1))
            .as("ndv_left"),
          coalesce(sum("cr"), lit(0L)).as("n_right"),
          count(when(col("__k").isNotNull && col("cr") > 0, 1))
            .as("ndv_right"),
          coalesce(sum(when(col("__k").isNotNull, col("cl") * col("cr"))),
            lit(0L)).as("actual_rows"))
        .select(lit(name).as("join_name"),
          col("n_left"), col("ndv_left"), col("n_right"), col("ndv_right"),
          expr("(n_left * n_right) div greatest(ndv_left, ndv_right)")
            .as("est_rows"),
          col("actual_rows"))
        .withColumn("err_permille",
          expr("(1000 * est_rows) div greatest(actual_rows, 1)"))
    }
    audit("customer_orders", t.orders, "o_custkey", t.customer, "c_custkey")
      .unionByName(audit("lineitem_orders",
        t.lineitem, "l_orderkey", t.orders, "o_orderkey"))
      .unionByName(audit("lineitem_part",
        t.lineitem, "l_partkey", t.part, "p_partkey"))
      .unionByName(audit("lineitem_supplier",
        t.lineitem, "l_suppkey", t.supplier, "s_suppkey"))
      .orderBy("join_name")
  }

  val q171Sql: String = {
    def audit(name: String, lt: String, lk: String, rt: String, rk: String) =
      s"""SELECT '$name' AS join_name, ls.n_left, ls.ndv_left,
         |    rs.n_right, rs.ndv_right,
         |    ((ls.n_left * rs.n_right)
         |      // greatest(ls.ndv_left, rs.ndv_right))::BIGINT AS est_rows,
         |    ac.actual_rows,
         |    ((1000 * ((ls.n_left * rs.n_right)
         |        // greatest(ls.ndv_left, rs.ndv_right)))
         |      // greatest(ac.actual_rows, 1))::BIGINT AS err_permille
         |  FROM
         |    (SELECT COUNT(*)::BIGINT AS n_left,
         |       COUNT(DISTINCT $lk)::BIGINT AS ndv_left FROM $lt) ls,
         |    (SELECT COUNT(*)::BIGINT AS n_right,
         |       COUNT(DISTINCT $rk)::BIGINT AS ndv_right FROM $rt) rs,
         |    (SELECT COUNT(*)::BIGINT AS actual_rows
         |       FROM $lt l JOIN $rt r ON l.$lk = r.$rk) ac"""
    Seq(
      audit("customer_orders", "orders", "o_custkey", "customer", "c_custkey"),
      audit("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      audit("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
      audit("lineitem_supplier",
        "lineitem", "l_suppkey", "supplier", "s_suppkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY join_name").stripMargin
  }

  /** q174: χ² INDEPENDENCE audit (source × lang) — the
    * mix-composition test behind "is language balance a property of
    * the corpus or of specific sources?": under independence every
    * source would carry every language at the corpus rate; the χ²
    * statistic (Σ (O−E)²/E over the contingency table) measures how
    * far reality deviates, and the per-cell contributions RANK the
    * (source, language) pairs that drive the skew — the cells a
    * rebalancing pass (q142 UniMax) must touch first. All integer:
    * E scaled ×1000 with truncating division, so both engines hash
    * the same cells (a float χ² would drift).
    *
    * Scale shape: one pre-combined aggregate to the contingency table
    * (cells = |sources|×|langs|, not corpus rows), then window sums
    * over that tiny frame. 1000·O must fit int64 — fine to ~9e15 rows
    * per cell (decimal swap documented past that).
    */
  def q174ChiSquare(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val cells = t.documents.groupBy("source", "lang")
      .agg(count(lit(1)).as("n"))
    val all = Window.partitionBy()
    cells
      .withColumn("row_total", sum("n").over(Window.partitionBy("source")))
      .withColumn("col_total", sum("n").over(Window.partitionBy("lang")))
      .withColumn("grand", sum("n").over(all))
      .withColumn("e_x1000",
        expr("(1000 * row_total * col_total) div grand"))
      .withColumn("contrib_x1000", expr(
        "((1000 * n - e_x1000) * (1000 * n - e_x1000)) div (1000 * e_x1000)"))
      .withColumn("chi2_x1000", sum("contrib_x1000").over(all))
      .withColumn("dof",
        (size(collect_set("source").over(all)) - 1).cast("long") *
          (size(collect_set("lang").over(all)) - 1).cast("long"))
      .select("source", "lang", "n", "e_x1000", "contrib_x1000",
        "chi2_x1000", "dof")
      .orderBy("source", "lang")
  }

  val q174Sql: String =
    """WITH cells AS (
      |  SELECT source, lang, COUNT(*)::BIGINT AS n
      |  FROM documents GROUP BY source, lang),
      |ext AS (
      |  SELECT source, lang, n,
      |    SUM(n) OVER (PARTITION BY source) AS row_total,
      |    SUM(n) OVER (PARTITION BY lang) AS col_total,
      |    SUM(n) OVER () AS grand
      |  FROM cells),
      |scored AS (
      |  SELECT source, lang, n,
      |    ((1000 * row_total * col_total) // grand)::BIGINT AS e_x1000
      |  FROM ext),
      |contrib AS (
      |  SELECT *,
      |    (((1000 * n - e_x1000) * (1000 * n - e_x1000))
      |      // (1000 * e_x1000))::BIGINT AS contrib_x1000
      |  FROM scored)
      |SELECT source, lang, n, e_x1000, contrib_x1000,
      |  SUM(contrib_x1000) OVER ()::BIGINT AS chi2_x1000,
      |  ((COUNT(DISTINCT source) OVER () - 1)
      |    * (COUNT(DISTINCT lang) OVER () - 1))::BIGINT AS dof
      |FROM contrib ORDER BY source, lang""".stripMargin

  /** q175: per-source DATA CARD — the one-query datasheet a corpus
    * release ships with (Gebru et al.'s "Datasheets for Datasets",
    * operationalized): per source, the volume numbers (docs, chars,
    * mean length), the language profile (distinct langs, dominant
    * lang + its share), the redundancy number (exact-duplicate share
    * by content hash), and the split exposure (q38's deterministic
    * hash-split shares — proof the source leaks nowhere). One row per
    * source; every other audit in this file is the drill-down behind
    * one of these columns. All integer per-milles.
    *
    * Scale shape: two pre-combined aggregates over (source[, lang])
    * plus one distinct-count of content hashes per source (q19's HLL
    * contract replaces exact distincts at 100 TB); the argmax-lang
    * window runs on the source×lang frame, not the corpus.
    */
  def q175DataCard(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val bucket = pmod(graft.functions.TextFunctions.md5Long60(
      col("doc_id").cast("string")), lit(100L))
    val base = t.documents.select(col("source"), col("lang"),
      col("n_chars"), md5(col("text")).as("h"), bucket.as("b"))
    val stats = base.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("n_chars_total"),
        expr("sum(n_chars) div count(1)").as("mean_chars"),
        countDistinct("lang").as("n_langs"),
        countDistinct("h").as("n_distinct"),
        count(when(col("b") < 80, 1)).as("n_train"),
        count(when(col("b") >= 80 && col("b") < 90, 1)).as("n_val"),
        count(when(col("b") >= 90, 1)).as("n_test"))
    val topLang = base.groupBy("source", "lang")
      .agg(count(lit(1)).as("ln"))
      .withColumn("rn", row_number().over(Window.partitionBy("source")
        .orderBy(desc("ln"), asc("lang"))))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"),
        col("ln").as("top_lang_n"))
    stats.join(topLang, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_chars_total"),
        col("mean_chars"), col("n_langs"), col("top_lang"),
        expr("(1000 * top_lang_n) div n_docs").as("top_lang_permille"),
        expr("(1000 * (n_docs - n_distinct)) div n_docs")
          .as("exactdup_permille"),
        expr("(1000 * n_train) div n_docs").as("train_permille"),
        expr("(1000 * n_val) div n_docs").as("val_permille"),
        expr("(1000 * n_test) div n_docs").as("test_permille"))
      .orderBy("source")
  }

  val q175Sql: String = {
    val bucket = s"(${OracleSql.md5Long60("doc_id::VARCHAR")} % 100)"
    s"""WITH base AS (
       |  SELECT source, lang, n_chars, md5(text) AS h, $bucket AS b
       |  FROM documents),
       |stats AS (
       |  SELECT source, COUNT(*)::BIGINT AS n_docs,
       |    SUM(n_chars)::BIGINT AS n_chars_total,
       |    (SUM(n_chars) // COUNT(*))::BIGINT AS mean_chars,
       |    COUNT(DISTINCT lang)::BIGINT AS n_langs,
       |    COUNT(DISTINCT h)::BIGINT AS n_distinct,
       |    COUNT(*) FILTER (WHERE b < 80)::BIGINT AS n_train,
       |    COUNT(*) FILTER (WHERE b >= 80 AND b < 90)::BIGINT AS n_val,
       |    COUNT(*) FILTER (WHERE b >= 90)::BIGINT AS n_test
       |  FROM base GROUP BY source),
       |top_lang AS (
       |  SELECT source, lang AS top_lang, ln AS top_lang_n FROM (
       |    SELECT source, lang, COUNT(*)::BIGINT AS ln,
       |      ROW_NUMBER() OVER (PARTITION BY source
       |        ORDER BY COUNT(*) DESC, lang) AS rn
       |    FROM base GROUP BY source, lang)
       |  WHERE rn = 1)
       |SELECT s.source, s.n_docs, s.n_chars_total, s.mean_chars, s.n_langs,
       |  t.top_lang,
       |  ((1000 * t.top_lang_n) // s.n_docs)::BIGINT AS top_lang_permille,
       |  ((1000 * (s.n_docs - s.n_distinct)) // s.n_docs)::BIGINT
       |    AS exactdup_permille,
       |  ((1000 * s.n_train) // s.n_docs)::BIGINT AS train_permille,
       |  ((1000 * s.n_val) // s.n_docs)::BIGINT AS val_permille,
       |  ((1000 * s.n_test) // s.n_docs)::BIGINT AS test_permille
       |FROM stats s JOIN top_lang t USING (source)
       |ORDER BY s.source""".stripMargin
  }

  /** q179: DELETION-CASCADE audit — the right-to-be-forgotten dry
    * run: given a tombstone set of entities (here a deterministic
    * ~5% hash slice of customers — the stand-in for a GDPR/CCPA
    * request batch), measure the blast radius BEFORE mutating
    * anything: rows to delete per table along the FK cascade
    * (customer → orders → lineitem), as counts and per-milles. The
    * audit is what sizes the compaction the deletion will trigger
    * (q151) and proves the cascade reaches everything q148's RI
    * audit says is connected.
    *
    * Scale shape: the tombstone set derives from a hash predicate
    * (no materialized list to distribute); each hop is a SEMI join
    * on the FK — orders filters against tombstoned customers,
    * lineitem against the affected orders — the same partitioning
    * AQE plans for the RI audit. Output: 3 ledger rows.
    */
  def q179DeletionCascade(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.md5Long60
    val t = Tables(spark, dir)
    val tombPred =
      pmod(md5Long60(col("c_custkey").cast("string")), lit(100L)) < 5L
    // each table's (total, to-delete) pair comes out of ONE pass: the
    // tombstone/hit side joins LEFT on a unique key (PK — no fan-out),
    // so count(*) is the table and count(key) is the blast radius —
    // no separate total-count scan of the two big tables.
    def shape(name: String, d: DataFrame): DataFrame =
      d.select(lit(name).as("table_name"), col("n_rows"),
        col("n_to_delete"),
        expr("(1000 * n_to_delete) div n_rows").as("delete_permille"))
    val custLedger = shape("customer", t.customer
      .agg(count(lit(1)).as("n_rows"),
        count(when(tombPred, 1)).as("n_to_delete")))
    val tomb = t.customer.filter(tombPred).select(col("c_custkey").as("k"))
    val ordLedger = shape("orders", t.orders
      .join(tomb, col("o_custkey") === col("k"), "left")
      .agg(count(lit(1)).as("n_rows"), count(col("k")).as("n_to_delete")))
    val ordersHit = t.orders
      .join(tomb, col("o_custkey") === col("k"), "left_semi")
      .select(col("o_orderkey"))
    val itemLedger = shape("lineitem", t.lineitem
      .join(ordersHit, col("l_orderkey") === col("o_orderkey"), "left")
      .agg(count(lit(1)).as("n_rows"),
        count(col("o_orderkey")).as("n_to_delete")))
    custLedger.unionByName(ordLedger).unionByName(itemLedger)
      .orderBy("table_name")
  }

  val q179Sql: String = {
    val bucket = s"(${OracleSql.md5Long60("c_custkey::VARCHAR")} % 100)"
    s"""WITH tomb AS (
       |  SELECT c_custkey AS k FROM customer WHERE $bucket < 5),
       |o_hit AS (
       |  SELECT o_orderkey FROM orders
       |  WHERE o_custkey IN (SELECT k FROM tomb)),
       |l_hit AS (
       |  SELECT 1 AS x FROM lineitem
       |  WHERE l_orderkey IN (SELECT o_orderkey FROM o_hit))
       |SELECT 'customer' AS table_name,
       |  (SELECT COUNT(*) FROM customer)::BIGINT AS n_rows,
       |  (SELECT COUNT(*) FROM tomb)::BIGINT AS n_to_delete,
       |  ((1000 * (SELECT COUNT(*) FROM tomb))
       |    // (SELECT COUNT(*) FROM customer))::BIGINT AS delete_permille
       |UNION ALL
       |SELECT 'lineitem',
       |  (SELECT COUNT(*) FROM lineitem)::BIGINT,
       |  (SELECT COUNT(*) FROM l_hit)::BIGINT,
       |  ((1000 * (SELECT COUNT(*) FROM l_hit))
       |    // (SELECT COUNT(*) FROM lineitem))::BIGINT
       |UNION ALL
       |SELECT 'orders',
       |  (SELECT COUNT(*) FROM orders)::BIGINT,
       |  (SELECT COUNT(*) FROM o_hit)::BIGINT,
       |  ((1000 * (SELECT COUNT(*) FROM o_hit))
       |    // (SELECT COUNT(*) FROM orders))::BIGINT
       |ORDER BY table_name""".stripMargin
  }

  /** q187: WEIGHTED percentiles — the answer to "what document length
    * does the median TOKEN live in?" (every unweighted length
    * percentile — q27/q133 — answers about the median DOCUMENT, a
    * different and usually less useful number when sizing context
    * windows: half the tokens can live above the doc-median). Weight
    * = n_chars; the weighted p50/p90/p99 per source is the first
    * value whose cumulative weight crosses the cut (type-7 weighted
    * quantile, deterministic ties by (value, doc_id)). All integer:
    * cumulative weights vs 1000·cut per-milles.
    *
    * Scale shape (r9): the per-source cumulative weight IS the
    * grouped distributed scan ([[ScanOps.runningSums]] of the weight —
    * the old per-source window put corpus/|sources| rows through each
    * task); per-source totals come from a |sources|-row aggregate
    * broadcast back. The 3-cut conditional aggregate is the rollup.
    * (q128's sketch replaces the exact pass at 100 TB when needed.)
    */
  def q187WeightedPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val docs = t.documents.select("source", "doc_id", "n_chars")
    val totals = docs.groupBy("source").agg(sum("n_chars").as("tw"))
    ScanOps.joinKeysNullSafe(
        ScanOps.runningSums(docs, Seq("source"),
          Seq(col("n_chars").asc, col("doc_id").asc),
          Seq((col("n_chars").cast("long"), "cw"))),
        totals, Seq("source"), broadcastRight = true)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), max("tw").as("total_weight"),
        min(when(expr("1000 * cw >= 500 * tw"), col("n_chars")))
          .as("w_p50"),
        min(when(expr("1000 * cw >= 900 * tw"), col("n_chars")))
          .as("w_p90"),
        min(when(expr("1000 * cw >= 990 * tw"), col("n_chars")))
          .as("w_p99"))
      .orderBy("source")
  }

  val q187Sql: String =
    """WITH cum AS (
      |  SELECT source, n_chars,
      |    SUM(n_chars) OVER (PARTITION BY source ORDER BY n_chars, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
      |    SUM(n_chars) OVER (PARTITION BY source) AS tw
      |  FROM documents)
      |SELECT source, COUNT(*)::BIGINT AS n_docs,
      |  MAX(tw)::BIGINT AS total_weight,
      |  MIN(CASE WHEN 1000 * cw >= 500 * tw THEN n_chars END)::BIGINT
      |    AS w_p50,
      |  MIN(CASE WHEN 1000 * cw >= 900 * tw THEN n_chars END)::BIGINT
      |    AS w_p90,
      |  MIN(CASE WHEN 1000 * cw >= 990 * tw THEN n_chars END)::BIGINT
      |    AS w_p99
      |FROM cum GROUP BY source ORDER BY source""".stripMargin

  /** q198: two-sample KOLMOGOROV–SMIRNOV drift test, each source vs
    * the rest of the corpus, over the document-length distribution —
    * the distribution-shape drift detector the moment statistics
    * (q122 robust z, q186 variances) cannot be: KS sees a bimodal
    * split or a truncated tail even when mean and variance barely
    * move. D = max_x |ecdf_src(x) − ecdf_rest(x)| carried as the exact
    * integer cross-product |cum_s·n_rest − cum_rest·n_src| (no float
    * ECDFs), reported in ‰ with the α=0.05 critical value
    * 1.358·√((n+m)/(n·m)) (one double sqrt of an integer ratio —
    * IEEE-identical in both engines) and the reject verdict.
    *
    * Scale shape: the ECDF grid is (distinct length) × (source) — both
    * factors BOUNDED (lengths are capped by the ingest policy, sources
    * by the catalog), so the grid is dictionary-sized regardless of
    * corpus rows: one (source, x) count aggregate, a broadcast
    * source-totals crossJoin onto the distinct-x frame, and per-source
    * cumulative windows over ≤ |x| rows. The corpus-sized work is ONE
    * groupBy(source, x) reduction.
    */
  def q198KsDrift(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val lens = t.documents.select(col("source"), col("n_chars").as("x"))
    val bySrcX = lens.groupBy("source", "x").agg(count(lit(1)).as("c"))
    val xs = lens.groupBy("x").agg(count(lit(1)).as("tc"))
      .localCheckpoint(false)
    val srcTotals = lens.groupBy("source").agg(count(lit(1)).as("n_s"))
      .withColumn("n", sum("n_s").over(Window.partitionBy(lit(1))))
      .localCheckpoint(false)
    val wCum = Window.partitionBy("source").orderBy("x")
    q198Grid(xs, srcTotals, bySrcX)
      .withColumn("cum_s", sum("c").over(wCum))
      .withColumn("cum_all", sum("tc").over(wCum))
      .withColumn("dnum",
        abs(col("cum_s") * (col("n") - col("n_s")) -
          (col("cum_all") - col("cum_s")) * col("n_s")))
      .groupBy("source")
      .agg(max("n_s").as("n_docs"), max("n").as("n_total"),
        max("dnum").as("dmax"))
      .withColumn("ks_permille",
        expr("(1000L * dmax) div (n_docs * (n_total - n_docs))"))
      .withColumn("crit_permille", expr(
        "cast(floor(1358.0d * sqrt(cast(n_total as double) / " +
          "(cast(n_docs as double) * cast(n_total - n_docs as double)))) as long)"))
      .withColumn("drifted",
        (col("ks_permille") > col("crit_permille")).cast("long"))
      .select("source", "n_docs", "ks_permille", "crit_permille", "drifted")
      .orderBy("source")
  }

  /** The (source × distinct-x) evaluation grid with per-cell source
    * counts (0 where the source has no doc of that length) — split out
    * so the main query reads as the KS walk itself.
    */
  private def q198Grid(xs: DataFrame, srcTotals: DataFrame,
      bySrcX: DataFrame): DataFrame =
    xs.crossJoin(broadcast(srcTotals))
      .join(bySrcX, Seq("source", "x"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))

  val q198Sql: String =
    """WITH lens AS (SELECT source, n_chars AS x FROM documents),
      |bysx AS (
      |  SELECT source, x, COUNT(*)::BIGINT AS c FROM lens GROUP BY 1, 2),
      |xs AS (SELECT x, COUNT(*)::BIGINT AS tc FROM lens GROUP BY 1),
      |st AS (
      |  SELECT source, COUNT(*)::BIGINT AS n_s,
      |    SUM(COUNT(*)) OVER ()::BIGINT AS n
      |  FROM lens GROUP BY 1),
      |grid AS (
      |  SELECT st.source, xs.x, xs.tc, st.n_s, st.n,
      |    COALESCE(b.c, 0) AS c
      |  FROM xs CROSS JOIN st
      |  LEFT JOIN bysx b ON b.source = st.source AND b.x = xs.x),
      |cums AS (
      |  SELECT source, n_s, n,
      |    SUM(c) OVER (PARTITION BY source ORDER BY x) AS cum_s,
      |    SUM(tc) OVER (PARTITION BY source ORDER BY x) AS cum_all
      |  FROM grid),
      |d AS (
      |  SELECT source, MAX(n_s) AS n_docs, MAX(n) AS n_total,
      |    MAX(abs(cum_s * (n - n_s) - (cum_all - cum_s) * n_s)) AS dmax
      |  FROM cums GROUP BY 1)
      |SELECT source, n_docs,
      |  ((1000 * dmax) // (n_docs * (n_total - n_docs)))::BIGINT
      |    AS ks_permille,
      |  floor(1358.0 * sqrt(n_total::DOUBLE /
      |    (n_docs::DOUBLE * (n_total - n_docs)::DOUBLE)))::BIGINT
      |    AS crit_permille,
      |  (CASE WHEN (1000 * dmax) // (n_docs * (n_total - n_docs)) >
      |    floor(1358.0 * sqrt(n_total::DOUBLE /
      |      (n_docs::DOUBLE * (n_total - n_docs)::DOUBLE)))
      |    THEN 1 ELSE 0 END)::BIGINT AS drifted
      |FROM d ORDER BY source""".stripMargin

  /** q204: K-ANONYMITY census — the re-identification risk audit
    * (Sweeney 2002) a governance review runs BEFORE releasing a
    * dataset projection: over the quasi-identifier tuple
    * (lang, source, length octave — the attributes that survive q54's
    * redaction), how many equivalence classes fall below k, and what
    * share of DOCUMENTS they expose, reported at k ∈ {2, 5, 10, 20}
    * (k<2 = unique rows, fully re-identifiable by the QI alone). The
    * class-size frame is the same object q157 profiles for skew —
    * here read for privacy: a class of 1 is a fingerprint. Length
    * joins the QI as its BIT LENGTH (octave bucket, the q180/q89
    * integer-⌊log₂⌋ idiom) because releases bucket continuous
    * attributes exactly this way.
    *
    * Scale shape: one map-side-combined aggregate to the QI-class
    * frame (bounded by the QI domain, |langs|·|sources|·≤64 octaves —
    * and still aggregate-output-sized for higher-cardinality QIs),
    * then a 4-threshold explode + rollup over that frame. The corpus
    * crosses once.
    */
  def q204KAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // greatest(n_chars, 0): Spark's bin() of a negative BIGINT is a
    // 64-char two's-complement string while DuckDB's width depends on
    // the column's integer type — clamp (mirrored in the oracle) so a
    // corrupt/sentinel negative length lands in octave 1, not in an
    // engine-dependent bucket
    val classes = t.documents
      .groupBy(col("lang"), col("source"),
        length(bin(greatest(col("n_chars"), lit(0L)))).cast("long")
          .as("len_octave"))
      .agg(count(lit(1)).as("k"))
    classes
      .select(col("k"),
        explode(array(Seq(2L, 5L, 10L, 20L).map(lit): _*)).as("threshold"))
      .groupBy("threshold")
      .agg(count(lit(1)).as("n_classes"),
        sum("k").as("n_docs"),
        count(when(col("k") < col("threshold"), 1)).as("n_small_classes"),
        sum(when(col("k") < col("threshold"), col("k")).otherwise(0L))
          .as("n_exposed_docs"))
      .withColumn("exposed_permille",
        expr("(1000 * n_exposed_docs) div n_docs"))
      .orderBy("threshold")
  }

  val q204Sql: String =
    """WITH classes AS (
      |  SELECT lang, source,
      |    length(bin(greatest(n_chars, 0)::BIGINT))::BIGINT AS len_octave,
      |    COUNT(*)::BIGINT AS k
      |  FROM documents GROUP BY 1, 2, 3),
      |expl AS (
      |  SELECT k, unnest([2, 5, 10, 20])::BIGINT AS threshold FROM classes)
      |SELECT threshold, COUNT(*)::BIGINT AS n_classes, SUM(k)::BIGINT AS n_docs,
      |  COUNT(*) FILTER (WHERE k < threshold)::BIGINT AS n_small_classes,
      |  SUM(CASE WHEN k < threshold THEN k ELSE 0 END)::BIGINT
      |    AS n_exposed_docs,
      |  ((1000 * SUM(CASE WHEN k < threshold THEN k ELSE 0 END)) // SUM(k))
      |    ::BIGINT AS exposed_permille
      |FROM expl GROUP BY 1 ORDER BY 1""".stripMargin

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q204_k_anonymity" -> (q204KAnonymity _),
    "q198_ks_drift" -> (q198KsDrift _),
    "q187_weighted_percentiles" -> (q187WeightedPercentiles _),
    "q179_deletion_cascade" -> (q179DeletionCascade _),
    "q174_chi_square" -> (q174ChiSquare _),
    "q175_data_card" -> (q175DataCard _),
    "q170_benford_audit" -> (q170BenfordAudit _),
    "q171_join_cardinality" -> (q171JoinCardinality _),
    "q146_concentration" -> (q146Concentration _),
    "q147_fd_audit" -> (q147FdAudit _),
    "q148_ri_audit" -> (q148RiAudit _),
    "q157_skew_advisor" -> (q157SkewAdvisor _),
    "q160_winsorized_means" -> (q160WinsorizedMeans _),
    "q162_l_diversity" -> (q162LDiversity _),
    "q85_profile" -> (q85Profile _),
    "q93_format_roundtrip" -> (q93FormatRoundtrip _),
    "q130_k_anonymity" -> (q130KAnonymity _),
    "q133_equidepth_histogram" -> (q133EquiDepth _),
  )

  val oracle: Map[String, String] = Map(
    "q204_k_anonymity" -> q204Sql,
    "q198_ks_drift" -> q198Sql,
    "q187_weighted_percentiles" -> q187Sql,
    "q179_deletion_cascade" -> q179Sql,
    "q174_chi_square" -> q174Sql,
    "q175_data_card" -> q175Sql,
    "q170_benford_audit" -> q170Sql,
    "q171_join_cardinality" -> q171Sql,
    "q85_profile" -> q85Sql,
    "q93_format_roundtrip" -> q93Sql,
    "q130_k_anonymity" -> q130Sql,
    "q133_equidepth_histogram" -> q133Sql,
    "q146_concentration" -> q146Sql,
    "q147_fd_audit" -> q147Sql,
    "q148_ri_audit" -> q148Sql,
    "q157_skew_advisor" -> q157Sql,
    "q160_winsorized_means" -> q160Sql,
    "q162_l_diversity" -> q162Sql,
  )
}
