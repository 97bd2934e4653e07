package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact DISTRIBUTED PREFIX SCAN — global running aggregates over a
  * total order with NO corpus-sized single-partition sort anywhere.
  *
  * The missing primitive behind every "cumulative X by global rank"
  * query this engine has so far deliberately dodged (q197 chose
  * histogram truncation, q173 a two-level rank, q190/q157 histogram
  * medians — all exact only because their value domains are bounded).
  * When the ORDER key is high-cardinality and the running value must
  * be exact at EVERY rank, the classic two-phase scan is the answer,
  * and it is three bounded stages:
  *
  *   1. `repartitionByRange(sortCols)` — the distributed sort's
  *      partitioning step (sampled boundaries; correctness never
  *      depends on where they land, only on each partition holding a
  *      contiguous key range). A lazy localCheckpoint pins the
  *      partition assignment so both downstream consumers read the
  *      SAME physical split.
  *   2. per-partition running sums — `Window.partitionBy(__pid)`,
  *      so every window task sorts one range partition, never the
  *      corpus. Partition sizes are balanced by the range sampler.
  *   3. per-partition totals (≤ |partitions| rows) cumsum'd in one
  *      bounded unpartitioned window and broadcast back as offsets.
  *
  * Rows shuffle exactly twice (range exchange + pid window exchange);
  * the offset frame is partition-count-sized. Output values are
  * independent of the sampled boundaries, so results are
  * deterministic given a TOTAL order (include a unique tiebreak in
  * `sortCols` — a partial order makes per-partition sorts
  * tie-ambiguous in any engine).
  */
object ScanOps {

  /** Fan a NARROW scan out to the session's parallelism before heavy
    * per-row work (tokenization, hashing, shingling). The driver's
    * testdata ships one single-row-group parquet file per table, so
    * every scan is ONE task no matter the split config — and a
    * tokenize-everything pipeline then runs on one core of 32 (guide
    * §2.5 "input skew: one huge unsplittable file … repartition
    * immediately after the read"). Round-robin repartition keeps
    * Spark's sort-before-repartition retry determinism.
    *
    * Scale-adaptive, not a local constant: when the scan already has
    * at least the cluster's parallelism (any real multi-file corpus —
    * at 100 TB a scan has ~10⁵ splits), this is the identity and adds
    * NO exchange; the shuffle only fires when the input is a handful
    * of undersplittable files, where moving the few MB once is the
    * enabling cost of using the machine at all.
    */
  def fanOutSmallScan(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // toRdd, not .rdd: the partition count is the same, but .rdd plans
    // an extra deserializer projection per call just to be thrown away
    // (ADVICE r14) — this is driver-side planning cost only
    if (df.queryExecution.toRdd.getNumPartitions < target)
      df.repartition(target)
    else df
  }

  /** Shuffle width for the range exchange — the session conf already
    * parsed to Int (a raw `conf.get(...).toInt` would throw on
    * distros that set symbolic values like "auto").
    */
  private def shufflePartitions(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Inner join on `keys` with NULL-SAFE equality (`<=>`) — for the
    * scan queries' per-group BROADCAST count joins: they replace
    * windows whose PARTITION BY treats NULL as a real group, and a
    * plain equi-join would silently DROP every NULL-keyed row,
    * diverging from both the window semantics and the SQL oracles'
    * GROUP BY. Broadcast-side only: `<=>` plans its keys as
    * (coalesce, isnull) pairs, which breaks hash-partition alignment
    * — the scan primitives' own STITCH joins therefore use
    * struct-wrapped keys instead (struct equality is null-safe under
    * plain EqualTo and keeps the window's partitioning reusable).
    */
  private[operators] def joinKeysNullSafe(left: DataFrame,
      right: DataFrame, keys: Seq[String],
      broadcastRight: Boolean = false): DataFrame = {
    val renamed = keys.foldLeft(right)((acc, k) =>
      acc.withColumnRenamed(k, s"__r_$k"))
    val r = if (broadcastRight) broadcast(renamed) else renamed
    val cond = keys.map(k => col(k) <=> col(s"__r_$k")).reduce(_ && _)
    left.join(r, cond).drop(keys.map(k => s"__r_$k"): _*)
  }

  /** Appends one exact running-SUM column per `(value, outName)` pair,
    * computed over the total order `sortCols`. Values must be
    * non-null integral columns (the engine's exact-arithmetic
    * convention); pass `lit(1L) -> "rn"` to get the global rank.
    */
  def runningSums(df: DataFrame, sortCols: Seq[Column],
      sums: Seq[(Column, String)]): DataFrame =
    runningSums(df, Nil, sortCols, sums)

  /** Grouped form: exact running sums over `sortCols` WITHIN each
    * `groupCols` group — per-group windows without ever putting one
    * group's rows through one partition (the q195 hazard: Spark's
    * `Window.partitionBy(group)` materializes every group in a single
    * task, corpus-sized when groups are few and large). Range
    * partitioning on (group, order) keeps each group's rows
    * CONTIGUOUS across partitions, so the per-(group, pid) cell scans
    * stitch with a |groups|·|partitions|-row offset frame whose
    * cumsum windows are ≤ |partitions| rows per group.
    */
  def runningSums(df: DataFrame, groupCols: Seq[String],
      sortCols: Seq[Column], sums: Seq[(Column, String)]): DataFrame = {
    val p = shufflePartitions(df)
    val vals = sums.zipWithIndex.map { case ((v, _), i) => v.as(s"__v$i") }
    // Group keys materialize STRUCT-wrapped (__g*): struct equality
    // treats a null field as equal to itself, so the stitch join below
    // is null-safe under plain EqualTo — a NULL group is a real
    // partition, exactly as in the window form this scan replaces —
    // WITHOUT the (coalesce, isnull) key rewrite that `<=>` plans,
    // which would break the hash-partition ALIGNMENT between the cell
    // window and the join on the unbounded-groups shuffle fallback.
    val gKeys = groupCols.indices.map(i => s"__g$i")
    val gCols = groupCols.zip(gKeys).map { case (g, k) =>
      struct(col(g)).as(k)
    }
    val ranged = df
      .select(col("*") +: (gCols ++ vals): _*)
      .repartitionByRange(p, gKeys.map(col) ++ sortCols: _*)
      .withColumn("__pid", spark_partition_id().cast("long"))
      .localCheckpoint(false)
    val cellKeys = gKeys :+ "__pid"
    val wLocal = Window.partitionBy(cellKeys.map(col): _*)
      .orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = (if (gKeys.isEmpty) Window.partitionBy()
                else Window.partitionBy(gKeys.map(col): _*))
      .orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val totAggs = sums.indices.map(i => sum(col(s"__v$i")).as(s"__t$i"))
    val offCols = sums.indices.map(i =>
      coalesce(sum(col(s"__t$i")).over(wOff), lit(0L)).as(s"__o$i"))
    val offsets = ranged
      .groupBy(cellKeys.head, cellKeys.tail: _*)
      .agg(totAggs.head, totAggs.tail: _*)
      .select(cellKeys.map(col) ++ offCols: _*)
    val withRuns = sums.indices.foldLeft(ranged) { (acc, i) =>
      acc.withColumn(s"__r$i", sum(col(s"__v$i")).over(wLocal))
    }
    // no broadcast HINT on the offsets side: it is |groups|·|partitions|
    // rows — tiny for bounded groups (AQE broadcasts it at runtime from
    // its actual size), but a forced broadcast would OOM the driver
    // when groups are unbounded, where a shuffle join on the struct
    // (group, pid) keys reuses the cell window's hash partitioning.
    val out = sums.zipWithIndex.foldLeft(
      withRuns.join(offsets, cellKeys)) {
      case (acc, ((_, name), i)) =>
        acc.withColumn(name, col(s"__r$i") + col(s"__o$i"))
    }
    out.drop("__pid" +: (gKeys ++ sums.indices.flatMap(i =>
      Seq(s"__v$i", s"__t$i", s"__r$i", s"__o$i"))): _*)
  }

  /** Appends one exact LAG(1) column per `(value, outName)` pair over
    * the total order `sortCols` WITHIN each `groupCols` group —
    * group-first rows get null, exactly `lag(v, 1) over (partition by
    * group order by sortCols)`, but with NO per-group single-task
    * window (the q156 hazard: a handful of group values puts
    * corpus/|groups| rows through each window sort at scale).
    *
    * Same stitch pattern as [[runningSums]]'s offset frame, carrying a
    * boundary ROW instead of a partial sum:
    *
    *   1. range exchange on (group, order) — each group's rows are
    *      contiguous across partitions (empty partitions simply yield
    *      no cell and the pid-ordered carry skips over them);
    *   2. per-(group, pid) cell lags — every window task sorts one
    *      range partition, never a group;
    *   3. a |groups|·|partitions|-row TAIL frame (each cell's last
    *      value in the order, via max_by on the cell row number)
    *      whose pid-ordered per-group lag hands each cell's tail to
    *      the NEXT cell of the same group; cell-first rows take the
    *      carried value, everything else keeps its local lag.
    *
    * `sortCols` must be a total order (unique tiebreak) for the same
    * reason as the scan: per-partition sorts are tie-ambiguous.
    */
  def lagged(df: DataFrame, groupCols: Seq[String],
      sortCols: Seq[Column], lags: Seq[(Column, String)]): DataFrame = {
    val p = shufflePartitions(df)
    val vals = lags.zipWithIndex.map { case ((v, _), i) => v.as(s"__v$i") }
    // struct-wrapped group keys, same as runningSums: null-safe stitch
    // join under plain EqualTo, hash-partition alignment preserved
    val gKeys = groupCols.indices.map(i => s"__g$i")
    val gCols = groupCols.zip(gKeys).map { case (g, k) =>
      struct(col(g)).as(k)
    }
    val ranged = df
      .select(col("*") +: (gCols ++ vals): _*)
      .repartitionByRange(p, gKeys.map(col) ++ sortCols: _*)
      .withColumn("__pid", spark_partition_id().cast("long"))
      .localCheckpoint(false)
    val cellKeys = gKeys :+ "__pid"
    val wLocal = Window.partitionBy(cellKeys.map(col): _*)
      .orderBy(sortCols: _*)
    val withLag = lags.indices.foldLeft(
      ranged.withColumn("__rn", row_number().over(wLocal))) { (acc, i) =>
      acc.withColumn(s"__l$i", lag(col(s"__v$i"), 1).over(wLocal))
    }
    // tail frame: each cell's LAST value in the order (max_by on the
    // cell row number) — grouped on the window's own partitioning, so
    // the aggregate rides the same exchange
    val tailAggs = lags.indices.map(i =>
      max_by(col(s"__v$i"), col("__rn")).as(s"__t$i"))
    val wCarry = (if (gKeys.isEmpty) Window.partitionBy()
                  else Window.partitionBy(gKeys.map(col): _*))
      .orderBy("__pid")
    val carries = lags.indices.foldLeft(
      withLag.groupBy(cellKeys.head, cellKeys.tail: _*)
        .agg(tailAggs.head, tailAggs.tail: _*)) { (acc, i) =>
      acc.withColumn(s"__c$i", lag(col(s"__t$i"), 1).over(wCarry))
    }.select(cellKeys.map(col) ++ lags.indices.map(i => col(s"__c$i")): _*)
    // inner join on the struct cell key (null-safe: NULL groups are
    // real partitions): every populated cell has a tail row
    val out = lags.zipWithIndex.foldLeft(withLag.join(carries, cellKeys)) {
      case (acc, ((_, name), i)) =>
        acc.withColumn(name,
          when(col("__rn") === 1, col(s"__c$i")).otherwise(col(s"__l$i")))
    }
    out.drop("__pid" +: "__rn" +: (gKeys ++ lags.indices.flatMap(i =>
      Seq(s"__v$i", s"__l$i", s"__t$i", s"__c$i"))): _*)
  }
}
