package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Every query entry point receives a scale-factor directory and reads
  * the Parquet tables lazily; Catalyst handles column pruning and
  * predicate pushdown into the scans. At cluster scale the same
  * loaders would point at a partitioned table root instead of a single
  * file — nothing else changes.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  /** The driver's generator has written `ts` two ways across rounds,
    * so the loader normalizes BOTH to session-zoned TIMESTAMP:
    *  - Parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it;
    *    with `spark.sql.legacy.parquet.nanosAsLong` it surfaces as a
    *    LongType epoch-nanos column. The data carries only microsecond
    *    precision (verified: epoch_ns % 1000 == 0 for all rows), so
    *    `div 1000` → timestamp_micros is lossless. Integer division,
    *    not `/`, because epoch-nanos (~1.7e18) exceeds double's exact
    *    range.
    *  - Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): surfaces as
    *    TIMESTAMP_NTZ, which `unix_micros`/long casts reject. The
    *    session timezone is pinned to UTC (GraftSession), so the
    *    NTZ→LTZ cast is value-preserving on the stored micros and the
    *    DuckDB oracle (which reads the same file as a naive timestamp)
    *    keeps bit-exact parity.
    */
  def events: DataFrame = {
    val raw = t("events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
