package graft

import org.apache.spark.sql.SparkSession

/** One place for every performance/correctness-relevant session config
  * so Verify, Bench, and the test suites all run the same engine.
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      // Shuffle width sized to the local core count; on a real cluster
      // this would be executors*cores (AQE coalesces the excess anyway).
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // hive-bucketed snapshot tables routinely exceed 32 partition
      // dirs, and past this threshold Spark turns every file listing
      // into its own one-task-per-dir JOB — a 1024-bucket table paid a
      // ~1024-task listing job per read (measured: ~8k tasks per CDC
      // follow step, all listing). Local/driver listing of a few
      // thousand dirs is milliseconds; on a real cluster object-store
      // listing would be tuned per deployment
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
      // Native graft expressions (codegen'd dot product for the ANN
      // hot paths) — see graft.plans.GraftExtensions.
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // The driver's events.parquet uses TIMESTAMP(NANOS); read as long
      // epoch-nanos and convert in Tables.events (lossless — data is µs).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Round-6 regen flipped the testdata timestamps to
      // TIMESTAMP(MICROS, isAdjustedToUTC=false); without this they
      // surface as TIMESTAMP_NTZ and every unix_micros/long-cast/LTZ
      // comparison breaks. Read them as session-zoned TIMESTAMP (the
      // pre-3.4 behavior) — value-identical under the pinned UTC tz,
      // and exactly how the DuckDB oracle sees the same bytes.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // Parse cascades (SURVEY F4) rely on null-on-failure, not throw.
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")

  /** SPARK_GRAFT_MASTER overrides the builder's master — the round
    * gate uses it to replay Verify (and the test suite, via TestSpark)
    * under local-cluster[w,c,mem]: real executor JVM boundaries surface
    * serialization, broadcast-identity, and shared-mutable-state bugs
    * that local[32]'s single heap structurally cannot. local-cluster
    * forks executor processes (via SPARK_HOME), so they get the
    * driver's FULL classpath (compiled graft classes, and under sbt
    * test also the test classes + scalatest jars that test closures
    * reference).
    */
  def withMasterOverride(b: SparkSession.Builder): SparkSession.Builder =
    sys.env.get("SPARK_GRAFT_MASTER") match {
      case Some(m) =>
        b.master(m)
          .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      case None => b
    }

  def get(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = withMasterOverride(builder(cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
