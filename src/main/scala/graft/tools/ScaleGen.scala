package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Deterministic scratch-data generator for the scale-decade stress
  * harness (SCALING.md): the same table shapes as the driver's
  * TESTDATA.md corpus, extrapolated one decade past its sf0.1 cap so
  * the quadratic-risk operators can be measured at sf0.1 AND sf1 from
  * the SAME generator (any distributional quirk cancels out of the
  * scaling exponent). Never writes to the read-only /root/testdata.
  *
  * Extrapolation follows how the driver itself scales sf0.01 → sf0.1
  * (10× docs, 10× events, 10× users, a FIXED 30-day window), with two
  * deliberate departures, both documented in SCALING.md:
  *
  *  - Vocabulary grows by Heaps' law (V ∝ tokens^0.5, Zipf-distributed
  *    tail) instead of staying a fixed 31 words. A fixed tiny
  *    vocabulary makes EVERY similarity-join posting list dense, so
  *    candidate generation is intrinsically quadratic regardless of
  *    algorithm — real corpora are exactly what the prefix/band
  *    filters exploit. 5% of documents are constructed near-dups
  *    (every 7th word dropped from a neighbor) so dedup candidate
  *    counts track a realistic, linearly-growing duplicate density.
  *  - `--wide` generates the events table with the driver's user
  *    DENSITY (1,500 users per 30 days) and a window that grows with
  *    sf instead — the "more history" growth axis, against which
  *    interval-join work should scale LINEARLY; the default "dense"
  *    axis (fixed window, 10× users) grows concurrency itself, where
  *    pair OUTPUT is quadratic by definition.
  *
  * Every value is a pure hash of (row id, column salt) — re-running
  * regenerates byte-identical tables on any cluster layout.
  */
object ScaleGen {

  private val baseVocab = Seq("a", "agg", "batch", "big", "column",
    "customer", "data", "dup", "fast", "filter", "group", "hash", "join",
    "key", "line", "merge", "order", "part", "query", "row", "scan",
    "slow", "small", "sort", "spark", "stream", "table", "the", "value",
    "vector", "window")

  private def u01(seed: Column, salt: Int): Column =
    pmod(xxhash64(seed, lit(salt)), lit(1000000000L)).cast("double") / 1e9

  def writeDocuments(spark: SparkSession, dir: String, sf: Double): Unit = {
    val nDocs = (50000 * sf).toLong
    // Heaps' law: tail vocabulary ∝ sqrt(corpus tokens); ranks drawn
    // log-uniformly ≈ Zipf(s=1) frequencies
    val vTail = math.max(200L, (2000 * math.sqrt(10 * sf)).toLong)
    val df = spark.range(nDocs)
      // every 20th doc is a near-dup of its neighbor: same word
      // stream, every 7th word dropped
      .withColumn("dup", col("id") % 20 === 19)
      .withColumn("seed", when(col("dup"), col("id") - 1).otherwise(col("id")))
      .withColumn("n_words", (lit(10) + pmod(xxhash64(col("seed"), lit(2)), lit(91))).cast("int"))
      .withColumn("words", transform(
        sequence(lit(1), col("n_words")),
        j => {
          val h = xxhash64(col("seed"), j, lit(3))
          when(pmod(h, lit(2)) === 0,
            element_at(typedlit(baseVocab),
              (pmod(shiftright(h, 1), lit(31)) + 1).cast("int")))
            .otherwise(concat(lit("w"),
              floor(pow(lit(vTail.toDouble), u01(h, 4))).cast("long")))
        }))
      .withColumn("words", when(col("dup"),
        filter(col("words"), (_, i) => i % 10 =!= 0)).otherwise(col("words")))
      .withColumn("text", array_join(col("words"), " "))
      .withColumn("lang", {
        val u = pmod(xxhash64(col("id"), lit(5)), lit(100))
        when(u < 42, "en").when(u < 57, "zh").when(u < 71, "es")
          .when(u < 85, "de").otherwise("fr")
      })
      .select(col("id").as("doc_id"), col("text"), col("lang"),
        concat(lit("src"), pmod(xxhash64(col("id"), lit(6)), lit(20))).as("source"),
        length(col("text")).cast("long").as("n_chars"))
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  def writeEvents(spark: SparkSession, dir: String, sf: Double,
      wide: Boolean, skew: Boolean = false): Unit = {
    val nEvents = (1000000 * sf).toLong
    // dense axis: driver-style fixed 30-day window, users ∝ sf;
    // wide axis: driver-style user density, window ∝ sf
    val nUsers = if (wide) 1500L else math.max(150L, (15000 * sf).toLong)
    val windowUs = if (wide) (30L * 86400000000L * (sf / 0.1).toLong).max(30L * 86400000000L)
      else 30L * 86400000000L
    val startUs = 1704067200000000L // 2024-01-01T00:00:00Z
    val types = Seq("click", "error", "purchase", "signup", "view")
    // --skew: a FLASH CROWD — 5% of events collapse into one
    // 10-minute window mid-corpus (≈3 events per user at sf1), so one
    // grid cell holds a session per user: tens of thousands of
    // concurrent sessions whose pair space is a single join key — the
    // straggler case the interval join's density-conditional salting
    // exists for; uniform timestamps cannot produce it
    val burst: Column =
      if (skew) pmod(xxhash64(col("id"), lit(17)), lit(100)) < 5
      else lit(false)
    val burstStartUs = startUs + 15L * 86400000000L
    val df = spark.range(nEvents)
      .select(col("id").as("event_id"),
        timestamp_micros(when(burst,
          lit(burstStartUs) + floor(u01(col("id"), 11) * 600000000L).cast("long"))
          .otherwise(lit(startUs) +
            floor(u01(col("id"), 11) * windowUs).cast("long"))).as("ts"),
        pmod(xxhash64(col("id"), lit(12)), lit(nUsers)).as("user_id"),
        element_at(typedlit(types),
          (pmod(xxhash64(col("id"), lit(13)), lit(5)) + 1).cast("int")).as("event_type"),
        round(-lit(50.0) * log(lit(1.0) - u01(col("id"), 14) + lit(1e-12)), 2).as("value"),
        concat(lit("{\"k\": "), pmod(xxhash64(col("id"), lit(15)), lit(100)),
          lit("}")).as("props"))
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  /** Unit-norm 64-dim vectors in 10 hash-derived clusters (the driver
    * corpus's shape: balanced labels, cluster structure for ANN recall
    * to find, unit norm so dot = cosine).
    */
  def writeEmbeddings(spark: SparkSession, dir: String, sf: Double): Unit = {
    val nVecs = (20000 * sf).toLong
    val dim = 64
    def noisy(label: Column, id: Column) = transform(
      sequence(lit(0), lit(dim - 1)),
      d => (u01(xxhash64(label, d, lit(21)), 22) - 0.5) +
        (u01(xxhash64(id, d, lit(23)), 24) - 0.5) * lit(0.8))
    val df = spark.range(nVecs)
      .withColumn("label", pmod(xxhash64(col("id"), lit(20)), lit(10)).cast("int"))
      .withColumn("raw", noisy(col("label"), col("id")))
      .withColumn("norm", sqrt(aggregate(col("raw"), lit(0.0d),
        (acc, x) => acc + x * x)))
      .select(col("id").as("vec_id"),
        transform(col("raw"), x => (x / col("norm")).cast("float")).as("embedding"),
        col("label"))
    df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  /** args: <outDir> <sf> [--wide] [--skew] [--vecs]
    * `--vecs` writes ONLY the embeddings table — embedding corpora
    * outgrow their document corpora (one vector per chunk), so the
    * ANN decade is measured on vector counts 100× the driver ratio.
    */
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val sf = args(1).toDouble
    val wide = args.contains("--wide")
    val skew = args.contains("--skew")
    val spark = GraftSession.get()
    if (args.contains("--vecs")) writeEmbeddings(spark, dir, sf)
    else {
      writeDocuments(spark, dir, sf)
      writeEvents(spark, dir, sf, wide, skew)
      writeEmbeddings(spark, dir, sf)
    }
    println(s"""{"generated": "$dir", "sf": $sf, "wide": $wide, "skew": $skew}""")
  }
}
