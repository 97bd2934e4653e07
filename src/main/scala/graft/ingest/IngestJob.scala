package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{DocketFunctions => DF, DocketScala}

/** Per-run summary (the reference's JSON summary, ingest.py:768-773). */
final case class IngestSummary(runId: Long, read: Long, inserted: Long,
    updated: Long, failed: Long)

/** Every table delta one ingest run produces (SURVEY §1.1): the fact,
  * the four dims, the bridge, the three variation ledgers, the two run
  * ledgers, and the quarantine stream. All members are lazy plans;
  * `summary` and `runLedger` are additionally lazy EXECUTIONS — they
  * run the two counting jobs on first access, so a consumer that only
  * reads e.g. `cases` never pays for them.
  */
final class IngestResult(
    val cases: DataFrame,
    val courts: DataFrame,
    val judges: DataFrame,
    val caseTypes: DataFrame,
    val parties: DataFrame,
    val caseParties: DataFrame,
    val courtVariations: DataFrame,
    val judgeVariations: DataFrame,
    val partyVariations: DataFrame,
    val quarantine: DataFrame,
    val errors: DataFrame,
    runLedgerThunk: () => DataFrame,
    summaryThunk: () => IngestSummary) {
  lazy val summary: IngestSummary = summaryThunk()
  lazy val runLedger: DataFrame = runLedgerThunk()
}

/** The batch ingest pipeline: one declarative DataFrame DAG replacing
  * the reference's per-record loop (ingest.py:676-798). Validation
  * never throws — every check yields a nullable error column and the
  * batch splits on it (per-record error isolation, SURVEY §7.4).
  *
  * Scale design: the only required shuffles are the last-write-wins
  * window on `case_number` and the tiny dim/variation aggregations
  * (map-side combined). Dim resolution is hash-id assignment — a pure
  * projection, where the reference makes a per-record SQL round-trip.
  * At 100 TB nothing here is driver-side except the 4-number summary.
  *
  * Fidelity notes (each behavior cites the reference):
  *   - last duplicate case_number wins, in input order (ingest.py:
  *     703-708 + ON CONFLICT 618-626) — input order is the `_seq`
  *     column captured at read time;
  *   - a record failing at a LATE validation stage still contributes
  *     the dim/variation rows its earlier stages created (the
  *     reference commits partial work): court+judge rows survive
  *     case-type failures, case-type rows survive status failures;
  *   - per-record insert/update classification counts a record as
  *     `inserted` only if its case_number is new to both the prior
  *     snapshot and the earlier part of the batch (xmax=0 semantics,
  *     ingest.py:627);
  *   - title/docket_text are NOT trimmed (ingest.py:632-636);
  *   - party rows accumulate from every good record, including ones
  *     later overwritten by a duplicate case_number (DO NOTHING
  *     semantics on the bridge, ingest.py:662-669).
  *
  * Surrogate ids are domain-tagged xxhash64 of the natural key —
  * deterministic and merge-stable across runs (SURVEY §7.4.2), unlike
  * the reference's sequences (which no API response exposes).
  */
object IngestJob {

  /** Raw docket schema (data/raw_dockets.json: 9 nullable strings). */
  val rawSchema: StructType = StructType(Seq(
    "case_number", "court", "title", "filed_date", "parties",
    "case_type", "judge", "docket_text", "status"
  ).map(StructField(_, StringType, nullable = true)))

  private val rawFields = rawSchema.fieldNames.toSeq

  /** Read a JSON array file of raw dockets with an explicit schema and
    * a `_seq` input-position column (drives last-write-wins — SURVEY
    * §7.4.3). A multiLine JSON array is unsplittable, so the single
    * reference file arrives as ONE partition and `_seq` is exactly the
    * array index.
    */
  def readRaw(spark: SparkSession, path: String): DataFrame = {
    val base = spark.read.schema(rawSchema)
      .option("multiLine", true).json(path)
    withSeq(spark, base)
  }

  /** Attach `_seq` = stable input position to any raw frame.
    *
    * `monotonically_increasing_id` is (partitionIndex << 33) | offset:
    * it totally orders rows by (partition, position) WITHOUT leaving
    * Tungsten — no RDD conversion, no extra count job (the previous
    * `rdd.zipWithIndex` ran both, roughly doubling the ingest read at
    * scale). Every `_seq` consumer (min_by, last-write-wins windows)
    * needs only this relative order, never contiguous values.
    *
    * Order contract: correct whenever partition index order equals
    * input order — true for the unsplittable single-file multiLine
    * read above and for parallelized local data. For a multi-file
    * ingest whose file order must be honored, ingest per file with
    * increasing run ids (the reference processes one file per run,
    * ingest.py:676) rather than globbing files into one read.
    */
  def withSeq(spark: SparkSession, df: DataFrame): DataFrame =
    df.withColumn("_seq", monotonically_increasing_id())

  private def id(domain: String, key: org.apache.spark.sql.Column) =
    xxhash64(lit(domain), key)

  private val partiesUdf = udf((s: String) =>
    DocketScala.parseParties(s).map(p => (p.name, p.role)))

  private val hashUdf = udf((cn: String, co: String, ti: String, fd: String,
      pa: String, ct: String, ju: String, dt: String, st: String) =>
    DocketScala.sha256Hex(DocketScala.canonicalJson(Seq(
      "case_number" -> cn, "court" -> co, "title" -> ti, "filed_date" -> fd,
      "parties" -> pa, "case_type" -> ct, "judge" -> ju,
      "docket_text" -> dt, "status" -> st))))

  /** @param cacheIntermediate persist the annotated (validated) batch:
    *   right when several of the result's frames will each be acted on
    *   (e.g. the quality-report suite reads cases, errors, dims and the
    *   ledger from ONE run) — without it every frame re-runs the scan +
    *   validation expressions. Leave false for single-consumer runs.
    */
  def run(spark: SparkSession, raw: DataFrame, runId: Long,
      sourceName: String, sourceUri: String, ts: Timestamp,
      priorCaseNumbers: Option[DataFrame] = None,
      cacheIntermediate: Boolean = false): IngestResult = {
    import spark.implicits._

    val annotated0 = raw
      .withColumn("_error_code", DF.errorCode(col("case_number"),
        col("filed_date"), col("court"), col("case_type"), col("status")))
      .withColumn("_why", DF.errorWhy(col("case_number"),
        col("filed_date"), col("court"), col("case_type"), col("status")))
    val annotated = if (cacheIntermediate) annotated0.persist() else annotated0

    val bad = annotated.filter(col("_error_code").isNotNull)

    // stage-reached frames: which dim writes a record's failure still
    // allowed before it raised (process order ingest.py:593-609)
    val reachedCourt = annotated
      .filter(col("_error_code").isNull ||
        col("_error_code").isin("VALIDATION_ERROR", "STATUS_UNMAPPED"))
      .withColumn("_norm_court", DF.normCourt(col("court")))
      .withColumn("_norm_judge", DF.normJudge(col("judge")))
    val reachedCaseType = annotated
      .filter(col("_error_code").isNull || col("_error_code") === "STATUS_UNMAPPED")
      .withColumn("_case_type", DF.caseTypeNorm(col("case_type")))

    val good = annotated.filter(col("_error_code").isNull)
      .withColumn("_cn", trim(col("case_number")))
      .withColumn("_filed", DF.parseFiledDate(col("filed_date")))
      .withColumn("_norm_court", DF.normCourt(col("court")))
      .withColumn("_norm_judge", DF.normJudge(col("judge")))
      .withColumn("_case_type", DF.caseTypeNorm(col("case_type")))
      .withColumn("_status", DF.statusNorm(col("status")))

    // ------------------------------------------------------------ dims
    val courts = reachedCourt
      .groupBy(col("_norm_court").as("normalized_name"))
      .agg(min_by(col("court"), col("_seq")).as("name"))
      .select(id("court", col("normalized_name")).as("id"),
        col("name"), col("normalized_name"))

    val judges = reachedCourt
      .filter(length(col("_norm_judge")) > 0)
      .groupBy(col("_norm_judge").as("normalized_name"))
      .agg(min_by(col("judge"), col("_seq")).as("full_name"))
      .select(id("judge", col("normalized_name")).as("id"),
        col("full_name"), col("normalized_name"))

    val caseTypes = reachedCaseType
      .groupBy(col("_case_type").as("name"))
      .agg(count(lit(1)).as("_n")).drop("_n")
      .select(id("case_type", col("name")).as("id"), col("name"))

    // ------------------------------------------------- parties (F5 explode)
    val partyOcc = good
      .select(col("_seq"), col("_cn"),
        posexplode_outer(partiesUdf(col("parties"))).as(Seq("_pos", "_p")))
      .filter(col("_p").isNotNull)
      .select(col("_seq"), col("_pos"), col("_cn"),
        col("_p._1").as("raw_name"), col("_p._2").as("role"))
      .withColumn("_norm", DF.normParty(col("raw_name")))

    val parties = partyOcc
      .groupBy(col("_norm").as("normalized_name"))
      .agg(min_by(col("raw_name"), struct(col("_seq"), col("_pos"))).as("name"))
      .select(id("party", col("normalized_name")).as("id"),
        col("name"), col("normalized_name"))

    val caseParties = partyOcc
      .select(id("case", col("_cn")).as("case_id"),
        id("party", col("_norm")).as("party_id"), col("role"))
      .dropDuplicates("case_id", "party_id", "role")

    // ------------------------------------------------------- variations
    def variations(src: DataFrame, normCol: String, rawCol: String,
        domain: String, entityIdCol: String): DataFrame =
      src.groupBy(col(normCol).as("_norm"), col(rawCol).as("raw_name"))
        .agg(count(lit(1)).as("seen_count"))
        .select(id(domain, col("_norm")).as(entityIdCol), col("raw_name"),
          col("seen_count"), lit(ts).as("first_seen_at"), lit(ts).as("last_seen_at"))

    val courtVariations =
      variations(reachedCourt, "_norm_court", "court", "court", "court_id")
    val judgeVariations =
      variations(reachedCourt.filter(length(col("_norm_judge")) > 0),
        "_norm_judge", "judge", "judge", "judge_id")
    val partyVariations =
      variations(partyOcc, "_norm", "raw_name", "party", "party_id")

    // ------------------------------------------------------------ cases
    val priorKeys = priorCaseNumbers
      .getOrElse(spark.emptyDataset[String].toDF("case_number"))
      .select(col("case_number").as("_prior_cn")).distinct()

    val wLast = Window.partitionBy(col("_cn")).orderBy(col("_seq").desc)
    val wFirst = Window.partitionBy(col("_cn")).orderBy(col("_seq").asc)

    val classified = good
      .withColumn("_rn_last", row_number().over(wLast))
      .withColumn("_rn_first", row_number().over(wFirst))
      .join(priorKeys, col("_cn") === col("_prior_cn"), "left")
      .withColumn("_action",
        when(col("_prior_cn").isNull && col("_rn_first") === 1, lit("inserted"))
          .otherwise(lit("updated")))

    val cases = classified
      .filter(col("_rn_last") === 1)
      .select(
        id("case", col("_cn")).as("id"),
        col("_cn").as("case_number"),
        id("court", DF.normCourt(col("court"))).as("court_id"),
        col("title"),
        col("_filed").as("filed_date"),
        id("case_type", col("_case_type")).as("case_type_id"),
        when(length(col("_norm_judge")) > 0, id("judge", col("_norm_judge")))
          .otherwise(lit(null).cast("long")).as("judge_id"),
        col("docket_text"),
        col("_status").as("status"),
        lit(ts).as("created_at"),
        lit(ts).as("updated_at"),
        // materialized partition column: the snapshot lays out by
        // filing year so P6/P8 year and date-range filters prune whole
        // directories (stands in for the reference's filed_date index)
        year(col("_filed")).as("filed_year"))

    // ------------------------------------------------------ quarantine
    val rawStruct = struct(rawFields.map(col): _*).as("raw")
    val recordHash = hashUdf(rawFields.map(col): _*)
    val tsIso = date_format(lit(ts), "yyyy-MM-dd'T'HH:mm:ss'Z'")

    val quarantine = bad.select(
      lit(runId).as("run_id"),
      col("_error_code").as("error_code"),
      col("_why").as("why"),
      rawStruct,
      tsIso.as("ts"),
      recordHash.as("record_hash"))

    // --------------------------------------------------- error ledger
    val errors = bad
      .withColumn("record_hash", recordHash)
      .groupBy(col("record_hash"))
      .agg(
        min_by(col("_error_code"), col("_seq")).as("error_code"),
        min_by(col("_why"), col("_seq")).as("error_message"),
        min_by(when(trim(coalesce(col("case_number"), lit(""))) =!= "",
          trim(col("case_number"))), col("_seq")).as("case_number"),
        min_by(struct(rawFields.map(col): _*), col("_seq")).as("_raw"),
        (count(lit(1)) - 1).as("retry_count"))
      .select(
        lit(runId).as("run_id"),
        col("record_hash"), col("case_number"), col("error_code"),
        col("error_message"),
        // full reference envelope (ingest.py:218-224): normalized_attempt
        // and context are always empty in the reference's call sites
        struct(col("_raw").as("raw"),
          map().cast("map<string,string>").as("normalized_attempt"),
          map().cast("map<string,string>").as("context"),
          col("error_message").as("why"),
          lit("").as("suggestion")).as("details"),
        col("retry_count"),
        lit(ts).as("first_seen_at"), lit(ts).as("last_seen_at"),
        lit(false).as("resolved"))

    // ----------------------------------------------------- run ledger
    lazy val summary: IngestSummary = {
      val counts = annotated.agg(
        count(lit(1)).as("read"),
        count(when(col("_error_code").isNotNull, 1)).as("failed"))
        .collect()(0)
      val actions = classified.groupBy(col("_action")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      IngestSummary(runId, counts.getAs[Long]("read"),
        actions.getOrElse("inserted", 0L), actions.getOrElse("updated", 0L),
        counts.getAs[Long]("failed"))
    }

    def runLedger: DataFrame =
      Seq((runId, sourceName, sourceUri, ts, ts,
        summary.read, summary.inserted, summary.updated, summary.failed))
        .toDF("run_id", "source_name", "source_uri", "started_at",
          "finished_at", "total_read", "total_inserted", "total_updated",
          "total_failed")

    new IngestResult(cases, courts, judges, caseTypes, parties, caseParties,
      courtVariations, judgeVariations, partyVariations, quarantine,
      errors, () => runLedger, () => summary)
  }
}
