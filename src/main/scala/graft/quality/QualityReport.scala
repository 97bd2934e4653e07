package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The data-quality report (reference data_quality.py): eight analytic
  * sections over the ingest outputs, a text renderer, and the
  * CI-able threshold gates (exit 1 if failed% > 5 or any
  * missing-entity% > 10, data_quality.py:463-481).
  *
  * Every section is one aggregation job over tiny-or-aggregated
  * inputs; results are collected driver-side only for rendering
  * (the aggregates are a handful of rows by construction).
  */
object QualityReport {

  /** G1 (data_quality.py:62-93): volume summary, one run or all. */
  def volumeSummary(runs: DataFrame, runId: Option[Long]): DataFrame = {
    val scoped = runId.map(id => runs.filter(col("run_id") === id)).getOrElse(runs)
    scoped.agg(
      sum("total_read").as("total_records"),
      sum("total_inserted").as("inserted"),
      sum("total_updated").as("updated"),
      sum("total_failed").as("failed"))
      .withColumn("warnings", lit(0L))
  }

  /** G2 (data_quality.py:96-135): top-10 error codes, scopable by run
    * or by run start date (the `since` variant is the J7 errors⋈runs
    * inner join, data_quality.py:113-123).
    */
  def errorBreakdown(errors: DataFrame, runId: Option[Long],
      since: Option[String] = None, runs: Option[DataFrame] = None): DataFrame = {
    val scoped = (runId, since, runs) match {
      case (Some(id), _, _) => errors.filter(col("run_id") === id)
      case (None, Some(s), Some(r)) =>
        errors.join(r.filter(col("started_at") >= to_date(lit(s)))
          .select("run_id"), Seq("run_id"))
      case _ => errors
    }
    scoped.groupBy("error_code")
      .agg(count(lit(1)).as("cnt"), max("last_seen_at").as("most_recent"))
      .orderBy(desc("cnt"), asc("error_code"))
      .limit(10)
  }

  /** G3 (data_quality.py:138-165): five conditional counts, one pass. */
  def completeness(cases: DataFrame, since: Option[String]): DataFrame = {
    val scoped = since.map(s => cases.filter(col("filed_date") >= to_date(lit(s))))
      .getOrElse(cases)
    scoped.agg(
      count(lit(1)).as("total"),
      count(when(col("judge_id").isNull, 1)).as("no_judge"),
      count(when(col("court_id").isNull, 1)).as("no_court"),
      count(when(col("case_type_id").isNull, 1)).as("no_case_type"),
      count(when(coalesce(nullif(col("docket_text"), lit("")), lit(null)).isNull, 1))
        .as("no_docket"))
  }

  /** G4 (data_quality.py:168-216): filed_date min/max + bad-date count.
    * The reference's `LIKE 'filed_date parse failed%'` predicate is
    * structurally dead (ingest writes `BAD_DATE` as the code and puts
    * that text in error_message — SURVEY P12); we replicate the shape
    * but key on the code that actually occurs.
    */
  def dateSanity(cases: DataFrame, errors: DataFrame,
      runId: Option[Long]): DataFrame = {
    val scopedErr = runId.map(id => errors.filter(col("run_id") === id)).getOrElse(errors)
    val dates = cases.agg(min("filed_date").as("min_date"), max("filed_date").as("max_date"))
    val bad = scopedErr.filter(col("error_code") === "BAD_DATE")
      .agg(count(lit(1)).as("bad_dates"))
    dates.crossJoin(bad)
  }

  /** G6 (data_quality.py:219-245): normalization sanity per dim. */
  def entityNormalization(judges: DataFrame, courts: DataFrame): DataFrame = {
    val j = judges.agg(
      countDistinct("full_name").as("distinct_names"),
      countDistinct("normalized_name").as("distinct_normalized"),
      count(lit(1)).as("total")).withColumn("entity", lit("judges"))
    val c = courts.agg(
      countDistinct("name").as("distinct_names"),
      countDistinct("normalized_name").as("distinct_normalized"),
      count(lit(1)).as("total")).withColumn("entity", lit("courts"))
    j.unionByName(c).select("entity", "distinct_names", "distinct_normalized", "total")
  }

  /** G5 (data_quality.py:248-283): per-case plaintiff/defendant
    * coverage via boolean-OR rollup then count-filter.
    */
  def partiesCoverage(caseParties: DataFrame, cases: DataFrame): DataFrame = {
    val perCase = caseParties
      .join(cases.select(col("id").as("case_id"), col("case_number")), Seq("case_id"))
      .groupBy("case_number")
      .agg(
        max(when(col("role") === "plaintiff", true).otherwise(false)).as("has_plaintiff"),
        max(when(col("role") === "defendant", true).otherwise(false)).as("has_defendant"))
    perCase.agg(
      count(lit(1)).as("cases_with_parties"),
      count(when(col("has_plaintiff"), 1)).as("cases_with_plaintiff"),
      count(when(col("has_defendant"), 1)).as("cases_with_defendant"))
  }

  /** G7 (data_quality.py:287-294): top-10 role histogram. */
  def roleHistogram(caseParties: DataFrame): DataFrame =
    caseParties.groupBy("role")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("role"))
      .limit(10)

  /** G8 (data_quality.py:304-317): daily rollup of the last 7 days.
    * `asOf` defaults to the reference's CURRENT_DATE; injectable so the
    * window is testable/oracle-able deterministically.
    */
  def recentDaily(runs: DataFrame,
      asOf: org.apache.spark.sql.Column = current_date()): DataFrame =
    runs.filter(col("started_at") >= date_sub(asOf, 7))
      .groupBy(to_date(col("started_at")).as("day"))
      .agg(sum("total_read").as("ingested"), sum("total_failed").as("failed"))
      .orderBy(desc("day"))

  /** ASCII bar (data_quality.py:320-325). */
  def asciiBar(value: Long, maxValue: Long, width: Int = 40): String = {
    val filled = if (maxValue <= 0) 0
      else math.min(width, math.round(value.toDouble / maxValue * width).toInt)
    "█" * filled + "░" * (width - filled)
  }

  /** Threshold gates (data_quality.py:463-481): 1 = fail. */
  def exitCode(totalRecords: Long, failed: Long, casesTotal: Long,
      noJudge: Long, noCourt: Long, noCaseType: Long): Int = {
    val failedPct = if (totalRecords > 0) failed.toDouble / totalRecords * 100 else 0.0
    def pct(n: Long) = if (casesTotal > 0) n.toDouble / casesTotal * 100 else 0.0
    val bad = failedPct > 5.0 ||
      pct(noJudge) > 10.0 || pct(noCourt) > 10.0 || pct(noCaseType) > 10.0
    if (bad) 1 else 0
  }

  /** Render the full report text (shape of data_quality.py:328-462). */
  def render(volume: DataFrame, errorsTop: DataFrame, complete: DataFrame,
      dates: DataFrame, normalization: DataFrame, coverage: DataFrame,
      roles: DataFrame, daily: DataFrame): String = {
    val sb = new StringBuilder
    def sep(): Unit = { sb.append("=" * 60).append('\n') }
    def fmt(n: Any): String = n match {
      case l: java.lang.Long => f"${l.longValue()}%,d"
      case other => String.valueOf(other)
    }
    sep(); sb.append("DATA QUALITY REPORT\n"); sep()
    val v = volume.collect()(0)
    sb.append(s"Total records: ${fmt(v.get(0))}\n")
    sb.append(s"Inserted: ${fmt(v.get(1))}  Updated: ${fmt(v.get(2))}  Failed: ${fmt(v.get(3))}\n")
    sb.append("\nTOP ERROR CODES\n")
    val errRows = errorsTop.collect()
    val maxCnt = errRows.map(_.getAs[Long]("cnt")).foldLeft(0L)(math.max)
    errRows.foreach { r =>
      sb.append(f"  ${r.getAs[String]("error_code")}%-22s ${r.getAs[Long]("cnt")}%6d ${asciiBar(r.getAs[Long]("cnt"), maxCnt)}\n")
    }
    sb.append("\nCOMPLETENESS\n")
    val c = complete.collect()(0)
    Seq("total", "no_judge", "no_court", "no_case_type", "no_docket")
      .zipWithIndex.foreach { case (n, i) => sb.append(s"  $n: ${fmt(c.get(i))}\n") }
    sb.append("\nDATE SANITY\n")
    val d = dates.collect()(0)
    sb.append(s"  min: ${d.get(0)}  max: ${d.get(1)}  bad_dates: ${fmt(d.get(2))}\n")
    sb.append("\nENTITY NORMALIZATION\n")
    normalization.collect().foreach { r =>
      sb.append(s"  ${r.getAs[String]("entity")}: names=${r.get(1)} normalized=${r.get(2)} total=${r.get(3)}\n")
    }
    sb.append("\nPARTIES COVERAGE\n")
    val pc = coverage.collect()(0)
    sb.append(s"  with_parties=${pc.get(0)} with_plaintiff=${pc.get(1)} with_defendant=${pc.get(2)}\n")
    sb.append("\nROLES\n")
    roles.collect().foreach(r => sb.append(s"  ${r.get(0)}: ${fmt(r.get(1))}\n"))
    sb.append("\nLAST 7 DAYS\n")
    daily.collect().foreach(r => sb.append(s"  ${r.get(0)}: ingested=${fmt(r.get(1))} failed=${fmt(r.get(2))}\n"))
    sep()
    sb.toString
  }
}
