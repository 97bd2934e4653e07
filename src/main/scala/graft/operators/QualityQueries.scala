package graft.operators

import java.sql.Timestamp

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ingest.{IngestJob, IngestResult}
import graft.quality.QualityReport

/** The eight data-quality report sections (reference data_quality.py:
  * 62-317) as directly oracle-gated queries: the synthesized messy
  * batch (PipelineQueries.synthesizeRaw) runs through the full
  * IngestJob DAG, each report section aggregates the resulting
  * snapshot/ledger tables, and a DuckDB twin re-derives the same
  * numbers from first principles over `documents`. Unlike the q1-q7
  * shape-twins, these gate the REPORTS OVER THE INGEST OUTPUTS —
  * a regression anywhere in ingest → store → report flips a hash.
  *
  * q61 volume         ← data_quality.py:62-93   (G1, ingest_runs)
  * q62 error codes    ← data_quality.py:96-135  (G2, ingest_errors)
  * q63 completeness   ← data_quality.py:138-165 (G3, cases)
  * q64 date sanity    ← data_quality.py:168-216 (G4, cases+errors)
  * q65 normalization  ← data_quality.py:219-245 (G6, judges/courts)
  * q66 party coverage ← data_quality.py:248-283 (G5, case_parties)
  * q67 role histogram ← data_quality.py:287-294 (G7, case_parties)
  * q68 7-day rollup   ← data_quality.py:304-317 (G8, ingest_runs)
  */
object QualityQueries {

  private val ts1 = Timestamp.valueOf("2026-01-01 00:00:00")

  /** One ingest per scale dir, memoized: Verify/Bench invoke each of
    * the 8 report queries separately in one JVM, and re-running the
    * ingest DAG per section would 8× the cost for identical inputs.
    * The frames each section consumes are persisted on first build
    * (they are dim/ledger sized, tiny relative to the corpus).
    */
  private val cache = TrieMap.empty[String, IngestResult]

  private def ingested(spark: SparkSession, dir: String): IngestResult =
    cache.getOrElseUpdate(dir, {
      val r = IngestJob.run(spark, PipelineQueries.synthesizeRaw(Tables(spark, dir)),
        runId = 1, sourceName = "synthesized", sourceUri = dir, ts = ts1,
        cacheIntermediate = true)
      Seq(r.cases, r.errors, r.judges, r.courts, r.caseParties)
        .foreach(_.persist())
      r
    })

  // ------------------------------------------------------ Spark side

  def q61Volume(spark: SparkSession, dir: String): DataFrame =
    QualityReport.volumeSummary(ingested(spark, dir).runLedger, runId = None)

  def q62Errors(spark: SparkSession, dir: String): DataFrame =
    QualityReport.errorBreakdown(ingested(spark, dir).errors, runId = None)

  def q63Completeness(spark: SparkSession, dir: String): DataFrame =
    QualityReport.completeness(ingested(spark, dir).cases, since = None)

  def q64DateSanity(spark: SparkSession, dir: String): DataFrame = {
    val r = ingested(spark, dir)
    QualityReport.dateSanity(r.cases, r.errors, runId = None)
  }

  def q65Normalization(spark: SparkSession, dir: String): DataFrame = {
    val r = ingested(spark, dir)
    QualityReport.entityNormalization(r.judges, r.courts).orderBy("entity")
  }

  def q66PartiesCoverage(spark: SparkSession, dir: String): DataFrame = {
    val r = ingested(spark, dir)
    QualityReport.partiesCoverage(r.caseParties, r.cases)
  }

  def q67Roles(spark: SparkSession, dir: String): DataFrame =
    QualityReport.roleHistogram(ingested(spark, dir).caseParties)

  /** Two runs on different days; the 7-day window anchored at the
    * second run's day must include it and exclude the first (8 days
    * earlier) — the deterministic twin of CURRENT_DATE - 7.
    */
  def q68RecentDaily(spark: SparkSession, dir: String): DataFrame = {
    val raw = PipelineQueries.synthesizeRaw(Tables(spark, dir))
    val r1 = IngestJob.run(spark, raw.filter(col("_seq") % 2 === 0),
      runId = 11, sourceName = "day1", sourceUri = dir, ts = ts1,
      cacheIntermediate = true)
    val r2 = IngestJob.run(spark, raw.filter(col("_seq") % 2 =!= 0),
      runId = 12, sourceName = "day9", sourceUri = dir,
      ts = Timestamp.valueOf("2026-01-09 00:00:00"),
      cacheIntermediate = true)
    QualityReport.recentDaily(r1.runLedger.unionByName(r2.runLedger),
      asOf = to_date(lit("2026-01-09")))
  }

  // ----------------------------------------------------- oracle SQL

  // DuckDB fragments replicating the generator + the docket functions
  // (same building blocks as q50-q53/q60's oracles)
  private val errSql: String =
    s"""CASE WHEN trim(case_number) = '' THEN 'MISSING_CASE_NUMBER'
       |     WHEN ${IngestQueries.dateCascadeSql("filed_date")} IS NULL THEN 'BAD_DATE'
       |     WHEN trim(court) = '' THEN 'FK_COURT'
       |     WHEN lower(trim(case_type)) = '' THEN 'VALIDATION_ERROR'
       |     WHEN lower(status) NOT IN ('active','closed','pending','dismissed') THEN 'STATUS_UNMAPPED'
       |     ELSE NULL END""".stripMargin

  private val normCourtSql = "regexp_replace(upper(court), '[.\\s]+', '', 'g')"
  private val normJudgeSql =
    "lower(trim(regexp_replace(regexp_replace(judge, '(?i)^(hon\\.?|judge|justice)\\s+', ''), '\\s+', ' ', 'g')))"

  /** The synthesized batch (MUST mirror PipelineQueries.synthesizeRaw)
    * with the error classification attached.
    */
  private val annSql: String =
    s"""raw AS (
       |  SELECT
       |    CASE WHEN doc_id % 29 = 0 THEN '' ELSE 'D-' || (doc_id % 300)::VARCHAR END AS case_number,
       |    CASE WHEN doc_id % 23 = 0 THEN '' ELSE 'Dist. Court of ' || upper(lang) END AS court,
       |    CASE WHEN doc_id % 17 = 0 THEN '13-40-2024'
       |         WHEN doc_id % 3 = 0 THEN strftime(DATE '2020-01-01' + ((doc_id % 900)::INT), '%Y-%m-%d')
       |         WHEN doc_id % 3 = 1 THEN strftime(DATE '2020-01-01' + ((doc_id % 900)::INT), '%-m/%-d/%Y')
       |         ELSE strftime(DATE '2020-01-01' + ((doc_id % 900)::INT), '%b %-d, %Y') END AS filed_date,
       |    CASE WHEN doc_id % 11 = 0 THEN '' ELSE 'Civil' END AS case_type,
       |    CASE WHEN doc_id % 5 = 0 THEN '' ELSE 'Hon. Judge ' || lang END AS judge,
       |    text AS docket_text,
       |    CASE WHEN doc_id % 13 = 0 THEN 'archived' ELSE 'Active' END AS status,
       |    source, lang, doc_id AS _seq
       |  FROM documents),
       |ann AS (SELECT *, ($errSql) AS err FROM raw),
       |good AS (SELECT * FROM ann WHERE err IS NULL)""".stripMargin

  private val q61Sql: String =
    s"""WITH $annSql
       |SELECT
       |  (SELECT count(*) FROM ann)::BIGINT AS total_records,
       |  (SELECT count(DISTINCT trim(case_number)) FROM good)::BIGINT AS inserted,
       |  (SELECT count(*) - count(DISTINCT trim(case_number)) FROM good)::BIGINT AS updated,
       |  (SELECT count(*) FROM ann WHERE err IS NOT NULL)::BIGINT AS failed,
       |  0::BIGINT AS warnings""".stripMargin

  // every bad row is hash-unique (title embeds doc_id), so the
  // retry-dedup ledger has one row per bad record
  private val q62Sql: String =
    s"""WITH $annSql
       |SELECT err AS error_code, count(*)::BIGINT AS cnt,
       |  TIMESTAMP '2026-01-01 00:00:00' AS most_recent
       |FROM ann WHERE err IS NOT NULL
       |GROUP BY err ORDER BY cnt DESC, error_code LIMIT 10""".stripMargin

  private def lastWinsSql: String =
    s"""lw AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY trim(case_number) ORDER BY _seq DESC) AS rn
       |  FROM good),
       |cs AS (SELECT * FROM lw WHERE rn = 1)""".stripMargin

  private val q63Sql: String =
    s"""WITH $annSql, $lastWinsSql
       |SELECT count(*)::BIGINT AS total,
       |  (count(*) FILTER (WHERE $normJudgeSql = ''))::BIGINT AS no_judge,
       |  (count(*) FILTER (WHERE trim(court) = ''))::BIGINT AS no_court,
       |  (count(*) FILTER (WHERE lower(trim(case_type)) = ''))::BIGINT AS no_case_type,
       |  (count(*) FILTER (WHERE coalesce(nullif(docket_text, ''), NULL) IS NULL))::BIGINT AS no_docket
       |FROM cs""".stripMargin

  private val q64Sql: String =
    s"""WITH $annSql, $lastWinsSql
       |SELECT
       |  (SELECT min(${IngestQueries.dateCascadeSql("filed_date")}) FROM cs) AS min_date,
       |  (SELECT max(${IngestQueries.dateCascadeSql("filed_date")}) FROM cs) AS max_date,
       |  (SELECT count(*) FROM ann WHERE err = 'BAD_DATE')::BIGINT AS bad_dates""".stripMargin

  // dims build from every record that REACHED the court/judge stage:
  // error-free plus late-stage failures (VALIDATION_ERROR,
  // STATUS_UNMAPPED) — the reference commits partial work
  private val q65Sql: String =
    s"""WITH $annSql,
       |rc AS (
       |  SELECT *, $normCourtSql AS nc, $normJudgeSql AS nj FROM ann
       |  WHERE err IS NULL OR err IN ('VALIDATION_ERROR','STATUS_UNMAPPED')),
       |courts_dim AS (SELECT nc, arg_min(court, _seq) AS name FROM rc GROUP BY nc),
       |judges_dim AS (SELECT nj, arg_min(judge, _seq) AS full_name FROM rc WHERE nj <> '' GROUP BY nj)
       |SELECT 'courts' AS entity, count(DISTINCT name)::BIGINT AS distinct_names,
       |  count(DISTINCT nc)::BIGINT AS distinct_normalized, count(*)::BIGINT AS total
       |FROM courts_dim
       |UNION ALL
       |SELECT 'judges', count(DISTINCT full_name)::BIGINT, count(DISTINCT nj)::BIGINT, count(*)::BIGINT
       |FROM judges_dim
       |ORDER BY entity""".stripMargin

  // every good record contributes a plaintiff; defendant unless
  // doc_id % 7 = 0 (the generator's coverage wrinkle)
  private val q66Sql: String =
    s"""WITH $annSql,
       |per_case AS (
       |  SELECT trim(case_number) AS cn, bool_or(_seq % 7 <> 0) AS has_def
       |  FROM good GROUP BY 1)
       |SELECT count(*)::BIGINT AS cases_with_parties,
       |  count(*)::BIGINT AS cases_with_plaintiff,
       |  (count(*) FILTER (WHERE has_def))::BIGINT AS cases_with_defendant
       |FROM per_case""".stripMargin

  // case_parties dedups on (case, normalized party, role); names are
  // `source` (plaintiff) and 'Counterparty of <lang>' (defendant)
  private val q67Sql: String =
    s"""WITH $annSql,
       |occ AS (
       |  SELECT DISTINCT trim(case_number) AS cn,
       |    lower(trim(regexp_replace(source, '\\s+', ' ', 'g'))) AS pn,
       |    'plaintiff' AS role
       |  FROM good
       |  UNION
       |  SELECT DISTINCT trim(case_number),
       |    lower(trim(regexp_replace('Counterparty of ' || lang, '\\s+', ' ', 'g'))),
       |    'defendant'
       |  FROM good WHERE _seq % 7 <> 0)
       |SELECT role, count(*)::BIGINT AS cnt
       |FROM occ GROUP BY role ORDER BY cnt DESC, role LIMIT 10""".stripMargin

  private val q68Sql: String =
    s"""WITH $annSql
       |SELECT DATE '2026-01-09' AS day,
       |  (SELECT count(*) FROM ann WHERE _seq % 2 = 1)::BIGINT AS ingested,
       |  (SELECT count(*) FROM ann WHERE _seq % 2 = 1 AND err IS NOT NULL)::BIGINT AS failed""".stripMargin

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q61_quality_volume" -> (q61Volume _),
    "q62_quality_errors" -> (q62Errors _),
    "q63_quality_completeness" -> (q63Completeness _),
    "q64_quality_dates" -> (q64DateSanity _),
    "q65_quality_normalization" -> (q65Normalization _),
    "q66_quality_parties" -> (q66PartiesCoverage _),
    "q67_quality_roles" -> (q67Roles _),
    "q68_quality_recent" -> (q68RecentDaily _),
  )

  val oracle: Map[String, String] = Map(
    "q61_quality_volume" -> q61Sql,
    "q62_quality_errors" -> q62Sql,
    "q63_quality_completeness" -> q63Sql,
    "q64_quality_dates" -> q64Sql,
    "q65_quality_normalization" -> q65Sql,
    "q66_quality_parties" -> q66Sql,
    "q67_quality_roles" -> q67Sql,
    "q68_quality_recent" -> q68Sql,
  )
}
