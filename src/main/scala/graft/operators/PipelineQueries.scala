package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ingest.IngestJob

/** The WHOLE ingest pipeline as an oracle-gated query: a messy docket
  * batch is synthesized deterministically from the `documents` table
  * (duplicate case numbers, three date format families, invalid dates,
  * blank courts/case types, bad statuses, padded titles), run through
  * the full IngestJob DAG, and the resulting `cases` table's
  * non-surrogate columns are compared against a DuckDB replication of
  * the validate → normalize → last-write-wins semantics. This gates
  * the ingest path end-to-end at every scale factor, not just on the
  * 502-record reference corpus.
  */
object PipelineQueries {

  /** Synthesized raw batch, deterministic in doc_id:
    *   - case_number: "D-" + doc_id % 300 (duplicates ⇒ last-wins),
    *     blank every 29th (MISSING_CASE_NUMBER);
    *   - filed_date: rotates ISO / unpadded-MDY / named-month off a
    *     base date walk, impossible date every 17th (BAD_DATE);
    *   - court: blank every 23rd (FK_COURT), else per-lang spelling;
    *   - case_type: blank every 11th (VALIDATION_ERROR quirk);
    *   - status: "archived" every 13th (STATUS_UNMAPPED), else mixed
    *     casing; title whitespace-padded (must flow through);
    *   - parties: plaintiff always, defendant dropped every 7th
    *     (exercises the coverage report, QualityQueries q66);
    *   - judge: blank every 5th (⇒ null judge_id, completeness q63).
    *
    * Shared with QualityQueries q61-q68 — their DuckDB oracles
    * replicate THIS generator, so keep the two in lockstep.
    */
  private[operators] def synthesizeRaw(t: Tables): DataFrame = {
    val d = t.documents
    val base = date_add(to_date(lit("2020-01-01")), (col("doc_id") % 900).cast("int"))
    d.select(
      when(col("doc_id") % 29 === 0, lit(""))
        .otherwise(concat(lit("D-"), (col("doc_id") % 300).cast("string")))
        .as("case_number"),
      when(col("doc_id") % 23 === 0, lit(""))
        .otherwise(concat(lit("Dist. Court of "), upper(col("lang")))).as("court"),
      concat(lit("  Case "), col("doc_id").cast("string"), lit(" ")).as("title"),
      when(col("doc_id") % 17 === 0, lit("13-40-2024"))
        .when(col("doc_id") % 3 === 0, date_format(base, "yyyy-MM-dd"))
        .when(col("doc_id") % 3 === 1, date_format(base, "M/d/yyyy"))
        .otherwise(date_format(base, "MMM d, yyyy")).as("filed_date"),
      when(col("doc_id") % 7 === 0,
        concat(col("source"), lit(" (plaintiff)")))
        .otherwise(concat(col("source"), lit(" (plaintiff); Counterparty of "),
          col("lang"), lit(" (defendant)"))).as("parties"),
      when(col("doc_id") % 11 === 0, lit(""))
        .otherwise(lit("Civil")).as("case_type"),
      when(col("doc_id") % 5 === 0, lit(""))
        .otherwise(concat(lit("Hon. Judge "), col("lang"))).as("judge"),
      col("text").as("docket_text"),
      when(col("doc_id") % 13 === 0, lit("archived"))
        .otherwise(lit("Active")).as("status"),
      col("doc_id").as("_seq"))
  }

  def q60IngestPipeline(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val r = IngestJob.run(spark, synthesizeRaw(t), runId = 1,
      sourceName = "synthesized", sourceUri = dir,
      ts = Timestamp.valueOf("2026-01-01 00:00:00"))
    r.cases
      .select("case_number", "title", "filed_date", "status")
      .orderBy("case_number")
  }

  val q60Sql: String = {
    val errorCode =
      s"""CASE WHEN trim(case_number) = '' THEN 'MISSING_CASE_NUMBER'
         |     WHEN ${IngestQueries.dateCascadeSql("filed_date")} IS NULL THEN 'BAD_DATE'
         |     WHEN trim(court) = '' THEN 'FK_COURT'
         |     WHEN lower(trim(case_type)) = '' THEN 'VALIDATION_ERROR'
         |     WHEN lower(status) NOT IN ('active','closed','pending','dismissed') THEN 'STATUS_UNMAPPED'
         |     ELSE NULL END""".stripMargin
    s"""WITH raw AS (
       |  SELECT
       |    CASE WHEN doc_id % 29 = 0 THEN '' ELSE 'D-' || (doc_id % 300)::VARCHAR END AS case_number,
       |    CASE WHEN doc_id % 23 = 0 THEN '' ELSE 'Dist. Court of ' || upper(lang) END AS court,
       |    '  Case ' || doc_id::VARCHAR || ' ' AS title,
       |    CASE WHEN doc_id % 17 = 0 THEN '13-40-2024'
       |         WHEN doc_id % 3 = 0 THEN strftime(DATE '2020-01-01' + ((doc_id % 900)::INT), '%Y-%m-%d')
       |         WHEN doc_id % 3 = 1 THEN strftime(DATE '2020-01-01' + ((doc_id % 900)::INT), '%-m/%-d/%Y')
       |         ELSE strftime(DATE '2020-01-01' + ((doc_id % 900)::INT), '%b %-d, %Y') END AS filed_date,
       |    CASE WHEN doc_id % 11 = 0 THEN '' ELSE 'Civil' END AS case_type,
       |    CASE WHEN doc_id % 13 = 0 THEN 'archived' ELSE 'Active' END AS status,
       |    doc_id AS _seq
       |  FROM documents),
       |valid AS (
       |  SELECT * FROM raw WHERE ($errorCode) IS NULL),
       |last_wins AS (
       |  SELECT trim(case_number) AS case_number, title,
       |    ${IngestQueries.dateCascadeSql("filed_date")} AS filed_date,
       |    lower(status) AS status,
       |    ROW_NUMBER() OVER (PARTITION BY trim(case_number) ORDER BY _seq DESC) AS rn
       |  FROM valid)
       |SELECT case_number, title, filed_date, status
       |FROM last_wins WHERE rn = 1 ORDER BY case_number""".stripMargin
  }

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_ingest_pipeline" -> (q60IngestPipeline _),
  )

  val oracle: Map[String, String] = Map(
    "q60_ingest_pipeline" -> q60Sql,
  )
}
