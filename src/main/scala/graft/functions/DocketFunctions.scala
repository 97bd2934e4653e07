package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level docket functions: the entity normalizers, the
  * multi-format filed-date cascade, status validation, and the
  * first-failure-wins error-code classifier. All are pure
  * `org.apache.spark.sql.functions` compositions (codegen'd, no UDFs)
  * and all replicate /root/reference/ingest.py behavior exactly where
  * observable on the shipped corpus.
  */
object DocketFunctions {

  /** Court normalizer (ingest.py:251-265): uppercase, strip periods
    * and whitespace — `"S.D.N.Y." → "SDNY"`. Null/empty → "".
    */
  def normCourt(c: Column): Column =
    regexp_replace(upper(coalesce(c, lit(""))), "[.\\s]+", "")

  /** Judge normalizer (ingest.py:267-282): strip ONE leading title
    * (`hon.`/`hon`/`judge`/`justice`, case-insensitive, anchored at
    * position 0 — a leading space defeats the strip, as in the
    * reference), collapse whitespace, trim, lowercase.
    */
  def normJudge(c: Column): Column =
    lower(trim(regexp_replace(
      regexp_replace(coalesce(c, lit("")), "(?i)^(hon\\.?|judge|justice)\\s+", ""),
      "\\s+", " ")))

  /** Party normalizer (ingest.py:284-297): collapse whitespace, trim,
    * lowercase.
    */
  def normParty(c: Column): Column =
    lower(trim(regexp_replace(coalesce(c, lit("")), "\\s+", " ")))

  private val mdyRe = "^(\\d{1,2})[-/](\\d{1,2})[-/](\\d{4})$"

  /** Filed-date cascade (ingest.py:299-350), null = unparseable
    * (callers route null to BAD_DATE — per-record error isolation,
    * SURVEY §7.4: expressions never throw; requires ANSI mode off).
    *
    * Order preserved from the reference:
    *   1. ISO `yyyy-M-d` (Python's `%Y-%m-%d` accepts unpadded parts);
    *   2. numeric US MDY via regex (1-2 digit month/day, 4-digit
    *      year, `-` or `/`), calendar-validated by try_make_date — a
    *      regex match with an impossible date (13-40-2024) FAILS the
    *      whole cascade, it does not fall through to later formats
    *      (the reference raises inside this branch);
    *   3. named months `MMM d, yyyy` / `MMMM d, yyyy`.
    * The reference's trailing zero-padded `%m/%d/%Y` branch is dead
    * code (anything it accepts already matched the regex) and is
    * intentionally not replicated.
    */
  def parseFiledDate(c: Column): Column = {
    val s = trim(coalesce(c, lit("")))
    val iso = to_date(s, "yyyy-M-d")
    // make_date yields null on out-of-calendar parts with ANSI off
    // (GraftSession pins spark.sql.ansi.enabled=false)
    val mdy = make_date(
      regexp_extract(s, mdyRe, 3).cast("int"),
      regexp_extract(s, mdyRe, 1).cast("int"),
      regexp_extract(s, mdyRe, 2).cast("int"))
    val named = coalesce(to_date(s, "MMM d, yyyy"), to_date(s, "MMMM d, yyyy"))
    when(iso.isNotNull, iso)
      .when(s.rlike(mdyRe), mdy)
      .otherwise(named)
  }

  /** Valid status set (schema.sql:45, ingest.py:607-609). */
  val validStatuses: Seq[String] = Seq("active", "closed", "pending", "dismissed")

  /** Status with the reference's default: a missing status means
    * `active` (ingest.py:607). Lowercased for the enum check.
    */
  def statusNorm(c: Column): Column = lower(coalesce(c, lit("active")))

  /** Case type with the reference's default `civil` (ingest.py:604),
    * lowercased + trimmed (ingest.py:509).
    */
  def caseTypeNorm(c: Column): Column =
    lower(trim(coalesce(c, lit("civil"))))

  /** First-failure-wins error-code classifier (ingest.py:800-826 via
    * the process order of ingest.py:582-609). Null = record is valid.
    *
    * Process order decides which exception fires, and the message-
    * substring dispatch of `_determine_error_code` names it:
    *   1. blank case_number → MISSING_CASE_NUMBER
    *   2. unparseable filed_date → BAD_DATE
    *   3. blank court → FK_COURT ("Court name cannot be empty")
    *   4. blank-after-default case_type → VALIDATION_ERROR (quirk:
    *      the message "Case type cannot be empty" contains neither
    *      "case_type" nor any other keyword, so the FK_CASE_TYPE
    *      branch is unreachable in practice)
    *   5. status outside the enum → STATUS_UNMAPPED.
    * FK_JUDGE is likewise unreachable (empty judge is legal → null).
    */
  def errorCode(caseNumber: Column, filedDate: Column, court: Column,
      caseType: Column, status: Column): Column =
    when(trim(coalesce(caseNumber, lit(""))) === "", lit("MISSING_CASE_NUMBER"))
      .when(parseFiledDate(filedDate).isNull, lit("BAD_DATE"))
      .when(trim(coalesce(court, lit(""))) === "", lit("FK_COURT"))
      .when(caseTypeNorm(caseType) === "", lit("VALIDATION_ERROR"))
      .when(!statusNorm(status).isin(validStatuses.map(lit): _*), lit("STATUS_UNMAPPED"))
      .otherwise(lit(null).cast("string"))

  /** Human-readable failure reason, mirroring the reference's
    * exception messages (ingest.py:594, 349, 421, 507, 609).
    */
  def errorWhy(caseNumber: Column, filedDate: Column, court: Column,
      caseType: Column, status: Column): Column =
    when(trim(coalesce(caseNumber, lit(""))) === "",
      lit("case_number is required and cannot be empty"))
      .when(parseFiledDate(filedDate).isNull,
        concat(lit("filed_date parse failed: '"), coalesce(filedDate, lit("")), lit("'")))
      .when(trim(coalesce(court, lit(""))) === "", lit("Court name cannot be empty"))
      .when(caseTypeNorm(caseType) === "", lit("Case type cannot be empty"))
      .when(!statusNorm(status).isin(validStatuses.map(lit): _*),
        concat(lit("Invalid status '"), statusNorm(status),
          lit("'. Must be one of: active, closed, pending, dismissed")))
      .otherwise(lit(null).cast("string"))
}
