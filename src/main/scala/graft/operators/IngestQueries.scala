package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{DocketFunctions => DF, DocketScala}

/** Oracle-verified coverage of the docket-domain functions (SURVEY
  * §2.8 F1-F5, F20): entity normalizers, the multi-format filed-date
  * cascade, the party-string parser, and the error-code classifier.
  *
  * These operate on inline literal rows (the reference's own selftest
  * corpus, ingest.py:879-977, plus documented quirk cases) rather than
  * the TPC-H-ish tables — the driver's DuckDB oracle runs the same
  * VALUES, so the functions themselves are differentially verified
  * end-to-end. The heavy-lift uses over real tables are in
  * graft.ingest.IngestJob.
  */
object IngestQueries {

  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"

  // ---------------------------------------------------------------- q50
  /** (id, court, judge, party) messy spellings. */
  private val normCases: Seq[(Int, String, String, String)] = Seq(
    (0, "S.D.N.Y", "Hon. Maria Rodriguez", "Acme Corp"),
    (1, "S.D.N.Y.", "Judge Sarah Chen", "  Acme   Corp  "),
    (2, "N.D. Cal.", "Justice John Roberts", "ACME CORP"),
    (3, "n.d. cal", "hon Maria Rodriguez", "Smith & Wesson LLC"),
    (4, "E.D. Tex.", " Judge Leading Space", "John Smith Jr."),
    (5, "S. D. N. Y.", "Maria Rodriguez", "  "),
    (6, "", "HON. UPPER CASE", "MegaCorp\tIndustries"),
    (7, "Southern District of New York", "Judge  Double   Space", "a"),
    (8, "9th Cir.", "Justice", "O'Brien & Sons"))

  def q50NormalizeEntities(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    normCases.toDF("id", "court", "judge", "party")
      .select(col("id"),
        DF.normCourt(col("court")).as("norm_court"),
        DF.normJudge(col("judge")).as("norm_judge"),
        DF.normParty(col("party")).as("norm_party"))
      .orderBy("id")
  }

  val q50Sql: String = {
    val values = normCases.map { case (i, c, j, p) =>
      s"($i, ${sq(c)}, ${sq(j)}, ${sq(p)})"
    }.mkString(", ")
    s"""SELECT id,
       |  regexp_replace(upper(court), '[.\\s]+', '', 'g') AS norm_court,
       |  lower(trim(regexp_replace(regexp_replace(judge, '(?i)^(hon\\.?|judge|justice)\\s+', ''), '\\s+', ' ', 'g'))) AS norm_judge,
       |  lower(trim(regexp_replace(party, '\\s+', ' ', 'g'))) AS norm_party
       |FROM (VALUES $values) t(id, court, judge, party) ORDER BY id""".stripMargin
  }

  // ---------------------------------------------------------------- q51
  /** The reference's selftest corpus (ingest.py:926-965) + documented
    * edges: calendar validation inside the MDY branch, unpadded ISO,
    * leap days, padded named-month days.
    */
  private val dateCases: Seq[(Int, String)] = Seq(
    (0, "10-3-2024"), (1, "4-5-2023"), (2, "12-11-2025"), (3, "6-6-2025"),
    (4, "7-17-2022"), (5, "9-25-2022"), (6, "11-1-2025"), (7, "8/8/2025"),
    (8, "Oct 3, 2024"), (9, "October 3, 2024"), (10, "2024-10-03"),
    (11, "03/15/2023"), (12, "13-40-2024"), (13, ""), (14, "2024-1-3"),
    (15, "Feb 29, 2024"), (16, "Feb 29, 2023"), (17, "10/3/2024"),
    (18, "bogus date"), (19, "2024-02-30"), (20, "Sep 05, 2021"),
    (21, "  10-3-2024  "), (22, "1/2/2003"), (23, "00-00-2024"))

  def q51DateCascade(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dateCases.toDF("id", "s")
      .select(col("id"), DF.parseFiledDate(col("s")).as("filed_date"))
      .orderBy("id")
  }

  private val isoRe = """^(\d{4})-(\d{1,2})-(\d{1,2})$"""
  private val mdyRe = """^(\d{1,2})[-/](\d{1,2})[-/](\d{4})$"""

  /** DuckDB fragment mirroring DocketFunctions.parseFiledDate over a
    * string expression (calendar validation via try_cast of a printf'd
    * ISO literal).
    */
  def dateCascadeSql(s: String): String = {
    def part(re: String, g: Int) = s"regexp_extract(trim($s), '$re', $g)::INT"
    s"""(CASE
       | WHEN regexp_matches(trim($s), '$isoRe') THEN
       |   try_cast(printf('%04d-%02d-%02d', ${part(isoRe, 1)}, ${part(isoRe, 2)}, ${part(isoRe, 3)}) AS DATE)
       | WHEN regexp_matches(trim($s), '$mdyRe') THEN
       |   try_cast(printf('%04d-%02d-%02d', ${part(mdyRe, 3)}, ${part(mdyRe, 1)}, ${part(mdyRe, 2)}) AS DATE)
       | ELSE coalesce(CAST(try_strptime(trim($s), '%b %d, %Y') AS DATE),
       |               CAST(try_strptime(trim($s), '%B %d, %Y') AS DATE))
       |END)""".stripMargin
  }

  val q51Sql: String = {
    val values = dateCases.map { case (i, s) => s"($i, ${sq(s)})" }.mkString(", ")
    s"""SELECT id, ${dateCascadeSql("s")} AS filed_date
       |FROM (VALUES $values) t(id, s) ORDER BY id""".stripMargin
  }

  // ---------------------------------------------------------------- q52
  /** Party strings exercising every documented parser behavior,
    * including the quirk ledger (SURVEY §7.4.6): pipe blindness,
    * unmatched-role parens kept, plural singularization, first-role
    * wins per section.
    */
  private val partyCases: Seq[(Int, String)] = Seq(
    (0, "John Smith (plaintiff); Acme Corp, Jane Doe (defendants)"),
    (1, "TechStart Inc (plaintiff), MegaCorp (defendant)"),
    (2, "Robert Anderson (plaintiff) / HealthPlus Insurance Co. (defendant)"),
    (3, "A | B (plaintiff); C (defendant)"),
    (4, "Acme Corp (observer)"),
    (5, "  ; ; X (Intervenors) ; Y,, Z"),
    (6, "Solo Party"),
    (7, "a (third_party), b"),
    (8, ""),
    (9, "Alpha (PLAINTIFF) vs Beta (defendant)"),
    (10, "x (intervenor); y (other); z"))

  def q52PartyParse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sigUdf = udf((s: String) =>
      DocketScala.parseParties(s).map(p => s"${p.name}:${p.role}").mkString("|"))
    val nUdf = udf((s: String) => DocketScala.parseParties(s).size)
    partyCases.toDF("id", "s")
      .select(col("id"), nUdf(col("s")).as("n_parties"), sigUdf(col("s")).as("sig"))
      .orderBy("id")
  }

  private val roleReSql =
    "'(?i)\\((plaintiff|defendant|plaintiffs|defendants|third_party|intervenor|other)\\)'"

  val q52Sql: String = {
    val values = partyCases.map { case (i, s) => s"($i, ${sq(s)})" }.mkString(", ")
    val role = s"regexp_extract(sec, $roleReSql, 1)"
    val cleanRole =
      s"""CASE WHEN $role = '' THEN 'other'
         | WHEN lower($role) LIKE '%s' THEN substr(lower($role), 1, len($role) - 1)
         | ELSE lower($role) END""".stripMargin
    val nameSrc =
      s"""CASE WHEN $role = '' THEN sec
         | ELSE regexp_replace(sec, '\\([^)]+\\)', '', 'g') END""".stripMargin
    val perSec =
      s"""list_transform(
         |  list_filter(list_transform(string_split($nameSrc, ','), n -> trim(n)), n -> n != ''),
         |  n -> n || ':' || $cleanRole)""".stripMargin
    val sig =
      s"""coalesce(array_to_string(flatten(list_transform(
         |  list_filter(list_transform(regexp_split_to_array(s, '[;/]'), x -> trim(x)), x -> x != ''),
         |  sec -> $perSec)), '|'), '')""".stripMargin
    val n =
      s"""coalesce(len(flatten(list_transform(
         |  list_filter(list_transform(regexp_split_to_array(s, '[;/]'), x -> trim(x)), x -> x != ''),
         |  sec -> $perSec))), 0)""".stripMargin
    s"""SELECT id, $n AS n_parties, $sig AS sig
       |FROM (VALUES $values) t(id, s) ORDER BY id""".stripMargin
  }

  // ---------------------------------------------------------------- q53
  /** (id, case_number, filed_date, court, case_type, status) rows
    * covering every error code and the precedence between them.
    */
  private val errorCases: Seq[(Int, String, String, String, String, String)] = Seq(
    (0, "C-1", "2024-10-03", "S.D.N.Y", "civil", "active"),       // valid
    (1, "", "2024-10-03", "S.D.N.Y", "civil", "active"),          // MISSING_CASE_NUMBER
    (2, "  ", "bad", "", "", "nope"),                             // MISSING_CASE_NUMBER (wins)
    (3, "C-4", "13-40-2024", "S.D.N.Y", "civil", "active"),       // BAD_DATE
    (4, "C-5", "not a date", "", "civil", "active"),              // BAD_DATE (wins over court)
    (5, "C-6", "2024-10-03", "", "civil", "active"),              // FK_COURT
    (6, "C-7", "2024-10-03", "  ", "civil", "active"),            // FK_COURT (whitespace)
    (7, "C-8", "2024-10-03", "S.D.N.Y", "", "active"),            // VALIDATION_ERROR (case-type quirk)
    (8, "C-9", "2024-10-03", "S.D.N.Y", "  ", "active"),          // VALIDATION_ERROR
    (9, "C-10", "2024-10-03", "S.D.N.Y", "civil", "archived"),    // STATUS_UNMAPPED
    (10, "C-11", "2024-10-03", "S.D.N.Y", "civil", "CLOSED"),     // valid (case-folded)
    (11, "C-12", "Oct 3, 2024", "N.D. Cal.", "Criminal", "Pending")) // valid

  def q53ErrorCodes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    errorCases.toDF("id", "case_number", "filed_date", "court", "case_type", "status")
      .select(col("id"),
        DF.errorCode(col("case_number"), col("filed_date"), col("court"),
          col("case_type"), col("status")).as("error_code"))
      .orderBy("id")
  }

  val q53Sql: String = {
    val values = errorCases.map { case (i, cn, fd, ct, ty, st) =>
      s"($i, ${sq(cn)}, ${sq(fd)}, ${sq(ct)}, ${sq(ty)}, ${sq(st)})"
    }.mkString(", ")
    s"""SELECT id,
       |  CASE WHEN trim(case_number) = '' THEN 'MISSING_CASE_NUMBER'
       |       WHEN ${dateCascadeSql("filed_date")} IS NULL THEN 'BAD_DATE'
       |       WHEN trim(court) = '' THEN 'FK_COURT'
       |       WHEN lower(trim(case_type)) = '' THEN 'VALIDATION_ERROR'
       |       WHEN lower(status) NOT IN ('active', 'closed', 'pending', 'dismissed') THEN 'STATUS_UNMAPPED'
       |       ELSE NULL END AS error_code
       |FROM (VALUES $values) t(id, case_number, filed_date, court, case_type, status)
       |ORDER BY id""".stripMargin
  }

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_normalize_entities" -> (q50NormalizeEntities _),
    "q51_date_cascade" -> (q51DateCascade _),
    "q52_party_parse" -> (q52PartyParse _),
    "q53_error_codes" -> (q53ErrorCodes _),
  )

  val oracle: Map[String, String] = Map(
    "q50_normalize_entities" -> q50Sql,
    "q51_date_cascade" -> q51Sql,
    "q52_party_parse" -> q52Sql,
    "q53_error_codes" -> q53Sql,
  )
}
