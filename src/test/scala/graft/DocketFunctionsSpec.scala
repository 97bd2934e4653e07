package graft

import java.sql.Date

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.DocketFunctions

/** Column-function specs: the date cascade against the reference's own
  * selftest corpus (ingest.py:926-965), normalizers against the
  * docstring examples, and the error-code precedence.
  */
class DocketFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parseAll(inputs: Seq[String]): Map[String, Option[Date]] =
    inputs.zipWithIndex.map { case (s, i) => (i, s) }.toDF("id", "s")
      .select(col("s"), DocketFunctions.parseFiledDate(col("s")).as("d"))
      .collect().map(r => r.getString(0) -> Option(r.getDate(1))).toMap

  test("parseFiledDate: the reference selftest positive cases") {
    val expected = Map(
      "10-3-2024" -> "2024-10-03", "4-5-2023" -> "2023-04-05",
      "12-11-2025" -> "2025-12-11", "6-6-2025" -> "2025-06-06",
      "7-17-2022" -> "2022-07-17", "9-25-2022" -> "2022-09-25",
      "11-1-2025" -> "2025-11-01", "8/8/2025" -> "2025-08-08",
      "Oct 3, 2024" -> "2024-10-03", "October 3, 2024" -> "2024-10-03",
      "2024-10-03" -> "2024-10-03", "03/15/2023" -> "2023-03-15")
    val got = parseAll(expected.keys.toSeq)
    expected.foreach { case (in, want) =>
      assert(got(in).map(_.toString).contains(want), s"for input '$in'")
    }
  }

  test("parseFiledDate: invalid inputs yield null (not an exception)") {
    val got = parseAll(Seq("13-40-2024", "", "2024-02-30", "Feb 29, 2023", "junk"))
    assert(got.values.forall(_.isEmpty))
  }

  test("normalizers: reference docstring examples") {
    val df = Seq(("S.D.N.Y.", "Hon. Maria Rodriguez", "  Acme   Corp  "))
      .toDF("c", "j", "p")
      .select(
        DocketFunctions.normCourt(col("c")).as("nc"),
        DocketFunctions.normJudge(col("j")).as("nj"),
        DocketFunctions.normParty(col("p")).as("np"))
    val r = df.collect()(0)
    assert(r.getString(0) == "SDNY")
    assert(r.getString(1) == "maria rodriguez")
    assert(r.getString(2) == "acme corp")
  }

  test("errorCode precedence: first process-order failure wins") {
    val rows = Seq(
      ("", "bad", "", "", "bad"),          // everything wrong → case number first
      ("C", "bad", "", "", "bad"),         // → BAD_DATE
      ("C", "2024-10-03", "", "", "bad"),  // → FK_COURT
      ("C", "2024-10-03", "X", "", "bad"), // → VALIDATION_ERROR (case-type quirk)
      ("C", "2024-10-03", "X", "t", "bad"),// → STATUS_UNMAPPED
      ("C", "2024-10-03", "X", "t", "Active")) // valid
    val got = rows.toDF("cn", "fd", "co", "ct", "st")
      .select(DocketFunctions.errorCode(col("cn"), col("fd"), col("co"),
        col("ct"), col("st")).as("e"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("MISSING_CASE_NUMBER"), Some("BAD_DATE"),
      Some("FK_COURT"), Some("VALIDATION_ERROR"), Some("STATUS_UNMAPPED"), None))
  }
}
