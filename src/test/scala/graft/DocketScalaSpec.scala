package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.DocketScala
import graft.functions.DocketScala.{Chunk, Party}

/** Pure-function specs against the reference's documented behavior
  * (ingest.py:352-403 parse_parties, rag.py:44-69 chunk_text,
  * ingest.py:42-49 canonical_json/sha256).
  */
class DocketScalaSpec extends AnyFunSuite {

  test("parse_parties: docstring examples (ingest.py:359-363)") {
    assert(DocketScala.parseParties(
      "John Smith (plaintiff); Acme Corp, Jane Doe (defendants)") ==
      Seq(Party("John Smith", "plaintiff"), Party("Acme Corp", "defendant"),
        Party("Jane Doe", "defendant")))
    assert(DocketScala.parseParties(
      "Robert Anderson (plaintiff) / HealthPlus Insurance Co. (defendant)") ==
      Seq(Party("Robert Anderson", "plaintiff"),
        Party("HealthPlus Insurance Co.", "defendant")))
  }

  test("parse_parties: first role in a section applies to every name") {
    assert(DocketScala.parseParties("TechStart Inc (plaintiff), MegaCorp (defendant)") ==
      Seq(Party("TechStart Inc", "plaintiff"), Party("MegaCorp", "plaintiff")))
  }

  test("parse_parties: pipe is NOT a separator (ingest.py:370 quirk)") {
    assert(DocketScala.parseParties("A | B (plaintiff); C (defendant)") ==
      Seq(Party("A | B", "plaintiff"), Party("C", "defendant")))
  }

  test("parse_parties: unknown role keeps parenthetical, role=other") {
    assert(DocketScala.parseParties("Acme Corp (observer)") ==
      Seq(Party("Acme Corp (observer)", "other")))
    // plural-in-parens that isn't in the enum: no match either
    assert(DocketScala.parseParties("X (Intervenors)") ==
      Seq(Party("X (Intervenors)", "other")))
  }

  test("parse_parties: blanks, empty sections, null") {
    assert(DocketScala.parseParties("  ; ; X (intervenor) ; Y,, Z") ==
      Seq(Party("X", "intervenor"), Party("Y", "other"), Party("Z", "other")))
    assert(DocketScala.parseParties("") == Seq.empty)
    assert(DocketScala.parseParties(null) == Seq.empty)
  }

  test("chunk_text: basic overlap walk (rag.py:44-69)") {
    // size 5, overlap 2 → starts 0,3,6,... window [i, i+5)
    val cs = DocketScala.chunkText("abcdefghij", 5, 2)
    assert(cs == Seq(Chunk(0, "abcde"), Chunk(1, "defgh"), Chunk(2, "ghij")))
  }

  test("chunk_text: stops when a window reaches the end") {
    // n == size → one chunk, no trailing overlap chunk
    assert(DocketScala.chunkText("abcde", 5, 2) == Seq(Chunk(0, "abcde")))
  }

  test("chunk_text: strips chunks, skips empties, keeps ids dense") {
    // window [3,6) = "   " strips to empty → skipped, next id stays dense
    val cs = DocketScala.chunkText("abc   def", 3, 0)
    assert(cs == Seq(Chunk(0, "abc"), Chunk(1, "def")))
  }

  test("chunk_text: overlap clamped to size-1, size floored at 1") {
    // overlap >= size would loop forever in a naive port; reference clamps
    val cs = DocketScala.chunkText("abcd", 2, 5)
    assert(cs == Seq(Chunk(0, "ab"), Chunk(1, "bc"), Chunk(2, "cd")))
    assert(DocketScala.chunkText("ab", 0, 0) ==
      Seq(Chunk(0, "a"), Chunk(1, "b")))
  }

  test("chunk_text: empty/null input") {
    assert(DocketScala.chunkText("", 5, 1) == Seq.empty)
    assert(DocketScala.chunkText(null, 5, 1) == Seq.empty)
  }

  test("canonical_json + sha256 byte-parity with the reference") {
    // expected values computed with the reference's exact code path:
    // json.dumps(raw, ensure_ascii=False, separators=(',',':'),
    // sort_keys=True) → hashlib.sha256(...).hexdigest()
    val fields = Seq(
      "case_number" -> "C-1", "court" -> "S.D.N.Y",
      "title" -> "  Padded title ", "filed_date" -> "10-3-2024",
      "parties" -> "A (plaintiff); B (defendant)", "case_type" -> null,
      "judge" -> "Hon. José “Quote” O'Brien\tTab",
      "docket_text" -> "line1\nline2", "status" -> "Active")
    val cj = DocketScala.canonicalJson(fields)
    assert(cj ==
      """{"case_number":"C-1","case_type":null,"court":"S.D.N.Y","docket_text":"line1\nline2","filed_date":"10-3-2024","judge":"Hon. José “Quote” O'Brien\tTab","parties":"A (plaintiff); B (defendant)","status":"Active","title":"  Padded title "}""")
    assert(DocketScala.sha256Hex(cj) ==
      "33ce63ae9e0cb553a55918faca2b67815fb48522eeea8c1bd9e759a320f43f70")
  }

  test("hashEmbed: deterministic, unit-normalized, zero for empty") {
    val v1 = DocketScala.hashEmbed("some docket text about contracts", 64)
    val v2 = DocketScala.hashEmbed("some docket text about contracts", 64)
    assert(v1.toSeq == v2.toSeq)
    val norm = math.sqrt(v1.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
    assert(DocketScala.hashEmbed("", 64).forall(_ == 0.0f))
    assert(DocketScala.hashEmbed(null, 64).forall(_ == 0.0f))
  }
}
