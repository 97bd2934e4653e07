package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.DocketScala

/** Property-based specs (SURVEY §5.2): chunker invariants across the
  * whole (size, overlap) parameter plane, parser totality/enum-safety
  * on arbitrary input, and canonical-JSON determinism.
  */
object DocketProperties extends Properties("DocketScala") {

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      (8, Gen.alphaNumChar), (2, Gen.const(' ')), (1, Gen.const('\t')),
      (1, Gen.oneOf(',', ';', '/', '(', ')', '|', '.')))).map(_.mkString)

  property("chunker: dense ids, bounded length, no empties") =
    forAll(asciiText, Gen.chooseNum(1, 20), Gen.chooseNum(0, 30)) {
      (s, size, overlap) =>
        val chunks = DocketScala.chunkText(s, size, overlap)
        val denseIds = chunks.map(_.chunkId) == chunks.indices
        val bounded = chunks.forall(_.text.length <= math.max(1, size))
        val nonEmpty = chunks.forall(_.text.nonEmpty)
        denseIds && bounded && nonEmpty
    }

  property("chunker: zero overlap on space-free text reconstructs input") =
    forAll(Gen.listOf(Gen.alphaNumChar).map(_.mkString), Gen.chooseNum(1, 9)) {
      (s, size) =>
        DocketScala.chunkText(s, size, 0).map(_.text).mkString == s
    }

  property("chunker: every chunk is a substring of the input") =
    forAll(asciiText, Gen.chooseNum(1, 15), Gen.chooseNum(0, 20)) {
      (s, size, overlap) =>
        DocketScala.chunkText(s, size, overlap).forall(c => s.contains(c.text))
    }

  property("party parser: total, enum roles, non-blank trimmed names") =
    forAll(asciiText) { s =>
      val parties = DocketScala.parseParties(s)
      val enum_ = Set("plaintiff", "defendant", "third_party", "intervenor", "other")
      parties.forall(p => enum_.contains(p.role) &&
        p.name.nonEmpty && p.name == p.name.trim)
    }

  property("party parser: sections never cross ; or / boundaries") =
    forAll(Gen.listOf(Gen.alphaNumChar).map(_.mkString),
      Gen.listOf(Gen.alphaNumChar).map(_.mkString)) { (a, b) =>
      val parsed = DocketScala.parseParties(s"$a (plaintiff); $b (defendant)")
      parsed.forall(p => !(p.name.contains(";") || p.name.contains("/")))
    }

  property("canonical json: deterministic and key-order independent") =
    forAll(Gen.listOfN(4, Gen.zip(Gen.identifier, asciiText))) { kvs0 =>
      val kvs = kvs0.distinctBy(_._1)
      val a = DocketScala.canonicalJson(kvs)
      val b = DocketScala.canonicalJson(scala.util.Random.shuffle(kvs))
      Prop(a == b) :| s"$a != $b"
    }

  property("hashEmbed: unit norm or zero vector, always dim-length") =
    forAll(asciiText, Gen.oneOf(16, 64)) { (s, dim) =>
      val v = DocketScala.hashEmbed(s, dim)
      val norm = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      v.length == dim && (math.abs(norm - 1.0) < 1e-5 || norm == 0.0)
    }
}
