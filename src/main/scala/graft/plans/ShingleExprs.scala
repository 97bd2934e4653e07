package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextFunctions

/** Native shingle builders. The declarative forms
  * (TextFunctions.wordShinglesHof / charShinglesHof — sequence +
  * transform + array_join/substr + array_distinct) evaluate one
  * interpreted lambda frame per shingle, which measured ~1.3 ms/doc on
  * the corpus; these do one eval call per row into a tight Scala loop.
  * CodegenFallback: the enclosing stage stays whole-stage-codegen'd
  * and calls eval() once per row — the per-element lambda dispatch is
  * what disappears.
  *
  * Semantics are pinned to the declarative forms (SketchExprSpec):
  * order-preserving first-occurrence distinct; word mode joins
  * `slice(tokens, i+1, w)` (a short tail never gains a separator) and
  * yields the single shingle joined-from-whatever-exists when there
  * are fewer than w tokens (including "" for zero tokens); char mode
  * substrings clamp, and a text shorter than n yields itself.
  */
abstract class ShinglesExprBase extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got $other")
  }
  protected def shingles(s: String): Array[UTF8String]
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(shingles(input.toString).asInstanceOf[Array[Any]])
}

/** Distinct word w-gram shingles joined by single spaces —
  * value-identical to TextFunctions.wordShinglesHof.
  */
case class WordShinglesExpr(child: Expression, w: Int) extends ShinglesExprBase {
  override def prettyName: String = "graft_word_shingles"

  override protected def shingles(s: String): Array[UTF8String] = {
    val toks = s.split("\\s+").filter(_.nonEmpty)
    val n = toks.length
    val out = new mutable.LinkedHashSet[String]
    var i = 0
    val last = math.max(n - w, 0)
    while (i <= last) {
      // slice semantics: clamp the end; fewer than w tokens join what exists
      val end = math.min(i + w, n)
      out += toks.slice(i, end).mkString(" ")
      i += 1
    }
    out.iterator.map(UTF8String.fromString).toArray
  }

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}

/** Distinct character n-gram shingles — value-identical to
  * TextFunctions.charShinglesHof (substring clamps; text shorter than
  * n yields the single shingle = the text itself).
  */
case class CharShinglesExpr(child: Expression, n: Int) extends ShinglesExprBase {
  override def prettyName: String = "graft_char_shingles"

  override protected def shingles(s: String): Array[UTF8String] = {
    val len = s.length
    val out = new mutable.LinkedHashSet[String]
    val last = math.max(len - (n - 1), 1)
    var i = 1
    while (i <= last) {
      out += s.substring(i - 1, math.min(i - 1 + n, len))
      i += 1
    }
    out.iterator.map(UTF8String.fromString).toArray
  }

  override protected def withNewChildInternal(newChild: Expression): CharShinglesExpr =
    copy(child = newChild)
}

/** POSITIONAL word n-grams as strings, NON-distinct (one entry per
  * position — LM/bigram surprisal counts occurrences, not types).
  * Value-identical to the declarative
  * `transform(sequence(1, size(tk) - n + 1), i -> concat_ws(' ',
  * tk[i..i+n-1]))` over `tk = tokens(text)` (pinned in
  * SketchExprSpec), empty array when the text has fewer than n
  * whitespace tokens. One eval per row into a tight loop — the
  * per-position interpreted-lambda frames (q107/q117's dominant
  * per-task cost) disappear.
  */
case class WordGramsExpr(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"graft_word_grams needs n >= 1, got $n")
  override def prettyName: String = "graft_word_grams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_word_grams requires a string column, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.toString.split("\\s+").filter(_.nonEmpty)
    val count = toks.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordGramsExpr =
    copy(child = newChild)
}

/** POSITIONAL n-gram 60-bit hashes — the seed generator for
  * substring-span dedup (q193) and the novelty curve (q201):
  * element i = md5Long60 of tokens i..i+n-1 joined by single spaces,
  * one entry per position (NOT distinct — position is the point),
  * empty array when the text has fewer than n whitespace tokens.
  *
  * Value-identical to the declarative form
  * `transform(sequence(0, size(ts)-n), i -> md5Long60(array_join(
  * slice(ts, i+1, n), ' ')))` (pinned in SketchExprSpec), but one
  * eval per row: token bytes are encoded once and each gram's md5 is
  * STREAMED through one digest (update per token + separator), so no
  * per-gram string, no per-element lambda frames — the ~1 ms/row
  * interpreted-HOF tax q193 paid at every scale disappears. The
  * 60-bit fold mirrors `('0x' || substr(md5(x),1,15))::UBIGINT`:
  * 7 full digest bytes then the high nibble of byte 7.
  */
case class PosGramHashesExpr(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"graft_posgrams needs n >= 1, got $n")
  override def prettyName: String = "graft_posgrams"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_posgrams requires a string column, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.toString.split("\\s+").filter(_.nonEmpty)
    val count = toks.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val bytes = toks.map(_.getBytes("UTF-8"))
    val space = ' '.toByte
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      var j = 0
      while (j < n) {
        if (j > 0) md.update(space)
        md.update(bytes(i + j))
        j += 1
      }
      val d = md.digest() // returns AND resets
      var v = 0L
      var k = 0
      while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      out(i) = (v << 4) | ((d(7) >> 4) & 0xfL)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PosGramHashesExpr =
    copy(child = newChild)
}

/** Distinct word w-gram shingle HASHES — WordShinglesExpr composed
  * with the 60-bit md5 reduced mod P, one native eval per row:
  * value-identical to `baseHashes(wordShingles(text, w))` =
  * `transform(graft_word_shingles(text, w), s -> pmod(md5Long60(s),
  * P))` (pinned in SketchExprSpec) but with no per-element lambda
  * frame and no intermediate shingle-string array surfacing — the
  * MinHash signature pipelines' base in one pass.
  */
case class ShingleHashesExpr(child: Expression, w: Int)
  extends UnaryExpression with CodegenFallback {
  require(w >= 1, s"graft_shingle_hashes needs w >= 1, got $w")
  override def prettyName: String = "graft_shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes requires a string column, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.toString.split("\\s+").filter(_.nonEmpty)
    val n = toks.length
    // same order-preserving first-occurrence distinct as
    // WordShinglesExpr (order is irrelevant to the min-fold consumer,
    // but the pinned declarative twin preserves it)
    val seen = new mutable.LinkedHashSet[String]
    var i = 0
    val last = math.max(n - w, 0)
    while (i <= last) {
      val end = math.min(i + w, n)
      seen += toks.slice(i, end).mkString(" ")
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](seen.size)
    var j = 0
    seen.foreach { s =>
      val d = md.digest(s.getBytes("UTF-8")) // digest() resets
      var v = 0L
      var k = 0
      while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      out(j) = ((v << 4) | ((d(7) >> 4) & 0xfL)) % TextFunctions.P
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/** Sliding-window co-occurrence pairs — the q110/q113 pair derivation
  * as ONE native eval per row. For each token position i and offset
  * d ∈ [1, win], emits the pair "tk(i) tk(i+d)" (or the
  * lexicographically canonical "min max" when `canonical`), over the
  * tokens surviving `minLen`; `dropSelf` skips equal-word pairs.
  * Positional, NON-distinct — co-occurrence counts occurrences.
  * Value-identical to the nested transform/filter/flatten lambda forms
  * it replaces (pinned in SketchExprSpec), which evaluated one
  * interpreted lambda frame per (position, offset) — the dominant
  * per-task cost of both queries' derivation stages.
  */
case class CoocPairsExpr(child: Expression, win: Int, minLen: Int,
    canonical: Boolean, dropSelf: Boolean)
  extends UnaryExpression with CodegenFallback {
  require(win >= 1, s"graft_cooc_pairs needs win >= 1, got $win")
  override def prettyName: String = "graft_cooc_pairs"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cooc_pairs requires a string column, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    // UTF8String comparisons/lengths throughout: `canonical` must rank
    // exactly like Spark's least/greatest (binary order) and `minLen`
    // like length() (codepoints) — String.compareTo/length (UTF-16
    // units) diverge outside the BMP
    val toks = input.toString.split("\\s+").iterator
      .filter(_.nonEmpty).map(UTF8String.fromString)
      .filter(_.numChars >= minLen).toArray
    val n = toks.length
    val sep = UTF8String.fromString(" ")
    val out = mutable.ArrayBuilder.make[Any]
    var i = 0
    while (i < n - 1) {
      val a = toks(i)
      var d = 1
      while (d <= win && i + d < n) {
        val b = toks(i + d)
        if (!(dropSelf && a.equals(b))) {
          val (x, y) =
            if (canonical && a.compareTo(b) > 0) (b, a) else (a, b)
          out += UTF8String.concat(x, sep, y)
        }
        d += 1
      }
      i += 1
    }
    new GenericArrayData(out.result())
  }

  override protected def withNewChildInternal(newChild: Expression): CoocPairsExpr =
    copy(child = newChild)
}

/** Scalar 60-bit md5 — the engine's one shared primitive hash, native.
  * Value-identical to the declarative
  * `conv(substring(md5(c), 1, 15), 16, 10).cast("long")` (pinned in
  * SketchExprSpec) and to DuckDB's
  * `('0x' || substr(md5(x), 1, 15))::UBIGINT`, but the digest's first
  * 60 bits fold directly from the bytes (7 full bytes + the high
  * nibble of byte 7) — no 32-char hex string, no substring, no base-16
  * string parse per evaluation. The declarative chain allocated three
  * intermediate strings per hash; on the shingle-explode hot paths
  * (q32/q33/q124 signatures, q117's per-occurrence feature hash) that
  * detour was a third of per-task CPU. The UTF8String's bytes feed the
  * digest directly — byte-identical to the UTF-8 encode md5() does.
  */
case class Md5Long60Expr(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "graft_md5_60"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_60 requires a string column, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(input.asInstanceOf[UTF8String].getBytes)
    var v = 0L
    var k = 0
    while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Long60Expr =
    copy(child = newChild)
}
