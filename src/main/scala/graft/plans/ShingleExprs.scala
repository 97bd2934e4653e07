package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextFunctions

/** Shared per-thread evaluation kernels for the native text/hash
  * expressions below. Two jobs:
  *
  *   - ONE MessageDigest per thread (`digest()` resets it), where the
  *     r14 expressions paid `MessageDigest.getInstance` per evaluation
  *     on the scalar-hash hot paths (q117 hashes one feature per
  *     exploded occurrence; q32/q131/q135 one digest per row) — the
  *     provider lookup + object allocation was measurable against the
  *     ~100 ns of actual MD5 work per short input.
  *   - static entry points the expressions' `doGenCode` can splice
  *     into whole-stage-generated Java, replacing the r14
  *     CodegenFallback path (per-row boxed `eval(InternalRow)` through
  *     the fallback shim). The interpreted `nullSafeEval` calls the
  *     SAME methods, so both execution modes share one body and the
  *     SketchExprSpec value-identity pins cover both.
  *
  * Thread safety: tasks run one partition per thread; the ThreadLocal
  * digest is never shared across rows of different threads.
  */
object ShingleEval {
  private val md5tl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** The engine's 60-bit digest fold: 7 full bytes then the high
    * nibble of byte 7 — `('0x' || substr(md5(x),1,15))::UBIGINT`.
    */
  private def fold60(d: Array[Byte]): Long = {
    var v = 0L
    var k = 0
    while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  def md5Long60(s: UTF8String): Long =
    fold60(md5tl.get().digest(s.getBytes)) // digest() resets

  def wordShingles(s: UTF8String, w: Int): ArrayData = {
    val toks = s.toString.split("\\s+").filter(_.nonEmpty)
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
    new GenericArrayData(
      out.iterator.map(UTF8String.fromString).toArray[Any])
  }

  def charShingles(s0: UTF8String, n: Int): ArrayData = {
    val s = s0.toString
    val len = s.length
    val out = new mutable.LinkedHashSet[String]
    val last = math.max(len - (n - 1), 1)
    var i = 1
    while (i <= last) {
      out += s.substring(i - 1, math.min(i - 1 + n, len))
      i += 1
    }
    new GenericArrayData(
      out.iterator.map(UTF8String.fromString).toArray[Any])
  }

  def wordGrams(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.split("\\s+").filter(_.nonEmpty)
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

  def posGramHashes(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.split("\\s+").filter(_.nonEmpty)
    val count = toks.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val bytes = toks.map(_.getBytes("UTF-8"))
    val space = ' '.toByte
    val md = md5tl.get()
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      var j = 0
      while (j < n) {
        if (j > 0) md.update(space)
        md.update(bytes(i + j))
        j += 1
      }
      out(i) = fold60(md.digest()) // returns AND resets
      i += 1
    }
    new GenericArrayData(out)
  }

  def shingleHashes(s: UTF8String, w: Int): ArrayData = {
    val toks = s.toString.split("\\s+").filter(_.nonEmpty)
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
    val md = md5tl.get()
    val out = new Array[Any](seen.size)
    var j = 0
    seen.foreach { sh =>
      out(j) = fold60(md.digest(sh.getBytes("UTF-8"))) % TextFunctions.P
      j += 1
    }
    new GenericArrayData(out)
  }

  def sortedPairs(input: ArrayData): ArrayData = {
    val xs = input.toLongArray()
    java.util.Arrays.sort(xs)
    // dedup equal neighbors so the contract is "all x < y pairs over
    // the DISTINCT values" — exactly the self-join-on-key + (a < b)
    // pair set it replaces — even if a caller ever feeds duplicates
    var n = 0
    var i = 0
    while (i < xs.length) {
      if (n == 0 || xs(i) != xs(n - 1)) { xs(n) = xs(i); n += 1 }
      i += 1
    }
    require(n == 0 || (xs(0) >= 0L && xs(n - 1) < (1L << 31)),
      s"graft_sorted_pairs packs each pair into one long: values must " +
        s"be in [0, 2^31), got [${xs(0)}, ${xs(n - 1)}]")
    val out = new Array[Long](n * (n - 1) / 2)
    var idx = 0
    i = 0
    while (i < n - 1) {
      val hi = xs(i) << 32
      var j = i + 1
      while (j < n) {
        out(idx) = hi | xs(j)
        idx += 1
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  def sortedInterCountStr(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    var lastMatch: UTF8String = null
    while (i < na && j < nb) {
      val x = a.getUTF8String(i)
      val y = b.getUTF8String(j)
      val c = x.compareTo(y)
      if (c < 0) i += 1
      else if (c > 0) j += 1
      else {
        // count each common value once even if an input repeats it —
        // array_intersect set semantics
        if (lastMatch == null || !lastMatch.equals(x)) { n += 1; lastMatch = x }
        i += 1
        j += 1
      }
    }
    n
  }

  def sortedInterCountLong(a: ArrayData, b: ArrayData): Long = {
    val xs = a.toLongArray()
    val ys = b.toLongArray()
    var i = 0
    var j = 0
    var n = 0L
    var last = 0L
    var any = false
    while (i < xs.length && j < ys.length) {
      val x = xs(i)
      val y = ys(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        if (!any || last != x) { n += 1; last = x; any = true }
        i += 1
        j += 1
      }
    }
    n
  }

  // --- language-ID / quality-score kernels ------------------------
  // The stopword tables mirror TextFunctions.stopwords exactly; the
  // token → language-hit lookup is one shared immutable map built once.
  private val langNames: Array[UTF8String] =
    TextFunctions.stopwords.map(p => UTF8String.fromString(p._1)).toArray
  private val nLangs = langNames.length
  private val und = UTF8String.fromString("und")
  private val stopLangsByWord: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    TextFunctions.stopwords.zipWithIndex.foreach { case ((_, ws), i) =>
      ws.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }
  private val allStopWords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TextFunctions.stopwords.foreach(_._2.foreach(s.add))
    s
  }

  /** Whitespace-token iteration without materializing the array:
    * tokens(c) ≡ split("\\s+") with empties dropped ≡ the maximal runs
    * of non-[ \t\n\f\r] characters (Java regex \s is ASCII-only).
    */
  private def foreachToken(s: String)(f: String => Unit): Int = {
    val len = s.length
    var i = 0
    var n = 0
    while (i < len) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
          c == '\f' || c == '\r') i += 1
      else {
        val start = i
        while (i < len && {
          val d = s.charAt(i)
          !(d == ' ' || d == '\t' || d == '\n' || d == '\u000B' ||
            d == '\f' || d == '\r')
        }) i += 1
        n += 1
        if (f != null) f(s.substring(start, i))
      }
    }
    n
  }

  def tokens(input: UTF8String, minLen: Int): ArrayData = {
    val s = input.toString
    val out = mutable.ArrayBuilder.make[Any]
    foreachToken(s) { t =>
      val u = UTF8String.fromString(t)
      if (minLen <= 0 || u.numChars >= minLen) out += u
    }
    new GenericArrayData(out.result())
  }

  def langId(input: UTF8String): UTF8String = {
    val lowered = input.toLowerCase.toString
    val hits = new Array[Int](nLangs)
    foreachToken(lowered) { t =>
      val langs = stopLangsByWord.get(t)
      if (langs != null) {
        var j = 0
        while (j < langs.length) { hits(langs(j)) += 1; j += 1 }
      }
    }
    var mx = 0
    var i = 0
    while (i < nLangs) { if (hits(i) > mx) mx = hits(i); i += 1 }
    if (mx <= 0) return und
    i = 0
    while (i < nLangs && hits(i) != mx) i += 1
    langNames(i)
  }

  def qualityScore(input: UTF8String): Double = {
    val nChars = input.numChars.toDouble // length() counts code points
    // alpha ≡ length(regexp_replace(c, "[^A-Za-z]", "")): ASCII-letter
    // bytes never occur inside a multi-byte UTF-8 sequence, so the
    // surviving codepoint count is a byte scan
    val bytes = input.getBytes
    var alphaI = 0
    var k = 0
    while (k < bytes.length) {
      val b = bytes(k)
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) alphaI += 1
      k += 1
    }
    val alpha = alphaI.toDouble
    // token count over the ORIGINAL text (lowercasing never introduces
    // whitespace, but mirror the declarative term exactly); stop hits
    // over the LOWERED tokens — both as in TextFunctions.qualityScore
    val nToks = foreachToken(input.toString)(null).toDouble
    var stopI = 0
    foreachToken(input.toLowerCase.toString) { t =>
      if (allStopWords.contains(t)) stopI += 1
    }
    val stopHits = stopI.toDouble
    // identical IEEE operations in identical order to the declarative
    // form (all inputs are integer-derived doubles)
    val lenScore = math.min(nChars / 500.0d, 1.0d)
    val alphaScore = if (nChars > 0) alpha / nChars else 0.0d
    val stopScore =
      if (nToks > 0) math.min(stopHits * 5.0d / nToks, 1.0d) else 0.0d
    val wordLen = if (nToks > 0) alpha / nToks else 0.0d
    val wordScore = math.min(wordLen / 8.0d, 1.0d)
    (lenScore + alphaScore + stopScore + wordScore) / 4.0d
  }

  def coocPairs(input: UTF8String, win: Int, minLen: Int,
      canonical: Boolean, dropSelf: Boolean): ArrayData = {
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
}

/** Native shingle builders. The declarative forms
  * (TextFunctions.wordShinglesHof / charShinglesHof — sequence +
  * transform + array_join/substr + array_distinct) evaluate one
  * interpreted lambda frame per shingle, which measured ~1.3 ms/doc on
  * the corpus; these do one eval call per row into a tight Scala loop,
  * and (r15) splice that call DIRECTLY into whole-stage-generated code
  * via `doGenCode` — the r14 CodegenFallback shim boxed every row
  * through `eval(InternalRow)`.
  *
  * Semantics are pinned to the declarative forms (SketchExprSpec):
  * order-preserving first-occurrence distinct; word mode joins
  * `slice(tokens, i+1, w)` (a short tail never gains a separator) and
  * yields the single shingle joined-from-whatever-exists when there
  * are fewer than w tokens (including "" for zero tokens); char mode
  * substrings clamp, and a text shorter than n yields itself.
  */
abstract class ShinglesExprBase extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got $other")
  }
}

/** Distinct word w-gram shingles joined by single spaces —
  * value-identical to TextFunctions.wordShinglesHof.
  */
case class WordShinglesExpr(child: Expression, w: Int) extends ShinglesExprBase {
  override def prettyName: String = "graft_word_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleEval.wordShingles(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleEval.wordShingles($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}

/** Distinct character n-gram shingles — value-identical to
  * TextFunctions.charShinglesHof (substring clamps; text shorter than
  * n yields the single shingle = the text itself).
  */
case class CharShinglesExpr(child: Expression, n: Int) extends ShinglesExprBase {
  override def prettyName: String = "graft_char_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleEval.charShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleEval.charShingles($c, $n)")

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
  extends UnaryExpression {
  require(n >= 1, s"graft_word_grams needs n >= 1, got $n")
  override def prettyName: String = "graft_word_grams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_word_grams requires a string column, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleEval.wordGrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleEval.wordGrams($c, $n)")

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
  extends UnaryExpression {
  require(n >= 1, s"graft_posgrams needs n >= 1, got $n")
  override def prettyName: String = "graft_posgrams"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_posgrams requires a string column, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleEval.posGramHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleEval.posGramHashes($c, $n)")

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
  extends UnaryExpression {
  require(w >= 1, s"graft_shingle_hashes needs w >= 1, got $w")
  override def prettyName: String = "graft_shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes requires a string column, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleEval.shingleHashes(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleEval.shingleHashes($c, $w)")

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
  extends UnaryExpression {
  require(win >= 1, s"graft_cooc_pairs needs win >= 1, got $win")
  override def prettyName: String = "graft_cooc_pairs"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cooc_pairs requires a string column, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleEval.coocPairs(input.asInstanceOf[UTF8String], win, minLen,
      canonical, dropSelf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.ShingleEval.coocPairs($c, $win, $minLen, $canonical, $dropSelf)")

  override protected def withNewChildInternal(newChild: Expression): CoocPairsExpr =
    copy(child = newChild)
}

/** `size(array_intersect(a, b))` for SORTED arrays, as one zipper
  * merge — the exact-Jaccard verification kernel (q32/q131/q135/q124
  * candidate pairs). `array_intersect` builds a hash set per
  * evaluation; with |candidates| ≫ |docs| that per-PAIR allocation
  * dominated the verify stage, where this merge does one ordered pass
  * with zero allocation. Value-identical to the set-semantics count
  * (each common distinct value counts once, duplicates skipped) —
  * sorting is a per-DOC cost paid once upstream (`sort_array`;
  * UTF8String binary order, exactly sort_array's). Inputs MUST be
  * sorted ascending; both array<string> and array<bigint> are
  * supported.
  */
case class SortedInterCountExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "graft_sorted_inter_count"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_sorted_inter_count requires two sorted array<string> or " +
          s"array<bigint> columns, got $other")
    }
  private def isString: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == StringType

  override def nullSafeEval(a: Any, b: Any): Any =
    if (isString)
      ShingleEval.sortedInterCountStr(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      ShingleEval.sortedInterCountLong(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (isString) "sortedInterCountStr" else "sortedInterCountLong"
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.ShingleEval.$m($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedInterCountExpr =
    copy(left = newLeft, right = newRight)
}

/** All ordered pairs (s1 < s2) over the DISTINCT values of a long
  * array, each PACKED as one long `s1 << 32 | s2`, as one native eval
  * per row — the market-basket pair derivation (q120) without the
  * self-join: `explode(graft_sorted_pairs(collect_set(item)))` emits
  * exactly the pair multiset that `capped a JOIN capped b ON
  * a.key = b.key AND a.item < b.item` produced, but the basket never
  * leaves its row — no join-side shuffles, no sort-merge machinery,
  * and the C(k,2) expansion happens in the same whole-stage-generated
  * pass that feeds the pair aggregate's map-side combine. The packed
  * single-long key halves the shuffled pair row and keeps the
  * aggregate on the primitive fast path (UnsafeArrayData out — no
  * boxing, no per-pair struct allocation); values must fit [0, 2^31)
  * (enforced per row — ids up to ~2.1 billion, an order of magnitude
  * past the 100 TB key space). Unpack with `shiftright(pk, 32)` /
  * `pk & 0xFFFFFFFF`. Input order is irrelevant (sorted internally),
  * so a `collect_set`'s nondeterministic element order cannot leak
  * into results.
  */
case class SortedPairsExpr(child: Expression)
  extends UnaryExpression {
  override def prettyName: String = "graft_sorted_pairs"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_sorted_pairs requires an array<bigint> column without " +
        s"null elements, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleEval.sortedPairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleEval.sortedPairs($c)")

  override protected def withNewChildInternal(newChild: Expression): SortedPairsExpr =
    copy(child = newChild)
}

/** Whitespace tokens as ONE native eval per row — value-identical to
  * `filter(split(c, "\\s+"), t => t =!= "")` (pinned in
  * SketchExprSpec): the maximal runs of non-\s characters (Java regex
  * \s is the six ASCII separators), optionally dropping tokens shorter
  * than `minLen` codepoints (≡ a chained `filter(_, length(t) >= n)`).
  * The declarative form paid a regex split plus ONE INTERPRETED
  * filter-HOF lambda frame PER TOKEN on every tokens() call site —
  * the single most widely-paid per-row cost in the engine.
  */
case class TokensExpr(child: Expression, minLen: Int)
  extends UnaryExpression {
  require(minLen >= 0, s"graft_tokens needs minLen >= 0, got $minLen")
  override def prettyName: String = "graft_tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_tokens requires a string column, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleEval.tokens(input.asInstanceOf[UTF8String], minLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleEval.tokens($c, $minLen)")

  override protected def withNewChildInternal(newChild: Expression): TokensExpr =
    copy(child = newChild)
}

/** Stopword-argmax language ID as ONE native eval per row —
  * value-identical to TextFunctions.langIdHof (pinned in
  * SketchExprSpec): tokens of the lowercased text, per-language
  * stopword hit counts, argmax with ties to the earliest language in
  * stopwords order, "und" when no stopword hits. The declarative form
  * evaluated FIVE interpreted filter-HOFs per row — each with its own
  * tokenize — twice over (once in the greatest(), once per CASE arm):
  * ~150 µs/doc, the whole cost of q20/q154's scoring stage. Here:
  * one lowercase, one token scan, one hash probe per token.
  */
case class LangIdExpr(child: Expression)
  extends UnaryExpression {
  override def prettyName: String = "graft_lang_id"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lang_id requires a string column, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleEval.langId(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleEval.langId($c)")

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

/** Composite quality score as ONE native eval per row —
  * value-identical to TextFunctions.qualityScoreHof (pinned in
  * SketchExprSpec): the four raw signals (codepoint length,
  * ASCII-letter count, whitespace-token count, stopword hits over the
  * lowered tokens) from one pass each, then the identical IEEE double
  * arithmetic in the identical order. The declarative form paid a
  * regexp_replace string build plus an interpreted filter-HOF (with
  * its own tokenize) per row — the dominant cost of every
  * qualityScore consumer's scoring stage (q137/q197/q200).
  */
case class QualityScoreExpr(child: Expression)
  extends UnaryExpression {
  override def prettyName: String = "graft_quality_score"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_quality_score requires a string column, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleEval.qualityScore(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleEval.qualityScore($c)")

  override protected def withNewChildInternal(newChild: Expression): QualityScoreExpr =
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
  * One thread-local digest per executor thread (r15) — the r14 form
  * paid a `MessageDigest.getInstance` provider lookup per row.
  */
case class Md5Long60Expr(child: Expression)
  extends UnaryExpression {
  override def prettyName: String = "graft_md5_60"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_60 requires a string column, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleEval.md5Long60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleEval.md5Long60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long60Expr =
    copy(child = newChild)
}
