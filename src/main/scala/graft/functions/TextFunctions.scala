package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the training-data pipeline
  * (tokenize, shingle, hash, MinHash, SimHash, fingerprints).
  *
  * Design constraint: every function here must be *oracle-expressible* —
  * the identical value computable in DuckDB SQL — so the driver's
  * differential gate can hash-compare results. That rules out JVM-only
  * hashes (xxhash64, murmur) on the verified paths; instead we derive
  * 60-bit integers from md5 (identical in every engine) and do all
  * derived hashing in modular arithmetic that never overflows a signed
  * 64-bit int: values are reduced mod P = 2^31-1 before multiplying by
  * seeds < 2^31, keeping products < 2^62.
  *
  * At 100 TB you would swap [[md5Long60]] for `xxhash64` (one fused
  * codegen'd instruction instead of an md5 + string slice) — every
  * consumer below is agnostic to that swap. All functions are
  * `org.apache.spark.sql.functions` compositions: codegen'd, no UDFs,
  * fully columnar (SURVEY.md §"Functions, not UDFs").
  *
  * NULL-input contract: the native expressions (graft_*) are
  * null-propagating — NULL text yields NULL — while the declarative
  * HOF twins yield an EMPTY array (their `when(size(tokens(c)) < n)`
  * guard sees size(NULL) = -1). Every consumer explodes the array,
  * which drops NULL and empty alike, so the divergence is
  * unobservable in query results; SketchExprSpec pins both behaviors
  * explicitly.
  */
object TextFunctions {

  /** Mersenne prime 2^31-1 — modulus for all derived hashing. */
  val P: Long = 2147483647L

  /** Deterministic seed pairs (a_i, b_i) for the i-th hash function
    * h_i(x) = (a_i * (x mod P) + b_i) mod P. Plain odd/even ramps —
    * the exact constants are mirrored into the oracle SQL.
    */
  def seedA(i: Int): Long = 2L * i + 3L
  def seedB(i: Int): Long = 12582917L * (i + 1L) % P

  /** 60-bit integer from the first 15 hex chars of md5 — the one
    * primitive hash shared with the oracle:
    * DuckDB `('0x' || substr(md5(x), 1, 15))::UBIGINT`.
    * Native expression (plans.Md5Long60Expr): folds the digest bytes
    * directly instead of the hex-string/substring/conv detour the
    * declarative form below pays per evaluation.
    */
  def md5Long60(c: Column): Column =
    call_function("graft_md5_60", c)

  /** Declarative form of [[md5Long60]] — the semantics the oracle
    * mirrors; value-identical (SketchExprSpec), slower.
    */
  def md5Long60Hof(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace tokens, empty strings dropped (leading/trailing
    * whitespace would otherwise produce "" entries).
    */
  def tokens(c: Column): Column =
    call_function("graft_tokens", c, lit(0))

  /** Tokens of at least `minLen` codepoints — fuses the common
    * `filter(tokens(c), t => length(t) >= n)` chain into the same
    * native pass (see plans.TokensExpr).
    */
  def tokensMinLen(c: Column, minLen: Int): Column =
    call_function("graft_tokens", c, lit(minLen))

  /** Declarative form of [[tokens]] — the semantics the oracle mirrors
    * (`list_filter(regexp_split_to_array(x, '\\s+'), ...)`);
    * value-identical (SketchExprSpec), slower (one interpreted lambda
    * frame per split element).
    */
  def tokensHof(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  /** Positional word n-grams, NON-distinct (native expression — one
    * eval per row; see plans.WordGramsExpr): one entry per position,
    * empty array below n tokens. The occurrence-counting sibling of
    * [[wordShingles]] for LM/surprisal queries.
    */
  def wordGrams(c: Column, n: Int): Column =
    call_function("graft_word_grams", c, lit(n))

  /** Sliding-window co-occurrence pairs (native expression — one eval
    * per row; see plans.CoocPairsExpr): positional non-distinct
    * "a b" pairs for offsets 1..win over the minLen-filtered tokens;
    * `canonical` orders each pair like least/greatest, `dropSelf`
    * skips equal-word pairs.
    */
  def coocPairs(c: Column, win: Int, minLen: Int, canonical: Boolean,
      dropSelf: Boolean): Column =
    call_function("graft_cooc_pairs", c, lit(win), lit(minLen),
      lit(canonical), lit(dropSelf))

  /** Declarative form of [[wordGrams]] — the semantics the oracle
    * mirrors; value-identical (SketchExprSpec), slower.
    */
  def wordGramsHof(c: Column, n: Int): Column = {
    val tk = tokensHof(c)
    when(size(tk) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(tk) - n + 1),
        i => concat_ws(" ",
          (0 until n).map(j => element_at(tk, i + j)): _*)))
  }

  /** Distinct character n-gram shingles (native expression — one eval
    * per row; see plans.CharShinglesExpr). A text shorter than n
    * yields the single shingle = the text itself (substring clamps).
    */
  def charShingles(c: Column, n: Int): Column =
    call_function("graft_char_shingles", c, lit(n))

  /** Declarative form of [[charShingles]] — the semantics the oracle
    * mirrors; value-identical (SketchExprSpec), slower.
    */
  def charShinglesHof(c: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(c) - (n - 1), lit(1))),
      i => c.substr(i, lit(n))))

  /** Distinct word w-gram shingles joined by a single space (native
    * expression — see plans.WordShinglesExpr).
    */
  def wordShingles(c: Column, w: Int): Column =
    call_function("graft_word_shingles", c, lit(w))

  /** Positional n-gram 60-bit hashes (native expression — see
    * plans.PosGramHashesExpr): element i = md5Long60 of the
    * space-joined tokens i..i+n-1; empty array below n tokens.
    */
  def posGramHashes(c: Column, n: Int): Column =
    call_function("graft_posgrams", c, lit(n))

  /** Declarative form of [[wordShingles]] — the semantics the oracle
    * mirrors; value-identical (SketchExprSpec), slower.
    */
  def wordShinglesHof(c: Column, w: Int): Column = {
    val toks = tokensHof(c)
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - w, lit(0))),
      i => array_join(slice(toks, i + 1, lit(w)), " ")))
  }

  /** All ordered pairs (s1 < s2, packed `s1 << 32 | s2`) over the
    * distinct values of a long-array column (native expression — see
    * plans.SortedPairsExpr): the market-basket pair derivation
    * without a self-join.
    */
  def sortedPairs(c: Column): Column =
    call_function("graft_sorted_pairs", c)

  /** `size(array_intersect(a, b))` over SORTED arrays as one
    * allocation-free zipper merge (native expression — see
    * plans.SortedInterCountExpr). Callers sort each side once
    * (`sort_array`) instead of paying a hash set per evaluated pair.
    */
  def sortedInterCount(a: Column, b: Column): Column =
    call_function("graft_sorted_inter_count", a, b)

  /** Jaccard similarity of two string arrays (assumed distinct).
    * Integer sizes divided as double — bit-identical across engines.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b))).cast("double")
  }

  /** Base hashes of an array of shingles, reduced mod P. */
  def baseHashes(shingleCol: Column): Column =
    transform(shingleCol, s => pmod(md5Long60(s), lit(P)))

  /** Distinct word w-gram shingle hashes reduced mod P — native
    * fusion of `baseHashes(wordShingles(c, w))` (see
    * plans.ShingleHashesExpr); the MinHash pipelines' base in one
    * eval per row, no per-element lambda.
    */
  def shingleHashes(c: Column, w: Int): Column =
    call_function("graft_shingle_hashes", c, lit(w))

  /** MinHash signature (k values) from a *pre-materialized* base-hash
    * array column: minhash_i = min over shingles of (a_i*h + b_i) mod P.
    *
    * The base hashes MUST be their own projection (`.withColumn`)
    * before this is applied: the signature references them k times, and
    * an inlined `baseHashes(...)` would re-run the md5 transform k
    * times per row (CollapseProject keeps a multi-referenced non-cheap
    * alias materialized, which is exactly what we rely on — measured
    * ~8× on the LSH dedup path).
    */
  def minHashFromBase(base: Column, k: Int): Column =
    call_function("graft_minhash", base, lit(k))

  /** Declarative HOF form of [[minHashFromBase]] — the semantics the
    * oracle SQL mirrors literally; value-identical to the codegen'd
    * expression (asserted in SketchExprSpec), ~8× slower.
    */
  def minHashFromBaseHof(base: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(base, h => pmod(h * seedA(i) + seedB(i), lit(P))))
    }: _*)

  /** Convenience single-expression form (inlines the base-hash
    * transform k times — fine for tests, not for the hot path; use
    * baseHashes + minHashFromBase in queries).
    */
  def minHashSignature(shingleCol: Column, k: Int): Column =
    minHashFromBase(baseHashes(shingleCol), k)

  /** LSH band key: minhashes of band `b` (of `r` rows each) joined to a
    * single string. Docs sharing any band key are candidate pairs.
    */
  def bandKey(sig: Column, band: Int, r: Int): Column =
    concat_ws("_", (0 until r).map(j => sig.getItem(band * r + j).cast("string")): _*)

  /** Token hashes mod P — materialize this with `.withColumn` before
    * feeding [[simHashFromHashes]] (same multi-reference rationale as
    * [[minHashFromBase]]: the simhash reads the array 32 times, and an
    * inlined transform would compute 32 md5s per token per row).
    */
  def tokenHashes(tokenCol: Column): Column =
    transform(tokenCol, t => pmod(md5Long60(t), lit(P)))

  /** 32-bit SimHash from a pre-materialized token-hash array: bit b of
    * the result is 1 iff the sum over tokens of (+1 if bit b of
    * h(token) else -1) > 0. Duplicate tokens intentionally count with
    * multiplicity (standard SimHash weighting by term frequency).
    */
  def simHashFromHashes(hashes: Column): Column =
    call_function("graft_simhash", hashes)

  /** Declarative HOF form of [[simHashFromHashes]] — the semantics the
    * oracle SQL mirrors literally; value-identical to the codegen'd
    * expression (asserted in SketchExprSpec), ~30× slower (32
    * interpreted folds per row).
    */
  def simHashFromHashesHof(hashes: Column): Column = {
    val bitSums = (0 until 32).map { b =>
      aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
    }
    bitSums.zipWithIndex.map { case (s, b) =>
      when(s > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** Convenience single-expression form (see [[simHashFromHashes]]). */
  def simHash32(tokenCol: Column): Column =
    simHashFromHashes(tokenHashes(tokenCol))

  /** Hamming distance between two 32-bit simhashes. */
  def hamming32(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Polynomial rolling-hash fingerprint over the characters of a
    * string: fold acc = (acc*31 + ascii(char)) mod P. Left fold in
    * array order — the oracle replicates it with list_reduce.
    */
  def rollingFingerprint(c: Column): Column =
    when(length(c) === 0, lit(7L)).otherwise(
      aggregate(
        // index walk, not split-on-"": Spark's sequence(1,0) would run
        // descending on empty input and split semantics differ per
        // engine; substr-by-index is identical everywhere
        transform(sequence(lit(1), length(c)), i => ascii(c.substr(i, lit(1))).cast("long")),
        lit(7L),
        (acc, ch) => pmod(acc * 31L + ch, lit(P))))

  /** "BPE-ish" subword token count: runs of letters, runs of digits,
    * and single other non-space chars each count as one token.
    */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Per-language stopword lists for the n-gram language-ID heuristic.
    * Tiny, deterministic, shared with the oracle SQL verbatim.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una"),
    "zh" -> Seq("de", "shi", "le", "zai", "he", "you", "wo"),
  )

  /** Predicted language = argmax over stopword-hit counts; ties go to
    * the earliest language in [[stopwords]] order; zero hits → "und".
    * Native expression (plans.LangIdExpr — one lowercase + one token
    * scan per row); [[langIdHof]] is the declarative twin the oracle
    * SQL mirrors as a CASE chain, value-pinned in SketchExprSpec.
    */
  def langId(c: Column): Column =
    call_function("graft_lang_id", c)

  /** Declarative form of [[langId]] — the semantics the oracle
    * mirrors; value-identical (SketchExprSpec), ~10× slower (five
    * interpreted filter-HOFs per row, each re-tokenizing).
    */
  def langIdHof(c: Column): Column = {
    val toks = tokensHof(lower(c))
    val hits = stopwords.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words.map(lit): _*)))
    }
    val maxHits = greatest(hits.map(_._2): _*)
    hits.foldLeft(when(maxHits <= 0, lit("und"))) {
      case (acc, (lang, h)) => acc.when(h === maxHits, lit(lang))
    }.otherwise(lit("und"))
  }

  /** Composite quality score in [0,1]: mean of four bounded signals —
    * length ratio (chars/500 capped), alpha ratio, stopword ratio
    * (capped at 5x), and short-token penalty. All arithmetic is
    * integer-derived doubles: bit-identical across engines. Native
    * expression (plans.QualityScoreExpr — the four raw signals in one
    * pass each, identical IEEE arithmetic); [[qualityScoreHof]] is the
    * declarative twin the oracle mirrors, value-pinned in
    * SketchExprSpec.
    */
  def qualityScore(c: Column): Column =
    call_function("graft_quality_score", c)

  /** Declarative form of [[qualityScore]] — the semantics the oracle
    * mirrors term-for-term; value-identical (SketchExprSpec), slower
    * (a regexp_replace string build + an interpreted filter-HOF per
    * row).
    */
  def qualityScoreHof(c: Column): Column = {
    val nChars = length(c).cast("double")
    val toks = tokensHof(c)
    val nToks = size(toks).cast("double")
    val alpha = length(regexp_replace(c, "[^A-Za-z]", "")).cast("double")
    val allStop = stopwords.flatMap(_._2).distinct.sorted
    val stopHits = size(filter(tokensHof(lower(c)),
      t => t.isin(allStop.map(lit): _*))).cast("double")
    val lenScore = least(nChars / 500.0d, lit(1.0d))
    val alphaScore = when(nChars > 0, alpha / nChars).otherwise(lit(0.0d))
    val stopScore = when(nToks > 0, least(stopHits * 5.0d / nToks, lit(1.0d))).otherwise(lit(0.0d))
    val wordLen = when(nToks > 0, alpha / nToks).otherwise(lit(0.0d))
    val wordScore = least(wordLen / 8.0d, lit(1.0d))
    (lenScore + alphaScore + stopScore + wordScore) / 4.0d
  }
}
