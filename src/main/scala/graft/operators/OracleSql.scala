package graft.operators

import graft.functions.TextFunctions

/** DuckDB SQL fragments that mirror graft.functions exactly — the same
  * md5-derived hashing, the same left folds, the same modular
  * arithmetic — so every derived value hash-compares bit-identically.
  */
object OracleSql {
  /** 60-bit md5 hash — mirrors TextFunctions.md5Long60. */
  def md5Long60(x: String): String =
    s"(('0x' || substr(md5($x), 1, 15))::UBIGINT)::BIGINT"

  /** Whitespace tokens, empties dropped — mirrors TextFunctions.tokens. */
  def tokens(x: String): String =
    s"list_filter(regexp_split_to_array($x, '\\s+'), t -> t != '')"

  /** Distinct char n-grams — mirrors TextFunctions.charShingles. */
  def charShingles(x: String, n: Int): String =
    s"list_distinct(list_transform(generate_series(1, greatest(len($x) - ${n - 1}, 1)), i -> substr($x, i, $n)))"

  /** Distinct word w-grams — mirrors TextFunctions.wordShingles
    * (array_join over a slice, so a short tail never gains a trailing
    * separator).
    */
  def wordShingles(toksExpr: String, w: Int): String =
    s"list_distinct(list_transform(generate_series(0, greatest(len($toksExpr) - $w, 0)), " +
      s"i -> array_to_string(list_slice($toksExpr, i + 1, i + $w), ' ')))"

  /** Jaccard of two distinct-element lists — mirrors TextFunctions.jaccard. */
  def jaccard(a: String, b: String): String =
    s"(len(list_intersect($a, $b))::DOUBLE / (len($a) + len($b) - len(list_intersect($a, $b)))::DOUBLE)"

  /** Base hashes mod P — mirrors TextFunctions.baseHashes. */
  def baseHashes(shingles: String): String =
    s"list_transform($shingles, s -> ${md5Long60("s")} % ${TextFunctions.P})"

  /** MinHash signature as a k-element list — mirrors minHashSignature. */
  def minHashSignature(baseExpr: String, k: Int): String = {
    val mins = (0 until k).map { i =>
      s"list_min(list_transform($baseExpr, h -> (h * ${TextFunctions.seedA(i)} + ${TextFunctions.seedB(i)}) % ${TextFunctions.P}))"
    }
    mins.mkString("[", ", ", "]")
  }

  /** Strict left-fold dot product — mirrors VectorFunctions.dotFold. */
  def dotFold(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(list_zip($a, $b), " +
      s"p -> p[1]::DOUBLE * p[2]::DOUBLE)), (acc, x) -> acc + x)"

  /** Squared-L2 distance over a 1-based inclusive slice
    * `[start, start+len-1]` of two vectors, in the expanded form
    * `ssq(a) + ssq(b) − 2·dot(a,b)` with every term the same strict
    * left fold as graft_dot — mirrors the subspace distance in
    * VectorQueries.q86AnnIvfPq term for term (the expansion keeps the
    * Spark side inside whole-stage codegen).
    */
  def l2SubFold(a: String, b: String, start: Int, len: Int): String = {
    val end = start + len - 1
    val as = s"$a[$start:$end]"
    val bs = s"$b[$start:$end]"
    s"(${dotFold(as, as)} + ${dotFold(bs, bs)} - 2.0 * ${dotFold(as, bs)})"
  }

  /** Hyperplane component — mirrors VectorFunctions.planeComponent. */
  def planeComponent(p: Int, i: String): String =
    s"((${md5Long60(s"'${p}_' || ($i)::VARCHAR")} % 2001 - 1000)::DOUBLE / 1000.0)"

  /** Projection of a vector onto hyperplane `p` (the signed margin) —
    * the same left fold graft_dot uses, so doubles match bit-for-bit.
    */
  def hyperplaneProjection(v: String, p: Int): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(" +
      s"list_zip($v, generate_series(0, len($v) - 1)), " +
      s"p -> p[1]::DOUBLE * ${planeComponent(p, "p[2]")})), (acc, x) -> acc + x)"

  /** Hyperplane LSH signature — mirrors hyperplaneSignature. */
  def hyperplaneSignature(v: String, planes: Int): String =
    (0 until planes).map { p =>
      s"(CASE WHEN ${hyperplaneProjection(v, p)} > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Fix-point micro vector floor(x·2^20) — mirrors AnnStore.microCol
    * (float→double, power-of-two multiply, floor: all exact).
    */
  def microVec(v: String): String =
    s"list_transform($v, x -> floor(x::DOUBLE * ${graft.rag.AnnStore.ScaleBits})::BIGINT)"

  /** Integer IVF assignment score ssq(c) − 2·dot(m, c) — mirrors
    * AnnStore.scoresCol's per-centroid fold (pure BIGINT, no float
    * reduction anywhere).
    */
  def annScore(m: String, c: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(list_zip($m, $c), " +
      s"p -> p[2]*p[2] - 2*p[1]*p[2])), (acc, x) -> acc + x)"

  /** The deterministic exact-integer IVF quantizer (AnnStore: lowest-id
    * seeds → one Lloyd refinement with truncating integer-mean
    * centroids → final argmin assignment) as a WITH-fragment over
    * `embeddings`. Exposes:
    *   fx(vec_id, embedding, m)   — fix-pointed corpus
    *   ann_cent(list_id, c)       — refined centroids (empty keep seed)
    *   ann_asg(vec_id, list_id)   — final assignment (ties → lowest)
    * Splice after WITH and before the query's own CTEs.
    */
  def annQuantizerCtes(lists: Int): String = {
    val score0 = annScore("f.m", "s.c")
    val score1 = annScore("f.m", "c.c")
    s"""fx AS (SELECT vec_id, embedding, label, ${microVec("embedding")} AS m
       |  FROM embeddings),
       |ann_seeds AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS list_id, m AS c
       |  FROM (SELECT vec_id, m FROM fx ORDER BY vec_id LIMIT $lists)),
       |ann_a0 AS (
       |  SELECT vec_id, m, list_id FROM (
       |    SELECT f.vec_id, f.m, s.list_id,
       |      ROW_NUMBER() OVER (PARTITION BY f.vec_id
       |        ORDER BY $score0, s.list_id) AS rn
       |    FROM fx f CROSS JOIN ann_seeds s) WHERE rn = 1),
       |ann_cm AS (
       |  SELECT list_id, u.i AS pos, (SUM(m[u.i]) // COUNT(*))::BIGINT AS cv
       |  FROM ann_a0, UNNEST(generate_series(1, len(m))) AS u(i)
       |  GROUP BY 1, 2),
       |ann_cent1 AS (
       |  SELECT list_id, list(cv ORDER BY pos) AS c FROM ann_cm GROUP BY 1),
       |ann_cent AS (
       |  SELECT s.list_id, COALESCE(c1.c, s.c) AS c
       |  FROM ann_seeds s LEFT JOIN ann_cent1 c1 USING (list_id)),
       |ann_asg AS (
       |  SELECT vec_id, list_id FROM (
       |    SELECT f.vec_id, c.list_id,
       |      ROW_NUMBER() OVER (PARTITION BY f.vec_id
       |        ORDER BY $score1, c.list_id) AS rn
       |    FROM fx f CROSS JOIN ann_cent c) WHERE rn = 1)""".stripMargin
  }

  /** 32-bit SimHash over a token list — mirrors simHash32. Bit sums are
    * order-independent integers, so list_sum is safe here.
    */
  def simHash32(toksExpr: String): String = {
    val hashes = s"list_transform($toksExpr, t -> ${md5Long60("t")} % ${TextFunctions.P})"
    (0 until 32).map { b =>
      s"(CASE WHEN list_sum(list_transform($hashes, h -> CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** Rolling fingerprint left fold — mirrors rollingFingerprint. */
  def rollingFingerprint(x: String): String =
    s"list_reduce(list_prepend(7::BIGINT, list_transform(" +
      s"generate_series(1, len($x)), " +
      s"i -> ascii(substr($x, i, 1))::BIGINT)), (acc, c) -> (acc * 31 + c) % ${TextFunctions.P})"

  /** BPE-ish token count — mirrors bpeTokenCount. */
  def bpeTokenCount(x: String): String =
    s"len(regexp_extract_all($x, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))"

  /** Stopword hit count for one language over a token list. */
  def stopHits(toksExpr: String, words: Seq[String]): String =
    s"len(list_filter($toksExpr, t -> list_contains(${words.map(w => s"'$w'").mkString("[", ", ", "]")}, t)))"

  /** Language-ID CASE chain — mirrors langId (first-match-wins). */
  def langId(x: String): String = {
    val toks = tokens(s"lower($x)")
    val hits = TextFunctions.stopwords.map { case (lang, ws) => lang -> stopHits(toks, ws) }
    val maxHits = s"greatest(${hits.map(_._2).mkString(", ")})"
    val whens = hits.map { case (lang, h) => s"WHEN $h = $maxHits THEN '$lang'" }
    s"(CASE WHEN $maxHits <= 0 THEN 'und' ${whens.mkString(" ")} ELSE 'und' END)"
  }

  /** Quality score — mirrors qualityScore term-for-term. */
  def qualityScore(x: String): String = {
    val nChars = s"len($x)::DOUBLE"
    val toks = tokens(x)
    val nToks = s"len($toks)::DOUBLE"
    val alpha = s"len(regexp_replace($x, '[^A-Za-z]', '', 'g'))::DOUBLE"
    val allStop = TextFunctions.stopwords.flatMap(_._2).distinct.sorted
    val stopHitsE = stopHits(tokens(s"lower($x)"), allStop) + "::DOUBLE"
    val lenScore = s"least($nChars / 500.0, 1.0)"
    val alphaScore = s"(CASE WHEN $nChars > 0 THEN $alpha / $nChars ELSE 0.0 END)"
    val stopScore = s"(CASE WHEN $nToks > 0 THEN least($stopHitsE * 5.0 / $nToks, 1.0) ELSE 0.0 END)"
    val wordScore = s"least((CASE WHEN $nToks > 0 THEN $alpha / $nToks ELSE 0.0 END) / 8.0, 1.0)"
    s"(($lenScore + $alphaScore + $stopScore + $wordScore) / 4.0)"
  }
}
