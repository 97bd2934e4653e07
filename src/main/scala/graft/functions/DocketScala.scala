package graft.functions

import java.security.MessageDigest

/** Pure-Scala (driver/executor-agnostic) docket functions: the party
  * parser, the chunker, canonical-JSON hashing, and the deterministic
  * hashing embedder. These are the reference behaviors that are
  * genuinely per-record imperative (regex section walks, stateful
  * chunk loops) — exposed as UDFs by the ingest/rag jobs, and unit
  * tested directly against the reference's documented examples.
  *
  * Reference: /root/reference/ingest.py:352-403 (parse_parties),
  * rag.py:44-69 (chunk_text), ingest.py:42-49 (canonical_json /
  * sha256_hex), rag.py:26-42 (embedding contract: unit-normalized
  * float vector).
  */
object DocketScala {

  /** One parsed party occurrence. */
  final case class Party(name: String, role: String)

  private val roleRe =
    "(?i)\\((plaintiff|defendant|plaintiffs|defendants|third_party|intervenor|other)\\)".r
  private val parenRe = "\\([^)]+\\)".r

  /** Party-string parser (ingest.py:352-403).
    *
    * Semantics preserved exactly:
    *   - major sections split on `;` and `/` only — `|` is NOT a
    *     separator (ingest.py:370): pipe-joined names stay glued
    *     together and inherit the section's first role;
    *   - the FIRST parenthesized role word found anywhere in a section
    *     applies to every comma-separated name in it; plural roles are
    *     singularized (`defendants` → `defendant`);
    *   - when a role matched, ALL parentheticals are stripped before
    *     splitting names; when no role matched, parentheticals are
    *     left in place (quirk: `"Acme Corp (observer)"` yields the
    *     name `"Acme Corp (observer)"` with role `other`);
    *   - blank sections/names are dropped.
    */
  def parseParties(partiesStr: String): Seq[Party] = {
    if (partiesStr == null || partiesStr.isEmpty) return Seq.empty
    partiesStr.split("[;/]", -1).toIndexedSeq.flatMap { rawSection =>
      val section = rawSection.trim
      if (section.isEmpty) Seq.empty[Party]
      else roleRe.findFirstMatchIn(section) match {
        case Some(m) =>
          val role0 = m.group(1).toLowerCase
          val role = if (role0.endsWith("s")) role0.dropRight(1) else role0
          val cleaned = parenRe.replaceAllIn(section, "").trim
          cleaned.split(",", -1).toIndexedSeq
            .map(_.trim).filter(_.nonEmpty).map(Party(_, role))
        case None =>
          section.split(",", -1).toIndexedSeq
            .map(_.trim).filter(_.nonEmpty).map(Party(_, "other"))
      }
    }
  }

  /** One text chunk. */
  final case class Chunk(chunkId: Int, text: String)

  /** Overlapping character chunker (rag.py:44-69).
    *
    * Exact loop semantics: `size` floored at 1, `overlap` clamped to
    * [0, size-1]; window [i, i+size); chunks stripped, empty chunks
    * skipped with ids staying dense; loop ends when a window reached
    * the end of the string; empty input → no chunks.
    */
  def chunkText(s: String, size: Int = 1200, overlap: Int = 200): Seq[Chunk] = {
    if (s == null || s.isEmpty) return Seq.empty
    val sz = math.max(1, size)
    val ov = math.max(0, math.min(overlap, sz - 1))
    val n = s.length
    val out = Seq.newBuilder[Chunk]
    var i = 0
    var cid = 0
    var done = false
    while (!done && i < n) {
      val end = math.min(n, i + sz)
      val chunk = s.substring(i, end).trim
      if (chunk.nonEmpty) { out += Chunk(cid, chunk); cid += 1 }
      if (end == n) done = true else i = end - ov
    }
    out.result()
  }

  /** Canonical JSON of a string-valued record: sorted keys, compact
    * `,`/`:` separators, raw (non-ASCII-escaped) text — byte-identical
    * to the reference's `json.dumps(obj, ensure_ascii=False,
    * separators=(",", ":"), sort_keys=True)` (ingest.py:42-44) for
    * flat string/null records, which is the only shape the reference
    * hashes. Null values serialize as JSON `null`.
    */
  def canonicalJson(fields: Seq[(String, String)]): String =
    fields.sortBy(_._1).map { case (k, v) =>
      val vs = if (v == null) "null" else "\"" + escapeJson(v) + "\""
      "\"" + escapeJson(k) + "\":" + vs
    }.mkString("{", ",", "}")

  private def escapeJson(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** SHA-256 hex of a UTF-8 string (ingest.py:47-49). */
  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** Deterministic hashing embedder: whitespace-tokenize, hash each
    * token into one of `dim` buckets (md5-derived, engine-agnostic),
    * count, then L2-normalize. A drop-in stand-in for the reference's
    * MiniLM model (rag.py:26-42): same contract (unit-normed float
    * vector, cosine ≡ dot), fully reproducible in CI with no model
    * weights. Zero-token text embeds to the zero vector.
    */
  def hashEmbed(text: String, dim: Int = 384): Array[Float] = {
    val v = new Array[Float](dim)
    if (text != null) {
      text.split("\\s+").iterator.filter(_.nonEmpty).foreach { tok =>
        val h = MessageDigest.getInstance("MD5").digest(tok.getBytes("UTF-8"))
        val idx = java.lang.Long.parseLong(
          h.take(7).map(b => f"$b%02x").mkString.substring(0, 13), 16)
        v((idx % dim).toInt) += 1.0f
      }
    }
    val norm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    if (norm > 0) v.map(x => (x / norm).toFloat) else v
  }
}
