package graft.rag

/** Real-model embedding plumbing for the reference's MiniLM path
  * (rag.py:26-42 embeds with sentence-transformers
  * `all-MiniLM-L6-v2`). Model WEIGHTS are not hermetic in this build
  * (zero egress, no ONNX runtime jar), so the design splits exactly
  * at the hermetic boundary:
  *
  *   - everything deterministic and public-algorithm — WordPiece
  *     tokenization, special tokens, truncation, batch padding,
  *     attention masks, masked mean-pooling, L2 normalization — is
  *     REAL, implemented here and pinned by tests;
  *   - the one non-hermetic step (the transformer forward pass) sits
  *     behind [[TransformerSession]]. At deploy time an adapter wraps
  *     an ONNX runtime session (`ai.onnxruntime.OrtSession`: feed
  *     `input_ids`/`attention_mask` int64 tensors of shape
  *     [batch, seq], read `last_hidden_state` floats of shape
  *     [batch, seq, hidden]) — a ~15-line class with no changes on
  *     this side. A native runtime session is NOT serializable: the
  *     adapter should hold the model PATH and build its session in a
  *     `@transient lazy val`, so each executor loads the weights once
  *     on first use (the embedder itself ships only the path + vocab).
  *     CI uses [[DeterministicFakeSession]].
  *
  * The embedder honours the [[Embedder]] contract (unit-normalized
  * vectors, cosine ≡ dot), so every downstream semantic — backfill,
  * candidate pool, best-per-case, top-k — is shared with the hashing
  * default and already oracle-gated.
  */

/** Greedy-longest-match WordPiece tokenizer (the BERT/MiniLM scheme):
  * lowercase, split on whitespace and punctuation (punctuation chars
  * become their own words), then match each word's longest vocab
  * prefix repeatedly with `##` continuation pieces; a word with any
  * unmatchable remainder becomes `[UNK]` whole.
  */
final class WordPieceTokenizer(vocab: Map[String, Int],
    unkToken: String = "[UNK]", maxWordChars: Int = 100) extends Serializable {

  val unkId: Int = vocab(unkToken)

  private def isPunct(c: Char): Boolean = {
    val t = Character.getType(c)
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
      (c >= '[' && c <= '`') || (c >= '{' && c <= '~') ||
      t == Character.CONNECTOR_PUNCTUATION || t == Character.DASH_PUNCTUATION ||
      t == Character.START_PUNCTUATION || t == Character.END_PUNCTUATION ||
      t == Character.INITIAL_QUOTE_PUNCTUATION ||
      t == Character.FINAL_QUOTE_PUNCTUATION || t == Character.OTHER_PUNCTUATION
  }

  /** Whitespace + punctuation pre-tokenization over lowercased text. */
  private[rag] def preTokenize(text: String): Seq[String] = {
    val words = Seq.newBuilder[String]
    val cur = new StringBuilder
    def flush(): Unit = if (cur.nonEmpty) { words += cur.toString; cur.clear() }
    text.toLowerCase.foreach { c =>
      if (c.isWhitespace) flush()
      else if (isPunct(c)) { flush(); words += c.toString }
      else cur.append(c)
    }
    flush()
    words.result()
  }

  /** One word → subword ids (greedy longest-match, `##` continuations). */
  private[rag] def wordPieces(word: String): Seq[Int] = {
    if (word.length > maxWordChars) return Seq(unkId)
    val out = Seq.newBuilder[Int]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var hit = -1
      while (end > start && hit < 0) {
        val piece = (if (start > 0) "##" else "") + word.substring(start, end)
        vocab.get(piece) match {
          case Some(id) => hit = id
          case None => end -= 1
        }
      }
      if (hit < 0) return Seq(unkId) // unmatchable remainder → whole-word UNK
      out += hit
      start = end
    }
    out.result()
  }

  def tokenize(text: String): Seq[Int] =
    preTokenize(if (text == null) "" else text).flatMap(wordPieces)
}

object WordPieceTokenizer {
  /** Load a standard `vocab.txt` (one token per line, id = line no). */
  def loadVocab(path: String): Map[String, Int] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().zipWithIndex.map { case (t, i) => (t, i) }.toMap
    finally src.close()
  }
}

/** One transformer forward pass: padded id/mask matrices in, per-token
  * hidden states out. Implementations wrap the real runtime.
  */
trait TransformerSession extends Serializable {
  def hiddenSize: Int

  /** inputIds/attentionMask: [batch][seq] (same shape, mask ∈ {0,1}).
    * Returns [batch][seq][hiddenSize].
    */
  def run(inputIds: Array[Array[Long]],
      attentionMask: Array[Array[Long]]): Array[Array[Array[Float]]]
}

/** Hermetic stand-in for the ONNX forward pass: each token's hidden
  * state is a deterministic hash-derived vector of its id, so the
  * pooled embedding is a real function of the token sequence and all
  * ranking semantics are exercisable without model weights.
  */
final case class DeterministicFakeSession(hiddenSize: Int = 384)
  extends TransformerSession {
  override def run(inputIds: Array[Array[Long]],
      attentionMask: Array[Array[Long]]): Array[Array[Array[Float]]] =
    inputIds.map(_.map { id =>
      Array.tabulate(hiddenSize) { d =>
        val h = scala.util.hashing.MurmurHash3
          .productHash((id, d), 0x9747b28c)
        (h.toDouble / Int.MaxValue).toFloat
      }
    })
}

/** MiniLM-shaped sentence embedder: WordPiece → [CLS] ids [SEP] →
  * truncate/pad → forward pass → attention-masked mean pooling →
  * L2 normalization (the exact sentence-transformers recipe the
  * reference runs, rag.py:26-42). `embedBatch` makes ONE session call
  * per batch — the shape `RagPipeline.embedChunksBatched` streams
  * partitions through.
  */
final case class OnnxMiniLmEmbedder(vocab: Map[String, Int],
    session: TransformerSession, maxSeqLen: Int = 256) extends Embedder {

  private val tokenizer = new WordPieceTokenizer(vocab)
  private val clsId = vocab("[CLS]").toLong
  private val sepId = vocab("[SEP]").toLong
  private val padId = vocab.getOrElse("[PAD]", 0).toLong

  override def dim: Int = session.hiddenSize

  override def embed(text: String): Array[Float] = embedBatch(Seq(text)).head

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    if (texts.isEmpty) return Seq.empty
    val idSeqs = texts.map { t =>
      val body = tokenizer.tokenize(t).take(maxSeqLen - 2).map(_.toLong)
      (clsId +: body) :+ sepId
    }
    val seqLen = idSeqs.map(_.length).max
    val ids = idSeqs.map(s => (s ++ Seq.fill(seqLen - s.length)(padId)).toArray).toArray
    val mask = idSeqs.map(s =>
      (Seq.fill(s.length)(1L) ++ Seq.fill(seqLen - s.length)(0L)).toArray).toArray
    val hidden = session.run(ids, mask)
    idSeqs.indices.map { b =>
      val n = idSeqs(b).length
      val pooled = Array.fill(dim)(0.0)
      var t = 0
      while (t < n) { // mean over REAL tokens only (mask-weighted pool)
        val h = hidden(b)(t)
        var d = 0
        while (d < dim) { pooled(d) += h(d); d += 1 }
        t += 1
      }
      var norm = 0.0
      var d = 0
      while (d < dim) { pooled(d) /= n; norm += pooled(d) * pooled(d); d += 1 }
      val inv = if (norm > 0) 1.0 / math.sqrt(norm) else 0.0
      pooled.map(x => (x * inv).toFloat)
    }
  }
}

object OnnxMiniLmEmbedder {
  /** Deploy-time entry: point at an exported MiniLM ONNX model + its
    * vocab.txt. This build ships no ONNX runtime jar (zero-egress
    * container), so constructing the real session is left to a
    * runtime adapter — see the class Scaladoc for its 15-line shape.
    */
  def fromModel(modelPath: String, vocabPath: String,
      sessionFactory: String => TransformerSession): OnnxMiniLmEmbedder =
    OnnxMiniLmEmbedder(WordPieceTokenizer.loadVocab(vocabPath),
      sessionFactory(modelPath))
}
