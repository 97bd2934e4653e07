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
    * runtime adapter — [[OrtReflectiveSession]] is the default.
    */
  def fromModel(modelPath: String, vocabPath: String,
      sessionFactory: String => TransformerSession =
        p => new OrtReflectiveSession(p)): OnnxMiniLmEmbedder =
    OnnxMiniLmEmbedder(WordPieceTokenizer.loadVocab(vocabPath),
      sessionFactory(modelPath))
}

/** The real forward pass, bound to `ai.onnxruntime` REFLECTIVELY: this
  * build cannot declare the dependency (zero-egress container), so the
  * adapter resolves `OrtEnvironment`/`OrtSession`/`OnnxTensor` at
  * first use — from the application classpath, or from an explicit
  * `runtimeJar` via a child classloader. Holds only the model PATH
  * and jar path (both serializable); the native session lives in a
  * `@transient lazy val`, so each executor loads the weights exactly
  * once on first batch, the pattern the class Scaladoc above
  * prescribes. Feeds `input_ids`/`attention_mask` (and zeroed
  * `token_type_ids` when the exported graph declares it) as int64
  * [batch, seq] tensors and reads output 0 as float
  * [batch, seq, hidden] — the standard sentence-transformers MiniLM
  * export shape (rag.py:26-42 runs the same model via the Python
  * runtime). Exercised by the env-gated integration test in
  * TransformerEmbedderSpec whenever GRAFT_ONNX_MODEL points at real
  * weights.
  */
final class OrtReflectiveSession(modelPath: String,
    runtimeJar: Option[String] = None,
    override val hiddenSize: Int = 384) extends TransformerSession {

  @transient private lazy val bound: (ClassLoader, Class[_], Object, Object) = {
    val cl = runtimeJar match {
      case Some(j) => new java.net.URLClassLoader(
        Array(new java.io.File(j).toURI.toURL), getClass.getClassLoader)
      case None => getClass.getClassLoader
    }
    val envCls = Class.forName("ai.onnxruntime.OrtEnvironment", true, cl)
    val env = envCls.getMethod("getEnvironment").invoke(null)
    val session = envCls.getMethod("createSession", classOf[String])
      .invoke(env, modelPath)
    (cl, envCls, env, session)
  }

  override def run(inputIds: Array[Array[Long]],
      attentionMask: Array[Array[Long]]): Array[Array[Array[Float]]] = {
    val (cl, envCls, env, session) = bound
    val tensorCls = Class.forName("ai.onnxruntime.OnnxTensor", true, cl)
    val create = tensorCls.getMethod("createTensor", envCls, classOf[Object])
    val sessCls = Class.forName("ai.onnxruntime.OrtSession", true, cl)
    val inputs = new java.util.HashMap[String, Object]()
    val made = new scala.collection.mutable.ArrayBuffer[Object](3)
    def feed(name: String, v: Object): Unit = {
      val t = create.invoke(null, env, v)
      made += t
      inputs.put(name, t)
      ()
    }
    try {
      feed("input_ids", inputIds)
      feed("attention_mask", attentionMask)
      val declared = sessCls.getMethod("getInputNames").invoke(session)
        .asInstanceOf[java.util.Set[String]]
      if (declared.contains("token_type_ids"))
        feed("token_type_ids", inputIds.map(_.map(_ => 0L)))
      val result = sessCls.getMethod("run", classOf[java.util.Map[_, _]])
        .invoke(session, inputs)
      try {
        val value = result.getClass.getMethod("get", classOf[Int])
          .invoke(result, Integer.valueOf(0))
        value.getClass.getMethod("getValue").invoke(value)
          .asInstanceOf[Array[Array[Array[Float]]]]
      } finally {
        result.getClass.getMethod("close").invoke(result)
        ()
      }
    } finally made.foreach(t => t.getClass.getMethod("close").invoke(t))
  }
}
