package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.rag._

/** The MiniLM-shaped embedding plumbing: WordPiece tokenization pinned
  * against the public algorithm, batch tensor shaping, pooling
  * contract, and full ranking semantics through RagPipeline with both
  * the fake-session transformer and the trained Word2Vec embedder.
  */
class TransformerEmbedderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // tiny vocab exercising every WordPiece rule
  private val vocab: Map[String, Int] = Seq(
    "[PAD]", "[UNK]", "[CLS]", "[SEP]",
    "the", "court", "courts", "##s", "un", "##aff", "##able",
    "judge", "##d", ",", ".", "breach", "of", "contract"
  ).zipWithIndex.toMap
  private def ids(ts: String*): Seq[Int] = ts.map(vocab)

  private val tok = new WordPieceTokenizer(vocab)

  test("wordpiece: greedy longest-match with ## continuations") {
    // "courts" matches whole (longest), not court + ##s
    assert(tok.tokenize("courts") == ids("courts"))
    // "judged" = judge + ##d
    assert(tok.tokenize("judged") == ids("judge", "##d"))
    // "unaffable" = un + ##aff + ##able
    assert(tok.tokenize("unaffable") == ids("un", "##aff", "##able"))
  }

  test("wordpiece: punctuation splits, case folds, unknowns collapse") {
    assert(tok.tokenize("The court, judged.") ==
      ids("the", "court", ",", "judge", "##d", "."))
    // any unmatchable remainder → the WHOLE word is [UNK]
    assert(tok.tokenize("courtxyz") == ids("[UNK]"))
    assert(tok.tokenize("") == Seq.empty)
    assert(tok.tokenize(null) == Seq.empty)
  }

  /** Session that records the exact tensors it was fed. */
  private final class RecordingSession(inner: TransformerSession)
    extends TransformerSession {
    var lastIds: Array[Array[Long]] = _
    var lastMask: Array[Array[Long]] = _
    var calls = 0
    override def hiddenSize: Int = inner.hiddenSize
    override def run(i: Array[Array[Long]], m: Array[Array[Long]]) = {
      lastIds = i; lastMask = m; calls += 1; inner.run(i, m)
    }
  }

  test("batch shaping: [CLS]/[SEP] framing, right-padding, 0/1 mask") {
    val rec = new RecordingSession(DeterministicFakeSession(16))
    val emb = OnnxMiniLmEmbedder(vocab, rec)
    emb.embedBatch(Seq("the court", "breach of contract, the judged courts"))
    val cls = vocab("[CLS]").toLong; val sep = vocab("[SEP]").toLong
    val pad = vocab("[PAD]").toLong
    assert(rec.calls == 1, "one forward pass per batch")
    val Array(r0, r1) = rec.lastIds
    assert(r1.head == cls && r1.last == sep)
    assert(r0.length == r1.length, "batch padded to a rectangle")
    assert(r0.take(4).toSeq ==
      Seq(cls, vocab("the").toLong, vocab("court").toLong, sep))
    assert(r0.drop(4).forall(_ == pad))
    assert(rec.lastMask(0).toSeq == Seq.fill(4)(1L) ++ Seq.fill(r0.length - 4)(0L))
    assert(rec.lastMask(1).forall(_ == 1L))
  }

  test("embeddings are unit vectors; embed == embedBatch singly") {
    val emb = OnnxMiniLmEmbedder(vocab, DeterministicFakeSession(32))
    val texts = Seq("the court", "breach of contract", "judged", "")
    val batched = emb.embedBatch(texts)
    texts.zip(batched).foreach { case (t, b) =>
      assert(emb.embed(t).toSeq == b.toSeq, s"parity for '$t'")
      val n = b.map(x => x.toDouble * x).sum
      assert(math.abs(n - 1.0) < 1e-5, s"unit norm for '$t' (got $n)")
    }
    // padding another row alongside must not change a row's embedding
    val alone = emb.embedBatch(Seq("the court")).head
    assert(alone.toSeq == batched.head.toSeq, "pad-invariant pooling")
  }

  test("ragged batch through embedChunksBatched matches per-row embedding") {
    import spark.implicits._
    val emb = OnnxMiniLmEmbedder(vocab, DeterministicFakeSession(24))
    val chunks = Seq(
      ("C-1", 0, "the court judged"), ("C-2", 0, "breach of contract"),
      ("C-3", 0, "unaffable courts"), ("C-4", 0, ""))
      .toDF("case_number", "chunk_id", "chunk_text")
    val single = RagPipeline.embedChunks(chunks, emb)
    val batched = RagPipeline.embedChunksBatched(chunks, emb, batchSize = 3)
    assert(single.exceptAll(batched).count() == 0)
    assert(batched.exceptAll(single).count() == 0)
  }

  private def rankingHolds(embedder: Embedder): Unit = {
    import spark.implicits._
    val cases = Seq(
      ("R-1", "t1", java.sql.Date.valueOf("2024-01-01"), 1L, 1L,
        "the court judged the breach of contract"),
      ("R-2", "t2", java.sql.Date.valueOf("2024-01-02"), 1L, 1L,
        "unaffable courts the judge"),
      ("R-3", "t3", java.sql.Date.valueOf("2024-01-03"), 1L, 1L,
        "breach breach contract contract"))
      .toDF("case_number", "title", "filed_date", "judge_id", "court_id",
        "docket_text")
    val judges = Seq((1L, "J")).toDF("id", "full_name")
    val courts = Seq((1L, "C")).toDF("id", "name")
    val emb = RagPipeline.backfill(cases, None, embedder)
    // self-query: the source case must rank first at similarity 1.0
    val res = RagPipeline.searchText(emb, cases, judges, courts,
      "unaffable courts the judge", 3, embedder).collect()
    assert(res.nonEmpty)
    assert(res(0).getAs[String]("case_number") == "R-2")
    assert(math.abs(res(0).getAs[Double]("best_similarity") - 1.0) < 1e-4)
    val sims = res.map(_.getAs[Double]("best_similarity"))
    assert(sims.sameElements(sims.sorted.reverse), "descending similarity")
  }

  test("ranking semantics hold with the fake-session transformer") {
    rankingHolds(OnnxMiniLmEmbedder(vocab, DeterministicFakeSession(48)))
  }

  test("real MiniLM ONNX weights through the reflective session (env-gated)") {
    // Runs only when real weights are provisioned:
    //   GRAFT_ONNX_MODEL=/path/model.onnx  GRAFT_ONNX_VOCAB=/path/vocab.txt
    //   [GRAFT_ONNX_JAR=/path/onnxruntime.jar]  sbt "testOnly *TransformerEmbedderSpec*"
    // Canceled (not passed, not failed) otherwise — this container ships
    // neither the runtime jar nor the weights.
    val model = sys.env.get("GRAFT_ONNX_MODEL")
    val vocabPath = sys.env.get("GRAFT_ONNX_VOCAB")
    assume(model.isDefined && vocabPath.isDefined,
      "set GRAFT_ONNX_MODEL / GRAFT_ONNX_VOCAB (and optionally GRAFT_ONNX_JAR)")
    val emb = OnnxMiniLmEmbedder.fromModel(model.get, vocabPath.get,
      p => new OrtReflectiveSession(p, sys.env.get("GRAFT_ONNX_JAR")))
    val Seq(a, b, c) = emb.embedBatch(Seq(
      "the court granted the motion to dismiss",
      "the judge granted the dismissal motion",
      "photosynthesis in deep-sea algae"))
    def dot(x: Array[Float], y: Array[Float]): Double =
      x.lazyZip(y).map((p, q) => p.toDouble * q.toDouble).sum
    assert(math.abs(dot(a, a) - 1.0) < 1e-3, "unit norm")
    assert(dot(a, b) > dot(a, c),
      s"paraphrase must beat unrelated text: ${dot(a, b)} vs ${dot(a, c)}")
  }

  test("ranking semantics hold with the trained Word2Vec embedder") {
    import spark.implicits._
    val corpus = Seq(
      "the court judged the breach of contract",
      "unaffable courts the judge",
      "breach breach contract contract",
      "the judge ruled on the contract")
      .toDF("text")
    val emb = Word2VecEmbedder.fit(corpus, "text", dim = 16)
    assert(emb.vectors.nonEmpty)
    val v = emb.embed("the court judged")
    assert(math.abs(v.map(x => x.toDouble * x).sum - 1.0) < 1e-5, "unit norm")
    rankingHolds(emb)
  }
}
