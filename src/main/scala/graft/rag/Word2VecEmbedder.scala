package graft.rag

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A RUNNABLE learned-model embedder (no external weights needed):
  * Spark MLlib Word2Vec trained on the corpus itself, sentence vector
  * = mean of word vectors, L2-normalized — the classical neural
  * sentence embedding that predates transformers. It honours the
  * [[Embedder]] contract exactly (unit vectors, cosine ≡ dot), so it
  * drops into backfill/search unchanged and serves as the hermetic
  * "real model" complement to [[OnnxMiniLmEmbedder]]'s ONNX plumbing
  * (reference rag.py:26-42 pins MiniLM; the semantics downstream of
  * `embed` are identical either way).
  *
  * The learned vocabulary is collected into the embedder (a plain
  * broadcastable map): MiniLM's own vocab is 30k rows, and a corpus
  * vocab at 100 TB is capped by `maxVocabSize` — executor-side lookup
  * stays O(1) per token with no shuffle at embed time.
  */
final case class Word2VecEmbedder(dim: Int,
    vectors: Map[String, Array[Float]]) extends Embedder {

  override def embed(text: String): Array[Float] = {
    val toks = Option(text).getOrElse("").toLowerCase
      .split("\\s+").filter(_.nonEmpty)
    val sum = Array.fill(dim)(0.0)
    var n = 0
    toks.foreach { t =>
      vectors.get(t).foreach { v =>
        var d = 0
        while (d < dim) { sum(d) += v(d); d += 1 }
        n += 1
      }
    }
    if (n == 0) return Array.fill(dim)(0.0f)
    var norm = 0.0
    var d = 0
    while (d < dim) { sum(d) /= n; norm += sum(d) * sum(d); d += 1 }
    val inv = if (norm > 0) 1.0 / math.sqrt(norm) else 0.0
    sum.map(x => (x * inv).toFloat)
  }
}

object Word2VecEmbedder {

  /** Train on a text column (one fit job — the model is tiny; the
    * corpus pass is the distributed part).
    */
  def fit(corpus: DataFrame, textCol: String, dim: Int = 64,
      minCount: Int = 1, maxVocabSize: Int = 100000,
      seed: Long = 42L): Word2VecEmbedder = {
    val tokens = corpus
      .select(split(lower(coalesce(col(textCol), lit(""))), "\\s+").as("words"))
      .filter(size(col("words")) > 0)
    val model = new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol("words").setOutputCol("vec")
      .setVectorSize(dim).setMinCount(minCount)
      .setMaxSentenceLength(1000).setSeed(seed)
      .fit(tokens)
    val vecs = model.getVectors
      .orderBy(desc("word")).limit(maxVocabSize)
      .collect()
      .map(r => r.getString(0) ->
        r.getAs[org.apache.spark.ml.linalg.Vector](1).toArray.map(_.toFloat))
      .toMap
    Word2VecEmbedder(dim, vecs)
  }
}
