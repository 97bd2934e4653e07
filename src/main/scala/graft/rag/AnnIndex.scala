package graft.rag

import org.apache.spark.ml.feature.BucketedRandomProjectionLSHModel
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MLlib-backed approximate-nearest-neighbor index over an embedding
  * column — the 100 TB scale path the SURVEY (§4) reserves for when
  * exact brute-force top-k (VectorQueries.q40) stops being viable.
  * Wraps `BucketedRandomProjectionLSH` (random-projection bucketing,
  * the Euclidean cousin of the reference's IVFFLAT index): fit once,
  * transform/bucket the corpus, then `approxNearestNeighbors` probes
  * buckets instead of scanning the corpus.
  *
  * For unit-normalized vectors, Euclidean distance is monotone in
  * cosine (d² = 2 - 2·cos), so Euclidean-LSH neighbor ranking ≡
  * cosine ranking — same trick that makes the reference's
  * `vector_cosine_ops` index equivalent to an L2 index on unit
  * vectors.
  */
final class AnnIndex private (model: BucketedRandomProjectionLSHModel,
    indexed: DataFrame) {

  /** Approximate top-k by cosine (input and corpus unit-normalized). */
  def query(vec: Array[Float], k: Int): DataFrame = {
    val key = Vectors.dense(vec.map(_.toDouble))
    model.approxNearestNeighbors(indexed, key, k).toDF()
      .withColumn("cosine", lit(1.0) - col("distCol") * col("distCol") / 2.0)
      .select(col("id"), col("cosine"))
  }
}

object AnnIndex {

  /** Fit + bucket a corpus of `(id, embedding: array<float>)`. */
  def build(embeddings: DataFrame, idCol: String = "vec_id",
      embCol: String = "embedding", bucketLength: Double = 0.5,
      numHashTables: Int = 3, seed: Long = 42L): AnnIndex = {
    val toVec = udf((a: Seq[Float]) =>
      Vectors.dense(a.map(_.toDouble).toArray): Vector)
    val prepared = embeddings
      .select(col(idCol).as("id"), toVec(col(embCol)).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(seed)
    val model = lsh.fit(prepared)
    new AnnIndex(model, model.transform(prepared))
  }
}
