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

/** IVF-Flat, the reference's ACTUAL index structure (rag.py:83-86:
  * `ivfflat ... lists=100`, probed with `probes=10`): a k-means coarse
  * quantizer assigns every vector to its nearest-centroid list, and a
  * query exactly scans only the `nprobe` lists whose centroids are
  * closest — "flat" = no residual compression inside a list. The
  * hyperplane-LSH cells (VectorQueries.q41/q69) are a data-independent
  * quantizer; this is the data-ADAPTED one, trained with MLlib KMeans.
  *
  * Scale shape: centroids are tiny (lists × dim doubles — ship to the
  * driver/broadcast them), list ranking is driver-side arithmetic, and
  * the corpus is read through a `list_id IN (...)` filter, so a table
  * written partitioned/bucketed by `list_id` serves a query with
  * `nprobe` pruned partition reads — identical I/O shape to the
  * reference's index probes.
  */
final class IvfIndex private (val centroids: Array[Array[Double]],
    assigned: DataFrame) {

  /** The bucketed corpus: (id, embedding, list_id). The PERSISTED
    * form of this table — hive-partitioned by `list_id` in a
    * SnapshotStore, incrementally maintained, probed with partition
    * pruning — is [[AnnStore]]; this in-session variant remains the
    * MLlib-trained (float-kmeans) twin for q86/q191's recall studies.
    */
  def table: DataFrame = assigned

  /** Which lists a query probes: `nprobe` nearest centroids by
    * Euclidean distance (on unit vectors, monotone in cosine).
    */
  def probeLists(vec: Array[Float], nprobe: Int): Seq[Int] = {
    require(nprobe >= 1, "nprobe must be >= 1")
    centroids.zipWithIndex.map { case (c, i) =>
      var d = 0.0
      var j = 0
      while (j < c.length) {
        val diff = c(j) - vec(j); d += diff * diff; j += 1
      }
      (d, i)
    }.sortBy(x => (x._1, x._2)).take(nprobe).map(_._2).toSeq
  }

  /** Exact cosine top-k within the probed lists (approximate overall —
    * the IVFFLAT recall/latency trade, rag.py:179-180).
    */
  def query(vec: Array[Float], k: Int, nprobe: Int = 10): DataFrame = {
    import graft.functions.VectorFunctions.dotFold
    val lists = probeLists(vec, nprobe)
    assigned.filter(col("list_id").isin(lists: _*))
      .withColumn("cosine", dotFold(col("embedding"), typedlit(vec.toSeq)))
      .orderBy(desc("cosine"), asc("id"))
      .limit(k)
      .select(col("id"), col("cosine"))
  }
}

object IvfIndex {

  /** Train the quantizer and assign the corpus. `lists` follows the
    * reference default downscaled to the corpus (a list wants ≥ ~39
    * vectors in pgvector's own guidance; tests use small `lists`).
    */
  def build(embeddings: DataFrame, idCol: String = "vec_id",
      embCol: String = "embedding", lists: Int = 100,
      seed: Long = 42L): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    val toVec = udf((a: Seq[Float]) =>
      Vectors.dense(a.map(_.toDouble).toArray): Vector)
    val prepared = embeddings
      .select(col(idCol).as("id"), col(embCol).as("embedding"))
      .withColumn("features", toVec(col("embedding")))
    val model = new KMeans().setK(lists).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("list_id")
      .fit(prepared)
    val assigned = model.transform(prepared)
      .select(col("id"), col("embedding"), col("list_id"))
    new IvfIndex(model.clusterCenters.map(_.toArray), assigned)
  }
}
