package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.MultimodalPipeline

/** Oracle-verified coverage of the multimodal binary pipeline: the
  * documents' UTF-8 bytes ride as an opaque payload column through the
  * typed mapPartitions decode (stub codec — see MultimodalPipeline),
  * and the extracted features are recomputed by DuckDB from character
  * codes (the corpus is ASCII, so char codes ≡ payload bytes — which
  * is exactly what makes the stub features oracle-checkable).
  */
object MultimodalQueries {

  /** Byte-level features per media record over a bounded id slice. */
  def q25MultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val media = MultimodalPipeline.mediaFromDocuments(
      t.documents.filter(col("doc_id") < 200))
    MultimodalPipeline.extractFeatures(media).toDF()
      .orderBy("media_id")
  }

  val q25Sql: String = {
    val codes = "list_transform(generate_series(1, len(text)), i -> ascii(substr(text, i, 1)))"
    def h(b: Int) = s"coalesce(len(list_filter($codes, c -> c // 64 = $b)), 0)::BIGINT AS h$b"
    s"""SELECT doc_id AS media_id,
       |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       |  len(text)::BIGINT AS n_bytes,
       |  coalesce(list_sum($codes), 0)::BIGINT AS byte_sum,
       |  ${h(0)}, ${h(1)}, ${h(2)}, ${h(3)},
       |  ((len(text) + 31) // 32)::BIGINT AS n_frames,
       |  md5(substr(text, 1, 16)) AS head_fingerprint
       |FROM documents WHERE doc_id < 200 ORDER BY media_id""".stripMargin
  }

  /** Strided frame sampling: per-media frame counts and total sampled
    * bytes (the aggregate signature keeps the oracle binary-free).
    */
  def q26FrameSample(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val media = MultimodalPipeline.mediaFromDocuments(
      t.documents.filter(col("doc_id") < 200))
    MultimodalPipeline.sampleFrames(media, stride = 32, frameLen = 16)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(octet_length(col("frame")).cast("long")).as("sampled_bytes"))
      .orderBy("media_id")
  }

  val q26Sql: String =
    """SELECT doc_id AS media_id,
      |  ((len(text) + 31) // 32)::BIGINT AS n_frames,
      |  coalesce(list_sum(list_transform(
      |    generate_series(0, ((len(text) + 31) // 32) - 1),
      |    k -> least(16, len(text) - k * 32))), 0)::BIGINT AS sampled_bytes
      |FROM documents WHERE doc_id < 200 AND len(text) > 0 ORDER BY media_id""".stripMargin

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_multimodal_features" -> (q25MultimodalFeatures _),
    "q26_frame_sample" -> (q26FrameSample _),
  )

  val oracle: Map[String, String] = Map(
    "q25_multimodal_features" -> q25Sql,
    "q26_frame_sample" -> q26Sql,
  )
}
