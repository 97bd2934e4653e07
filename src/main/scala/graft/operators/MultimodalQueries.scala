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

  /** REAL image decode: each document's bytes become gray pixels of an
    * actual BMP (BmpEncoder), javax.imageio decodes it on executors,
    * and the features come from the decoded pixels. Because the
    * encoder is a pure function of the text, DuckDB recomputes every
    * pixel feature from character codes — a differential oracle over
    * a genuine codec path (gray pixel: (c+c+c)/3 ≡ c, zero-padding of
    * the last row lands in luminance bucket 0).
    */
  def q72ImageDecode(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val media = MultimodalPipeline.bmpMediaFromDocuments(
      t.documents.filter(col("doc_id") < 200))
    MultimodalPipeline.extractImageFeatures(media)
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("lum_sum"), col("lh0"), col("lh1"), col("lh2"), col("lh3"))
      .orderBy("media_id")
  }

  val q72Sql: String = {
    val codes = "list_transform(generate_series(1, len(text)), i -> ascii(substr(text, i, 1)))"
    def bucket(b: Int) =
      s"coalesce(len(list_filter($codes, c -> c // 64 = $b)), 0)"
    s"""WITH d AS (
       |  SELECT doc_id, text, len(text) AS n, (len(text) + 15) // 16 AS height
       |  FROM documents WHERE doc_id < 200 AND len(text) > 0)
       |SELECT doc_id AS media_id, 'image' AS kind,
       |  (54 + 48 * height)::BIGINT AS n_bytes,
       |  16::BIGINT AS width, height::BIGINT AS height,
       |  coalesce(list_sum($codes), 0)::BIGINT AS lum_sum,
       |  (${bucket(0)} + (16 * height - n))::BIGINT AS lh0,
       |  ${bucket(1)}::BIGINT AS lh1,
       |  ${bucket(2)}::BIGINT AS lh2,
       |  ${bucket(3)}::BIGINT AS lh3
       |FROM d ORDER BY media_id""".stripMargin
  }

  /** REAL audio decode: each document's bytes become PCM samples of an
    * actual WAV (WavEncoder), javax.sound.sampled decodes it on
    * executors, and the features come from the decoded samples.
    * Sample = (byte - 96) * 256, centered so real text crosses zero —
    * DuckDB recomputes every sample feature from character codes.
    */
  def q73AudioDecode(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val media = MultimodalPipeline.wavMediaFromDocuments(
      t.documents.filter(col("doc_id") < 200))
    MultimodalPipeline.extractAudioFeatures(media)
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("n_samples"), col("abs_sum"), col("peak"),
        col("zero_crossings"))
      .orderBy("media_id")
  }

  val q73Sql: String = {
    val samples = "list_transform(generate_series(1, len(text)), i -> (ascii(substr(text, i, 1)) - 96) * 256)"
    s"""WITH d AS (
       |  SELECT doc_id, text, len(text) AS n
       |  FROM documents WHERE doc_id < 200 AND len(text) > 0)
       |SELECT doc_id AS media_id, 'audio' AS kind,
       |  (44 + 2 * n)::BIGINT AS n_bytes,
       |  8000::BIGINT AS sample_rate,
       |  n::BIGINT AS n_samples,
       |  coalesce(list_sum(list_transform($samples, s -> abs(s))), 0)::BIGINT AS abs_sum,
       |  coalesce(list_max(list_transform($samples, s -> abs(s))), 0)::BIGINT AS peak,
       |  coalesce(list_sum(list_transform(generate_series(2, n), i ->
       |    CASE WHEN (ascii(substr(text, i - 1, 1)) - 96)
       |            * (ascii(substr(text, i, 1)) - 96) < 0
       |         THEN 1 ELSE 0 END)), 0)::BIGINT AS zero_crossings
       |FROM d ORDER BY media_id""".stripMargin
  }

  /** REAL decode + nearest-neighbor 2× downsample: resized pixel
    * (x, y) samples decoded pixel (2x, 2y), so DuckDB recomputes every
    * sampled luminance from the character at index y·32 + x·2
    * (0-based; beyond-text indices are the BMP's zero padding). Output
    * grid is 8 × ceil(H/2) for the 16-wide source.
    */
  def q79ImageResize(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val media = MultimodalPipeline.bmpMediaFromDocuments(
      t.documents.filter(col("doc_id") < 200))
    MultimodalPipeline.resizeImageFeatures(media, factor = 2)
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("lum_sum"), col("lh0"), col("lh1"), col("lh2"), col("lh3"))
      .orderBy("media_id")
  }

  val q79Sql: String = {
    // sampled luminances: k enumerates the resized grid row-major;
    // original index = (k // 8) * 32 + (k % 8) * 2 (both coords doubled)
    val codes = """list_transform(generate_series(0, 8 * h2 - 1), k ->
                  |    CASE WHEN ((k // 8) * 32 + (k % 8) * 2) < n
                  |         THEN ascii(substr(text, (k // 8) * 32 + (k % 8) * 2 + 1, 1))
                  |         ELSE 0 END)""".stripMargin
    def bucket(b: Int) =
      s"coalesce(len(list_filter($codes, c -> c // 64 = $b)), 0)::BIGINT"
    s"""WITH d AS (
       |  SELECT doc_id, text, len(text) AS n,
       |    (len(text) + 15) // 16 AS height,
       |    ((len(text) + 15) // 16 + 1) // 2 AS h2
       |  FROM documents WHERE doc_id < 200 AND len(text) > 0)
       |SELECT doc_id AS media_id, 'image' AS kind,
       |  (54 + 48 * height)::BIGINT AS n_bytes,
       |  8::BIGINT AS width, h2::BIGINT AS height,
       |  coalesce(list_sum($codes), 0)::BIGINT AS lum_sum,
       |  ${bucket(0)} AS lh0, ${bucket(1)} AS lh1,
       |  ${bucket(2)} AS lh2, ${bucket(3)} AS lh3
       |FROM d ORDER BY media_id""".stripMargin
  }

  /** q97: IMAGE near-duplicate detection via perceptual hashing — the
    * multimodal member of the dedup family: every payload decodes to
    * pixels (real javax.imageio path, per-partition codec) and hashes
    * to a 63-bit dHash ([[graft.multimodal.ImageCodec.dHash63]]);
    * re-encoded or resaved copies of an image collide where byte
    * hashes cannot. Candidate pairs meet through a 16-bit BAND
    * equi-join on the hash (SimHash/q33's shape — cost ∝ collisions,
    * never n²) and verify exactly with `bit_count(xor) <= 3`. A
    * shifted-id twin of every image guarantees detectable duplicates;
    * the oracle re-derives each dHash from the text bytes the BMPs
    * encode, so decode + hash + band join are all hash-checked.
    */
  def q97ImageNeardup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val base = t.documents.filter(col("doc_id") < 200).select("doc_id", "text")
    val twin = base.withColumn("doc_id", col("doc_id") + 1000L)
    val media = MultimodalPipeline.bmpMediaFromDocuments(base.unionByName(twin))
    val hashes = MultimodalPipeline.imageDHashes(media)
    val banded = hashes.select(col("media_id"), col("dhash"),
      explode(typedlit((0 until 4).map(_.toLong))).as("band"))
      .withColumn("bval",
        expr("shiftright(dhash, cast(band * 16 AS int)) & 65535"))
    banded.select(col("band"), col("bval"),
      col("media_id").as("id_a"), col("dhash").as("h_a"))
      .join(banded.select(col("band"), col("bval"),
        col("media_id").as("id_b"), col("dhash").as("h_b")),
        Seq("band", "bval"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "h_a", "h_b").distinct()
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b")))
        .cast("long"))
      .filter(col("hamming") <= 3)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  val q97Sql: String = {
    val codes = """list_transform(generate_series(0, 16 * ((len(text) + 15) // 16) - 1),
                  |    i -> CASE WHEN i < len(text) THEN ascii(substr(text, i + 1, 1)) ELSE 0 END)""".stripMargin
    s"""WITH imgs AS (
       |  SELECT doc_id AS media_id, $codes AS codes
       |  FROM documents WHERE doc_id < 200 AND len(text) > 0
       |  UNION ALL
       |  SELECT doc_id + 1000 AS media_id, $codes AS codes
       |  FROM documents WHERE doc_id < 200 AND len(text) > 0),
       |hashed AS (
       |  SELECT media_id,
       |    list_sum(list_transform(generate_series(0, 62), k ->
       |      CASE WHEN coalesce(codes[k + 1], 0) > coalesce(codes[k + 2], 0)
       |           THEN (1::BIGINT << k) ELSE 0 END))::BIGINT AS dhash
       |  FROM imgs),
       |banded AS (
       |  SELECT media_id, dhash, b.range AS band,
       |    (dhash >> (16 * b.range)::INTEGER) & 65535 AS bval
       |  FROM hashed, range(4) b),
       |pairs AS (
       |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
       |    a.dhash AS h_a, b.dhash AS h_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bval = b.bval AND a.media_id < b.media_id)
       |SELECT id_a, id_b, bit_count(xor(h_a, h_b))::BIGINT AS hamming
       |FROM pairs WHERE bit_count(xor(h_a, h_b)) <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q98: AUDIO near-duplicate detection — q97's twin for the audio
    * modality: payloads demux through the real javasound provider,
    * decoded PCM hashes to a 63-bit sign-of-energy-difference
    * fingerprint ([[graft.multimodal.AudioCodec.fingerprint63]],
    * the Haitsma–Kalker shape), and candidates meet through the same
    * 16-bit band equi-join + `bit_count(xor) <= 3` exact verify.
    * Twins guarantee detectable duplicates; the oracle re-derives
    * every frame energy from the text bytes the WAVs encode.
    */
  def q98AudioNeardup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val base = t.documents.filter(col("doc_id") < 200).select("doc_id", "text")
    val twin = base.withColumn("doc_id", col("doc_id") + 1000L)
    val media = MultimodalPipeline.wavMediaFromDocuments(base.unionByName(twin))
    val hashes = MultimodalPipeline.audioFingerprints(media)
    val banded = hashes.select(col("media_id"), col("afp"),
      explode(typedlit((0 until 4).map(_.toLong))).as("band"))
      .withColumn("bval",
        expr("shiftright(afp, cast(band * 16 AS int)) & 65535"))
    banded.select(col("band"), col("bval"),
      col("media_id").as("id_a"), col("afp").as("h_a"))
      .join(banded.select(col("band"), col("bval"),
        col("media_id").as("id_b"), col("afp").as("h_b")),
        Seq("band", "bval"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "h_a", "h_b").distinct()
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b")))
        .cast("long"))
      .filter(col("hamming") <= 3)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  val q98Sql: String = {
    val energies =
      """list_transform(generate_series(0, 63), k ->
        |      coalesce(list_sum(list_transform(generate_series(k * 8 + 1, k * 8 + 8), i ->
        |        CASE WHEN i <= len(text)
        |             THEN abs((ascii(substr(text, i, 1)) - 96) * 256) ELSE 0 END)), 0))""".stripMargin
    s"""WITH snd AS (
       |  SELECT doc_id AS media_id, $energies AS e
       |  FROM documents WHERE doc_id < 200 AND len(text) > 0
       |  UNION ALL
       |  SELECT doc_id + 1000 AS media_id, $energies AS e
       |  FROM documents WHERE doc_id < 200 AND len(text) > 0),
       |hashed AS (
       |  SELECT media_id,
       |    list_sum(list_transform(generate_series(0, 62), k ->
       |      CASE WHEN e[k + 1] > e[k + 2] THEN (1::BIGINT << k) ELSE 0 END))::BIGINT AS afp
       |  FROM snd),
       |banded AS (
       |  SELECT media_id, afp, b.range AS band,
       |    (afp >> (16 * b.range)::INTEGER) & 65535 AS bval
       |  FROM hashed, range(4) b),
       |pairs AS (
       |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
       |    a.afp AS h_a, b.afp AS h_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bval = b.bval AND a.media_id < b.media_id)
       |SELECT id_a, id_b, bit_count(xor(h_a, h_b))::BIGINT AS hamming
       |FROM pairs WHERE bit_count(xor(h_a, h_b)) <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q98_audio_neardup" -> (q98AudioNeardup _),
    "q97_image_neardup" -> (q97ImageNeardup _),
    "q25_multimodal_features" -> (q25MultimodalFeatures _),
    "q26_frame_sample" -> (q26FrameSample _),
    "q72_image_decode" -> (q72ImageDecode _),
    "q73_audio_decode" -> (q73AudioDecode _),
    "q79_image_resize" -> (q79ImageResize _),
  )

  val oracle: Map[String, String] = Map(
    "q98_audio_neardup" -> q98Sql,
    "q97_image_neardup" -> q97Sql,
    "q25_multimodal_features" -> q25Sql,
    "q26_frame_sample" -> q26Sql,
    "q72_image_decode" -> q72Sql,
    "q73_audio_decode" -> q73Sql,
    "q79_image_resize" -> q79Sql,
  )
}
