package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §"Multimodal columns"): media
  * payloads ride as opaque `binary` columns with typed metadata;
  * decode / feature-extract / resize / frame-sample run as partition-
  * mapped functions so any real codec initializes once per partition
  * and streams records — the exact shape a Pandas-UDF/`mapInPandas`
  * pipeline has in PySpark, expressed as typed `mapPartitions` here.
  *
  * Two decode paths share the plumbing: [[ImageCodec]] is a REAL
  * decoder (JDK ImageIO — PNG/BMP/GIF/JPEG) producing pixel-level
  * features ([[extractImageFeatures]], oracled as q72); [[StubCodec]]
  * derives features from raw bytes for payload kinds this container
  * has no codec for (audio/video), keeping the schema, binary
  * transport, per-partition codec lifecycle and feature shape
  * identical — swapping in a JNI/FFmpeg decoder changes no plumbing.
  *
  * Scale notes: payloads never pass through a shuffle (features are
  * projected before any aggregation); a real deployment would bound
  * `spark.sql.files.maxPartitionBytes` so a partition of blobs fits
  * executor memory.
  */
object MultimodalPipeline {

  /** One media record: opaque payload + typed metadata. */
  final case class MediaRecord(media_id: Long, kind: String,
      payload: Array[Byte], n_bytes: Long)

  /** Extracted features (see [[StubCodec.decode]]). */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      byte_sum: Long, h0: Long, h1: Long, h2: Long, h3: Long,
      n_frames: Long, head_fingerprint: String)

  /** The stand-in decoder. A real implementation would replace the
    * body (JPEG decode → pixels, PCM decode → samples, container
    * demux → frames); everything around it stays.
    */
  final class StubCodec {
    /** Byte histogram over 4 coarse buckets (top 2 bits), strided
      * frame count (stride 32), byte sum, and an md5 fingerprint of
      * the leading 16-byte window ("thumbnail").
      */
    def decode(payload: Array[Byte]): (Long, Long, Long, Long, Long, Long, String) = {
      val hist = new Array[Long](4)
      var sum = 0L
      payload.foreach { b =>
        val u = b & 0xff
        hist(u >> 6) += 1
        sum += u
      }
      val frames = (payload.length + 31) / 32
      val head = payload.take(16)
      val md = java.security.MessageDigest.getInstance("MD5")
      val fp = md.digest(head).map(x => f"$x%02x").mkString
      (sum, hist(0), hist(1), hist(2), hist(3), frames.toLong, fp)
    }
  }

  /** Decode features with a once-per-partition codec. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val codec = new StubCodec // per-partition init (model/codec load)
      it.map { m =>
        val (sum, h0, h1, h2, h3, frames, fp) = codec.decode(m.payload)
        MediaFeatures(m.media_id, m.kind, m.n_bytes, sum, h0, h1, h2, h3,
          frames, fp)
      }
    }
  }

  /** Frame-sample: strided binary slices of the payload as rows —
    * (media_id, frame_id, frame: binary). The video-sampling shape.
    */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 32,
      frameLen: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      Iterator.range(0, m.payload.length, stride).zipWithIndex.map {
        case (off, idx) =>
          (m.media_id, idx,
            m.payload.slice(off, math.min(off + frameLen, m.payload.length)))
      }
    }.toDF("media_id", "frame_id", "frame")
  }

  /** Genuinely decoded pixel features: payloads are REAL images, the
    * decode is javax.imageio (per-partition codec instance), and the
    * features come from decoded pixels — the stub's byte-level path
    * (q25) stays for payloads with no registered codec. Output rows
    * carry the media metadata plus [[ImageFeatures]].
    */
  def extractImageFeatures(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val codec = new ImageCodec // per-partition init, like a model load
      it.map { m =>
        val f = codec.decode(m.payload)
        (m.media_id, m.kind, m.n_bytes, f.width, f.height, f.lum_sum,
          f.lh0, f.lh1, f.lh2, f.lh3)
      }
    }.toDF("media_id", "kind", "n_bytes", "width", "height", "lum_sum",
      "lh0", "lh1", "lh2", "lh3")
  }

  /** Decode + nearest-neighbor resize in one executor-side pass
    * ([[ImageCodec.decodeResized]]): the feature-extraction shape for
    * thumbnailing a 100 TB image corpus — decode once, sample the
    * raster, emit fixed-width features; no re-encoded binary crosses a
    * shuffle.
    */
  def resizeImageFeatures(media: Dataset[MediaRecord], factor: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val codec = new ImageCodec
      it.map { m =>
        val f = codec.decodeResized(m.payload, factor)
        (m.media_id, m.kind, m.n_bytes, f.width, f.height, f.lum_sum,
          f.lh0, f.lh1, f.lh2, f.lh3)
      }
    }.toDF("media_id", "kind", "n_bytes", "width", "height", "lum_sum",
      "lh0", "lh1", "lh2", "lh3")
  }

  /** Perceptual hashes from genuinely decoded images: one
    * (media_id, dhash) row per payload via [[ImageCodec.dHash63]] —
    * the map stage feeding image near-dup detection (q97).
    */
  def imageDHashes(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val codec = new ImageCodec
      it.map(m => (m.media_id, codec.dHash63(m.payload)))
    }.toDF("media_id", "dhash")
  }

  /** Acoustic fingerprints from genuinely decoded audio: one
    * (media_id, afp) row per payload via [[AudioCodec.fingerprint63]]
    * — the map stage feeding audio near-dup detection (q98).
    */
  def audioFingerprints(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val codec = new AudioCodec
      it.map(m => (m.media_id, codec.fingerprint63(m.payload)))
    }.toDF("media_id", "afp")
  }

  /** Genuinely decoded audio features: payloads are REAL WAV files,
    * the decode is javax.sound.sampled (per-partition codec instance),
    * and the features come from decoded PCM samples — the audio twin
    * of [[extractImageFeatures]].
    */
  def extractAudioFeatures(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val codec = new AudioCodec // per-partition init, like a model load
      it.map { m =>
        val f = codec.decode(m.payload)
        (m.media_id, m.kind, m.n_bytes, f.sample_rate, f.n_samples,
          f.abs_sum, f.peak, f.zero_crossings)
      }
    }.toDF("media_id", "kind", "n_bytes", "sample_rate", "n_samples",
      "abs_sum", "peak", "zero_crossings")
  }

  /** Media table whose payloads are real WAV files encoding the
    * documents' bytes as PCM samples ([[WavEncoder]]) — decodable by
    * the actual javasound codec while every sample stays a pure
    * function of the text, keeping the decode oracle-checkable.
    */
  def wavMediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    val wav = udf((text: String) =>
      WavEncoder.pcm16Wav(text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    docs.filter(length(col("text")) > 0)
      .select(
        col("doc_id").as("media_id"),
        lit("audio").as("kind"),
        wav(col("text")).as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .as[MediaRecord]
  }

  /** Media table whose payloads are real BMP images encoding the
    * documents' bytes as gray pixels ([[BmpEncoder]]) — decodable by
    * the actual JDK codec while every pixel stays a pure function of
    * the text, which is what keeps the decode oracle-checkable.
    */
  def bmpMediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    val bmp = udf((text: String) =>
      BmpEncoder.grayBmp(text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    docs.filter(length(col("text")) > 0)
      .select(
        col("doc_id").as("media_id"),
        lit("image").as("kind"),
        bmp(col("text")).as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .as[MediaRecord]
  }

  /** Build a media table from the documents test table: the UTF-8
    * bytes of `text` stand in for an encoded payload (kind rotates to
    * exercise the metadata column).
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
      .as[MediaRecord]
  }
}
