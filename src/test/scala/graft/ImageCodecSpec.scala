package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{BmpEncoder, ImageCodec, MultimodalPipeline}

/** The real image decode path: BMP encode → ImageIO decode must be a
  * pixel-exact round trip (that identity is what makes q72's pixel
  * features derivable from text by the DuckDB oracle), and the same
  * codec must decode a PNG produced by a DIFFERENT encoder — proving
  * the decoder is a genuine codec, not an inverse of our own writer.
  */
class ImageCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("BMP encode -> ImageIO decode is pixel-exact") {
    val bytes = (0 until 100).map(i => (i * 7 % 256).toByte).toArray
    val codec = new ImageCodec
    val f = codec.decode(BmpEncoder.grayBmp(bytes))
    assert(f.width == 16 && f.height == 7) // ceil(100/16)
    val padded = bytes.map(_ & 0xff) ++ Array.fill(16 * 7 - 100)(0)
    assert(f.lum_sum == padded.map(_.toLong).sum)
    assert(f.lh0 == padded.count(_ >> 6 == 0))
    assert(f.lh1 == padded.count(_ >> 6 == 1))
    assert(f.lh2 == padded.count(_ >> 6 == 2))
    assert(f.lh3 == padded.count(_ >> 6 == 3))
  }

  test("PNG from an independent encoder decodes to the same features") {
    val img = new BufferedImage(8, 4, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8) {
      val v = (x * 32 + y * 8) % 256
      img.setRGB(x, y, v << 16 | v << 8 | v)
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    val f = new ImageCodec().decode(out.toByteArray)
    assert(f.width == 8 && f.height == 4)
    val vals = for (y <- 0 until 4; x <- 0 until 8) yield (x * 32 + y * 8) % 256
    assert(f.lum_sum == vals.map(_.toLong).sum)
    assert(Seq(f.lh0, f.lh1, f.lh2, f.lh3) ==
      (0 until 4).map(b => vals.count(_ >> 6 == b).toLong))
  }

  test("extractImageFeatures runs the codec per-partition over real BMPs") {
    import spark.implicits._
    val docs = Seq((1L, "hello imageio"), (2L, "x" * 40))
      .toDF("doc_id", "text")
    val got = MultimodalPipeline.extractImageFeatures(
      MultimodalPipeline.bmpMediaFromDocuments(docs))
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[Long]("lum_sum"))))
      .toMap
    assert(got(1L) == ((16, 1, "hello imageio".map(_.toLong).sum)))
    assert(got(2L) == ((16, 3, 'x'.toLong * 40)))
  }
}
