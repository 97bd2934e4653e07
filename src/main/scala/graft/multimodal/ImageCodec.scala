package graft.multimodal

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/** Deterministic 24-bit BMP encoder: pixels are the input bytes as
  * gray levels (B=G=R=byte), `width` pixels per row (bottom-up, as BMP
  * mandates), last row zero-padded. Width 16 keeps rows at 48 bytes —
  * already 4-byte aligned, so no per-row padding ambiguity.
  *
  * Purpose: the test corpus ships no real image files, but an encoder
  * whose pixels are a pure function of known bytes lets the REAL
  * decode path (javax.imageio) produce features DuckDB can recompute
  * from character codes — a differential oracle over an actual codec
  * rather than a stub.
  */
object BmpEncoder {

  val DefaultWidth = 16

  def grayBmp(bytes: Array[Byte], width: Int = DefaultWidth): Array[Byte] = {
    require(width > 0 && (width * 3) % 4 == 0,
      "row stride must be 4-byte aligned (width*3 % 4 == 0)")
    require(bytes.nonEmpty, "BMP needs at least one pixel")
    val height = (bytes.length + width - 1) / width
    val rowBytes = width * 3
    val dataSize = rowBytes * height
    val fileSize = 54 + dataSize
    val out = new Array[Byte](fileSize)
    def putIntLE(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = (v >> 8 & 0xff).toByte
      out(off + 2) = (v >> 16 & 0xff).toByte
      out(off + 3) = (v >> 24 & 0xff).toByte
    }
    // BITMAPFILEHEADER
    out(0) = 'B'; out(1) = 'M'
    putIntLE(2, fileSize)
    putIntLE(10, 54) // pixel data offset
    // BITMAPINFOHEADER
    putIntLE(14, 40)
    putIntLE(18, width)
    putIntLE(22, height) // positive → bottom-up row order
    out(26) = 1 // planes
    out(28) = 24 // bits per pixel
    putIntLE(34, dataSize)
    putIntLE(38, 2835); putIntLE(42, 2835) // 72 dpi
    var i = 0
    while (i < width * height) {
      val v: Byte = if (i < bytes.length) bytes(i) else 0
      val row = i / width
      val colOff = (i % width) * 3
      // bottom-up: logical row r lands at physical row (height-1-r)
      val off = 54 + (height - 1 - row) * rowBytes + colOff
      out(off) = v; out(off + 1) = v; out(off + 2) = v
      i += 1
    }
    out
  }
}

/** Pixel-level features from a genuinely decoded image. */
final case class ImageFeatures(width: Int, height: Int, lum_sum: Long,
    lh0: Long, lh1: Long, lh2: Long, lh3: Long)

/** Real image decoder on the JDK's ImageIO (PNG, BMP, GIF, JPEG —
  * no external deps). Replaces the stub for the decode step the
  * container previously couldn't exercise: payload bytes are demuxed
  * and decompressed by the actual codec, and features come from the
  * decoded PIXELS. Instantiate once per partition (ImageIO's reader
  * lookup is not free) exactly like a model/codec handle.
  */
final class ImageCodec {
  def decode(payload: Array[Byte]): ImageFeatures = decodeResized(payload, 1)

  /** Decode + nearest-neighbor downsample by an integer `factor`:
    * resized pixel (x, y) samples decoded pixel (x·f, y·f), output
    * dims are ceil(w/f) × ceil(h/f). factor=1 is a plain decode. The
    * resample happens on the DECODED raster (the real resize shape —
    * decode once per record, never re-encode), and features come from
    * the resized grid.
    */
  def decodeResized(payload: Array[Byte], factor: Int): ImageFeatures = {
    require(factor >= 1, "factor must be >= 1")
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val w2 = (img.getWidth + factor - 1) / factor
    val h2 = (img.getHeight + factor - 1) / factor
    val hist = new Array[Long](4)
    var sum = 0L
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val rgb = img.getRGB(x * factor, y * factor)
        val lum = ((rgb >> 16 & 0xff) + (rgb >> 8 & 0xff) + (rgb & 0xff)) / 3
        hist(lum >> 6) += 1
        sum += lum
        x += 1
      }
      y += 1
    }
    ImageFeatures(w2, h2, sum, hist(0), hist(1), hist(2), hist(3))
  }

  /** 63-bit difference hash (perceptual dHash) over the decoded
    * raster: bit k is set iff luminance at row-major position k
    * exceeds position k+1 (positions beyond the raster read as 0).
    * 63 bits keep the hash positive in a signed 64-bit long. Computed
    * from DECODED pixels — the perceptual fingerprint survives
    * re-encoding, which is the point of hashing images instead of
    * their bytes.
    */
  def dHash63(payload: Array[Byte]): Long = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val total = w * img.getHeight
    def lum(k: Int): Int =
      if (k < total) {
        val rgb = img.getRGB(k % w, k / w)
        ((rgb >> 16 & 0xff) + (rgb >> 8 & 0xff) + (rgb & 0xff)) / 3
      } else 0
    var h = 0L
    var k = 0
    while (k < 63) {
      if (lum(k) > lum(k + 1)) h |= (1L << k)
      k += 1
    }
    h
  }
}
