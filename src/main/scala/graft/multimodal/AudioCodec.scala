package graft.multimodal

import java.io.ByteArrayInputStream

import javax.sound.sampled.AudioSystem

/** Deterministic 16-bit PCM mono WAV encoder: each input byte becomes
  * one sample, `(byte - 96) * 256` — centered inside the printable
  * ASCII range so real text swings through BOTH signs (lowercase
  * letters land positive; digits, uppercase and space negative),
  * which is what makes zero-crossing counts a meaningful feature.
  *
  * Purpose mirrors [[BmpEncoder]]: the corpus ships no real audio
  * files, but an encoder whose samples are a pure function of known
  * bytes lets the REAL decode path (javax.sound.sampled) produce
  * features DuckDB can recompute from character codes — a
  * differential oracle over an actual codec rather than a stub.
  */
object WavEncoder {

  val SampleRate = 8000

  /** 44-byte canonical RIFF/WAVE header + little-endian 16-bit PCM. */
  def pcm16Wav(bytes: Array[Byte], sampleRate: Int = SampleRate): Array[Byte] = {
    require(bytes.nonEmpty, "WAV needs at least one sample")
    val dataSize = bytes.length * 2
    val out = new Array[Byte](44 + dataSize)
    def putIntLE(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = (v >> 8 & 0xff).toByte
      out(off + 2) = (v >> 16 & 0xff).toByte
      out(off + 3) = (v >> 24 & 0xff).toByte
    }
    def putShortLE(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = (v >> 8 & 0xff).toByte
    }
    def putTag(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, off)
    putTag(0, "RIFF"); putIntLE(4, 36 + dataSize); putTag(8, "WAVE")
    putTag(12, "fmt "); putIntLE(16, 16)
    putShortLE(20, 1) // PCM
    putShortLE(22, 1) // mono
    putIntLE(24, sampleRate)
    putIntLE(28, sampleRate * 2) // byte rate
    putShortLE(32, 2) // block align
    putShortLE(34, 16) // bits per sample
    putTag(36, "data"); putIntLE(40, dataSize)
    var i = 0
    while (i < bytes.length) {
      putShortLE(44 + 2 * i, sample(bytes(i)))
      i += 1
    }
    out
  }

  /** The byte→sample map (shared with the oracle formula). */
  def sample(b: Byte): Int = ((b & 0xff) - 96) * 256
}

/** Sample-level features from genuinely decoded audio. */
final case class AudioFeatures(sample_rate: Int, n_samples: Long,
    abs_sum: Long, peak: Long, zero_crossings: Long)

/** Real audio decoder on the JDK's javax.sound.sampled (WAV/AIFF/AU —
  * no external deps). The payload is demuxed by the actual javasound
  * provider: container header parsed, format negotiated, PCM frames
  * streamed out. Features come from the decoded SAMPLES. Instantiate
  * once per partition (provider lookup is not free) exactly like a
  * model/codec handle.
  */
final class AudioCodec {
  def decode(payload: Array[Byte]): AudioFeatures = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"expected 16-bit mono PCM, got $fmt")
      val raw = in.readAllBytes()
      val bigEndian = fmt.isBigEndian
      var i = 0
      var n = 0L
      var absSum = 0L
      var peak = 0L
      var crossings = 0L
      var prev = 0
      while (i + 2 <= raw.length) {
        val s =
          if (bigEndian) (raw(i) << 8) | (raw(i + 1) & 0xff)
          else (raw(i + 1) << 8) | (raw(i) & 0xff)
        val a = math.abs(s.toLong)
        absSum += a
        if (a > peak) peak = a
        if (n > 0 && prev.toLong * s < 0) crossings += 1
        prev = s
        n += 1
        i += 2
      }
      AudioFeatures(fmt.getSampleRate.toInt, n, absSum, peak, crossings)
    } finally in.close()
  }

  /** 63-bit acoustic fingerprint (Haitsma–Kalker sign-of-energy-
    * difference shape) from DECODED samples: the stream splits into
    * 64 frames of `frameLen` samples, frame energy is the sum of
    * absolute sample values (frames past the end read 0), and bit k
    * is set iff energy(k) > energy(k+1). Like the image dHash, the
    * fingerprint survives container re-encoding because it hashes
    * decoded audio, not payload bytes.
    */
  def fingerprint63(payload: Array[Byte], frameLen: Int = 8): Long = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"expected 16-bit mono PCM, got $fmt")
      val raw = in.readAllBytes()
      val bigEndian = fmt.isBigEndian
      val energies = new Array[Long](64)
      var i = 0
      var n = 0
      while (i + 2 <= raw.length && n < 64 * frameLen) {
        val s =
          if (bigEndian) (raw(i) << 8) | (raw(i + 1) & 0xff)
          else (raw(i + 1) << 8) | (raw(i) & 0xff)
        energies(n / frameLen) += math.abs(s.toLong)
        n += 1
        i += 2
      }
      var h = 0L
      var k = 0
      while (k < 63) {
        if (energies(k) > energies(k + 1)) h |= (1L << k)
        k += 1
      }
      h
    } finally in.close()
  }
}
