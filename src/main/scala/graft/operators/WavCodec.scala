package graft.operators

import java.io.ByteArrayInputStream
import javax.sound.sampled.AudioSystem

/** REAL audio codec path for the multimodal operators — `javax.sound.sampled`
  * ships with the JDK (RIFF/WAVE PCM parse, zero external jars), so the
  * decode step of the audio pipeline is an actual codec call (RIFF chunk
  * walk, fmt-chunk validation, frame extraction through the Java Sound SPI),
  * not a byte-derived stub.
  *
  * Determinism contract for the oracle: the synthetic corpus WAV's samples
  * are a pure integer function of (doc_id, i) ([[synthSample]]), and PCM16
  * is LOSSLESS — decode(encode(samples)) == samples bit-for-bit — so the
  * DuckDB oracle mirrors features computed from decoded samples by
  * recomputing the sample function directly, never touching WAV bytes
  * (exactly the [[PngCodec]] pattern). The reference analog is the grid
  * reader decoding real rasters rather than faking them
  * (/root/reference/functions/IO/netcdf_util.r:154-488).
  */
object WavCodec {

  /** Deterministic signed PCM16 sample for the synthetic corpus audio:
    * a linear congruence mod 2^16 shifted to signed range — trivially
    * mirrored in SQL (OracleSql.qMmAudio generates the same formula).
    */
  def synthSample(d: Long, i: Int): Short =
    (((1234L * d + 5678L * i + 91L) % 65536L) - 32768L).toShort

  /** A spec-valid mono PCM16 RIFF/WAVE payload whose samples are
    * [[synthSample]](docId, ·): canonical 44-byte header + little-endian
    * frames. Written by hand — PCM WAV *encoding* is a fixed byte layout,
    * the codec work is on the DECODE side ([[decodeWindows]]), which goes
    * through the JDK's real parser.
    */
  def synthWav(docId: Long, nSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
    val dataBytes = nSamples * 2
    val out = new Array[Byte](44 + dataBytes)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
      out(off + 2) = ((v >> 16) & 0xFF).toByte; out(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    def tag(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, off)
    tag(0, "RIFF"); le32(4, 36 + dataBytes); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16) // PCM fmt chunk is 16 bytes
    le16(20, 1) // audio format 1 = PCM
    le16(22, 1) // mono
    le32(24, sampleRate)
    le32(28, sampleRate * 2) // byte rate = rate * channels * 2
    le16(32, 2) // block align
    le16(34, 16) // bits per sample
    tag(36, "data"); le32(40, dataBytes)
    var i = 0
    while (i < nSamples) {
      le16(44 + 2 * i, synthSample(docId, i) & 0xFFFF)
      i += 1
    }
    out
  }

  /** Decoded-audio window features: format metadata plus per-window exact
    * integer sums of signed samples — the pooled "global feature" shape of
    * an audio embedding, kept in integer space so the SQL oracle is
    * bit-identical. Window of sample i = i·nWindows/nSamples (floor), the
    * same banding rule as [[PngCodec.decodeBands]].
    */
  final case class AudioWindows(sampleRate: Int, channels: Int,
                                nSamples: Int, windowSums: Array[Long])

  def decodeWindows(bytes: Array[Byte], nWindows: Int): AudioWindows = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
        s"expected little-endian PCM16, got $fmt")
      val channels = fmt.getChannels
      val frameSize = fmt.getFrameSize
      val pcm = in.readAllBytes()
      // the stream hands back only complete frames, so a truncated payload
      // surfaces as a SHORTFALL vs the header's declared frame count — check
      // it, or partial windows would silently pass as real sums
      val declared = in.getFrameLength
      require(pcm.length % frameSize == 0 &&
        (declared < 0 || pcm.length == declared * frameSize),
        s"truncated audio payload: ${pcm.length} bytes of $declared declared " +
          s"frames x $frameSize")
      val nSamples = pcm.length / 2 // total samples across channels
      val sums = new Array[Long](nWindows)
      var i = 0
      while (i < nSamples) {
        val s = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xFF)).toShort
        sums(math.min(i * nWindows / nSamples, nWindows - 1)) += s
        i += 1
      }
      AudioWindows(fmt.getSampleRate.toInt, channels, nSamples, sums)
    } finally in.close()
  }
}
