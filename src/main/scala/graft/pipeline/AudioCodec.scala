package graft.pipeline

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real, pure-JVM audio codec for the multimodal pipeline — the audio
  * sibling of [[ImageCodec]] (r18; the r17 verdict's #7 ask).
  *
  * Same two-tier staging as the image side:
  *
  *  1. [[parseWavHeader]] — hand-rolled RIFF/WAVE chunk walk (fmt
  *     fields + data size). Bytes-in/metadata-out with NO sample read:
  *     the cheap metadata pass over every payload at corpus scale,
  *     needing only the first ~100 bytes of each blob.
  *  2. [[pcm16Samples]] — the "decode" pass. WAV PCM is a CONTAINER,
  *     not compression, so decoding is exact 16-bit little-endian
  *     sample extraction from the data chunk — deterministic by
  *     definition, which is why the audio gate can be full-value exact
  *     where JPEG needed a tolerance.
  *
  * Encoding goes through the JDK's own `javax.sound.sampled`
  * (java.desktop module, no external dependency), so the hand-rolled
  * parse side is exercised against genuine codec output, not a
  * mirror of itself — the ImageCodec discipline.
  */
object AudioCodec {

  /** Typed metadata of one WAV payload, as parsed from its header. */
  final case class WavMeta(sampleRate: Int, channels: Int,
      bitsPerSample: Int, nFrames: Long)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 3).toLong & 0xff) << 24)) & 0xffffffffL

  /** Header-only metadata parse: walk the RIFF chunk list for `fmt `
    * and `data`. Returns None for truncated, non-RIFF, or non-PCM
    * payloads (a corpus pass filters those, it doesn't throw). Chunks
    * may appear in any order and carry odd-length padding per the RIFF
    * spec; both are handled.
    */
  def parseWavHeader(b: Array[Byte]): Option[WavMeta] = {
    if (b == null || b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var i = 12
    var sampleRate = 0; var channels = 0; var bits = 0; var blockAlign = 0
    var dataLen = -1L
    while (i + 8 <= b.length && (dataLen < 0 || sampleRate == 0)) {
      val id = new String(b, i, 4, "US-ASCII")
      val len = le32(b, i + 4)
      // the chunk's own declared length must cover the 16 fmt bytes —
      // a corrupt shorter fmt chunk would otherwise read bytes
      // belonging to the NEXT chunk and return garbage as Some(WavMeta)
      if (id == "fmt " && len >= 16 && i + 24 <= b.length) {
        val audioFormat = le16(b, i + 8)
        if (audioFormat != 1) return None // PCM only
        channels = le16(b, i + 10)
        sampleRate = le32(b, i + 12).toInt
        blockAlign = le16(b, i + 20)
        bits = le16(b, i + 22)
      } else if (id == "data") {
        dataLen = math.min(len, (b.length - i - 8).toLong)
      }
      if (len > b.length.toLong) return None // corrupt size — stop the walk
      i += 8 + len.toInt + (len.toInt & 1) // RIFF pads odd chunks
    }
    if (sampleRate <= 0 || channels <= 0 || bits <= 0 || dataLen < 0) None
    else Some(WavMeta(sampleRate, channels, bits,
      dataLen / math.max(1, if (blockAlign > 0) blockAlign else channels * (bits / 8))))
  }

  /** Encodes interleaved 16-bit PCM samples as a genuine WAV byte
    * stream via the JDK's `AudioSystem` writer. Used to PLANT the
    * deterministic audio corpus — real codec output gates the
    * hand-rolled parse.
    */
  def encodePcm16(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels,
      true /* signed */, false /* little-endian */)
    val stream = new AudioInputStream(new ByteArrayInputStream(bytes), fmt,
      samples.length.toLong / channels)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Sample extraction ("decode"): all interleaved 16-bit LE samples of
    * the data chunk, located by the same chunk walk as the header
    * parse. None when the payload isn't 16-bit PCM WAV.
    */
  def pcm16Samples(b: Array[Byte]): Option[Array[Short]] = {
    parseWavHeader(b) match {
      case Some(m) if m.bitsPerSample == 16 => ()
      case _ => return None
    }
    // second walk to find the data offset (the parse kept only sizes)
    var i = 12
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "US-ASCII")
      val len = le32(b, i + 4)
      if (id == "data") {
        val n = math.min(len, (b.length - i - 8).toLong).toInt / 2
        val out = new Array[Short](n)
        var k = 0
        while (k < n) {
          out(k) = le16(b, i + 8 + 2 * k).toShort
          k += 1
        }
        return Some(out)
      }
      if (len > b.length.toLong) return None
      i += 8 + len.toInt + (len.toInt & 1)
    }
    None
  }
}
