package graft.operators

import java.io.ByteArrayInputStream

/** Compressed-audio decode via the JDK's own `javax.sound.sampled`
  * (`java.desktop` module, like `ImageIoCodec`): the built-in codec chain
  * converts G.711 μ-law and A-law WAV/AU payloads — the classic telephony
  * compressions — to signed 16-bit PCM with zero new dependencies. Output is
  * normalized to the same `WavCodec.Audio` shape the pure-JVM PCM codec
  * produces, so the exact-integer feature pass is shared.
  *
  * Perceptual codecs (MP3/AAC/Opus/video) have NO decoder in the JDK — they
  * are the one family that legitimately stays behind the deterministic stub
  * seam until a native library is provisioned.
  */
object JavaSoundCodec {

  /** Decoded sample cap — same bomb-guard posture as the image codecs
    * (compressed bytes say nothing about decoded size). */
  val MaxSamples: Long = 64L * 1024 * 1024

  def decode(bytes: Array[Byte]): Option[WavCodec.Audio] = {
    if (bytes == null || bytes.length < 12) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val src = in.getFormat
        if (src.getChannels <= 0 || src.getSampleRate <= 0) return None
        val rate = src.getSampleRate
        val channels = src.getChannels
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          rate, 16, channels, channels * 2, rate, false) // little-endian
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
        try {
          val cap = MaxSamples * 2
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](16384)
          var total = 0L
          var n = pcm.read(buf)
          while (n >= 0 && total <= cap) {
            bos.write(buf, 0, n)
            total += n
            n = pcm.read(buf)
          }
          if (total > cap) return None // decompression bomb
          val raw = bos.toByteArray
          val nSamples = raw.length / 2
          if (nSamples == 0) return None
          val samples = new Array[Int](nSamples)
          var i = 0
          while (i < nSamples) {
            samples(i) =
              (((raw(2 * i) & 0xff) | ((raw(2 * i + 1) & 0xff) << 8)).toShort).toInt
            i += 1
          }
          Some(WavCodec.Audio(math.round(rate), channels, 16,
            nSamples / channels, samples))
        } finally pcm.close()
      } finally in.close()
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }
}
