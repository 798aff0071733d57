package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/**
 * Real audio codec on the JDK's built-in `javax.sound.sampled` readers and
 * writers (WAV/AIFF/AU — no external dependency), mirroring [[ImageCodec]]:
 * static methods so the wrapping Catalyst expressions inline into
 * whole-stage codegen.
 *
 * The generator side ([[encodeWav]]) synthesizes a deterministic PCM WAV per
 * seed — the sandbox stand-in for real crawled audio bytes (reference
 * capability analog: the C360 media columns its agent pipelines consume).
 * The decode side is the REAL thing: [[decode]] parses the container through
 * AudioSystem and reads the full PCM body, reporting the actual sample rate,
 * frame count (from bytes actually decoded, not the header claim), channel
 * count and container type. Video container metadata is parsed for real by
 * [[VideoCodec]]; only video FRAME PIXELS remain opaque (the JDK ships no
 * video frame codec).
 */
object AudioCodec {

  private def mix64(z0: Long): Long = {
    // splitmix64 finalizer (public-domain constant set)
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val Rates = Array(16000, 22050, 32000, 44100, 48000)

  /** Deterministic (sampleRate, nFrames) a seed encodes to — for tests. */
  def params(seed: Long): (Int, Int) = {
    val m = mix64(seed)
    (Rates(Math.floorMod(m, Rates.length.toLong).toInt),
      200 + Math.floorMod(m >>> 8, 1800L).toInt)
  }

  /** Deterministic mono 16-bit PCM WAV: seeded sample values, real RIFF
    * container written by the JDK's WAVE writer. */
  def encodeWav(seed: Long): Array[Byte] = {
    val (rate, n) = params(seed)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (mix64(seed ^ (0xa0d10L + i)) & 0xffffL).toInt - 32768
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false) // PCM s16le mono
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Decode audio bytes → (sample_rate, n_frames, channels, codec)
    * InternalRow; null when the bytes are not decodable audio (a corrupt
    * payload at 100 TB must never kill a stage — mirror of
    * [[ImageCodec.decode]]). `n_frames` counts frames actually read from the
    * PCM body, so a truncated container reports its true decoded length. */
  def decode(payload: Array[Byte]): InternalRow = {
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val frameSize = math.max(1, fmt.getFrameSize)
        var bytesRead = 0L
        val buf = new Array[Byte](8192)
        var r = 0
        while ({ r = ais.read(buf); r >= 0 }) bytesRead += r // full PCM decode
        val ff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(payload))
        val row = new GenericInternalRow(4)
        row.update(0, fmt.getSampleRate.toInt)
        row.update(1, (bytesRead / frameSize).toInt)
        row.update(2, fmt.getChannels)
        row.update(3, UTF8String.fromString(
          ff.getType.toString.toLowerCase(java.util.Locale.ROOT)))
        row
      } finally ais.close()
    } catch { case _: Exception => null }
  }
}
