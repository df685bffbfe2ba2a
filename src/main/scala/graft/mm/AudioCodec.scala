package graft.mm

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}

/** Real audio codec over `javax.sound.sampled` (the WAV/RIFF reader+writer
  * ships with the JDK — the audio twin of [[ImageCodec]]'s ImageIO/PNG).
  *
  * The audio queries synthesize deterministic 16-bit PCM from the closed-form
  * per-sample formula below, encode it to REAL WAV bytes executor-side (the
  * opaque binary payload an audio corpus would carry), then decode with
  * AudioSystem and compute every output from the decoded samples. The formula
  * is also expressible in plain SQL, so the DuckDB oracle re-derives the same
  * outputs with no codec at all — a hash match proves the RIFF encode/decode
  * round-trip is real, not a checksum over undecoded bytes.
  *
  * The formula constants MUST stay in sync with the oracle SQL in
  * [[graft.rel.AudioOps]].
  */
object AudioCodec {

  val SampleRate = 8000

  // AudioSystem.getAudioInputStream / write consult the provider registry
  // (JDK13Services) behind a JVM-wide lock on EVERY call — at 32 executor
  // threads that lock serializes the whole stage (measured 4.9k clips/s vs
  // 11.6k single-threaded). Resolve the JDK's RIFF reader/writer SPI once;
  // the provider instances are stateless and safe to share across threads.
  private val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    var found: javax.sound.sampled.spi.AudioFileWriter = null
    while (found == null && it.hasNext) {
      val w = it.next()
      if (w.isFileTypeSupported(AudioFileFormat.Type.WAVE)) found = w
    }
    require(found != null, "no RIFF/WAVE AudioFileWriter SPI in this JDK")
    found
  }

  // selected by CAPABILITY, not class name: synthesize a probe clip with
  // the writer above and keep the first reader that actually parses it
  // back to s16le PCM (provider order varies across JDK vendors, and e.g.
  // WaveFloatFileReader would match a name check but reject integer PCM)
  private val wavReader: javax.sound.sampled.spi.AudioFileReader = {
    val probe: Array[Byte] = {
      val fmt = new AudioFormat(SampleRate.toFloat, 16, 1, true, false)
      val ais = new AudioInputStream(
        new ByteArrayInputStream(new Array[Byte](8)), fmt, 4L)
      val bos = new ByteArrayOutputStream()
      wavWriter.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    var found: javax.sound.sampled.spi.AudioFileReader = null
    while (found == null && it.hasNext) {
      val r = it.next()
      try {
        val f = r.getAudioInputStream(new ByteArrayInputStream(probe)).getFormat
        if (f.getSampleSizeInBits == 16 && !f.isBigEndian &&
          f.getEncoding == AudioFormat.Encoding.PCM_SIGNED) found = r
      } catch { case _: Exception => () }
    }
    require(found != null, "no RIFF/WAVE AudioFileReader SPI in this JDK")
    found
  }

  /** Mono or interleaved stereo, alternating by seed. */
  def channels(seed: Long): Int = 1 + (seed % 2).toInt

  /** 400..610 sample frames (50–76 ms at 8 kHz). */
  def nFrames(seed: Long): Int = 400 + (seed % 211).toInt

  /** Closed-form sample value in [-2048, 2047]; all operands of `%` are
    * non-negative so Scala and SQL agree.
    */
  def sample(seed: Long, i: Int, c: Int): Int =
    ((i.toLong * 7 + c.toLong * 11 + seed * 13) % 4096).toInt - 2048

  /** Deterministic PCM -> real WAV bytes (JDK RIFF writer). */
  def synthWav(seed: Long): Array[Byte] = {
    val ch = channels(seed); val n = nFrames(seed)
    val pcm = new Array[Byte](n * ch * 2)
    var i = 0
    while (i < n) {
      var c = 0
      while (c < ch) {
        val v = sample(seed, i, c)
        val off = (i * ch + c) * 2
        pcm(off) = (v & 0xff).toByte
        pcm(off + 1) = ((v >> 8) & 0xff).toByte
        c += 1
      }
      i += 1
    }
    encodeWav(pcm, ch, n)
  }

  /** s16le interleaved PCM frames -> WAV container bytes. */
  def encodeWav(pcm: Array[Byte], ch: Int, frames: Int): Array[Byte] = {
    val fmt = new AudioFormat(SampleRate.toFloat, 16, ch, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    wavWriter.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decoded clip: interleaved sample values, `data(i * channels + c)`. */
  final case class Pcm(channels: Int, frames: Int, data: Array[Int])

  def decode(wav: Array[Byte]): Pcm = {
    val ais = wavReader.getAudioInputStream(new ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
      s"expected s16le PCM, got $fmt")
    val ch = fmt.getChannels
    val frames = ais.getFrameLength.toInt
    val bytes = ais.readAllBytes()
    require(bytes.length == frames * ch * 2,
      s"short read: ${bytes.length} bytes for $frames x $ch frames")
    val out = new Array[Int](frames * ch)
    var i = 0
    while (i < out.length) {
      // sign-extend through the high byte's arithmetic shift
      out(i) = (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
      i += 1
    }
    Pcm(ch, frames, out)
  }

  /** Decimate by `stride` (keep frames i % stride == 0, all channels). */
  def decimate(p: Pcm, stride: Int): Pcm = {
    val n2 = (p.frames + stride - 1) / stride
    val out = new Array[Int](n2 * p.channels)
    var j = 0
    var i = 0
    while (i < p.frames) {
      var c = 0
      while (c < p.channels) {
        out(j * p.channels + c) = p.data(i * p.channels + c)
        c += 1
      }
      j += 1
      i += stride
    }
    Pcm(p.channels, n2, out)
  }

  /** Re-encode a decoded clip (the resample write-back path). */
  def encode(p: Pcm): Array[Byte] = {
    val pcm = new Array[Byte](p.data.length * 2)
    var i = 0
    while (i < p.data.length) {
      val v = p.data(i)
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    encodeWav(pcm, p.channels, p.frames)
  }
}
