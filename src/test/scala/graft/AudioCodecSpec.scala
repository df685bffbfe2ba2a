package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.mm.AudioCodec

/** The audio decode path must be REAL: payloads are actual RIFF/WAV bytes and
  * every output is computed from the AudioSystem-decoded samples. The
  * independent check is the closed-form sample formula — the codec never sees
  * it after encode, so a decode defect (endianness, channel interleave,
  * frame-length parsing) breaks the comparison.
  */
class AudioCodecSpec extends AnyFunSuite {

  test("payloads are genuine WAV files (RIFF/WAVE magic), not raw PCM dumps") {
    val wav = AudioCodec.synthWav(42L)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    // a RIFF container is strictly larger than its PCM payload
    val frames = AudioCodec.nFrames(42L)
    assert(wav.length > frames * AudioCodec.channels(42L) * 2)
  }

  test("decode(encode(pcm)) reproduces the formula exactly for many seeds") {
    for (seed <- Seq(0L, 1L, 2L, 3L, 210L, 211L, 4999L)) {
      val p = AudioCodec.decode(AudioCodec.synthWav(seed))
      assert(p.channels == AudioCodec.channels(seed), s"channels($seed)")
      assert(p.frames == AudioCodec.nFrames(seed), s"frames($seed)")
      for (i <- 0 until p.frames; c <- 0 until p.channels) {
        assert(p.data(i * p.channels + c) == AudioCodec.sample(seed, i, c),
          s"sample($seed, i=$i, c=$c)")
      }
    }
  }

  test("sample values span negative and positive (sign extension is live)") {
    val p = AudioCodec.decode(AudioCodec.synthWav(7L))
    assert(p.data.min < 0 && p.data.max > 0)
    assert(p.data.forall(v => v >= -2048 && v <= 2047))
  }

  test("decimate keeps every stride-th frame, all channels, clipped tail") {
    val seed = 3L // stereo
    val p = AudioCodec.decode(AudioCodec.synthWav(seed))
    val half = AudioCodec.decimate(p, 2)
    assert(half.channels == p.channels)
    assert(half.frames == (p.frames + 1) / 2)
    for (j <- 0 until half.frames; c <- 0 until half.channels)
      assert(half.data(j * half.channels + c) == p.data(2 * j * p.channels + c))
  }

  test("mux container round-trips both modalities with correct dispatch") {
    import graft.mm.{ImageCodec, MuxCodec}
    for (seed <- Seq(0L, 3L, 6L, 11L)) {
      val segs = MuxCodec.demux(MuxCodec.synthMux(seed)).toSeq
      assert(segs.length == MuxCodec.nSegs(seed))
      for ((k, kind, payload) <- segs) {
        assert(kind == MuxCodec.kindOf(k))
        if (kind == MuxCodec.KindVideo) {
          val dec = ImageCodec.decode(payload)
          assert(dec.w == ImageCodec.width(MuxCodec.vSeed(seed, k)))
          assert(dec.h == ImageCodec.height(MuxCodec.vSeed(seed, k)))
        } else {
          val p = AudioCodec.decode(payload)
          assert(p.frames == AudioCodec.nFrames(MuxCodec.aSeed(seed, k)))
          assert(p.channels == AudioCodec.channels(MuxCodec.aSeed(seed, k)))
        }
      }
    }
  }

  test("corrupt mux containers fail diagnosably, naming the segment") {
    import graft.mm.MuxCodec
    val good = MuxCodec.synthMux(7L)
    // truncated mid-header: fewer than 5 bytes remain
    val truncated = java.util.Arrays.copyOfRange(good, 0, good.length)
    val e1 = intercept[IllegalArgumentException] {
      MuxCodec.demux(java.util.Arrays.copyOfRange(good, 0, 3)).toSeq
    }
    assert(e1.getMessage.contains("truncated in segment 0"), e1.getMessage)
    // over-declaring length: segment 0 claims more payload than remains
    val overrun = good.clone()
    overrun(1) = 0x7f.toByte // blow up the big-endian length prefix
    val e2 = intercept[IllegalArgumentException] {
      MuxCodec.demux(overrun).toSeq
    }
    assert(e2.getMessage.contains("segment 0") &&
      e2.getMessage.contains("declares"), e2.getMessage)
    // a length near Int.MaxValue must not slip past the bound check via
    // Int overflow of off + 5 + len
    val wrap = good.clone()
    wrap(1) = 0x7f.toByte; wrap(2) = 0xff.toByte
    wrap(3) = 0xff.toByte; wrap(4) = 0xf0.toByte
    val e3 = intercept[IllegalArgumentException] {
      MuxCodec.demux(wrap).toSeq
    }
    assert(e3.getMessage.contains("declares"), e3.getMessage)
    assert(truncated.sameElements(good)) // inputs never mutated in place
  }

  test("re-encode round-trip is bit-faithful to the decimated samples") {
    for (seed <- Seq(4L, 5L)) {
      val half = AudioCodec.decimate(AudioCodec.decode(AudioCodec.synthWav(seed)), 2)
      val again = AudioCodec.decode(AudioCodec.encode(half))
      assert(again.channels == half.channels && again.frames == half.frames)
      assert(again.data.sameElements(half.data))
    }
  }
}
