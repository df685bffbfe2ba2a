package graft.mm

import java.io.{ByteArrayOutputStream, DataOutputStream}

/** A/V mux container: the multimodal payload shape that carries BOTH
  * modalities in one binary column — interleaved, tagged, length-prefixed
  * segments (1-byte kind, 4-byte big-endian length, payload), video segments
  * holding real PNG frames ([[ImageCodec]]) and audio segments holding real
  * WAV clips ([[AudioCodec]]). Demux must dispatch on the tag and hand each
  * segment to the right codec — the failure mode this query family pins is
  * exactly cross-modal confusion (an offset bug feeds PNG bytes to the WAV
  * reader and the gate breaks).
  */
object MuxCodec {

  final val KindVideo: Byte = 0
  final val KindAudio: Byte = 1

  def nSegs(seed: Long): Int = 2 + (seed % 5).toInt

  /** Segment k is video when k is even, audio when odd. */
  def kindOf(k: Int): Byte = if (k % 2 == 0) KindVideo else KindAudio

  def vSeed(seed: Long, k: Int): Long = seed + 997L * k
  def aSeed(seed: Long, k: Int): Long = seed + 131L * k

  def synthMux(seed: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    var k = 0
    while (k < nSegs(seed)) {
      val payload =
        if (kindOf(k) == KindVideo) ImageCodec.synthPng(vSeed(seed, k))
        else AudioCodec.synthWav(aSeed(seed, k))
      out.writeByte(kindOf(k).toInt)
      out.writeInt(payload.length)
      out.write(payload)
      k += 1
    }
    bos.toByteArray
  }

  /** Parse the container into (segment index, kind, payload bytes).
    * Truncated or corrupt containers fail with a diagnosable container
    * error naming the segment, not an index error deep in the copy.
    */
  def demux(c: Array[Byte]): Iterator[(Int, Byte, Array[Byte])] =
    Iterator.unfold((0, 0)) { case (off, idx) =>
      if (off >= c.length) None
      else {
        require(off + 5 <= c.length,
          s"mux container truncated in segment $idx header at offset $off " +
            s"(${c.length} bytes total)")
        val kind = c(off)
        val len = ((c(off + 1) & 0xff) << 24) | ((c(off + 2) & 0xff) << 16) |
          ((c(off + 3) & 0xff) << 8) | (c(off + 4) & 0xff)
        // Long arithmetic: off + 5 + len overflows Int for a corrupt len
        // near Int.MaxValue, which would slip past the bound check
        require(len >= 0 && off + 5 + len.toLong <= c.length,
          s"mux container segment $idx at offset $off declares $len payload " +
            s"bytes but only ${c.length - off - 5} remain")
        val payload = java.util.Arrays.copyOfRange(c, off + 5, off + 5 + len)
        Some(((idx, kind, payload), (off + 5 + len, idx + 1)))
      }
    }
}
