package graft.mm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataOutputStream}
import javax.imageio.ImageIO

/** Real image codec over `javax.imageio` (PNG ships with the JDK — the only
  * codec available in this zero-egress sandbox).
  *
  * The multimodal queries synthesize deterministic RGB images from the
  * closed-form per-pixel formula below, encode them to REAL PNG bytes
  * executor-side (the opaque binary payload a multimodal corpus would carry),
  * then decode with ImageIO and compute every output from the decoded
  * pixels. Because the formula is also expressible in plain SQL, the DuckDB
  * oracle re-derives the same outputs with no codec at all — a hash match
  * proves the decode path is real, not a checksum over undecoded bytes.
  *
  * The formula constants here MUST stay in sync with the oracle SQL in
  * [[graft.rel.PipelineOps]].
  */
object ImageCodec {

  // ImageIO defaults to a disk-backed stream cache; executors should stay
  // in-memory (the images are tiny and /tmp churn at 32 threads is waste)
  ImageIO.setUseCache(false)

  /** Closed-form pixel channels; all operands non-negative so `%` agrees
    * between Scala and SQL.
    *
    * Each channel is the original affine gradient PLUS a per-seed bilinear
    * texture term `(x + t1)(y + t2) % 256`, where t1/t2 are multiplicative
    * residues of the seed under coprime moduli. The texture is the scale
    * fix for the aHash family: an affine gradient's block-mean bit pattern
    * is a near-constant half-plane (the hash had only ~2^16 effective
    * classes — seed mod 256/17/13), so on a 50 k-doc mirror the banded
    * Hamming pair graph collapsed into ONE 27.4 M-pair component and
    * cross-copy collisions grew quadratically in the upscale factor K.
    * The bilinear term wraps mod 256 many times per block, making block
    * means seed-diverse, so unrelated documents hash apart and near-dup
    * pair volume is driven by [[visualSeed]]'s PLANTED twins — linear in
    * corpus size, the property the 100 TB dedup path needs.
    */
  def tex1(seed: Long): Long = (seed * 73 + 11) % 251
  def tex2(seed: Long): Long = (seed * 149 + 29) % 241

  def red(seed: Long, x: Int, y: Int): Int =
    ((x * 7 + y * 3 + seed + (x + tex1(seed)) * (y + tex2(seed))) % 256).toInt
  def green(seed: Long, x: Int, y: Int): Int =
    ((x * 5 + y * 11 + seed * 2 + (x + tex2(seed)) * (y + tex1(seed) + 7)) % 256).toInt
  def blue(seed: Long, x: Int, y: Int): Int =
    ((x * 13 + y * 7 + seed * 3 + (x + tex1(seed) + 3) * (y + tex2(seed) + 5)) % 256).toInt

  def width(seed: Long): Int = 16 + (seed % 17).toInt
  def height(seed: Long): Int = 16 + (seed % 13).toInt

  /** Visual seed of a DOCUMENT's image: documents with `doc_id % 19 == 7`
    * render the raster of `doc_id - 3` — deterministic planted visual
    * twins (the image corpus's analog of the text corpus's planted
    * near-dup residues), so the phash gates find a pair population that
    * is exactly linear in corpus size at every scale factor and under the
    * K-times mirror (`tools/make_upscaled.py`), where each copy's twins
    * stay within-copy because key offsets move pairs together. Video /
    * audio / mux payloads key off raw per-frame seeds and are NOT
    * twinned.
    */
  def visualSeed(docId: Long): Long =
    if (docId % 19 == 7) docId - 3 else docId

  /** The SAME definitions as SQL snippets, parameterized by the seed
    * expression — the single source every DuckDB oracle interpolates
    * (PipelineOps / AudioOps), so engine and oracle formulas cannot
    * drift (the MINHASH_MINS_SQL discipline applied to pixels). DuckDB
    * `%` on the non-negative BIGINTs here matches Scala Long `%`.
    */
  def tex1Sql(s: String): String = s"(($s) * 73 + 11) % 251"
  def tex2Sql(s: String): String = s"(($s) * 149 + 29) % 241"
  def rSql(s: String): String =
    s"(x * 7 + y * 3 + ($s) + (x + ${tex1Sql(s)}) * (y + ${tex2Sql(s)})) % 256"
  def gSql(s: String): String =
    s"(x * 5 + y * 11 + ($s) * 2 + (x + ${tex2Sql(s)}) * (y + ${tex1Sql(s)} + 7)) % 256"
  def bSql(s: String): String =
    s"(x * 13 + y * 7 + ($s) * 3 + (x + ${tex1Sql(s)} + 3) * (y + ${tex2Sql(s)} + 5)) % 256"
  def visualSeedSql(id: String): String =
    s"CASE WHEN ($id) % 19 = 7 THEN ($id) - 3 ELSE ($id) END"

  /** Deterministic RGB image -> real PNG bytes (ImageIO encoder). */
  def synthPng(seed: Long): Array[Byte] = {
    val w = width(seed); val h = height(seed)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (red(seed, x, y) << 16) | (green(seed, x, y) << 8) | blue(seed, x, y))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decoded raster: packed ARGB row-major. */
  final case class Decoded(w: Int, h: Int, argb: Array[Int])

  def decode(png: Array[Byte]): Decoded = {
    val img = ImageIO.read(new ByteArrayInputStream(png))
    val w = img.getWidth; val h = img.getHeight
    Decoded(w, h, img.getRGB(0, 0, w, h, null, 0, w))
  }

  @inline def rOf(p: Int): Int = (p >> 16) & 0xff
  @inline def gOf(p: Int): Int = (p >> 8) & 0xff
  @inline def bOf(p: Int): Int = p & 0xff

  /** Per-channel pixel sums over a decoded raster. */
  def channelSums(d: Decoded): (Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < d.argb.length) {
      val p = d.argb(i); sr += rOf(p); sg += gOf(p); sb += bOf(p); i += 1
    }
    (sr, sg, sb)
  }

  /** Perceptual average-hash (aHash): integer luma (299r+587g+114b)/1000,
    * an 8x8 block partition via the floor mapping by = y*8/h (exactly 8
    * bins for any h >= 8), per-block mean luma, and one bit per block —
    * set when the block beats the global block mean. Pure positive-integer
    * arithmetic end-to-end, so the DuckDB oracle reproduces the hash
    * bit-for-bit from the synthetic raster definition. Returned as two
    * 32-bit halves in longs (bit 63 would collide with the sign) plus the
    * popcount.
    */
  def aHash(d: Decoded): (Long, Long, Long) = {
    val bsum = new Array[Long](64); val bcnt = new Array[Long](64)
    var y = 0
    while (y < d.h) {
      val by = y * 8 / d.h
      var x = 0
      while (x < d.w) {
        val p = d.argb(y * d.w + x)
        val k = by * 8 + x * 8 / d.w
        bsum(k) += (299 * rOf(p) + 587 * gOf(p) + 114 * bOf(p)) / 1000
        bcnt(k) += 1
        x += 1
      }
      y += 1
    }
    val bv = Array.tabulate(64)(k => bsum(k) / bcnt(k))
    val mean = bv.sum / 64
    var hi = 0L; var lo = 0L; var n = 0L
    var k = 0
    while (k < 64) {
      if (bv(k) > mean) {
        n += 1
        if (k >= 32) hi |= 1L << (k - 32) else lo |= 1L << k
      }
      k += 1
    }
    (hi, lo, n)
  }

  /** Integer box-average downsample by factor `f`; edge blocks are clipped
    * (smaller divisor), division floors — matches SQL `sum(c) // count(*)`.
    */
  def boxResize(d: Decoded, f: Int): Decoded = {
    val w2 = (d.w + f - 1) / f; val h2 = (d.h + f - 1) / f
    val out = new Array[Int](w2 * h2)
    var by = 0
    while (by < h2) {
      var bx = 0
      while (bx < w2) {
        var sr = 0L; var sg = 0L; var sb = 0L; var n = 0
        val yEnd = math.min((by + 1) * f, d.h)
        val xEnd = math.min((bx + 1) * f, d.w)
        var y = by * f
        while (y < yEnd) {
          var x = bx * f
          while (x < xEnd) {
            val p = d.argb(y * d.w + x)
            sr += rOf(p); sg += gOf(p); sb += bOf(p); n += 1
            x += 1
          }
          y += 1
        }
        out(by * w2 + bx) =
          ((sr / n).toInt << 16) | ((sg / n).toInt << 8) | (sb / n).toInt
        bx += 1
      }
      by += 1
    }
    Decoded(w2, h2, out)
  }

  /** Horizontal flip: out(x, y) = in(w-1-x, y). */
  def flipH(d: Decoded): Decoded = {
    val out = new Array[Int](d.argb.length)
    var y = 0
    while (y < d.h) {
      var x = 0
      while (x < d.w) {
        out(y * d.w + x) = d.argb(y * d.w + (d.w - 1 - x))
        x += 1
      }
      y += 1
    }
    Decoded(d.w, d.h, out)
  }

  /** Clockwise 90-degree rotation: out(x', y') = in(y', h-1-x') with the
    * output sized (h, w) — i.e. source pixel (x, y) lands at (h-1-y, x).
    */
  def rot90(d: Decoded): Decoded = {
    val out = new Array[Int](d.argb.length)
    val w2 = d.h; val h2 = d.w
    var y = 0
    while (y < d.h) {
      var x = 0
      while (x < d.w) {
        out(x * w2 + (d.h - 1 - y)) = d.argb(y * d.w + x)
        x += 1
      }
      y += 1
    }
    Decoded(w2, h2, out)
  }

  /** Re-encode a decoded raster as PNG (the augment write-back path). */
  def encodePng(d: Decoded): Array[Byte] = {
    val img = new BufferedImage(d.w, d.h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, d.w, d.h, d.argb, 0, d.w)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Position-weighted red sum — orientation-sensitive: Σ x·r over pixels.
    * A flip or rotation that mishandles coordinates changes it.
    */
  def weightedX(d: Decoded): Long = {
    var s = 0L
    var y = 0
    while (y < d.h) {
      var x = 0
      while (x < d.w) { s += x.toLong * rOf(d.argb(y * d.w + x)); x += 1 }
      y += 1
    }
    s
  }

  /** Integer BT.601-ish luma bucketed into 16 bins. */
  @inline def lumaBin(p: Int): Int =
    ((rOf(p) * 299 + gOf(p) * 587 + bOf(p) * 114) / 1000) / 16

  def lumaHist(d: Decoded): Array[Long] = {
    val hist = new Array[Long](16)
    var i = 0
    while (i < d.argb.length) { hist(lumaBin(d.argb(i))) += 1; i += 1 }
    hist
  }

  /** Integer luma mass of the raster: sum of (299r + 587g + 114b) / 1000
    * per pixel — the per-frame scalar the keyframe detector thresholds on.
    */
  def lumaSum(d: Decoded): Long = {
    var s = 0L
    var i = 0
    while (i < d.argb.length) {
      val p = d.argb(i)
      s += (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
        (p & 0xff) * 114) / 1000
      i += 1
    }
    s
  }

  // ---- "video": a container of length-prefixed PNG frames -----------------

  def nFrames(seed: Long): Int = 1 + (seed % 7).toInt
  def frameSeed(seed: Long, f: Int): Long = seed + 997L * f

  /** Multi-frame payload: each frame is a real PNG with a 4-byte big-endian
    * length prefix — the variable-length container shape a video column has.
    */
  def synthVideo(seed: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    var f = 0
    while (f < nFrames(seed)) {
      val png = synthPng(frameSeed(seed, f))
      out.writeInt(png.length)
      out.write(png)
      f += 1
    }
    bos.toByteArray
  }

  /** Parse the container and decode every `stride`-th frame. */
  def sampleFrames(container: Array[Byte], stride: Int): Iterator[(Int, Decoded)] = {
    val frames = Iterator.unfold((0, 0)) { case (off, idx) =>
      if (off >= container.length) None
      else {
        val len = ((container(off) & 0xff) << 24) | ((container(off + 1) & 0xff) << 16) |
          ((container(off + 2) & 0xff) << 8) | (container(off + 3) & 0xff)
        val frame = java.util.Arrays.copyOfRange(container, off + 4, off + 4 + len)
        Some(((idx, frame), (off + 4 + len, idx + 1)))
      }
    }
    frames.collect { case (idx, bytes) if idx % stride == 0 => (idx, decode(bytes)) }
  }
}
