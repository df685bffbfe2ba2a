package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.mm.ImageCodec

/** The decode path must be REAL: payloads are actual PNG bytes and every
  * output is computed from the ImageIO-decoded raster. The independent check
  * is the closed-form pixel formula — the codec never sees it after encode,
  * so a decode defect (wrong color order, row stride, dropped rows) breaks
  * the comparison.
  */
class MmCodecSpec extends AnyFunSuite {

  test("payloads are genuine PNG files (magic + IHDR), not raw pixel dumps") {
    val png = ImageCodec.synthPng(42L)
    val magic = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    assert(png.take(8).sameElements(magic), "missing PNG signature")
    assert(new String(png.slice(12, 16), "US-ASCII") == "IHDR")
    // zlib-compressed scanlines: a raw dump of w*h*3 bytes would be larger
    assert(png.length != ImageCodec.width(42L) * ImageCodec.height(42L) * 3)
  }

  test("decode(encode(img)) reproduces the formula exactly for many seeds") {
    for (seed <- Seq(0L, 1L, 5L, 16L, 17L, 255L, 4999L)) {
      val dec = ImageCodec.decode(ImageCodec.synthPng(seed))
      assert(dec.w == ImageCodec.width(seed) && dec.h == ImageCodec.height(seed))
      for (y <- 0 until dec.h; x <- 0 until dec.w) {
        val p = dec.argb(y * dec.w + x)
        assert(ImageCodec.rOf(p) == ImageCodec.red(seed, x, y), s"r($seed,$x,$y)")
        assert(ImageCodec.gOf(p) == ImageCodec.green(seed, x, y), s"g($seed,$x,$y)")
        assert(ImageCodec.bOf(p) == ImageCodec.blue(seed, x, y), s"b($seed,$x,$y)")
      }
    }
  }

  test("boxResize matches a hand-computed 6x5 golden (edge blocks clipped)") {
    // 6x5 raster, single channel in R: pixel value = y*6 + x
    val argb = Array.tabulate(30)(i => (i << 16))
    val out = ImageCodec.boxResize(ImageCodec.Decoded(6, 5, argb), 4)
    assert(out.w == 2 && out.h == 2)
    // block (0,0): x 0-3, y 0-3 -> mean of {y*6+x} = (0+1+2+3 + 6..9 + 12..15 + 18..21)/16
    assert(ImageCodec.rOf(out.argb(0)) == (0 to 3).flatMap(y => (0 to 3).map(y * 6 + _)).sum / 16)
    // block (1,0): x 4-5 (clipped), y 0-3
    assert(ImageCodec.rOf(out.argb(1)) == (0 to 3).flatMap(y => (4 to 5).map(y * 6 + _)).sum / 8)
    // block (0,1): x 0-3, y 4 (clipped)
    assert(ImageCodec.rOf(out.argb(2)) == (24 to 27).sum / 4)
    // block (1,1): x 4-5, y 4
    assert(ImageCodec.rOf(out.argb(3)) == (28 + 29) / 2)
  }

  test("video container round-trips: every 2nd frame, real decode per frame") {
    val seed = 13L // nFrames = 1 + 13%7 = 7 -> sampled idx 0,2,4,6
    val frames = ImageCodec.sampleFrames(ImageCodec.synthVideo(seed), 2).toVector
    assert(frames.map(_._1) == Vector(0, 2, 4, 6))
    for ((idx, dec) <- frames) {
      val fs = ImageCodec.frameSeed(seed, idx)
      assert(dec.w == ImageCodec.width(fs) && dec.h == ImageCodec.height(fs))
      val (sr, sg, sb) = ImageCodec.channelSums(dec)
      var er = 0L; var eg = 0L; var eb = 0L
      for (y <- 0 until dec.h; x <- 0 until dec.w) {
        er += ImageCodec.red(fs, x, y); eg += ImageCodec.green(fs, x, y)
        eb += ImageCodec.blue(fs, x, y)
      }
      assert((sr, sg, sb) == ((er, eg, eb)), s"frame $idx channel sums")
    }
  }

  test("flip and rotate move every pixel to the right place, PNG-roundtripped") {
    val seed = 77L
    val dec = ImageCodec.decode(ImageCodec.synthPng(seed))
    val flip = ImageCodec.decode(ImageCodec.encodePng(ImageCodec.flipH(dec)))
    assert(flip.w == dec.w && flip.h == dec.h)
    for (y <- 0 until dec.h; x <- 0 until dec.w)
      assert(flip.argb(y * flip.w + x) == dec.argb(y * dec.w + (dec.w - 1 - x)),
        s"flip($x,$y)")
    val rot = ImageCodec.decode(ImageCodec.encodePng(ImageCodec.rot90(dec)))
    assert(rot.w == dec.h && rot.h == dec.w)
    for (y <- 0 until dec.h; x <- 0 until dec.w)
      assert(rot.argb(x * rot.w + (dec.h - 1 - y)) == dec.argb(y * dec.w + x),
        s"rot($x,$y)")
    // double flip is identity; four rotations are identity
    val f2 = ImageCodec.flipH(ImageCodec.flipH(dec))
    assert(f2.argb.sameElements(dec.argb))
    val r4 = Iterator.iterate(dec)(ImageCodec.rot90).drop(4).next()
    assert(r4.w == dec.w && r4.h == dec.h && r4.argb.sameElements(dec.argb))
  }

  test("luma histogram covers all pixels and matches the formula") {
    val seed = 100L
    val dec = ImageCodec.decode(ImageCodec.synthPng(seed))
    val hist = ImageCodec.lumaHist(dec)
    assert(hist.sum == dec.w.toLong * dec.h)
    val expected = new Array[Long](16)
    for (y <- 0 until dec.h; x <- 0 until dec.w) {
      val l = (ImageCodec.red(seed, x, y) * 299 + ImageCodec.green(seed, x, y) * 587 +
        ImageCodec.blue(seed, x, y) * 114) / 1000
      expected(l / 16) += 1
    }
    assert(hist.sameElements(expected))
  }

  test("aHash: stable under PNG re-encode, discriminative across seeds") {
    import graft.mm.ImageCodec
    val hashes = (0L until 64L).map { seed =>
      val dec = ImageCodec.decode(ImageCodec.synthPng(seed))
      val h1 = ImageCodec.aHash(dec)
      // re-encode the decoded raster and hash again: PNG is lossless, so
      // the perceptual hash must be bit-identical
      val bos = new java.io.ByteArrayOutputStream()
      val img = new java.awt.image.BufferedImage(dec.w, dec.h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, dec.w, dec.h, dec.argb, 0, dec.w)
      javax.imageio.ImageIO.write(img, "png", bos)
      val h2 = ImageCodec.aHash(ImageCodec.decode(bos.toByteArray))
      assert(h1 == h2, s"seed $seed: re-encode changed the hash")
      val (hi, lo, n) = h1
      assert(n >= 0 && n <= 64 &&
        n == java.lang.Long.bitCount(hi) + java.lang.Long.bitCount(lo))
      assert((hi >>> 32) == 0 && (lo >>> 32) == 0, "halves must be 32-bit")
      (hi, lo)
    }
    // different gradients should nearly always hash apart
    assert(hashes.distinct.size > 56, s"only ${hashes.distinct.size}/64 distinct")
  }

  test("mm_phash_pairs finds EXACTLY the brute-force Hamming<=7 pairs") {
    import graft.mm.ImageCodec
    val spark = SparkTest.session
    val sf = "/root/testdata/sf0.001"
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val hs = ids.map(id => id -> ImageCodec.aHash(ImageCodec.decode(
      ImageCodec.synthPng(ImageCodec.visualSeed(id))))).toMap
    val want = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      (ha, la, _) = hs(ids(i)); (hb, lb, _) = hs(ids(j))
      d = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
      if d <= 7
    } yield (ids(i), ids(j), d.toLong)).toSet
    val got = SparkEntry.queries("mm_phash_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want,
      s"got ${got.size} pairs, brute force says ${want.size}")
    assert(want.nonEmpty, "fixture should contain near-dup gradients")
  }
}
