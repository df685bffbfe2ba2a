package graft.geojson

import scala.collection.mutable.ArrayBuffer

/** Suzuki-Abe border following over a binary mask, replicating OpenCV
  * `findContours(mode=RETR_TREE, method=CHAIN_APPROX_NONE)` point order —
  * the reference's contour extractor (`utils.py:11-14`): outer borders
  * counterclockwise starting from the raster-first border pixel, hole
  * borders clockwise, every border pixel emitted.
  *
  * Points are (x, y) pairs, like OpenCV's.
  */
object Contours {

  // 8 directions, OpenCV order: 0=E, 1=NE, 2=N, 3=NW, 4=W, 5=SW, 6=S, 7=SE
  private val dx = Array(1, 1, 0, -1, -1, -1, 0, 1)
  private val dy = Array(0, -1, -1, -1, 0, 1, 1, 1)

  /** All borders of the mask (non-zero = foreground), in raster discovery
    * order. Each contour is a flat array of (x, y) pairs.
    */
  def findContours(mask: Array[Long], h: Int, w: Int): Seq[Array[Int]] = {
    // padded working image with Suzuki border marks; 1-pixel zero frame
    val W = w + 2
    val img = new Array[Int]((h + 2) * W)
    var i = 0
    while (i < h * w) {
      if (mask(i) != 0L) img((i / w + 1) * W + (i % w + 1)) = 1
      i += 1
    }
    val out = ArrayBuffer.empty[Array[Int]]
    var nbd = 1
    var y = 1
    while (y <= h) {
      var x = 1
      while (x <= w) {
        val p = img(y * W + x)
        if (p == 1 && img(y * W + x - 1) == 0) {
          nbd += 1
          out += fetch(img, W, x, y, isHole = false, nbd)
        } else if (p >= 1 && img(y * W + x + 1) == 0) {
          nbd += 1
          out += fetch(img, W, x, y, isHole = true, nbd)
        }
        x += 1
      }
      y += 1
    }
    out.toSeq
  }

  /** OpenCV `icvFetchContour`: trace one border starting at (x0, y0). */
  private def fetch(img: Array[Int], W: Int, x0: Int, y0: Int,
                    isHole: Boolean, nbd: Int): Array[Int] = {
    val pts = ArrayBuffer.empty[Int]
    def at(x: Int, y: Int) = img(y * W + x)
    var sEnd = if (isHole) 0 else 4
    var s = sEnd
    // clockwise scan for the previous border pixel
    var x1 = 0; var y1 = 0
    var continue = true
    while (continue) {
      s = (s - 1) & 7
      x1 = x0 + dx(s); y1 = y0 + dy(s)
      if (at(x1, y1) != 0 || s == sEnd) continue = false
    }
    if (at(x1, y1) == 0) {
      // isolated single pixel
      img(y0 * W + x0) = -nbd
      pts += (x0 - 1); pts += (y0 - 1)
      return pts.toArray
    }
    // follow the border
    var x3 = x0; var y3 = y0
    var x4 = 0; var y4 = 0
    var done = false
    while (!done) {
      sEnd = s
      // counterclockwise scan from s+1 for the next border pixel
      var scanning = true
      while (scanning) {
        s += 1
        x4 = x3 + dx(s & 7); y4 = y3 + dy(s & 7)
        if (at(x4, y4) != 0) scanning = false
      }
      s &= 7
      // Suzuki marking: negative iff the east neighbor was examined and
      // empty — OpenCV's `(unsigned)(s - 1) < (unsigned)s_end`
      if (s >= 1 && s - 1 < sEnd) img(y3 * W + x3) = -nbd
      else if (at(x3, y3) == 1) img(y3 * W + x3) = nbd
      pts += (x3 - 1); pts += (y3 - 1)
      if (x4 == x0 && y4 == y0 && x3 == x1 && y3 == y1) done = true
      else {
        x3 = x4; y3 = y4
        s = (s + 4) & 7
      }
    }
    pts.toArray
  }
}
