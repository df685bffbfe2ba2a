package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.geojson.Contours

/** Invariants of the Suzuki-Abe tracer on random masks (the goldens pin
  * exact OpenCV parity; these pin structural sanity on inputs the goldens
  * never see): contours are cycles of 8-connected foreground pixels, every
  * border pixel of the mask is covered by some contour, and interior-only
  * pixels never appear.
  */
class ContourPropertySpec extends AnyFunSuite {

  private def forAllN[A](gen: Gen[A], n: Int)(f: A => Unit): Unit =
    (0 until n).foreach(i => f(gen.pureApply(Gen.Parameters.default, Seed(i.toLong))))

  test("contours are 8-connected cycles covering exactly the border pixels") {
    val gen = for {
      h <- Gen.choose(1, 10); w <- Gen.choose(1, 10)
      cells <- Gen.listOfN(h * w, Gen.frequency((1, Gen.const(1L)), (1, Gen.const(0L))))
    } yield (h, w, cells.toArray)
    forAllN(gen, 300) { case (h, w, mask) =>
      val contours = Contours.findContours(mask, h, w)
      def fg(x: Int, y: Int) =
        x >= 0 && x < w && y >= 0 && y < h && mask(y * w + x) != 0L
      // border pixel: foreground with a 4-neighbor outside or background
      val borderPx = (for {
        y <- 0 until h; x <- 0 until w
        if fg(x, y)
        if !fg(x - 1, y) || !fg(x + 1, y) || !fg(x, y - 1) || !fg(x, y + 1)
      } yield (x, y)).toSet
      val traced = contours.flatMap { cc =>
        (0 until cc.length / 2).map(i => (cc(2 * i), cc(2 * i + 1)))
      }.toSet
      // every traced point is foreground
      traced.foreach { case (x, y) => assert(fg(x, y), s"traced non-fg ($x,$y)") }
      // every border pixel is traced by some contour
      borderPx.foreach { p =>
        assert(traced.contains(p), s"border pixel $p untraced (mask ${h}x$w)")
      }
      // consecutive contour points are 8-adjacent and the ring closes
      contours.foreach { cc =>
        val n = cc.length / 2
        if (n > 1) {
          (0 until n).foreach { i =>
            val j = (i + 1) % n
            val dx = math.abs(cc(2 * i) - cc(2 * j))
            val dy = math.abs(cc(2 * i + 1) - cc(2 * j + 1))
            assert(dx <= 1 && dy <= 1 && (dx + dy) > 0,
              s"contour step $i -> $j not 8-adjacent")
          }
        }
      }
    }
  }
}
