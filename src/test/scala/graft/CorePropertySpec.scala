package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core.{CCL, Kernels, Nd, Regions}
import graft.tiles.Tile

/** Property tests the reference lacks (SURVEY.md §5 port plan): region-math
  * invariants, CCL vs brute-force flood fill, and pipeline invariants on
  * random images.
  */
class CorePropertySpec extends AnyFunSuite {

  /** Deterministic property driver (no scalatestplus bridge in the offline
    * cache): evaluate `f` over `n` seeded samples of `gen`.
    */
  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: ((A, B)) => Unit): Unit =
    forAll(Gen.zip(g1, g2))(f)

  private val locGrid2d = for {
    ny <- Gen.choose(1, 4); nx <- Gen.choose(1, 4)
    y <- Gen.choose(0, ny - 1); x <- Gen.choose(0, nx - 1)
  } yield (Array(y, x), Array(ny, nx))

  private val locGrid3d = for {
    nz <- Gen.choose(1, 3); ny <- Gen.choose(1, 3); nx <- Gen.choose(1, 3)
    z <- Gen.choose(0, nz - 1); y <- Gen.choose(0, ny - 1); x <- Gen.choose(0, nx - 1)
  } yield (Array(z, y, x), Array(nz, ny, nx))

  test("validOverlaps: counts, uniqueness, dimension-descending order") {
    forAll(Gen.oneOf(locGrid2d, locGrid3d)) { case (loc, grid) =>
      val regions = Regions.validOverlaps(loc, grid)
      // each region's neighbor must exist
      regions.foreach { levels =>
        levels.indices.foreach { a =>
          levels(a) match {
            case 1 => assert(loc(a) < grid(a) - 1)
            case 0 => assert(loc(a) > 0)
            case _ =>
          }
        }
      }
      // unique and dimension-descending (the precedence rule relies on it)
      assert(regions.map(_.toSeq).distinct.size == regions.size)
      val dims = regions.map(Regions.regionDim)
      assert(dims == dims.sortBy(-_))
      // interior chunk of a big grid sees all 3^d - 1 regions
      if (loc.indices.forall(a => loc(a) > 0 && loc(a) < grid(a) - 1))
        assert(regions.size == math.pow(3, loc.length).toInt - 1)
    }
  }

  test("merging overlaps are exactly the odd-parity subset") {
    forAll(locGrid2d) { case (loc, grid) =>
      val all = Regions.validOverlaps(loc, grid).map(_.toSeq).toSet
      val merging = Regions.mergingOverlaps(loc, grid)
      merging.foreach(lv => assert(Regions.parityDrop(loc, lv)))
      assert((all -- merging.map(_.toSeq)).forall(lv =>
        !Regions.parityDrop(loc, lv.toArray)))
    }
  }

  test("every margin pixel belongs to at least one region source box") {
    forAll(locGrid2d, Gen.choose(1, 2)) { case ((loc, grid), ov) =>
      val shape = Array(6, 6)
      val overlaps = Array(ov, ov)
      val interior = Regions.interiorBox(loc, grid, overlaps, shape)
      val covered = Array.ofDim[Boolean](36)
      for (levels <- Regions.validOverlaps(loc, grid))
        Nd.foreachIndex(shape, Regions.sourceBox(loc, grid, overlaps, levels, shape))(
          covered(_) = true)
      val inInterior = Array.ofDim[Boolean](36)
      Nd.foreachIndex(shape, interior)(inInterior(_) = true)
      for (i <- 0 until 36 if !inInterior(i))
        assert(covered(i), s"margin pixel $i uncovered at loc=${loc.toSeq} grid=${grid.toSeq}")
    }
  }

  test("CCL matches brute-force flood fill on random binary images") {
    val img = for {
      h <- Gen.choose(1, 9); w <- Gen.choose(1, 9)
      cells <- Gen.listOfN(h * w, Gen.oneOf(0L, 0L, 1L))
    } yield (Array(h, w), cells.toArray)
    forAll(img) { case (shape, data) =>
      val labels = CCL.label(data, shape)
      val Array(h, w) = shape
      // flood fill from each pixel; compare equivalence classes
      def flood(seed: Int): Set[Int] = {
        val stack = scala.collection.mutable.Stack(seed)
        val seen = scala.collection.mutable.Set(seed)
        while (stack.nonEmpty) {
          val p = stack.pop()
          val (y, x) = (p / w, p % w)
          for ((ny, nx) <- Seq((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)))
            if (ny >= 0 && ny < h && nx >= 0 && nx < w) {
              val q = ny * w + nx
              if (data(q) == data(seed) && !seen(q)) { seen += q; stack.push(q) }
            }
        }
        seen.toSet
      }
      for (i <- data.indices) {
        if (data(i) == 0L) assert(labels(i) == 0L)
        else {
          val comp = flood(i)
          assert(comp.map(labels(_)).size == 1, s"component split at $i")
          assert(data.indices.filter(labels(_) == labels(i)).toSet == comp,
            s"component merged wrongly at $i")
        }
      }
      // labels are 1..N by raster first-occurrence
      val firsts = labels.distinct.filter(_ != 0)
      assert(firsts.sameElements(1L to firsts.length))
    }
  }

  test("remove kernel: offsets are chunk-disjoint and survivors keep identity") {
    val tileGen = for {
      (loc, grid) <- locGrid2d
      data <- Gen.listOfN(36, Gen.choose(0L, 4L))
    } yield Tile(loc, grid, Array(6, 6), data.toArray)
    forAll(tileGen) { t =>
      val out = Kernels.removeOverlapped(t, Array(2, 2), 0.25)
      val offset = Regions.labelOffset(t.loc, t.grid)
      out.data.indices.foreach { i =>
        val v = out.data(i)
        assert(v == 0L || v == t.data(i) + offset,
          "survivors must be original label + chunk offset; dropped must be 0")
      }
      // per-label all-or-nothing: a label either fully survives or is erased
      val byLabel = t.data.zip(out.data).filter(_._1 != 0L).groupBy(_._1)
      byLabel.foreach { case (_, pairs) =>
        assert(pairs.map(_._2 != 0L).distinct.length == 1)
      }
    }
  }

  test("sliceBox/pasteBox round-trip") {
    val gen = for {
      h <- Gen.choose(1, 6); w <- Gen.choose(1, 6); d <- Gen.choose(1, 4)
      y0 <- Gen.choose(0, h - 1); x0 <- Gen.choose(0, w - 1); z0 <- Gen.choose(0, d - 1)
      y1 <- Gen.choose(y0 + 1, h); x1 <- Gen.choose(x0 + 1, w); z1 <- Gen.choose(z0 + 1, d)
    } yield (Array(d, h, w), Nd.Box(Array(z0, y0, x0), Array(z1, y1, x1)))
    forAll(gen) { case (shape, box) =>
      val src = Array.tabulate(Nd.size(shape))(_.toLong + 1)
      val cut = Nd.sliceBox(src, shape, box)
      assert(cut.length == box.numel)
      val dst = new Array[Long](src.length)
      Nd.pasteBox(dst, shape, box, cut)
      Nd.foreachIndex(shape, box) { flat => assert(dst(flat) == src(flat)) }
      assert(dst.sum == cut.sum)
    }
  }
}
