package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Kernels
import graft.tiles.Tile

/** Overlap-sufficiency diagnostic ([[Kernels.marginSpanViolations]]): the
  * reference's silent correctness constraint — objects must fit inside the
  * overlap margin (SURVEY §4.1; `chunkops.py:25-89` assumes every object
  * lies fully within one expanded tile) — made detectable. An object
  * touching BOTH opposite margin faces of one expanded tile is wider than
  * core + both halos, so the parity rule will split it with no error; the
  * kernel must flag exactly those labels, on exactly the axes they span,
  * and must never flag a face the grid does not give a neighbor.
  */
class OverlapSufficiencySpec extends AnyFunSuite {

  /** Interior 2D tile (has neighbors on all four sides): expanded shape
    * (2+8+2) x (2+8+2) at loc (1,1) of a 3x3 grid, overlap 2.
    */
  private def interior(fill: (Int, Int) => Long): Tile = {
    val h = 12; val w = 12
    val data = Array.tabulate(h * w)(i => fill(i / w, i % w))
    Tile(Array(1, 1), Array(3, 3), Array(h, w), data)
  }

  test("object spanning both y margin faces is flagged on axis 0 only") {
    // a vertical bar through the full expanded height, 3 px wide: touches
    // y-low (rows 0-1) and y-high (rows 10-11) but neither x face
    val t = interior((y, x) => if (x >= 5 && x < 8) 7L else 0L)
    assert(Kernels.marginSpanViolations(t, Array(2, 2)).toSeq ==
      Seq((0, 7L)))
  }

  test("oversized blob spanning both axes is flagged twice") {
    val t = interior((_, _) => 3L) // fills the whole expanded frame
    assert(Kernels.marginSpanViolations(t, Array(2, 2)).toSeq ==
      Seq((0, 3L), (1, 3L)))
  }

  test("object inside one margin face only is NOT flagged") {
    // fits in the low-y halo band plus some core: never reaches y-high
    // (x kept inside the core so the x faces stay clear too)
    val t = interior((y, x) => if (y < 6 && x >= 4 && x < 7) 9L else 0L)
    assert(Kernels.marginSpanViolations(t, Array(2, 2)).isEmpty)
  }

  test("edge tiles cannot false-positive on faces without neighbors") {
    // corner tile (0,0) of a 2x2 grid: no low faces exist, so a label
    // touching row 0 and the high face spans core+one halo = 10 px — big,
    // but NOT provably wider than the overlap window; only tiles with
    // BOTH faces can testify
    val h = 10; val w = 10 // 8 core + high halo 2 on each axis
    val data = Array.fill(h * w)(5L)
    val t = Tile(Array(0, 0), Array(2, 2), Array(h, w), data)
    assert(Kernels.marginSpanViolations(t, Array(2, 2)).isEmpty)
  }

  test("zero overlap on an axis disables that axis's faces") {
    val t = interior((_, _) => 4L)
    assert(Kernels.marginSpanViolations(t, Array(0, 2)).toSeq ==
      Seq((1, 4L)))
  }

  test("multiple violating labels report sorted, deduplicated") {
    // two full-height bars, labels 2 and 8
    val t = interior((y, x) =>
      if (x < 2) 8L else if (x >= 4 && x < 6) 2L else 0L)
    assert(Kernels.marginSpanViolations(t, Array(2, 2)).toSeq ==
      Seq((0, 2L), (0, 8L)))
  }

  test("random tiles match a brute-force face check (2D and 3D)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      dims <- Gen.oneOf(2, 3)
      grid <- Gen.listOfN(dims, Gen.choose(1, 3)).map(_.toArray)
      loc <- Gen.sequence[Array[Int], Int](
        grid.toSeq.map(g => Gen.choose(0, g - 1)))
      ov <- Gen.listOfN(dims, Gen.choose(0, 2)).map(_.toArray)
      shape = Array.tabulate(dims) { a =>
        4 + (if (loc(a) > 0) ov(a) else 0) +
          (if (loc(a) < grid(a) - 1) ov(a) else 0)
      }
      data <- Gen.listOfN(shape.product, Gen.choose(0L, 3L)).map(_.toArray)
    } yield Tile(loc, grid, shape, data)
    (0 until 300).foreach { s =>
      val t = gen.pureApply(org.scalacheck.Gen.Parameters.default, Seed(s.toLong))
      val ov = Array.tabulate(t.dims)(a =>
        // recover the overlap used for this tile: shape = 4 + present halos
        (t.shape(a) - 4) / (((if (t.loc(a) > 0) 1 else 0) +
          (if (t.loc(a) < t.grid(a) - 1) 1 else 0)).max(1)))
      // brute force: enumerate coordinates, collect per-axis face sets
      def coords(flat: Int): Array[Int] = {
        var rem = flat
        val c = new Array[Int](t.dims)
        var a = t.dims - 1
        while (a >= 0) { c(a) = rem % t.shape(a); rem /= t.shape(a); a -= 1 }
        c
      }
      val expect = (0 until t.dims).flatMap { a =>
        if (!(t.loc(a) > 0 && t.loc(a) < t.grid(a) - 1 && ov(a) > 0)) Nil
        else {
          val lows = t.data.indices.filter { f =>
            t.data(f) != 0 && coords(f)(a) < ov(a) }.map(t.data).toSet
          val highs = t.data.indices.filter { f =>
            t.data(f) != 0 && coords(f)(a) >= t.shape(a) - ov(a) }.map(t.data).toSet
          (lows intersect highs).toSeq.sorted.map(l => (a, l))
        }
      }
      assert(Kernels.marginSpanViolations(t, ov).toSeq == expect,
        s"seed $s: loc=${t.loc.mkString(",")} grid=${t.grid.mkString(",")} " +
          s"ov=${ov.mkString(",")}")
    }
  }

  test("3D: a z-spanning slab is flagged on axis 0") {
    val d = 8; val h = 8; val w = 8 // 4 core + 2+2 halos per axis
    val data = Array.tabulate(d * h * w) { i =>
      val z = i / (h * w); val y = (i / w) % h; val x = i % w
      // slab through all z at one (y, x) core column
      if (y == 4 && x == 4) 6L else { val _ = z; 0L }
    }
    val t = Tile(Array(1, 1, 1), Array(3, 3, 3), Array(d, h, w), data)
    assert(Kernels.marginSpanViolations(t, Array(2, 2, 2)).toSeq ==
      Seq((0, 6L)))
  }

  test("image2labels surfaces the violation count through its accumulator") {
    val spark = SparkTest.session
    import spark.implicits._
    import graft.ops.{CCLSegmentation, Relabel}
    import graft.tiles.GridSpec
    // 12x4 image in 4x4 chunks (3x1 grid), overlap 1: a vertical bar down
    // ALL 12 rows is wider than core + both halos of the middle tile, so
    // its pixels touch both axis-0 margin faces there -> one violation
    val grid = Array(3, 1)
    def tile(row: Int, f: (Int, Int) => Long): graft.tiles.Tile =
      graft.tiles.Tile(Array(row, 0), grid, Array(4, 4),
        Array.tabulate(16)(i => f(i / 4, i % 4)))
    val oversized = Seq(
      tile(0, (_, x) => if (x == 1 || x == 2) 5L else 0L),
      tile(1, (_, x) => if (x == 1 || x == 2) 5L else 0L),
      tile(2, (_, x) => if (x == 1 || x == 2) 5L else 0L)).toDS()
    val spec = GridSpec(Array(12L, 4L), Array(4, 4))
    val acc = spark.sparkContext.longAccumulator("overlap_violations")
    val out = Relabel.image2labels(oversized, spec, CCLSegmentation(),
      Array(1, 1), 0.05, Some(acc))
    assert(acc.value == 0L, "accumulator fills at action time, not plan time")
    val tilesOut = out.collect()
    assert(tilesOut.length == 3)
    assert(acc.value > 0L,
      "an object larger than the overlap must raise the violation count")

    // a well-overlapped input reports zero and the pipeline result is
    // byte-identical to the undiagnosed run
    val small = Seq(
      tile(0, (y, x) => if (y == 1 && x == 1) 3L else 0L),
      tile(1, (_, _) => 0L),
      tile(2, (y, x) => if (y == 2 && x == 2) 9L else 0L)).toDS()
    val acc2 = spark.sparkContext.longAccumulator("overlap_violations")
    val audited = Relabel.image2labels(small, spec, CCLSegmentation(),
      Array(1, 1), 0.05, Some(acc2)).collect()
    val plain = Relabel.image2labels(small, spec, CCLSegmentation(),
      Array(1, 1), 0.05).collect()
    assert(acc2.value == 0L, "no oversized objects -> zero violations")
    Goldens.assertSameTiles(audited.toSeq, plain.toSeq)
  }
}
