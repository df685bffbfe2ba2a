package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.HilbertIndex

/** The order-16 Hilbert index: bijection + unit-step curve properties, the
  * Catalyst expression against the reference Scala loop (both codegen and
  * interpreted paths), and the locality claim the lo_locality gate ships —
  * Hilbert envelopes are tighter than Morton's on identical keys.
  */
class HilbertSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  test("inverse(index(x, y)) == (x, y) on random and boundary points") {
    val rnd = new scala.util.Random(7)
    val pts = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L),
      (1L, 0L), (0L, 1L), (32768L, 32767L)) ++
      Seq.fill(2000)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    pts.foreach { case (x, y) =>
      val d = HilbertIndex.index(x, y)
      assert(0 <= d && d < (1L << 32), s"index in range for ($x,$y)")
      assert(HilbertIndex.inverse(d) == ((x, y)), s"bijection at ($x,$y)")
    }
  }

  test("consecutive indices are unit Manhattan steps (space-filling curve)") {
    val rnd = new scala.util.Random(11)
    // random windows of the curve, plus the corners of the first quadrant
    val starts = Seq(0L, (1L << 32) - 300L) ++
      Seq.fill(50)(math.abs(rnd.nextLong()) % ((1L << 32) - 300))
    starts.foreach { d0 =>
      var (px, py) = HilbertIndex.inverse(d0)
      (d0 + 1 to d0 + 299).foreach { d =>
        val (x, y) = HilbertIndex.inverse(d)
        assert(math.abs(x - px) + math.abs(y - py) == 1,
          s"non-unit step at d=$d: ($px,$py) -> ($x,$y)")
        px = x; py = y
      }
    }
  }

  test("expression matches the Scala loop; masks to 16 bits; NULL-safe") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(500)((rnd.nextLong(), rnd.nextLong())) :+
      (0L, 0L) :+ (-1L, -1L) :+ (Long.MaxValue, Long.MinValue)
    val df = rows.toDF("x", "y")
    val got = df.select(col("x"), col("y"),
      HilbertIndex.hilbert(col("x"), col("y")).as("h")).collect()
    got.foreach { r =>
      assert(r.getLong(2) == HilbertIndex.index(r.getLong(0), r.getLong(1)))
    }
    // NULL input -> NULL index (the contract the arithmetic oracle mirrors)
    val n = spark.sql("SELECT CAST(NULL AS BIGINT) AS x, CAST(2 AS BIGINT) AS y")
      .select(HilbertIndex.hilbert(col("x"), col("y")).as("h")).collect()
    assert(n(0).isNullAt(0))
  }

  test("hilbert_index and interleave_bits are SQL-callable after register") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT hilbert_index(3L, 4L) AS h, interleave_bits(3L, 4L) AS m")
      .collect()(0)
    assert(r.getLong(0) == HilbertIndex.index(3L, 4L))
    assert(r.getLong(1) ==
      (graft.functions.InterleaveBits.spread(3L) |
        (graft.functions.InterleaveBits.spread(4L) << 1)))
  }

  test("aligned subsquares are contiguous curve segments entered at corners") {
    val rnd = new scala.util.Random(19)
    for (_ <- 1 to 200) {
      val bits = 1 + rnd.nextInt(6)
      val size = 1L << bits
      val x0 = (rnd.nextInt(65536) >> bits).toLong << bits
      val y0 = (rnd.nextInt(65536) >> bits).toLong << bits
      val corners = Seq((x0, y0), (x0 + size - 1, y0), (x0, y0 + size - 1),
        (x0 + size - 1, y0 + size - 1)).map { case (x, y) =>
        graft.functions.HilbertIndex.index(x, y)
      }
      val base = corners.min
      // sample interior points: all indices must land inside the segment
      for (_ <- 1 to 30) {
        val d = graft.functions.HilbertIndex.index(
          x0 + rnd.nextInt(size.toInt), y0 + rnd.nextInt(size.toInt))
        assert(d >= base && d < base + size * size,
          s"cell ($x0,$y0)+$size not contiguous from $base")
      }
    }
  }

  test("HInterval.cover includes every box point and bounds the overshoot") {
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 50) {
      val xlo = rnd.nextInt(60000).toLong
      val ylo = rnd.nextInt(60000).toLong
      val xhi = math.min(65535L, xlo + 1 + rnd.nextInt(4000))
      val yhi = math.min(65535L, ylo + 1 + rnd.nextInt(4000))
      val ivs = graft.functions.HInterval.cover(xlo, xhi, ylo, yhi)
      assert(ivs.nonEmpty)
      // sorted, disjoint, merged
      ivs.sliding(2).foreach {
        case Seq((_, e0), (s1, _)) => assert(s1 > e0 + 1)
        case _ =>
      }
      // inclusion: sampled box points land in some interval
      for (_ <- 1 to 100) {
        val x = xlo + (math.abs(rnd.nextLong()) % (xhi - xlo + 1))
        val y = ylo + (math.abs(rnd.nextLong()) % (yhi - ylo + 1))
        val d = graft.functions.HilbertIndex.index(x, y)
        assert(ivs.exists { case (a, b) => d >= a && d <= b },
          s"point ($x,$y) of box [$xlo,$xhi]x[$ylo,$yhi] escaped the cover")
      }
      // overshoot stays a small multiple of the box area (residual absorbs)
      val covered = ivs.map { case (a, b) => b - a + 1 }.sum
      val area = (xhi - xlo + 1) * (yhi - ylo + 1)
      assert(covered <= 8 * area + 512,
        s"cover $covered blew past box area $area")
    }
  }

  test("cover escalates on thin slabs: range budget held, no undershoot") {
    import graft.functions.{HilbertIndex, HInterval}
    // a 60001x3 slab at the short-side policy would emit tens of
    // thousands of unit-cell ranges; escalation must coarsen it under
    // the budget while still covering every slab cell
    val (xlo, xhi, ylo, yhi) = (100L, 60100L, 7L, 9L)
    val ivs = HInterval.cover(xlo, xhi, ylo, yhi)
    assert(ivs.nonEmpty && ivs.size <= 256, s"${ivs.size} ranges")
    val rnd = new scala.util.Random(41)
    (1 to 300).foreach { _ =>
      val x = xlo + math.abs(rnd.nextLong()) % (xhi - xlo + 1)
      val y = ylo + math.abs(rnd.nextLong()) % (yhi - ylo + 1)
      val d = HilbertIndex.index(x, y)
      assert(ivs.exists { case (a, b) => a <= d && d <= b },
        s"slab cell ($x,$y) escapes the escalated cover")
    }
    // still a useful cover: a small fraction of the full curve domain
    val covered = ivs.map { case (a, b) => b - a + 1 }.sum
    assert(covered < (1L << 32) / 100,
      s"escalated slab cover reads $covered of ${1L << 32}")
  }

  test("lo_locality: hilbert total envelope area <= morton's, rows conserved") {
    val df = SparkEntry.queries("lo_locality")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (hb, hr, ha) = df("hilbert")
    val (mb, mr, ma) = df("morton")
    assert(hr == mr, "both curves cover the same rows")
    assert(hb > 0 && mb > 0)
    assert(ha <= ma,
      s"hilbert envelopes ($ha) must be no looser than morton's ($ma)")
  }
}
