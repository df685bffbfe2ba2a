package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.Hilbert3

/** The order-10 3-D Hilbert index (Skilling's transform): bijection +
  * unit-step curve properties, and the Catalyst expression against the
  * reference Scala rounds (codegen and interpreted paths, masking,
  * NULL-safety). Exhaustive coverage of the low orders comes free: the
  * first 8^k indices of an order-10 curve ARE the order-k subcurve of the
  * corner cube, so the unit-step windows below cross sub-cube boundaries
  * of every scale the walk reaches.
  */
class Hilbert3Spec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private val side = Hilbert3.Side
  private val total = side * side * side

  test("inverse3(index3(x, y, z)) == (x, y, z) on random and boundary points") {
    val rnd = new scala.util.Random(17)
    val m = side - 1
    val pts = Seq((0L, 0L, 0L), (m, 0L, 0L), (0L, m, 0L), (0L, 0L, m),
      (m, m, m), (1L, 0L, 0L), (side >> 1, (side >> 1) - 1, 0L)) ++
      Seq.fill(3000)((rnd.nextInt(side.toInt).toLong,
        rnd.nextInt(side.toInt).toLong, rnd.nextInt(side.toInt).toLong))
    pts.foreach { case (x, y, z) =>
      val d = Hilbert3.index3(x, y, z)
      assert(0 <= d && d < total, s"index in range for ($x,$y,$z)")
      assert(Hilbert3.inverse3(d) == ((x, y, z)), s"bijection at ($x,$y,$z)")
    }
  }

  test("consecutive 3-D indices are unit Manhattan steps") {
    val rnd = new scala.util.Random(19)
    val starts = Seq(0L, total - 300L) ++
      Seq.fill(60)(math.abs(rnd.nextLong()) % (total - 300))
    starts.foreach { d0 =>
      var (px, py, pz) = Hilbert3.inverse3(d0)
      (d0 + 1 to d0 + 299).foreach { d =>
        val (x, y, z) = Hilbert3.inverse3(d)
        assert(math.abs(x - px) + math.abs(y - py) + math.abs(z - pz) == 1,
          s"non-unit step at d=$d: ($px,$py,$pz) -> ($x,$y,$z)")
        px = x; py = y; pz = z
      }
    }
  }

  test("distinct cells map to distinct indices (injectivity sample)") {
    // bijection follows from the roundtrip test; this pins that no two
    // DIFFERENT cells collide, over a dense corner block where curve
    // structure repeats at every scale
    val seen = new java.util.HashMap[java.lang.Long, (Long, Long, Long)]()
    for (x <- 0L until 16L; y <- 0L until 16L; z <- 0L until 16L) {
      val d = Hilbert3.index3(x, y, z)
      val prev = seen.put(d, (x, y, z))
      assert(prev == null, s"collision at d=$d: $prev and ($x,$y,$z)")
    }
    assert(seen.size == 16 * 16 * 16)
  }

  test("expression matches the Scala rounds; masks to 10 bits; NULL-safe") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(600)((rnd.nextLong(), rnd.nextLong(), rnd.nextLong())) :+
      (0L, 0L, 0L) :+ (-1L, -1L, -1L) :+
      (Long.MaxValue, Long.MinValue, 1023L)
    val df = rows.toDF("x", "y", "z")
    // CODEGEN_ONLY + no fallback: a janino compile error in doGenCode must
    // FAIL here, not silently degrade to interpreted eval (it did once —
    // a brace-less loop body janino misparses as a cast). Restore the
    // PRIOR values, not hard-coded defaults — the shared session may run
    // under a different codegen profile.
    val priorFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val priorFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    def restore(key: String, v: Option[String]): Unit = v match {
      case Some(s) => spark.conf.set(key, s)
      case None => spark.conf.unset(key)
    }
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val got =
      try df.select(col("x"), col("y"), col("z"),
        Hilbert3.hilbert3(col("x"), col("y"), col("z")).as("h")).collect()
      finally {
        restore("spark.sql.codegen.factoryMode", priorFactory)
        restore("spark.sql.codegen.fallback", priorFallback)
      }
    got.foreach { r =>
      assert(r.getLong(3) ==
        Hilbert3.index3(r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    // and the interpreted path agrees (nullSafeEval is the non-codegen twin)
    rows.take(50).foreach { case (x, y, z) =>
      val interp = graft.functions.HilbertIndex3(
        org.apache.spark.sql.catalyst.expressions.Literal(x),
        org.apache.spark.sql.catalyst.expressions.Literal(y),
        org.apache.spark.sql.catalyst.expressions.Literal(z))
        .eval(null).asInstanceOf[Long]
      assert(interp == Hilbert3.index3(x, y, z))
    }
    val n = spark.sql(
      "SELECT CAST(NULL AS BIGINT) AS x, 2L AS y, 3L AS z")
      .select(Hilbert3.hilbert3(col("x"), col("y"), col("z")).as("h"))
      .collect()
    assert(n(0).isNullAt(0))
  }

  test("aligned cubes are contiguous curve segments entered at a corner") {
    // the fact cover3 rests on: an aligned 2^b cube holds exactly the
    // indices [min(8 corner indices), min + 8^b - 1]
    val rnd = new scala.util.Random(29)
    (1 to 60).foreach { _ =>
      val bbits = 1 + rnd.nextInt(3)
      val sz = 1L << bbits
      def base = (rnd.nextInt((side / sz).toInt) * sz)
      val (x0, y0, z0) = (base, base, base)
      val idxs = for (i <- 0L until sz; j <- 0L until sz; k <- 0L until sz)
        yield Hilbert3.index3(x0 + i, y0 + j, z0 + k)
      val corners = for (i <- Seq(0L, sz - 1); j <- Seq(0L, sz - 1);
        k <- Seq(0L, sz - 1)) yield Hilbert3.index3(x0 + i, y0 + j, z0 + k)
      assert(idxs.min == corners.min, s"min not at a corner of ($x0,$y0,$z0)+$sz")
      assert(idxs.max - idxs.min == sz * sz * sz - 1 &&
        idxs.distinct.size == idxs.size,
        s"cube at ($x0,$y0,$z0) size $sz not a contiguous segment")
    }
  }

  test("cover3: sorted disjoint ranges, no undershoot, bounded overshoot") {
    import graft.functions.HInterval
    val rnd = new scala.util.Random(31)
    def checkBox(xlo: Long, xhi: Long, ylo: Long, yhi: Long,
        zlo: Long, zhi: Long): Seq[(Long, Long)] = {
      val ranges = HInterval.cover3(xlo, xhi, ylo, yhi, zlo, zhi)
      assert(ranges.nonEmpty && ranges.size <= 256, s"${ranges.size} ranges")
      // sorted, disjoint, non-adjacent (fully merged)
      ranges.sliding(2).foreach {
        case Seq((_, b1), (a2, _)) => assert(a2 > b1 + 1, "unmerged/overlap")
        case _ =>
      }
      // no undershoot: every sampled in-box cell's index is covered
      (1 to 200).foreach { _ =>
        def pick(lo: Long, hi: Long) = lo + math.abs(rnd.nextLong()) % (hi - lo + 1)
        val d = Hilbert3.index3(pick(xlo, xhi), pick(ylo, yhi), pick(zlo, zhi))
        assert(ranges.exists { case (a, b) => a <= d && d <= b },
          s"in-box cell index $d escapes the cover")
      }
      ranges
    }
    // fat boxes (no escalation): overshoot stays within 3x the box volume
    // (the 1/4-short-side stopping policy lands ~1.2-1.3x mid-domain)
    (1 to 15).foreach { _ =>
      def span = { val a = rnd.nextInt(side.toInt - 320)
        val w = 64 + rnd.nextInt(256); (a.toLong, math.min(a.toLong + w, side - 1)) }
      val (xlo, xhi) = span; val (ylo, yhi) = span; val (zlo, zhi) = span
      val ranges = checkBox(xlo, xhi, ylo, yhi, zlo, zhi)
      val boxVol = (xhi - xlo + 1) * (yhi - ylo + 1) * (zhi - zlo + 1)
      val covVol = ranges.map { case (a, b) => b - a + 1 }.sum
      assert(covVol >= boxVol && covVol <= 3 * boxVol,
        s"cover volume $covVol vs box $boxVol out of policy")
    }
    // thin slabs (escalation path): the range budget holds, the overshoot
    // concentrates in the thin dimension, and the read stays a tiny
    // fraction of the domain — the contract the rule's injection relies on
    val slab = checkBox(100L, 400L, 20L, 150L, 2L, 8L)
    val slabVol = slab.map { case (a, b) => b - a + 1 }.sum
    assert(slabVol < total / 500, s"thin-slab cover reads $slabVol of $total")
  }
}
