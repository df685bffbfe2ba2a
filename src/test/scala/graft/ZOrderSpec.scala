package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.InterleaveBits

/** The Morton/Z-order expression: bit-exact vs a naive per-bit reference
  * (codegen path, via DataFrame evaluation), and the clustering property
  * that justifies it — consecutive z-ranges bound BOTH key spreads, which
  * is what makes per-file min/max statistics prune on either dimension.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session

  private def reference(x: Long, y: Long): Long = {
    var m = 0L
    for (i <- 0 until 31) {
      m |= ((x >> i) & 1L) << (2 * i)
      m |= ((y >> i) & 1L) << (2 * i + 1)
    }
    m
  }

  test("expression matches the per-bit reference on random and edge inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L),
      (0x7FFFFFFFL, 0x7FFFFFFFL), (0x7FFFFFFFL, 0L), (12345L, 54321L)) ++
      Seq.fill(500)((rnd.nextLong().abs & 0x7FFFFFFFL,
        rnd.nextLong().abs & 0x7FFFFFFFL))
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"),
        InterleaveBits.zorder(col("x"), col("y")).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((x, y) <- cases)
      assert(got((x, y)) == reference(x, y), s"($x, $y)")
    // interpreted path agrees with codegen
    for ((x, y) <- cases.take(50))
      assert((InterleaveBits.spread(x) | (InterleaveBits.spread(y) << 1))
        == reference(x, y))
  }

  test("z-order chunks bound both key spreads; row-major chunks do not") {
    import spark.implicits._
    // all points of a 64x64 grid, chunked into 64 runs of 64 points
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val byZ = pts.toDF("x", "y")
      .select(col("x"), col("y"), InterleaveBits.zorder(col("x"), col("y")).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)
    // z-codes of a full aligned grid are a permutation of 0..4095
    assert(byZ.map(_._3).toSeq == (0L until 4096L))
    val zSpread = byZ.grouped(64).map { chunk =>
      val xs = chunk.map(_._1); val ys = chunk.map(_._2)
      math.max(xs.max - xs.min, ys.max - ys.min)
    }.max
    // every aligned 64-point z-run is an 8x8 block: spread 7 on BOTH dims
    assert(zSpread == 7L, s"z spread $zSpread")
    val rowMajorSpread = pts.sortBy(p => p._1 * 64 + p._2).grouped(64).map {
      chunk =>
        val xs = chunk.map(_._1); val ys = chunk.map(_._2)
        math.max(xs.max - xs.min, ys.max - ys.min)
    }.max
    assert(rowMajorSpread == 63L, s"row-major spread $rowMajorSpread")
  }

  test("z-order is monotone on each key within the other's fixed value") {
    for (y <- Seq(0L, 5L, 1000L); a <- Seq(1L, 100L, 65535L))
      assert(reference(a, y) < reference(a + 1, y))
    for (x <- Seq(0L, 7L, 4096L))
      assert(reference(x, 3L) < reference(x, 4L))
  }
}
