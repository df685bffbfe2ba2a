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

  test("ZInterval.cover: sound, sorted, merged, and tight on random boxes") {
    import graft.functions.ZInterval
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 30) {
      val xlo = rnd.nextInt(200).toLong; val xhi = xlo + rnd.nextInt(120)
      val ylo = rnd.nextInt(200).toLong; val yhi = ylo + rnd.nextInt(120)
      val ivs = ZInterval.cover(xlo, xhi, ylo, yhi)
      // disjoint, sorted, non-touching after the merge
      for (Seq((_, e1), (s2, _)) <- ivs.sliding(2).toSeq if ivs.size > 1)
        assert(e1 + 1 < s2)
      // sound: every box point's morton code is covered
      for (x <- xlo to xhi; y <- ylo to yhi) {
        val m = reference(x, y)
        assert(ivs.exists(iv => iv._1 <= m && m <= iv._2), s"($x,$y) uncovered")
      }
      // tight: the cover's total length stays within a small factor of the
      // box area (quadtree covers of a box are O(perimeter) cells)
      val area = (xhi - xlo + 1) * (yhi - ylo + 1)
      val len = ivs.map(iv => iv._2 - iv._1 + 1).sum
      assert(len <= 4 * area + 64, s"cover len $len vs area $area")
    }
  }

  test("z-range scan reads a small fraction of a morton-sorted store") {
    import graft.functions.{InterleaveBits, ZInterval}
    val dir = graft.TempDirs.create("zscan_spec")
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .withColumn("morton", InterleaveBits.zorder(col("ok"), col("pk")))
      .repartitionByRange(8, col("morton")).sortWithinPartitions("morton")
      .write.mode("overwrite").parquet(dir.toString)
    val store = spark.read.parquet(dir.toString)
    val total = store.count()
    val ivs = ZInterval.cover(1000L, 3000L, 20L, 150L)
    val zpred = ivs.map { case (a, b) => col("morton").between(a, b) }
      .reduce(_ || _)
    val scanned = store.filter(zpred).count()
    val exact = store.filter(col("ok").between(1000L, 3000L) &&
      col("pk").between(20L, 150L)).count()
    assert(exact > 0 && scanned < total / 4,
      s"z-cover selects $scanned of $total rows (exact box: $exact)")
    // the z-predicate alone loses nothing vs the exact box
    assert(store.filter(zpred && col("ok").between(1000L, 3000L) &&
      col("pk").between(20L, 150L)).count() == exact)
    // and it is pushed to the parquet scan as range filters on morton
    val plan = store.filter(zpred).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("morton"),
      s"morton ranges not pushed:\n$plan")
  }

  test("z-order is monotone on each key within the other's fixed value") {
    for (y <- Seq(0L, 5L, 1000L); a <- Seq(1L, 100L, 65535L))
      assert(reference(a, y) < reference(a + 1, y))
    for (x <- Seq(0L, 7L, 4096L))
      assert(reference(x, 3L) < reference(x, 4L))
  }
}
