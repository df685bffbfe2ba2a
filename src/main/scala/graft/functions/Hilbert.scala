package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert curve index of two int64 keys (order 16: each input masked to
  * its low 16 bits, output in [0, 2^32)) — the OTHER multi-dimensional
  * layout primitive a lakehouse offers next to Z-order (Delta's
  * `OPTIMIZE ... BY HILBERT`, Iceberg's hilbert sort strategy). The
  * Hilbert curve visits every cell of the 2^16 x 2^16 grid exactly once
  * with UNIT steps — unlike Morton, which jumps across the plane at every
  * power-of-two boundary — so consecutive index ranges have tighter
  * per-dimension envelopes and min/max file statistics prune better
  * (measured head-to-head by the lo_locality gate).
  *
  * Computed by the classic Lam–Shapiro bit loop (16 iterations of
  * quadrant-rotate + accumulate, cf. Hamilton's compact Hilbert indices):
  * pure integer arithmetic, fused into whole-stage codegen. The
  * relational twin is the same loop unrolled as 32 CTE steps
  * (SourceOps.HILBERT_CTES), so the DuckDB oracle proves the generated
  * code bit-for-bit.
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects bigint x bigint, got $l x $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.index(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val hx = ctx.freshName("hx")
      val hy = ctx.freshName("hy")
      val hs = ctx.freshName("hs")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val ht = ctx.freshName("ht")
      // same loop as HilbertIndex.index — kept in a real Java loop (not
      // unrolled) so the generated method stays far under the JIT limit
      s"""
         |long $hx = $x & 0xFFFFL;
         |long $hy = $y & 0xFFFFL;
         |${ev.value} = 0L;
         |for (long $hs = 1L << 15; $hs > 0; $hs >>= 1) {
         |  long $rx = (($hx & $hs) > 0) ? 1L : 0L;
         |  long $ry = (($hy & $hs) > 0) ? 1L : 0L;
         |  ${ev.value} += $hs * $hs * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) {
         |      $hx = 0xFFFFL - $hx;
         |      $hy = 0xFFFFL - $hy;
         |    }
         |    long $ht = $hx; $hx = $hy; $hy = $ht;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {

  /** Side length of the curve's square grid (order 16). */
  val Side: Long = 1L << 16

  /** Lam–Shapiro xy→d for order 16; inputs masked to 16 bits. */
  def index(x0: Long, y0: Long): Long = {
    var x = x0 & (Side - 1)
    var y = y0 & (Side - 1)
    var d = 0L
    var s = Side >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = Side - 1 - x; y = Side - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse (d→xy), order 16 — used only by tests to prove the index is
    * a bijection with unit steps; not part of any query plan.
    */
  def inverse(d0: Long): (Long, Long) = {
    var (x, y) = (0L, 0L)
    var t = d0
    var s = 1L
    while (s < Side) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val w = x; x = y; y = w
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  /** Column wrapper: `hilbert(x, y)` — 32-bit Hilbert index. */
  def hilbert(x: Column, y: Column): Column =
    Bridge.column(HilbertIndex(Bridge.expression(x), Bridge.expression(y)))
}

/** 3-D Hilbert curve index (order 10: each input masked to its low 10
  * bits, output in [0, 2^30)) — the N-dimensional companion of
  * [[HilbertIndex]] for data laid out on a 3-D key (the tile engine's own
  * `grid_z/grid_y/grid_x` is the natural consumer; the gate drives it over
  * three lineitem keys so the DuckDB oracle can replay it bit-for-bit).
  *
  * The Lam–Shapiro quadrant loop does not generalize past 2-D, so this is
  * Skilling's transform (J. Skilling, "Programming the Hilbert curve",
  * AIP Conf. Proc. 707, 2004 — the standard public N-D construction):
  * axes → transposed Hilbert coordinates by 9 rounds of invert-or-exchange
  * against the leading axis, a Gray encode, then a bit interleave with the
  * leading axis contributing the high bit of each 3-bit group. Pure
  * integer arithmetic, fused into whole-stage codegen; the relational twin
  * unrolls the same rounds as CTEs ([[graft.rel.SourceOps.HILBERT3_CTES]])
  * so the oracle proves the generated code exactly. [[Hilbert3.inverse3]]
  * is the reverse transform, used by the spec to prove bijection and the
  * unit-step walk (the defining Hilbert property).
  */
case class HilbertIndex3(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b, c) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects bigint x bigint x bigint, got $a x $b x $c")
    }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    Hilbert3.index3(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, z) => {
      val a = ctx.freshName("ha")
      val b = ctx.freshName("hb")
      val c = ctx.freshName("hc")
      val q = ctx.freshName("hq")
      val p = ctx.freshName("hp")
      val t = ctx.freshName("ht")
      val j = ctx.freshName("hj")
      val g2 = ctx.freshName("hg2")
      val g1 = ctx.freshName("hg1")
      val g0 = ctx.freshName("hg0")
      val mask = Hilbert3.Side - 1
      val half = Hilbert3.Side >> 1
      // same rounds as Hilbert3.index3 — real Java loops, far under the
      // JIT method-size limit. Every loop body is braced and every
      // statement simple: janino misparses a parenthesized shift inside a
      // brace-less loop body as a cast ("... is not a type") and Spark
      // would silently fall back to interpreted eval.
      s"""
         |long $a = $x & ${mask}L;
         |long $b = $y & ${mask}L;
         |long $c = $z & ${mask}L;
         |for (long $q = ${half}L; $q > 1L; $q >>= 1) {
         |  long $p = $q - 1L;
         |  if (($a & $q) != 0L) $a ^= $p;
         |  if (($b & $q) != 0L) $a ^= $p;
         |  else { long $t = ($a ^ $b) & $p; $a ^= $t; $b ^= $t; }
         |  if (($c & $q) != 0L) $a ^= $p;
         |  else { long $t = ($a ^ $c) & $p; $a ^= $t; $c ^= $t; }
         |}
         |$b ^= $a;
         |$c ^= $b;
         |long $t = 0L;
         |for (long $q = ${half}L; $q > 1L; $q >>= 1) {
         |  if (($c & $q) != 0L) $t ^= $q - 1L;
         |}
         |$a ^= $t; $b ^= $t; $c ^= $t;
         |${ev.value} = 0L;
         |for (int $j = ${Hilbert3.Bits - 1}; $j >= 0; $j--) {
         |  long $g2 = ($a >> $j) & 1L;
         |  long $g1 = ($b >> $j) & 1L;
         |  long $g0 = ($c >> $j) & 1L;
         |  ${ev.value} = (${ev.value} << 3) | ($g2 << 2) | ($g1 << 1) | $g0;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): HilbertIndex3 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object Hilbert3 {

  /** Bits per dimension (order 10): 3 x 10 = 30-bit index. */
  val Bits: Int = 10

  /** Side length of the curve's cubic grid. */
  val Side: Long = 1L << Bits

  /** Skilling axes→index for 3 dims; inputs masked to [[Bits]] bits. */
  def index3(x0: Long, y0: Long, z0: Long): Long = {
    var a = x0 & (Side - 1)
    var b = y0 & (Side - 1)
    var c = z0 & (Side - 1)
    // inverse undo: invert-or-exchange low bits against the leading axis
    var q = Side >> 1
    while (q > 1) {
      val p = q - 1
      if ((a & q) != 0L) a ^= p
      if ((b & q) != 0L) a ^= p
      else { val t = (a ^ b) & p; a ^= t; b ^= t }
      if ((c & q) != 0L) a ^= p
      else { val t = (a ^ c) & p; a ^= t; c ^= t }
      q >>= 1
    }
    // Gray encode
    b ^= a
    c ^= b
    var t = 0L
    q = Side >> 1
    while (q > 1) {
      if ((c & q) != 0L) t ^= q - 1
      q >>= 1
    }
    a ^= t; b ^= t; c ^= t
    // interleave the transpose: a is the high bit of each 3-bit group
    var d = 0L
    var j = Bits - 1
    while (j >= 0) {
      d = (d << 3) | (((a >> j) & 1L) << 2) |
        (((b >> j) & 1L) << 1) | ((c >> j) & 1L)
      j -= 1
    }
    d
  }

  /** Inverse (index→axes) — used only by tests to prove bijection and
    * unit steps; not part of any query plan.
    */
  def inverse3(d: Long): (Long, Long, Long) = {
    var a = 0L; var b = 0L; var c = 0L
    var j = 0
    while (j < Bits) {
      a |= ((d >> (3 * j + 2)) & 1L) << j
      b |= ((d >> (3 * j + 1)) & 1L) << j
      c |= ((d >> (3 * j)) & 1L) << j
      j += 1
    }
    // Gray decode
    val t0 = c >> 1
    c ^= b; b ^= a; a ^= t0
    // undo excess work (reverse round order, reverse axis order)
    var q = 2L
    while (q < Side) {
      val p = q - 1
      if ((c & q) != 0L) a ^= p
      else { val w = (a ^ c) & p; a ^= w; c ^= w }
      if ((b & q) != 0L) a ^= p
      else { val w = (a ^ b) & p; a ^= w; b ^= w }
      if ((a & q) != 0L) a ^= p
      q <<= 1
    }
    (a, b, c)
  }

  /** Column wrapper: `hilbert3(x, y, z)` — 30-bit Hilbert index. */
  def hilbert3(x: Column, y: Column, z: Column): Column =
    Bridge.column(HilbertIndex3(Bridge.expression(x), Bridge.expression(y),
      Bridge.expression(z)))
}

/** Hilbert-interval decomposition of a 2-D box query — the READ side of the
  * Hilbert layout, mirroring [[ZInterval]] for Morton: a rectangle becomes
  * a small OR of contiguous index ranges that a Hilbert-sorted store
  * answers from min/max statistics alone, with the exact box filter as
  * residual (the cover may overshoot, never undershoot).
  *
  * Contiguity fact the cover rests on: every grid-ALIGNED `2^b x 2^b`
  * subsquare is one contiguous segment of the order-16 curve, entered and
  * left at subsquare corners — so the segment is
  * `[min(index of the 4 corners), min + 4^b - 1]`. (HilbertSpec checks the
  * segment bound over random cells.) Unlike Morton, emission order is NOT
  * index order, so intervals are sorted before merging.
  */
object HInterval {

  /** Cover of the box by aligned quadtree cells — same descend-until-
    * inside-or-small policy as [[ZInterval.cover]] (cells stop at 1/8 of
    * the box's short side), then sort-and-merge, ESCALATING the cell size
    * one bit at a time while the merged cover exceeds `maxRanges` (same
    * contract as [[cover3]] — a 60000x3 slab is useless at the
    * short-side policy but a perfectly good ~60-range cover at +5 bits).
    * Inclusive index ranges over the order-16 domain.
    */
  def cover(xlo: Long, xhi: Long, ylo: Long, yhi: Long,
      maxRanges: Int = 256): Seq[(Long, Long)] = {
    val max = HilbertIndex.Side - 1
    require(0 <= xlo && xlo <= xhi && xhi <= max &&
      0 <= ylo && ylo <= yhi && yhi <= max, "box out of the 16-bit key domain")
    val short = math.min(xhi - xlo + 1, yhi - ylo + 1) >> 3
    var minBits =
      if (short <= 1L) 0
      else 63 - java.lang.Long.numberOfLeadingZeros(short)
    var merged = coverAt(xlo, xhi, ylo, yhi, minBits)
    while (merged.size > maxRanges && minBits < 16) {
      minBits += 1
      merged = coverAt(xlo, xhi, ylo, yhi, minBits)
    }
    merged
  }

  private def coverAt(xlo: Long, xhi: Long, ylo: Long, yhi: Long,
      minBits: Int): Seq[(Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def go(x0: Long, y0: Long, bits: Int): Unit = {
      val size = 1L << bits
      val x1 = x0 + size - 1
      val y1 = y0 + size - 1
      if (x1 < xlo || x0 > xhi || y1 < ylo || y0 > yhi) return
      if ((x0 >= xlo && x1 <= xhi && y0 >= ylo && y1 <= yhi) ||
          bits <= minBits) {
        val corners = Seq((x0, y0), (x1, y0), (x0, y1), (x1, y1))
          .map { case (x, y) => HilbertIndex.index(x, y) }
        out += ((corners.min, corners.min + (1L << (2 * bits)) - 1))
      } else {
        val h = 1L << (bits - 1)
        go(x0, y0, bits - 1)
        go(x0 + h, y0, bits - 1)
        go(x0, y0 + h, bits - 1)
        go(x0 + h, y0 + h, bits - 1)
      }
    }
    go(0L, 0L, 16)
    sortMerge(out)
  }

  /** 3-D cover: octree descent over aligned cubes against the order-10
    * Skilling curve — the N-D generalization [[cover]]'s doc promises.
    * Same contiguity fact, one dimension up: every grid-ALIGNED
    * `2^b x 2^b x 2^b` cube is one contiguous curve segment of length
    * `8^b`, entered and left at cube corners, so the segment is
    * `[min(index of the 8 corners), min + 8^b - 1]` (Hilbert3Spec checks
    * the bound over random aligned cubes).
    *
    * Cell-size policy: start at 1/4 of the box's short side (one step
    * coarser than 2-D's 1/8 — a 3-D box's boundary-cell count grows with
    * the SQUARE of the subdivision), then ESCALATE one bit at a time
    * while the merged cover still exceeds `maxRanges`. The escalation is
    * what handles thin slabs: a 300x130x7 box at the short-side policy
    * merges to ~18k unit-cell ranges, at +3 bits to ~90 ranges with the
    * overshoot confined to the thin dimension (still ~0.06% of the curve
    * domain read). Each pass is pure driver-side math on the query
    * literals — worst observed ~50k cells, well under a millisecond of
    * arithmetic per retry.
    */
  def cover3(xlo: Long, xhi: Long, ylo: Long, yhi: Long,
      zlo: Long, zhi: Long, maxRanges: Int = 256): Seq[(Long, Long)] = {
    val max = Hilbert3.Side - 1
    require(0 <= xlo && xlo <= xhi && xhi <= max &&
      0 <= ylo && ylo <= yhi && yhi <= max &&
      0 <= zlo && zlo <= zhi && zhi <= max,
      "box out of the 10-bit key domain")
    val short = math.min(xhi - xlo + 1,
      math.min(yhi - ylo + 1, zhi - zlo + 1)) >> 2
    var minBits =
      if (short <= 1L) 0
      else 63 - java.lang.Long.numberOfLeadingZeros(short)
    var merged = cover3At(xlo, xhi, ylo, yhi, zlo, zhi, minBits)
    while (merged.size > maxRanges && minBits < Hilbert3.Bits) {
      minBits += 1
      merged = cover3At(xlo, xhi, ylo, yhi, zlo, zhi, minBits)
    }
    merged
  }

  private def cover3At(xlo: Long, xhi: Long, ylo: Long, yhi: Long,
      zlo: Long, zhi: Long, minBits: Int): Seq[(Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def go(x0: Long, y0: Long, z0: Long, bits: Int): Unit = {
      val size = 1L << bits
      val x1 = x0 + size - 1; val y1 = y0 + size - 1; val z1 = z0 + size - 1
      if (x1 < xlo || x0 > xhi || y1 < ylo || y0 > yhi ||
        z1 < zlo || z0 > zhi) return
      if ((x0 >= xlo && x1 <= xhi && y0 >= ylo && y1 <= yhi &&
          z0 >= zlo && z1 <= zhi) || bits <= minBits) {
        val corners = for (x <- Seq(x0, x1); y <- Seq(y0, y1); z <- Seq(z0, z1))
          yield Hilbert3.index3(x, y, z)
        out += ((corners.min, corners.min + (1L << (3 * bits)) - 1))
      } else {
        val h = 1L << (bits - 1)
        for (dx <- Seq(0L, h); dy <- Seq(0L, h); dz <- Seq(0L, h))
          go(x0 + dx, y0 + dy, z0 + dz, bits - 1)
      }
    }
    go(0L, 0L, 0L, Hilbert3.Bits)
    sortMerge(out)
  }

  private def sortMerge(
      out: scala.collection.mutable.ArrayBuffer[(Long, Long)])
      : Seq[(Long, Long)] = {
    val sorted = out.sortBy(_._1)
    val merged = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    for (iv <- sorted) {
      if (merged.nonEmpty && iv._1 <= merged.last._2 + 1)
        merged(merged.length - 1) =
          (merged.last._1, math.max(merged.last._2, iv._2))
      else merged += iv
    }
    merged.toSeq
  }
}
