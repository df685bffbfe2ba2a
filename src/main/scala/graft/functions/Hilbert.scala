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
    * the box's short side), then sort-and-merge. Inclusive index ranges
    * over the order-16 domain.
    */
  def cover(xlo: Long, xhi: Long, ylo: Long, yhi: Long): Seq[(Long, Long)] = {
    val max = HilbertIndex.Side - 1
    require(0 <= xlo && xlo <= xhi && xhi <= max &&
      0 <= ylo && ylo <= yhi && yhi <= max, "box out of the 16-bit key domain")
    val short = math.min(xhi - xlo + 1, yhi - ylo + 1) >> 3
    val minBits =
      if (short <= 1L) 0
      else 63 - java.lang.Long.numberOfLeadingZeros(short)
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
