package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two int64 keys — the multi-dimensional
  * clustering primitive a 100 TB lakehouse uses to lay data out so that a
  * range predicate on EITHER dimension prunes files/row-groups (what
  * Delta/Iceberg `OPTIMIZE ZORDER BY` computes before a sort-and-rewrite).
  *
  * Each input is masked to its low 31 bits and spread with the classic
  * 5-step magic-mask chain (16/8/4/2/1), then x takes the even bit
  * positions and y the odd — a 62-bit non-negative code, total order =
  * depth-first traversal of the quadtree. Pure bit arithmetic, fused into
  * whole-stage codegen; the relational twin is the same chain as five
  * chained CTE steps (see SourceOps.ZORDER_SQL), so the DuckDB oracle
  * proves the generated code bit-for-bit.
  */
case class InterleaveBits(left: Expression, right: Expression)
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
    InterleaveBits.spread(a.asInstanceOf[Long]) |
      (InterleaveBits.spread(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      def chain(v: String): String =
        s"""
           |$v = ($v | ($v << 16)) & 0x0000FFFF0000FFFFL;
           |$v = ($v | ($v << 8))  & 0x00FF00FF00FF00FFL;
           |$v = ($v | ($v << 4))  & 0x0F0F0F0F0F0F0F0FL;
           |$v = ($v | ($v << 2))  & 0x3333333333333333L;
           |$v = ($v | ($v << 1))  & 0x5555555555555555L;
         """.stripMargin
      s"""
         |long $sx = $x & 0x7FFFFFFFL;
         |long $sy = $y & 0x7FFFFFFFL;
         |${chain(sx)}
         |${chain(sy)}
         |${ev.value} = $sx | ($sy << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  /** Spread the low 31 bits of `x` to the even bit positions. */
  def spread(x: Long): Long = {
    var v = x & 0x7FFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Column wrapper: `zorder(x, y)` — 62-bit Morton code. */
  def zorder(x: Column, y: Column): Column =
    Bridge.column(InterleaveBits(Bridge.expression(x), Bridge.expression(y)))
}

/** Z-interval decomposition of a 2-D box query — the READ side of the
  * Z-order layout: a rectangle `[xlo,xhi] x [ylo,yhi]` becomes a small OR
  * of contiguous morton ranges (every aligned quadtree cell's codes are
  * contiguous), which a morton-sorted store answers with min/max
  * statistics alone — file/row-group skipping on a 2-D predicate, the
  * whole point of writing z-ordered. Driver-side pure math on the query
  * literals (no data touched); the residual exact box filter stays on the
  * scan, so the intervals only ever need to be a COVER, never exact.
  */
object ZInterval {

  /** Cover of the box by aligned quadtree cells, descending until a cell
    * is fully inside/outside or smaller than 1/8 of the box's short side —
    * so the cell count is O(perimeter / cell size) and the covered slop
    * beyond the box stays a small fraction of its area (the residual
    * filter absorbs it). Adjacent/overlapping intervals are merged.
    * Inclusive morton ranges.
    */
  def cover(xlo: Long, xhi: Long, ylo: Long, yhi: Long): Seq[(Long, Long)] = {
    require(0 <= xlo && xlo <= xhi && xhi <= 0x7FFFFFFFL &&
      0 <= ylo && ylo <= yhi && yhi <= 0x7FFFFFFFL, "box out of key domain")
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
        val base = InterleaveBits.spread(x0) | (InterleaveBits.spread(y0) << 1)
        out += ((base, base + (1L << (2 * bits)) - 1))
      } else {
        val h = 1L << (bits - 1)
        go(x0, y0, bits - 1)
        go(x0 + h, y0, bits - 1)
        go(x0, y0 + h, bits - 1)
        go(x0 + h, y0 + h, bits - 1)
      }
    }
    go(0L, 0L, 31)
    // quadtree emission order IS morton order; merge touching neighbors
    val merged = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    for (iv <- out) {
      if (merged.nonEmpty && iv._1 <= merged.last._2 + 1)
        merged(merged.length - 1) = (merged.last._1, math.max(merged.last._2, iv._2))
      else merged += iv
    }
    merged.toSeq
  }
}
