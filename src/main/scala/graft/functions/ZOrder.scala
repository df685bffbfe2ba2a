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
