package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace token counter: the number of non-empty space-separated
  * tokens of a string, as ONE pass over the UTF-8 bytes inside whole-stage
  * codegen.
  *
  * The composable form — `size(filter(split(text, ' '), x -> length(x) > 0))`
  * — materializes the full token ARRAY (one UTF8String slice per token plus
  * the array header) just to take its length; on a token-statistics scan
  * over a 100 TB corpus that allocation is the dominant cost. This
  * expression touches each byte once and allocates nothing: a token is a
  * 0x20-to-non-0x20 transition. ASCII space only, matching the corpus
  * contract (and `split(text, ' ')`, which also splits on the single
  * byte).
  */
case class WsTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ws_token_count expects string, got $t")
    }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var count = 0L
    var inTok = false
    var i = 0
    while (i < n) {
      val sp = s.getByte(i) == 0x20
      if (!sp && !inTok) count += 1
      inTok = !sp
      i += 1
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val count = ctx.freshName("count")
      val inTok = ctx.freshName("inTok")
      val sp = ctx.freshName("sp")
      s"""
         |int $n = $s.numBytes();
         |long $count = 0L;
         |boolean $inTok = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  boolean $sp = $s.getByte($i) == 0x20;
         |  if (!$sp && !$inTok) $count++;
         |  $inTok = !$sp;
         |}
         |${ev.value} = $count;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): WsTokenCount = copy(child = newChild)
  override def prettyName: String = "ws_token_count"
}

object WsTokenCount {
  def apply(c: Column): Column =
    Bridge.column(WsTokenCount(Bridge.expression(c)))
}
