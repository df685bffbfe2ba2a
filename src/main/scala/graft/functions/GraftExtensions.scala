package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `SparkSessionExtensions` installer: registers the native expressions for
  * SQL use (`SELECT long_dot(a, b) ...`).
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * // or: spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  */
object GraftFunctions {
  /** Runtime registration on an existing session:
    * `GraftFunctions.register(spark)` then `spark.sql("... long_dot(a,b)")`.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graft.Bridge.registerFunction(spark, "long_dot", {
      children =>
        require(children.length == 2, "long_dot takes exactly 2 arguments")
        LongDotProduct(children.head, children(1))
    })
    org.apache.spark.sql.graft.Bridge.registerFunction(spark, "ws_token_count", {
      children =>
        require(children.length == 1, "ws_token_count takes 1 argument")
        WsTokenCount(children.head)
    })
    org.apache.spark.sql.graft.Bridge.registerFunction(spark, "kmin_strings", {
      children =>
        require(children.length == 2, "kmin_strings(col, k) takes 2 arguments")
        children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _) =>
            KMinStrings(children.head, k)
          case other => throw new IllegalArgumentException(
            s"k must be an int literal, got $other")
        }
    })
    org.apache.spark.sql.graft.Bridge.registerFunction(spark, "interleave_bits", {
      children =>
        require(children.length == 2, "interleave_bits takes 2 arguments")
        InterleaveBits(children.head, children(1))
    })
    org.apache.spark.sql.graft.Bridge.registerFunction(spark, "hilbert_index", {
      children =>
        require(children.length == 2, "hilbert_index takes 2 arguments")
        HilbertIndex(children.head, children(1))
    })
    org.apache.spark.sql.graft.Bridge.registerFunction(spark, "topk_pairs", {
      children =>
        require(children.length == 3,
          "topk_pairs(ord, id, k) takes 3 arguments")
        children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _) =>
            TopKPairs(children.head, children(1), k).toAggregateExpression()
          case other => throw new IllegalArgumentException(
            s"k must be an int literal, got $other")
        }
    })
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("long_dot"),
      new ExpressionInfo(classOf[LongDotProduct].getName, "long_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "long_dot takes exactly 2 arguments")
        LongDotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("ws_token_count"),
      new ExpressionInfo(classOf[WsTokenCount].getName, "ws_token_count"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "ws_token_count takes 1 argument")
        WsTokenCount(children.head)
      }))
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.DotProductFusion)
    ext.injectOptimizerRule(_ => graft.plans.HilbertBoxCover)
    ext.injectFunction((
      new FunctionIdentifier("kmin_strings"),
      new ExpressionInfo(classOf[KMinStrings].getName, "kmin_strings"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "kmin_strings(col, k) takes 2 arguments")
        children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _) =>
            KMinStrings(children.head, k)
          case other =>
            throw new IllegalArgumentException(s"k must be an int literal, got $other")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("interleave_bits"),
      new ExpressionInfo(classOf[InterleaveBits].getName, "interleave_bits"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "interleave_bits takes 2 arguments")
        InterleaveBits(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("hilbert_index"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "hilbert_index"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "hilbert_index takes 2 arguments")
        HilbertIndex(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("topk_pairs"),
      new ExpressionInfo(classOf[TopKPairs].getName, "topk_pairs"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3, "topk_pairs(ord, id, k) takes 3 arguments")
        children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _) =>
            TopKPairs(children.head, children(1), k).toAggregateExpression()
          case other => throw new IllegalArgumentException(
            s"k must be an int literal, got $other")
        }
      }))
  }
}
