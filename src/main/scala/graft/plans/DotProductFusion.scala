package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.functions.LongDotProduct

/** Optimizer rule: rewrite the declarative dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v) }}}
  *
  * into the fused native [[graft.functions.LongDotProduct]] expression — one
  * codegen'd loop, no per-element lambda closures, no intermediate array.
  * Users (and the engine's own relational twins) write the readable
  * HigherOrderFunction form; Catalyst substitutes the fast path, which is
  * exactly the division of labor the DataFrame API promises.
  *
  * Matching is by lambda-variable identity (exprId), commutative across the
  * multiply operands. Preconditions checked: both inputs are long arrays and
  * the fold seed is literal 0L. Assumed (the engine's vector invariant, and
  * LongDotProduct's contract): equal-length, non-null elements — zip_with
  * would null-pad a ragged pair where the fused loop requires alignment.
  * Under ANSI mode the fused form wraps on long overflow where Add/Multiply
  * would raise; embeddings are bounded far below the overflow range.
  *
  * Installed per-batch via `SparkSessionExtensions.injectOptimizerRule`
  * (session construction) or [[DotProductFusion.ensureInstalled]] on a live
  * session (`spark.experimental.extraOptimizations`, which Spark runs as a
  * dedicated post-optimization batch — constant folding has already
  * normalized the seed literal by then).
  */
object DotProductFusion extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(m1: NamedLambdaVariable,
                m2: NamedLambdaVariable, _),
                Seq(p1: NamedLambdaVariable, p2: NamedLambdaVariable), _)),
            Literal(0L, LongType),
            LambdaFunction(Add(s1: NamedLambdaVariable,
              s2: NamedLambdaVariable, _),
              Seq(q1: NamedLambdaVariable, q2: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable,
              Seq(r1: NamedLambdaVariable), _))
          if Set(m1.exprId, m2.exprId) == Set(p1.exprId, p2.exprId) &&
            Set(s1.exprId, s2.exprId) == Set(q1.exprId, q2.exprId) &&
            fin.exprId == r1.exprId &&
            isLongArray(a) && isLongArray(b) =>
        LongDotProduct(a, b)
    }

  /** Idempotently add the rule to a LIVE session (the harness hands us an
    * already-built one; `GraftExtensions` covers the construction-time
    * route).
    */
  def ensureInstalled(spark: org.apache.spark.sql.SparkSession): Unit = {
    val exp = org.apache.spark.sql.graft.Bridge.experimental(spark)
    // a session built withExtensions already runs the rule in the operator-
    // optimization batch; adding it to extraOptimizations would run a
    // redundant whole-plan pass per query
    if (!org.apache.spark.sql.graft.Bridge.hasOptimizerRule(spark, DotProductFusion) &&
      !exp.extraOptimizations.contains(DotProductFusion))
      exp.extraOptimizations = exp.extraOptimizations :+ DotProductFusion
  }
}
