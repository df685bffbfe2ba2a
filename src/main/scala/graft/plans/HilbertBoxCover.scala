package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

import graft.functions.{HilbertIndex, HInterval}

/** Optimizer rule: rewrite a plain 2-D box filter over Hilbert-laid-out
  * data into a scan that prunes by the Hilbert index — automatically, so
  * the user writes the query they mean:
  *
  * {{{ df.filter($"x".between(a, b) && $"y".between(c, d)) }}}
  *
  * and the rule ANDs in the [[HInterval.cover]] range decomposition over
  * the layout's index column (`h BETWEEN r1lo AND r1hi OR ...`), which
  * FileSourceStrategy pushes into the parquet scan as min/max-prunable
  * range predicates — the file/row-group skipping a Hilbert OPTIMIZE
  * exists to buy, without the caller hand-building OR'd ranges (the
  * lo_hscan gate's manual form). The original box predicates stay in the
  * plan: the cover is a SUPERSET of the box (aligned quadtree cells
  * overshoot, never undershoot — HilbertSpec pins this), so adding the
  * implied conjunct can only prune, never change results.
  *
  * The layout is DECLARED, not inferred: the session conf
  * `spark.graft.hilbert.layout = "xcol,ycol,hcol"` names the two 16-bit
  * key columns and the order-16 index column written by the layout job
  * (the relational analogue of a table clustering property — plain
  * parquet has nowhere durable to carry it). The rule fires only on a
  * Filter whose child carries ALL THREE columns and whose predicate
  * conjunctively bounds both keys with integral literals; a predicate
  * already referencing the index column is left untouched (idempotence,
  * and hand-built covers like lo_hscan's keep their exact form).
  *
  * Scale note: the rewrite is pure driver-side math on the query
  * literals — the cover of a box is O(perimeter / cell) intervals,
  * capped below; data never moves.
  */
object HilbertBoxCover extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.hilbert.layout"

  /** Covers larger than this are a sign the box spans most of the domain —
    * the OR chain would bloat the scan predicate for little pruning.
    */
  private val MaxRanges = 256

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val layout = conf.getConfString(ConfKey, "")
    if (layout.isEmpty) return plan
    val names = layout.split(",").map(_.trim)
    if (names.length != 3) return plan
    val Array(xName, yName, hName) = names

    plan transform {
      case f @ Filter(cond, child) =>
        val resolve = (n: String) => child.output.find(a => conf.resolver(a.name, n))
        (resolve(xName), resolve(yName), resolve(hName)) match {
          case (Some(x), Some(y), Some(h))
              if !cond.references.contains(h) =>
            val conjuncts = splitConjuncts(cond)
            (boxBounds(conjuncts, x), boxBounds(conjuncts, y)) match {
              case (Some((xlo, xhi)), Some((ylo, yhi))) =>
                coverPred(h, xlo, xhi, ylo, yhi) match {
                  case Some(pred) => Filter(And(pred, cond), child)
                  case None => f
                }
              case _ => f
            }
          case _ => f
        }
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Short, ShortType) => Some(v.toLong)
    case Literal(v: Byte, ByteType) => Some(v.toLong)
    case _ => None
  }

  /** Closed [lo, hi] bounds for `attr` from the conjunct list, or None if
    * either side is unbounded. Tightest bound wins when repeated; both
    * operand orientations and strict comparisons are normalized.
    */
  private def boxBounds(conjuncts: Seq[Expression],
      attr: Attribute): Option[(Long, Long)] = {
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    def raiseLo(v: Long): Unit = lo = Some(lo.fold(v)(math.max(_, v)))
    def lowerHi(v: Long): Unit = hi = Some(hi.fold(v)(math.min(_, v)))
    conjuncts.foreach {
      case GreaterThanOrEqual(a: Attribute, l) if a.semanticEquals(attr) =>
        litLong(l).foreach(raiseLo)
      case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(attr) =>
        litLong(l).foreach(lowerHi)
      case GreaterThan(a: Attribute, l) if a.semanticEquals(attr) =>
        litLong(l).foreach(v => raiseLo(v + 1))
      case LessThan(a: Attribute, l) if a.semanticEquals(attr) =>
        litLong(l).foreach(v => lowerHi(v - 1))
      case GreaterThanOrEqual(l, a: Attribute) if a.semanticEquals(attr) =>
        litLong(l).foreach(lowerHi)
      case LessThanOrEqual(l, a: Attribute) if a.semanticEquals(attr) =>
        litLong(l).foreach(raiseLo)
      case GreaterThan(l, a: Attribute) if a.semanticEquals(attr) =>
        litLong(l).foreach(v => lowerHi(v - 1))
      case LessThan(l, a: Attribute) if a.semanticEquals(attr) =>
        litLong(l).foreach(v => raiseLo(v + 1))
      case EqualTo(a: Attribute, l) if a.semanticEquals(attr) =>
        litLong(l).foreach { v => raiseLo(v); lowerHi(v) }
      case EqualTo(l, a: Attribute) if a.semanticEquals(attr) =>
        litLong(l).foreach { v => raiseLo(v); lowerHi(v) }
      case _ =>
    }
    for (l <- lo; u <- hi) yield (l, u)
  }

  /** The OR'd h-range predicate for the box clamped to the curve domain,
    * or None when the clamped box is empty / degenerate / too coarse to
    * be worth the predicate bloat.
    */
  private def coverPred(h: Attribute, xlo0: Long, xhi0: Long,
      ylo0: Long, yhi0: Long): Option[Expression] = {
    val max = HilbertIndex.Side - 1
    val xlo = math.max(xlo0, 0L); val xhi = math.min(xhi0, max)
    val ylo = math.max(ylo0, 0L); val yhi = math.min(yhi0, max)
    if (xlo > xhi || ylo > yhi) return None
    val ranges = HInterval.cover(xlo, xhi, ylo, yhi)
    if (ranges.isEmpty || ranges.size > MaxRanges) return None
    Some(ranges.map { case (a, b) =>
      And(GreaterThanOrEqual(h, Literal(a, LongType)),
        LessThanOrEqual(h, Literal(b, LongType))): Expression
    }.reduce(Or(_, _)))
  }

  /** Idempotently add the rule to a LIVE session; `GraftExtensions`
    * covers the construction-time route.
    */
  def ensureInstalled(spark: org.apache.spark.sql.SparkSession): Unit = {
    val exp = org.apache.spark.sql.graft.Bridge.experimental(spark)
    if (!org.apache.spark.sql.graft.Bridge.hasOptimizerRule(spark, HilbertBoxCover) &&
      !exp.extraOptimizations.contains(HilbertBoxCover))
      exp.extraOptimizations = exp.extraOptimizations :+ HilbertBoxCover
  }
}
