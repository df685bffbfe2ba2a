package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join: for every left row, attach the single right row with the same
  * key and the greatest right-time <= left-time (left-outer: no candidate →
  * nulls). The classic point-in-time lookup of event pipelines — "state as
  * of this event" — which Spark has no native operator for.
  *
  * Expressed with built-ins this is a range join + per-row argmax: the
  * candidate set is O(events × states-per-key) BEFORE aggregation, and
  * Catalyst plans the inequality as a broadcast nested loop or an exploded
  * equi-join — both collapse at scale. The right physical shape is the same
  * as a sort-merge join: co-partition both sides by key, sort each partition
  * by (key, time), then one linear merge pass holding exactly ONE candidate
  * row — O(n+m) per partition, no candidate explosion, no per-key buffering.
  * That shape is only expressible as a custom operator, so this follows the
  * SURVEY §7.5 ladder to (c): a logical node + planner strategy +
  * `BinaryExecNode`, injectable via `SparkSessionExtensions`
  * ([[graft.functions.GraftExtensions]]) or at runtime on a live session
  * ([[AsOf.ensureInstalled]]).
  *
  * Matching uses null-safe key equality order (nulls group like values);
  * callers with SQL-equality semantics filter null keys first, as
  * [[graft.rel.AsOfRel]] does. Scale notes: distribution/ordering
  * requirements let Catalyst reuse existing hash partitioning (bucketed or
  * pre-shuffled inputs skip the exchange entirely, AQE still re-plans the
  * exchanges it does insert); the merge itself is streaming — no rows are
  * materialized beyond the one retained match per side.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryNode {

  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs at least one equi-key per side")
  // the exec builds its comparators from the LEFT types and applies them to
  // both sides' projections; a hand-built plan bypasses analyzer casts, so
  // mismatched types would compare raw bytes — fail fast instead
  (leftKeys zip rightKeys).foreach { case (l, r) =>
    require(l.dataType == r.dataType,
      s"as-of key type mismatch: ${l.dataType} vs ${r.dataType}")
  }
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time type mismatch: ${leftTime.dataType} vs ${rightTime.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical as-of join. Children are hash-clustered on the keys and sorted
  * by (keys…, time); `doExecute` is a single forward merge per partition.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val out = output
    val lk = leftKeys; val rk = rightKeys
    val lt = leftTime; val rt = rightTime
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      // bind against the nullability-ADJUSTED right schema: the unmatched
      // case feeds an all-null row, which the original (non-nullable) right
      // attributes would read as garbage zeros instead of nulls
      val resultProj =
        UnsafeProjection.create(out, lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow

      // one-row lookahead on the right plus the single retained match; both
      // streams advance monotonically in (key, time), so each right row is
      // visited exactly once across the whole partition
      var rCur: InternalRow = if (rIt.hasNext) rIt.next() else null
      var lastMatch: InternalRow = null
      var lastMatchKey: InternalRow = null

      lIt.map { l =>
        val lKey = lKeyProj(l)
        val lTime = lTimeProj(l)
        var scanning = rCur != null
        while (scanning) {
          val c = keyOrd.compare(rKeyProj(rCur), lKey)
          if (c < 0 || (c == 0 && timeOrd.compare(rTimeProj(rCur), lTime) <= 0)) {
            if (c == 0) {
              // later right rows with the same key dominate earlier ones
              lastMatch = rCur.copy()
              lastMatchKey = lKey.copy()
            }
            rCur = if (rIt.hasNext) rIt.next() else null
            scanning = rCur != null
          } else scanning = false
        }
        val matched = lastMatch != null &&
          keyOrd.compare(lastMatchKey, lKey) == 0
        resultProj(joined(l, if (matched) lastMatch else nullRight))
      }
    }
  }
}

/** Planner strategy mapping the logical node to its exec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Public API: `AsOf.join(events, states, Seq("user_id"), "ts", "s_ts")`. */
object AsOf {

  /** Idempotently add the planner strategy to a LIVE session — the
    * extension-point route (`GraftExtensions`) only applies at session
    * construction, and the harness hands us an already-built session.
    */
  def ensureInstalled(spark: org.apache.spark.sql.SparkSession): Unit = {
    val exp = org.apache.spark.sql.graft.Bridge.experimental(spark)
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
  }

  /** Left-outer as-of join of `left` to `right` on equal `keys` with the
    * greatest `rightTimeCol <= leftTimeCol`. Column names must be
    * unambiguous within each side.
    */
  def join(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      keys: Seq[String], leftTimeCol: String, rightTimeCol: String)
      : org.apache.spark.sql.DataFrame = {
    ensureInstalled(left.sparkSession)
    val lPlan = left.queryExecution.analyzed
    // re-alias the right side with fresh exprIds: when both sides derive
    // from the same scan (the usual self-as-of shape), the analyzer's
    // relation dedup would otherwise re-id the right child underneath the
    // key expressions this node holds
    val rPlan = {
      val analyzed = right.queryExecution.analyzed
      org.apache.spark.sql.catalyst.plans.logical.Project(
        analyzed.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()),
        analyzed)
    }
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${plan.output.map(_.name).mkString(", ")}]"))
    val node = AsOfJoinPlan(lPlan, rPlan,
      keys.map(resolve(lPlan, _)), keys.map(resolve(rPlan, _)),
      resolve(lPlan, leftTimeCol), resolve(rPlan, rightTimeCol))
    org.apache.spark.sql.graft.Bridge.ofRows(left.sparkSession, node)
  }
}
