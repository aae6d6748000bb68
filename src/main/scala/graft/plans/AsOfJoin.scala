package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode => LogicalBinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** AS-OF JOIN as a first-class operator: for each left row, the most
  * recent right row with rightTime strictly before leftTime on the
  * same key.
  *
  * Spark has no built-in as-of join; graft offers two implementations:
  *  - [[graft.operators.Operators.asOfJoin]] — composed union+window
  *    (pure DataFrame API, used by the oracle-checked q22);
  *  - this custom plan — a sort-merge pass: both sides hash-clustered
  *    on the key and sorted by (key, time); each partition is merged
  *    with ONE buffered right row per key. No union row-padding, no
  *    window state, payload columns never materialize for non-matching
  *    rows. This is the whole-operator route the engine uses when
  *    composition costs too much: same single shuffle, but ~half the
  *    shuffled bytes (no null-padded union) and O(1) memory per key.
  *
  * Wired in via [[GraftExtensions]] (injectPlannerStrategy).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Expression],
    payloadOut: Seq[Attribute]) extends LogicalBinaryNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(payloadOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical sort-merge as-of join. */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Expression],
    payloadOut: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(payloadOut)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    // Hoist everything derived from `this`/children into locals: the
    // task closure must not capture the SparkPlan (file-scan nodes
    // carry transient state that is empty on executors).
    val ktTypes = leftKeys.map(_.dataType) :+ leftTime.dataType
    val lKeyTime = leftKeys :+ leftTime
    val rKeyTime = rightKeys :+ rightTime
    val lKeysL = leftKeys; val rKeysL = rightKeys; val payloadL = payload
    val lOut = left.output; val rOut = right.output; val outAttrs = output
    val nPayload = payloadOut.size
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKT = UnsafeProjection.create(lKeyTime, lOut)
      val rKT = UnsafeProjection.create(rKeyTime, rOut)
      val lK = UnsafeProjection.create(lKeysL, lOut)
      val rK = UnsafeProjection.create(rKeysL, rOut)
      val payloadProj = UnsafeProjection.create(payloadL, rOut)
      val ktOrdering =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .createNaturalAscendingOrdering(ktTypes)
      val nullPayload = new GenericInternalRow(nPayload)
      val joined = new JoinedRow
      // downstream operators require UnsafeRow
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rBuf = rIt.buffered

      var lastPayload: InternalRow = null
      var lastKey: InternalRow = null

      lIt.map { l =>
        val lkt = lKT(l).copy()
        // consume every right row strictly before (key, time) of l
        while (rBuf.hasNext && ktOrdering.compare(rKT(rBuf.head), lkt) < 0) {
          val r = rBuf.next()
          lastPayload = payloadProj(r).copy()
          lastKey = rK(r).copy()
        }
        val lkey = lK(l)
        if (lastKey != null && lastKey == lkey) outProj(joined(l, lastPayload))
        else outProj(joined(l, nullPayload))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy lowering [[AsOfJoinPlan]] to [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, p, po) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, p, po) :: Nil
    case _ => Nil
  }
}
