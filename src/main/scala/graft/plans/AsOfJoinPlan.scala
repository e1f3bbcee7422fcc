package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of backward join: the full custom-operator stack (SURVEY §7
  * preference (c)) — logical node → planner strategy → physical exec.
  *
  * The composed form ([[graft.operators.AsOfJoin.asofBackward]]) unions
  * both sides through one window sort and then re-joins the match back to
  * the left row. This operator does it in ONE sorted merge pass: both
  * children are hash-clustered on the key and sorted (key, time, tiebreak);
  * each partition pair merges with a running last-right-payload pointer —
  * no union, no second join, and the sort width is each side's own row.
  *
  * Left rows pass through with one appended column holding the payload of
  * the latest right row with `right.time <= left.time` for the same key
  * (NULL when no such row).
  */
object AsOfJoinPlan {

  /** Logical node. Built post-analysis from resolved child plans, so no
    * analyzer rule is needed (`resolved` derives from children).
    */
  case class AsOfJoinNode(
      left: LogicalPlan, right: LogicalPlan,
      leftKey: Expression, leftTime: Expression, leftTie: Expression,
      rightKey: Expression, rightTime: Expression, rightTie: Expression,
      payload: Expression, asOfAttr: AttributeReference)
      extends BinaryNode {
    override def output: Seq[Attribute] = left.output :+ asOfAttr
    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(asOfAttr)
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
      copy(left = newLeft, right = newRight)
  }

  object AsOfStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinNode(l, r, lk, lt, ltb, rk, rt, rtb, p, attr) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, lt, ltb, rk, rt, rtb, p, attr) :: Nil
      case _ => Nil
    }
  }

  case class AsOfJoinExec(
      left: SparkPlan, right: SparkPlan,
      leftKey: Expression, leftTime: Expression, leftTie: Expression,
      rightKey: Expression, rightTime: Expression, rightTie: Expression,
      payload: Expression, asOfAttr: AttributeReference)
      extends BinaryExecNode {

    override def output: Seq[Attribute] = left.output :+ asOfAttr
    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(asOfAttr)

    // EnsureRequirements co-partitions both sides on the key and sorts each
    // side (key, time, tiebreak) — the merge below then only ever moves
    // pointers forward.
    override def requiredChildDistribution: Seq[Distribution] =
      Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(leftTie, org.apache.spark.sql.catalyst.expressions.Ascending)),
      Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(rightTie, org.apache.spark.sql.catalyst.expressions.Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

    override protected def doExecute(): RDD[InternalRow] = {
      val lKey = BindReferences.bindReference(leftKey, left.output)
      val lTime = BindReferences.bindReference(leftTime, left.output)
      val rKey = BindReferences.bindReference(rightKey, right.output)
      val rTime = BindReferences.bindReference(rightTime, right.output)
      val pay = BindReferences.bindReference(payload, right.output)
      val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
      val outSchema = output
      val leftWidth = left.output.size

      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val proj = UnsafeProjection.create(outSchema, outSchema)
        val joined = new JoinedRow
        val payloadRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        val _ = leftWidth
        val rBuf = rIter.buffered
        // running match: payload of the latest consumed right row + its key
        var haveMatch = false
        var matchKey: Any = null
        var matchPayload: Any = null

        lIter.map { lRow =>
          val lk = lKey.eval(lRow)
          val lt = lTime.eval(lRow)
          // consume right rows that are ≤ (lk, lt) in (key, time) order
          var advance = true
          while (advance && rBuf.hasNext) {
            val rRow = rBuf.head
            val rk = rKey.eval(rRow)
            val kc = keyOrd.compare(rk, lk)
            if (kc < 0 || (kc == 0 && timeOrd.compare(rTime.eval(rRow), lt) <= 0)) {
              // value types here are atomic (numeric/UTF8String); copy
              // UTF8String since the underlying row buffer is reused
              val p = pay.eval(rRow) match {
                case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
                case other => other
              }
              matchKey = rk match {
                case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
                case other => other
              }
              matchPayload = p
              haveMatch = true
              rBuf.next()
            } else advance = false
          }
          val matches = haveMatch && keyOrd.compare(matchKey, lk) == 0
          payloadRow.update(0, if (matches) matchPayload else null)
          proj(joined(lRow, payloadRow))
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)
  }
}
