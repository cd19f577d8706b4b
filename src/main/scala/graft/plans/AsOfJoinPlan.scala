package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection, Ascending}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/** As-of join as a first-class operator — Catalyst extension path (c):
  * logical node + planner Strategy + physical exec, registered through
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions).
  *
  * Semantics: for every left row, attach the right row with the same
  * key whose time is the greatest time ≤ the left row's time (nulls
  * when no such row). The physical plan asks the planner for both
  * sides hash-clustered on the key and sorted by (key, time); the
  * exec is then a single streaming merge per partition — O(1) state
  * (one buffered right row), no window frame, no union. This is the
  * shape a time-series engine gives its as-of join; the union+window
  * composition (`Advanced.q16AsofJoin`) is the pure-DataFrame
  * alternative, and the bench decides which serves the suite.
  *
  * v1 constraint: key and time must be LongType (the event-stream
  * shape). Generalizing is an UnsafeRow-ordering exercise, not a
  * design change.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {
  require(Seq(leftKey, rightKey, leftTime, rightTime).forall(_.dataType == LongType),
    "as-of join v1 supports LongType key/time columns")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical AsOfJoin into its exec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(j.leftKey, j.rightKey, j.leftTime, j.rightTime,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // pin the partition count so both exchanges land identically (and
  // AQE cannot coalesce one side away from the other) — zipPartitions
  // needs strict 1:1 alignment
  override def requiredChildDistribution: Seq[Distribution] = {
    val n = Some(SQLConf.get.numShufflePartitions)
    Seq(ClusteredDistribution(Seq(leftKey), requiredNumPartitions = n),
        ClusteredDistribution(Seq(rightKey), requiredNumPartitions = n))
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey; val rk = rightKey; val lt = leftTime; val rt = rightTime
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lkProj = UnsafeProjection.create(Seq(lk, lt), lOut)
      val rkProj = UnsafeProjection.create(Seq(rk, rt), rOut)
      // bind against NULLABLE right attrs: the projection must emit
      // nulls for unmatched left rows even when the right child's own
      // attributes are non-nullable (e.g. a case-class Dataset) —
      // binding rOut directly would skip the null check and emit 0s
      val outProj = UnsafeProjection.create(allOut,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      // one buffered right row: the latest right row seen for the key
      // currently being merged — O(1) state per partition
      var matchRow: InternalRow = null
      var matchKey = 0L
      var rHead: InternalRow = null
      var rHeadKey = 0L
      var rHeadTime = 0L
      def advanceRight(): Unit =
        if (rIt.hasNext) {
          rHead = rIt.next()
          val kt = rkProj(rHead)
          rHeadKey = kt.getLong(0); rHeadTime = kt.getLong(1)
        } else rHead = null
      advanceRight()
      lIt.map { lrow =>
        val kt = lkProj(lrow)
        val k = kt.getLong(0); val t = kt.getLong(1)
        while (rHead != null &&
               (rHeadKey < k || (rHeadKey == k && rHeadTime <= t))) {
          if (rHeadKey == k) { matchRow = rHead.copy(); matchKey = k }
          advanceRight()
        }
        val m = if (matchRow != null && matchKey == k) matchRow else nullRight
        outProj(joined(lrow, m))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
