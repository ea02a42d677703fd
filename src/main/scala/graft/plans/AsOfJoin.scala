package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Native AS-OF join — the whole-operator extension point from SURVEY
  * §2.2's preference ladder (custom `LogicalPlan` + `Strategy` +
  * `SparkPlan`), the rung the expression/aggregate/optimizer-rule
  * extensions don't reach. q26 expresses as-of as union + LOCF window
  * (two passes over the merged frame); time-series engines treat it as
  * a first-class MERGE: with both sides hash-partitioned on the key and
  * sorted by (key, time), one forward pass per partition pairs every
  * left row with the LAST right row at or before its timestamp — no
  * union row inflation, no window state, single streaming iterator.
  *
  * Semantics (left as-of-backward join):
  *  - each left row matches the right row with the greatest
  *    `rightOrder` sort position among rows with equal key and
  *    rightTime ≤ leftTime (rightOrder.head IS the right time; extra
  *    columns break ties — the greatest tiebreak wins, matching
  *    `ORDER BY t DESC, tiebreak DESC LIMIT 1`);
  *  - unmatched left rows keep null right columns (left-outer);
  *  - null left times and null right keys/times never match.
  *
  * Scale shape: `requiredChildDistribution` co-partitions the sides on
  * the key (EnsureRequirements inserts the two hash exchanges — or
  * none, when inputs are already partitioned right), `requiredChild
  * Ordering` gets per-partition sorts, and the merge itself is O(|L| +
  * |R|) per partition with O(1) state (the current lookahead row and
  * the last in-window match). Skewed keys split like any hash join
  * under AQE because the exchanges are ordinary shuffle exchanges.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightOrder: Seq[Expression]) extends BinaryNode {
  require(rightOrder.nonEmpty, "rightOrder must start with the right time")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy
  extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKey, n.rightKey, n.leftTime, n.rightOrder,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightOrder: Seq[Expression],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    SortOrder(rightKey, Ascending) +:
      rightOrder.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val lk = BindReferences.bindReference(leftKey, leftOut)
      val lt = BindReferences.bindReference(leftTime, leftOut)
      val rk = BindReferences.bindReference(rightKey, rightOut)
      val rt = BindReferences.bindReference(rightOrder.head, rightOut)
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      // bind against a NULLABLE right schema — unmatched rows carry the
      // all-null row, and a non-nullable BoundReference would skip the
      // null check and read garbage
      val joiner = UnsafeProjection.create(output,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.size)
      // O(1) merge state: the lookahead right row (copied — the child
      // iterator reuses its row) and the last in-window match.
      var rNext: InternalRow = if (ri.hasNext) ri.next().copy() else null
      var lastMatch: InternalRow = null
      var lastMatchKey: Any = null
      new Iterator[InternalRow] {
        override def hasNext: Boolean = li.hasNext
        override def next(): InternalRow = {
          val l = li.next()
          val lkV = lk.eval(l)
          val ltV = lt.eval(l)
          var scanning = rNext != null && lkV != null
          while (scanning) {
            val rkV = rk.eval(rNext)
            val c = if (rkV == null) -1 else keyOrd.compare(rkV, lkV)
            if (c < 0) {
              // right key behind the left cursor (or null): skip
              rNext = if (ri.hasNext) ri.next().copy() else null
            } else if (c == 0) {
              val rtV = rt.eval(rNext)
              if (rtV == null) {
                // null times sort first within the key; never match
                rNext = if (ri.hasNext) ri.next().copy() else null
              } else if (ltV != null && timeOrd.compare(rtV, ltV) <= 0) {
                lastMatch = rNext
                lastMatchKey = rkV
                rNext = if (ri.hasNext) ri.next().copy() else null
              } else scanning = false
            } else scanning = false
            if (rNext == null) scanning = false
          }
          val m =
            if (lastMatch != null && lkV != null && lastMatchKey != null &&
              keyOrd.compare(lastMatchKey, lkV) == 0) lastMatch
            else nullRight
          joiner(joined(l, m))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Dataset-level API over [[AsOfJoinNode]]. Column references resolve
  * against each side NOW (so the node enters the analyzer already
  * resolved); callers must give the two sides disjoint column names
  * (this API does not auto-dedup attribute ids like `Dataset.join`).
  * Requires [[graft.functions.GraftFunctions.register]] (or the
  * `GraftExtensions` session extension) so the planner knows the
  * strategy.
  */
object AsOfJoin {
  def join(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTime: String,
      rightOrderCols: Seq[String]): DataFrame = {
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"asof join requires disjoint column names; shared: $shared")
    GraftBridge.ofRows(left.sparkSession, AsOfJoinNode(
      left.queryExecution.analyzed,
      right.queryExecution.analyzed,
      GraftBridge.expression(left(leftKey)),
      GraftBridge.expression(right(rightKey)),
      GraftBridge.expression(left(leftTime)),
      rightOrderCols.map(c => GraftBridge.expression(right(c)))))
  }
}
