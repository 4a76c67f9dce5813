package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BoundReference, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: the full custom-operator stack (logical node ->
  * strategy -> physical sort-merge operator) for the one join flavor
  * Spark lacks (SURVEY.md §2.3, §7 v2).
  *
  * Semantics (identical to graft.operators.AsOfJoin.asofBackward, which
  * stays as the composed reference implementation): for every left row,
  * attach the latest right row with equal keys and right.ts <= left.ts;
  * nulls when none precedes. Like the window form, null keys group
  * together (window-partition convention, not join convention).
  *
  * Physical shape: both sides hash-clustered on the keys and sorted by
  * (keys, ts) — EnsureRequirements inserts the exchanges/sorts — then a
  * single forward-merge pass per partition carries the last preceding
  * right row onto each left row. One shuffle + sort per side and O(1)
  * state per key, vs the union form's extra union + window buffering;
  * exactly the plan a hand-written engine would pick at 100 TB.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute, rightCols: Seq[Attribute],
    asofAttrs: Seq[Attribute],
    direction: String = "backward",
    tolerance: Option[Long] = None) extends BinaryNode {
  // asofAttrs are a constructor parameter (not derived) so their exprIds
  // survive tree copies — a derived val would mint fresh ids on every
  // transformation and orphan parent references

  override def output: Seq[Attribute] = left.output ++ asofAttrs

  // asofAttrs are minted BY this node, not read from children
  override def producedAttributes
      : org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofAttrs)

  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinNode {
  def create(left: LogicalPlan, right: LogicalPlan,
      leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
      leftTs: Attribute, rightTs: Attribute,
      rightCols: Seq[Attribute],
      direction: String = "backward",
      tolerance: Option[Long] = None): AsOfJoinNode =
    AsOfJoinNode(left, right, leftKeys, rightKeys, leftTs, rightTs,
      rightCols, rightCols.map(a =>
        AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)()),
      direction, tolerance)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(planLater(n.left), planLater(n.right), n.leftKeys,
        n.rightKeys, n.leftTs, n.rightTs, n.rightCols, n.output,
        n.direction, n.tolerance) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute, rightCols: Seq[Attribute],
    output: Seq[Attribute],
    direction: String = "backward",
    tolerance: Option[Long] = None) extends BinaryExecNode {

  // keyless as-of (one global timeline) degenerates to a single
  // partition on both sides — ClusteredDistribution(Nil) is illegal
  override def requiredChildDistribution: Seq[Distribution] =
    if (leftKeys.isEmpty) AllTuples :: AllTuples :: Nil
    else ClusteredDistribution(leftKeys) ::
      ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val numRightCols = rightCols.length
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val lKeyExprs = leftKeys.map(a =>
      BoundReference(leftOut.indexWhere(_.exprId == a.exprId), a.dataType,
        a.nullable))
    val rKeyExprs = rightKeys.map(a =>
      BoundReference(rightOut.indexWhere(_.exprId == a.exprId), a.dataType,
        a.nullable))
    val lTsRef = BoundReference(
      leftOut.indexWhere(_.exprId == leftTs.exprId), tsType, leftTs.nullable)
    val rTsRef = BoundReference(
      rightOut.indexWhere(_.exprId == rightTs.exprId), tsType,
      rightTs.nullable)
    val rColExprs = rightCols.map(a =>
      BoundReference(rightOut.indexWhere(_.exprId == a.exprId), a.dataType,
        a.nullable))
    // output binds positionally over JoinedRow(left, rightCols/null):
    // the logical output's asof attrs carry fresh exprIds by design
    val outRefs = output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable)
    }

    val forward = direction == "forward"
    val tol = tolerance

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs)
      val rKeyProj = UnsafeProjection.create(rKeyExprs)
      val rColProj = UnsafeProjection.create(rColExprs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val tsRowL = UnsafeProjection.create(Seq(lTsRef))
      val tsRowR = UnsafeProjection.create(Seq(rTsRef))
      val resultProj = UnsafeProjection.create(outRefs)
      val nullRight = InternalRow.fromSeq(Seq.fill(numRightCols)(null))
      val joined = new JoinedRow

      var rNext: InternalRow = if (rIt.hasNext) rIt.next() else null

      if (!forward) {
        // BACKWARD: carry the last right row whose (key, ts) precedes the
        // merge cursor, with its key and ts — all copied (projections and
        // scanner rows are reused buffers)
        var lastKey: InternalRow = null
        var lastVals: InternalRow = null
        var lastTsLong = 0L

        def advanceRight(lKey: InternalRow, lTsRow: InternalRow): Unit = {
          var continue = rNext != null
          while (continue) {
            val rKey = rKeyProj(rNext)
            val kc = keyOrd.compare(rKey, lKey)
            val precedes = kc < 0 ||
              (kc == 0 && tsOrd.compare(tsRowR(rNext), lTsRow) <= 0)
            if (precedes) {
              if (kc == 0) { // only same-key rows are ever emitted
                lastKey = rKey.copy()
                lastVals = rColProj(rNext).copy()
                if (tol.isDefined) lastTsLong = tsRowR(rNext).getLong(0)
              }
              rNext = if (rIt.hasNext) rIt.next() else null
              continue = rNext != null
            } else continue = false
          }
        }

        lIt.map { l =>
          val lKey = lKeyProj(l)
          val lTsRow = tsRowL(l)
          advanceRight(lKey, lTsRow)
          val matched = lastKey != null &&
            keyOrd.compare(lastKey, lKey) == 0 &&
            tol.forall(t => lTsRow.getLong(0) - lastTsLong <= t)
          resultProj(joined(l, if (matched) lastVals else nullRight))
        }
      } else {
        // FORWARD: for each left row (ascending key, ts) the candidate is
        // the FIRST remaining right row with equal key and ts >= left ts.
        // Rows strictly before the cursor are dead for every later left
        // row too, so the right iterator advances monotonically and the
        // candidate itself is NOT consumed (it may serve several lefts).
        lIt.map { l =>
          val lKey = lKeyProj(l)
          val lTsRow = tsRowL(l)
          var continue = rNext != null
          while (continue) {
            val rKey = rKeyProj(rNext)
            val kc = keyOrd.compare(rKey, lKey)
            val dead = kc < 0 ||
              (kc == 0 && tsOrd.compare(tsRowR(rNext), lTsRow) < 0)
            if (dead) {
              rNext = if (rIt.hasNext) rIt.next() else null
              continue = rNext != null
            } else continue = false
          }
          val matched = rNext != null &&
            keyOrd.compare(rKeyProj(rNext), lKey) == 0 &&
            tol.forall(t => tsRowR(rNext).getLong(0) - lTsRow.getLong(0) <= t)
          resultProj(joined(l, if (matched) rColProj(rNext) else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec = copy(left = newLeft, right = newRight)
}
