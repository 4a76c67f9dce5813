package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BoundReference, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native interval (time-window range) join: for every left row, attach
  * ALL right rows with equal keys and
  * `left.ts - before <= right.ts <= left.ts + after` — the enrichment
  * join shape (purchases x trailing clicks). Second instance of the full
  * custom-operator stack (logical node -> strategy -> physical operator)
  * after [[AsOfJoinNode]].
  *
  * Why a custom operator: Catalyst plans equi-key + time-range as a
  * sort-merge join on the key with the range as a RESIDUAL filter — per
  * key it materializes/compares the full n x m cross product before
  * filtering, which on a hot key (the 100 TB skew case) is quadratic.
  * This operator keeps both sides sorted by (key, ts) and sweeps with a
  * sliding window buffer: each right row enters the buffer once and is
  * evicted once, so per-key work is O(n + m + output) and state is
  * bounded by the window occupancy (rate x interval), never the group
  * size. Exactly the sweep a hand-written engine (or kdb/Flink interval
  * join) uses.
  *
  * Timestamps must be long-backed (integer epoch units); bounds are
  * half-open-free: both ends inclusive, `before`/`after` >= 0.
  */
case class IntervalJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute, rightCols: Seq[Attribute],
    joinedAttrs: Seq[Attribute],
    before: Long, after: Long, outer: Boolean) extends BinaryNode {
  // joinedAttrs are a constructor parameter so their exprIds survive
  // tree copies (see AsOfJoinNode)

  override def output: Seq[Attribute] = left.output ++ joinedAttrs

  override def producedAttributes: AttributeSet = AttributeSet(joinedAttrs)

  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): IntervalJoinNode =
    copy(left = newLeft, right = newRight)
}

object IntervalJoinNode {
  def create(left: LogicalPlan, right: LogicalPlan,
      leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
      leftTs: Attribute, rightTs: Attribute, rightCols: Seq[Attribute],
      before: Long, after: Long, outer: Boolean): IntervalJoinNode =
    IntervalJoinNode(left, right, leftKeys, rightKeys, leftTs, rightTs,
      rightCols, rightCols.map(a =>
        AttributeReference(s"ij_${a.name}", a.dataType, nullable = true)()),
      before, after, outer)
}

object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: IntervalJoinNode =>
      IntervalJoinExec(planLater(n.left), planLater(n.right), n.leftKeys,
        n.rightKeys, n.leftTs, n.rightTs, n.rightCols, n.output,
        n.before, n.after, n.outer) :: Nil
    case _ => Nil
  }
}

case class IntervalJoinExec(left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute, rightCols: Seq[Attribute],
    output: Seq[Attribute],
    before: Long, after: Long, outer: Boolean) extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

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
    val lKeyExprs = leftKeys.map(a =>
      BoundReference(leftOut.indexWhere(_.exprId == a.exprId), a.dataType,
        a.nullable))
    val rKeyExprs = rightKeys.map(a =>
      BoundReference(rightOut.indexWhere(_.exprId == a.exprId), a.dataType,
        a.nullable))
    val lTsIdx = leftOut.indexWhere(_.exprId == leftTs.exprId)
    val rTsIdx = rightOut.indexWhere(_.exprId == rightTs.exprId)
    val rColExprs = rightCols.map(a =>
      BoundReference(rightOut.indexWhere(_.exprId == a.exprId), a.dataType,
        a.nullable))
    val outRefs = output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable)
    }
    val (bef, aft, out) = (before, after, outer)

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs)
      val rKeyProj = UnsafeProjection.create(rKeyExprs)
      val rColProj = UnsafeProjection.create(rColExprs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val resultProj = UnsafeProjection.create(outRefs)
      val nullRight = InternalRow.fromSeq(Seq.fill(numRightCols)(null))
      val joined = new JoinedRow

      // sliding window of right rows for the CURRENT left key, ordered by
      // ts ascending (right side arrives sorted). Each right row is added
      // once and evicted once — O(n + m + output) per key.
      val bufTs = new java.util.ArrayDeque[java.lang.Long]()
      val bufRows = new java.util.ArrayDeque[InternalRow]()
      var bufKey: InternalRow = null

      var rNext: InternalRow = if (rIt.hasNext) rIt.next() else null
      def advanceR(): Unit = { rNext = if (rIt.hasNext) rIt.next() else null }

      lIt.flatMap { l =>
        val lKey = lKeyProj(l)
        if (bufKey == null || keyOrd.compare(bufKey, lKey) != 0) {
          bufTs.clear(); bufRows.clear()
          bufKey = lKey.copy()
        }
        if (l.isNullAt(lTsIdx)) {
          // no window without a left timestamp
          if (out) Iterator.single(resultProj(joined(l, nullRight)))
          else Iterator.empty
        } else {
          val lTs = l.getLong(lTsIdx)
          // pull right rows up to this left's upper bound
          var continue = rNext != null
          while (continue) {
            val kc = keyOrd.compare(rKeyProj(rNext), lKey)
            if (kc < 0) { advanceR(); continue = rNext != null } // dead key
            else if (kc > 0) continue = false // right side is ahead
            else if (rNext.isNullAt(rTsIdx)) { // null ts never joins
              advanceR(); continue = rNext != null
            } else {
              val rTs = rNext.getLong(rTsIdx)
              if (rTs - lTs <= aft) { // within (or below) the upper bound
                if (lTs - rTs <= bef) { // inside the window: buffer it
                  bufTs.addLast(rTs)
                  bufRows.addLast(rColProj(rNext).copy())
                } // else: below the lower bound — dead for all later lefts
                advanceR(); continue = rNext != null
              } else continue = false // beyond the bound: stop pulling
            }
          }
          // evict rows that fell below this left's lower bound
          while (!bufTs.isEmpty && lTs - bufTs.peekFirst() > bef) {
            bufTs.removeFirst(); bufRows.removeFirst()
          }
          if (bufRows.isEmpty) {
            if (out) Iterator.single(resultProj(joined(l, nullRight)))
            else Iterator.empty
          } else {
            val lCopy = l.copy() // flatMap consumer advances the left row
            val it = bufRows.iterator()
            new Iterator[InternalRow] {
              override def hasNext: Boolean = it.hasNext
              override def next(): InternalRow =
                resultProj(joined(lCopy, it.next()))
            }
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)
}
