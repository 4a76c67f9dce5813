package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native binary search over SORTED, NON-OVERLAPPING interval bounds:
  * `RangeLookupIdx(x, los, his)` returns the 0-based index i with
  * `los[i] <= x <= his[i]`, or NULL when no interval contains x.
  *
  * This is the probe side of a broadcast interval-LOOKUP join (IP range
  * -> geo, value -> tax bracket, timestamp -> calendar period): Catalyst
  * plans `probe JOIN dim ON x BETWEEN lo AND hi` as
  * BroadcastNestedLoopJoin — O(|dim|) comparisons per probe row — while
  * this expression is O(log |dim|) inside whole-stage codegen, with the
  * bounds living in the plan as two array literals (operators.RangeDim
  * builds them; payload columns attach by `element_at` on the returned
  * index). Both bounds arrays must share the probe's numeric family:
  * array<long> with an integral probe, array<double> with a fractional
  * one — the operator wrapper picks and casts.
  */
case class RangeLookupIdx(x: Expression, los: Expression, his: Expression)
    extends TernaryExpression {

  override def first: Expression = x
  override def second: Expression = los
  override def third: Expression = his

  private def isLongMode: Boolean = x.dataType == LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def arrOf(e: Expression, t: DataType) = e.dataType match {
      case ArrayType(et, _) => et == t
      case _ => false
    }
    val ok = x.dataType match {
      case LongType => arrOf(los, LongType) && arrOf(his, LongType)
      case DoubleType => arrOf(los, DoubleType) && arrOf(his, DoubleType)
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "range_lookup_idx needs (bigint, array<bigint>, array<bigint>) or " +
        s"(double, array<double>, array<double>), got ${x.dataType
          .simpleString}, ${los.dataType.simpleString}, ${his.dataType
          .simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val xv = x.eval(input)
    val lv = los.eval(input)
    val hv = his.eval(input)
    if (xv == null || lv == null || hv == null) return null
    val lo = lv.asInstanceOf[ArrayData]
    val hi = hv.asInstanceOf[ArrayData]
    val n = lo.numElements()
    // greatest i with los[i] <= x, then containment check against his[i]
    var l = 0; var r = n - 1; var ans = -1
    if (isLongMode) {
      val xd = xv.asInstanceOf[Long]
      while (l <= r) {
        val m = (l + r) >>> 1
        if (lo.getLong(m) <= xd) { ans = m; l = m + 1 } else r = m - 1
      }
      if (ans >= 0 && xd <= hi.getLong(ans)) ans else null
    } else {
      val xd = xv.asInstanceOf[Double]
      while (l <= r) {
        val m = (l + r) >>> 1
        if (lo.getDouble(m) <= xd) { ans = m; l = m + 1 } else r = m - 1
      }
      if (ans >= 0 && xd <= hi.getDouble(ans)) ans else null
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (jt, acc) =
      if (isLongMode) ("long", "getLong") else ("double", "getDouble")
    nullSafeCodeGen(ctx, ev, (xv, lv, hv) => {
      val l = ctx.freshName("l"); val r = ctx.freshName("r")
      val m = ctx.freshName("m"); val ans = ctx.freshName("ans")
      s"""
         |int $l = 0, $r = $lv.numElements() - 1, $ans = -1;
         |while ($l <= $r) {
         |  int $m = ($l + $r) >>> 1;
         |  if ($lv.$acc($m) <= $xv) { $ans = $m; $l = $m + 1; }
         |  else $r = $m - 1;
         |}
         |if ($ans >= 0 && $xv <= ($jt)$hv.$acc($ans)) {
         |  ${ev.value} = $ans;
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): RangeLookupIdx =
    copy(newFirst, newSecond, newThird)
}

object RangeLookupIdx {
  def apply(x: Column, los: Column, his: Column): Column =
    ColumnBridge.column(RangeLookupIdx(ColumnBridge.expression(x),
      ColumnBridge.expression(los), ColumnBridge.expression(his)))
}
