package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Hilbert curve index — the locality-preserving space-filling curve
  * behind multi-dimensional file clustering. The Morton/Z curve
  * ([[graft.operators.Layout.zOrdered]]) interleaves bits and is the
  * cheaper encode, but it JUMPS: consecutive codes can sit on opposite
  * sides of the key space at every power-of-two boundary, so a file
  * holding a code range can still span a wide rectangle in (x, y). On
  * the Hilbert curve EVERY consecutive pair of codes is a grid-adjacent
  * pair of cells (unit Manhattan step, Hilbert 1891; the standard
  * iterative encode below is Wikipedia's public xy2d form), so a
  * contiguous code range is a tight connected blob — file min/max
  * stats box each file more tightly and 2-D box predicates open fewer
  * files at the same file count.
  */
object HilbertUtil {
  /** Map a quantized (x, y) cell in a 2^order x 2^order grid to its
    * distance along the Hilbert curve. Pure integer, ~order iterations
    * of shift/flip/swap — one call per row at write time only. */
  def xy2d(order: Int, xIn: Long, yIn: Long): Long = {
    var x = xIn
    var y = yIn
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** `hilbert_index(x, y)`: curve distance of the quantized cell (both
  * inputs already in [0, 2^order)); NULL if either side is NULL. */
case class HilbertIndex2(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {
  require(order >= 1 && order <= 31, s"order out of range: $order")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_index needs two longs, got ${a.simpleString}, " +
          b.simpleString)
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertUtil.xy2d(order, x.asInstanceOf[Long], y.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.HilbertUtil.xy2d($order, $x, $y);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertIndex2 =
    copy(left = newLeft, right = newRight)
}

object HilbertFunctions {
  def hilbert_index(x: Column, y: Column, order: Int): Column =
    ColumnBridge.column(HilbertIndex2(ColumnBridge.expression(x),
      ColumnBridge.expression(y), order))
}
