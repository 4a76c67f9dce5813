package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed size of a string — the compression-ratio quality
  * signal (RefinedWeb/MassiveText-family pipelines drop documents whose
  * text compresses "too well": machine-generated boilerplate, keyword
  * stuffing, and template spam have far lower Kolmogorov complexity than
  * natural prose, and `compressed/raw` is the cheap practical estimate
  * of it). A native codegen'd expression over `java.util.zip.Deflater`:
  * map-only at any scale, no UDF, no serialization detour through Scala
  * types — the deflater consumes the UTF8String's bytes directly.
  *
  * Determinism: DEFLATE output for a fixed input, level, and strategy is
  * a pure function of the JDK's zlib; every executor in one cluster runs
  * the same runtime, so the column is stable within a job — and the
  * SIGNAL (ratio thresholding) is robust to the ±few-byte drift a zlib
  * upgrade could introduce. No SQL engine exposes DEFLATE, so queries on
  * this column are gated rows-only with semantics pinned in QualitySpec
  * (repetitive ≪ prose < random, monotone under repetition).
  *
  * Level 6 (zlib default) matches the ratio the published pipelines
  * measure; `nowrap = true` drops the 6-byte zlib header+checksum so
  * tiny documents aren't dominated by framing. */
object CompressUtil {
  def deflateLen(s: UTF8String): Int = {
    val in = s.getBytes
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

case class DeflateLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"deflate_len needs a string column, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    CompressUtil.deflateLen(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CompressUtil.deflateLen($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : DeflateLen = copy(child = newChild)
}

object CompressFunctions {
  /** Column API for [[DeflateLen]]. */
  def deflate_len(text: Column): Column =
    ColumnBridge.column(DeflateLen(ColumnBridge.expression(text)))
}
