package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical normalization (NFC) as a native codegen'd
  * expression — the first stage of corpus text normalization. Composed
  * characters ("é") and their decomposed twins ("e" + U+0301) hash,
  * shingle, and dedup differently unless the corpus is canonicalized
  * first, so every text-dedup pipeline runs this up front. Spark has no
  * built-in for it; `java.text.Normalizer` is the JDK's implementation
  * of UAX #15 and matches any other conformant engine (DuckDB's
  * `nfc_normalize`) byte-for-byte, which keeps the operator
  * oracle-checkable.
  *
  * ASCII fast path: NFC can never change a pure-ASCII string, so the
  * helper skips the Normalizer allocation entirely when the UTF8String
  * has no high bytes — at 100 TB virtually all of an English-heavy
  * corpus takes the zero-copy branch.
  */
object NormalizeUtil {
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    val b = s.getBytes
    while (i < n) {
      if ((b(i) & 0x80) != 0) {
        return UTF8String.fromString(java.text.Normalizer
          .normalize(s.toString, java.text.Normalizer.Form.NFC))
      }
      i += 1
    }
    s
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a string column, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NormalizeUtil.nfc(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeUtil.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : NfcNormalize = copy(child = newChild)
}

object NormalizeFunctions {
  /** Column API for [[NfcNormalize]]. */
  def nfc_normalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
}
