package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE merge application (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units" — public literature).
  *
  * A BPE merge rewrites a symbol sequence left-to-right, fusing every
  * adjacent occurrence of pair (a, b) into the single symbol a+b. It is
  * the inner loop of both training (one merge applied to the whole
  * vocabulary per iteration) and encoding (the learned merge list applied
  * in rank order to every document): a declarative form would need a
  * sequential fold with lookahead — an interpreted higher-order lambda
  * per symbol — so the rewrite is a native expression instead, one JVM
  * array pass per merge with codegen (same pattern as
  * [[WordShingles]]).
  */
object BpeUtil {
  /** One left-to-right merge pass. `ab` is the fused symbol (precomputed
    * so the hot loop never concatenates). */
  def mergePair(arr: ArrayData, a: UTF8String, b: UTF8String,
      ab: UTF8String): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return arr
    val out = new Array[Any](n)
    var i = 0
    var j = 0
    while (i < n) {
      if (i < n - 1 && a.equals(arr.getUTF8String(i)) &&
          b.equals(arr.getUTF8String(i + 1))) {
        out(j) = ab
        i += 2
      } else {
        out(j) = arr.getUTF8String(i)
        i += 1
      }
      j += 1
    }
    if (j == n) arr
    else new GenericArrayData(java.util.Arrays.copyOf(
      out.asInstanceOf[Array[AnyRef]], j))
  }

  /** The full merge list in rank order — the standard BPE encode (each
    * learned merge applied in turn, exactly the sequence training
    * applied them in). `merges(k) = [a, b, ab]`. */
  def applyAll(arr: ArrayData, merges: Array[Array[UTF8String]]): ArrayData = {
    var cur = arr
    var k = 0
    while (k < merges.length && cur.numElements() > 1) {
      val m = merges(k)
      cur = mergePair(cur, m(0), m(1), m(2))
      k += 1
    }
    cur
  }
}

sealed abstract class BpeExpression extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"BPE needs array<string> symbols, got ${t.simpleString}")
  }
}

/** One merge (a, b) -> a+b over a symbol array — the training-loop step. */
case class BpeMerge(child: Expression, a: String, b: String)
    extends BpeExpression {
  @transient private lazy val aU = UTF8String.fromString(a)
  @transient private lazy val bU = UTF8String.fromString(b)
  @transient private lazy val abU = UTF8String.fromString(a + b)

  override def nullSafeEval(input: Any): Any =
    BpeUtil.mergePair(input.asInstanceOf[ArrayData], aU, bU, abU)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = "org.apache.spark.unsafe.types.UTF8String"
    val ar = ctx.addReferenceObj("bpeA", aU, cls)
    val br = ctx.addReferenceObj("bpeB", bU, cls)
    val abr = ctx.addReferenceObj("bpeAb", abU, cls)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeUtil.mergePair($c, $ar, $br, $abr);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMerge =
    copy(child = newChild)
}

/** The learned merge list applied in rank order — the encode step. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends BpeExpression {
  @transient private lazy val table: Array[Array[UTF8String]] =
    merges.map { case (a, b) => Array(UTF8String.fromString(a),
      UTF8String.fromString(b), UTF8String.fromString(a + b)) }.toArray

  override def nullSafeEval(input: Any): Any =
    BpeUtil.applyAll(input.asInstanceOf[ArrayData], table)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", table,
      "org.apache.spark.unsafe.types.UTF8String[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeUtil.applyAll($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeFunctions {
  def bpe_merge(symbols: Column, a: String, b: String): Column =
    ColumnBridge.column(BpeMerge(ColumnBridge.expression(symbols), a, b))

  def bpe_encode(symbols: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(symbols), merges))
}
