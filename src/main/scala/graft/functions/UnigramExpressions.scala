package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native unigram-LM (SentencePiece, Kudo 2018 — public literature)
  * Viterbi segmentation: the best tokenization of a word under a piece
  * cost table is a min-sum dynamic program over substring ends —
  * inherently sequential per word, so (like [[BpeUtil]]) it runs as one
  * JVM pass per row behind a codegen'd expression instead of an
  * interpreted higher-order-function chain.
  *
  * Costs are EXACT fixed-point integers (round-9 rebase):
  * `cost(p) = log2_fp(total) - log2_fp(count_p)` in Q20, i.e. the
  * negated log-probability scaled by 2^20 — see [[FixedLog.log2Fp]].
  * Integer sums are associative and comparable bit-for-bit across
  * engines, which is what lets the DuckDB oracle replay the WHOLE
  * training loop (each EM round's Viterbi runs as a recursive CTE
  * carrying the DP window) and the gate become hash-exact.
  *
  * The DP is deterministic: candidate starts are scanned in a fixed
  * order (longest piece first) and only a STRICT improvement moves the
  * back-pointer, so equal-cost ties resolve to the longest piece — the
  * learned segmentation is identical across partitionings AND replayable
  * in SQL (`cost ASC, piece length DESC`). Characters absent from the
  * table get the finite floor cost `unkCost`, so every string segments
  * (full coverage, the property SentencePiece guarantees via required
  * single chars). */
object UnigramUtil {

  /** Shared piece table: java HashMap for cheap probe from codegen. */
  def buildTable(pieces: Array[String], costs: Array[Long])
      : java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](
      pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), costs(i)); i += 1 }
    m
  }

  /** Viterbi over one word (no spaces): returns the best piece split. */
  def segmentWord(word: String,
      table: java.util.HashMap[String, java.lang.Long], maxLen: Int,
      unkCost: Long, out: java.util.ArrayList[UTF8String]): Unit = {
    val n = word.length
    if (n == 0) return
    val best = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      best(i) = Long.MaxValue
      val lo = math.max(0, i - maxLen)
      var j = lo
      while (j < i) {
        val piece = word.substring(j, i)
        val cBoxed = table.get(piece)
        // coverage floor for one unknown CODE POINT — including a
        // surrogate pair (2 UTF-16 units), or segmentation of an astral
        // char absent from the table would be impossible and the
        // Viterbi path would emit lone surrogates
        val oneCp = i - j == 1 ||
          (i - j == 2 && Character.isHighSurrogate(word.charAt(j)) &&
            Character.isLowSurrogate(word.charAt(j + 1)))
        val c =
          if (cBoxed != null) cBoxed.longValue()
          else if (oneCp) unkCost
          else Long.MaxValue
        if (c != Long.MaxValue && best(j) != Long.MaxValue) {
          val cand = best(j) + c
          if (cand < best(i)) { best(i) = cand; back(i) = j }
        }
        j += 1
      }
      i += 1
    }
    // reconstruct (indices collected backward, emitted forward)
    val cuts = new java.util.ArrayList[Int]()
    var k = n
    while (k > 0) { cuts.add(k); k = back(k) }
    var c = cuts.size() - 1
    var prev = 0
    while (c >= 0) {
      val end = cuts.get(c)
      out.add(UTF8String.fromString(word.substring(prev, end)))
      prev = end
      c -= 1
    }
  }

  /** Segment a whole space-tokenized text: each word independently, one
    * flat output array — one native call per document row. */
  def segmentText(text: UTF8String,
      table: java.util.HashMap[String, java.lang.Long], maxLen: Int,
      unkCost: Long): ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[UTF8String]()
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) segmentWord(s.substring(start, i), table, maxLen,
          unkCost, out)
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray(
      new Array[AnyRef](out.size()).asInstanceOf[Array[AnyRef]]))
  }
}

/** `unigram_segment(text)` — Viterbi-best pieces of every
  * space-separated word under the learned fixed-point cost table, one
  * flat array. */
case class UnigramSegment(child: Expression, pieces: Seq[(String, Long)],
    maxLen: Int, unkCost: Long) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_segment needs a string column, got ${t.simpleString}")
  }

  @transient private lazy val table = UnigramUtil.buildTable(
    pieces.map(_._1).toArray, pieces.map(_._2).toArray)

  override def nullSafeEval(input: Any): Any =
    UnigramUtil.segmentText(input.asInstanceOf[UTF8String], table, maxLen,
      unkCost)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // raw HashMap type: Janino's generics support is not to be trusted
    val ref = ctx.addReferenceObj("unigramTable", table,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnigramUtil.segmentText($c, $ref, " +
        s"$maxLen, ${unkCost}L);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : UnigramSegment = copy(child = newChild)
}

object UnigramFunctions {
  /** Column API for [[UnigramSegment]]. */
  def unigram_segment(text: Column, pieces: Seq[(String, Long)],
      maxLen: Int, unkCost: Long): Column =
    ColumnBridge.column(UnigramSegment(
      ColumnBridge.expression(text), pieces, maxLen, unkCost))
}
