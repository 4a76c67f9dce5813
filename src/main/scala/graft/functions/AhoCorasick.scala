package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring matching — the blocklist primitive of corpus
  * filtering (banned phrases, spam markers, contaminating boilerplate).
  * At 100 TB the naive forms are the bottleneck: a regex alternation of
  * N phrases backtracks per position, and N `contains()` calls scan the
  * text N times. The Aho-Corasick automaton (Aho & Corasick 1975,
  * "Efficient string matching: an aid to bibliographic search") finds
  * every occurrence of every pattern in ONE pass: goto/fail links are
  * precompiled into a dense byte-indexed DFA, so matching is one array
  * lookup per input byte regardless of |patterns|.
  *
  * Semantics: counts every (pattern, start position) occurrence — a
  * pattern's own overlaps count (pattern "aa" in "aaa" -> 2), nested
  * patterns each count at their own positions. Matching is exact on
  * UTF-8 BYTES, which for exact substring equality coincides with
  * character matching (UTF-8 is self-synchronizing: a valid encoded
  * pattern can only align on character boundaries).
  *
  * The automaton lives on the DRIVER once per query plan and ships to
  * executors inside the expression (Spark's standard literal-state
  * route, same as a compiled regex); the dense next table costs
  * |trie nodes| x 256 ints — right for blocklists up to ~10^5 total
  * pattern bytes (a 100k-byte list is ~100 MB; past that a banked
  * transition map is the path, not a different algorithm).
  */
final class AcAutomaton(val patterns: Array[Array[Byte]])
    extends Serializable {
  require(patterns.nonEmpty, "automaton needs at least one pattern")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty")

  // built lazily on first use per JVM: only the raw patterns serialize
  @transient private lazy val dfa: (Array[Array[Int]], Array[Array[Int]]) = {
    // trie
    var nNodes = 1
    val next = scala.collection.mutable.ArrayBuffer(
      Array.fill(256)(-1)) // -1 = no edge yet (trie phase)
    val ends = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { b =>
        val c = b & 0xff
        if (next(s)(c) == -1) {
          next(s)(c) = nNodes
          next += Array.fill(256)(-1)
          ends += scala.collection.mutable.ArrayBuffer.empty[Int]
          nNodes += 1
        }
        s = next(s)(c)
      }
      ends(s) += pi
    }
    // BFS: fail links folded directly into the next table (goto DFA),
    // outputs closed over the fail chain so matching never walks it
    val fail = new Array[Int](nNodes)
    val queue = scala.collection.mutable.Queue.empty[Int]
    (0 until 256).foreach { c =>
      val v = next(0)(c)
      if (v == -1) next(0)(c) = 0
      else { fail(v) = 0; queue += v }
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      ends(u) ++= ends(fail(u))
      (0 until 256).foreach { c =>
        val v = next(u)(c)
        if (v == -1) next(u)(c) = next(fail(u))(c)
        else { fail(v) = next(fail(u))(c); queue += v }
      }
    }
    (next.toArray, ends.map(_.toArray).toArray)
  }

  /** Per-pattern occurrence counts over the input, one array lookup per
    * byte. Returned array is indexed by pattern ordinal. */
  def countAll(s: UTF8String): Array[Long] = {
    val (next, out) = dfa
    val counts = new Array[Long](patterns.length)
    val bytes = s.getBytes
    var state = 0
    var i = 0
    while (i < bytes.length) {
      state = next(state)(bytes(i) & 0xff)
      val o = out(state)
      var j = 0
      while (j < o.length) { counts(o(j)) += 1; j += 1 }
      i += 1
    }
    counts
  }
}

/** `array<long>` of per-pattern occurrence counts (ordinal-indexed) of
  * every blocklist pattern in the text — one automaton pass, codegen'd.
  * NULL text yields NULL. */
case class MultiPatternCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty, "multi_pattern_counts needs patterns")
  require(patterns.distinct.size == patterns.size,
    s"duplicate blocklist patterns: $patterns")

  @transient private lazy val automaton =
    new AcAutomaton(patterns.map(_.getBytes("UTF-8")).toArray)

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"multi_pattern_counts needs a string column, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      automaton.countAll(input.asInstanceOf[UTF8String]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    $ac.countAll($c));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MultiPatternCounts = copy(child = newChild)
}

object AhoCorasickFunctions {
  /** Column form: per-pattern occurrence counts, ordinal-indexed. */
  def multi_pattern_counts(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(
      MultiPatternCounts(ColumnBridge.expression(text), patterns))
}
