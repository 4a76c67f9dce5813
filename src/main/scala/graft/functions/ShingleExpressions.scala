package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram shingling.
  *
  * Shingling is the inner loop of every text-dedup operator (n-gram
  * Jaccard, MinHash, fingerprinting): at 100 TB it runs once per token of
  * the corpus. The declarative form —
  * `transform(sequence(...), i -> concat_ws(" ", element_at(ws, i), ...))`
  * — evaluates higher-order lambdas interpreted, one expression-tree walk
  * per shingle (measured: the tree walk dominates the dedup queries).
  *
  * These expressions exploit that a word n-gram of a single-space-
  * tokenized text IS a contiguous byte slice of the original string: one
  * pass finds the space offsets, then each shingle is a byte-range copy
  * ([[WordShingles]]) or a direct XXH64 over the byte range with no
  * allocation at all ([[WordShingleHashes]] — bit-identical to
  * `xxhash64(shingle)` on the sliced string, Spark's seed 42).
  * Both emit identical results to the HOF reference form
  * ([[graft.operators.TextAnalysis.shinglesOf]], spec-asserted) including
  * the empty/short-doc and repeated-space edge cases, because
  * `split(text, " ", -1)` boundaries are exactly the 0x20 bytes (UTF-8
  * multibyte sequences never contain 0x20).
  */
object ShingleUtil {
  /** Token start offsets (0x20-delimited), as positions array of length
    * nTokens+1 with a sentinel one past the end. */
  private def boundaries(bytes: Array[Byte]): Array[Int] = {
    var count = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') count += 1; i += 1 }
    val starts = new Array[Int](count + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(count) = bytes.length + 1
    starts
  }

  def shingleArray(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val starts = boundaries(bytes)
    val m = starts.length - 1 - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val from = starts(j)
      val until = starts(j + n) - 1
      out(j) = UTF8String.fromBytes(bytes, from, until - from)
      j += 1
    }
    new GenericArrayData(out)
  }

  def shingleHashes(s: UTF8String, n: Int, seed: Long): ArrayData = {
    val bytes = s.getBytes
    val starts = boundaries(bytes)
    val m = starts.length - 1 - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      val from = starts(j)
      val until = starts(j + n) - 1
      out(j) = XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + from, until - from, seed)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Rolling-hash machinery for [[CharWindowHashes]]. Polynomial
  * Rabin-Karp over Unicode CODE POINTS (not bytes): the oracle-side
  * `substr` is code-point addressed in every ANSI engine, so span
  * positions derived from these hashes line up with SQL `substr`
  * positions for any input, not just ASCII. Base 1000003 mod the
  * Mersenne prime 2^61-1; the O(1) per-position update makes the whole
  * array one linear pass per document. */
object CharWindowHashUtil {
  private val Mod = (1L << 61) - 1
  private val Base = 1000003L

  private def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    val lo61 = lo & Mod
    val rest = (lo >>> 61) | (hi << 3)
    val r = lo61 + rest
    if (r >= Mod) r - Mod else r
  }

  def charWindowHashes(s: UTF8String, w: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val m = cps.length - w + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    var pow = 1L
    var i = 1
    while (i < w) { pow = mulmod(pow, Base); i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = (mulmod(h, Base) + cps(i)) % Mod; i += 1 }
    val out = new Array[Long](m)
    out(0) = h
    i = w
    while (i < cps.length) {
      h = (h + Mod - mulmod(cps(i - w).toLong, pow)) % Mod
      h = (mulmod(h, Base) + cps(i)) % Mod
      out(i - w + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Rolling hash of every w-code-point window as `array<long>` — entry j
  * (0-based) fingerprints `substr(text, j+1, w)` in SQL terms. The
  * primitive under cross-document duplicate-substring detection
  * ([[graft.operators.Dedup.duplicateSpans]]): only 8-byte hashes reach
  * the explode/shuffle, never the substrings themselves. */
case class CharWindowHashes(child: Expression, n: Int)
    extends ShingleExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CharWindowHashUtil.charWindowHashes(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharWindowHashUtil.charWindowHashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression)
      : CharWindowHashes = copy(child = newChild)
}

sealed abstract class ShingleExpression extends UnaryExpression {
  def n: Int

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"n must be >= 1, got $n")
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingles need a string column, got ${t.simpleString}")
  }
}

/** Word n-gram shingles as `array<string>` — codegen'd byte-slice form of
  * `TextAnalysis.shinglesOf(split(text, " "), n)`. */
case class WordShingles(child: Expression, n: Int) extends ShingleExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.shingleArray(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleUtil.shingleArray($c, $n);")

  override protected def withNewChildInternal(newChild: Expression)
      : WordShingles = copy(child = newChild)
}

/** XXH64(seed 42) of each word n-gram as `array<long>` — bit-identical to
  * `transform(shingles, s -> xxhash64(s))` with zero string allocation.
  * The form the inverted-index builders want: only the 8-byte hash ever
  * reaches the explode/shuffle. */
case class WordShingleHashes(child: Expression, n: Int)
    extends ShingleExpression {
  private val Seed = 42L // Spark's XxHash64 default seed

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.shingleHashes(input.asInstanceOf[UTF8String], n, Seed)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleUtil.shingleHashes($c, $n, ${Seed}L);")

  override protected def withNewChildInternal(newChild: Expression)
      : WordShingleHashes = copy(child = newChild)
}

object ShingleFunctions {
  /** Column API for [[WordShingles]]. */
  def word_shingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))

  /** Column API for [[WordShingleHashes]]. */
  def word_shingle_hashes(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingleHashes(ColumnBridge.expression(text), n))

  /** Column API for [[CharWindowHashes]]. */
  def char_window_hashes(text: Column, w: Int): Column =
    ColumnBridge.column(CharWindowHashes(ColumnBridge.expression(text), w))
}
