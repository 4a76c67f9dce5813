package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native md5-u32 decode — the engine's cross-engine deterministic hash
  * (`conv(substring(md5(x), 1+8w, 8), 16, 10)`) as ONE codegen'd
  * expression over the raw digest bytes.
  *
  * The composed form materializes a 32-char hex string and then runs
  * `conv`'s generic radix decoder — measured ~1.1 µs per call, which
  * made every hash-heavy operator (Poisson bootstrap: 40 draws/row)
  * conv-bound. The native expression hashes the UTF-8 bytes directly
  * and assembles the unsigned big-endian u32 from digest bytes
  * [4w, 4w+4) — the same value by construction (hex chars 8w+1..8w+8
  * ARE bytes 4w..4w+3), ~6× faster, parity-spec'd against the composed
  * form (HashExprSpec). The DuckDB oracle twin stays
  * [[graft.operators.Sampling.hashU32Sql]] — values are unchanged, so
  * no oracle changes anywhere. */
object HashUtil {
  private val md = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })

  /** Unsigned big-endian u32 from digest bytes [4w, 4w+4). */
  def md5u32(s: UTF8String, w: Int): Long = {
    val d = md.get(); d.reset()
    val dig = d.digest(s.getBytes)
    ((dig(4 * w) & 0xffL) << 24) | ((dig(4 * w + 1) & 0xffL) << 16) |
      ((dig(4 * w + 2) & 0xffL) << 8) | (dig(4 * w + 3) & 0xffL)
  }

  /** Poisson(1) inverse-CDF thresholds in 2³² units (the single shared
    * constant table — [[graft.operators.Hypothesis.PoissonThresholds]]
    * aliases this so the Spark plan, this fused expression, and the SQL
    * oracle can only drift in review). */
  val PoissonThresholds: Array[Long] = Array(1580030168L, 3160060337L,
    3950075421L, 4213413783L, 4279248373L, 4292415291L, 4294609777L,
    4294923276L, 4294962463L, 4294966817L)

  /** The four u32 windows mapped through the Poisson threshold count:
    * weight = |{k : u ≥ T_k}| ∈ 0..10. */
  def md5pois4(s: UTF8String): ArrayData = {
    val d = md.get(); d.reset()
    val dig = d.digest(s.getBytes)
    val out = new Array[Long](4)
    var w = 0
    while (w < 4) {
      val u = ((dig(4 * w) & 0xffL) << 24) |
        ((dig(4 * w + 1) & 0xffL) << 16) |
        ((dig(4 * w + 2) & 0xffL) << 8) | (dig(4 * w + 3) & 0xffL)
      var k = 0
      while (k < PoissonThresholds.length && u >= PoissonThresholds(k))
        k += 1
      out(w) = k.toLong
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Nonnegative 63-bit value from one digest: windows 0 and 1 packed as
    * `(w0 & 0x7fffffff) << 32 | w1`. The replayable-hash backbone for the
    * simhash / winnow / minhash-incremental oracle gates — DuckDB rebuilds
    * the identical value from the md5 hex:
    * `(('0x'||substr(md5(s),1,8))::BIGINT & 2147483647) * 4294967296
    *  + ('0x'||substr(md5(s),9,8))::BIGINT`
    * (same construction as the multimodal phash oracles). Top bit clear
    * keeps every downstream shift/mod in nonnegative-long territory on
    * both engines. */
  def md5head63(s: UTF8String): Long = {
    val d = md.get(); d.reset()
    val dig = d.digest(s.getBytes)
    val w0 = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
      ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
    val w1 = ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
      ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)
    ((w0 & 0x7fffffffL) << 32) | w1
  }

  /** [[md5head63]] over a byte slice — the zero-allocation inner loop
    * for the sliding-window/shingle hash expressions (digesting
    * `bytes[off, off+len)` equals digesting the substring's UTF-8
    * bytes, so values are identical to the composed substr form). */
  def md5head63Bytes(bytes: Array[Byte], off: Int, len: Int): Long = {
    val d = md.get(); d.reset()
    d.update(bytes, off, len)
    val dig = d.digest()
    val w0 = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
      ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
    val w1 = ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
      ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)
    ((w0 & 0x7fffffffL) << 32) | w1
  }

  /** md5_head63 of every word k-shingle in ONE byte pass: token
    * boundaries are the 0x20 bytes (UTF-8 continuation bytes can never
    * be 0x20, and Spark's `split(text, " ")` keeps empty tokens), and
    * k tokens re-joined with single spaces ARE the original byte span
    * from token i's start to token i+k-1's end — so each shingle hash
    * digests a raw slice, no string rebuild. Value-identical to
    * `md5_head63(concat_ws(' ', slice(split(text, ' '), i, k)))`. */
  def md5WordShingleHeads63(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    // starts(i) = byte offset of token i; token i spans
    // [starts(i), starts(i+1) - 2] inclusive (exclusive of its space)
    val starts = scala.collection.mutable.ArrayBuffer(0)
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) starts += i + 1
      i += 1
    }
    val n = starts.length // token count = spaces + 1
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n - k + 1)
    var t = 0
    while (t + k <= n) {
      val off = starts(t)
      val end = if (t + k == n) bytes.length else starts(t + k) - 1
      out(t) = md5head63Bytes(bytes, off, end - off)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** md5_head63 of every `w`-code-point window in ONE byte pass —
    * code-point boundaries walked once, each window a raw byte-slice
    * digest. Value-identical to `md5_head63(substr(text, i, w))` for
    * BMP text (SQL substr counts code points). */
  def md5CharWindowHeads63(s: UTF8String, w: Int): ArrayData = {
    val bytes = s.getBytes
    val nChars = s.numChars()
    if (nChars < w) return new GenericArrayData(Array.empty[Long])
    val pos = new Array[Int](nChars + 1)
    var b = 0
    var c = 0
    while (b < bytes.length) {
      pos(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    pos(nChars) = bytes.length
    val out = new Array[Long](nChars - w + 1)
    var i = 0
    while (i + w <= nChars) {
      out(i) = md5head63Bytes(bytes, pos(i), pos(i + w) - pos(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All four independent u32 windows of one digest — one hash serving
    * four draws (the bootstrap's 4-replicas-per-digest scheme). */
  def md5u32x4(s: UTF8String): ArrayData = {
    val d = md.get(); d.reset()
    val dig = d.digest(s.getBytes)
    val out = new Array[Long](4)
    var w = 0
    while (w < 4) {
      out(w) = ((dig(4 * w) & 0xffL) << 24) |
        ((dig(4 * w + 1) & 0xffL) << 16) |
        ((dig(4 * w + 2) & 0xffL) << 8) | (dig(4 * w + 3) & 0xffL)
      w += 1
    }
    new GenericArrayData(out)
  }
}

/** `md5_u32(str, w)` — u32 window `w` (0..3) of md5(str). */
case class Md5U32(child: Expression, window: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if window >= 0 && window < 4 =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"window must be in [0,4): $window")
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_u32 needs a string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    HashUtil.md5u32(input.asInstanceOf[UTF8String], window)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashUtil.md5u32($c, $window);")

  override protected def withNewChildInternal(newChild: Expression)
      : Md5U32 = copy(child = newChild)
}

/** `md5_u32x4(str)` — array of the four u32 windows of md5(str). */
case class Md5U32x4(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_u32x4 needs a string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    HashUtil.md5u32x4(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashUtil.md5u32x4($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : Md5U32x4 = copy(child = newChild)
}

/** `md5_pois4(str)` — the Poisson(1) bootstrap draw fused end-to-end:
  * one digest, four u32 windows, each mapped to its integer weight
  * |{k : u ≥ T_k}| against [[graft.operators.Hypothesis]]'s fixed
  * inverse-CDF thresholds. Replaces 4 getItems + 40 `when` branches
  * per digest in the Catalyst plan with one codegen'd call — the
  * bootstrap's per-row inner loop. Value-identical to the composed
  * plan (HypothesisSpec brute-force cross-checks the CI output). */
case class Md5Pois4(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_pois4 needs a string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    HashUtil.md5pois4(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashUtil.md5pois4($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : Md5Pois4 = copy(child = newChild)
}

/** `md5_head63(str)` — nonnegative 63-bit head of md5(str); see
  * [[HashUtil.md5head63]] for the DuckDB twin. One digest per call. */
case class Md5Head63(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_head63 needs a string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    HashUtil.md5head63(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashUtil.md5head63($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : Md5Head63 = copy(child = newChild)
}

/** `md5_word_shingle_heads63(str, k)` — one-pass word-shingle md5
  * heads; see [[HashUtil.md5WordShingleHeads63]]. */
case class Md5WordShingleHeads63(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"k must be >= 1: $k")
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_word_shingle_heads63 needs a string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    HashUtil.md5WordShingleHeads63(input.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashUtil.md5WordShingleHeads63($c, $k);")

  override protected def withNewChildInternal(newChild: Expression)
      : Md5WordShingleHeads63 = copy(child = newChild)
}

/** `md5_char_window_heads63(str, w)` — one-pass char-window md5 heads;
  * see [[HashUtil.md5CharWindowHeads63]]. */
case class Md5CharWindowHeads63(child: Expression, w: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if w >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"w must be >= 1: $w")
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_char_window_heads63 needs a string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    HashUtil.md5CharWindowHeads63(input.asInstanceOf[UTF8String], w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashUtil.md5CharWindowHeads63($c, $w);")

  override protected def withNewChildInternal(newChild: Expression)
      : Md5CharWindowHeads63 = copy(child = newChild)
}

object HashFunctions {
  /** Native twin of `conv(substring(md5(c), 1+8*w, 8), 16, 10)`. */
  def md5_u32(c: Column, window: Int = 0): Column =
    ColumnBridge.column(Md5U32(ColumnBridge.expression(c), window))

  /** Nonnegative 63-bit md5 head — the replayable-oracle hash. */
  def md5_head63(c: Column): Column =
    ColumnBridge.column(Md5Head63(ColumnBridge.expression(c)))

  /** One-pass md5 heads of every word k-shingle. */
  def md5_word_shingle_heads63(c: Column, k: Int): Column =
    ColumnBridge.column(
      Md5WordShingleHeads63(ColumnBridge.expression(c), k))

  /** One-pass md5 heads of every w-code-point window. */
  def md5_char_window_heads63(c: Column, w: Int): Column =
    ColumnBridge.column(
      Md5CharWindowHeads63(ColumnBridge.expression(c), w))

  /** One digest, four independent u32 draws. */
  def md5_u32x4(c: Column): Column =
    ColumnBridge.column(Md5U32x4(ColumnBridge.expression(c)))

  /** One digest, four Poisson(1) bootstrap weights. */
  def md5_pois4(c: Column): Column =
    ColumnBridge.column(Md5Pois4(ColumnBridge.expression(c)))
}
