package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native per-document sketches over a shingle/token hash array.
  *
  * MinHash signatures and SimHash fingerprints are per-DOCUMENT sketches:
  * with a native expression that folds the whole hash array in one pass,
  * they are pure projections — no explode, no groupBy, NO SHUFFLE. The
  * previous explode -> groupBy(doc_id) -> 32x min / 64x sum shape (kept as
  * the spec reference in graft.operators.Dedup) shuffles one row per
  * (doc, shingle); at 100 TB that is the difference between a map-only
  * stage and a corpus-sized exchange.
  *
  * Permutation family (Carter-Wegman over P = 2^31 - 1, shared verbatim
  * with the declarative reference in graft.operators.Dedup —
  * spec-asserted): h = mod(xxhash64, P), m_i = (h * a_i + b_i) mod P with
  * a_i/b_i = golden-ratio multiples reduced mod P. The multipliers MUST
  * be well mixed across the 31-bit range: small sequential multipliers
  * (the first implementation used a_i = 2i+1) leave h*a + b un-wrapped
  * for small h, so the element ordering — and hence the min — is the
  * SAME in every slot and the "independent" permutations collapse into
  * one (observed: a Jaccard-0.95 pair with near-disjoint signatures).
  * h < P and a < P keep h*a + b far below 2^63.
  */
object SketchUtil {
  val MinhashP = 2147483647L // 31-bit Mersenne prime

  private def floorMod(x: Long, p: Long): Long = {
    val m = x % p
    if (m < 0) m + p else m
  }

  /** The i-th permutation's (multiplier, offset) — 0 < a < P guaranteed
    * (golden-ratio multiples can't hit 0 mod the Mersenne prime for any
    * realistic i). Shared by the native fold and the declarative
    * explode/groupBy reference so their signatures are bit-identical. */
  def minhashPerm(i: Int): (Long, Long) = (
    floorMod(java.lang.Long.parseUnsignedLong("9E3779B97F4A7C15", 16)
      * (i + 1L), MinhashP),
    floorMod(java.lang.Long.parseUnsignedLong("C2B2AE3D27D4EB4F", 16)
      * (i + 1L), MinhashP))

  /** MinHash signature (length `perms`) of a hash array; null for empty
    * input (docs with < k tokens have no shingles, hence no signature). */
  def minhashSig(hashes: ArrayData, perms: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return null
    val as = new Array[Long](perms)
    val bs = new Array[Long](perms)
    var i = 0
    while (i < perms) {
      val (a, b) = minhashPerm(i); as(i) = a; bs(i) = b; i += 1
    }
    val sig = new Array[Long](perms)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = floorMod(hashes.getLong(j), MinhashP)
      i = 0
      while (i < perms) {
        val m = floorMod(h * as(i) + bs(i), MinhashP)
        if (m < sig(i)) sig(i) = m
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** SimHash: per-bit sign votes over the token hashes, packed to i64. */
  def simhash(hashes: ArrayData, width: Int): Long = {
    val votes = new Array[Int](width)
    val n = hashes.numElements()
    var j = 0
    while (j < n) {
      val h = hashes.getLong(j)
      var b = 0
      while (b < width) {
        if ((h & (1L << b)) != 0) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < width) { if (votes(b) > 0) out |= 1L << b; b += 1 }
    out
  }
}

sealed abstract class HashArrayExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"expected array<bigint> of hashes, got ${t.simpleString}")
  }
}

/** MinHash signature of a shingle-hash array as `array<bigint>`. */
case class MinHashSignature(child: Expression, perms: Int)
    extends HashArrayExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty shingle set -> null

  override def nullSafeEval(input: Any): Any =
    SketchUtil.minhashSig(input.asInstanceOf[ArrayData], perms)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("sig")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.SketchUtil.minhashSig($c, $perms);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSignature = copy(child = newChild)
}

/** SimHash fingerprint of a token-hash array as `bigint`. */
case class SimHash64(child: Expression) extends HashArrayExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SketchUtil.simhash(input.asInstanceOf[ArrayData], 64)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchUtil.simhash($c, 64);")

  override protected def withNewChildInternal(newChild: Expression)
      : SimHash64 = copy(child = newChild)
}

object SketchFunctions {
  /** Column API for [[MinHashSignature]]. */
  def minhash_signature(hashes: Column, perms: Int): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(hashes), perms))

  /** Column API for [[SimHash64]]. */
  def simhash64(hashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(hashes)))
}
