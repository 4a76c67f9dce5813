package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Literal, UnaryExpression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter column functions over Spark's own spark-sketch
  * `BloomFilter` — the machinery behind the engine's runtime row-level
  * join filters (`InjectRuntimeFilter`), exposed as library functions so
  * operators can build/probe filters with explicit sizing.
  *
  * Values hash through `XxHash64` (default seed) on BOTH the build and
  * probe sides — exactly what Spark's own runtime-filter rewrite does —
  * so any hashable column type participates and the two sides can even
  * be different-but-hash-equal types.
  */
object BloomFunctions {

  /** Aggregate a column into ONE serialized bloom filter (binary).
    * Returns null on empty/all-null input (Spark's own convention). */
  def bloom_agg(c: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(c))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a pre-built filter's bytes. The bloom side
    * must be a constant (the expression requires a foldable literal or
    * scalar subquery — same restriction as Spark's runtime filters). */
  def bloom_might_contain(bloomBytes: Array[Byte], c: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBytes),
      new XxHash64(Seq(ColumnBridge.expression(c)))))

  /** Probe of a REPLAYABLE md5 double-hash bloom bitmap (see
    * [[Md5BloomUtil.positions]] for the hash scheme an ANSI-SQL oracle
    * can rebuild). Bitmap ships as a task-broadcast reference object;
    * the probe is one digest + kHashes bit tests, fully codegen'd. */
  def md5_bloom_contains(bitmap: Array[Byte], c: Column, kHashes: Int)
      : Column =
    ColumnBridge.column(
      Md5BloomContains(ColumnBridge.expression(c), bitmap, kHashes))
}

/** The replayable bloom's hash scheme — classic Kirsch–Mitzenmacher
  * double hashing with both base hashes read off ONE md5 digest:
  * `pos_j = (u32_0(md5 s) + j * u32_1(md5 s)) mod mBits`, j in
  * [0, kHashes). Every quantity is a nonnegative integer derivable from
  * the md5 hex string, so DuckDB replays the filter bit-exactly:
  * `(('0x'||substr(md5(s),1,8))::BIGINT
  *   + j * ('0x'||substr(md5(s),9,8))::BIGINT) % mBits`.
  * No false negatives by construction; false positives replay
  * identically on both engines, so even the over-drop set is
  * oracle-exact. */
object Md5BloomUtil {
  def positions(s: UTF8String, mBits: Int, kHashes: Int): Array[Long] = {
    val h1 = HashUtil.md5u32(s, 0)
    val h2 = HashUtil.md5u32(s, 1)
    Array.tabulate(kHashes)(j => (h1 + j * h2) % mBits)
  }

  def contains(bitmap: Array[Byte], s: UTF8String, kHashes: Int): Boolean = {
    val mBits = bitmap.length.toLong * 8
    val h1 = HashUtil.md5u32(s, 0)
    val h2 = HashUtil.md5u32(s, 1)
    var j = 0
    while (j < kHashes) {
      val pos = (h1 + j * h2) % mBits
      if ((bitmap((pos >> 3).toInt) & (1 << (pos & 7).toInt)) == 0)
        return false
      j += 1
    }
    true
  }
}

/** `md5_bloom_contains(bitmap, str, k)` — all k md5 double-hash positions
  * of `str` set in the bitmap. The bitmap is a plan reference object
  * (not a per-row literal); mBits = 8 * bitmap.length. */
case class Md5BloomContains(child: Expression, bitmap: Array[Byte],
    kHashes: Int) extends UnaryExpression {
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if kHashes > 0 && bitmap != null && bitmap.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"md5_bloom_contains needs a non-empty bitmap and kHashes > 0")
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_bloom_contains needs a string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    Md5BloomUtil.contains(bitmap, input.asInstanceOf[UTF8String], kHashes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bits = ctx.addReferenceObj("md5BloomBits", bitmap, "byte[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5BloomUtil.contains(" +
        s"$bits, $c, $kHashes);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Md5BloomContains = copy(child = newChild)
}
