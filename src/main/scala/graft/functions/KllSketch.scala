package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** KLL quantile sketch as a native distributed aggregate (Karnin,
  * Lang & Liberty, FOCS 2016; DataSketches implementation — already a
  * Spark dependency). Completes the mergeable-sketch suite: Misra-Gries/
  * count-min for frequency, HLL/theta for distinct, KLL for QUANTILES.
  *
  * Each partial state is O(k log(N/k)) doubles with a proven normalized
  * rank error (~1.65% at the default k = 200), mergeable on the
  * combiner tree — per-shard sketches can be persisted and re-merged
  * later without rescanning (the same partial/union workflow as
  * `hll_distinct_sources`). vs Spark's `percentile_approx`: same
  * sketch-shaped cost, but the state is an exportable binary column
  * set-operable outside the query. Returns the serialized sketch. */
case class KllSketchAgg(child: Expression, k: Int = 200,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"kll_sketch_agg k out of range: $k")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: NumericType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"kll_sketch_agg needs a numeric column, got ${t.simpleString}")
    }

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case s: Short => s.toDouble
      case b: Byte => b.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalStateException(
        s"kll_sketch_agg: unexpected value $other")
    })
    buf
  }

  override def merge(buf: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    // heapify yields a MUTABLE on-heap sketch (read-only applies only to
    // wrapped immutable memory), so it can keep merging directly — and
    // it preserves the serialized sketch's own k
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(offset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = offset)

  override def prettyName: String = "kll_sketch_agg"
}

/** Column + driver-side helpers for KLL quantile sketches. */
object KllFunctions {
  def kll_sketch_agg(c: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllSketchAgg(ColumnBridge.expression(c), k).toAggregateExpression())

  private def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  /** Value at normalized rank `q` in [0, 1] (inclusive criteria). */
  def quantile(bytes: Array[Byte], q: Double): Double =
    heapify(bytes).getQuantile(q, QuantileSearchCriteria.INCLUSIVE)

  /** Normalized rank of `v` in [0, 1]. */
  def rank(bytes: Array[Byte], v: Double): Double =
    heapify(bytes).getRank(v, QuantileSearchCriteria.INCLUSIVE)

  def n(bytes: Array[Byte]): Long = heapify(bytes).getN

  /** Merge two serialized sketches. Merging INTO the heapified left
    * input keeps its k (a fresh default-k target would silently degrade
    * high-k sketches to ~1.65% rank error). */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val m = heapify(a)
    m.merge(heapify(b))
    m.toByteArray
  }
}
