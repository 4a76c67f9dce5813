package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketch as a native distributed aggregate (Dasgupta et al.,
  * "Theta Sketch Framework"; the DataSketches library is already a
  * Spark dependency — Spark exposes only its HLL sketches, which
  * support UNION alone; theta sketches additionally support
  * INTERSECTION and DIFFERENCE, the set operations a corpus-overlap
  * analysis needs).
  *
  * Each partial state holds <= 2^lgK retained hashes (KMV-style: the k
  * SMALLEST value hashes — so the sketch is insertion-order-independent
  * and deterministic for a given input set). Below 2^lgK distinct
  * values the sketch is in exact mode and every estimate is the true
  * count. Returns the serialized compact sketch (binary); combine
  * per-group sketches with [[ThetaFunctions]]' set operations. */
case class ThetaSketchAgg(child: Expression, lgK: Int = 12,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  require(lgK >= 4 && lgK <= 26, s"theta_sketch_agg lgK out of range: $lgK")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | LongType | IntegerType | BinaryType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"theta_sketch_agg needs string/int/bigint/binary, got " +
          t.simpleString)
    }

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: UTF8String => buf.update(s.toString)
      case l: Long => buf.update(l)
      case i: Int => buf.update(i.toLong)
      case b: Array[Byte] => buf.update(b)
      case other => throw new IllegalStateException(
        s"theta_sketch_agg: unexpected value $other")
    }
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = offset)

  override def prettyName: String = "theta_sketch_agg"
}

/** Column + driver-side helpers for theta sketches. The per-group
  * sketches a query collects are tiny (<= 2^lgK hashes); pairwise set
  * operations on them are driver arithmetic, never a Spark job. */
object ThetaFunctions {
  def theta_sketch_agg(c: Column, lgK: Int = 12): Column =
    ColumnBridge.column(
      ThetaSketchAgg(ColumnBridge.expression(c), lgK)
        .toAggregateExpression())

  private def heapify(bytes: Array[Byte]): Sketch =
    Sketches.heapifyCompactSketch(Memory.wrap(bytes))

  def estimate(bytes: Array[Byte]): Double = heapify(bytes).getEstimate

  /** Union of two serialized sketches. `lgK` must be >= the lgK the
    * sketches were built with (a compact sketch does not carry its own
    * lgK, so it cannot be inferred): a smaller union downsamples the
    * result to 2^lgK retained hashes, silently degrading exact-mode
    * inputs to estimates. Intersection/difference never resample. */
  def union(a: Array[Byte], b: Array[Byte], lgK: Int = 12): Array[Byte] = {
    // fail loud instead of silently downsampling: an input retaining
    // more hashes than this union's nominal capacity was built with a
    // larger lgK, and unioning it here would degrade exact counts to
    // estimates behind the caller's back
    val retained = math.max(heapify(a).getRetainedEntries,
      heapify(b).getRetainedEntries)
    require(retained <= (1 << lgK),
      s"union(lgK=$lgK) would downsample a sketch retaining $retained " +
        s"hashes — pass the lgK the sketches were aggregated with")
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Memory.wrap(a)); u.union(Memory.wrap(b))
    u.getResult.toByteArray
  }

  def intersect(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildIntersection()
      .intersect(heapify(a), heapify(b)).toByteArray

  /** Distinct-count estimate of A \ B. */
  def aNotB(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildANotB()
      .aNotB(heapify(a), heapify(b)).toByteArray
}
