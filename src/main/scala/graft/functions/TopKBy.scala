package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k-by-score as a native distributed aggregate — the scale
  * replacement for the rank-window top-n idiom.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC) <= k` shuffles
  * EVERY row to its group's partition and sort-buffers the full group —
  * at 100 TB the exchange is the dataset and a hot group is one task's
  * sort. This aggregate carries at most k (score, id) pairs per partial
  * state: map-side combine reduces each partition to k rows per group
  * BEFORE the exchange, merges are associative on the combiner tree, and
  * a hot group costs O(n log k) heap updates instead of a sort. Results
  * are identical to the window form under the deterministic total order
  * (score DESC, id ASC) — oracle-checked through the gate.
  *
  * Returns array<struct<score double, id bigint>> sorted best-first. */
case class TopKByAgg(score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, s"topk_by needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topk_by needs (double, bigint), got " +
          s"(${s.simpleString}, ${i.simpleString})")
    }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  /** Keep-order: higher score wins, ties to the SMALLER id — via
    * java.lang.Double.compare, a TOTAL order (NaN greater than +Inf,
    * -0.0 < 0.0) matching Spark's NaN-greatest `ORDER BY score DESC`
    * window semantics: a NaN score ranks FIRST, deterministically,
    * regardless of arrival order or partitioning. (The old `s > ws`
    * admission test was false for NaN once the buffer filled, so NaN
    * admission depended on arrival order.) Sorts best-first; as the
    * PriorityQueue ordering it puts the WORST kept pair at the root —
    * the eviction candidate. */
  private val order: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer()
      : mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(order)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
      s: Double, i: Long): Unit = {
    if (buf.size < k) buf.enqueue((s, i))
    else if (order.compare((s, i), buf.head) < 0) {
      buf.dequeue(); buf.enqueue((s, i))
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val sv = score.eval(input)
    val iv = id.eval(input)
    if (sv != null && iv != null)
      offer(buf, sv.asInstanceOf[Double], iv.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)])
      : mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { case (s, i) => offer(buf, s, i) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // sorted(order) is best-first under the same total order the heap
    // admits by (sortBy(-s) would misplace NaN: -NaN == NaN)
    val best = buf.toArray.sorted(order)
    new GenericArrayData(best.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)])
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByAgg =
    copy(inputAggBufferOffset = offset)

  override def prettyName: String = "topk_by"
}

object TopKBy {
  /** Aggregate (score, id) pairs into the k best per group —
    * score DESC, ties to the smaller id. Cast inputs yourself:
    * `topk_by(col("price").cast("double"), idExpr.cast("long"), 3)`. */
  def topk_by(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByAgg(ColumnBridge.expression(score),
        ColumnBridge.expression(id), k).toAggregateExpression())
}
