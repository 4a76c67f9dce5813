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
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy hitters as a native distributed aggregate — the
  * bounded-memory "top frequent items" primitive (Misra & Gries 1982;
  * mergeable-summaries merge rule from Agarwal et al., PODS 2012).
  *
  * Why not groupBy().count().orderBy().limit(k)? That shuffles the FULL
  * key domain — at 100 TB a token/URL/entity frequency query pays an
  * exchange proportional to the vocabulary. This aggregate carries at
  * most `k` counters per partial state, merges associatively on the
  * combiner tree like any native agg (partial -> shuffle k rows per
  * partition -> final), and guarantees:
  *
  *  - every item with true count > N/(k+1) IS in the summary;
  *  - each reported estimate undercounts by at most N/(k+1);
  *  - with k >= |domain| no decrement ever fires and counts are EXACT
  *    (which makes the fixture query oracle-checkable).
  *
  * Returns array<struct<term, cnt>> sorted by (cnt desc, term). */
case class MisraGriesTopK(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, s"misra_gries_topk needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"misra_gries_topk needs a string column, got ${t.simpleString}")
    }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val term = v.asInstanceOf[UTF8String].toString // copy out of the row
      buf.get(term) match {
        case Some(c) => buf.update(term, c + 1)
        case None if buf.size < k => buf.update(term, 1L)
        case None =>
          // classic MG: decrement all, evict zeros. Amortized O(1)/row:
          // each miss drains k count-mass that prior arrivals deposited
          // one unit at a time, so total decrement work is O(N).
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.filterInPlace((_, c) => c > 0)
      }
    }
    buf
  }

  /** Mergeable-summaries merge: sum counters, then if over capacity
    * subtract the (k+1)-th largest count from everything and drop the
    * non-positive — keeps <= k counters and the N/(k+1) error bound. */
  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) =>
      buf.update(t, buf.getOrElse(t, 0L) + c)
    }
    if (buf.size > k) {
      val d = buf.values.toArray.sortBy(-_).apply(k)
      buf.mapValuesInPlace((_, c) => c - d)
      buf.filterInPlace((_, c) => c > 0)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    // length-prefixed raw UTF-8 (writeUTF caps at 64 KB — too small for
    // URL/entity heavy-hitter domains)
    buf.foreach { case (t, c) =>
      val b = t.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = offset)

  override def prettyName: String = "misra_gries_topk"
}

object HeavyHitters {
  /** Aggregate a string column into its <= k heavy hitters. */
  def misra_gries_topk(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesTopK(ColumnBridge.expression(c), k).toAggregateExpression())
}
