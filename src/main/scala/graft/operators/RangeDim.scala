package graft.operators

import graft.functions.RangeLookupIdx
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Broadcast interval-LOOKUP join: enrich a probe table by the single
  * dim interval containing a point value (IP range -> geo, id block ->
  * cohort, value -> bracket, timestamp -> calendar period).
  *
  * `probe JOIN dim ON x BETWEEN lo AND hi` has no equi key, so Catalyst
  * plans a BroadcastNestedLoopJoin: O(|dim|) comparisons per probe row —
  * ruinous when the probe is the 100 TB side. Here the dim is collected
  * once (bounded driver state, like the ANN codebooks: `maxDim` guards
  * it), sorted, validated NON-OVERLAPPING, and planted into the plan as
  * two bounds-array literals; each probe row then binary-searches them
  * via the codegen'd [[RangeLookupIdx]] — O(log |dim|) inside
  * whole-stage codegen, no join, no shuffle, no per-row dim scan.
  * Payload columns ride along as `element_at` on aligned value arrays.
  *
  * LEFT semantics: a probe row no interval contains keeps NULL payloads
  * (and a NULL `idxCol` when requested), matching
  * `LEFT JOIN dim ON x BETWEEN lo AND hi` with non-overlapping
  * intervals. Bounds are INCLUSIVE on both ends, the BETWEEN analogue.
  *
  * Modes: integral lo/hi (+ integral probe) run on long arrays — exact;
  * fractional bounds run on doubles. Mixing families is refused rather
  * than silently cast.
  */
object RangeDim {

  def lookupJoin(probe: DataFrame, dim: DataFrame, x: Column,
      loCol: String, hiCol: String, payloads: Seq[String],
      maxDim: Int = 1 << 20): DataFrame = {
    require(payloads.nonEmpty, "lookupJoin needs at least one payload col")
    def integral(t: DataType) = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    def fractional(t: DataType) = t == FloatType || t == DoubleType
    val loT = dim.schema(loCol).dataType
    val hiT = dim.schema(hiCol).dataType
    val longMode =
      if (integral(loT) && integral(hiT)) true
      else if (fractional(loT) && fractional(hiT)) false
      else throw new IllegalArgumentException(
        s"lookupJoin bounds must both be integral or both fractional, " +
          s"got ${loT.simpleString}/${hiT.simpleString}")
    val rows = dim
      .select((Seq(loCol, hiCol) ++ payloads).map(col): _*).collect()
    require(rows.length <= maxDim,
      s"dim has ${rows.length} intervals > maxDim=$maxDim — a dim this " +
        "big should be a bucketed range join, not a broadcast lookup")
    def loOf(r: org.apache.spark.sql.Row): Double =
      r.getAs[Number](0).doubleValue()
    val sorted = rows.sortBy(loOf)
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        val aHi = a.getAs[Number](1).doubleValue()
        require(aHi < loOf(b),
          s"overlapping intervals: [${loOf(a)}, $aHi] and [${loOf(b)}, ..]")
      case _ => ()
    }
    val (losC, hisC) =
      if (longMode)
        (lit(sorted.map(_.getAs[Number](0).longValue())),
          lit(sorted.map(_.getAs[Number](1).longValue())))
      else
        (lit(sorted.map(_.getAs[Number](0).doubleValue())),
          lit(sorted.map(_.getAs[Number](1).doubleValue())))
    val xc = if (longMode) x.cast("long") else x.cast("double")
    val idx = RangeLookupIdx(xc, losC, hisC)
    payloads.zipWithIndex.foldLeft(probe) { case (df, (p, i)) =>
      val vals: Column = dim.schema(p).dataType match {
        case LongType => lit(sorted.map(_.getAs[Number](2 + i).longValue()))
        case IntegerType =>
          lit(sorted.map(_.getAs[Number](2 + i).intValue()))
        case DoubleType =>
          lit(sorted.map(_.getAs[Number](2 + i).doubleValue()))
        case StringType => lit(sorted.map(_.getAs[String](2 + i)))
        case t => throw new IllegalArgumentException(
          s"unsupported payload type ${t.simpleString} for column $p")
      }
      df.withColumn(p, element_at(vals, idx + 1))
    }
  }
}
