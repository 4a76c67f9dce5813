package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Global dense row numbering at scale.
  *
  * The declarative form — `row_number() OVER (ORDER BY ...)` with no
  * partition — collapses into ONE partition (Spark warns exactly this),
  * which is the classic 100 TB cliff. `monotonically_increasing_id` is
  * distributed but neither dense nor ordered. The scalable shape is
  * range-repartition by the order key, sort within partitions, then a
  * two-job zip: one tiny job counts rows per partition (the offsets),
  * the main job adds offset + local index — O(partitions) driver state,
  * full cluster parallelism, and the result is exactly the global dense
  * row number. */
object Ids {

  /** Append `idCol` = 0-based dense global row number under the total
    * order `order` (include a unique tiebreaker for determinism).
    * `numPartitions` pins the range-partition fan-out; by default AQE
    * sizes it (and may coalesce small inputs to one partition — set it
    * explicitly when asserting parallelism). */
  def denseGlobalRowNumber(df: DataFrame, order: Seq[Column],
      idCol: String = "row_id", numPartitions: Option[Int] = None)
      : DataFrame = {
    require(order.nonEmpty)
    val spark = df.sparkSession
    val parted = numPartitions.fold(df.repartitionByRange(order: _*))(
        n => df.repartitionByRange(n, order: _*))
      .sortWithinPartitions(order: _*)
    // RDD.zipWithIndex is precisely the two-job shape: a count job for
    // per-partition offsets, then offset + intra-partition index
    val zipped = parted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(zipped,
      StructType(parted.schema.fields :+
        StructField(idCol, LongType, nullable = false)))
  }
}
