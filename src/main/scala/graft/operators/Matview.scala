package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance for the count/sum aggregate
  * family — apply a CDC delta to a stored aggregate instead of
  * recomputing from the base table (classic delta-propagation IVM; the
  * reference's writer can only full-reload, reference
  * database/dbms/writer/task.go:17-32).
  *
  * count and sum are self-maintainable: inserted rows contribute +1/+x,
  * removed rows -1/-x, and an update is remove(old) ⊎ insert(new). The
  * maintenance cost is O(|delta| + |touched groups|) — independent of
  * the base table size, which is the whole point at 100 TB: a nightly
  * delta of a few GB maintains an aggregate over the full corpus without
  * rescanning it. (min/max are NOT self-maintainable under deletes and
  * are deliberately not offered here.)
  */
object Matview {

  /** Apply one round of delta maintenance.
    *
    * `prevAgg` must have columns `groupCols ++ ("n_rows") ++
    * sumCols.map("sum_" + _)` — exactly what this function returns, so
    * rounds chain. `inserted` / `removed` carry the after-image of
    * inserts+updates and the BEFORE-image of updates+deletes
    * respectively (each with `groupCols` and the raw `sumCols`).
    * Groups whose maintained count reaches zero are dropped, matching a
    * recompute. Sums accumulate as longs (cast upstream for decimals). */
  def maintainSums(prevAgg: DataFrame, inserted: DataFrame,
                   removed: DataFrame, groupCols: Seq[String],
                   sumCols: Seq[String]): DataFrame = {
    val pick = (groupCols ++ sumCols).map(col)
    val signed = inserted.select(pick: _*).withColumn("__sgn", lit(1L))
      .unionByName(removed.select(pick: _*).withColumn("__sgn", lit(-1L)))
    val deltaAgg = signed.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__sgn")).as("__dn"),
        sumCols.map(c =>
          sum(col(c).cast("long") * col("__sgn")).as(s"__d_$c")): _*)
    prevAgg.join(deltaAgg, groupCols, "full_outer")
      .select(groupCols.map(col) ++
        Seq((coalesce(col("n_rows"), lit(0L)) +
          coalesce(col("__dn"), lit(0L))).as("n_rows")) ++
        sumCols.map(c => (coalesce(col(s"sum_$c"), lit(0L)) +
          coalesce(col(s"__d_$c"), lit(0L))).as(s"sum_$c")): _*)
      .where(col("n_rows") > 0)
  }

  /** Bootstrap the aggregate shape [[maintainSums]] maintains. */
  def sumsOf(base: DataFrame, groupCols: Seq[String], sumCols: Seq[String])
      : DataFrame =
    base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sumCols.map(c => sum(col(c).cast("long")).as(s"sum_$c")): _*)
}
