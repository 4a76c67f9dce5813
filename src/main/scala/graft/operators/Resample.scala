package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: turn an irregular event stream into a
  * dense per-key grid (the time_bucket_gapfill / resample-ffill shape).
  * The caller supplies the integer bucket expression (time quantization
  * is engine-parity-sensitive — see EventOps' `div` idiom); the operator
  * owns grid generation and the forward fill.
  *
  * Scale shape: one groupBy((key, bucket)) partial-agg bounded by the
  * OBSERVED buckets; the grid explodes from a per-key (min, max) span —
  * sequence + explode is map-side, no grid-sized shuffle; the forward
  * fill is one window per key ordered by bucket. Grid density is the
  * caller's lever (step size); everything else is linear in grid rows. */
object Resample {

  /** Per-key dense grid from min to max observed bucket: `n_obs` = 0 on
    * gap rows, `sum_dec` = the bucket's decimal value sum, `filled_dec`
    * = forward-filled from the last observed bucket. First grid row per
    * key is always observed, so `filled_dec` is never null. */
  def gapFill(df: DataFrame, key: Column, bucket: Column,
      valueDec: Column): DataFrame = {
    val obs = df
      .groupBy(key.as("k"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n_obs"), sum(valueDec).as("sum_dec"))
    val grid = obs.groupBy(col("k"))
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
      .select(col("k"),
        explode(sequence(col("mn"), col("mx"))).as("bucket"))
    val w = Window.partitionBy(col("k")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("k", "bucket"), "left")
      .select(col("k"), col("bucket"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        last(col("sum_dec"), ignoreNulls = true).over(w).as("filled_dec"))
  }
}
