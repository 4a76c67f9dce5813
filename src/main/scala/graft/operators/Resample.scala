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
    val w = Window.partitionBy(col("k")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sparseGrid(df, key, bucket, valueDec)
      .select(col("k"), col("bucket"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        last(col("sum_dec"), ignoreNulls = true).over(w).as("filled_dec"))
  }

  /** Like [[gapFill]] but LINEARLY interpolating gap rows between their
    * surrounding observations (trailing gaps carry the last value
    * forward). All arithmetic past the exact decimal inputs is IEEE
    * double (both engines compute `prev + (next-prev) * frac`
    * identically), so the result stays cross-engine bit-exact. */
  def gapFillInterp(df: DataFrame, key: Column, bucket: Column,
      valueDec: Column): DataFrame = {
    val ord = Window.partitionBy(col("k")).orderBy(col("bucket"))
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsBucket = when(col("sum_dec").isNotNull, col("bucket"))
    val prevD = last(col("sum_dec"), ignoreNulls = true).over(wPrev)
      .cast("double")
    val nextD = first(col("sum_dec"), ignoreNulls = true).over(wNext)
      .cast("double")
    val prevB = last(obsBucket, ignoreNulls = true).over(wPrev)
    val nextB = first(obsBucket, ignoreNulls = true).over(wNext)
    sparseGrid(df, key, bucket, valueDec)
      .select(col("k"), col("bucket"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        when(nextB.isNull || nextB === prevB, prevD)
          .otherwise(prevD + (nextD - prevD) *
            ((col("bucket") - prevB) / (nextB - prevB)))
          .as("interp_value"))
  }

  /** Per-key dense bucket grid left-joined with the per-bucket decimal
    * observations (null `sum_dec` on gap rows). */
  private def sparseGrid(df: DataFrame, key: Column, bucket: Column,
      valueDec: Column): DataFrame = {
    val obs = df
      .groupBy(key.as("k"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n_obs"), sum(valueDec).as("sum_dec"))
    val grid = obs.groupBy(col("k"))
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
      .select(col("k"),
        explode(sequence(col("mn"), col("mx"))).as("bucket"))
    grid.join(obs, Seq("k", "bucket"), "left")
  }
}
