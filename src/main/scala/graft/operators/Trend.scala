package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key trend fitting — least-squares regression as a single
  * aggregation pass (the time-series "is this metric drifting" primitive;
  * the reference's DBMS could at most run REGR_SLOPE via querySql,
  * reference database/dbms/reader/parameter.go:94-101).
  *
  * Determinism contract (same scheme as ColUtil): the five sufficient
  * statistics (n, Σx, Σy, Σxy, Σx²) accumulate in EXACT arithmetic —
  * bigint x, decimal(12,4)-quantized y — so they are identical in any
  * engine and under any partitioning; slope/intercept are then a fixed
  * dag of IEEE double operations over those identical inputs, hence
  * bit-identical too. A double-sum formulation would drift in the last
  * ulp with partition count; ln/pow-based fits would drift between
  * libm implementations.
  */
object Trend {
  /** OLS fit of y over x per key group.
    *
    * `x` must be integral (bigint-safe: |x| and per-group Σx² within
    * decimal(38) — quantize timestamps to seconds first); `y` is
    * money-scale (|y| < 1e8, quantized to 4 dp like ColUtil.money).
    * Groups where x never varies (slope undefined) are dropped — the
    * variance guard is an exact integer comparison, not a float-zero
    * test. Output: keys, n, slope, intercept.
    *
    * Scale shape: ONE shuffle (the groupBy, map-side partial), O(1)
    * state per group. */
  def ols(df: DataFrame, keyCols: Seq[String], x: Column, y: Column)
      : DataFrame = {
    val keys = keyCols.map(col)
    val ym = y.cast("decimal(12,4)")
    df.select(keys :+ x.cast("long").as("__x") :+ ym.as("__y"): _*)
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("__x")).as("__nx"),
        sum(col("__x").cast("decimal(38,0)")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum((col("__x") * col("__y")).cast("decimal(38,4)")).as("__sxy"),
        // widen before the square: a long*long product would wrap
        // silently past 2^63 under non-ANSI arithmetic
        sum(col("__x").cast("decimal(19,0)") * col("__x")).as("__sxx"))
      .filter(col("__nx") > 1)
      .withColumn("__dn", col("n").cast("double"))
      .withColumn("__dx", col("__sx").cast("double"))
      .withColumn("__dy", col("__sy").cast("double"))
      .withColumn("slope",
        (col("__dn") * col("__sxy").cast("double") -
          col("__dx") * col("__dy")) /
        (col("__dn") * col("__sxx").cast("double") -
          col("__dx") * col("__dx")))
      .withColumn("intercept",
        (col("__dy") - col("slope") * col("__dx")) / col("__dn"))
      .select(keys ++ Seq(col("n"), col("slope"), col("intercept")): _*)
  }
}
