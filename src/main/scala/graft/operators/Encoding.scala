package graft.operators

import graft.ColUtil
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised categorical feature encoding for model-training pipelines.
  *
  * Target encoding replaces a categorical column with a statistic of the
  * training target over that category — the standard high-cardinality
  * alternative to one-hot (Micci-Barreca 2001, "A preprocessing scheme
  * for high-cardinality categorical attributes"). The naive form leaks
  * the row's own label into its feature; the leave-one-out form excludes
  * it: enc(row) = (sum(target over category) - target(row)) / (n - 1).
  *
  * Determinism contract (ColUtil scheme): the per-category sufficient
  * statistics (n, Σt) accumulate in exact decimal, the row's encoding is
  * then ONE IEEE division of two values both engines derive identically —
  * so the whole feature column is hash-exact cross-engine.
  *
  * Scale shape: one partial-aggregated shuffle on the category domain
  * produces a |domain|-row stats table, which is BROADCAST back — the
  * encode itself is map-only over the fact table. The window formulation
  * (what the SQL oracle replays) would instead shuffle and sort the full
  * fact table per encoded column; at 100 TB that difference is the whole
  * game, which is why this is an operator and not a query idiom.
  */
object Encoding {

  /** Leave-one-out target encoding of `category` against money-scale
    * `target` (|t| < 1e8, quantized to 4 dp — ColUtil.money).
    *
    * Rows with a NULL category or NULL target are passed through with a
    * NULL encoding (they contribute nothing and learn nothing, matching
    * scikit-learn's TargetEncoder handling). Singleton categories
    * (n == 1) also encode NULL: with its own label held out there is no
    * evidence left — callers impute downstream (typically the global
    * prior). Output: input columns + `outCol`. */
  def targetEncodeLoo(df: DataFrame, category: Column, target: Column,
      outCol: String = "enc"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists in the input")
    val reserved = Seq("__te_cat", "__te_t", "__te_n", "__te_s")
    reserved.foreach(r => require(!df.columns.contains(r),
      s"input may not contain reserved column '$r'"))
    val base = df
      .withColumn("__te_cat", category)
      .withColumn("__te_t", ColUtil.money(target))
    val stats = base
      .where(col("__te_cat").isNotNull && col("__te_t").isNotNull)
      .groupBy(col("__te_cat"))
      .agg(count(lit(1)).as("__te_n"), sum(col("__te_t")).as("__te_s"))
    base
      .join(broadcast(stats), Seq("__te_cat"), "left")
      .withColumn(outCol,
        when(col("__te_t").isNotNull && col("__te_n") > 1,
          (col("__te_s") - col("__te_t")).cast("double") /
            (col("__te_n") - 1).cast("double")))
      .drop(reserved: _*)
  }
}
