package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification risk audits for training data (Sweeney's
  * k-anonymity, Machanavajjhala's l-diversity — public literature): a
  * released record is k-anonymous when at least k records share its
  * quasi-identifier combination, and a class is l-diverse when the
  * sensitive attribute takes at least l distinct values inside it (a
  * uniform class leaks the sensitive value even at high k).
  *
  * Scale shape: ONE groupBy on the quasi-identifier tuple computes both
  * class size and sensitive diversity (map-side partial aggregation);
  * the row-level view is a semi-join of the data against the flagged
  * classes — no window over the full table, no per-row state. All
  * counts are exact integers, so the report is oracle-exact. */
object Privacy {

  /** Per-class audit: `(quasi..., class_size, n_sensitive)` for every
    * class VIOLATING k-anonymity (size < k) or l-diversity
    * (n_sensitive < l). Pass `l = 1` to audit anonymity alone. */
  def anonymityViolations(df: DataFrame, quasi: Seq[(String, Column)],
      sensitive: Column, k: Int, l: Int = 1): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1 && l >= 1, s"k and l must be >= 1: k=$k l=$l")
    df.groupBy(quasi.map { case (n, c) => c.as(n) }: _*)
      .agg(count(lit(1)).as("class_size"),
        count_distinct(sensitive).as("n_sensitive"))
      .filter(col("class_size") < k || col("n_sensitive") < l)
  }

  /** The rows inside violating classes — what a release pipeline must
    * suppress or generalize before publishing. */
  def riskRows(df: DataFrame, quasi: Seq[(String, Column)],
      sensitive: Column, k: Int, l: Int = 1): DataFrame = {
    val flagged = anonymityViolations(df, quasi, sensitive, k, l)
      .select(quasi.map { case (n, _) => col(n).as(s"__pv_$n") }: _*)
    // null-safe equality: a NULL quasi value is still a class
    val cond = quasi.map { case (n, c) => c <=> col(s"__pv_$n") }
      .reduce(_ && _)
    df.join(flagged, cond, "left_semi")
  }

  /** ε-differentially-private histogram: per-key counts plus Laplace
    * (sensitivity 1 / ε) noise — the release mechanism for publishing
    * aggregate statistics of training corpora (Dwork et al. 2006).
    * Histogram cells are disjoint, so each cell spends the full ε
    * (parallel composition).
    *
    * The Laplace draw is the inverse-CDF transform
    * −(1/ε)·sign(u−½)·ln(1−2|u−½|) over a uniform u derived from a
    * keyed hash (md5 nibbles, [[Sampling.hashBucket]]'s decode) — a
    * seeded PRG like any production DP library uses, so runs are
    * reproducible and the oracle can replay them; the guarantee holds
    * against adversaries without the salt, exactly the usual PRG
    * assumption. The ln runs through log2_fp (exact integer fixed
    * point, functions.FixedLog) scaled by one ln2 double constant —
    * no libm, so the released values are bit-identical cross-engine
    * and under any partitioning.
    *
    * Scale shape: ONE grouped count (map-side partial), then per-KEY
    * noise arithmetic on the aggregated relation — noise cost follows
    * the key domain, not the row count. Output: (key, noisy_count,
    * epsilon); the true count never leaves the plan. */
  def dpHistogram(df: DataFrame, key: Column, eps: Double,
      salt: String = "dp"): DataFrame = {
    require(eps > 0, s"epsilon must be positive: $eps")
    import graft.functions.FixedLogFunctions.log2_fp
    val counts = df.groupBy(key).agg(count(lit(1)).as("__n"))
    val keyName = counts.columns.head
    val u32 = conv(substring(md5(concat(col(keyName).cast("string"),
      lit(":" + salt))), 1, 8), 16, 10).cast("long")
    val h = u32 - lit(1L << 31)
    // 1 − 2|u−½| = (2^31 − |h|)/2^31, clamped one ulp off exact zero
    // (u = 0 would be −∞; a real sampler's support excludes it too)
    val zInt = greatest(lit(1L << 31) - abs(h), lit(1L))
    val lnz = (log2_fp(zInt) - lit(31L * (1L << 20))).cast("double") *
      lit(0.6931471805599453d) / lit(1048576.0d)
    val sign = when(h >= 0, lit(1.0d)).otherwise(lit(-1.0d))
    counts
      .withColumn("noisy_count",
        col("__n").cast("double") + lit(-1.0d / eps) * sign * lnz)
      .select(col(keyName), col("noisy_count"),
        lit(eps).as("epsilon"))
  }
}
