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
    val counts = df.groupBy(key).agg(count(lit(1)).as("__n"))
    val keyName = counts.columns.head
    counts
      .withColumn("noisy_count",
        col("__n").cast("double") +
          laplace(concat(col(keyName).cast("string"), lit(":" + salt)),
            1.0 / eps))
      .select(col(keyName), col("noisy_count"),
        lit(eps).as("epsilon"))
  }

  /** One Laplace(b) draw per row from a keyed-hash uniform: inverse
    * CDF −b·sign(u−½)·ln(1−2|u−½|), ln through exact fixed-point log2
    * (see [[dpHistogram]]'s scaladoc for the PRG stance). The
    * (2^31 − |h|)/2^31 argument is clamped one ulp off exact zero —
    * u = 0 would be −∞, and a real sampler's support excludes it. */
  private def laplace(seed: Column, b: Double): Column = {
    import graft.functions.FixedLogFunctions.log2_fp
    val u32 = conv(substring(md5(seed), 1, 8), 16, 10).cast("long")
    val h = u32 - lit(1L << 31)
    val zInt = greatest(lit(1L << 31) - abs(h), lit(1L))
    val lnz = (log2_fp(zInt) - lit(31L * (1L << 20))).cast("double") *
      lit(0.6931471805599453d) / lit(1048576.0d)
    val sign = when(h >= 0, lit(1.0d)).otherwise(lit(-1.0d))
    lit(-b) * sign * lnz
  }

  /** ε-DP mean of a clipped metric per key — the other standard
    * release next to the count histogram. Values clip to [0, `clip`]
    * (bounding the sum's sensitivity at `clip`, the count's at 1); the
    * budget splits evenly, Laplace(2·clip/ε) on the exact decimal sum
    * and Laplace(2/ε) on the exact count (sequential composition:
    * ε/2 + ε/2); the released mean is noisy_sum over the noisy count
    * floored at 1. Same keyed-hash PRG as [[dpHistogram]] with
    * distinct per-query salts, so the whole release is
    * bit-deterministic and oracle-replayable; neither the true sum
    * nor the true count leaves the plan. Null metrics are excluded
    * before counting (they contribute to neither statistic). */
  def dpMean(df: DataFrame, key: Column, value: Column, clip: Double,
      eps: Double, salt: String = "dpm"): DataFrame = {
    require(eps > 0 && clip > 0, s"need eps > 0, clip > 0: $eps $clip")
    val clipped = least(
      greatest(graft.ColUtil.money(value), lit(0).cast("decimal(12,4)")),
      lit(clip).cast("decimal(12,4)"))
    val agg = df.where(value.isNotNull)
      .groupBy(key)
      .agg(sum(clipped).as("__s"), count(lit(1)).as("__n"))
    val keyName = agg.columns.head
    def seed(tag: String) =
      concat(col(keyName).cast("string"), lit(s":$tag:$salt"))
    agg
      .withColumn("__ns",
        col("__s").cast("double") + laplace(seed("s"), 2.0 * clip / eps))
      .withColumn("__nc",
        col("__n").cast("double") + laplace(seed("c"), 2.0 / eps))
      .select(col(keyName),
        (col("__ns") / greatest(col("__nc"), lit(1.0d)))
          .as("noisy_mean"),
        lit(eps).as("epsilon"))
  }
}
