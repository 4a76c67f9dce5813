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
}
