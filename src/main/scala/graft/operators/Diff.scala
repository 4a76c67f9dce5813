package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed two-table diff — the ETL regression audit ("what changed
  * between yesterday's load and today's?"). One full-outer join on the
  * key classifies every row as added / removed / changed / unchanged and
  * flags each compared column null-safely (`<=>`, so NULL -> value and
  * value -> NULL count as changes, NULL -> NULL does not). The lake's
  * CDC diff (VersionedTable.diff) answers this for ITS commits; this
  * operator answers it for any two frames sharing a key, e.g. across
  * systems during a migration cutover.
  *
  * Scale shape: ONE shuffle per side (hash on the key), map-side partial
  * aggregation of the counters; the wide row never leaves its join task.
  * Output is a tall (metric, n) report: n_added, n_removed, n_changed,
  * n_unchanged, then changed_<col> per compared column. */
object Diff {

  def tableDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compare: Seq[String]): DataFrame = {
    require(keys.nonEmpty && compare.nonEmpty)
    val o = oldDf.select((keys ++ compare).map(col): _*)
      .withColumn("__o", lit(1))
    val n = newDf.select(keys.map(col) ++
        compare.map(c => col(c).as(s"__n_$c")): _*)
      .withColumn("__n", lit(1))
    // project new-side keys under their own names for the USING join,
    // compared columns under __n_ prefixes for the flag expressions
    val j = o.join(n, keys, "full_outer")
    val colChanged: Seq[Column] = compare.map { c =>
      (col("__o").isNotNull && col("__n").isNotNull &&
        !(col(c) <=> col(s"__n_$c"))).cast("long").as(s"__chg_$c")
    }
    val anyChanged = compare.map(c =>
      col("__o").isNotNull && col("__n").isNotNull &&
        !(col(c) <=> col(s"__n_$c"))).reduce(_ || _)
    val flagged = j.select(
      (col("__o").isNull).cast("long").as("__added") +:
        (col("__n").isNull).cast("long").as("__removed") +:
        (col("__o").isNotNull && col("__n").isNotNull && anyChanged)
          .cast("long").as("__changed") +:
        (col("__o").isNotNull && col("__n").isNotNull && !anyChanged)
          .cast("long").as("__unchanged") +:
        colChanged: _*)
    val sums = flagged.agg(
      sum(col("__added")).as("n_added"),
      (Seq(sum(col("__removed")).as("n_removed"),
        sum(col("__changed")).as("n_changed"),
        sum(col("__unchanged")).as("n_unchanged")) ++
        compare.map(c => sum(col(s"__chg_$c")).as(s"changed_$c"))): _*)
    // tall report: stable metric order (row classes, then columns)
    val metrics = Seq("n_added", "n_removed", "n_changed", "n_unchanged") ++
      compare.map(c => s"changed_$c")
    sums.select(explode(array(metrics.map(m =>
        struct(lit(m).as("metric"), col(m).as("n"))): _*)).as("e"))
      .select(col("e.metric").as("metric"), col("e.n").as("n"))
  }
}
