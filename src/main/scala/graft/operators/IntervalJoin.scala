package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Interval (time-window range) join — every left row joined to ALL
  * right rows with equal keys and
  * `left.ts - before <= right.ts <= left.ts + after`.
  *
  * [[intervalJoinNative]] runs the custom sweep operator
  * (graft.plans.IntervalJoinNode -> Strategy -> Exec): one hash-cluster
  * + sort per side, then a sliding-window merge with O(n + m + output)
  * per-key work and state bounded by window occupancy. The built-in
  * plan for the same query (see [[intervalJoinComposed]], kept as the
  * spec ground truth) is a sort-merge join on the key with the range as
  * a residual — per key it compares the full n x m cross product, which
  * a hot key turns quadratic.
  */
object IntervalJoin {

  /** Native sweep form. Output contract: left columns + `ij_<name>` for
    * each of `rightCols` (null-filled only in outer mode for windowless
    * lefts). Both ts columns must be long-backed (integer epoch units —
    * the fixtures' nanos/micros longs). */
  def intervalJoinNative(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      rightCols: Seq[String], before: Long, after: Long,
      outer: Boolean = false): DataFrame = {
    import graft.plans.{IntervalJoinNode, IntervalJoinStrategy}
    import org.apache.spark.sql.graft.PlanBridge
    require(before >= 0 && after >= 0,
      s"interval bounds must be >= 0, got before=$before after=$after")
    require(left.schema(leftTs).dataType == LongType &&
        right.schema(rightTs).dataType == LongType,
      "interval join needs long-backed ts columns (epoch units)")
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(IntervalJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ IntervalJoinStrategy
    val lp = PlanBridge.analyzed(left)
    // prune the right side HERE: Catalyst's ColumnPruning cannot see
    // through an unknown logical node, so an unselective caller would
    // otherwise scan every right column at 100 TB
    val rightPruned = right.select(
      (keys :+ rightTs).concat(rightCols).distinct.map(col): _*)
    // self-join safety: re-alias the right side to fresh exprIds (the
    // analyzer's DeduplicateRelations only handles built-in Join nodes)
    val rp0 = PlanBridge.analyzed(rightPruned)
    val aliases = rp0.output.map(a =>
      org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)())
    val rp = org.apache.spark.sql.catalyst.plans.logical.Project(aliases, rp0)
    def lattr(n: String) = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in [${lp.output.map(_.name).mkString(",")}]"))
    def rattr(n: String) = aliases.find(_.name == n).map(_.toAttribute)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in [${aliases.map(_.name).mkString(",")}]"))
    PlanBridge.ofRows(spark, IntervalJoinNode.create(lp, rp,
      keys.map(lattr), keys.map(rattr),
      lattr(leftTs), rattr(rightTs), rightCols.map(rattr),
      before, after, outer))
  }

  /** Salted sweep for DOMINANT hot keys: the sweep is already linear
    * per key, but one key holding a torrent still runs in one task —
    * the last-straggler shape at 1000 executors. Left rows spread over
    * `salts` deterministic sub-keys (hash of the whole row), right rows
    * replicate to every salt, each (key, salt) group sweeps
    * independently: row-identical output (spec-asserted), right-side
    * work x`salts`, left-side parallelism x`salts` — the same trade as
    * [[SkewJoin.saltedJoin]] makes for equi joins. */
  def intervalJoinSalted(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      rightCols: Seq[String], before: Long, after: Long,
      salts: Int, outer: Boolean = false): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val sl = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salts))
        .cast("int"))
    val sr = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    intervalJoinNative(sl, sr, keys :+ "__salt", leftTs, rightTs,
      rightCols, before, after, outer)
      .drop("__salt")
  }

  /** Composed reference implementation over built-ins (equi join with
    * the range residual), kept as the spec ground truth. Same output
    * contract as [[intervalJoinNative]]. */
  def intervalJoinComposed(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      rightCols: Seq[String], before: Long, after: Long,
      outer: Boolean = false): DataFrame = {
    val r = right.select(
      keys.map(k => col(k).as(s"__rk_$k")) ++
        (col(rightTs).as("__r_ts") +:
          rightCols.map(c => col(c).as(s"ij_$c"))): _*)
    val cond = keys.map(k => col(k) === col(s"__rk_$k")).reduce(_ && _) &&
      col("__r_ts") >= col(leftTs) - before &&
      col("__r_ts") <= col(leftTs) + after
    left.join(r, cond, if (outer) "left_outer" else "inner")
      .select(left.columns.map(col) ++ rightCols.map(c => col(s"ij_$c")): _*)
  }
}
