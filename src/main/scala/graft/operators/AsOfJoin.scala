package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-key backward) join: for every left row, attach the most
  * recent right row with the same key and right.ts <= left.ts
  * (SURVEY.md §2.3 — the one join flavor with no Spark built-in).
  *
  * Implementation is the scalable tagged-union shape, not a range join:
  * both sides union into one stream tagged by side, a window
  * last_value(ignoreNulls) over (key ORDER BY ts, side) carries the
  * latest right payload forward onto each left row. Cost = one shuffle on
  * the key + one sort — no candidate-pair explosion, skew handled by AQE
  * exactly like any window. (A broadcast-range variant would blow up on
  * popular keys; a custom SparkPlan would only remove the union overhead.)
  *
  * Right rows sort before left rows at equal ts (side 0 < side 1) so a
  * tie right.ts == left.ts matches — the ASOF `>=` convention.
  */
object AsOfJoin {

  /** Native as-of join through the custom operator stack
    * (graft.plans.AsOfJoinNode -> AsOfJoinStrategy -> AsOfJoinExec):
    * one hash-cluster + sort per side, then a single merge pass with
    * O(1) state — no union, no window buffer. Output contract: left
    * columns + `asof_<name>` for each of `rightCols`, null when no right
    * row qualifies.
    *
    * `direction`: "backward" attaches the LATEST right row with
    * right.ts <= left.ts (spec-asserted equal to [[asofBackward]]);
    * "forward" the EARLIEST right row with right.ts >= left.ts (the
    * merge-asof pair of conventions; ties match in both).
    * `tolerance`: maximum |left.ts - right.ts| in the ts column's native
    * units (µs for timestamps) — a qualifying row further away yields
    * null, the standard merge-asof tolerance semantic. Requires a
    * long-backed ts column. */
  def asofNative(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      rightCols: Seq[String], direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    import graft.plans.{AsOfJoinNode, AsOfJoinStrategy}
    import org.apache.spark.sql.graft.PlanBridge
    require(Seq("backward", "forward").contains(direction),
      s"asof direction must be backward|forward, got $direction")
    require(tolerance.forall(_ >= 0), "asof tolerance must be >= 0")
    if (tolerance.isDefined) {
      import org.apache.spark.sql.types._
      val t = left.schema(leftTs).dataType
      require(Seq[org.apache.spark.sql.types.DataType](
          LongType, TimestampType, TimestampNTZType).contains(t),
        s"asof tolerance needs a long-backed ts column, got $t")
    }
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lp = PlanBridge.analyzed(left)
    // prune the right side HERE: Catalyst's ColumnPruning cannot see
    // through an unknown logical node, so an unselective caller would
    // otherwise scan every right column at 100 TB
    val rightPruned = right.select(
      (keys :+ rightTs).concat(rightCols).distinct.map(col): _*)
    // self-join safety: both sides may derive from the same DataFrame and
    // then share exprIds (the analyzer's DeduplicateRelations only handles
    // built-in Join nodes) — re-alias the right side to fresh ids
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
    PlanBridge.ofRows(spark, AsOfJoinNode.create(lp, rp,
      keys.map(lattr), keys.map(rattr),
      lattr(leftTs), rattr(rightTs), rightCols.map(rattr),
      direction, tolerance))
  }

  /** Backward convenience form (the classic ASOF `>=`). */
  def asofBackwardNative(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      rightCols: Seq[String]): DataFrame =
    asofNative(left, right, keys, leftTs, rightTs, rightCols)

  /** NEAREST-direction as-of (pandas merge_asof direction='nearest'):
    * each left row attaches the right row minimizing |left.ts -
    * right.ts| within `tolerance`, ties preferring the backward
    * (earlier-or-equal) candidate. Composed from the two native
    * single-direction passes — each is the one-merge-pass custom
    * operator, so the cost is two clustered sorts of the (pruned)
    * right side, never a window buffer or a range join. Output adds
    * `asof_direction` ('backward'/'forward', null when nothing
    * qualifies) so callers — and the oracle — can pin the choice. */
  def asofNearestNative(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      rightCols: Seq[String], tolerance: Option[Long] = None)
      : DataFrame = {
    val cols = (rightCols :+ rightTs).distinct
    val back = asofNative(left, right, keys, leftTs, rightTs, cols,
      "backward", tolerance)
    val backRen = cols.foldLeft(back)((d, c) =>
      d.withColumnRenamed(s"asof_$c", s"__bk_$c"))
    val both = asofNative(backRen, right, keys, leftTs, rightTs, cols,
      "forward", tolerance)
    val bTs = col(s"__bk_$rightTs")
    val fTs = col(s"asof_$rightTs")
    val useBack = bTs.isNotNull &&
      (fTs.isNull || (col(leftTs) - bTs) <= (fTs - col(leftTs)))
    val picked = rightCols.map(c =>
      when(useBack, col(s"__bk_$c")).otherwise(col(s"asof_$c"))
        .as(s"asof_$c"))
    val dir = when(bTs.isNull && fTs.isNull, lit(null).cast("string"))
      .when(useBack, lit("backward")).otherwise(lit("forward"))
      .as("asof_direction")
    both.select(left.columns.map(col) ++ picked :+ dir: _*)
  }

  /** Composed reference implementation (tagged union + window), kept as
    * the spec ground truth for [[asofBackwardNative]]. `rightCols` are
    * carried onto the left rows as `asof_<name>` (null when no right row
    * precedes). */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightCols: Seq[String]): DataFrame = {
    val leftTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(keys.map(col) ++ Seq(col("__ts"), col("__side")) ++
        left.columns.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"__r_$c")): _*)
    val rightTagged = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(keys.map(col) ++ Seq(col("__ts"), col("__side")) ++
        left.columns.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++
        rightCols.map(c => col(c).as(s"__r_$c")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(leftTagged.unionByName(rightTagged)) {
      (df, c) =>
        df.withColumn(s"asof_$c",
          last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(keys.map(col) ++
        left.columns.filterNot(keys.contains)
          .map(c => col(s"__l_$c").as(c)) ++
        rightCols.map(c => col(s"asof_$c")): _*)
  }
}
