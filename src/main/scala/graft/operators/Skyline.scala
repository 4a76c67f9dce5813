package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto-skyline extraction — the rows not dominated on a pair of
  * minimize-dimensions (classic Börzsönyi/Kossmann/Stocker "skyline
  * operator"; the reference engine could at most push a NOT EXISTS
  * self-join through querySql, reference
  * database/dbms/reader/parameter.go:94-101, which the backing DBMS
  * executes as an O(n²) nested loop).
  *
  * Point q dominates p iff q ≤ p on both dimensions and q < p on at
  * least one. Duplicated (x,y) points never dominate each other, so all
  * rows sharing a frontier point survive together.
  *
  * Scale shape — the naive formulation is an O(n²) anti-join; this one
  * is sort-free of any global single-partition stage:
  *   1. distinct (x,y) per group (one shuffle, map-side partial);
  *   2. range-bucket on x (per-group min/max from one tiny agg), so the
  *      frontier window is `partitionBy(group, bucket)` — never a
  *      global one-partition sort;
  *   3. within a bucket, ordering by (x asc, y asc) makes domination a
  *      running min: p is locally dominated iff min(y) over preceding
  *      rows ≤ p.y (strictness is guaranteed by distinctness);
  *   4. across buckets, a lower bucket implies strictly smaller x can
  *      only hold per point — but bucket(q) < bucket(p) does imply
  *      q.x < p.x is false only when x ties cross a boundary, which
  *      cannot happen because the bucket is a pure function of x; so a
  *      candidate is dominated by an earlier bucket iff the cumulative
  *      min of per-bucket min(y) over strictly-earlier buckets ≤ p.y.
  *      That cumulative window runs over ≤ `buckets` rows per group.
  * Total: two shuffles over the point set plus two tiny aggregates;
  * every stage is per-group/per-bucket parallel, so the plan survives a
  * 100× scale-up (the frontier itself is typically O(log n) per group).
  */
object Skyline {

  /** Rows of `df` on the Pareto frontier of (`x`, `y`), both MINIMIZED,
    * within each group of `groupCols` (global frontier when empty). To
    * maximize a dimension, pass its negation. Rows where either
    * dimension is null are never on the frontier and never dominate. */
  def pareto2d(df: DataFrame, x: Column, y: Column,
               groupCols: Seq[String] = Nil, buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val reserved = Seq("__sx", "__sy", "__mn", "__mx", "__bkt", "__lmin",
      "__bmin", "__pmin")
    reserved.foreach(r => require(!df.columns.contains(r),
      s"input already has a column named $r (reserved by Skyline)"))
    val gs = groupCols.map(col)

    val pts = df.select(gs :+ x.as("__sx") :+ y.as("__sy"): _*)
      .where(col("__sx").isNotNull && col("__sy").isNotNull)
      .distinct()

    // per-group x range for bucketing (one row per group)
    val bounds = pts.groupBy(gs: _*)
      .agg(min(col("__sx")).as("__mn"), max(col("__sx")).as("__mx"))
    val withBounds =
      if (groupCols.isEmpty) pts.crossJoin(broadcast(bounds))
      else pts.join(bounds, groupCols)

    // monotone bucket of x: equal x always lands in the same bucket, so
    // bucket(q) < bucket(p) implies q.x < p.x (the cross-bucket phase
    // relies on exactly this)
    val w = (col("__mx").cast("double") - col("__mn").cast("double")) /
      lit(buckets.toDouble)
    val bkt = when(col("__mx") <= col("__mn"), lit(0L)).otherwise(
      least(floor((col("__sx").cast("double") - col("__mn").cast("double")) / w),
        lit(buckets - 1L))).cast("long")
    val bucketed = withBounds.withColumn("__bkt", bkt)
      .drop("__mn", "__mx")

    // phase 1: frontier within each (group, bucket)
    val localW = Window.partitionBy((gs :+ col("__bkt")): _*)
      .orderBy(col("__sx").asc, col("__sy").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val localKeep = bucketed
      .withColumn("__lmin", min(col("__sy")).over(localW))
      .where(col("__lmin").isNull || col("__lmin") > col("__sy"))
      .drop("__lmin")

    // phase 2: cumulative min(y) of strictly-earlier buckets (≤ buckets
    // rows per group — a bounded window, never a data-sized one)
    val bucketW = Window.partitionBy(gs: _*).orderBy(col("__bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bmins = bucketed.groupBy((gs :+ col("__bkt")): _*)
      .agg(min(col("__sy")).as("__bmin"))
      .withColumn("__pmin", min(col("__bmin")).over(bucketW))
      .drop("__bmin")
    val frontier = localKeep
      .join(bmins, groupCols :+ "__bkt")
      .where(col("__pmin").isNull || col("__pmin") > col("__sy"))
      .select(gs :+ col("__sx") :+ col("__sy"): _*)

    // recover the full original rows (duplicates of a frontier point all
    // survive — dominance is strict, equals never dominate)
    df.withColumn("__sx", x).withColumn("__sy", y)
      .join(frontier, groupCols ++ Seq("__sx", "__sy"), "leftsemi")
      .drop("__sx", "__sy")
  }
}
