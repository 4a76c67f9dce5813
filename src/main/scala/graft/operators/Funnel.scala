package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-stage funnel analysis over an event log — "of the entities that
  * did A, how many then did B, then C, inside the conversion window?"
  *
  * The reference delegates every analytic query to the backing DBMS via
  * `querySql` (/root/reference/database/dbms/reader/parameter.go:94-101);
  * a funnel is the canonical event-analytics query a reference user would
  * push down, so it is first-class here. Semantics (the strict sequential
  * form): stage 0 matches each entity's EARLIEST stage-0 event; stage i>0
  * matches the earliest stage-i event STRICTLY AFTER the entity's stage
  * i-1 match and no later than `windowUs` after the stage-0 match. Ties
  * on the boundary are excluded by the strict inequality; equal-timestamp
  * stage events therefore cannot satisfy two consecutive stages.
  *
  * Scale shape: one aggregation + one equi-join per stage, every one of
  * them keyed on the entity column — at cluster scale all stages shuffle
  * on the same key, so exchange reuse keeps it to one real repartition of
  * the (filtered) event log per stage, with no per-entity event
  * materialization (no collect_list of a hot user's history — the state
  * per entity is exactly one timestamp per completed stage).
  */
object Funnel {

  /** Per-entity stage-completion times. Element i of the returned list has
    * columns (entity, t0 .. ti): the entities that completed stages 0..i,
    * with the matched event time of each stage in epoch-micros. */
  def stageFrames(events: DataFrame, entity: String, typeCol: String,
      tsUs: Column, stages: Seq[String], windowUs: Long): Seq[DataFrame] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val ev = events.select(col(entity), col(typeCol).as("__ft"),
      tsUs.cast("long").as("__fus"))
    val frame0 = ev.filter(col("__ft") === stages.head)
      .groupBy(col(entity)).agg(min(col("__fus")).as("t0"))
    stages.zipWithIndex.drop(1).scanLeft(frame0) {
      case (prev, (stage, i)) =>
        val carried = col(entity) +: (0 until i).map(j => col(s"t$j"))
        ev.filter(col("__ft") === stage)
          .join(prev, entity)
          .where(col("__fus") > col(s"t${i - 1}") &&
            col("__fus") <= col("t0") + windowUs)
          .groupBy(carried: _*)
          .agg(min(col("__fus")).as(s"t$i"))
    }
  }

  /** The funnel report: one row per stage with the count of entities that
    * reached it — (stage_idx, stage, n_entities), monotone non-increasing
    * down the stages. */
  def report(events: DataFrame, entity: String, typeCol: String,
      tsUs: Column, stages: Seq[String], windowUs: Long): DataFrame =
    stageFrames(events, entity, typeCol, tsUs, stages, windowUs)
      .zipWithIndex.map { case (f, i) =>
        f.agg(count(lit(1)).as("n_entities"))
          .select(lit(i).as("stage_idx"), lit(stages(i)).as("stage"),
            col("n_entities"))
      }.reduce(_ unionAll _)

  /** Top user-journey paths — the unsupervised sibling of the funnel
    * (the funnel counts a PRESCRIBED sequence; this DISCOVERS the
    * common ones): each entity's first `steps` events, in `order`,
    * concatenated into a '>'-joined path string, then paths ranked by
    * how many entities walked them. Entities with fewer than `steps`
    * events contribute their full (shorter) path — prefixes and
    * complete paths are distinct keys, and n_steps disambiguates.
    *
    * Returns top `k` rows of (path, n_steps, n_entities) by
    * (n_entities desc, path). Scale shape: the rank<=steps cut plans
    * as WindowGroupLimit (≤ steps candidate rows per entity per
    * partition cross the entity exchange, not the entity's whole
    * history); reassembly is one groupBy(entity); the final cut is
    * TakeOrderedAndProject over |distinct paths| — bounded by
    * |types|^steps, not the corpus. `order` must end in a unique
    * tiebreaker (event id) or first-k membership is nondeterministic. */
  def topPaths(events: DataFrame, entity: String, typeCol: String,
      order: Seq[Column], steps: Int, k: Int): DataFrame = {
    require(steps >= 1 && k >= 1, s"need steps, k >= 1: $steps $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(entity)).orderBy(order: _*)
    events
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= steps)
      .groupBy(col(entity))
      .agg(count(lit(1)).as("n_steps"),
        array_join(transform(
          array_sort(collect_list(struct(col("__rn"), col(typeCol)))),
          x => x.getField(typeCol)), ">").as("path"))
      .groupBy(col("path"), col("n_steps"))
      .agg(count(lit(1)).as("n_entities"))
      .orderBy(col("n_entities").desc, col("path"))
      .limit(k)
  }
}
