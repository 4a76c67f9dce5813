package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StructType

/** Batch-plan -> streaming-plan bridge for V1 streaming sources.
  *
  * A V1 `Source.getBatch` must return a DataFrame whose logical plan is
  * flagged `isStreaming = true` (MicroBatchExecution asserts it) — the
  * same seam Spark's own `FileStreamSource` crosses via the
  * private[sql] `Dataset.ofRows(..., isStreaming = true)` constructor.
  * Exposed from inside the package namespace like [[PlanBridge]]. */
object StreamBridge {

  /** The ForeachBatchSink re-wrap: a V1 `Sink.addBatch` DataFrame wraps
    * the micro-batch's IncrementalExecution and cannot be re-planned by
    * arbitrary batch actions — pin its computed RDD under a LogicalRDD
    * (exactly what Spark's own ForeachBatchSink does) so downstream
    * batch writes execute the batch once and correctly. */
  def rewrapBatch(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[_]]
    PlanBridge.ofRows(df.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD.fromDataset(
        ds.queryExecution.toRdd, ds, isStreaming = false))
  }

  /** An arbitrary batch DataFrame as a streaming-flagged micro-batch:
    * pin its RDD lineage under a streaming LogicalRDD. Unlike
    * [[streamingParquet]] (leaf-relation flip), this works for JOIN
    * plans — the change-feed batches are per-commit diff joins that
    * must execute with BATCH semantics inside the micro-batch (flipping
    * their leaves would turn them into stateful streaming joins). The
    * RDD is lazy: the diff computes when the micro-batch runs. */
  def streamingBatch(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[_]]
    PlanBridge.ofRows(df.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD.fromDataset(
        ds.queryExecution.toRdd, ds, isStreaming = true))
  }

  /** A streaming-flagged parquet read of `files` (an empty streaming
    * relation when the batch carries no files — e.g. a constraint-only
    * or tag-only lake commit added no data). */
  def streamingParquet(spark: SparkSession, schema: StructType,
      files: Seq[String]): DataFrame = {
    if (files.isEmpty) {
      val attrs = DataTypeUtils.toAttributes(schema)
      PlanBridge.ofRows(spark,
        LocalRelation(attrs, Nil, isStreaming = true))
    } else {
      val batch = spark.read.schema(schema).parquet(files: _*)
      val plan = batch.asInstanceOf[classic.Dataset[_]]
        .queryExecution.analyzed
      val streamed = plan.transform {
        case lr: LogicalRelation => lr.copy(isStreaming = true)
      }
      PlanBridge.ofRows(spark, streamed)
    }
  }
}
