package graft.operators

import org.apache.spark.sql.DataFrame

/** The ONE pinning point for iterative / multi-consumer working sets.
  *
  * Every operator that re-scans an intermediate (graph iteration edge
  * sets, CC labels, k-means vectors, ER blocking inputs, prefix-sum
  * frames) pins it here instead of calling `localCheckpoint()` inline,
  * so the materialization posture is a single switch:
  *
  *  - default: eager `localCheckpoint()` — blocks live on executors,
  *    lineage is cut, per-scan columnar decode is avoided (guide §5;
  *    measured 10-17 s/iteration of re-scan saved on pageRank at
  *    sf0.1/32 cores in r10).
  *  - `spark.graft.pin.reliable=true` AND a `SparkContext.setCheckpointDir`
  *    directory set: reliable `checkpoint()` — blocks go to the
  *    checkpoint dir and survive executor loss. `localCheckpoint` is NOT
  *    fault-tolerant: on a real cluster one lost executor (or dynamic
  *    allocation reclaiming one) makes the pinned RDD unrecoverable, so
  *    a 100 TB deployment must flip this switch (the speed cost is one
  *    write+read of the working set through the checkpoint FS).
  *
  * Both modes return a DataFrame with the SAME rows and schema; the
  * choice can never change query results (PinSpec asserts plan-output
  * equivalence in local mode).
  */
object Pin {
  /** Config key: set "true" (with a checkpoint dir) for fault-tolerant
    * pins on clusters where executors can be lost. */
  val ReliableKey = "spark.graft.pin.reliable"

  def workingSet(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable =
      spark.conf.getOption(ReliableKey).exists(_.equalsIgnoreCase("true")) &&
        spark.sparkContext.getCheckpointDir.isDefined
    if (reliable) df.checkpoint() else df.localCheckpoint()
  }

  /** [[workingSet]] for frames whose PARTITIONING (and ordering) the
    * consumer relies on — pre-partitioned iteration working sets that
    * downstream joins probe by key every round.
    *
    * Under AQE the checkpoint loses the partitioning: `Dataset
    * .localCheckpoint` records `physicalPlan.outputPartitioning`, and an
    * `AdaptiveSparkPlanExec` reports Unknown — so every consumer join
    * re-shuffled the WHOLE pinned frame per round (measured on
    * randomWalks at sf0.1: 19 MB x walkLen of adjacency re-exchange that
    * the layout was built to avoid). Disabling AQE just for the
    * materialization keeps the declared HashPartitioning/ordering on the
    * checkpointed scan; the consuming queries still run with AQE. */
  def workingSetPartitioned(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.conf
    val key = "spark.sql.adaptive.enabled"
    val prev = conf.get(key, "true")
    conf.set(key, "false")
    try workingSet(df) finally conf.set(key, prev)
  }

  /** Import for the `.pinned()` postfix form — a drop-in replacement at
    * the former inline `.localCheckpoint()` call sites. */
  object syntax {
    implicit class PinnedDataFrame(private val df: DataFrame)
        extends AnyVal {
      def pinned(): DataFrame = Pin.workingSet(df)
    }
  }
}
