package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) tables — the co-located join path for the
  * joins that recur at 100 TB (fact x fact on a stable key). A bucketed
  * scan reports `HashPartitioning(keys, n)`, so equi-joins and
  * aggregations on the bucket keys satisfy their required distribution
  * WITHOUT an Exchange: the shuffle is paid ONCE at write time and
  * amortized over every subsequent query (plan-asserted in PlanSpec —
  * zero Exchange for both the join and the group-by).
  *
  * This is capability-extension over the reference (whose writer fan-in,
  * SURVEY.md §2.9 X6, splits but never co-locates); it is the Spark
  * idiom replacing the reference's "split the read into co-ordered range
  * tasks" pattern for repeated analytical joins. */
object Bucketing {

  /** Write `df` as a managed bucketed parquet table, sorted within
    * buckets (single sorted file per bucket lets the scan skip the Sort
    * too when compaction keeps one file per bucket). Both join sides
    * must use the same `nBuckets` for a co-located plan. `sortCols`
    * defaults to the bucket keys; widen it (e.g. keys :+ ts) when a
    * downstream operator needs a finer within-bucket order — the as-of
    * and interval execs require (keys, ts). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      nBuckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    require(keys.nonEmpty && nBuckets > 0)
    val sc = if (sortCols.isEmpty) keys else sortCols
    // a FRESH session can inherit the managed table's directory from a
    // previous JVM without its catalog entry — saveAsTable then fails
    // with LOCATION_ALREADY_EXISTS even in overwrite mode. Delete the
    // directory ONLY in that stale-orphan case (no catalog entry): when
    // the catalog DOES know the table, DROP TABLE owns the cleanup —
    // an unconditional recursive delete would silently destroy a live
    // unrelated table that happens to share the name.
    val spark = df.sparkSession
    val known = spark.catalog.tableExists(table)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    if (!known) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write.mode("overwrite")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(sc.head, sc.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Co-located equi-join of two same-bucketed tables on their bucket
    * keys — plans with zero Exchange. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      leftKeys: Seq[String], rightKeys: Seq[String],
      joinType: String = "inner"): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    val cond = leftKeys.zip(rightKeys)
      .map { case (a, b) => l(a) === r(b) }
      .reduce(_ && _)
    l.join(r, cond, joinType)
  }
}
