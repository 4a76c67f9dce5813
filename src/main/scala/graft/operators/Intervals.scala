package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coalescing — merge overlapping / touching spans per key into
  * maximal disjoint spans (the "union of intervals" sweep; the basis of
  * uptime/coverage reporting over an event log). The reference could
  * only hand such a query to the DBMS through querySql (reference
  * database/dbms/reader/parameter.go:94-101); here it is a per-key
  * window sweep: ordered by start, a span opens a NEW merged group iff
  * it starts strictly after the running max end of everything before it.
  *
  * Scale shape: one shuffle (the per-key window sort), one groupBy that
  * reuses the same hash partitioning, O(1) window state per row
  * (running max + running sum). Per-key data volume bounds the window
  * partition, exactly like sessionize — survives a 100× scale-up
  * as long as single keys fit a partition (salt upstream if one key is
  * the whole table).
  */
object Intervals {

  /** Merge intervals `[start, end]` (inclusive-touching: a span starting
    * exactly at the running max end MERGES) per `keyCols` group. `start`
    * and `end` must be integral (epoch-µs longs in the event gates);
    * rows with null start/end are dropped. Output: keys, `span_start`,
    * `span_end`, `n_rows` (rows merged into the span). */
  def merge(df: DataFrame, keyCols: Seq[String], start: Column, end: Column)
      : DataFrame = {
    val reserved = Seq("__ist", "__ien", "__pmax", "__grp")
    reserved.foreach(r => require(!df.columns.contains(r),
      s"input already has a column named $r (reserved by Intervals)"))
    val gs = keyCols.map(col)
    val w = Window.partitionBy(gs: _*)
      .orderBy(col("__ist").asc, col("__ien").asc)
    val spans = df
      .select(gs :+ start.cast("long").as("__ist") :+
        end.cast("long").as("__ien"): _*)
      .where(col("__ist").isNotNull && col("__ien").isNotNull)
      // running max end over STRICTLY PRECEDING rows: the sweep line
      .withColumn("__pmax",
        max(col("__ien")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__grp",
        sum(when(col("__pmax").isNull || col("__ist") > col("__pmax"), 1L)
          .otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    spans.groupBy((gs :+ col("__grp")): _*)
      .agg(min(col("__ist")).as("span_start"),
        max(col("__ien")).as("span_end"),
        count(lit(1)).as("n_rows"))
      .drop("__grp")
  }
}
