package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}

/** Data-layout control for scan pruning — the write-side half of "push
  * down and prune". A randomly-laid-out table spreads every key range
  * over every file, so a selective filter still opens 100% of a 100 TB
  * table; range-clustering on the filter key co-locates nearby keys in
  * the same files, and parquet's file/row-group min-max statistics then
  * prune the scan to O(selectivity) files. One extra range shuffle at
  * write time, paid once. */
object Layout {

  /** Write `df` range-clustered on `cols` into `nFiles` files (sorted
    * within each file so row-group stats are tight too). */
  def writeRangeClustered(df: DataFrame, path: String, cols: Seq[Column],
      nFiles: Int): Unit = {
    require(cols.nonEmpty && nFiles > 0)
    df.repartitionByRange(nFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
