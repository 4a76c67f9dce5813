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

  /** Write `df` Z-ORDERED on two or more numeric columns: each column
    * quantizes to `bitsPerCol` bits over its [min, max] span (one 2-value
    * probe per column — the split planner's own probe shape), the bits
    * interleave into a single Morton code, and files range-partition on
    * it. Range-clustering prunes ONE predicate column; the Morton curve
    * keeps every participating column's span small within each file, so
    * min-max file stats prune selective filters on ANY of them (each
    * dimension degrades gracefully as ~selectivity^(1/ncols) instead of
    * not at all). The multi-dimensional analogue of
    * [[writeRangeClustered]]; same one-extra-shuffle write cost. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[Column],
      nFiles: Int, bitsPerCol: Int = 16): Unit =
    zOrdered(df, cols, nFiles, bitsPerCol)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** The Morton-clustered DataFrame behind [[writeZOrdered]], exposed so
    * other writers (e.g. the versioned lake's re-clustering compaction)
    * can stage the same layout through their own commit machinery. The
    * quantization probe (one min/max agg per column) runs HERE, eagerly,
    * once. */
  def zOrdered(df: DataFrame, cols: Seq[Column],
      nFiles: Int, bitsPerCol: Int = 16): DataFrame = {
    import org.apache.spark.sql.functions._
    require(cols.size >= 2,
      "z-order needs >= 2 columns; use writeRangeClustered for one")
    require(nFiles > 0 && bitsPerCol > 0 && bitsPerCol * cols.size <= 63,
      s"interleaved width must fit a long: $bitsPerCol x ${cols.size}")
    val probes = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(c.cast("double")).as(s"mn$i"), max(c.cast("double")).as(s"mx$i"))
    }
    val row = df.agg(probes.head, probes.tail: _*).head()
    val scale = (1L << bitsPerCol) - 1L
    val qs = cols.zipWithIndex.map { case (c, i) =>
      // empty input or all-null column: the probe yields null min/max —
      // no span to encode, so the dimension contributes a constant 0
      if (row.isNullAt(2 * i)) lit(0L)
      else {
        val mn = row.getDouble(2 * i)
        val mx = row.getDouble(2 * i + 1)
        val span = if (mx > mn) mx - mn else 1.0
        least(lit(scale), greatest(lit(0L), coalesce(
          floor((c.cast("double") - lit(mn)) * lit(scale.toDouble) / lit(span))
            .cast("long"), lit(0L))))
      }
    }
    val z = (0 until bitsPerCol).flatMap { b =>
      qs.zipWithIndex.map { case (q, i) =>
        shiftleft(shiftrightunsigned(q, b).bitwiseAND(lit(1L)),
          b * cols.size + i)
      }
    }.reduce((a, b) => a.bitwiseOR(b))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Write `df` HILBERT-clustered on exactly two numeric columns — the
    * locality-tightened sibling of [[writeZOrdered]]: same per-column
    * min/max quantization probe, but cells order along the Hilbert
    * curve ([[graft.functions.HilbertUtil]]), whose consecutive codes
    * are always grid-adjacent, so each file's code range is a connected
    * blob and its (x, y) min/max box — what parquet stats prune on — is
    * tighter than the Morton curve's jump-prone ranges at the same file
    * count. Encode is one codegen'd expression call per row, write
    * time only. */
  def writeHilbertOrdered(df: DataFrame, path: String,
      xCol: Column, yCol: Column, nFiles: Int, bitsPerCol: Int = 16)
      : Unit =
    hilbertOrdered(df, xCol, yCol, nFiles, bitsPerCol)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** The Hilbert-clustered DataFrame behind [[writeHilbertOrdered]]. */
  def hilbertOrdered(df: DataFrame, xCol: Column, yCol: Column,
      nFiles: Int, bitsPerCol: Int = 16): DataFrame = {
    import org.apache.spark.sql.functions._
    require(nFiles > 0 && bitsPerCol >= 1 && bitsPerCol <= 31,
      s"bad hilbert params: $nFiles files, $bitsPerCol bits")
    val row = df.agg(min(xCol.cast("double")).as("mnx"),
      max(xCol.cast("double")).as("mxx"),
      min(yCol.cast("double")).as("mny"),
      max(yCol.cast("double")).as("mxy")).head()
    val scale = (1L << bitsPerCol) - 1L
    def q(c: Column, i: Int): Column =
      if (row.isNullAt(2 * i)) lit(0L)
      else {
        val mn = row.getDouble(2 * i)
        val mx = row.getDouble(2 * i + 1)
        val span = if (mx > mn) mx - mn else 1.0
        least(lit(scale), greatest(lit(0L), coalesce(
          floor((c.cast("double") - lit(mn)) * lit(scale.toDouble) /
            lit(span)).cast("long"), lit(0L))))
      }
    val h = graft.functions.HilbertFunctions.hilbert_index(
      q(xCol, 0), q(yCol, 1), bitsPerCol)
    df.withColumn("__h", h)
      .repartitionByRange(nFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
  }
}
