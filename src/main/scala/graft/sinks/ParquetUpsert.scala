package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Key-based upsert over a parquet target — the engine's analogue of the
  * reference's MySQL `replace into` write mode (mysql/table.go:63-69):
  * incoming rows overwrite existing rows with the same key, others append.
  *
  * Without a transactional table format on the classpath this is
  * read-merge-rewrite: existing rows anti-joined against the new keys,
  * unioned with the update, written to a temp dir, then swapped in.
  * At lake scale the same call shape maps onto MERGE INTO of a
  * transactional format; the operator seam (upsert(df, path, keys)) is
  * what the engine commits to.
  */
object ParquetUpsert {
  import org.apache.hadoop.fs.{FileSystem, Path}

  /** Key-based upsert. With `partitionBy` empty the whole target is
    * read-merge-rewritten; with a hive-partitioned target, ONLY the
    * partitions touched by the upsert are rewritten (see
    * [[upsertPartitioned]]) — at 100 TB an upsert touching 0.1% of keys
    * must not rewrite 100% of the table. */
  def upsert(updates: DataFrame, path: String, keys: Seq[String],
      partitionBy: Seq[String] = Seq.empty): Unit = {
    val spark = updates.sparkSession
    val target = new Path(path)
    // resolve the FS from the path itself, not the default scheme — a
    // fully-qualified s3a://... target must not hit the cluster-default FS
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (partitionBy.nonEmpty && fs.exists(target))
      upsertPartitioned(updates, path, keys, partitionBy, fs)
    else {
      val merged =
        if (fs.exists(target)) {
          val existing = spark.read.parquet(path)
          existing.join(updates.select(keys.map(col): _*).distinct(),
              keys, "left_anti")
            .unionByName(updates)
        } else updates
      val tmp = new Path(path + ".upsert-tmp")
      val w = merged.write.mode(SaveMode.Overwrite)
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
        .parquet(tmp.toString)
      swap(fs, tmp, target, new Path(path + ".upsert-old"))
      // the FS-level swap bypasses Spark's write paths, so the session's
      // shared FileStatusCache still lists the PRE-swap files — a
      // subsequent read of the same path would silently see stale data
      spark.catalog.refreshByPath(path)
    }
  }

  /** Partition-pruned rewrite of a hive-partitioned target: the touched
    * set is (partitions holding a matching key) ∪ (partitions the update
    * rows land in) — discovered with a column-pruned semi-join, the same
    * touch scan a metastore-backed MERGE plans. Only those partitions are
    * re-read (partition-pruned scan), merged, rewritten to a temp layout,
    * and swapped dir-by-dir rename-aside; untouched partitions' files are
    * never opened, so they stay byte-identical.
    *
    * Partition values are rendered hive-style (`k=v`); values needing
    * URL-escaping or null partition values are out of scope for this
    * operator (route them through the whole-table path). The
    * multi-partition swap is not atomic — same contract as the
    * reference's non-transactional batch writes. */
  private def upsertPartitioned(updates: DataFrame, path: String,
      keys: Seq[String], partitionBy: Seq[String], fs: FileSystem): Unit = {
    val spark = updates.sparkSession
    val target = new Path(path)
    val existing = spark.read.parquet(path)
    val updKeys = updates.select(keys.map(col): _*).distinct()
    val partCols = partitionBy.map(col)
    // touched partitions: bounded by the update's key spread, collected
    // driver-side like any partition listing (NOT data rows)
    val touched = existing.join(updKeys, keys, "left_semi")
      .select(partCols: _*)
      .unionByName(updates.select(partCols: _*))
      .distinct().collect()
    require(touched.forall(r => (0 until r.length).forall(!r.isNullAt(_))),
      "null partition values are not supported by the pruned upsert path")
    val touchedPred = touched.map { r =>
      partitionBy.zipWithIndex
        .map { case (c, i) => col(c) === lit(r.get(i)) }
        .reduce(_ && _)
    }.reduceOption(_ || _).getOrElse(lit(false))
    val merged = existing.filter(touchedPred) // partition-pruned scan
      .join(updKeys, keys, "left_anti")
      .unionByName(updates)
    val tmp = new Path(path + ".upsert-tmp")
    val old = new Path(path + ".upsert-old")
    fs.delete(tmp, true); fs.delete(old, true)
    merged.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionBy: _*).parquet(tmp.toString)
    touched.foreach { r =>
      val sub = partitionBy.zipWithIndex
        .map { case (c, i) => s"$c=${r.get(i)}" }.mkString("/")
      val tmpSub = new Path(tmp, sub)
      if (fs.exists(tmpSub))
        swap(fs, tmpSub, new Path(target, sub), new Path(old, sub))
      else // every key moved out: the partition is consumed entirely
        fs.delete(new Path(target, sub), true)
    }
    fs.delete(tmp, true); fs.delete(old, true)
    spark.catalog.refreshByPath(path) // invalidate stale file listings
  }

  /** Rename-aside swap: the previous data survives any crash window and
    * is restored if the final rename fails. */
  private[sinks] def swap(fs: FileSystem, tmp: Path, target: Path,
      old: Path): Unit = {
    fs.delete(old, true)
    fs.mkdirs(old.getParent)
    val hadTarget = fs.exists(target)
    if (hadTarget && !fs.rename(target, old))
      throw new java.io.IOException(s"upsert stash failed: $target -> $old")
    fs.mkdirs(target.getParent)
    if (!fs.rename(tmp, target)) {
      if (hadTarget) fs.rename(old, target)
      throw new java.io.IOException(s"upsert rename failed: $tmp -> $target")
    }
    if (hadTarget) fs.delete(old, true)
  }

  /** Pre/Post SQL hooks around a write action (S10,
    * writer/job.go:64-93): statements run driver-side via spark.sql. */
  def withHooks[A](spark: SparkSession, pre: Seq[String], post: Seq[String])
      (body: => A): A = {
    require(!(pre ++ post).exists(_.trim.toLowerCase.startsWith("select")),
      "select not allowed in pre/post sql")
    pre.foreach(spark.sql(_).collect())
    val r = body
    post.foreach(spark.sql(_).collect())
    r
  }
}
