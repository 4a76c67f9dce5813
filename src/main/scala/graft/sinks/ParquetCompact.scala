package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for parquet targets — the maintenance operator
  * every incrementally-written table needs: appends, streaming
  * micro-batches, and upserts accumulate files far below rowgroup size,
  * and at 100 TB scan cost becomes file-open overhead instead of IO.
  *
  * Each leaf directory (the table itself, or each hive partition dir) is
  * independently rewritten into ceil(bytes / targetFileBytes) files and
  * swapped in with the same rename-aside protocol as [[ParquetUpsert]].
  * Directories already at or below the target file count are NOT touched
  * (their files stay byte-identical), so compaction is idempotent and
  * partition-pruned by construction. Data content is unchanged — only
  * file layout. */
object ParquetCompact {

  /** Compact `path` (plain or hive-partitioned parquet). Returns the
    * number of leaf directories rewritten. */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L << 20): Int = {
    require(targetFileBytes > 0)
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"no such table dir: $path")

    def isData(p: Path): Boolean =
      p.getName.endsWith(".parquet") && !p.getName.startsWith("_") &&
        !p.getName.startsWith(".")

    // leaf dirs holding parquet files (the table root, or each k=v dir)
    def leafDirs(p: Path): Seq[Path] = {
      val st = fs.listStatus(p)
        .filterNot(s => s.getPath.getName.startsWith("_") ||
          s.getPath.getName.startsWith("."))
      val here =
        if (st.exists(s => s.isFile && isData(s.getPath))) Seq(p) else Nil
      here ++ st.filter(_.isDirectory).flatMap(s => leafDirs(s.getPath))
    }

    val rootUri = root.toUri.getPath
    var rewritten = 0
    leafDirs(root).foreach { dir =>
      val dataFiles = fs.listStatus(dir)
        .filter(s => s.isFile && isData(s.getPath))
      val bytes = dataFiles.map(_.getLen).sum
      val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
        .toInt
      if (n < dataFiles.length) {
        // reading the leaf dir directly yields only the file columns —
        // partition values live in the dir name and stay there
        val df = spark.read.parquet(dir.toString)
        val rel = dir.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
        val suffix = if (rel.isEmpty) "" else "/" + rel
        val tmp = new Path(path + ".compact-tmp" + suffix)
        val old = new Path(path + ".compact-old" + suffix)
        df.repartition(n).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        ParquetUpsert.swap(fs, tmp, dir, old)
        rewritten += 1
      }
    }
    fs.delete(new Path(path + ".compact-tmp"), true)
    fs.delete(new Path(path + ".compact-old"), true)
    if (rewritten > 0) // FS-level swaps bypass Spark's listing cache
      spark.catalog.refreshByPath(path)
    rewritten
  }
}
