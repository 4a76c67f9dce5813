package graft.sinks

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Minimal versioned parquet table: an immutable commit log of manifest
  * files over immutable data files — the transactional-lake core
  * (snapshot isolation, time travel, optimistic concurrency, vacuum)
  * in its smallest honest form. This is what upgrades the engine's
  * "transactional scan" row (SURVEY §2 S4) from "parquet dirs are
  * naturally consistent" to an actual isolation guarantee:
  *
  *  - data files are write-once under `<root>/data/` with UUID names —
  *    no writer ever mutates or deletes a live file;
  *  - a commit is ONE atomic rename of `<root>/_manifests/vN.json`
  *    (the sorted list of data files in that snapshot). `rename` to an
  *    existing name fails on Hadoop filesystems, so two writers racing
  *    to the same version conflict EXPLICITLY (optimistic concurrency:
  *    the loser retries on the next version);
  *  - readers resolve a manifest once and read exactly its file list:
  *    a snapshot taken before a concurrent commit keeps reading the old
  *    files (they are never overwritten), giving repeatable reads with
  *    zero coordination;
  *  - `vacuum` deletes data files referenced by NO retained manifest —
  *    the only deletion in the design, safely after readers of expired
  *    snapshots are gone (retention is the operator's contract, as in
  *    any log-structured lake format).
  *
  * Deliberately minimal vs a full lake format: single-table JSON-lines
  * manifests (no partition pruning stats, no schema evolution log) —
  * the seam a production format slots into is the same write/read/
  * upsert/vacuum surface.
  */
object VersionedTable {

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String) = new Path(root, "_manifests")
  private def dataDir(root: String) = new Path(root, "data")
  private def manifestPath(root: String, v: Long) =
    new Path(manifestDir(root), f"v$v%012d.json")

  /** All committed versions, ascending (empty for a fresh root). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    if (!f.exists(manifestDir(root))) Seq.empty
    else f.listStatus(manifestDir(root)).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .sorted
  }

  private def readManifest(f: FileSystem, root: String, v: Long)
      : Seq[String] = {
    val in = f.open(manifestPath(root, v))
    try {
      val bytes = new Array[Byte](f.getFileStatus(manifestPath(root, v))
        .getLen.toInt)
      in.readFully(bytes)
      new String(bytes, StandardCharsets.UTF_8).split("\n").toSeq
        .filter(_.nonEmpty)
    } finally in.close()
  }

  /** Snapshot read: pin the (latest or requested) manifest's exact file
    * list. Concurrent commits after this call do not change what this
    * DataFrame reads — its files are immutable. */
  def read(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no committed version under $root")
    val v = version.getOrElse(vs.max)
    require(vs.contains(v), s"version $v not in $vs")
    val files = readManifest(fs(spark, root), root, v)
    if (files.isEmpty)
      spark.read.parquet(root + "/data").limit(0) // empty committed table
    else spark.read.parquet(files: _*)
  }

  /** Write `df` as new data files and commit them as the next version,
    * REPLACING the table's content. Returns the committed version.
    * Retries the commit rename on version races. */
  def write(df: DataFrame, root: String): Long =
    commitRetrying(df.sparkSession, root) { _ => stageFiles(df, root) }

  /** Append: next version = previous file list + newly staged files. */
  def append(df: DataFrame, root: String): Long =
    commitRetrying(df.sparkSession, root) { prev =>
      prev ++ stageFiles(df, root)
    }

  /** Key-based upsert as a commit: merge the update into the latest
    * snapshot (anti-join on keys + union), stage the merged result as
    * fresh files, commit. Old files stay for older snapshots. */
  def upsert(updates: DataFrame, root: String, keys: Seq[String]): Long = {
    val spark = updates.sparkSession
    // merge is (re)computed INSIDE the commit closure: a version race
    // means another writer moved the head, and the merge must re-read
    // THAT snapshot or the concurrent commit's rows would be lost.
    // Reading old files while writing new ones is safe — data files
    // are write-once.
    commitRetrying(spark, root) { _ =>
      val merged =
        if (versions(spark, root).isEmpty) updates
        else read(spark, root)
          .join(updates.select(keys.map(col): _*).distinct(), keys,
            "left_anti")
          .unionByName(updates)
      stageFiles(merged, root)
    }
  }

  /** Delete data files referenced by no retained manifest, and expired
    * manifests themselves. Keeps the newest `keepVersions`. Returns the
    * number of data files deleted. */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int): Int = {
    require(keepVersions >= 1, "must retain at least the latest version")
    val f = fs(spark, root)
    val vs = versions(spark, root)
    val keep = vs.takeRight(keepVersions)
    val live = keep.flatMap(v => readManifest(f, root, v)).toSet
    val dead = f.listStatus(dataDir(root)).toSeq
      .map(_.getPath)
      .filterNot(p => live.contains(p.toString))
    dead.foreach(p => f.delete(p, false))
    vs.dropRight(keepVersions)
      .foreach(v => f.delete(manifestPath(root, v), false))
    dead.size
  }

  /** Stage `df` under data/ as immutable files; return their paths. */
  private def stageFiles(df: DataFrame, root: String): Seq[String] = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    val stage = new Path(root, s".stage-${UUID.randomUUID()}")
    df.write.mode(SaveMode.Overwrite).parquet(stage.toString)
    f.mkdirs(dataDir(root))
    val parts = f.listStatus(stage).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    val moved = parts.map { p =>
      val dst = new Path(dataDir(root), s"${UUID.randomUUID()}.parquet")
      require(f.rename(p, dst), s"stage move failed: $p -> $dst")
      // store FULLY-QUALIFIED uris: vacuum compares against
      // listStatus(), which qualifies — an unqualified manifest path
      // would never match and vacuum would delete live files
      f.makeQualified(dst).toString
    }
    f.delete(stage, true)
    moved
  }

  /** Commit `nextFiles(prevFiles)` as the next version via one atomic
    * manifest rename; on a version race (rename refused because the
    * target exists), recompute against the new head and retry. */
  private def commitRetrying(spark: SparkSession, root: String)
      (nextFiles: Seq[String] => Seq[String]): Long = {
    val f = fs(spark, root)
    f.mkdirs(manifestDir(root))
    var attempts = 0
    while (attempts < 10) {
      attempts += 1
      val vs = versions(spark, root)
      val prev = if (vs.isEmpty) Seq.empty[String]
        else readManifest(f, root, vs.max)
      val files = nextFiles(prev)
      val v = if (vs.isEmpty) 0L else vs.max + 1
      val tmp = new Path(manifestDir(root),
        s".tmp-${UUID.randomUUID()}.json")
      val out = f.create(tmp, false)
      try out.write((files.sorted.mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
      finally out.close()
      // rename-to-existing fails => explicit optimistic-concurrency
      // conflict; loop recomputes against the new head
      if (f.rename(tmp, manifestPath(root, v))) return v
      f.delete(tmp, false)
    }
    throw new IllegalStateException(
      s"commit contention: 10 straight version races under $root")
  }
}
