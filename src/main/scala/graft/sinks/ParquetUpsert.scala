package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

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

  def upsert(updates: DataFrame, path: String, keys: Seq[String]): Unit = {
    val spark = updates.sparkSession
    val target = new org.apache.hadoop.fs.Path(path)
    // resolve the FS from the path itself, not the default scheme — a
    // fully-qualified s3a://... target must not hit the cluster-default FS
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (fs.exists(target)) {
        val existing = spark.read.parquet(path)
        existing.join(updates.select(keys.map(col): _*).distinct(),
            keys, "left_anti")
          .unionByName(updates)
      } else updates
    val tmp = new org.apache.hadoop.fs.Path(path + ".upsert-tmp")
    val old = new org.apache.hadoop.fs.Path(path + ".upsert-old")
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // swap via rename-aside: the previous data survives any crash window
    // and is restored if the final rename fails
    fs.delete(old, true)
    val hadTarget = fs.exists(target)
    if (hadTarget && !fs.rename(target, old))
      throw new java.io.IOException(s"upsert stash failed: $target -> $old")
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
