package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: derive a larger scale factor from an existing fixture dir by
  * replication — for scale-CURVE smokes (sf0.1 -> sf1) of the expensive
  * dedup/ANN/lake queries, where the interesting number is the SLOPE of
  * runtime vs data size, not absolute runtime.
  *
  * Replication preserves the data's similarity structure instead of
  * inflating it: naive copies would make every document an exact dup of
  * its 9 replicas (dedup pair counts grow ~factor^2, clusters fuse) and
  * every vector its own nearest neighbor 9 times over. So each replica i:
  *  - documents: every token is prefixed `r{i}_`, making replica shingle
  *    spaces DISJOINT — within-replica near-dup structure is identical to
  *    the source, cross-replica Jaccard is 0, token counts and length
  *    distribution stay proportional (replica 0 is the verbatim source);
  *  - embeddings: a small deterministic per-(id, replica, dim) hash noise
  *    rotates each replica copy a few degrees away, so replicas are near
  *    but not exact neighbors — the corpus grows `factor`x while the
  *    query set (vec_id < NQueries) stays the replica-0 originals.
  *
  * Usage: runMain graft.tools.ScaleFixtures <srcDir> <dstDir> [factor]
  */
object ScaleFixtures {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    require(factor >= 1, s"factor: $factor")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-scale-fixtures")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nDocs = docs.count()
    val docCopies = (0 until factor).map { i =>
      if (i == 0) docs
      else docs.select(
        (col("doc_id") + lit(i.toLong * nDocs)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"r${i}_$$1").as("text"),
        col("lang"), col("source"),
        length(regexp_replace(col("text"), "(\\S+)", s"r${i}_$$1"))
          .cast("long").as("n_chars"))
    }
    docCopies.reduce(_ unionByName _)
      .repartition(16)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val nEmb = emb.count()
    val embCopies = (0 until factor).map { i =>
      if (i == 0) emb
      else emb.select(
        (col("vec_id") + lit(i.toLong * nEmb)).as("vec_id"),
        transform(col("embedding"), (x, j) =>
          // never-firing coalesce keeps element nullability FALSE so the
          // native-dot rewrite stays eligible on the replicated fixture
          coalesce(x + ((pmod(xxhash64(col("vec_id"), lit(i), j), lit(1000))
              .cast("double") / 1000.0 - 0.5) * 0.05).cast("float"),
            lit(0.0f))).as("embedding"),
        col("label"))
    }
    embCopies.reduce(_ unionByName _)
      .repartition(16)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    println(s"[scale-fixtures] $dst: documents=${nDocs * factor} " +
      s"embeddings=${nEmb * factor} (factor $factor from $src)")
    spark.stop()
  }
}
