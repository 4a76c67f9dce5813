package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Three tiers, all shuffle-bounded:
  *  - [[cosine]]/[[bruteForceTopK]]: exact double-precision cosine; the
  *    top-k per query is a window over the (query x candidate) join — only
  *    viable when one side is small enough to broadcast (the classic
  *    "score a query batch against the corpus" shape).
  *  - [[cosineExactDecimal]]: decimal-arithmetic cosine whose result is
  *    bit-identical regardless of evaluation order/engine — used by the
  *    correctness oracle.
  *  - [[lshTopK]]: sign-random-projection LSH — candidates only from
  *    matching hash buckets (shuffle on bucket key), then exact re-rank.
  *    The 100 TB path: bucket fan-out is data-independent and the
  *    all-pairs join never materializes.
  */
object Similarity {

  /** Exact cosine in double precision (fast path; whole-stage codegen). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val na = aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v)
    val nb = aggregate(transform(b, x => x * x), lit(0.0), (acc, v) => acc + v)
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Order-independent exact cosine via integer quantization: each float
    * element maps to round(x * 1e8) as a long — both engines compute the
    * identical double product and round it identically, so the quantized
    * vectors are bit-equal — then dot/norms are exact int64 sums (bounded
    * by dim * (4e7)^2 << 2^63) and only the final division runs in double.
    * Bit-identical across engines and evaluation orders. (Decimal casts of
    * floats are NOT portable: DuckDB's REAL->DECIMAL works in float
    * precision, and its shortest-repr VARCHAR path rounds differently than
    * Spark's full-precision double repr.) */
  def cosineExactDecimal(a: Column, b: Column): Column = {
    def q(c: Column) = round(c.cast("double") * lit(1e8)).cast("long")
    val dot = aggregate(zip_with(a, b, (x, y) => q(x) * q(y)), lit(0L), _ + _)
    val na = aggregate(transform(a, x => q(x) * q(x)), lit(0L), _ + _)
    val nb = aggregate(transform(b, x => q(x) * q(x)), lit(0L), _ + _)
    dot.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))
  }

  /** Brute-force top-k neighbors for each row of `queries` against
    * `corpus`. `queries` is broadcast (it is the small side by contract). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      sim: (Column, Column) => Column = cosine): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_emb"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", sim(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
  }

  /** Sign-random-projection bucket id: `bits` hyperplanes drawn from a
    * deterministic seed; bucket = sign pattern as an int. */
  def srpBucket(emb: Column, dim: Int, bits: Int, seed: Long = 42L): Column = {
    val rng = new scala.util.Random(seed)
    val planes = Array.fill(bits, dim)(rng.nextGaussian())
    val bitCols = (0 until bits).map { b =>
      val proj = (0 until dim).map(i =>
        element_at(emb, i + 1) * lit(planes(b)(i))).reduce(_ + _)
      when(proj >= 0, lit(1 << b)).otherwise(lit(0))
    }
    bitCols.reduce((x, y) => x.bitwiseOR(y))
  }

  /** LSH-bucketed approximate top-k: queries join candidates only within
    * matching SRP buckets (multi-probe via `tables` independent
    * hashtables), then exact cosine re-rank. Recall grows with `tables`;
    * compare against [[bruteForceTopK]] in the spec. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      bits: Int = 8, tables: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, idAlias: String, embAlias: String,
        bucketAlias: String) = {
      val buckets = array((0 until tables).map(t =>
        struct(lit(t).as("tbl"),
          srpBucket(col("embedding"), dim, bits, 42L + t).as("bkt"))): _*)
      df.select(col("vec_id").as(idAlias), col("embedding").as(embAlias),
        explode(buckets).as(bucketAlias))
    }
    val q = bucketed(queries, "query_id", "q_emb", "q_bucket")
    val c = bucketed(corpus, "neighbor_id", "c_emb", "c_bucket")
    val cand = c.join(broadcast(q),
        col("c_bucket") === col("q_bucket") &&
          col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("q_emb"), col("c_emb"))
      .distinct()
      .withColumn("cos_sim", cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
  }
}
