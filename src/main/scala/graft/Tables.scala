package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Mirrors the reference's "source-owned schema" stance
  * (/root/reference/database/table.go:229-233 — schemas are probed, never
  * declared): we read whatever the parquet footer says and normalize with
  * [[graft.sources.SchemaNormalize]] when needed.
  */
object Tables {
  /** Session conf every graft session must carry: when events.parquet
    * holds TIMESTAMP(NANOS) (fixture generations vary), Spark only reads
    * it as a raw epoch-nanos long under this flag (queries then do exact
    * integer arithmetic on nanos). Set at session BUILD (Verify/Bench/
    * SparkSpec apply it) — loaders are side-effect-free. */
  val RequiredConf: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** The whole query surface treats `ts` as an epoch-NANOS long (exact
    * integer time arithmetic; `ts div 1000` = micros everywhere, matching
    * DuckDB's epoch_us over the same file). Fixture generations differ in
    * the physical type — TIMESTAMP(NANOS) (read as long under
    * RequiredConf) vs timestamp[us] (read as TIMESTAMP_NTZ) — so
    * normalize to the nanos long here: micros*1000 is exact, and with the
    * session pinned to UTC the NTZ->TZ cast is the identity on the
    * underlying micros. Applies to batch and streaming frames alike. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ =>
        // the normalization makes every downstream ts range predicate an
        // expression filter the parquet source can't translate — register
        // the monotone-rewrite rule so they still push (same lazy seam
        // as the as-of/interval strategies)
        val exp = df.sparkSession.experimental
        if (!exp.extraOptimizations.contains(
            graft.functions.TimeScalePushdown))
          exp.extraOptimizations =
            exp.extraOptimizations :+ graft.functions.TimeScalePushdown
        df.withColumn("ts",
          org.apache.spark.sql.functions.unix_micros(
            org.apache.spark.sql.functions.col("ts").cast("timestamp")) *
            1000L)
    }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every fixture table as a temp view (for spark.sql passthrough —
    * the Spark-native analogue of the reference's querySql entry point,
    * /root/reference/database/dbms/reader/parameter.go:94-101). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
