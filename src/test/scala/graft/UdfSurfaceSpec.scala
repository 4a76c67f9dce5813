package graft

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** The user-extension surface (SURVEY.md §2.12): scalar UDF registration,
  * typed Aggregator UDAF, and flatMap/explode as the UDTF shape — the
  * reference has no user-extensible functions, so this is the engine's
  * capability superset, exercised end-to-end. */
object UdfSurfaceSpec {
  /** Typed UDAF: sum of squares (the building block agg_stats_exact uses
    * through decimal columns, here as a reusable Aggregator). */
  object SumSq extends Aggregator[Double, Double, Double] {
    def zero: Double = 0.0
    def reduce(b: Double, a: Double): Double = b + a * a
    def merge(x: Double, y: Double): Double = x + y
    def finish(r: Double): Double = r
    def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}

class UdfSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("scalar UDF registers and runs in SQL and the DSL") {
    spark.udf.register("ascii_sum",
      (s: String) => s.map(_.toInt).sum)
    Tables.documents(spark, Sf0).createOrReplaceTempView("docs_udf")
    val viaSql = spark.sql(
      "SELECT SUM(ascii_sum(lang)) AS t FROM docs_udf").head.getLong(0)
    val viaDsl = Tables.documents(spark, Sf0)
      .select(call_udf("ascii_sum", $"lang").as("a"))
      .agg(sum($"a")).head.getLong(0)
    assert(viaSql == viaDsl && viaSql > 0)
  }

  test("typed Aggregator UDAF matches the expression form") {
    val sumsq = udaf(UdfSurfaceSpec.SumSq)
    spark.udf.register("sumsq", sumsq)
    val li = Tables.lineitem(spark, Sf0)
    val got = li.agg(sumsq($"l_quantity")).head.getDouble(0)
    val expect = li.agg(sum($"l_quantity" * $"l_quantity")).head.getDouble(0)
    assert(math.abs(got - expect) / expect < 1e-9)
  }

  test("flatMap/explode covers the UDTF shape") {
    val exploded = Tables.documents(spark, Sf0)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
    val typed = Tables.documents(spark, Sf0)
      .select($"doc_id", $"text").as[(Long, String)]
      .flatMap { case (id, t) => t.split(" ").map(w => (id, w)) }
      .toDF("doc_id", "token")
    assert(exploded.count() == typed.count())
  }

  test("approx_count_distinct lands within rsd of the exact count") {
    // the gate now carries the bound check itself (exact counts + flags);
    // assert every flag fired and the exact counts agree with a direct
    // countDistinct — the estimate-vs-exact distance IS the flag contract
    val df = SparkEntry.queries("agg_approx_distinct")(spark, Sf0)
    val rows = df.select($"l_returnflag", $"exact_orders",
        $"orders_within_15pct", $"parts_within_3pct")
      .as[(String, Long, Int, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, fo, fp) => assert(fo == 1 && fp == 1) }
    val exact = Tables.lineitem(spark, Sf0).groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("eo"))
      .as[(String, Long)].collect().toMap
    rows.foreach { case (flag, eo, _, _) => assert(exact(flag) == eo) }
  }
}
