package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** Native FloatVectorDot vs the interpreted HOF reference — identical
  * values (same left-to-right double accumulation) through both the
  * codegen and interpreted (eval) paths. */
class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, Sf0).limit(50).cache()

  test("vec_dot equals the zip_with/aggregate reference bit-for-bit") {
    val hof = aggregate(zip_with($"a", $"b",
      (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (s, v) => s + v)
    val pairs = emb.select($"embedding".as("a"))
      .crossJoin(emb.select($"embedding".as("b")).limit(10))
    val diff = pairs.select((vec_dot($"a", $"b") - hof).as("d"))
      .filter($"d" =!= 0.0).count()
    assert(diff == 0)
  }

  test("float x double-literal dot works (SRP planes path)") {
    val plane = Seq.fill(64)(0.5)
    val r = emb.select(vec_dot($"embedding", typedlit(plane)).as("p"),
      (aggregate(transform($"embedding", x => x.cast("double")),
        lit(0.0), (s, v) => s + v) * 0.5).as("expect"))
    assert(r.filter(abs($"p" - $"expect") > 1e-12).count() == 0)
  }

  test("null array -> null; interpreted eval path agrees") {
    val df = Seq((Some(Seq(1.0f, 2.0f)), None: Option[Seq[Float]]))
      .toDF("a", "b")
    assert(df.select(vec_dot($"a", $"b")).head.isNullAt(0))
    // force interpreted eval via Literal.create + expression eval
    val e = graft.functions.FloatVectorDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0f, 2.0f, 3.0f),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(2.0, 3.0, 4.0),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) == (1.0 * 2 + 2.0 * 3 + 3.0 * 4))
  }

  test("vec_dot_long equals the zip_with/aggregate reference exactly") {
    val q = transform($"embedding",
      x => round(x.cast("double") * lit(1e8)).cast("long"))
    val qa = emb.select(q.as("a"))
    val pairs = qa.crossJoin(emb.select(q.as("b")).limit(10))
    val hof = aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0L), (s, v) => s + v)
    val diff = pairs.select((vec_dot_long($"a", $"b") - hof).as("d"))
      .filter($"d" =!= 0L).count()
    assert(diff == 0)
    // interpreted eval path
    val e = graft.functions.LongVectorDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(2L, 3L, 5L),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(7L, 11L, 13L),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)))
    assert(e.eval(null) == (2L * 7 + 3L * 11 + 5L * 13))
    assert(!graft.functions.LongVectorDot(
      org.apache.spark.sql.catalyst.expressions.Literal(1),
      org.apache.spark.sql.catalyst.expressions.Literal(2))
      .checkInputDataTypes().isSuccess)
  }

  test("type check rejects non-array inputs") {
    val bad = graft.functions.FloatVectorDot(
      org.apache.spark.sql.catalyst.expressions.Literal(1),
      org.apache.spark.sql.catalyst.expressions.Literal(2))
    assert(!bad.checkInputDataTypes().isSuccess)
  }
  test("set_intersect_count equals size(array_intersect) on random longs") {
    // random arrays WITH duplicates and unsorted order: the expression
    // promises exactly |distinct(a) n distinct(b)|, i.e. what
    // size(array_intersect(a, b)) computes for null-free arrays
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { _ =>
      def arr() = Seq.fill(rnd.nextInt(60))(rnd.nextInt(40).toLong)
      (arr(), arr())
    }
    val df = rows.toDF("a", "b")
    val bad = df.select(
        set_intersect_count($"a", $"b").as("fast"),
        size(array_intersect($"a", $"b")).cast("long").as("ref"))
      .filter($"fast" =!= $"ref").count()
    assert(bad == 0)
  }

  test("set_intersect_count sorted fast path agrees with unsorted") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 100).map { _ =>
      def arr() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(30).toLong)
      (arr(), arr())
    }
    val df = rows.toDF("a", "b")
    val bad = df.select(
        set_intersect_count(sort_array($"a"), sort_array($"b")).as("s"),
        set_intersect_count($"a", $"b").as("u"))
      .filter($"s" =!= $"u").count()
    assert(bad == 0)
  }

  test("set_intersect_count null input -> null; empty -> 0") {
    val df = Seq((Some(Seq(1L, 2L)), None: Option[Seq[Long]]))
      .toDF("a", "b")
    assert(df.select(set_intersect_count($"a", $"b")).head.isNullAt(0))
    val e = Seq((Seq.empty[Long], Seq(1L, 2L))).toDF("a", "b")
    assert(e.select(set_intersect_count($"a", $"b")).head.getLong(0) == 0L)
  }

  test("set_intersect_count: a null ELEMENT fails loud (r11)") {
    // getLong on a null slot would silently read 0; the operator must
    // throw instead (size(array_intersect) semantics differ on nulls)
    val df = Seq((Seq(Some(1L), None, Some(3L)), Seq(Some(1L), Some(3L))))
      .toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(set_intersect_count($"a", $"b")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => Option(c.getMessage)
        .exists(_.contains("null array element"))),
      s"expected loud null-element failure, got: $ex")
  }

}
