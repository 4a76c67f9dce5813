package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

/** SQL function registration (both seams) + salted-join equivalence. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions evaluate through spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  vec_dot_long(array(2L, 3L), array(5L, 7L)) AS dl,
        |  word_shingles('a b c d', 2) AS sh,
        |  word_shingle_hashes('a b c d', 2) AS shh""".stripMargin).head
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == 31L)
    assert(r.getSeq[String](2) == Seq("a b", "b c", "c d"))
    assert(r.getSeq[Long](3).length == 3)
    // hash parity with the built-in xxhash64 over the same strings
    val x = spark.sql(
      "SELECT word_shingle_hashes('a b c', 2)[0] = xxhash64('a b') AS ok")
      .head.getBoolean(0)
    assert(x)
    // a BPE merge pass from pure SQL, literal pair args enforced
    val bm = spark.sql(
      "SELECT bpe_merge(array('l','o','w','</w>'), 'l', 'o') AS m")
      .head.getSeq[String](0)
    assert(bm == Seq("lo", "w", "</w>"))
    // the bounded-heap top-k aggregate works from pure SQL too
    val tk = spark.sql(
      """SELECT topk_by(s, i, 2) AS top FROM VALUES
        |  (1.0D, 10L), (3.0D, 20L), (2.0D, 30L) AS t(s, i)""".stripMargin)
      .head.getSeq[org.apache.spark.sql.Row](0)
    assert(tk.map(r => (r.getDouble(0), r.getLong(1))) ==
      Seq((3.0, 20L), (2.0, 30L)))
    // sketch functions compose with the shingle hashes in pure SQL and
    // match the DataFrame-side operator results
    val s = spark.sql(
      """SELECT minhash_signature(word_shingle_hashes('a b c d e', 3), 16)
        |    AS sig,
        |  simhash64(word_shingle_hashes('a b c d e', 1)) AS sh""".stripMargin)
      .head
    assert(s.getSeq[Long](0).length == 16)
    val expectSh = graft.operators.Dedup.simhashes(
        Seq((1L, "a b c d e")).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .select($"sh").as[Long].head()
    assert(s.getLong(1) == expectSh)
    // hilbert_index from pure SQL: order-1 curve visits the 2x2 grid
    // in the canonical (0,0)->(0,1)->(1,1)->(1,0) order
    val hb = spark.sql(
      """SELECT hilbert_index(0L, 0L, 1), hilbert_index(0L, 1L, 1),
        |  hilbert_index(1L, 1L, 1), hilbert_index(1L, 0L, 1)"""
        .stripMargin).head
    assert((0 to 3).map(hb.getLong) == Seq(0L, 1L, 2L, 3L))
    // md5_u32 matches the composed conv/substring form, all 4 windows
    val mu = spark.sql(
      """SELECT md5_u32('abc', 0) = CAST(conv(substring(md5('abc'), 1, 8),
        |    16, 10) AS BIGINT) AS w0,
        |  md5_u32('abc', 3) = CAST(conv(substring(md5('abc'), 25, 8),
        |    16, 10) AS BIGINT) AS w3,
        |  size(md5_pois4('seed#0')) AS np""".stripMargin).head
    assert(mu.getBoolean(0) && mu.getBoolean(1) && mu.getInt(2) == 4)
    // vec_maxsim_long: 2 sub-vectors of dim 1 — max picks the best
    // element per query token: 3*5 + 4*5 = 35
    val ms = spark.sql(
      "SELECT vec_maxsim_long(array(3L, 4L), array(2L, 5L), 2) AS s")
      .head.getLong(0)
    assert(ms == 35L)
  }

  test("extensions entry point applies the same function list") {
    // injectFunction path (what spark.sql.extensions invokes at build time)
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("non-literal shingle width is rejected") {
    GraftFunctions.register(spark)
    intercept[Exception] {
      spark.sql("SELECT word_shingles('a b c', length('xx'))").collect()
    }
  }

  test("optimizer rule rewrites HOF dot products to native expressions") {
    import graft.functions.{DotProductRewrite, FloatVectorDot, LongVectorDot}
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    val hofD = df.select(aggregate(
      zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (s, v) => s + v).as("d"))
    val rewD = DotProductRewrite(hofD.queryExecution.analyzed)
    assert(rewD.expressions.exists(_.exists(_.isInstanceOf[FloatVectorDot])))

    val dfl = Seq((Seq(1L, 2L), Seq(3L, 4L))).toDF("a", "b")
    val hofL = dfl.select(aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0L), (s, v) => s + v).as("d"))
    val rewL = DotProductRewrite(hofL.queryExecution.analyzed)
    assert(rewL.expressions.exists(_.exists(_.isInstanceOf[LongVectorDot])))

    // not a dot product (subtract-merge): untouched
    val neg = df.select(aggregate(
      zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (s, v) => s - v).as("d"))
    val rewN = DotProductRewrite(neg.queryExecution.analyzed)
    assert(!rewN.expressions.exists(_.exists(_.isInstanceOf[FloatVectorDot])))
  }

  test("salted join is row-identical to the plain join") {
    val li = Tables.lineitem(spark, Sf0).withColumnRenamed("l_orderkey", "okey")
    val ord = Tables.orders(spark, Sf0).withColumnRenamed("o_orderkey", "okey")
    val salted = SkewJoin.saltedJoin(li, ord, "okey", salt = 4)
      .select($"okey", $"l_linenumber", $"o_custkey")
    val plain = li.join(ord, "okey")
      .select($"okey", $"l_linenumber", $"o_custkey")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join rejects join types it cannot preserve") {
    val fact = Seq((1, "a")).toDF("k", "v")
    val dim = Seq((1, "x")).toDF("k", "w")
    // right/full-outer would emit null-extended rows for unmatched replicas
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(fact, dim, "k", salt = 4, joinType = "right")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(fact, dim, "k", salt = 4, joinType = "full_outer")
    }
  }

  test("SQL functions reject wrong arity with a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1.0D))").collect()
    }
    assert(e.getMessage.contains("2 arguments") ||
      Option(e.getCause).exists(_.getMessage.contains("2 arguments")))
  }

  test("salted left join keeps unmatched fact rows exactly once") {
    val fact = Seq((1, "a"), (2, "b"), (99, "nomatch")).toDF("k", "v")
    val dim = Seq((1, "x"), (2, "y")).toDF("k", "w")
    val out = SkewJoin.saltedJoin(fact, dim, "k", salt = 3, joinType = "left")
    assert(out.count() == 3)
    assert(out.filter($"k" === 99 && $"w".isNull).count() == 1)
  }

  test("TimeScalePushdown: rewritten bounds agree on every edge case") {
    // NTZ timestamps at consecutive micros; nanos literals probe every
    // floor/ceil boundary (k*1000 - 1, exact, +1) under each operator.
    // The rule registers via the normalizeEventTs seam; semantics must
    // match direct long arithmetic on micros*1000.
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(
        graft.functions.TimeScalePushdown))
      exp.extraOptimizations =
        exp.extraOptimizations :+ graft.functions.TimeScalePushdown
    val baseUs = 1704067200000000L // 2024-01-01 00:00:00 UTC in micros
    val micros = (-3L to 3L).map(baseUs + _)
    val df = micros.toDF("us")
      .selectExpr("timestamp_micros(us) AS tstz", "us")
      .selectExpr("CAST(tstz AS TIMESTAMP_NTZ) AS ts", "us")
      .withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000"))
    for {
      delta <- Seq(-1L, 0L, 1L, 999L)
      op <- Seq(">=", ">", "<", "<=", "=")
    } {
      val lim = baseUs * 1000L + delta
      val got = df.filter(expr(s"ts $op $lim")).select("us")
        .as[Long].collect().toSet
      val want = micros.filter { m =>
        val n = m * 1000L
        op match {
          case ">=" => n >= lim; case ">" => n > lim
          case "<" => n < lim; case "<=" => n <= lim
          case _ => n == lim
        }
      }.toSet
      assert(got == want, s"op=$op delta=$delta")
    }
  }
}
