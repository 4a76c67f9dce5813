package graft

import graft.operators.{Profiling, TextAnalysis}
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("keySkew: summary ratios and heavy-key order are exact") {
    // key 1 x6, key 2 x2, keys 3..6 x1 -> 12 rows, 6 keys, avg 2
    val rows = Seq.fill(6)(1L) ++ Seq.fill(2)(2L) ++ (3L to 6L)
    val p = Profiling.keySkew(rows.toDF("k"), col("k"), topK = 3)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(p.map(r => (r._1, r._2)) == Seq((1L, 6L), (2L, 2L), (3L, 1L)))
    // every row carries the same summary: n_rows, n_keys, max, avg, skew
    assert(p.map(r => (r._3, r._4, r._5, r._6, r._7)).distinct ==
      Seq((12L, 6L, 6L, 2L, 3000L)))
  }

  test("histogramDrift: full-outer buckets, zero fill, abs diff") {
    val a = Seq(1.0, 2.0, 11.0, 26.0).toDF("v") // buckets 0,0,1,2
    val b = Seq(3.0, 31.0, 33.0, 47.0).toDF("v") // buckets 0,3,3,4
    val got = Profiling.histogramDrift(a, b, col("v"), width = 10.0)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 2L, 1L, 1L), (1L, 1L, 0L, 1L),
      (2L, 1L, 0L, 1L), (3L, 0L, 2L, 2L), (4L, 0L, 1L, 1L)))
  }

  test("rankByTerms: rare terms dominate, ties break by id") {
    val docs = Seq(
      (1L, "rare common common"), // rare hit + 2 common
      (2L, "common common common"), // 3 common
      (3L, "rare rare"), // 2 rare hits
      (4L, "common"), (5L, "common"), (6L, "noise only")
    ).toDF("doc_id", "text")
    // df(rare)=2, df(common)=4; w(rare)=S/2, w(common)=S/4
    val s = TextAnalysis.IdfScale
    val top = TextAnalysis.rankByTerms(docs, "doc_id", col("text"),
      Seq("rare", "common"), k = 4).as[(Long, Long)].collect().toSeq
    assert(top == Seq(
      (1L, s / 2 + 2 * (s / 4)), // one rare + two common = 1e9, id tie-win
      (3L, 2 * (s / 2)), // two rare = 1e9
      (2L, 3 * (s / 4)), // three common
      (4L, s / 4))) // single common; doc 5 identical score, id cut
  }

  test("columnProfile: nulls, distincts, stringified bounds per column") {
    val df = Seq(
      (Some(1L), Some("b")), (Some(2L), None),
      (Some(2L), Some("a")), (None, Some("a"))
    ).toDF("k", "s")
    val rows = Profiling.columnProfile(df, Seq("k", "s"))
      .as[(String, Long, Long, Long, String, String)]
      .collect().sortBy(_._1).toSeq
    assert(rows == Seq(
      // COUNT(DISTINCT) excludes nulls; min/max ignore nulls too
      ("k", 4L, 1L, 2L, "1", "2"),
      ("s", 4L, 1L, 2L, "a", "b")))
  }

  test("columnProfile: unknown column is rejected loudly") {
    val df = Seq((1L, "x")).toDF("k", "s")
    intercept[IllegalArgumentException] {
      Profiling.columnProfile(df, Seq("k", "nope"))
    }
  }

  test("equiDepthHistogram: Bresenham-even buckets, exact bounds") {
    // 10 rows into 4 buckets -> sizes 3,2,3,2 (rid*4 div 10), bounds
    // follow the (v, id) total order
    val df = (1L to 10L).map(i => (i * 10, i)).toDF("v", "id")
    val got = Profiling.equiDepthHistogram(df, col("v"), Seq("id"), 4)
      .orderBy("bucket").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 3L, 10L, 30L), (1L, 2L, 40L, 50L),
      (2L, 3L, 60L, 80L), (3L, 2L, 90L, 100L)))
    // duplicate values split deterministically by the tiebreaker
    val dup = Seq.fill(6)(7L).zipWithIndex.map { case (v, i) => (v, i.toLong) }
      .toDF("v", "id")
    val sizes = Profiling.equiDepthHistogram(dup, col("v"), Seq("id"), 3)
      .orderBy("bucket").select("n_rows").as[Long].collect().toSeq
    assert(sizes == Seq(2L, 2L, 2L))
  }

  test("fdAudit: held and violated dependencies, worst-group count") {
    val df = Seq(
      (1L, "a", "x"), (1L, "a", "x"), // k=1 -> a only (holds)
      (2L, "a", "x"), (2L, "b", "x"), (2L, "c", "x"), // k=2 -> 3 variants
      (3L, "a", "y")).toDF("k", "v", "w")
    val got = Profiling.fdAudit(df, Seq("k" -> "v", "k" -> "w"))
      .orderBy("lhs_col", "rhs_col")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("k", "v", 3L, 1L, 3L), ("k", "w", 3L, 0L, 1L)))
  }

  test("chi2Association: uniform table has zero contributions") {
    // perfectly independent 2x2 with equal counts: expected == observed
    val df = (for { a <- Seq("p", "q"); b <- Seq(0L, 1L); _ <- 1 to 5 }
      yield (a, b)).toDF("x", "y")
    val got = Profiling.chi2Association(df, col("x"), col("y"))
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got.size == 4)
    assert(got.forall(r => r._3 == 5L && r._4 == 5.0 && r._5 == 0.0))
  }

  test("chi2Association: contributions recover the textbook statistic") {
    // 2x2 table [[10, 20], [30, 40]]: chi2 = N*(ad-bc)^2/(r1*r2*c1*c2)
    val rows = Seq.fill(10)(("a", 0L)) ++ Seq.fill(20)(("a", 1L)) ++
      Seq.fill(30)(("b", 0L)) ++ Seq.fill(40)(("b", 1L))
    val contribs = Profiling.chi2Association(rows.toDF("x", "y"),
        col("x"), col("y"))
      .select("contrib").as[Double].collect()
    val n = 100.0
    val expected = n * math.pow(10.0 * 40 - 20.0 * 30, 2) /
      (30.0 * 70.0 * 40.0 * 60.0)
    assert(math.abs(contribs.sum - expected) < 1e-9)
  }

  test("prefixSum equals the sequential scan, any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = (1L to 5000L).map(i => ((i * 37) % 1000, i))
    val expect = rows.sortBy(r => (r._1, r._2))
      .scanLeft(0L)((a, r) => a + r._1).tail
    for (np <- Seq(1, 13)) {
      val df = rows.toDF("v", "id").repartition(np)
      val got = graft.operators.Ids
        .prefixSum(df, Seq(col("v"), col("id")), col("v"), "cum")
        .orderBy("v", "id").select("cum").as[Long].collect().toSeq
      assert(got == expect, s"np=$np")
    }
  }

  test("prefixSum on decimals stays exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1 to 100).map(i => (i.toLong, s"$i.25"))
      .toDF("id", "s")
      .select(col("id"), col("s").cast("decimal(12,4)").as("v"))
    val last = graft.operators.Ids
      .prefixSum(df, Seq(col("id")), col("v"), "cum")
      .orderBy(col("id").desc).select("cum").limit(1)
      .collect()(0).getDecimal(0)
    // sum of (i + 0.25) for 1..100 = 5050 + 25
    assert(last.compareTo(new java.math.BigDecimal("5075.00")) == 0)
  }

  test("correlationPairs: planted linear pair, constants null, " +
      "complete-case n, one scan for all pairs") {
    val rows = (1 to 50).map { i =>
      val x = i.toDouble
      (x, 2.0 * x + 1.0, 5.0,
        if (i == 50) null.asInstanceOf[java.lang.Double]
        else java.lang.Double.valueOf((i % 7).toDouble))
    }
    val df = rows.toDF("x", "y", "c", "z")
    val out = Profiling.correlationPairs(df,
        Seq("x" -> col("x"), "y" -> col("y"), "c" -> col("c"),
          "z" -> col("z")))
      .orderBy("col_a", "col_b").collect()
    assert(out.length == 6)
    // complete-case: the one null z row drops from EVERY pair
    assert(out.forall(_.getLong(2) == 49L))
    val xy = out.find(r => r.getString(0) == "x" && r.getString(1) == "y")
      .get
    assert(math.abs(xy.getDouble(3) - 1.0) < 1e-12)
    // constant column: null corr against everything
    out.filter(r => r.getString(0) == "c" || r.getString(1) == "c")
      .foreach(r => assert(r.isNullAt(3), s"constant pair $r"))
    // symmetric sanity: corr(x,z) finite and in [-1,1]
    val xz = out.find(r => r.getString(0) == "x" && r.getString(1) == "z")
      .get
    assert(math.abs(xz.getDouble(3)) <= 1.0)
  }

  test("exactBucket: every bucket holds n/k rows (+-1), order respected") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1L to 103L).map(i => ((i * 7919) % 103, i)).toDF("v", "id")
    val b = graft.operators.Profiling
      .exactBucket(df, col("v"), Seq(col("id")), 5, "bucket")
    val sizes = b.groupBy("bucket").count().orderBy("bucket")
      .as[(Long, Long)].collect().toSeq
    assert(sizes.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(sizes.map(_._2).forall(c => c >= 20 && c <= 21))
    // bucket is monotone in v (ties broken by id)
    val rows = b.orderBy("v", "id").select("bucket").as[Long].collect()
    assert(rows.sameElements(rows.sorted))
  }

  test("contentDigest: order/partition-invariant, detects row swaps " +
      "and NULL-vs-empty") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1L to 500L)
      .map(i => (s"g${i % 3}", i, if (i % 7 == 0) null else s"v$i"))
      .toDF("g", "id", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Profiling.contentDigest(d, col("g"),
          Seq(col("id"), col("v")))
        .orderBy("grp").collect().map(_.toSeq).toSeq
    val a = run(df)
    assert(a == run(df.repartition(13).sortWithinPartitions("v")))
    // swapping one row's group must change BOTH groups' digests
    // (id 3 lives in g0 = 3 % 3; move it to g1)
    val swapped = df.withColumn("g",
      when(col("id") === 3L, "g1").otherwise(col("g")))
    val b = run(swapped)
    assert(a(0) != b(0) && a(1) != b(1) && a(2) == b(2))
    // NULL and '' are different content
    val empt = df.withColumn("v",
      when(col("v").isNull, "").otherwise(col("v")))
    assert(a != run(empt))
  }

  test("gTestUniform: exactly 0 on a perfectly uniform spread, " +
      "positive on skew, partition-invariant integers") {
    import spark.implicits._
    // 24 buckets x 5 each: O*24 = N for every cell -> every log term 0
    val uni = (0 until 120).map(i => ("k", (i % 24).toLong))
      .toDF("k", "b")
    val u = Profiling.gTestUniform(uni, col("k"), col("b"), 24, "k")
      .select("n_events", "n_buckets_hit", "g_num_fp", "g_stat")
      .as[(Long, Long, Long, Double)].head()
    assert(u == ((120L, 24L, 0L, 0.0)))
    // all mass in one bucket: G = 2*N*ln(24) — g_num_fp = N * L(24*N) -
    // N*L(N) = N * (L(24N) - L(N)) ~ N * log2(24) * 2^20
    val skew = (0 until 120).map(_ => ("k", 0L)).toDF("k", "b")
    val s = Profiling.gTestUniform(skew, col("k"), col("b"), 24, "k")
      .select("n_buckets_hit", "g_num_fp", "g_stat")
      .as[(Long, Long, Double)].head()
    assert(s._1 == 1L && s._2 > 0L)
    // 2*120*ln(24) = 762.7...; fixed-point truncation < 1e-3 here
    assert(math.abs(s._3 - 2.0 * 120.0 * math.log(24)) < 1e-2, s.toString)
    val rep = Profiling.gTestUniform(
        ((0 until 120).map(i => ("k", (i % 3).toLong)))
          .toDF("k", "b").repartition(13), col("k"), col("b"), 24, "k")
      .select("g_num_fp").as[Long].head()
    val one = Profiling.gTestUniform(
        ((0 until 120).map(i => ("k", (i % 3).toLong))).toDF("k", "b"),
        col("k"), col("b"), 24, "k")
      .select("g_num_fp").as[Long].head()
    assert(rep == one && rep > 0L)
  }
}
