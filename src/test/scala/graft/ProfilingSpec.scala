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
}
