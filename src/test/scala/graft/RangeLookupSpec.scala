package graft

import graft.functions.RangeLookupIdx
import graft.operators.RangeDim
import org.apache.spark.sql.functions._

class RangeLookupSpec extends SparkSpec {
  import spark.implicits._

  test("expression: inclusive bounds, gaps and out-of-range are NULL") {
    val los = lit(Array(0L, 10L, 100L))
    val his = lit(Array(4L, 19L, 200L))
    val got = Seq(-1L, 0L, 4L, 5L, 10L, 19L, 99L, 100L, 200L, 201L)
      .toDF("x")
      .select(col("x"), RangeLookupIdx(col("x"), los, his).as("i"))
      .as[(Long, Option[Int])].collect().toMap
    assert(got == Map(-1L -> None, 0L -> Some(0), 4L -> Some(0),
      5L -> None, 10L -> Some(1), 19L -> Some(1), 99L -> None,
      100L -> Some(2), 200L -> Some(2), 201L -> None))
  }

  test("expression: double mode") {
    val i = Seq(2.5d).toDF("x")
      .select(RangeLookupIdx(col("x"),
        lit(Array(0.0, 2.0)), lit(Array(1.5, 3.5))).as("i"))
      .as[Option[Int]].collect().head
    assert(i == Some(1))
  }

  test("lookupJoin: payloads attach, unmatched rows keep NULL") {
    val dim = Seq((0L, 4L, "lo", 1L), (10L, 14L, "hi", 2L))
      .toDF("lo", "hi", "band", "rank")
    val out = RangeDim.lookupJoin(
      Seq(0L, 4L, 7L, 12L).toDF("v"), dim, col("v"),
      "lo", "hi", Seq("band", "rank"))
      .as[(Long, Option[String], Option[Long])].collect().toSet
    assert(out == Set((0L, Some("lo"), Some(1L)), (4L, Some("lo"), Some(1L)),
      (7L, None, None), (12L, Some("hi"), Some(2L))))
  }

  test("lookupJoin: overlapping intervals and mixed bound types refuse") {
    val overlapping = Seq((0L, 10L, "a"), (5L, 20L, "b"))
      .toDF("lo", "hi", "l")
    intercept[IllegalArgumentException] {
      RangeDim.lookupJoin(Seq(1L).toDF("v"), overlapping, col("v"),
        "lo", "hi", Seq("l"))
    }
    val mixed = Seq((0L, 1.5d, "a")).toDF("lo", "hi", "l")
    intercept[IllegalArgumentException] {
      RangeDim.lookupJoin(Seq(1L).toDF("v"), mixed, col("v"),
        "lo", "hi", Seq("l"))
    }
  }
}
