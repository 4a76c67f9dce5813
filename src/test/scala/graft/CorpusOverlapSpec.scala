package graft

import graft.operators.CorpusOverlap
import org.apache.spark.sql.functions._

/** Pins the cross-source overlap matrix: exact set algebra on planted
  * corpora, absent empty intersections, null hygiene, and partition
  * invariance of the integer counts. */
class CorpusOverlapSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    ("a", "one two three four"),      // shingles: {1-2-3, 2-3-4}
    ("a", "one two three five"),      // + {1-2-3(dup), 2-3-5}
    ("b", "one two three four"),      // b shares both of a's first doc
    ("b", "nine eight seven six"),
    ("c", "totally disjoint words here"),
    ("d", null.asInstanceOf[String]),
    (null.asInstanceOf[String], "one two three four"))
    .toDF("source", "text")

  test("exact intersection/union per pair; empty overlaps absent") {
    val out = CorpusOverlap
      .pairwiseShingleOverlap(corpus, $"source", $"text", n = 3)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    // a: {o-t-t, t-t-four, t-t-five} = 3; b: {o-t-t, t-t-four, n-e-s,
    // e-s-s} = 4; common = 2; union = 5. c overlaps nothing -> absent.
    assert(out == Set(("a", "b", 3L, 4L, 2L, 5L)))
  }

  test("null text and null source rows are excluded, not crashed on") {
    val onlyNulls = Seq((null.asInstanceOf[String], "x y z w"),
      ("s", null.asInstanceOf[String])).toDF("source", "text")
    assert(CorpusOverlap
      .pairwiseShingleOverlap(onlyNulls, $"source", $"text", 3).isEmpty)
  }

  test("counts are partition-invariant") {
    val a = CorpusOverlap
      .pairwiseShingleOverlap(corpus, $"source", $"text", 3)
      .orderBy($"src_a", $"src_b").collect().toSeq
    val b = CorpusOverlap
      .pairwiseShingleOverlap(corpus.repartition(7), $"source", $"text", 3)
      .orderBy($"src_a", $"src_b").collect().toSeq
    assert(a == b)
  }
}
