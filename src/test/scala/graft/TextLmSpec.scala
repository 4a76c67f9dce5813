package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Pins the fixed-point bigram LM scorer (TextAnalysis.bigramLmScore):
  * scoring direction (in-distribution text above out-of-distribution),
  * the n_bigrams accounting, short-doc handling, and partitioning
  * invariance of the integer score. */
class TextLmSpec extends SparkSpec {
  import spark.implicits._

  private def score(docs: Seq[(Long, String)]) =
    TextAnalysis.bigramLmScore(docs.toDF("doc_id", "text"), "doc_id",
      col("text")).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("repeated in-distribution transitions outscore a unique sequence") {
    // docs 1-3 share the transition "the cat"; doc 4 is one-off gibberish
    val m = score(Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "the cat hid"),
      (4L, "zq xv bn")))
    val avg1 = m(1L)._2.toDouble / m(1L)._1
    val avg4 = m(4L)._2.toDouble / m(4L)._1
    assert(avg1 > avg4)
  }

  test("docs with fewer than two tokens get n_bigrams 0, score 0") {
    val m = score(Seq((1L, "solo"), (2L, ""), (3L, "a b")))
    assert(m(1L) == ((0L, 0L)) && m(2L) == ((0L, 0L)))
    assert(m(3L)._1 == 1L && m(3L)._2 > 0L)
  }

  test("score matches the hand formula on a tiny corpus") {
    // corpus: "a b", "a b", "a c" -> V=3; c1(a)=3
    // bigram "a b": c2=2 -> floor(2e9 / (3+3)) = 333333333
    // bigram "a c": c2=1 -> floor(1e9 / 6)     = 166666666
    val m = score(Seq((1L, "a b"), (2L, "a b"), (3L, "a c")))
    assert(m(1L) == ((1L, 333333333L)))
    assert(m(2L) == ((1L, 333333333L)))
    assert(m(3L) == ((1L, 166666666L)))
  }

  test("integer score is invariant to input partitioning") {
    val docs = (1L to 60L).map(i =>
      (i, s"tok${i % 7} tok${(i * 3) % 7} tok${(i * 5) % 7} end"))
    val a = score(docs)
    val b = TextAnalysis.bigramLmScore(
      docs.toDF("doc_id", "text").repartition(17), "doc_id", col("text"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(a == b)
  }
}
