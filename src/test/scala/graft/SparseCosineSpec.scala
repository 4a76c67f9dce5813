package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Pins TextAnalysis.sparseCosinePairs: the division-free threshold rule
  * (tauDen^2*num^2 >= tauNum^2*n2a*n2b on exact integers), the idf
  * weighting (w = tf * (scale div df)), the maxDf stop-term prune, and
  * partition invariance of the integer evidence columns. */
class SparseCosineSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(docs: Seq[(Long, String)], tauNum: Int = 9,
      tauDen: Int = 10, maxDf: Long = 400, parts: Int = 1) =
    TextAnalysis.sparseCosinePairs(
        docs.toDF("doc_id", "text").repartition(parts), "doc_id",
        col("text"), tauNum, tauDen, maxDf)
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq

  test("identical documents pair with cosine exactly 1") {
    val out = pairs(Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta")))
    assert(out.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    val (_, _, num, n2a, n2b) = out.head
    assert(num == n2a && n2a == n2b) // w-vectors equal -> dot == both norms
  }

  test("integer evidence matches the hand formula") {
    // corpus: d1="a a b", d2="a b", d3="c" ; scale=100, maxDf large
    // df(a)=2, df(b)=2, df(c)=1 -> idf(a)=idf(b)=100 div 2=50, idf(c)=100
    // w1 = {a:2*50=100, b:50}; w2 = {a:50, b:50}
    // num(1,2) = 100*50 + 50*50 = 7500; n2(1)=12500; n2(2)=5000
    // cos^2 = 7500^2/(12500*5000) = 0.9 -> passes tau=0.9 (cos~0.9487)
    val out = pairs(Seq((1L, "a a b"), (2L, "a b"), (3L, "c")),
      tauNum = 9, tauDen = 10, maxDf = 10)
    // recompute with scale=100 via the public signature
    val out100 = TextAnalysis.sparseCosinePairs(
        Seq((1L, "a a b"), (2L, "a b"), (3L, "c")).toDF("doc_id", "text"),
        "doc_id", col("text"), 9, 10, 10, scale = 100L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out100 == Seq((1L, 2L, 7500L, 12500L, 5000L)))
    assert(out.map(p => (p._1, p._2)) == Seq((1L, 2L))) // default scale agrees
  }

  test("threshold is exact: cos^2 exactly tau^2 passes, just under fails") {
    // same corpus: cos^2(1,2) = 0.9 exactly -> >= passes at tau^2=0.9
    val at = TextAnalysis.sparseCosinePairs(
        Seq((1L, "a a b"), (2L, "a b")).toDF("doc_id", "text"),
        "doc_id", col("text"), 9486832, 10000000, 10, scale = 100L)
      .count() // tau = 0.9486832 < sqrt(0.9)=0.94868329... -> passes
    val over = TextAnalysis.sparseCosinePairs(
        Seq((1L, "a a b"), (2L, "a b")).toDF("doc_id", "text"),
        "doc_id", col("text"), 9486833, 10000000, 10, scale = 100L)
      .count() // tau just above sqrt(0.9) -> fails
    assert(at == 1L && over == 0L)
  }

  test("maxDf prunes hot terms from both scoring and candidates") {
    // "the" appears in all 5 docs; with maxDf=4 the only shared term of
    // (1,2) is pruned, so no candidate pair survives at all
    val docs = Seq((1L, "the x"), (2L, "the y"), (3L, "the z"),
      (4L, "the w"), (5L, "the v"))
    assert(pairs(docs, maxDf = 4).isEmpty)
    // with maxDf=5 the hot term is admitted and all C(5,2) pairs share it
    // (cos ~= 0.0385: the unique terms dominate the norms, so clear the
    // threshold far below it to see every candidate)
    assert(pairs(docs, tauNum = 1, tauDen = 100, maxDf = 5).size == 10)
  }

  test("partition invariance of the evidence columns") {
    val docs = (1L to 40L).map(i =>
      i -> s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 11}")
    assert(pairs(docs, tauNum = 1, tauDen = 2, parts = 1) ==
      pairs(docs, tauNum = 1, tauDen = 2, parts = 13))
  }
}
