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

  private def knScore(docs: Seq[(Long, String)]) =
    TextAnalysis.kneserNeyScore(docs.toDF("doc_id", "text"), "doc_id",
      col("text")).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("Kneser-Ney matches brute-force exact arithmetic") {
    val docs = (1L to 40L).map(i =>
      (i, s"w${i % 5} w${(i * 3) % 5} w${(i * 7) % 5} w${i % 3} end"))
    // brute-force the model in BigInt
    val bgsByDoc = docs.map { case (id, t) =>
      id -> t.split(" ").toSeq.sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1))).toSeq
    }.toMap
    val all = bgsByDoc.values.flatten.toSeq
    val c2 = all.groupBy(identity).map { case (k, v) =>
      k -> BigInt(v.size) }
    val c1 = c2.groupBy(_._1._1).map { case (w1, m) =>
      w1 -> m.values.sum }
    val n1p = c2.groupBy(_._1._1).map { case (w1, m) =>
      w1 -> BigInt(m.size) }
    val nc = c2.groupBy(_._1._2).map { case (w2, m) =>
      w2 -> BigInt(m.size) }
    val t = BigInt(c2.size)
    def fp(bg: (String, String)): BigInt = {
      val seen = (4 * c2(bg) - 3).max(0)
      (seen * t + 3 * n1p(bg._1) * nc(bg._2)) * BigInt(1 << 20) /
        (4 * c1(bg._1) * t)
    }
    val got = knScore(docs)
    docs.foreach { case (id, _) =>
      val exp = bgsByDoc(id).map(fp).sum
      assert(got(id) == ((bgsByDoc(id).size.toLong, exp.toLong)),
        s"doc $id: expected $exp got ${got(id)}")
    }
  }

  test("Kneser-Ney demotes the 'Francisco' pattern the Laplace LM " +
      "cannot see") {
    // two probe bigrams with IDENTICAL seen statistics (c2=2, c1=2,
    // n1p=1) differing only in the continuation count of the second
    // word: p follows only a (nc=1), q follows b/c/d/e (nc=4). The
    // discounted seen parts tie exactly, so the ordering is decided by
    // the continuation mass d*n1p/c1 * nc/T — the Francisco effect.
    val corpus = Seq(
      (1L, "a p"), (2L, "a p"),
      (3L, "b q"), (4L, "b q"),
      (5L, "c q"), (6L, "d q"), (7L, "e q"))
    val m = knScore(corpus)
    val knRare = m(1L)._2 // "a p": nc(p)=1
    val knDiverse = m(3L)._2 // "b q": nc(q)=4
    assert(knDiverse > knRare,
      s"diverse-continuation $knDiverse should outscore $knRare")
    // and the Laplace scorer cannot separate them: same c2, same c1
    val lap = score(corpus)
    assert(lap(1L)._2 == lap(3L)._2)
  }

  test("kneserNeyScore is partition-invariant and zero on short docs") {
    val docs = (1L to 50L).map(i =>
      (i, if (i % 10 == 0) "solo" else s"a${i % 4} b${(i * 3) % 4} c"))
    val a = knScore(docs)
    val b = TextAnalysis.kneserNeyScore(
      docs.toDF("doc_id", "text").repartition(13), "doc_id", col("text"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(a == b)
    assert(a(10L) == ((0L, 0L)))
  }

  test("naive Bayes: planted vocabularies classify perfectly; ties " +
      "break to the smaller class; partition-invariant scores") {
    // two classes with disjoint vocabularies; ids chosen so the md5
    // bucket puts a healthy sample in test bucket 0
    val docs = (0L until 200L).map { i =>
      val cls = if (i % 2 == 0) "alpha" else "beta"
      val word = if (i % 2 == 0) s"apple a${i % 7}" else s"zebra z${i % 7}"
      (i, s"$word $word common", cls)
    }
    def run(parts: Int) = TextAnalysis.naiveBayes(
        docs.toDF("doc_id", "text", "lang").repartition(parts),
        col("doc_id"), col("text"), col("lang"))
      .select("doc_id", "true_cls", "pred_cls", "score_fp", "correct")
      .as[(Long, String, String, Long, Long)].collect().sortBy(_._1)
    val out = run(1)
    assert(out.nonEmpty)
    // disjoint vocab -> every test doc classified correctly
    assert(out.forall(_._5 == 1L), out.filter(_._5 == 0L).take(3).toSeq)
    assert(run(11).toSeq == out.toSeq)
    // degenerate doc whose tokens are ALL unseen: score reduces to
    // prior - T*denom per class; with balanced priors the tie on
    // score_fp is impossible here (denoms differ) but the argmax must
    // still be deterministic — rerun twice, same prediction
    val plus = docs :+ ((1000L, "qqq www eee", "alpha"))
    val p1 = TextAnalysis.naiveBayes(
        plus.toDF("doc_id", "text", "lang"), col("doc_id"), col("text"),
        col("lang")).where(col("doc_id") === 1000L)
      .select("pred_cls").as[String].collect().toSeq
    val p2 = TextAnalysis.naiveBayes(
        plus.toDF("doc_id", "text", "lang").repartition(5), col("doc_id"),
        col("text"), col("lang")).where(col("doc_id") === 1000L)
      .select("pred_cls").as[String].collect().toSeq
    assert(p1 == p2)
  }

  test("mattr: interval-analytic form equals brute-force windows, " +
      "short docs omitted, partition-invariant") {
    def bruteMattr(text: String, w: Int): Option[(Long, Long)] = {
      val toks = text.split(" ")
      if (toks.length < w) None
      else {
        val num = (0 to toks.length - w)
          .map(i => toks.slice(i, i + w).distinct.length.toLong).sum
        Some((num, w.toLong * (toks.length - w + 1)))
      }
    }
    val docs = Seq(
      (1L, "a b c d e f"), // all distinct
      (2L, "a a a a a a"), // one type
      (3L, "a b a b a b a"), // period-2 repetition
      (4L, "a b c a b c d e a b"), // mixed
      (5L, "x y"), // shorter than w -> omitted
      (6L, (1 to 40).map(i => s"t${i % 7}").mkString(" ")))
    val w = 4
    def run(parts: Int) = TextAnalysis.mattr(
        docs.toDF("doc_id", "text").repartition(parts),
        col("doc_id"), col("text"), w)
      .select("id", "mattr_num", "mattr_den")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val got = run(1)
    val expect = docs.flatMap { case (id, t) =>
      bruteMattr(t, w).map(id -> _)
    }.toMap
    assert(got == expect)
    assert(!got.contains(5L))
    assert(run(7) == got)
  }
}
