package graft

import graft.functions.FixedLog
import graft.operators.SequenceModel
import org.apache.spark.sql.functions._

/** Markov sequence-anomaly semantics: hand-computed surprisal on a tiny
  * corpus, the anomalous-path-ranks-first property, and exact
  * partitioning invariance (the fixed-point arithmetic contract). */
class SequenceModelSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, String)], k: Int = 10)
      : Seq[(Long, Long, Long, Long)] =
    SequenceModel.sequenceAnomaly(
        rows.toDF("u", "t", "ty"),
        col("u"), col("t"), col("t"), col("ty"), k)
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("hand-checked surprisal on a two-user corpus") {
    // user 1: a -> b; user 2: a -> c. Model: START->a twice; a->b and
    // a->c once each. Every transition's surprisal: START rows
    // log2(2/2) = 0; a-rows log2(2/1) = 2^20. Both users: n_trans = 2,
    // total = 2^20, avg = 2^19.
    val out = run(Seq((1L, 1L, "a"), (1L, 2L, "b"),
      (2L, 1L, "a"), (2L, 2L, "c")))
    val f = 1L << FixedLog.FracBits
    assert(out == Seq((1L, 2L, f, f / 2), (2L, 2L, f, f / 2)))
  }

  test("the rare path outranks the common one") {
    // 9 users walk a->b->c; 1 user walks a->c->b (rare transitions)
    val common = (1L to 9L).flatMap(u =>
      Seq((u, 1L, "a"), (u, 2L, "b"), (u, 3L, "c")))
    val rare = Seq((100L, 1L, "a"), (100L, 2L, "c"), (100L, 3L, "b"))
    val out = run(common ++ rare, k = 3)
    assert(out.head._1 == 100L, s"rare path must rank first: $out")
    // rare user's mean surprisal strictly above every common user's
    assert(out.tail.forall(_._4 < out.head._4))
  }

  test("bit-identical under repartitioning; k cuts deterministically") {
    val rows = (1L to 40L).flatMap { u =>
      val path = if (u % 7 == 0) Seq("x", "z", "x") else Seq("x", "y", "x")
      path.zipWithIndex.map { case (t, i) => (u, i.toLong, t) }
    }
    val a = run(rows, k = 5)
    val b = SequenceModel.sequenceAnomaly(
        rows.toDF("u", "t", "ty").repartition(13),
        col("u"), col("t"), col("t"), col("ty"), 5)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.size == 5)
    // the z-walkers (7, 14, 21, 28, 35) are exactly the top 5
    assert(a.map(_._1).toSet == Set(7L, 14L, 21L, 28L, 35L))
  }

  test("single-event users still score (the START transition)") {
    val out = run(Seq((1L, 1L, "a"), (2L, 1L, "b")))
    assert(out.map(x => (x._1, x._2)).toSet == Set((1L, 1L), (2L, 1L)))
  }
}
