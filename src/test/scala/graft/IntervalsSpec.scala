package graft

import graft.operators.Intervals
import org.apache.spark.sql.functions._

/** Pins the interval-coalescing sweep (operators.Intervals) against the
  * sequential union-of-intervals definition: randomized parity with a
  * single-threaded merge, inclusive-touching semantics, per-key
  * independence, and exact invariance to input partitioning (the window
  * sort, not arrival order, defines the sweep). */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  /** sequential reference merge (inclusive-touching) */
  private def brute(iv: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
    val sorted = iv.sortBy(identity)
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    for ((s, e) <- sorted) {
      if (out.nonEmpty && s <= out.last._2)
        out(out.length - 1) =
          (out.last._1, math.max(out.last._2, e), out.last._3 + 1)
      else out += ((s, e, 1L))
    }
    out.toSeq
  }

  private def run(iv: Seq[(Long, Long)], parts: Int = 7)
      : Seq[(Long, Long, Long)] =
    Intervals.merge(
        iv.map { case (s, e) => ("k", s, e) }.toDF("k", "s", "e")
          .repartition(parts),
        Seq("k"), col("s"), col("e"))
      .select("span_start", "span_end", "n_rows")
      .as[(Long, Long, Long)].collect().sortBy(identity).toSeq

  test("randomized parity with the sequential merge") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 5) {
      val iv = Seq.fill(200) {
        val s = rnd.nextInt(1000).toLong
        (s, s + rnd.nextInt(30).toLong)
      }
      assert(run(iv) == brute(iv), s"trial=$trial")
    }
  }

  test("touching intervals merge; gapped ones do not") {
    // [0,10] touches [10,20] -> one span; [21,30] is 1 apart -> its own
    assert(run(Seq((0L, 10L), (10L, 20L), (21L, 30L))) ==
      Seq((0L, 20L, 2L), (21L, 30L, 1L)))
  }

  test("keys merge independently") {
    val df = Seq(("a", 0L, 10L), ("b", 5L, 15L)).toDF("k", "s", "e")
    val out = Intervals.merge(df, Seq("k"), col("s"), col("e"))
      .select("k", "span_start", "span_end")
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(("a", 0L, 10L), ("b", 5L, 15L)))
  }

  test("partitioning does not change the result") {
    val rnd = new scala.util.Random(11)
    val iv = Seq.fill(300) {
      val s = rnd.nextInt(500).toLong
      (s, s + rnd.nextInt(40).toLong)
    }
    assert(run(iv, parts = 1) == run(iv, parts = 13))
  }

  test("null endpoints are dropped, not merged") {
    val df = Seq((Some(1L), Some(5L)), (None, Some(9L)), (Some(2L), None))
      .map { case (s, e) => ("k", s, e) }.toDF("k", "s", "e")
    val out = Intervals.merge(df, Seq("k"), col("s"), col("e"))
      .select("span_start", "span_end", "n_rows")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 5L, 1L)))
  }
}
