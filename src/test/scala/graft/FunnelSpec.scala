package graft

import graft.operators.Funnel
import org.apache.spark.sql.functions._

/** Pins the strict sequential-funnel semantics on a hand-built log:
  * strictly-after stage matching, the window anchored at stage 0, and
  * earliest-match selection. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val stages = Seq("view", "click", "buy")

  private def log(rows: (Long, String, Long)*) =
    rows.toDF("uid", "etype", "us")

  test("stage i must be strictly after stage i-1's match") {
    // user 1: click at the same instant as the view -> not a conversion;
    // user 2: click 1us later -> converts
    val ev = log((1L, "view", 100L), (1L, "click", 100L),
      (2L, "view", 100L), (2L, "click", 101L))
    val r = Funnel.report(ev, "uid", "etype", col("us"), stages, 1000L)
      .orderBy("stage_idx").as[(Int, String, Long)].collect().toSeq
    assert(r == Seq((0, "view", 2L), (1, "click", 1L), (2, "buy", 0L)))
  }

  test("window is anchored at the stage-0 match, not the previous stage") {
    // view@0, click@90, buy@150 with window 100: the buy is inside 100 of
    // the CLICK but outside 100 of the VIEW -> stage 2 not reached
    val ev = log((1L, "view", 0L), (1L, "click", 90L), (1L, "buy", 150L))
    val r = Funnel.report(ev, "uid", "etype", col("us"), stages, 100L)
      .orderBy("stage_idx").as[(Int, String, Long)].collect().toSeq
    assert(r == Seq((0, "view", 1L), (1, "click", 1L), (2, "buy", 0L)))
  }

  test("earliest qualifying event is matched per stage") {
    // the EARLIEST view anchors the window even when a later view would
    // let the funnel complete: view@0 (click@5 buy@300 miss window 200),
    // view@250 ignored as anchor
    val ev = log((1L, "view", 0L), (1L, "view", 250L),
      (1L, "click", 5L), (1L, "buy", 300L))
    val frames = Funnel.stageFrames(ev, "uid", "etype", col("us"),
      stages, 200L)
    val c = frames(1).select($"uid", $"t0", $"t1")
      .as[(Long, Long, Long)].collect().toSeq
    assert(c == Seq((1L, 0L, 5L)))
    assert(frames(2).isEmpty)
  }
}
