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

  test("random logs: counts non-increasing and exact vs reference cascade") {
    // transparent single-node reference of the strict cascade
    def ref(ev: Seq[(Long, String, Long)], w: Long): Seq[Long] = {
      val byUser = ev.groupBy(_._1)
      def stageTimes(u: Long): List[Long] = {
        val es = byUser(u)
        val t0 = es.filter(_._2 == stages.head).map(_._3).minOption
        t0.fold(List.empty[Long]) { anchor =>
          stages.tail.foldLeft(List(anchor)) { (acc, st) =>
            if (acc.size < stages.indexOf(st)) acc
            else es.filter(e => e._2 == st && e._3 > acc.last &&
                e._3 <= acc.head + w)
              .map(_._3).minOption.fold(acc)(t => acc :+ t)
          }
        }
      }
      val times = byUser.keys.toSeq.map(stageTimes)
      stages.indices.map(i => times.count(_.size >= i + 1).toLong)
    }
    val evGen = org.scalacheck.Gen.listOf(for {
      u <- org.scalacheck.Gen.chooseNum(1L, 5L)
      t <- org.scalacheck.Gen.oneOf(stages :+ "noise")
      ts <- org.scalacheck.Gen.chooseNum(0L, 50L)
    } yield (u, t, ts))
    (0 until 6).foreach { _ =>
      evGen.sample.filter(_.nonEmpty).foreach { ev =>
        val got = Funnel.report(log(ev: _*), "uid", "etype", col("us"),
            stages, 20L)
          .orderBy("stage_idx").as[(Int, String, Long)]
          .collect().map(_._3).toSeq
        assert(got == ref(ev, 20L), s"log: $ev")
        got.sliding(2).foreach {
          case Seq(a, b) => assert(b <= a, "funnel must be monotone")
          case _ =>
        }
      }
    }
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

  test("topPaths: first-k order respected, short journeys kept as " +
      "prefixes, count ties broken by path") {
    // users 1,2 walk view>click>buy; user 3 walks view>click (short);
    // user 4 walks click>view (different order, same multiset)
    val ev = log(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "buy", 30L),
      (2L, "view", 1L), (2L, "click", 2L), (2L, "buy", 3L),
      (3L, "view", 5L), (3L, "click", 9L),
      (4L, "click", 5L), (4L, "view", 9L))
    val out = Funnel.topPaths(ev, "uid", "etype",
        Seq($"us", $"uid"), steps = 5, k = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("view>click>buy", 3L, 2L),
      ("click>view", 2L, 1L),
      ("view>click", 2L, 1L)))
    // steps=2 truncates user 1/2's journeys into user 3's path
    val cut = Funnel.topPaths(ev, "uid", "etype",
        Seq($"us", $"uid"), steps = 2, k = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(cut == Seq(("view>click", 2L, 3L), ("click>view", 2L, 1L)))
  }
}
