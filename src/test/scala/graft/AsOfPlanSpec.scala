package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** Native as-of join operator (custom LogicalPlan/Strategy/SparkPlan) vs
  * the composed union+window reference — identical rows on the events
  * fixture and on adversarial edges (no preceding right row, exact-ts
  * ties, multi-row runs, null keys). */
class AsOfPlanSpec extends SparkSpec {
  import spark.implicits._

  private def events = Tables.events(spark, Sf0)
    .withColumn("ts_us", expr("ts div 1000"))

  test("native as-of equals the union+window reference on the fixture") {
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_us")
    val clicks = events.filter($"event_type" === "click")
      .select($"user_id", $"ts_us", $"event_id".as("click_id"), $"value")
    val native = AsOfJoin.asofBackwardNative(purchases, clicks,
      Seq("user_id"), "ts_us", "ts_us", Seq("click_id", "value"))
    val ref = AsOfJoin.asofBackward(purchases, clicks,
      Seq("user_id"), "ts_us", "ts_us", Seq("click_id", "value"))
    val n = native.select(ref.columns.map(col).toSeq: _*)
    assert(n.count() == ref.count() && n.count() > 0)
    assert(n.exceptAll(ref).isEmpty && ref.exceptAll(n).isEmpty)
  }

  test("native as-of plans through AsOfJoinExec with clustered sort") {
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_us")
    val clicks = events.filter($"event_type" === "click")
      .select($"user_id", $"ts_us", $"event_id".as("click_id"))
    val p = AsOfJoin.asofBackwardNative(purchases, clicks,
      Seq("user_id"), "ts_us", "ts_us", Seq("click_id"))
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p) // SparkPlan nodeName strips "Exec"
    assert(p.contains("Sort"), p)
  }

  test("edges: no preceding row, ties match, runs take the latest") {
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"),
        (3L, 7L, "d"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 10L, 100L), (1L, 15L, 101L), (1L, 16L, 102L),
        (2L, 9L, 103L))
      .toDF("k", "t", "rid")
    val out = AsOfJoin.asofBackwardNative(l, r, Seq("k"), "t", "t",
        Seq("rid"))
      .select($"k", $"t", $"asof_rid").as[(Long, Long, Option[Long])]
      .collect().toSet
    assert(out == Set(
      (1L, 10L, Some(100L)), // tie: right.ts == left.ts matches
      (1L, 20L, Some(102L)), // run of rights: latest preceding wins
      (2L, 5L, None),        // right exists for key but only later
      (3L, 7L, None)))       // no right rows for key at all
  }

  test("forward direction == backward over negated ts (tie-preserving)") {
    // backward matches rTs <= lTs; negating both sides flips it to
    // rTs >= lTs with ties preserved — exactly forward. Property-checked
    // on the full fixture.
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_us")
    val clicks = events.filter($"event_type" === "click")
      .select($"user_id", $"ts_us", $"event_id".as("click_id"))
    val fwd = AsOfJoin.asofNative(purchases, clicks,
      Seq("user_id"), "ts_us", "ts_us", Seq("click_id"),
      direction = "forward")
    val negP = purchases.withColumn("ts_us", -$"ts_us")
    val negC = clicks.withColumn("ts_us", -$"ts_us")
    val viaNeg = AsOfJoin.asofNative(negP, negC,
        Seq("user_id"), "ts_us", "ts_us", Seq("click_id"))
      .withColumn("ts_us", -$"ts_us")
      .select(fwd.columns.map(col).toSeq: _*)
    assert(fwd.count() == purchases.count())
    assert(fwd.exceptAll(viaNeg).isEmpty && viaNeg.exceptAll(fwd).isEmpty)
    // and it genuinely matches something
    assert(fwd.filter($"asof_click_id".isNotNull).count() > 0)
  }

  test("tolerance nulls out matches beyond the gap, both directions") {
    val l = Seq((1L, 100L, "a"), (1L, 200L, "b")).toDF("k", "t", "tag")
    val r = Seq((1L, 95L, 900L), (1L, 210L, 901L)).toDF("k", "t", "rid")
    def run(dir: String, tol: Option[Long]) =
      AsOfJoin.asofNative(l, r, Seq("k"), "t", "t", Seq("rid"), dir, tol)
        .select($"t", $"asof_rid").as[(Long, Option[Long])].collect().toMap
    // backward: t=100 -> 95 (gap 5), t=200 -> 95 (gap 105)
    assert(run("backward", None) ==
      Map(100L -> Some(900L), 200L -> Some(900L)))
    assert(run("backward", Some(10L)) ==
      Map(100L -> Some(900L), 200L -> None))
    // forward: t=100 -> 210 (gap 110), t=200 -> 210 (gap 10)
    assert(run("forward", None) ==
      Map(100L -> Some(901L), 200L -> Some(901L)))
    assert(run("forward", Some(10L)) ==
      Map(100L -> None, 200L -> Some(901L)))
    // validation
    intercept[IllegalArgumentException](
      AsOfJoin.asofNative(l, r, Seq("k"), "t", "t", Seq("rid"), "sideways"))
    intercept[IllegalArgumentException](
      AsOfJoin.asofNative(l, r, Seq("k"), "t", "t", Seq("rid"),
        tolerance = Some(-1L)))
  }

  test("multi-column keys and null keys group like the window form") {
    val l = Seq((Some(1L), "x", 10L), (None: Option[Long], "x", 10L))
      .toDF("k1", "k2", "t")
    val r = Seq((Some(1L), "x", 5L, 7L), (None: Option[Long], "x", 6L, 8L))
      .toDF("k1", "k2", "t", "rid")
    val native = AsOfJoin.asofBackwardNative(l, r, Seq("k1", "k2"),
      "t", "t", Seq("rid"))
    val ref = AsOfJoin.asofBackward(l, r, Seq("k1", "k2"),
      "t", "t", Seq("rid"))
    val n = native.select(ref.columns.map(col).toSeq: _*)
    assert(n.exceptAll(ref).isEmpty && ref.exceptAll(n).isEmpty)
    // null key carries the null-key right row (window-partition semantics)
    assert(native.filter($"k1".isNull).select($"asof_rid")
      .as[Option[Long]].head().contains(8L))
  }

  test("nearest: closer side wins, ties go backward, tolerance nulls, " +
      "direction column pins the choice") {
    val left = Seq((1L, 100L), (2L, 205L), (3L, 300L), (4L, 900L))
      .toDF("lid", "ts")
    val right = Seq((10L, 90L), (11L, 104L), (12L, 210L), (13L, 200L),
      (14L, 290L), (15L, 310L)).toDF("rid", "ts")
    val out = AsOfJoin.asofNearestNative(left, right, Seq.empty,
        "ts", "ts", Seq("rid"), tolerance = Some(50L))
      .select($"lid", $"asof_rid", $"asof_direction")
      .as[(Long, Option[Long], Option[String])].collect()
      .sortBy(_._1).toSeq
    assert(out == Seq(
      // 100: backward 90 (d=10) vs forward 104 (d=4) -> forward
      (1L, Some(11L), Some("forward")),
      // 205: backward 200 (d=5) vs forward 210 (d=5) -> tie: backward
      (2L, Some(13L), Some("backward")),
      // 300: backward 290 (d=10) vs forward 310 (d=10) -> tie: backward
      (3L, Some(14L), Some("backward")),
      // 900: nothing within 50 either way
      (4L, None, None)))
    // keyed variant matches a brute-force nearest on the events shape
    val l2 = Seq((1L, "a", 10L), (2L, "a", 25L), (3L, "b", 10L))
      .toDF("lid", "k", "ts")
    val r2 = Seq(("a", 8L, 100L), ("a", 24L, 101L), ("b", 40L, 102L))
      .toDF("k", "ts", "rid")
    val g2 = AsOfJoin.asofNearestNative(l2, r2, Seq("k"), "ts", "ts",
        Seq("rid"))
      .select($"lid", $"asof_rid").as[(Long, Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(g2 == Seq((1L, Some(100L)), (2L, Some(101L)),
      (3L, Some(102L))))
  }
}
