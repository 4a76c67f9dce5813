package graft

import graft.operators.IntervalJoin
import org.apache.spark.sql.functions._

/** Native interval-join sweep operator (custom LogicalPlan/Strategy/
  * SparkPlan) vs the composed equi-join-with-residual reference —
  * identical row multisets on the events fixture (inner and outer) and
  * on adversarial edges (inclusive bounds, ties, null timestamps, keys
  * with no partner rows). */
class IntervalPlanSpec extends SparkSpec {
  import spark.implicits._

  private def events = Tables.events(spark, Sf0)
    .withColumn("ts_us", expr("ts div 1000"))

  private val HourUs = 3600000000L

  test("native interval join equals the composed residual join (inner)") {
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_us")
    val clicks = events.filter($"event_type" === "click")
      .select($"user_id", $"ts_us", $"event_id".as("click_id"))
    val native = IntervalJoin.intervalJoinNative(purchases, clicks,
      Seq("user_id"), "ts_us", "ts_us", Seq("click_id"), HourUs, 0L)
    val ref = IntervalJoin.intervalJoinComposed(purchases, clicks,
      Seq("user_id"), "ts_us", "ts_us", Seq("click_id"), HourUs, 0L)
    val n = native.select(ref.columns.map(col).toSeq: _*)
    assert(n.count() == ref.count() && n.count() > 0)
    assert(n.exceptAll(ref).isEmpty && ref.exceptAll(n).isEmpty)
  }

  test("native interval join equals the composed form (left outer)") {
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_us")
    val clicks = events.filter($"event_type" === "click")
      .select($"user_id", $"ts_us", $"event_id".as("click_id"))
    val native = IntervalJoin.intervalJoinNative(purchases, clicks,
      Seq("user_id"), "ts_us", "ts_us", Seq("click_id"), HourUs, 0L,
      outer = true)
    val ref = IntervalJoin.intervalJoinComposed(purchases, clicks,
      Seq("user_id"), "ts_us", "ts_us", Seq("click_id"), HourUs, 0L,
      outer = true)
    val n = native.select(ref.columns.map(col).toSeq: _*)
    assert(n.count() == ref.count())
    assert(n.exceptAll(ref).isEmpty && ref.exceptAll(n).isEmpty)
    // outer keeps every left row at least once
    assert(native.select($"event_id").distinct().count() ==
      purchases.count())
  }

  test("plan shape: IntervalJoinExec with clustered sort on both sides") {
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_us")
    val clicks = events.filter($"event_type" === "click")
      .select($"user_id", $"ts_us", $"event_id".as("click_id"))
    val p = IntervalJoin.intervalJoinNative(purchases, clicks,
        Seq("user_id"), "ts_us", "ts_us", Seq("click_id"), HourUs, 0L)
      .queryExecution.executedPlan.toString
    assert(p.contains("IntervalJoin"), p)
    assert(p.contains("Sort"), p)
  }

  test("edges: inclusive bounds, both-direction window, nulls, dry keys") {
    val l = Seq((1L, Option(100L), "a"), (1L, Option(200L), "b"),
        (2L, Option(50L), "c"), (3L, Option(7L), "d"),
        (1L, Option.empty[Long], "e"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, Option(90L), 900L), (1L, Option(100L), 901L),
        (1L, Option(110L), 902L), (1L, Option(210L), 903L),
        (2L, Option(80L), 904L), (1L, Option.empty[Long], 999L))
      .toDF("k", "t", "rid")
    // window [t-10, t+10], both bounds inclusive
    val out = IntervalJoin.intervalJoinNative(l, r, Seq("k"), "t", "t",
        Seq("rid"), 10L, 10L, outer = true)
      .select($"tag", $"ij_rid").as[(String, Option[Long])]
      .collect().toList.sorted
    assert(out == List(
      ("a", Some(900L)), // lower bound inclusive: 90 == 100 - 10
      ("a", Some(901L)), // exact tie
      ("a", Some(902L)), // upper bound inclusive: 110 == 100 + 10
      ("b", Some(903L)), // second left row of same key, later window
      ("c", None),       // right exists for key but outside window
      ("d", None),       // no right rows for key
      ("e", None)))      // null left ts -> empty window (outer keeps row)
    // inner mode drops the windowless rows instead
    val inner = IntervalJoin.intervalJoinNative(l, r, Seq("k"), "t", "t",
        Seq("rid"), 10L, 10L)
      .select($"tag").as[String].collect().toSet
    assert(inner == Set("a", "b"))
  }

  test("over bucketed tables the sweep plans with ZERO Exchange") {
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_us")
    val clicks = events.filter($"event_type" === "click")
      .select($"user_id", $"ts_us", $"event_id".as("click_id"))
    try {
      // bucketed by the join key, sorted within buckets by (key, ts) —
      // exactly the exec's required distribution and ordering
      graft.operators.Bucketing.writeBucketed(purchases, "b_ij_p",
        Seq("user_id"), 8, sortCols = Seq("user_id", "ts_us"))
      graft.operators.Bucketing.writeBucketed(clicks, "b_ij_c",
        Seq("user_id"), 8, sortCols = Seq("user_id", "ts_us"))
      val j = IntervalJoin.intervalJoinNative(spark.table("b_ij_p"),
        spark.table("b_ij_c"), Seq("user_id"), "ts_us", "ts_us",
        Seq("click_id"), HourUs, 0L)
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed interval join must not shuffle:\n$p")
      // and the write-time layout changes nothing about the rows
      val ref = IntervalJoin.intervalJoinComposed(purchases, clicks,
        Seq("user_id"), "ts_us", "ts_us", Seq("click_id"), HourUs, 0L)
      assert(j.count() == ref.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_ij_p")
      spark.sql("DROP TABLE IF EXISTS b_ij_c")
    }
  }

  test("right side is column-pruned through the custom node") {
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_us")
    // the WIDE right frame: all fixture columns incl. props/value
    val clicksWide = events.filter($"event_type" === "click")
      .withColumn("click_id", $"event_id")
    val p = IntervalJoin.intervalJoinNative(purchases, clicksWide,
        Seq("user_id"), "ts_us", "ts_us", Seq("click_id"), HourUs, 0L)
      .queryExecution.executedPlan.toString
    // the wrapper prunes to (key, ts, rightCols) before the custom node,
    // so unused wide columns never reach the right scan
    assert(!p.contains("props"), s"right scan must not read props:\n$p")
  }

  test("property: sweep equals composed join on random datasets") {
    // randomized parity: many small adversarial datasets (dup
    // timestamps, clustered keys, asymmetric windows) — any divergence
    // between the sweep and the relational form fails loudly
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { round =>
      val nKeys = 1 + rnd.nextInt(4)
      def rows(n: Int) = (1 to n).map { i =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(40).toLong, i.toLong)
      }
      val l = rows(30 + rnd.nextInt(40)).toDF("k", "t", "lid")
      val r = rows(30 + rnd.nextInt(40)).toDF("k", "t", "rid")
      val before = rnd.nextInt(15).toLong
      val after = rnd.nextInt(15).toLong
      val outer = rnd.nextBoolean()
      val native = IntervalJoin.intervalJoinNative(l, r, Seq("k"), "t",
        "t", Seq("rid"), before, after, outer)
      val ref = IntervalJoin.intervalJoinComposed(l, r, Seq("k"), "t",
        "t", Seq("rid"), before, after, outer)
      val n = native.select(ref.columns.map(col).toSeq: _*)
      assert(n.exceptAll(ref).isEmpty && ref.exceptAll(n).isEmpty,
        s"round $round diverged (before=$before after=$after outer=$outer)")
    }
  }

  test("hot key: sweep output equals composed, with linear not quadratic work") {
    // ONE key holding every row — the adversarial skew case the sweep
    // exists for: the composed SMJ residual form compares the full
    // n x m per-key cross product (400M pairs here); the sweep buffers
    // each right row once (window occupancy ~20). Correctness asserted;
    // wall-clock printed for the record, not asserted (shared box).
    val n = 20000
    val l = (1 to n).map(i => (1L, i.toLong * 10, i.toLong))
      .toDF("k", "t", "lid")
    val r = (1 to n).map(i => (1L, i.toLong * 10 + 5, i.toLong))
      .toDF("k", "t", "rid")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def native() = IntervalJoin.intervalJoinNative(l, r,
      Seq("k"), "t", "t", Seq("rid"), 200L, 0L).count()
    def composed() = IntervalJoin.intervalJoinComposed(l, r,
      Seq("k"), "t", "t", Seq("rid"), 200L, 0L).count()
    native(); composed() // JIT/stage warmup — time the plans, not the JVM
    val (nCount, tN) = time(native())
    val (cCount, tC) = time(composed())
    info(f"hot-key 20000x20000: sweep $tN%.2f s, composed SMJ $tC%.2f s")
    assert(nCount == cCount && nCount > 0)
  }

  test("salted sweep is row-identical to the plain sweep (hot key spread)") {
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_us")
    val clicks = events.filter($"event_type" === "click")
      .select($"user_id", $"ts_us", $"event_id".as("click_id"))
    val plain = IntervalJoin.intervalJoinNative(purchases, clicks,
      Seq("user_id"), "ts_us", "ts_us", Seq("click_id"), HourUs, 0L,
      outer = true)
    val salted = IntervalJoin.intervalJoinSalted(purchases, clicks,
      Seq("user_id"), "ts_us", "ts_us", Seq("click_id"), HourUs, 0L,
      salts = 4, outer = true)
    val s = salted.select(plain.columns.map(col).toSeq: _*)
    assert(s.count() == plain.count())
    assert(s.exceptAll(plain).isEmpty && plain.exceptAll(s).isEmpty)
  }

  test("a right row serving several lefts is emitted for each") {
    val l = Seq((1L, 100L, "x"), (1L, 101L, "y"), (1L, 102L, "z"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 100L, 7L)).toDF("k", "t", "rid")
    val out = IntervalJoin.intervalJoinNative(l, r, Seq("k"), "t", "t",
        Seq("rid"), 5L, 0L)
      .select($"tag").as[String].collect().toSet
    assert(out == Set("x", "y", "z"))
  }
}
