package graft

import graft.operators.Trend
import org.apache.spark.sql.functions._

/** Pins Trend.ols: exact recovery on noiseless lines, the constant-x
  * guard, and bit-exactness under repartitioning (the property the
  * exact-sufficient-statistics design exists for). */
class TrendSpec extends SparkSpec {
  import spark.implicits._

  test("recovers a noiseless line exactly") {
    // y = 2.5x + 3 on x = 0..9: sums are exact, the double dag closes
    // over exactly-representable values -> slope/intercept exact
    val df = (0L to 9L).map(x => (1L, x, 2.5 * x + 3.0))
      .toDF("k", "x", "y")
    val r = Trend.ols(df, Seq("k"), col("x"), col("y"))
      .as[(Long, Long, Double, Double)].collect().head
    assert(r == ((1L, 10L, 2.5, 3.0)))
  }

  test("groups with constant x are dropped, not divided by zero") {
    val df = Seq((1L, 5L, 1.0), (1L, 5L, 2.0), (2L, 1L, 1.0),
      (2L, 2L, 2.0)).toDF("k", "x", "y")
    val ks = Trend.ols(df, Seq("k"), col("x"), col("y"))
      .select("k").as[Long].collect().toSet
    assert(ks == Set(2L))
  }

  test("negative slope and multiple keys") {
    val df = ((0L to 4L).map(x => (1L, x, 10.0 - 2.0 * x)) ++
      (0L to 4L).map(x => (2L, x, 1.0 * x))).toDF("k", "x", "y")
    val m = Trend.ols(df, Seq("k"), col("x"), col("y"))
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(m(1L) == ((-2.0, 10.0)) && m(2L) == ((1.0, 0.0)))
  }

  test("bit-exact under repartitioning") {
    val rows = (1L to 500L).map(i =>
      ((i % 7), i, (i % 13) * 0.25 + (i % 5)))
    val a = Trend.ols(rows.toDF("k", "x", "y"), Seq("k"), col("x"),
      col("y")).as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    val b = Trend.ols(rows.toDF("k", "x", "y").repartition(23), Seq("k"),
      col("x"), col("y"))
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("ewmaTrailing matches the recursive reference on a full window") {
    // decay 1/2, window deep enough to cover the whole series: the
    // truncated form IS the recursive EWMA restarted at the first row,
    // with weights renormalized over the observed prefix
    val df = Seq((1L, 1L, 4L), (1L, 2L, 8L), (1L, 3L, 16L))
      .toDF("k", "t", "v")
    val got = Trend.ewmaTrailing(df, Seq("k"), Seq(col("t")), col("v"),
        window = 4, decayNum = 1, decayDen = 2)
      .orderBy("t").select("ewma").as[Double].collect().toSeq
    // weights (newest first) 1, 1/2, 1/4 -> row1: 4; row2: (8 + 4/2)/(3/2);
    // row3: (16 + 8/2 + 4/4)/(7/4)
    assert(got == Seq(4.0, 20.0 / 3.0, 12.0))
  }

  test("ewmaTrailing is bit-exact under repartitioning and truncates at W") {
    val rows = (1L to 400L).map(i => (i % 5, i, (i * 37 % 1000) * 10))
    def run(np: Int) = {
      val base = rows.toDF("k", "t", "v")
      val df = if (np > 0) base.repartition(np) else base
      Trend.ewmaTrailing(df, Seq("k"), Seq(col("t")), col("v"),
          window = 8, decayNum = 7, decayDen = 10)
        .orderBy("k", "t").select("ewma").as[Double].collect().toSeq
    }
    val a = run(0)
    assert(a == run(17))
    // truncation: row 400's EWMA depends only on the trailing 8 rows of
    // its key — perturbing an older row must not change it
    val pert = rows.updated(10, (rows(10)._1, rows(10)._2, 999999L))
    val b = Trend.ewmaTrailing(pert.toDF("k", "t", "v"), Seq("k"),
        Seq(col("t")), col("v"), window = 8, decayNum = 7, decayDen = 10)
      .orderBy("k", "t").select("ewma").as[Double].collect().toSeq
    assert(a.last == b.last)
  }

  test("cusumChangepoint finds a planted level shift exactly") {
    // key A: 5 then jumps to 50 at t=11 — the argmax of |S'| is t=10,
    // the last pre-change point; key B: flat, cusum 0 everywhere -> the
    // earliest t wins the tie
    val rows = (1L to 20L).map(t => ("A", t, if (t <= 10) 5L else 50L)) ++
      (1L to 6L).map(t => ("B", t, 7L))
    val got = Trend.cusumChangepoint(rows.toDF("k", "t", "c"),
        Seq("k"), col("t"), col("c"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // A: n=20 total=550; S'_10 = sum of 10*(20*5-550) = -4500 (early
    // segment below mean); B: n=6 total=42, S' = 0, tie -> t=1
    assert(got == Seq(("A", 10L, -4500L, 20L, 550L), ("B", 1L, 0L, 6L, 42L)))
  }

  test("cusumChangepoint is partition-invariant") {
    val rows = (1L to 300L).map(t =>
      (t % 3, t, if (t < 150) t % 7 else t % 13))
    def run(np: Int) = {
      val base = rows.toDF("k", "t", "c")
      Trend.cusumChangepoint(if (np > 0) base.repartition(np) else base,
          Seq("k"), col("t"), col("c"))
        .orderBy("k").collect().map(_.toSeq).toSeq
    }
    assert(run(0) == run(23))
  }

  test("theilSen ignores an outlier OLS cannot") {
    // y = 2x except one wild point: Theil-Sen median slope stays 2,
    // OLS on the same data does not
    val df = (Seq((1L, 0L, 0.0), (1L, 1L, 2.0), (1L, 2L, 4.0),
      (1L, 3L, 6.0), (1L, 4L, 1000.0))).toDF("k", "x", "y")
    val ts = Trend.theilSen(df, Seq("k"), col("x"), col("y"))
      .select("n_pairs", "slope").as[(Long, Double)].collect().head
    assert(ts._1 == 10L && ts._2 == 2.0)
    val o = Trend.ols(df, Seq("k"), col("x"), col("y"))
      .select("slope").as[Double].collect().head
    assert(math.abs(o - 2.0) > 10)
  }

  test("theilSen even pair count averages the two middle slopes") {
    // x=0..3, y: 0,1,4,5 -> six slopes sorted: 1,1,5/3,2,2,3 ->
    // median = (5/3 + 2)/2 = 11/6
    val df = Seq((1L, 0L, 0.0), (1L, 1L, 1.0), (1L, 2L, 4.0),
      (1L, 3L, 5.0)).toDF("k", "x", "y")
    val r = Trend.theilSen(df, Seq("k"), col("x"), col("y"))
      .select("n_pairs", "slope").as[(Long, Double)].collect().head
    assert(r._1 == 6L && math.abs(r._2 - 11.0 / 6) < 1e-15)
  }

  test("theilSen drops equal-x pairs and is partition-invariant") {
    val rows = (1L to 200L).map(i =>
      (i % 4, i / 2, (i % 11).toDouble))
    def run(np: Int) = {
      val base = rows.toDF("k", "x", "y")
      Trend.theilSen(if (np > 0) base.repartition(np) else base,
          Seq("k"), col("x"), col("y"))
        .orderBy("k").collect().map(_.toSeq).toSeq
    }
    val r = run(0)
    assert(r == run(17))
    // equal-x pairs excluded: with 50 distinct x per key appearing
    // twice... pair count must be < C(100,2)
    assert(r.forall(_(1).asInstanceOf[Long] < 100L * 99 / 2))
  }

  test("autocorr matches the brute-force n^2-cleared estimator and " +
      "is partition-invariant") {
    // an irregular deterministic series per key; brute-force the exact
    // rational in BigInt and compare term-for-term
    val rows = for (k <- Seq("a", "b"); t <- 1L to 40L)
      yield (k, t * 3, (t * t * 7 + t * (if (k == "a") 5 else 11)) % 23)
    val df = rows.toDF("k", "t", "x")
    def brute(xs: Seq[Long], lag: Int): (BigInt, BigInt) = {
      val n = BigInt(xs.length); val s = xs.map(BigInt(_)).sum
      val c = xs.map(x => n * x - s)
      val num = (0 until xs.length - lag)
        .map(i => c(i) * c(i + lag)).sum
      val den = c.map(v => v * v).sum
      (num, den)
    }
    def run(np: Int) = Trend.autocorr(
        if (np > 0) df.repartition(np) else df,
        Seq("k"), col("t"), col("x"), maxLag = 3)
      .orderBy("k", "lag")
      .select("k", "lag", "n_periods", "n_pairs", "num", "den")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), BigInt(r.getLong(4)),
        BigInt(r.getLong(5)))).toSeq
    val got = run(0)
    assert(got == run(13))
    for (k <- Seq("a", "b"); lag <- 1 to 3) {
      val xs = rows.filter(_._1 == k).sortBy(_._2).map(_._3)
      val (num, den) = brute(xs, lag)
      val row = got.find(r => r._1 == k && r._2 == lag).get
      assert(row == ((k, lag, 40L, 40L - lag, num, den)),
        s"k=$k lag=$lag expected ($num, $den) got $row")
    }
    // sanity: a constant series has zero den (undefined ACF, not a crash)
    val const = (1L to 10L).map(t => ("c", t, 4L)).toDF("k", "t", "x")
    val cz = Trend.autocorr(const, Seq("k"), col("t"), col("x"), 2)
      .select("num", "den").collect()
    assert(cz.forall(r => r.getLong(0) == 0L && r.getLong(1) == 0L))
  }

  test("decompose recovers a pure seasonal cycle: flat trend, exact " +
      "per-season means, zero interior residual, NULL-trend edges") {
    // period-3 cycle (v4 in 1e-4 units): 30000, 60000, 90000 repeating,
    // 15 ticks; halfWin=3 -> window 7 spans full cycles +1 partial...
    // use halfWin=4 -> window 9 = three full cycles: MA is exactly the
    // cycle mean 60000 everywhere interior
    val rows = (0 until 15).map(t => ("k", t.toLong, (t % 3).toLong,
      ((t % 3) + 1) * 30000L))
    val out = Trend.decompose(rows.toDF("k", "t", "s", "v4"), Seq("k"),
        col("t"), col("s"), col("v4"), halfWin = 4)
      .select("ord", "season", "v4", "trend_num", "seas_num", "seas_cnt",
        "trend", "seasonal", "resid")
      .collect().map(r => r.getLong(0) -> r).toMap
    // edges (ord < 4 or > 10) have no full window
    assert((0L to 3L).forall(t => out(t).isNullAt(3)))
    assert((11L to 14L).forall(t => out(t).isNullAt(3)))
    // interior trend = 9-row window sum = 9 * 60000
    assert((4L to 10L).forall(t => out(t).getLong(3) == 540000L))
    assert((4L to 10L).forall(t => out(t).getDouble(6) == 6.0))
    // seasonal means recover the cycle offsets (detrended d = 9*v4 -
    // 540000 -> -270000/0/+270000), residual exactly zero interior
    assert((4L to 10L).forall { t =>
      val r = out(t)
      math.abs(r.getDouble(8)) < 1e-12 &&
        r.getDouble(7) == (r.getLong(2) / 30000.0 - 2.0) * 3.0
    })
    // partition-invariance of the integer statistics
    val again = Trend.decompose(
        rows.toDF("k", "t", "s", "v4").repartition(7), Seq("k"),
        col("t"), col("s"), col("v4"), halfWin = 4)
      .select("ord", "trend_num", "seas_num", "seas_cnt")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    val base = out.toSeq.sortBy(_._1).map { case (t, r) =>
      (t, if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4),
        r.getLong(5)) }
    assert(again.toSeq == base)
  }
}
