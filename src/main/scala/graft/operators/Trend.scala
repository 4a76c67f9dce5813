package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key trend fitting — least-squares regression as a single
  * aggregation pass (the time-series "is this metric drifting" primitive;
  * the reference's DBMS could at most run REGR_SLOPE via querySql,
  * reference database/dbms/reader/parameter.go:94-101).
  *
  * Determinism contract (same scheme as ColUtil): the five sufficient
  * statistics (n, Σx, Σy, Σxy, Σx²) accumulate in EXACT arithmetic —
  * bigint x, decimal(12,4)-quantized y — so they are identical in any
  * engine and under any partitioning; slope/intercept are then a fixed
  * dag of IEEE double operations over those identical inputs, hence
  * bit-identical too. A double-sum formulation would drift in the last
  * ulp with partition count; ln/pow-based fits would drift between
  * libm implementations.
  */
object Trend {
  /** OLS fit of y over x per key group.
    *
    * `x` must be integral (bigint-safe: |x| and per-group Σx² within
    * decimal(38) — quantize timestamps to seconds first); `y` is
    * money-scale (|y| < 1e8, quantized to 4 dp like ColUtil.money).
    * Groups where x never varies (slope undefined) are dropped — the
    * variance guard is an exact integer comparison, not a float-zero
    * test. Output: keys, n, slope, intercept.
    *
    * Scale shape: ONE shuffle (the groupBy, map-side partial), O(1)
    * state per group. */
  def ols(df: DataFrame, keyCols: Seq[String], x: Column, y: Column)
      : DataFrame = {
    val keys = keyCols.map(col)
    val ym = y.cast("decimal(12,4)")
    df.select(keys :+ x.cast("long").as("__x") :+ ym.as("__y"): _*)
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("__x")).as("__nx"),
        sum(col("__x").cast("decimal(38,0)")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum((col("__x") * col("__y")).cast("decimal(38,4)")).as("__sxy"),
        // widen before the square: a long*long product would wrap
        // silently past 2^63 under non-ANSI arithmetic
        sum(col("__x").cast("decimal(19,0)") * col("__x")).as("__sxx"))
      .filter(col("__nx") > 1)
      .withColumn("__dn", col("n").cast("double"))
      .withColumn("__dx", col("__sx").cast("double"))
      .withColumn("__dy", col("__sy").cast("double"))
      .withColumn("slope",
        (col("__dn") * col("__sxy").cast("double") -
          col("__dx") * col("__dy")) /
        (col("__dn") * col("__sxx").cast("double") -
          col("__dx") * col("__dx")))
      .withColumn("intercept",
        (col("__dy") - col("slope") * col("__dx")) / col("__dn"))
      .select(keys ++ Seq(col("n"), col("slope"), col("intercept")): _*)
  }

  /** Trailing exponentially-weighted moving average per key, EXACT.
    *
    * The usual recursive EWMA (s_t = a*x_t + (1-a)*s_{t-1}) is
    * sequential per key and float-order-sensitive; the trailing-window
    * form truncates the tail (weights decay geometrically, so a window
    * of W rows keeps all but decay^W of the mass) and becomes a single
    * window pass of W lag() terms — codegen'd, one shuffle, no
    * recursion. Determinism contract: the decay is a RATIONAL
    * num/den, so weight_j = num^j * den^(W-1-j) is an exact integer
    * coefficient; numerator and denominator accumulate in bigint and
    * the only float op is one final long/long IEEE division —
    * bit-identical in any engine, under any partitioning.
    *
    * `v` must already be an integral fixed-point column (e.g. value
    * quantized to 1e4); rows where `v` is null must be pre-filtered.
    * Output: input columns + `ewma` (double). Overflow bound:
    * |v| * den^(W-1) * W must fit in int64 — for den=10, W=8 that is
    * |v| < ~1.1e11, far above money-scale fixed point. */
  def ewmaTrailing(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[Column], v: Column, window: Int,
      decayNum: Long, decayDen: Long): DataFrame = {
    require(window >= 1 && decayNum > 0 && decayDen > decayNum,
      s"need 0 < decayNum < decayDen, window >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    def pow(b: Long, e: Int): Long = (0 until e).foldLeft(1L)((a, _) => a * b)
    val terms = (0 until window).map { j =>
      val c = pow(decayNum, j) * pow(decayDen, window - 1 - j)
      val lv = if (j == 0) v else lag(v, j).over(w)
      (coalesce(lv, lit(0L)) * lit(c),
        when(lv.isNotNull, lit(c)).otherwise(lit(0L)))
    }
    df.withColumn("__ewma_num", terms.map(_._1).reduce(_ + _))
      .withColumn("__ewma_den", terms.map(_._2).reduce(_ + _))
      .withColumn("ewma",
        col("__ewma_num").cast("double") / col("__ewma_den").cast("double"))
      .drop("__ewma_num", "__ewma_den")
  }

  /** CUSUM change-point estimate per key, EXACT.
    *
    * For an ordered series (t, c) the cumulative-sum statistic
    * S_t = sum_{i<=t} (c_i - mean) peaks in magnitude at the most likely
    * single change point (Page 1954 / Pettitt's argmax form). The mean
    * is rational (total/n), so everything is scaled by n:
    * S'_t = n * S_t = sum_{i<=t} (n*c_i - total) — pure int64, exact in
    * any engine, no float thresholds anywhere. Ties on |S'| resolve to
    * the earliest t.
    *
    * Output per key: `changepoint` (the argmax t — the LAST point of the
    * pre-change segment), `peak_cusum_scaled` (signed S' there; positive
    * = the early segment ran above the mean, i.e. the level dropped
    * after the change), `n`, `total`.
    *
    * Scale shape: two window passes + one map-side-partial aggregate,
    * all hashed on the key — series length per key never materializes
    * anywhere but its own partition (same posture as the rolling-window
    * family); `c` must be integral with n * |c| within int64. */
  def cusumChangepoint(df: DataFrame, keyCols: Seq[String], t: Column,
      c: Column): DataFrame = {
    val keys = keyCols.map(col)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*)
    // order by the renamed projection, not the caller's column — `t` may
    // be an expression that no longer resolves after the select below
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(col("__t"))
    df.select(keys :+ t.as("__t") :+ c.cast("long").as("__c"): _*)
      .withColumn("__total", sum(col("__c")).over(wAll))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__cusum",
        sum(col("__n") * col("__c") - col("__total"))
          .over(wRun.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(keys: _*)
      .agg(min(struct((-abs(col("__cusum"))).as("na"), col("__t"),
          col("__cusum"), col("__n"), col("__total"))).as("__peak"))
      .select(keys ++ Seq(col("__peak.__t").as("changepoint"),
        col("__peak.__cusum").as("peak_cusum_scaled"),
        col("__peak.__n").as("n"), col("__peak.__total").as("total")): _*)
  }

  /** Theil–Sen estimator per key: the median of all pairwise slopes
    * (y_j − y_i)/(x_j − x_i) over x_i < x_j — the robust alternative to
    * [[ols]] (a single wild outlier moves OLS arbitrarily; Theil–Sen
    * tolerates ~29% contamination). Output: keys, n_pairs, slope.
    *
    * Determinism: each slope is one double division of exact operands
    * (decimal y-difference, integer x-difference); the median is an
    * explicit rank selection — rows ranked by slope, the middle one or
    * two averaged as sum/count (1–2 IEEE adds, order-free) — never a
    * percentile approximation. Pairs with equal x are excluded (slope
    * undefined), matching the classical estimator.
    *
    * Scale contract: the pair set is QUADRATIC in each key's series
    * length — callers reduce the series first (e.g. daily exact sums,
    * as events_theilsen_trend does), exactly like any published
    * distributed Theil–Sen variant; the join itself is key-partitioned
    * so cost is Σ_k n_k², never a cross product across keys. */
  def theilSen(df: DataFrame, keyCols: Seq[String], x: Column, y: Column)
      : DataFrame = {
    val keys = keyCols.map(col)
    val base = df.select(
      keys :+ x.cast("long").as("__x") :+
        graft.ColUtil.money(y).as("__y"): _*)
    val a = base.select(keys :+ col("__x").as("__xa") :+
      col("__y").as("__ya"): _*)
    val b = base.select(keys :+ col("__x").as("__xb") :+
      col("__y").as("__yb"): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(col("__slope"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*)
    a.join(b, keyCols, "inner")
      .where(col("__xa") < col("__xb"))
      .withColumn("__slope",
        (col("__yb") - col("__ya")).cast("double") /
          (col("__xb") - col("__xa")).cast("double"))
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .where(col("__rk") === expr("(__n + 1) div 2") ||
        col("__rk") === expr("(__n + 2) div 2"))
      .groupBy(keys: _*)
      .agg(max(col("__n")).as("n_pairs"),
        (sum(col("__slope")) / count(lit(1))).as("slope"))
  }

  /** Per-key lag-k autocorrelation of an integer series, EXACT — the
    * seasonality/self-similarity readout (does Monday look like last
    * Monday; is the metric mean-reverting). For lags 1..maxLag over a
    * series ordered by `t`, reports the ACF as an integer RATIONAL
    * instead of a float: multiplying the textbook estimator through by
    * n² clears the mean, so
    *   num(k) = Σ_{consecutive-rank pairs at distance k} (n·x_t − S)(n·x_{t+k} − S)
    *   den    = Σ_t (n·x_t − S)²          (S = Σx over the key's series)
    * and acf(k) = num/den with both sides exact DECIMAL(38,0) — engine-
    * independent, so sign tests / threshold rules on the rational are
    * hash-exact. The gate projection casts num/den to BIGINT (SURVEY
    * §5's no-final-decimal contract): den ~ n³·x² outruns int64 for
    * long money-scale series, where the rational columns null out —
    * size the period grain (or rescale x) if the exact rational is
    * needed past that. Ranks (not raw t gaps) index the series: the caller
    * aggregates to the grain FIRST (one row per key per period), and a
    * missing period shortens the series rather than zero-filling —
    * document the grain at the call site.
    *
    * Scale shape: the input is a PRE-AGGREGATED series (periods per
    * key, not events), so every stage is over |keys|·|periods| rows:
    * one rank window per key, one stats agg broadcast back, a maxLag
    * fan-out (posexplode) + self-equi-join on (key, rank) for the
    * lagged pairs. No window or join ever touches raw events. */
  def autocorr(series: DataFrame, keyCols: Seq[String], t: Column,
      x: Column, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1: $maxLag")
    val keys = keyCols.map(col)
    val ranked = series
      .select(keys :+ t.as("__t") :+
        x.cast("decimal(38,0)").as("__x"): _*)
      .withColumn("__r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(keys: _*).orderBy(col("__t"))).cast("long"))
    val stats = ranked.groupBy(keys: _*)
      .agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(col("__x")).as("__S"))
    // centered-by-n value: n*x - S (exact decimal)
    val centered = ranked.join(stats, keyCols)
      .select(keys :+ col("__r") :+
        (col("__n") * col("__x") - col("__S")).as("__c") :+
        col("__n"): _*)
    val den = centered.groupBy(keys: _*)
      .agg(sum(col("__c") * col("__c")).cast("decimal(38,0)").as("den"),
        max(col("__n")).cast("bigint").as("n_periods"))
    val probes = centered.select(keys :+ col("__c").as("__ca") :+
      posexplode(array((1 to maxLag).map(l => col("__r") + l): _*))
        .as(Seq("__p", "__rb")): _*)
      .withColumn("lag", (col("__p") + 1).cast("int")).drop("__p")
    val num = probes
      .join(centered.select(keys :+ col("__r").as("__rb") :+
          col("__c").as("__cb"): _*),
        keyCols :+ "__rb")
      .groupBy(keys :+ col("lag"): _*)
      .agg(sum(col("__ca") * col("__cb")).cast("decimal(38,0)")
        .as("num"), count(lit(1)).as("n_pairs"))
    // exact decimal internally; BIGINT at the gate (final-schema
    // DecimalType is a driver-hash hazard, SURVEY §5)
    num.join(den, keyCols)
      .select(keys ++ Seq(col("lag"), col("n_periods"), col("n_pairs"),
        col("num").cast("long").as("num"),
        col("den").cast("long").as("den")): _*)
  }

  /** Classical seasonal decomposition by moving averages (the
    * decompose/STL-lite readout: value = trend + seasonal + residual)
    * per key over a 4dp-quantized series — "is the metric actually
    * drifting, or is that the daily cycle?" answered in one pass.
    *
    * trend = centered moving average over ±`halfWin` ROWS (emitted only
    * where the window is full — edges have no honest trend);
    * seasonal = per-(key, season) mean of the detrended values;
    * residual = value − trend − seasonal.
    *
    * Exactness: the integer sufficient statistics are what shuffles —
    * trend_num = Σ window v4 (exact long), detrended d = v4·W −
    * trend_num (W = 2·halfWin+1), seas_num = Σ d / seas_cnt per season
    * cell — and the three double readouts are one fixed IEEE dag over
    * them, so every row hash-matches cross-engine. The trend windows
    * ride the key partition and the seasonal means a (key, season)
    * window over the SAME pass (a groupBy + join-back would re-execute
    * the trend subtree): shuffle volume is the series twice, nothing
    * quadratic. Callers feed a REGULAR series (one row per tick, e.g.
    * the hourly rollup); gaps simply make the row window span further
    * in time, exactly like the pandas/statsmodels row-window form.
    *
    * Output: keys, ord, season, v4, trend_num (NULL at edges),
    * seas_num, seas_cnt, value, trend, seasonal, resid. */
  def decompose(series: DataFrame, keyCols: Seq[String], ord: Column,
      season: Column, v4: Column, halfWin: Int): DataFrame = {
    require(halfWin >= 1, s"halfWin must be >= 1: $halfWin")
    val keys = keyCols.map(col)
    val win = 2 * halfWin + 1
    val base = series.select(keys :+ ord.as("ord") :+
      season.as("season") :+ v4.cast("long").as("v4"): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(col("ord"))
      .rowsBetween(-halfWin, halfWin)
    val t = base
      .withColumn("__wn", count(lit(1)).over(w))
      .withColumn("trend_num",
        when(col("__wn") === win, sum(col("v4")).over(w)))
      .withColumn("__d",
        col("v4") * lit(win.toLong) - col("trend_num"))
    // seasonal means as a WINDOW over the (key, season) partition — a
    // groupBy + join-back would re-execute the trend-window subtree
    // (the dominant stage) a second time
    val bySeason = org.apache.spark.sql.expressions.Window
      .partitionBy(keys :+ col("season"): _*)
    t
      .withColumn("seas_num", sum(col("__d")).over(bySeason))
      .withColumn("seas_cnt", count(col("__d")).over(bySeason))
      .withColumn("value", col("v4").cast("double") / lit(10000.0d))
      .withColumn("trend",
        col("trend_num").cast("double") / lit(win.toDouble) / lit(10000.0d))
      .withColumn("seasonal",
        when(col("seas_cnt") > 0,
          col("seas_num").cast("double") /
            (lit(win.toDouble) * col("seas_cnt").cast("double")) /
            lit(10000.0d)))
      .withColumn("resid", col("value") - col("trend") - col("seasonal"))
      .select(keys ++ Seq(col("ord"), col("season"), col("v4"),
        col("trend_num"), col("seas_num"), col("seas_cnt"), col("value"),
        col("trend"), col("seasonal"), col("resid")): _*)
  }
}
