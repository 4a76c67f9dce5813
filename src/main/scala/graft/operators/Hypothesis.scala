package graft.operators

import graft.ColUtil
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-sample hypothesis tests — the A/B-experiment readout primitives
  * (is variant B's metric actually different, or noise?). No reference
  * counterpart (its DBMS surface stops at aggregates); sibling of
  * Profiling's drift statistics, which compare DISTRIBUTIONS — these
  * compare GROUP MEANS/RANKS and attach a test statistic.
  *
  * Determinism contract (the ColUtil/Trend scheme): every sufficient
  * statistic accumulates in EXACT arithmetic — counts in bigint,
  * money-quantized sums in decimal, squared sums in decimal(38,8) —
  * so the inputs to the final statistic are identical in any engine
  * and under any partitioning; the statistic itself is a fixed dag of
  * IEEE double ops (+,*,/,sqrt — all correctly rounded, no libm) over
  * those identical inputs, hence bit-identical too.
  *
  * Scale shape: Welch is ONE aggregation over the filtered stream
  * (map-side partial, O(1) state). Mann–Whitney is a grouped count on
  * the value domain plus one distributed prefix sum ([[Ids.prefixSum]]
  * — never a single-partition window): cost follows the DISTINCT value
  * count, not the row count, the same bound as Profiling.ksReport.
  */
object Hypothesis {

  /** Welch's unequal-variance t-test comparing `value` between rows
    * where `group` = `a` vs `b`. Returns one row:
    * (n_a, n_b, mean_a, mean_b, var_a, var_b, t_stat, dof) with dof
    * the Welch–Satterthwaite approximation. `value` must be
    * money-scale (quantized via ColUtil.money); both groups need
    * n >= 2 — callers on smaller slices get a null t/dof rather
    * than a crash (guarded divisions). */
  def welchT(df: DataFrame, group: Column, value: Column,
      a: String, b: String): DataFrame =
    welchTBy(df, Seq.empty, group, value, a, b)

  /** Per-key [[welchT]] — one test per `keys` group (e.g. per time
    * window: the streaming A/B monitor runs this under a tumbling
    * window, where the exact sums/counts merge across micro-batches
    * like any mergeable aggregate). */
  def welchTBy(df: DataFrame, keys: Seq[(String, Column)],
      group: Column, value: Column, a: String, b: String): DataFrame = {
    val keyCols = keys.map { case (n, c) => c.as(n) }
    val base = df
      .select(keyCols ++ Seq(group.as("__g"),
        ColUtil.money(value).as("__v")): _*)
      .where(col("__g").isin(a, b) && col("__v").isNotNull)
    def side(tag: String, want: String) = Seq(
      sum(when(col("__g") === want, 1L).otherwise(0L)).as(s"n_$tag"),
      sum(when(col("__g") === want, col("__v"))).as(s"__s$tag"),
      sum(when(col("__g") === want,
        (col("__v") * col("__v")).cast("decimal(38,8)")))
        .as(s"__q$tag"))
    val aggs = side("a", a) ++ side("b", b)
    def mean(t: String) =
      col(s"__s$t").cast("double") / col(s"n_$t").cast("double")
    // var_samp from exact sums: (Σv² - (Σv)²/n) / (n-1)
    def vr(t: String) =
      (col(s"__q$t").cast("double") -
        col(s"__s$t").cast("double") * col(s"__s$t").cast("double") /
          col(s"n_$t").cast("double")) /
        (col(s"n_$t").cast("double") - lit(1.0d))
    base.groupBy(keys.map { case (n, _) => col(n) }: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("mean_a", mean("a")).withColumn("mean_b", mean("b"))
      .withColumn("var_a", when(col("n_a") > 1, vr("a")))
      .withColumn("var_b", when(col("n_b") > 1, vr("b")))
      .withColumn("__se2",
        col("var_a") / col("n_a").cast("double") +
          col("var_b") / col("n_b").cast("double"))
      .withColumn("t_stat",
        (col("mean_a") - col("mean_b")) / sqrt(col("__se2")))
      // squares written as x*x, not pow(x,2): pow is libm territory,
      // multiplication is correctly-rounded IEEE in every engine
      .withColumn("__wa", col("var_a") / col("n_a").cast("double"))
      .withColumn("__wb", col("var_b") / col("n_b").cast("double"))
      .withColumn("dof",
        col("__se2") * col("__se2") /
          (col("__wa") * col("__wa") /
             (col("n_a").cast("double") - lit(1.0d)) +
           col("__wb") * col("__wb") /
             (col("n_b").cast("double") - lit(1.0d))))
      .select(keys.map { case (n, _) => col(n) } ++
        Seq(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
          col("var_a"), col("var_b"), col("t_stat"), col("dof")): _*)
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) test of `value` between
    * `group` = `a` vs `b`, with midrank tie handling and the tie-
    * corrected normal approximation. Returns one row:
    * (n_a, n_b, u2_a, u_a, z_score) where `u2_a` = 2·U_a held exact
    * in bigint (midranks are half-integers, so DOUBLING keeps every
    * intermediate integral — the same fixed-point discipline as
    * log2_fp) and U_a = u2_a/2 as a double for readability.
    *
    * Rank sums never materialize per-row ranks: values collapse to
    * (value → count, count_a) first, the cumulative count comes from
    * one distributed prefix sum, and the midrank of a run of t tied
    * values is (2·cum − t + 1)/2 — so the shuffled volume is the
    * distinct-value domain. */
  def mannWhitneyU(df: DataFrame, group: Column, value: Column,
      a: String, b: String): DataFrame = {
    val base = df
      .select(group.as("__g"), ColUtil.money(value).as("__v"))
      .where(col("__g").isin(a, b) && col("__v").isNotNull)
    val perVal = base.groupBy(col("__v")).agg(
      sum(when(col("__g") === a, 1L).otherwise(0L)).as("__ca"),
      count(lit(1)).as("__ct"))
    val cum = Ids.prefixSum(perVal, Seq(col("__v")), col("__ct"), "__cum")
    // Σ over tied runs of count_a · (2·avg_rank) and the Σ(t³−t) tie
    // term, both exact (decimal(38,0) guards the N² products at scale)
    val agg = cum.agg(
      sum(col("__ca")).as("n_a"),
      sum(col("__ct") - col("__ca")).as("n_b"),
      sum((col("__ca").cast("decimal(19,0)") *
        (lit(2L) * col("__cum") - col("__ct") + lit(1L)))
        .cast("decimal(38,0)")).as("__ra2"),
      sum((col("__ct").cast("decimal(19,0)") * col("__ct") * col("__ct") -
        col("__ct")).cast("decimal(38,0)")).as("__ties"))
    agg
      // 2·U_a = 2·R_a − n_a(n_a+1); both terms integral and exact
      .withColumn("u2_a",
        (col("__ra2") - col("n_a").cast("decimal(38,0)") *
          (col("n_a") + lit(1L))).cast("bigint"))
      .withColumn("u_a", col("u2_a").cast("double") / lit(2.0d))
      .withColumn("__n", (col("n_a") + col("n_b")).cast("double"))
      .withColumn("__mu",
        col("n_a").cast("double") * col("n_b").cast("double") / lit(2.0d))
      // tie-corrected variance: n_a·n_b/12 · ((N+1) − Σ(t³−t)/(N(N−1)))
      .withColumn("__sig2",
        col("n_a").cast("double") * col("n_b").cast("double") / lit(12.0d) *
          (col("__n") + lit(1.0d) -
            col("__ties").cast("double") /
              (col("__n") * (col("__n") - lit(1.0d)))))
      .withColumn("z_score",
        when(col("__sig2") > 0,
          (col("u_a") - col("__mu")) / sqrt(col("__sig2"))))
      .select(col("n_a"), col("n_b"), col("u2_a"), col("u_a"),
        col("z_score"))
  }

  /** Two-proportion z-test — the CONVERSION-RATE readout (binary
    * success per unit), the other half of A/B practice next to the
    * continuous-metric t tests. Pooled-variance form:
    * z = (p_a − p_b)/sqrt(p(1−p)(1/n_a + 1/n_b)) with p the pooled
    * success rate. `success` must be 0/1 per row (one row per unit).
    * Returns one row: (n_a, n_b, conv_a, conv_b, p_a, p_b, z_score).
    * Counts exact; the z a fixed double dag. */
  def proportionZ(df: DataFrame, group: Column, success: Column,
      a: String, b: String): DataFrame = {
    val base = df.select(group.as("__g"), success.cast("long").as("__s"))
      .where(col("__g").isin(a, b) && col("__s").isNotNull)
    def side(tag: String, want: String) = Seq(
      sum(when(col("__g") === want, 1L).otherwise(0L)).as(s"n_$tag"),
      sum(when(col("__g") === want, col("__s")).otherwise(0L))
        .as(s"conv_$tag"))
    val aggs = side("a", a) ++ side("b", b)
    def dn(t: String) = col(s"n_$t").cast("double")
    def dc(t: String) = col(s"conv_$t").cast("double")
    base.agg(aggs.head, aggs.tail: _*)
      .withColumn("p_a", dc("a") / dn("a"))
      .withColumn("p_b", dc("b") / dn("b"))
      .withColumn("__p", (dc("a") + dc("b")) / (dn("a") + dn("b")))
      .withColumn("__se2",
        col("__p") * (lit(1.0d) - col("__p")) *
          (lit(1.0d) / dn("a") + lit(1.0d) / dn("b")))
      .withColumn("z_score",
        when(col("__se2") > 0,
          (col("p_a") - col("p_b")) / sqrt(col("__se2"))))
      .select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
        col("p_a"), col("p_b"), col("z_score"))
  }

  /** Sample-ratio-mismatch check — the A/B trust gate that runs BEFORE
    * any metric readout: a chi-square goodness-of-fit of the observed
    * group counts against the designed `pn/pd` allocation (e.g. 1/2
    * for 50-50). An SRM means the assignment itself is broken
    * (redirect loss, bot filtering skew, logging bugs) and every
    * downstream test is invalid. Returns one row:
    * (n_a, n_b, chi2, srm_flag) with srm_flag = chi2 > 3.841 (the 95%
    * critical value at 1 dof — flag semantics, not a p-value).
    * Counts are exact; chi2 is the fixed double dag over them. */
  def srmCheck(df: DataFrame, group: Column, a: String, b: String,
      pn: Int = 1, pd: Int = 2): DataFrame = {
    require(pn > 0 && pd > pn, s"allocation must be 0 < pn/pd < 1: $pn/$pd")
    val base = df.select(group.as("__g")).where(col("__g").isin(a, b))
    base.agg(
        sum(when(col("__g") === a, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__g") === b, 1L).otherwise(0L)).as("n_b"))
      .withColumn("__ea",
        (col("n_a") + col("n_b")).cast("double") * lit(pn.toDouble) /
          lit(pd.toDouble))
      .withColumn("__eb",
        (col("n_a") + col("n_b")).cast("double") * lit((pd - pn).toDouble) /
          lit(pd.toDouble))
      .withColumn("chi2",
        (col("n_a").cast("double") - col("__ea")) *
          (col("n_a").cast("double") - col("__ea")) / col("__ea") +
        (col("n_b").cast("double") - col("__eb")) *
          (col("n_b").cast("double") - col("__eb")) / col("__eb"))
      .withColumn("srm_flag", col("chi2") > lit(3.841d))
      .select(col("n_a"), col("n_b"), col("chi2"), col("srm_flag"))
  }

  /** Post-stratified treatment-effect estimate — the second classic
    * A/B variance-reduction tool next to [[cuped]]: units are grouped
    * by a pre-treatment covariate (stratum), the B-minus-A mean lift is
    * taken WITHIN each stratum, and the per-stratum lifts combine
    * weighted by stratum size — removing the covariate-imbalance
    * component of the variance (and of the bias, under covariate shift
    * between arms).
    *
    * The cross-strata combine is where naive float math breaks
    * cross-engine (a SUM of per-stratum doubles is order-dependent), so
    * each stratum's lift is first floored to an exact fixed-point
    * integer: fp_s = (num_s * 2^20 + OFF * den_s) div den_s - OFF with
    * num_s = (S_b n_a - S_a n_b) in 1e-4 money units and
    * den_s = n_a n_b — the OFF = 2^50 shift keeps the dividend
    * non-negative (valid for |lift| up to ~10^5 money units), making
    * truncating `div` and flooring `//` agree. The weighted sum
    * SUM(n_s * fp_s) is then pure int64 — bit-exact in any engine.
    *
    * One grouped aggregate (map-side partials) + one 1-row reduce;
    * strata with an empty arm are dropped (inestimable). Output row:
    * (n_strata, n_units, ate_num, ate_den, ate) with
    * ate = ate_num / ate_den in money units. */
  def postStratified(df: DataFrame, group: Column, stratum: Column,
      value: Column, a: String, b: String): DataFrame = {
    val ScaleFp = 1L << 20
    val Off = 1L << 50
    val base = df.select(group.as("__g"), stratum.as("__s"),
        ColUtil.money(value).as("__v"))
      .where(col("__g").isin(a, b) && col("__v").isNotNull &&
        col("__s").isNotNull)
    val per = base.groupBy(col("__s"))
      .agg(sum(when(col("__g") === a, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__g") === b, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("__g") === a, col("__v"))).as("s_a"),
        sum(when(col("__g") === b, col("__v"))).as("s_b"))
      .where(col("n_a") > 0 && col("n_b") > 0)
    def iu(c: Column) = (c * 10000).cast("decimal(38,0)")
    val fp = per
      .withColumn("n_s", col("n_a") + col("n_b"))
      .withColumn("den_s",
        (col("n_a") * col("n_b")).cast("decimal(38,0)"))
      .withColumn("num_s",
        iu(col("s_b")) * col("n_a") - iu(col("s_a")) * col("n_b"))
      .withColumn("fp_s",
        expr(s"CAST((num_s * $ScaleFp + CAST($Off AS DECIMAL(38,0)) " +
          s"* den_s) div den_s AS BIGINT) - $Off")
      )
    fp.agg(count(lit(1)).as("n_strata"),
        sum(col("n_s")).as("n_units"),
        sum(col("n_s") * col("fp_s")).as("ate_num"))
      .select(col("n_strata"), col("n_units"), col("ate_num"),
        (col("n_units") * lit(ScaleFp) * lit(10000L)).as("ate_den"))
      .withColumn("ate",
        col("ate_num").cast("double") / col("ate_den").cast("double"))
  }

  /** CUPED variance reduction (Deng et al., WSDM 2013): adjust each
    * unit's experiment metric by its PRE-experiment covariate,
    * `adj = post − θ·(pre − mean(pre))` with θ = cov(pre,post)/var(pre)
    * pooled — the industry-standard trick that shrinks A/B confidence
    * intervals without adding traffic. Returns one row:
    * (n_a, n_b, theta, mean_adj_a, mean_adj_b, t_raw, t_adj) — t_adj
    * is Welch's t on the adjusted metric, t_raw on the raw one, so the
    * sensitivity gain is visible in the same relation.
    *
    * No per-row adjusted values are ever summed: by linearity,
    * group means and variances of the adjusted metric are closed forms
    * over the EXACT sufficient statistics
    * (mean_adj = mean_post − θ·(mean_pre_g − mean_pre);
    * var_adj = var_post − 2θ·cov + θ²·var_pre), so the whole readout
    * is ONE aggregation pass plus a fixed double dag — deterministic
    * under any partitioning, like every test in this object. */
  def cuped(df: DataFrame, group: Column, pre: Column, post: Column,
      a: String, b: String): DataFrame = {
    val base = df.select(group.as("__g"),
        ColUtil.money(pre).as("__x"), ColUtil.money(post).as("__y"))
      .where(col("__g").isin(a, b) && col("__x").isNotNull &&
        col("__y").isNotNull)
    def side(tag: String, want: Column) = {
      def m(c: Column) = sum(when(want, c))
      Seq(
        sum(when(want, 1L).otherwise(0L)).as(s"n_$tag"),
        m(col("__x")).as(s"__sx_$tag"), m(col("__y")).as(s"__sy_$tag"),
        m((col("__x") * col("__x")).cast("decimal(38,8)"))
          .as(s"__qx_$tag"),
        m((col("__y") * col("__y")).cast("decimal(38,8)"))
          .as(s"__qy_$tag"),
        m((col("__x") * col("__y")).cast("decimal(38,8)"))
          .as(s"__p_$tag"))
    }
    val aggs = side("a", col("__g") === a) ++ side("b", col("__g") === b)
    val agg = base.agg(aggs.head, aggs.tail: _*)
    def d(c: String) = col(c).cast("double")
    def dn(t: String) = col(s"n_$t").cast("double")
    // pooled theta: (NΣxy − ΣxΣy)/(NΣx² − (Σx)²) — the N² cancels
    val nn = dn("a") + dn("b")
    def pooled(c: String) = d(s"${c}_a") + d(s"${c}_b")
    val theta = (nn * (d("__p_a") + d("__p_b")) -
        pooled("__sx") * pooled("__sy")) /
      (nn * (d("__qx_a") + d("__qx_b")) - pooled("__sx") * pooled("__sx"))
    val meanPre = pooled("__sx") / nn
    def meanAdj(t: String) =
      d(s"__sy_$t") / dn(t) -
        col("theta") * (d(s"__sx_$t") / dn(t) - col("__mean_pre"))
    def vr(q: String, s1: String, s2: String, t: String) =
      (d(s"${q}_$t") - d(s"${s1}_$t") * d(s"${s2}_$t") / dn(t)) /
        (dn(t) - lit(1.0d))
    def welch(va: Column, vb: Column, ma: Column, mb: Column) =
      (ma - mb) / sqrt(va / dn("a") + vb / dn("b"))
    val out = agg
      .withColumn("theta", theta).withColumn("__mean_pre", meanPre)
      .withColumn("mean_adj_a", meanAdj("a"))
      .withColumn("mean_adj_b", meanAdj("b"))
    Seq("a", "b").foldLeft(out) { (df0, t) =>
      df0.withColumn(s"__vy_$t", vr("__qy", "__sy", "__sy", t))
        .withColumn(s"__vx_$t", vr("__qx", "__sx", "__sx", t))
        .withColumn(s"__cv_$t", vr("__p", "__sx", "__sy", t))
        .withColumn(s"__va_$t",
          col(s"__vy_$t") - lit(2.0d) * col("theta") * col(s"__cv_$t") +
            col("theta") * col("theta") * col(s"__vx_$t"))
    }
      .withColumn("t_raw", welch(col("__vy_a"), col("__vy_b"),
        d("__sy_a") / dn("a"), d("__sy_b") / dn("b")))
      .withColumn("t_adj", welch(col("__va_a"), col("__va_b"),
        col("mean_adj_a"), col("mean_adj_b")))
      .select(col("n_a"), col("n_b"), col("theta"),
        col("mean_adj_a"), col("mean_adj_b"), col("t_raw"), col("t_adj"))
  }

  /** Spearman rank correlation between `x` and `y` — Pearson on
    * midranks, the monotone-association measure that ignores outliers
    * and nonlinearity Pearson chokes on. Returns one row: (n, rho).
    *
    * Midranks are DOUBLED to stay integral (the Mann–Whitney trick):
    * a tie run of t values whose inclusive cumulative count is c has
    * 2·midrank = 2c − t + 1, straight off one distributed prefix sum
    * per side — never a global rank window. Doubling both sides
    * leaves rho unchanged. All five sufficient statistics accumulate
    * in decimal(38,0) (rank products reach 4n², far past int64 at
    * corpus scale), then the standard fixed double dag.
    *
    * Scale shape: two grouped counts + two prefix sums on the DISTINCT
    * value domains, two value-keyed joins to hand each row its ranks,
    * one aggregation. */
  def spearman(df: DataFrame, x: Column, y: Column): DataFrame = {
    val base = df.select(ColUtil.money(x).as("__x"),
        ColUtil.money(y).as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
    def rankMap(c: String, out: String) = {
      val pv = base.groupBy(col(c)).agg(count(lit(1)).as("__ct"))
      Ids.prefixSum(pv, Seq(col(c)), col("__ct"), "__cum")
        .select(col(c),
          (lit(2L) * col("__cum") - col("__ct") + lit(1L)).as(out))
    }
    val ranked = base
      .join(rankMap("__x", "__a"), "__x")
      .join(rankMap("__y", "__b"), "__y")
    def dec(c: Column) = c.cast("decimal(19,0)")
    val agg = ranked.agg(
      count(lit(1)).as("n"),
      sum(dec(col("__a")).cast("decimal(38,0)")).as("__sa"),
      sum(dec(col("__b")).cast("decimal(38,0)")).as("__sb"),
      sum((dec(col("__a")) * col("__a")).cast("decimal(38,0)"))
        .as("__qa"),
      sum((dec(col("__b")) * col("__b")).cast("decimal(38,0)"))
        .as("__qb"),
      sum((dec(col("__a")) * col("__b")).cast("decimal(38,0)"))
        .as("__p"))
    def d(c: String) = col(c).cast("double")
    val dn = col("n").cast("double")
    val num = dn * d("__p") - d("__sa") * d("__sb")
    val va = dn * d("__qa") - d("__sa") * d("__sa")
    val vb = dn * d("__qb") - d("__sb") * d("__sb")
    agg.select(col("n"),
      when(va > 0 && vb > 0, num / (sqrt(va) * sqrt(vb))).as("rho"))
  }

  /** Poisson(1) inverse-CDF thresholds in 2³² units: a 32-bit uniform
    * u maps to weight w = |{k : u ≥ T_k}| ∈ 0..10 (P(w > 10) ≈ 1e-8 is
    * truncated). INTEGER comparisons only — the draw is exact and
    * engine-independent. Shared by the Spark plan and the SQL oracle so
    * the two can only drift in review. */
  val PoissonThresholds: Seq[Long] =
    graft.functions.HashUtil.PoissonThresholds.toSeq

  /** Per-key Poisson-bootstrap percentile CI for the mean of `value` —
    * THE distributed bootstrap (Chamandy et al., Google 2012;
    * Kleiner et al.'s BLB is the heavier cousin): resampling n rows
    * with replacement is equivalent in the limit to giving every row
    * an independent Poisson(1) multiplicity, which needs NO global
    * coordination — each of the `replicas` resamples draws its weights
    * row-locally from the cross-engine md5 hash of (id, replica).
    *
    * Everything is exact: weights are integer threshold-counts against
    * [[PoissonThresholds]], per-replica sums accumulate in decimal,
    * each replica mean is one IEEE division, and the CI bounds are
    * DISCRETE order statistics of the replica means (ranks
    * ⌈R/40⌉ and R−⌈R/40⌉+1 — the 2.5%/97.5% percentile bootstrap,
    * division-free) — no interpolation, no float summation order.
    *
    * Scale shape: digests and all R weights are projected ONCE per row
    * (R/4 md5 calls — one digest's four 32-bit windows serve four
    * replicas), the (replica, weight) pairs posexplode, and ZERO-WEIGHT
    * pairs — e⁻¹ ≈ 37% of them — drop before the aggregate (a w = 0
    * row contributes nothing to either sum, and an all-zero replica is
    * filtered by the n > 0 guard either way), so the narrow
    * codegen-friendly hash aggregate probes ~0.63·R× the input rows
    * with map-side partials bounding the exchange at R rows per key.
    * (Two rejected shapes, both measured slower at sf0.1: per-replica
    * md5 inside the explode — 4× the hashing; and one 2R-column-wide
    * aggregate — falls out of whole-stage codegen.)
    * Output: (key, n_replicas, ci_lo, ci_hi). */
  def bootstrapMeanCI(df: DataFrame, key: Column, id: Column,
      value: Column, replicas: Int = 40, keyName: String = "key")
      : DataFrame = {
    require(replicas >= 2, s"need >= 2 replicas: $replicas")
    val base = df.select(key.as(keyName), id.as("__id"),
        ColUtil.money(value).as("__v"))
      .where(col("__v").isNotNull)
    val nDigests = (replicas + 3) / 4
    // the fused native draw (Md5Pois4): one codegen'd call per digest
    // yields FOUR replica weights — the replica axis materializes as a
    // flat weight array per row, never as per-replica md5/conv/when
    // expression trees (the conv radix decode then the 10R `when`
    // branches were the measured bottlenecks of earlier shapes)
    val ws = slice(flatten(array((0 until nDigests).map(k =>
      graft.functions.HashFunctions.md5_pois4(
        concat(col("__id").cast("string"), lit(s"#$k")))): _*)),
      1, replicas)
    val rep = base.select(col(keyName), col("__v"),
        posexplode(ws).as(Seq("__b", "__w")))
      .where(col("__w") > 0)
      .groupBy(col(keyName), col("__b"))
      .agg(sum(col("__w") * col("__v")).as("__s"),
        sum(col("__w")).as("__n"))
      .where(col("__n") > 0)
      .withColumn("__m", col("__s").cast("double") / col("__n"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyName)).orderBy(col("__m"), col("__b"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyName))
    rep.withColumn("__rn", row_number().over(wRank))
      .withColumn("__R", count(lit(1)).over(wAll))
      .withColumn("__lo", expr("(__R + 39) div 40"))
      .groupBy(col(keyName))
      .agg(max(col("__R")).as("n_replicas"),
        min(when(col("__rn") === col("__lo"), col("__m"))).as("ci_lo"),
        min(when(col("__rn") === col("__R") - col("__lo") + 1,
          col("__m"))).as("ci_hi"))
  }
}
