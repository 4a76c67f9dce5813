package graft.operators

import graft.ColUtil
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation statistics for training pipelines — the readouts a
  * data engine owes the team training on its output: did the quality
  * model rank well (ROC-AUC), are its scores honest probabilities
  * (calibration), per data segment. Both are exact-arithmetic through
  * the same sufficient-statistic discipline as [[Hypothesis]]: integer/
  * decimal aggregation, one fixed IEEE dag at the end, so every number
  * is hash-identical cross-engine and partition-invariant.
  */
object MlEval {

  /** Per-key exact ROC-AUC of `score` against binary `label` (0/1) —
    * via the rank-statistic identity AUC = U⁺/(n⁺·n⁻) (AUC is the
    * probability a random positive outranks a random negative; Hanley &
    * McNeil 1982), with midrank tie handling, so it needs no threshold
    * sweep and no per-row ranks.
    *
    * Same shuffle shape as [[Hypothesis.mannWhitneyU]] but keyed:
    * rows collapse to (key, value → count, positives) first, the
    * cumulative count is a window per key (partitioned — no global-sort
    * cliff), and the midrank of a tied run is (2·cum − t + 1)/2. The
    * doubled rank sum keeps every intermediate integral; the returned
    * `u2_pos` = 2·U⁺ is exact bigint, `auc` one fixed double dag.
    * Shuffled volume is the per-key distinct score domain, not rows.
    *
    * AUC is NULL when a key has no positives or no negatives (the
    * curve is undefined). Output: (key, n_pos, n_neg, u2_pos, auc). */
  def aucRoc(df: DataFrame, key: Column, score: Column, label: Column,
      keyName: String = "key"): DataFrame = {
    val base = df.select(key.as(keyName), ColUtil.money(score).as("__v"),
        label.cast("long").as("__y"))
      .where(col("__v").isNotNull && col("__y").isin(0L, 1L))
    val perVal = base.groupBy(col(keyName), col("__v"))
      .agg(sum(col("__y")).as("__cp"), count(lit(1)).as("__ct"))
    val w = Window.partitionBy(col(keyName)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perVal.withColumn("__cum", sum(col("__ct")).over(w))
    cum.groupBy(col(keyName))
      .agg(
        sum(col("__cp")).as("n_pos"),
        sum(col("__ct") - col("__cp")).as("n_neg"),
        // Σ over tied runs of pos_count · 2·midrank, exact in decimal
        // (N² products at corpus scale outrun int64)
        sum((col("__cp").cast("decimal(19,0)") *
          (lit(2L) * col("__cum") - col("__ct") + lit(1L)))
          .cast("decimal(38,0)")).as("__r2"))
      .withColumn("u2_pos",
        (col("__r2") - col("n_pos").cast("decimal(38,0)") *
          (col("n_pos") + lit(1L))).cast("bigint"))
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("u2_pos").cast("double") /
            (lit(2.0d) * col("n_pos").cast("double") *
              col("n_neg").cast("double"))))
      .select(col(keyName), col("n_pos"), col("n_neg"), col("u2_pos"),
        col("auc"))
  }

  /** Per-key average precision (area under the PR curve, step rule) of
    * `score` against binary `label` — the imbalanced-data companion to
    * [[aucRoc]]. With thresholds at the distinct score values descending
    * and ties treated as blocks, AP = (1/n⁺)·Σ_blocks pos_b·(cp_b/c_b)
    * where cp_b/c_b is the precision of everything at-or-above block b
    * — recall only moves where positives sit, so the step area is one
    * sum over the distinct-score domain.
    *
    * Exactness protocol: each block term is ONE integer floor-division
    * in 2²⁰ fixed point (pos·cp·2²⁰ div c — numerator held in
    * decimal(38,0), quotient ≤ n⁺·2²⁰ fits int64), summed exactly, so
    * `ap_fp` is bit-identical cross-engine with truncation error
    * < |blocks|·2⁻²⁰/n⁺ — far under any model-selection delta, and
    * deterministic, unlike a float Σ whose value depends on summation
    * order. `ap` is the double readout. Same shuffle shape as aucRoc:
    * the per-key distinct score domain. NULL when a key has no
    * positives. Output: (key, n_pos, n_neg, ap_fp, ap). */
  def averagePrecision(df: DataFrame, key: Column, score: Column,
      label: Column, keyName: String = "key"): DataFrame = {
    val base = df.select(key.as(keyName), ColUtil.money(score).as("__v"),
        label.cast("long").as("__y"))
      .where(col("__v").isNotNull && col("__y").isin(0L, 1L))
    val perVal = base.groupBy(col(keyName), col("__v"))
      .agg(sum(col("__y")).as("__cp"), count(lit(1)).as("__ct"))
    val w = Window.partitionBy(col(keyName))
      .orderBy(col("__v").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perVal
      .withColumn("__cumP", sum(col("__cp")).over(w))
      .withColumn("__cumT", sum(col("__ct")).over(w))
      .withColumn("__num",
        (col("__cp").cast("decimal(38,0)") * col("__cumP") *
          lit(1048576L)).cast("decimal(38,0)"))
      // integral floor-divide: quotient <= cp * 2^20, fits int64
      .withColumn("__fp", expr("__num div __cumT"))
    cum.groupBy(col(keyName))
      .agg(sum(col("__cp")).as("n_pos"),
        sum(col("__ct") - col("__cp")).as("n_neg"),
        sum(col("__fp")).as("ap_fp"))
      .withColumn("ap",
        when(col("n_pos") > 0,
          col("ap_fp").cast("double") /
            (lit(1048576.0d) * col("n_pos").cast("double"))))
      .select(col(keyName), col("n_pos"), col("n_neg"), col("ap_fp"),
        col("ap"))
  }

  /** Per-key NDCG@k of a ranking induced by `score` against graded
    * integer relevance `rel` (Järvelin & Kekäläinen 2002) — the
    * learning-to-rank readout. Positions come from a per-key
    * row_number over (score DESC, `tiebreak` ASC) so ties are
    * deterministic cross-engine; the ideal ordering is the same window
    * over (rel DESC, tiebreak).
    *
    * The discount 1/log2(i+1) is irrational — a float Σ would be
    * summation-order-dependent — so each position's discount is ONE
    * integer floor-division against the exact fixed-point log:
    * d_i = 2⁴⁰ div log2_fp(i+1), in 2²⁰ units (d_1 = 2²⁰ exactly).
    * DCG_fp = Σ rel_i·d_i and IDCG_fp likewise are exact int64 sums;
    * `ndcg` = DCG_fp/IDCG_fp is one IEEE division. NULL when the key
    * has no positive relevance in its ideal top-k.
    *
    * Scale shape: both windows partition by key — the sort is per
    * candidate set (a re-rank universe, typically ≤ thousands), never
    * global. Output: (key, n_items, dcg_fp, idcg_fp, ndcg). */
  def ndcgAtK(df: DataFrame, key: Column, score: Column, rel: Column,
      tiebreak: Column, k: Int, keyName: String = "query_id")
      : DataFrame = {
    require(k > 0, s"k must be positive: $k")
    import graft.functions.FixedLogFunctions.log2_fp
    val base = df.select(key.as(keyName), tiebreak.as("__id"),
        score.as("__s"), rel.cast("long").as("__rel"))
      .where(col("__s").isNotNull && col("__rel") >= 0)
    val wS = Window.partitionBy(col(keyName))
      .orderBy(col("__s").desc, col("__id"))
    val wR = Window.partitionBy(col(keyName))
      .orderBy(col("__rel").desc, col("__id"))
    val ranked = base.withColumn("__rn", row_number().over(wS))
      .withColumn("__ri", row_number().over(wR))
    def gain(rankCol: String) = ranked.where(col(rankCol) <= k)
      .withColumn("__l", log2_fp((col(rankCol) + 1).cast("long")))
      .withColumn("__d", expr("1099511627776 div __l")) // 2^40 div
      .groupBy(col(keyName))
      .agg(sum(col("__rel") * col("__d")).as(s"__g_$rankCol"),
        count(lit(1)).as(s"__n_$rankCol"))
    gain("__rn").join(gain("__ri"), keyName)
      .select(col(keyName), col("__n___rn").as("n_items"),
        col("__g___rn").as("dcg_fp"), col("__g___ri").as("idcg_fp"))
      .withColumn("ndcg",
        when(col("idcg_fp") > 0,
          col("dcg_fp").cast("double") / col("idcg_fp").cast("double")))
  }

  /** Mean reciprocal rank at k — the first-hit retrieval metric next
    * to [[ndcgAtK]]: per query, the reciprocal rank of the FIRST
    * relevant candidate under (score DESC, tiebreak) within the top k;
    * queries with no relevant hit in the top k contribute 0.
    *
    * Reciprocals are integer fixed point (rr_fp = 2²⁰ div rank — rank 1
    * gives exactly 2²⁰), so the sum is exact and MRR is one IEEE
    * division by n_queries·2²⁰. Per-query windows only; queries are
    * counted from the candidate set, so a query whose candidates all
    * have rel = 0 still counts in the denominator (the retrieval-eval
    * convention). Output one row:
    * (n_queries, n_hit, mrr_fp_sum, mrr). */
  def mrrAtK(df: DataFrame, key: Column, score: Column, rel: Column,
      tiebreak: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val base = df.select(key.as("__q"), tiebreak.as("__id"),
        score.as("__s"), rel.cast("long").as("__rel"))
      .where(col("__s").isNotNull && col("__rel") >= 0)
    val w = Window.partitionBy(col("__q"))
      .orderBy(col("__s").desc, col("__id"))
    val firstHit = base.withColumn("__rn", row_number().over(w))
      .where(col("__rel") > 0 && col("__rn") <= k)
      .groupBy(col("__q")).agg(min(col("__rn")).as("__r"))
      .withColumn("__rr", expr("1048576 div __r"))
    val nq = base.select(col("__q")).distinct()
      .agg(count(lit(1)).as("n_queries"))
    val hits = firstHit.agg(
      coalesce(count(lit(1)), lit(0L)).as("n_hit"),
      coalesce(sum(col("__rr")), lit(0L)).as("mrr_fp_sum"))
    nq.crossJoin(broadcast(hits))
      .withColumn("mrr",
        when(col("n_queries") > 0,
          col("mrr_fp_sum").cast("double") /
            (lit(1048576.0d) * col("n_queries").cast("double"))))
      .select(col("n_queries"), col("n_hit"), col("mrr_fp_sum"),
        col("mrr"))
  }

  /** Decile lift/gains table of `score` against binary `label` — the
    * campaign-targeting readout (how much better is the model's top
    * 10%/20%/... than random?): rows rank into `k` EXACT equi-depth
    * buckets by score descending ([[Profiling.exactBucket]]'s
    * range-partitioned global rank — no one-partition NTILE), and each
    * decile reports support, positives, cumulative gain
    * (cum_pos/total_pos) and cumulative lift
    * ((cum_pos/cum_n)/(total_pos/total_n)).
    *
    * Gains/lifts are IEEE divisions of exact integer cross-products
    * (decimal(38,0) — N² terms), so the table is bit-exact
    * cross-engine. Post-bucket work runs on k rows. Output:
    * (decile, n, n_pos, cum_n, cum_pos, gain, lift). */
  def liftTable(df: DataFrame, id: Column, score: Column, label: Column,
      k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val base = df.select(id.as("__id"), ColUtil.money(score).as("__v"),
        label.cast("long").as("__y"))
      .where(col("__v").isNotNull && col("__y").isin(0L, 1L))
    val bucketed = Profiling.exactBucket(base, negate(col("__v")),
      Seq(col("__id")), k, "decile")
    val per = bucketed.groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = per // k rows: the single-partition window is fine here
      .withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_pos", sum(col("n_pos")).over(w))
    val tot = per.agg(sum(col("n")).as("__tn"),
      sum(col("n_pos")).as("__tp"))
    cum.alias("c").crossJoin(broadcast(tot.alias("t")))
      .withColumn("gain",
        when(col("t.__tp") > 0,
          col("c.cum_pos").cast("double") / col("t.__tp").cast("double")))
      .withColumn("lift",
        when(col("t.__tp") > 0 && col("c.cum_n") > 0,
          (col("c.cum_pos").cast("decimal(19,0)") * col("t.__tn"))
            .cast("decimal(38,0)").cast("double") /
          (col("c.cum_n").cast("decimal(19,0)") * col("t.__tp"))
            .cast("decimal(38,0)").cast("double")))
      .select(col("c.decile"), col("c.n"), col("c.n_pos"),
        col("c.cum_n"), col("c.cum_pos"), col("gain"), col("lift"))
  }

  /** Split-conformal prediction interval calibration (Vovk et al.;
    * Lei et al. 2018) — the distribution-free uncertainty wrapper for
    * ANY point predictor: hash-split the rows into calibration/test,
    * take nonconformity s = |target − score| on calibration, set
    * q̂ = the ⌈(n_cal+1)·(1−α)⌉-th smallest s (the finite-sample-
    * conservative rank), and report test coverage of the interval
    * score ± q̂ — which the conformal guarantee lower-bounds by 1−α in
    * expectation, regardless of the predictor.
    *
    * Exactness: nonconformity is a decimal subtraction (4 dp), the
    * rank is division-free integers (cum ≥ ⌈(n+1)(100−α)/100⌉ via the
    * distributed prefix sum — no global sort), q̂ a discrete order
    * statistic, coverage counts exact. If the rank exceeds n_cal
    * (tiny calibration sets), q̂ = ∞ by convention — reported NULL,
    * every test row covered. Output one row:
    * (n_cal, n_test, qhat, n_covered, coverage). */
  def conformalSplit(df: DataFrame, id: Column, score: Column,
      target: Column, alphaPct: Int, calPct: Int = 50): DataFrame = {
    require(alphaPct > 0 && alphaPct < 100,
      s"alphaPct must be in (0,100): $alphaPct")
    require(calPct > 0 && calPct < 100,
      s"calPct must be in (0,100): $calPct")
    val base = df.select(Sampling.hashBucket(id).as("__bkt"),
        ColUtil.money(score).as("__p"), ColUtil.money(target).as("__t"))
      .where(col("__p").isNotNull && col("__t").isNotNull)
      .withColumn("__s", abs(col("__t") - col("__p")))
    val cal = base.where(col("__bkt") < calPct)
    val tst = base.where(col("__bkt") >= calPct)
    val pv = cal.groupBy(col("__s")).agg(count(lit(1)).as("__c"))
    val cum = Ids.prefixSum(pv, Seq(col("__s")), col("__c"), "__cum")
    val withK = pv.agg(coalesce(sum(col("__c")), lit(0L)).as("n_cal"))
      .withColumn("__k",
        expr(s"((n_cal + 1) * ${100 - alphaPct} + 99) div 100"))
    val qh = cum.alias("c").crossJoin(broadcast(withK.alias("k")))
      .where(col("c.__cum") >= col("k.__k"))
      .agg(min(col("c.__s")).as("qhat"))
    val cov = tst.crossJoin(broadcast(qh))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("qhat").isNull || col("__s") <= col("qhat"), 1L)
          .otherwise(0L)).as("n_covered"))
    withK.select(col("n_cal")).crossJoin(cov)
      .crossJoin(broadcast(qh))
      .withColumn("coverage",
        when(col("n_test") > 0,
          col("n_covered").cast("double") / col("n_test").cast("double")))
      // qhat is an exact money-decimal internally; DOUBLE at the gate
      // (4-dp values round identically in both engines; final-schema
      // DecimalType is a driver-hash hazard, SURVEY §5)
      .select(col("n_cal"), col("n_test"),
        col("qhat").cast("double").as("qhat"),
        col("n_covered"), col("coverage"))
  }

  /** Binary label-noise screen in the confident-learning style
    * (Northcutt et al. 2021, simplified to one score): estimate each
    * class's confidence threshold as its mean predicted score, then
    * flag rows whose score crosses the OTHER class's threshold —
    * labeled negative but scoring ≥ t⁺ (suspected missed positive),
    * labeled positive but scoring ≤ t⁻ (suspected false positive).
    * The flagged sets are what a labeling pipeline routes to re-review.
    *
    * Threshold tests are DIVISION-FREE decimal cross-multiplications
    * (s·n⁺ ≥ Σs⁺ instead of s ≥ Σs⁺/n⁺), so flag counts are exact
    * integers; the reported thresholds and noise rate are fixed IEEE
    * dags at readout. Two passes: one stats aggregate (broadcast
    * back), one flag count. Output one row: (n, n_pos, n_neg, t_pos,
    * t_neg, n_flag_in_neg, n_flag_in_pos, noise_rate). */
  def labelNoise(df: DataFrame, score: Column, label: Column)
      : DataFrame = {
    val base = df.select(ColUtil.money(score).as("__s"),
        label.cast("long").as("__y"))
      .where(col("__s").isNotNull && col("__y").isin(0L, 1L))
    val zero = lit(0).cast("decimal(12,4)")
    val stats = base.agg(count(lit(1)).as("n"),
      sum(col("__y")).as("n_pos"),
      sum(lit(1L) - col("__y")).as("n_neg"),
      sum(when(col("__y") === 1L, col("__s")).otherwise(zero)).as("__s1"),
      sum(when(col("__y") === 0L, col("__s")).otherwise(zero)).as("__s0"))
    base.crossJoin(broadcast(stats))
      .agg(max(col("n")).as("n"), max(col("n_pos")).as("n_pos"),
        max(col("n_neg")).as("n_neg"),
        max(col("__s1")).as("__s1"), max(col("__s0")).as("__s0"),
        sum(when(col("__y") === 0L && col("n_pos") > 0 &&
          col("__s").cast("decimal(19,4)") * col("n_pos") >= col("__s1"),
          1L).otherwise(0L)).as("n_flag_in_neg"),
        sum(when(col("__y") === 1L && col("n_neg") > 0 &&
          col("__s").cast("decimal(19,4)") * col("n_neg") <= col("__s0"),
          1L).otherwise(0L)).as("n_flag_in_pos"))
      .withColumn("t_pos",
        when(col("n_pos") > 0,
          col("__s1").cast("double") / col("n_pos").cast("double")))
      .withColumn("t_neg",
        when(col("n_neg") > 0,
          col("__s0").cast("double") / col("n_neg").cast("double")))
      .withColumn("noise_rate",
        when(col("n") > 0,
          (col("n_flag_in_neg") + col("n_flag_in_pos")).cast("double") /
            col("n").cast("double")))
      .select(col("n"), col("n_pos"), col("n_neg"), col("t_pos"),
        col("t_neg"), col("n_flag_in_neg"), col("n_flag_in_pos"),
        col("noise_rate"))
  }

  /** Cohen's kappa agreement between two categorical raters (Cohen
    * 1960) — the labeling-pipeline QA readout (annotator vs annotator,
    * or declared label vs model prediction): chance-corrected agreement
    * κ = (p_o − p_e)/(1 − p_e).
    *
    * Held EXACT as one integer rational: with cell counts n_ab,
    * marginals r/c and N rows, κ = (N·Σn_aa − Σ_ℓ r_ℓ·c_ℓ) /
    * (N² − Σ_ℓ r_ℓ·c_ℓ) — numerator and denominator are decimal(38,0)
    * integers (N² outruns int64 at corpus scale), the double `kappa`
    * one IEEE division. One shuffle over the label-pair domain (≤ C²
    * cells); everything after is on ≤ C rows. Output one row:
    * (n_items, agree, kappa_num, kappa_den, kappa). */
  def cohensKappa(df: DataFrame, raterA: Column, raterB: Column)
      : DataFrame = {
    val cells = df.select(raterA.as("__ra"), raterB.as("__rb"))
      .where(col("__ra").isNotNull && col("__rb").isNotNull)
      .groupBy(col("__ra"), col("__rb")).agg(count(lit(1)).as("__n"))
    val tot = cells.agg(sum(col("__n")).as("n_items"),
      sum(when(col("__ra") === col("__rb"), col("__n")).otherwise(0L))
        .as("agree"))
    val rs = cells.groupBy(col("__ra").as("__l"))
      .agg(sum(col("__n")).as("__r"))
    val cs = cells.groupBy(col("__rb").as("__l"))
      .agg(sum(col("__n")).as("__c"))
    val pe = rs.join(cs, "__l")
      .agg(coalesce(sum((col("__r").cast("decimal(19,0)") * col("__c"))
        .cast("decimal(38,0)")), lit(0).cast("decimal(38,0)"))
        .as("__pe"))
    tot.crossJoin(broadcast(pe))
      .withColumn("kappa_num",
        (col("n_items").cast("decimal(19,0)") * col("agree") -
          col("__pe")).cast("decimal(38,0)"))
      .withColumn("kappa_den",
        (col("n_items").cast("decimal(19,0)") * col("n_items") -
          col("__pe")).cast("decimal(38,0)"))
      .withColumn("kappa",
        when(col("kappa_den") =!= 0,
          col("kappa_num").cast("double") /
            col("kappa_den").cast("double")))
      // exact decimal internally; BIGINT at the gate (final-schema
      // DecimalType is a driver-hash hazard, SURVEY §5)
      .select(col("n_items"), col("agree"),
        col("kappa_num").cast("long").as("kappa_num"),
        col("kappa_den").cast("long").as("kappa_den"), col("kappa"))
  }

  /** Reliability (calibration) bins of a probability `score` in [0,1]
    * against binary `label`: equal-width bins, per-bin support,
    * positive count, mean confidence and accuracy, and the |conf−acc|
    * gap — the per-bin rows an ECE/reliability diagram is built from
    * (Guo et al. 2017). Binning is EXACT: the score quantizes to
    * decimal 4 dp and the bin index is floor(score·bins) on decimals
    * (clamped to bins−1 so score = 1.0 lands in the top bin) — no
    * float threshold wobble at bin edges cross-engine. One
    * partial-aggregated shuffle over ≤ `bins` keys; conf/acc/gap are
    * fixed double dags from exact sums.
    *
    * Output: (bin, n, n_pos, conf, acc, gap) for non-empty bins. */
  def calibrationBins(df: DataFrame, score: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive: $bins")
    val q = ColUtil.money(score)
    val base = df.select(q.as("__s"), label.cast("long").as("__y"))
      .where(col("__s").isNotNull && col("__s") >= 0 && col("__s") <= 1 &&
        col("__y").isin(0L, 1L))
    base
      .withColumn("bin",
        least(lit(bins - 1),
          floor(col("__s") * lit(bins)).cast("int")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"),
        sum(col("__s")).as("__ss"))
      .withColumn("conf", col("__ss").cast("double") / col("n"))
      .withColumn("acc",
        col("n_pos").cast("double") / col("n").cast("double"))
      .withColumn("gap", abs(col("conf") - col("acc")))
      .select(col("bin"), col("n"), col("n_pos"), col("conf"),
        col("acc"), col("gap"))
  }

  /** Expected calibration error (Naeini et al. 2015) — the one-number
    * companion to [[calibrationBins]]: ECE = Σ_b (n_b/N)·|conf_b −
    * acc_b|. Usually quoted as a float estimate; here it is EXACT,
    * because n·|conf − acc| = |Σ score₄ − n_pos·10⁴| in 1e-4 score
    * units — pure integer arithmetic per bin — so
    * ECE = ece_num4 / (N·10⁴) is one IEEE division over two exact
    * integers, hash-identical cross-engine. Same single
    * partial-aggregated shuffle over ≤ `bins` keys as calibrationBins,
    * then a 1-row rollup. Output: (n_items, ece_num4, ece). */
  def ece(df: DataFrame, score: Column, label: Column, bins: Int = 10)
      : DataFrame = {
    require(bins > 0, s"bins must be positive: $bins")
    val base = df.select(ColUtil.money(score).as("__s"),
        label.cast("long").as("__y"))
      .where(col("__s").isNotNull && col("__s") >= 0 && col("__s") <= 1 &&
        col("__y").isin(0L, 1L))
    base
      .withColumn("bin",
        least(lit(bins - 1), floor(col("__s") * lit(bins)).cast("int")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__p"),
        sum((col("__s") * 10000).cast("long")).as("__ss4"))
      .agg(sum(col("__n")).as("n_items"),
        sum(abs(col("__ss4") - col("__p") * lit(10000L))).as("ece_num4"))
      .withColumn("ece",
        when(col("n_items") > 0,
          col("ece_num4").cast("double") /
            (col("n_items").cast("double") * lit(10000.0d))))
  }

  /** Group-fairness audit (Hardt et al. 2016 framing): per segment the
    * confusion counts of a binary decision against the label, the
    * three operating rates (selection rate, TPR, FPR), and — repeated
    * on every row for one-stop reading — the corpus-wide demographic-
    * parity gap (max−min selection rate) and equalized-odds gap
    * (max of the TPR and FPR spreads). Counts are exact bigints; every
    * rate is one IEEE division, and the gaps are max/min over those
    * exactly-determined doubles, so the whole audit hash-matches.
    * One map-side-combined shuffle over the segment domain, then a
    * broadcast 1-row gap join. Segments where a rate is undefined
    * (no positives / no negatives) carry NULL and drop out of that
    * gap's max/min. Output per segment: (segment, n, tp, fp, fn, tn,
    * sel_rate, tpr, fpr, dp_gap, eo_gap). */
  def fairnessGaps(df: DataFrame, segment: Column, label: Column,
      pred: Column, segName: String = "segment"): DataFrame = {
    val base = df.select(segment.as(segName),
        label.cast("long").as("__y"), pred.cast("long").as("__p"))
      .where(col("__y").isin(0L, 1L) && col("__p").isin(0L, 1L))
    val per = base.groupBy(col(segName))
      .agg(count(lit(1)).as("n"),
        sum(col("__y") * col("__p")).as("tp"),
        sum((lit(1L) - col("__y")) * col("__p")).as("fp"),
        sum(col("__y") * (lit(1L) - col("__p"))).as("fn"),
        sum((lit(1L) - col("__y")) * (lit(1L) - col("__p"))).as("tn"))
      .withColumn("sel_rate",
        (col("tp") + col("fp")).cast("double") / col("n").cast("double"))
      .withColumn("tpr",
        when(col("tp") + col("fn") > 0,
          col("tp").cast("double") / (col("tp") + col("fn")).cast("double")))
      .withColumn("fpr",
        when(col("fp") + col("tn") > 0,
          col("fp").cast("double") / (col("fp") + col("tn")).cast("double")))
    val gaps = per.agg(
      (max(col("sel_rate")) - min(col("sel_rate"))).as("dp_gap"),
      greatest(max(col("tpr")) - min(col("tpr")),
        max(col("fpr")) - min(col("fpr"))).as("eo_gap"))
    per.crossJoin(broadcast(gaps))
  }

  /** Brier score — the proper scoring rule for probability forecasts:
    * mean (score − label)². EXACT: with scores quantized to 4 dp,
    * (s − y)² = (s₄ − y·10⁴)² is a perfect integer square in 10⁻⁸
    * units, so brier = brier_num8 / (N·10⁸) is one IEEE division over
    * exact integers (each square ≤ 10⁸, the decimal(38,0) sum never
    * wraps). One map-side-combined aggregate — no per-bin shuffle at
    * all. Output: (n_items, brier_num8, brier). */
  def brier(df: DataFrame, score: Column, label: Column): DataFrame = {
    val base = df.select(ColUtil.money(score).as("__s"),
        label.cast("long").as("__y"))
      .where(col("__s").isNotNull && col("__s") >= 0 && col("__s") <= 1 &&
        col("__y").isin(0L, 1L))
    base
      .select(((col("__s") * 10000).cast("long") -
        col("__y") * lit(10000L)).as("__d"))
      .agg(count(lit(1)).as("n_items"),
        sum((col("__d").cast("decimal(19,0)") * col("__d"))
          .cast("decimal(38,0)")).cast("decimal(38,0)").cast("long")
          .as("brier_num8"))
      .withColumn("brier",
        when(col("n_items") > 0,
          col("brier_num8").cast("double") /
            (col("n_items").cast("double") * lit(1e8))))
  }

  /** McNemar's test for PAIRED classifier comparison (McNemar 1947) —
    * "is model B actually better than model A on the same rows, or is
    * the delta churn?" — the question accuracy deltas can't answer
    * because they ignore pairing. Only the discordant cells matter:
    * b = A right ∧ B wrong, c = A wrong ∧ B right; the continuity-
    * corrected statistic is χ² = (|b−c|−1)²/(b+c) on 1 df.
    *
    * One map-side-combined count over 4 cells (a full shuffle of 4
    * rows), so it runs at any corpus size. The statistic is held as an
    * exact integer rational: chi2_num = max(|b−c|−1, 0)² squared in
    * decimal(38,0) (a long multiply would wrap past |b−c| ≈ 3·10⁹)
    * and emitted BIGINT per the gate's no-final-decimal contract,
    * chi2_den = b+c, one IEEE division for the readout (NULL when
    * b+c = 0 — the models never disagree). Output one row:
    * (n_items, both_right, both_wrong, b_only_wrong, a_only_wrong,
    * chi2_num, chi2_den, chi2). */
  def mcnemarTest(df: DataFrame, label: Column, predA: Column,
      predB: Column): DataFrame = {
    val base = df.select(label.as("__y"), predA.as("__a"),
        predB.as("__b"))
      .where(col("__y").isNotNull && col("__a").isNotNull &&
        col("__b").isNotNull)
      .select((col("__a") === col("__y")).as("__ra"),
        (col("__b") === col("__y")).as("__rb"))
    base.agg(
        count(lit(1)).as("n_items"),
        sum(when(col("__ra") && col("__rb"), 1L).otherwise(0L))
          .as("both_right"),
        sum(when(!col("__ra") && !col("__rb"), 1L).otherwise(0L))
          .as("both_wrong"),
        sum(when(col("__ra") && !col("__rb"), 1L).otherwise(0L))
          .as("b_only_wrong"),
        sum(when(!col("__ra") && col("__rb"), 1L).otherwise(0L))
          .as("a_only_wrong"))
      .withColumn("chi2_num", {
        val d = greatest(abs(col("b_only_wrong") - col("a_only_wrong"))
          - lit(1L), lit(0L))
        (d.cast("decimal(19,0)") * d).cast("decimal(38,0)").cast("long")
      })
      .withColumn("chi2_den", col("b_only_wrong") + col("a_only_wrong"))
      .withColumn("chi2",
        when(col("chi2_den") > 0,
          col("chi2_num").cast("double") /
            col("chi2_den").cast("double")))
  }

  /** Per-class precision/recall/F1 report of categorical `pred`
    * against `label` — the multi-class readout behind every labeling-
    * pipeline dashboard. For class ℓ: tp = |pred=ℓ ∧ label=ℓ|,
    * fp = |pred=ℓ ∧ label≠ℓ|, fn = |label=ℓ ∧ pred≠ℓ|; precision,
    * recall and F1 = 2tp/(2tp+fp+fn) are each ONE IEEE division from
    * exact bigint counts, so the report is hash-identical
    * cross-engine.
    *
    * Rows first collapse to the (label, pred) confusion cells (≤ C²,
    * map-side combined); marginals are two ≤C-row aggregates of the
    * cells and the final join runs on the broadcast class domain — at
    * 100 TB the shuffle carries the cell domain, never rows. Classes
    * appearing only in `pred` still get a row (support 0, recall
    * NULL). Output: (class, support, tp, fp, fn, precision, recall,
    * f1) ordered by class. */
  def classificationReport(df: DataFrame, label: Column, pred: Column)
      : DataFrame = {
    val cells = df.select(label.as("__y"), pred.as("__p"))
      .where(col("__y").isNotNull && col("__p").isNotNull)
      .groupBy(col("__y"), col("__p")).agg(count(lit(1)).as("__n"))
    val byLabel = cells.groupBy(col("__y").as("class"))
      .agg(sum(col("__n")).as("support"),
        sum(when(col("__p") === col("__y"), col("__n")).otherwise(0L))
          .as("tp"))
    val byPred = cells.groupBy(col("__p").as("class"))
      .agg(sum(col("__n")).as("__pred_n"))
    byLabel.join(byPred, Seq("class"), "full_outer")
      .select(col("class"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("__pred_n"), lit(0L)) - coalesce(col("tp"), lit(0L)))
          .as("fp"),
        (coalesce(col("support"), lit(0L)) - coalesce(col("tp"), lit(0L)))
          .as("fn"))
      .withColumn("precision",
        when(col("tp") + col("fp") > 0,
          col("tp").cast("double") /
            (col("tp") + col("fp")).cast("double")))
      .withColumn("recall",
        when(col("support") > 0,
          col("tp").cast("double") / col("support").cast("double")))
      .withColumn("f1",
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
          (lit(2.0d) * col("tp").cast("double")) /
            (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double")))
  }

  /** Best decision threshold by F1 — "where do I cut the quality
    * score?", the operating-point readout every filter model ships
    * with. Predict positive at score ≥ t, sweep t over the distinct
    * score values: F1(t) = 2·TP/(predicted_pos + all_pos), a rational
    * of two exact counts.
    *
    * Same shuffle shape as [[aucRoc]]: rows collapse to the per-key
    * distinct-score domain, a descending window accumulates
    * (TP, predicted) per candidate, and the argmax compares ONE integer
    * floor-division in 2²⁰ fixed point (ties to the smallest
    * threshold — the most inclusive cut). Output per key: (key,
    * threshold, tp, fp, fn, f1_fp, f1). Keys with no positives are
    * dropped (F1 undefined). */
  def bestF1Threshold(df: DataFrame, key: Column, score: Column,
      label: Column, keyName: String = "key"): DataFrame = {
    val base = df.select(key.as(keyName), ColUtil.money(score).as("__v"),
        label.cast("long").as("__y"))
      .where(col("__v").isNotNull && col("__y").isin(0L, 1L))
    val perVal = base.groupBy(col(keyName), col("__v"))
      .agg(sum(col("__y")).as("__cp"), count(lit(1)).as("__ct"))
    val wDesc = Window.partitionBy(col(keyName)).orderBy(col("__v").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col(keyName))
    val cum = perVal
      .withColumn("__tp", sum(col("__cp")).over(wDesc))
      .withColumn("__pred", sum(col("__ct")).over(wDesc))
      .withColumn("__p", sum(col("__cp")).over(tot))
      .where(col("__p") > 0)
    val scored = cum
      .withColumn("__num",
        (col("__tp").cast("decimal(19,0)") * lit(2097152L))
          .cast("decimal(38,0)"))
      .withColumn("__f1fp", expr("__num div (__pred + __p)"))
    val best = Window.partitionBy(col(keyName))
      .orderBy(col("__f1fp").desc, col("__v"))
    scored.withColumn("__rn", row_number().over(best))
      .where(col("__rn") === 1)
      .select(col(keyName),
        col("__v").cast("double").as("threshold"),
        col("__tp").as("tp"),
        (col("__pred") - col("__tp")).as("fp"),
        (col("__p") - col("__tp")).as("fn"),
        col("__f1fp").as("f1_fp"),
        (lit(2.0d) * col("__tp").cast("double") /
          (col("__pred") + col("__p")).cast("double")).as("f1"))
  }

  /** Best single-feature threshold split by Gini impurity decrease —
    * the decision STUMP, the unit of gradient-boosted trees and the
    * standard "is this feature predictive at all" probe run per
    * feature over a labeled corpus. For each candidate threshold t
    * (the distinct quantized feature values), rows split into
    * left = {v ≤ t} / right = {v > t}; the chosen t maximizes
    * S(t) = (posL²+negL²)/nL + (posR²+negR²)/nR (equivalent to
    * maximal weighted-Gini decrease, since parent impurity is
    * constant).
    *
    * Exactness protocol: rows collapse to the per-key distinct
    * feature-value domain (same shuffle shape as [[aucRoc]]); the
    * cumulative split counts are a per-key window; S(t) is TWO integer
    * floor-divisions in 2²⁰ fixed point with numerators held in
    * decimal(38,0) — (ΣcL²·2²⁰ div nL) + (ΣcR²·2²⁰ div nR) — so the
    * argmax is deterministic cross-engine (ties break to the smallest
    * threshold). The trailing all-rows-left candidate is excluded
    * (nR = 0 splits nothing). Output per key: (key, threshold, n_left,
    * pos_left, n_right, pos_right, split_score_fp, gini_gain) where
    * gini_gain is the double impurity decrease readout. */
  def decisionStump(df: DataFrame, key: Column, feature: Column,
      label: Column, keyName: String = "key"): DataFrame = {
    val base = df.select(key.as(keyName),
        ColUtil.money(feature).as("__v"), label.cast("long").as("__y"))
      .where(col("__v").isNotNull && col("__y").isin(0L, 1L))
    val perVal = base.groupBy(col(keyName), col("__v"))
      .agg(sum(col("__y")).as("__cp"), count(lit(1)).as("__ct"))
    val w = Window.partitionBy(col(keyName)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col(keyName))
    val cum = perVal
      .withColumn("__nL", sum(col("__ct")).over(w))
      .withColumn("__pL", sum(col("__cp")).over(w))
      .withColumn("__n", sum(col("__ct")).over(tot))
      .withColumn("__p", sum(col("__cp")).over(tot))
      .where(col("__nL") < col("__n")) // nR = 0 splits nothing
    def sq(c: Column): Column =
      (c.cast("decimal(19,0)") * c).cast("decimal(38,0)")
    val scored = cum
      .withColumn("__nR", col("__n") - col("__nL"))
      .withColumn("__pR", col("__p") - col("__pL"))
      // per-side terms divide separately — numerators stay ≤ n²·2²⁰
      // (decimal(38,0) holds that to n = 10¹²; the single-div form's
      // n³ factor would overflow at corpus scale), each quotient
      // ≤ n·2²⁰ fits bigint
      .withColumn("__numL",
        ((sq(col("__pL")) + sq(col("__nL") - col("__pL"))) *
          lit(1048576L)).cast("decimal(38,0)"))
      .withColumn("__numR",
        ((sq(col("__pR")) + sq(col("__nR") - col("__pR"))) *
          lit(1048576L)).cast("decimal(38,0)"))
      .withColumn("__score_fp",
        expr("(__numL div __nL) + (__numR div __nR)"))
    val best = Window.partitionBy(col(keyName))
      .orderBy(col("__score_fp").desc, col("__v"))
    scored
      .withColumn("__rn", row_number().over(best))
      .where(col("__rn") === 1)
      .select(col(keyName),
        col("__v").cast("double").as("threshold"),
        col("__nL").as("n_left"), col("__pL").as("pos_left"),
        col("__nR").as("n_right"), col("__pR").as("pos_right"),
        col("__score_fp").cast("long").as("split_score_fp"),
        // gini_gain = S/n − (p² + (n−p)²)/n² as a fixed double dag
        (col("__score_fp").cast("double") / lit(1048576.0d) /
          col("__n").cast("double") -
          (sq(col("__p")) + sq(col("__n") - col("__p"))).cast("double") /
            (col("__n").cast("double") * col("__n").cast("double")))
          .as("gini_gain"))
  }

  /** Discrete AdaBoost over decision stumps with INTEGER weight
    * doubling — a trained boosted ensemble that is fully
    * oracle-checkable (Freund & Schapire 1997 shape; the fixed ×2
    * reweighting is the ε-oblivious variant, every quantity an exact
    * integer). Round t scans all (feature, threshold = distinct value,
    * polarity) stumps for the minimum WEIGHTED 0/1 error, where row
    * weights are the pure expression 2^(# previous stumps that
    * misclassify the row) — nothing materializes between rounds, each
    * round is one melt + one per-feature cumulative window + an argmin
    * (ties break on err, feature, threshold, polarity). The per-round
    * winner (a single row — bounded state) comes to the driver and
    * re-enters the next round's plan as literals.
    *
    * Output: one row per round — the stump (feature, threshold,
    * polarity: 1 means v <= thr predicts class 1), its weighted error
    * and the live total weight, plus the ensemble's training accuracy
    * after that round (majority of signed votes; a tied vote predicts
    * class 0, deterministically).
    *
    * Scale shape: T sequential passes (boosting is inherently
    * sequential); each pass shuffles the melted (feature, value) keys
    * once for the cumulative window — map-side combined per-value
    * aggregation before the window, never a per-row candidate join. */
  def adaboostStumps(df: DataFrame, features: Seq[(String, Column)],
      label: Column, rounds: Int = 3): DataFrame = {
    // row weights are 2^(# misclassifying previous stumps): with more
    // than ~32 rounds the per-value and cumulative-window Long weight
    // sums can silently overflow, corrupting every later argmin — cap
    // loud rather than compute wrong (advisor finding, round 7)
    require(features.nonEmpty && rounds >= 1 && rounds <= 32,
      s"rounds must be in [1, 32] (integer 2^k weights overflow past " +
        s"that); got $rounds")
    val spark = df.sparkSession
    val base = df.select(
        (features.map { case (n, c) => c.cast("long").as(n) } :+
          label.cast("long").as("__y")): _*)
      .where(col("__y").isin(0L, 1L) &&
        features.map(f => col(f._1).isNotNull).reduce(_ && _))
    case class Stump(feature: String, thr: Long, pol: Int,
      err: Long, totW: Long)
    def pred(s: Stump): Column =
      when(col(s.feature) <= lit(s.thr), lit(s.pol))
        .otherwise(lit(1 - s.pol))
    var stumps = List.empty[Stump]
    (0 until rounds).foreach { r =>
      val w = stumps.reverse.foldLeft(lit(1L)) { (acc, s) =>
        acc * when(pred(s) =!= col("__y"), lit(2L)).otherwise(lit(1L))
      }
      val melted = base.withColumn("__w", w)
        .select(explode(array(features.map { case (n, _) =>
          struct(lit(n).as("f"), col(n).as("v"))
        }: _*)).as("fv"), col("__y"), col("__w"))
        .select(col("fv.f").as("__f"), col("fv.v").as("__v"),
          col("__y"), col("__w"))
      val perVal = melted.groupBy(col("__f"), col("__v"))
        .agg(sum(when(col("__y") === 1L, col("__w")).otherwise(0L))
          .as("__w1"),
          sum(when(col("__y") === 0L, col("__w")).otherwise(0L))
            .as("__w0"))
      val cumW = Window.partitionBy(col("__f")).orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val totW = Window.partitionBy(col("__f"))
      val cand = perVal
        .withColumn("__cw0", sum(col("__w0")).over(cumW))
        .withColumn("__cw1", sum(col("__w1")).over(cumW))
        .withColumn("__t0", sum(col("__w0")).over(totW))
        .withColumn("__t1", sum(col("__w1")).over(totW))
        // pol 1: predict 1 iff v <= thr -> errs = w0 at/left + w1 right
        .withColumn("__errLe", col("__cw0") + col("__t1") - col("__cw1"))
        // pol 0: predict 0 iff v <= thr -> errs = w1 at/left + w0 right
        .withColumn("__errGt", col("__cw1") + col("__t0") - col("__cw0"))
      val best = cand.select(col("__f"), col("__v"),
          explode(array(
            struct(lit(1).as("pol"), col("__errLe").as("err")),
            struct(lit(0).as("pol"), col("__errGt").as("err")))).as("pe"),
          (col("__t0") + col("__t1")).as("__tw"))
        .select(col("__f"), col("__v"), col("pe.pol").as("__pol"),
          col("pe.err").as("__err"), col("__tw"))
        .orderBy(col("__err"), col("__f"), col("__v"), col("__pol"))
        .limit(1).collect().head
      stumps ::= Stump(best.getString(0), best.getLong(1), best.getInt(2),
        best.getLong(3), best.getLong(4))
      // headroom gate: next round at most DOUBLES every weight, so the
      // worst intermediate (a cumulative-window sum, bounded by the new
      // total) stays < 2^62 iff this round's total does < 2^61 — check
      // the live total, not a static rounds cap, so the bound tracks
      // the data (advisor finding, round 7). Only enforced while a
      // FURTHER doubling round remains: the final round's total is
      // already computed and consumed, so failing on it would abort
      // otherwise-correct output (advisor finding, round 8)
      require(r == rounds - 1 || best.getLong(4) <= (1L << 61),
        s"adaboostStumps: total integer weight ${best.getLong(4)} too " +
          "close to Long overflow for another doubling round; reduce " +
          "`rounds` or the input size")
    }
    val chosen = stumps.reverse
    // ensemble accuracy after each round: signed majority, tie -> 0
    val accs = (1 to rounds).map { t =>
      val vote = chosen.take(t)
        .map(s => when(pred(s) === 1, lit(1)).otherwise(lit(-1)))
        .reduce(_ + _)
      val ens = when(vote > 0, lit(1L)).otherwise(lit(0L))
      base.agg(sum(when(ens === col("__y"), 1L).otherwise(0L)),
        count(lit(1))).head()
    }
    val rows = chosen.zipWithIndex.map { case (s, i) =>
      (i + 1, s.feature, s.thr, s.pol, s.err, s.totW,
        accs(i).getLong(0), accs(i).getLong(1))
    }
    import spark.implicits._
    rows.toDF("round", "feature", "threshold", "polarity",
      "weighted_err", "total_weight", "ensemble_correct", "n_rows")
  }
}
