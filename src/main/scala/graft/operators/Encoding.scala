package graft.operators

import graft.ColUtil
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised categorical feature encoding for model-training pipelines.
  *
  * Target encoding replaces a categorical column with a statistic of the
  * training target over that category — the standard high-cardinality
  * alternative to one-hot (Micci-Barreca 2001, "A preprocessing scheme
  * for high-cardinality categorical attributes"). The naive form leaks
  * the row's own label into its feature; the leave-one-out form excludes
  * it: enc(row) = (sum(target over category) - target(row)) / (n - 1).
  *
  * Determinism contract (ColUtil scheme): the per-category sufficient
  * statistics (n, Σt) accumulate in exact decimal, the row's encoding is
  * then ONE IEEE division of two values both engines derive identically —
  * so the whole feature column is hash-exact cross-engine.
  *
  * Scale shape: one partial-aggregated shuffle on the category domain
  * produces a |domain|-row stats table, which is BROADCAST back — the
  * encode itself is map-only over the fact table. The window formulation
  * (what the SQL oracle replays) would instead shuffle and sort the full
  * fact table per encoded column; at 100 TB that difference is the whole
  * game, which is why this is an operator and not a query idiom.
  */
object Encoding {

  /** Leave-one-out target encoding of `category` against money-scale
    * `target` (|t| < 1e8, quantized to 4 dp — ColUtil.money).
    *
    * Rows with a NULL category or NULL target are passed through with a
    * NULL encoding (they contribute nothing and learn nothing, matching
    * scikit-learn's TargetEncoder handling). Singleton categories
    * (n == 1) also encode NULL: with its own label held out there is no
    * evidence left — callers impute downstream (typically the global
    * prior). Output: input columns + `outCol`. */
  def targetEncodeLoo(df: DataFrame, category: Column, target: Column,
      outCol: String = "enc"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists in the input")
    val reserved = Seq("__te_cat", "__te_t", "__te_n", "__te_s")
    reserved.foreach(r => require(!df.columns.contains(r),
      s"input may not contain reserved column '$r'"))
    val base = df
      .withColumn("__te_cat", category)
      .withColumn("__te_t", ColUtil.money(target))
    val stats = base
      .where(col("__te_cat").isNotNull && col("__te_t").isNotNull)
      .groupBy(col("__te_cat"))
      .agg(count(lit(1)).as("__te_n"), sum(col("__te_t")).as("__te_s"))
    base
      .join(broadcast(stats), Seq("__te_cat"), "left")
      .withColumn(outCol,
        when(col("__te_t").isNotNull && col("__te_n") > 1,
          (col("__te_s") - col("__te_t")).cast("double") /
            (col("__te_n") - 1).cast("double")))
      .drop(reserved: _*)
  }

  /** Weight-of-evidence statistics of binary `label` per `category` —
    * the other standard supervised encoding next to [[targetEncodeLoo]]
    * (credit-scoring lineage; Siddiqi 2006): WOE(c) = ln of the odds
    * ratio (pos_c/pos_tot)/(neg_c/neg_tot), with add-`smooth` Laplace
    * smoothing so empty cells stay finite.
    *
    * The log runs through log2_fp (exact integer fixed point — see
    * [[graft.functions.FixedLog]]), each argument a COUNT (fits int64
    * at any corpus size; products of counts would not), so `woe_fp` =
    * 2²⁰·log2(odds ratio) is hash-exact cross-engine:
    * woe_fp = (lg(pos_c+s) − lg(pos_tot+s·C)) − (lg(neg_c+s) − lg(neg_tot+s·C)),
    * C = |categories|. `woe` is the double readout (one division by
    * 2²⁰). Scale shape: one partial-agg shuffle over the category
    * domain; the totals are a one-row broadcast.
    *
    * Returns (category named `catName`, n_pos, n_neg, woe_fp, woe) —
    * a stats table; encoding rows is a broadcast join away. NULL
    * categories are excluded (they are their own modeling decision). */
  def woeEncode(df: DataFrame, category: Column, label: Column,
      smooth: Int = 1, catName: String = "category"): DataFrame = {
    require(smooth >= 1, s"smooth must be >= 1 (log domain): $smooth")
    import graft.functions.FixedLogFunctions.log2_fp
    val perCat = df
      .select(category.as(catName), label.cast("long").as("__y"))
      .where(col(catName).isNotNull && col("__y").isin(0L, 1L))
      .groupBy(col(catName))
      .agg(sum(col("__y")).as("n_pos"),
        sum(lit(1L) - col("__y")).as("n_neg"))
    val tot = perCat.agg(sum(col("n_pos")).as("__pt"),
      sum(col("n_neg")).as("__nt"), count(lit(1)).as("__c"))
    perCat.crossJoin(broadcast(tot))
      .withColumn("woe_fp",
        (log2_fp(col("n_pos") + lit(smooth.toLong)) -
          log2_fp(col("__pt") + lit(smooth.toLong) * col("__c"))) -
        (log2_fp(col("n_neg") + lit(smooth.toLong)) -
          log2_fp(col("__nt") + lit(smooth.toLong) * col("__c"))))
      .withColumn("woe", col("woe_fp").cast("double") / lit(1048576.0d))
      .select(col(catName), col("n_pos"), col("n_neg"), col("woe_fp"),
        col("woe"))
  }

  /** Information value of a categorical feature against a binary label
    * — the feature-selection score that pairs with [[woeEncode]]
    * (credit-scoring practice: IV < 0.02 useless, > 0.3 strong):
    * IV = Σ_c (pos_c/pos_tot − neg_c/neg_tot) · WOE(c).
    *
    * Held exact as ONE integer rational over the common denominator
    * pos_tot·neg_tot·2²⁰: each category contributes
    * (pos_c·neg_tot − neg_c·pos_tot) · woe_fp(c) — decimal(38,0)
    * products of counts and the fixed-point log — so `iv_num`/`iv_den`
    * are bit-exact and `iv` is one IEEE division. Same smoothed WOE
    * definition and same one-shuffle shape as [[woeEncode]].
    * Output one row: (n_categories, iv_num, iv_den, iv). */
  def informationValue(df: DataFrame, category: Column, label: Column,
      smooth: Int = 1): DataFrame = {
    require(smooth >= 1, s"smooth must be >= 1 (log domain): $smooth")
    import graft.functions.FixedLogFunctions.log2_fp
    val perCat = df
      .select(category.as("__cat"), label.cast("long").as("__y"))
      .where(col("__cat").isNotNull && col("__y").isin(0L, 1L))
      .groupBy(col("__cat"))
      .agg(sum(col("__y")).as("__np"),
        sum(lit(1L) - col("__y")).as("__nn"))
    val tot = perCat.agg(sum(col("__np")).as("__pt"),
      sum(col("__nn")).as("__nt"), count(lit(1)).as("__c"))
    perCat.crossJoin(broadcast(tot))
      .withColumn("__woe_fp",
        (log2_fp(col("__np") + lit(smooth.toLong)) -
          log2_fp(col("__pt") + lit(smooth.toLong) * col("__c"))) -
        (log2_fp(col("__nn") + lit(smooth.toLong)) -
          log2_fp(col("__nt") + lit(smooth.toLong) * col("__c"))))
      .withColumn("__term",
        ((col("__np").cast("decimal(19,0)") * col("__nt") -
          col("__nn").cast("decimal(19,0)") * col("__pt"))
          .cast("decimal(38,0)") * col("__woe_fp")).cast("decimal(38,0)"))
      .groupBy()
      .agg(max(col("__c")).as("n_categories"),
        sum(col("__term")).cast("decimal(38,0)").as("iv_num"),
        (max(col("__pt")).cast("decimal(19,0)") * max(col("__nt")) *
          lit(1048576L)).cast("decimal(38,0)").as("iv_den"))
      .withColumn("iv",
        when(col("iv_den") > 0,
          col("iv_num").cast("double") / col("iv_den").cast("double") *
            lit(0.6931471805599453d))) // × ln2: WOE's log2 -> natural-log IV
      // exact decimal internally; BIGINT at the gate (final-schema
      // DecimalType is a driver-hash hazard, SURVEY §5)
      .select(col("n_categories"),
        col("iv_num").cast("long").as("iv_num"),
        col("iv_den").cast("long").as("iv_den"), col("iv"))
  }

  /** Robust (median/MAD) scaling of money-scale numeric features —
    * [[standardize]]'s outlier-immune sibling (sklearn's RobustScaler
    * family): rz = (x − median) / (MAD·1.4826), the consistency
    * constant making MAD estimate σ under normality.
    *
    * Both statistics are DISCRETE lower medians (smallest v with
    * 2·cum ≥ n — division-free integers over a distributed prefix sum
    * of the distinct-value domain, no global sort, no interpolation),
    * so they are exact decimals and the per-row transform is one fixed
    * IEEE dag. Two value-domain passes per feature; the transform
    * itself is map-only against broadcast one-row statistics. Constant
    * features (MAD = 0) yield NULL, never Inf. Adds `rz_<name>`. */
  def robustScale(df: DataFrame, features: Seq[(String, Column)])
      : DataFrame = {
    require(features.nonEmpty, "robustScale needs at least one feature")
    features.foreach { case (n, _) =>
      require(!df.columns.contains(s"rz_$n"),
        s"output column 'rz_$n' already exists in the input") }
    def lowerMedian(vals: DataFrame, outName: String): DataFrame = {
      val pv = vals.groupBy(col("__v")).agg(count(lit(1)).as("__c"))
      val cum = Ids.prefixSum(pv, Seq(col("__v")), col("__c"), "__cum")
      val tot = pv.agg(sum(col("__c")).as("__N"))
      cum.alias("c").crossJoin(broadcast(tot.alias("t")))
        .where(col("c.__cum") * 2 >= col("t.__N"))
        .agg(min(col("c.__v")).as(outName))
    }
    features.foldLeft(df) { case (acc, (n, c)) =>
      val v = ColUtil.money(c)
      val med = lowerMedian(
        acc.select(v.as("__v")).where(col("__v").isNotNull), s"__med_$n")
      val withMed = acc.crossJoin(broadcast(med))
      val mad = lowerMedian(
        withMed.select(abs(v - col(s"__med_$n")).as("__v"))
          .where(col("__v").isNotNull), s"__mad_$n")
      withMed.crossJoin(broadcast(mad))
        .withColumn(s"rz_$n",
          when(col(s"__mad_$n") > 0,
            (v - col(s"__med_$n")).cast("double") /
              (col(s"__mad_$n").cast("double") * lit(1.4826d))))
        .drop(s"__med_$n", s"__mad_$n")
    }
  }

  /** Z-score standardization of money-scale numeric features — the
    * train-time feature transform, with the fit statistics computed in
    * the same pass: ONE exact-decimal aggregation over all features
    * (count, Σx, Σx² per feature, 4-dp quantized), broadcast back, and
    * a map-only per-row dag (x − mean)/σ with σ from the textbook
    * sufficient-stat identity — the [[graft.operators.Hypothesis]]
    * Welch discipline, so every standardized value is bit-identical
    * cross-engine and partition-invariant. No window, no second scan,
    * no shuffle beyond the one-row stats reduce.
    *
    * Adds `z_<name>` per feature; NULL inputs yield NULL z, constant
    * features (σ² = 0, or n < 2) yield NULL across the column. */
  def standardize(df: DataFrame, features: Seq[(String, Column)])
      : DataFrame = {
    require(features.nonEmpty, "standardize needs at least one feature")
    features.foreach { case (n, _) =>
      require(!df.columns.contains(s"z_$n"),
        s"output column 'z_$n' already exists in the input") }
    val aggs = features.flatMap { case (n, c) =>
      val m = ColUtil.money(c)
      Seq(count(m).as(s"__n_$n"),
        sum(m).cast("decimal(38,4)").as(s"__s_$n"),
        sum((m * m).cast("decimal(38,8)")).as(s"__q_$n"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    val out = features.foldLeft(joined) { case (acc, (n, c)) =>
      val dn = col(s"__n_$n").cast("double")
      val s = col(s"__s_$n").cast("double")
      val q = col(s"__q_$n").cast("double")
      val vr = (q - s * s / dn) / (dn - lit(1.0d))
      acc.withColumn(s"z_$n",
        when(col(s"__n_$n") > 1 && vr > 0,
          (ColUtil.money(c).cast("double") - s / dn) / sqrt(vr)))
    }
    out.drop(features.flatMap { case (n, _) =>
      Seq(s"__n_$n", s"__s_$n", s"__q_$n") }: _*)
  }

  /** Signed hashing-trick text vectorization (Weinberger et al. 2009,
    * "Feature hashing for large scale multitask learning"): each token
    * hashes to a bucket in [0, dim) and a sign ±1 from an independent
    * hash bit; the feature value is the SIGNED occurrence count, so
    * colliding tokens cancel in expectation instead of piling up — the
    * unbiased estimator that lets `dim` stay fixed while the vocabulary
    * is unbounded (no vocabulary pass, no dictionary to broadcast,
    * nothing to retrain when new tokens appear — exactly what a 100 TB
    * crawl needs).
    *
    * Output is the SPARSE long form (id, bucket, value), one row per
    * touched bucket — the layout a distributed trainer joins/aggregates
    * on; densify downstream only if dim is small. Bucket = first 8 md5
    * nibbles of the token mod dim; sign = parity of nibble 9 (an
    * independent hex digit of the same digest) — both cross-engine
    * replayable, so the whole feature matrix is hash-exact against the
    * SQL oracle. One token explode + one (id, bucket) partial-agg
    * shuffle; zero-sum buckets (exact collision cancellation) are kept:
    * dropping them would make presence depend on collision luck. */
  def hashingTrick(df: DataFrame, idCol: String, text: Column, dim: Int)
      : DataFrame = {
    require(dim > 0, s"dim must be positive: $dim")
    val tok = df.select(col(idCol),
        explode(split(text, " ")).as("__t"))
      .where(length(col("__t")) > 0)
    val h = md5(col("__t"))
    tok
      .withColumn("bucket",
        conv(substring(h, 1, 8), 16, 10).cast("long") % dim)
      .withColumn("__sgn",
        when(conv(substring(h, 9, 1), 16, 10).cast("long") % 2 === 0, 1L)
          .otherwise(-1L))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("__sgn")).cast("bigint").as("value"))
  }

  /** Group-wise missing-value imputation — the feature-repair step
    * before training: numeric nulls fill with their group's LOWER
    * MEDIAN (a pure element selection — no interpolation arithmetic,
    * hence bit-identical cross-engine; the [[robustScale]] convention,
    * here per group), categorical nulls with their group's MODE (ties
    * broken lexicographically — deterministic, unlike hash-order
    * argmax). Columns are replaced IN PLACE; per column an `imp_<name>`
    * flag marks rows actually filled (a group with no donors leaves
    * NULL and the flag false, so downstream can distinguish repaired
    * from unrepairable).
    *
    * Scale shape: per column one group-keyed aggregation/window over
    * NON-NULL rows only (the median rank cut selects one row per
    * group) and one join back on the group key — donors-sized state,
    * no global sort, broadcastable when groups are few. */
  def imputeByGroup(df: DataFrame, group: Column,
      nums: Seq[(String, Column)], cats: Seq[(String, Column)])
      : DataFrame = {
    require(nums.nonEmpty || cats.nonEmpty, "nothing to impute")
    (nums ++ cats).foreach { case (n, _) =>
      require(!df.columns.contains(s"imp_$n"),
        s"output column 'imp_$n' already exists in the input") }
    val wFill = nums.foldLeft(df) { case (acc, (n, c)) =>
      val nn = acc.select(group.as("__g"), c.as("__v"))
        .where(col("__v").isNotNull)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__g")).orderBy(col("__v"))
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__g"))
      val med = nn
        .withColumn("__rk", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(wAll))
        .where(col("__rk") * 2 === col("__n") ||
          col("__rk") * 2 === col("__n") + 1)
        .groupBy(col("__g")).agg(min(col("__v")).as(s"__fill_$n"))
      acc.join(med, group === col("__g"), "left").drop("__g")
        .withColumn(s"imp_$n", c.isNull && col(s"__fill_$n").isNotNull)
        .withColumn(n, coalesce(c, col(s"__fill_$n")))
        .drop(s"__fill_$n")
    }
    cats.foldLeft(wFill) { case (acc, (n, c)) =>
      val cnt = acc.select(group.as("__g"), c.as("__v"))
        .where(col("__v").isNotNull)
        .groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("__c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__g"))
        .orderBy(col("__c").desc, col("__v"))
      val mode = cnt.withColumn("__rk", row_number().over(w))
        .where(col("__rk") === 1)
        .select(col("__g"), col("__v").as(s"__fill_$n"))
      acc.join(mode, group === col("__g"), "left").drop("__g")
        .withColumn(s"imp_$n", c.isNull && col(s"__fill_$n").isNotNull)
        .withColumn(n, coalesce(c, col(s"__fill_$n")))
        .drop(s"__fill_$n")
    }
  }
}
