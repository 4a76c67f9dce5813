package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ColUtil._

/** Model-evaluation / training-data-ML query surface: the readouts and
  * transforms that sit between the corpus engine and the training loop
  * (ranking quality, calibration, supervised encodings, split hygiene).
  * Implementations in [[graft.operators.MlEval]] / [[graft.operators.Encoding]];
  * every query here is exact-arithmetic and oracle-checked.
  */
object MlOps {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // Exact ROC-AUC of a per-user propensity score (engagement value over
    // click/view events) against the observed purchase label, per user
    // segment — the rank-statistic form (AUC = U+/(n+ n-)), midrank ties,
    // no threshold sweep. Shuffles the per-segment distinct score domain,
    // never per-row ranks.
    "ml_auc_roc" -> ((s, d) => {
      val per = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type").isin("click", "view"),
            money(col("value"))).otherwise(lit(0).cast("decimal(12,4)")))
            .as("score"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("label"))
      graft.operators.MlEval.aucRoc(per, col("user_id") % 4,
          col("score"), col("label"), "seg")
        .orderBy(col("seg"))
    }),

    // Average precision (step-rule PR area) of the same propensity
    // score, per segment — block terms are single integer floor-divides
    // in 2^20 fixed point, so the sum is order-independent and exact.
    "ml_pr_auc" -> ((s, d) => {
      val per = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type").isin("click", "view"),
            money(col("value"))).otherwise(lit(0).cast("decimal(12,4)")))
            .as("score"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("label"))
      graft.operators.MlEval.averagePrecision(per, col("user_id") % 4,
          col("score"), col("label"), "seg")
        .orderBy(col("seg"))
    }),

    // Bradley-Terry strengths of part brands from within-order price
    // "preferences" (higher-priced line wins), 8 MM rounds in exact Q20
    // fixed point — the preference-aggregation layer of a reward-data
    // pipeline, every round bit-identical to the oracle's unrolled CTEs.
    "ml_bradley_terry" -> ((s, d) => {
      // pre-partition on the order key: both self-join sides then run
      // partition-local off ONE reused exchange instead of each
      // shuffling the joined frame (guide §2.4, r11)
      val li = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("o"), col("l_linenumber").as("ln"),
          money(col("l_extendedprice")).as("ep"), col("p_brand").as("b"))
        .repartition(col("o"))
      val pr = li.alias("a")
        .join(li.alias("bb"),
          col("a.o") === col("bb.o") && col("a.ln") < col("bb.ln"))
        .where(col("a.b") =!= col("bb.b") && col("a.ep") =!= col("bb.ep"))
        .select(
          when(col("a.ep") > col("bb.ep"), col("a.b"))
            .otherwise(col("bb.b")).as("w"),
          when(col("a.ep") > col("bb.ep"), col("bb.b"))
            .otherwise(col("a.b")).as("l"))
      graft.operators.Preference.bradleyTerry(pr, col("w"), col("l"),
          iters = 8)
        .orderBy(col("item"))
    }),

    // Train-vs-test PSI across the embargo time split: did the feature
    // distribution drift over the split boundary? timeSplitEmbargo and
    // psiReport composed — the leakage-safe split hygiene check run
    // before training. Exact integer PSI fractions, spine-complete.
    "ml_psi_split" -> ((s, d) => {
      val lab = graft.operators.Sampling.timeSplitEmbargo(
        Tables.events(s, d), col("ts"),
        trainPct = 70, embargoNanos = 86400L * 1000 * 1000 * 1000)
      graft.operators.Profiling.psiReport(
          lab.where(col("split") === "train"),
          lab.where(col("split") === "test"),
          col("value"), lo = 0L, hi = 100L, nBuckets = 10)
        .orderBy(col("bucket"))
    }),

    // Decile lift/gains table of the per-user propensity score against
    // the purchase label — exact equi-depth deciles by global rank,
    // gains/lifts as IEEE divisions of exact integer cross-products.
    "ml_lift_table" -> ((s, d) => {
      val per = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type").isin("click", "view"),
            money(col("value"))).otherwise(lit(0).cast("decimal(12,4)")))
            .as("score"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("label"))
      graft.operators.MlEval.liftTable(per, col("user_id"),
          col("score"), col("label"), k = 10)
        .orderBy(col("decile"))
    }),

    // Split-conformal calibration of the LOO target encoder as a value
    // predictor: hash-split cal/test, q-hat = the conservative discrete
    // 90% quantile of |value - enc| on calibration, coverage on test —
    // two session operators composed, fully oracle-replayed.
    "ml_conformal" -> ((s, d) => {
      val enc = graft.operators.Encoding.targetEncodeLoo(
        Tables.events(s, d)
          .select(col("event_id"), col("event_type"), col("value")),
        col("event_type"), col("value"))
      graft.operators.MlEval.conformalSplit(
        enc.where(col("enc").isNotNull),
        col("event_id"), col("enc"), col("value"), alphaPct = 10)
    }),

    // Cohen's kappa between the declared document language and the
    // n-gram language detector — chance-corrected agreement held as one
    // exact integer rational (decimal(38,0) num/den), one IEEE division.
    "ml_cohens_kappa" -> ((s, d) => {
      graft.operators.MlEval.cohensKappa(
        Tables.documents(s, d), col("lang"),
        graft.operators.TextAnalysis.langId(col("text")))
    }),

    // McNemar's paired test: is the n-gram language detector actually
    // better than the majority-class baseline (always 'en') on the SAME
    // documents? Only the discordant cells carry signal; the continuity-
    // corrected chi-square is an exact bigint rational.
    "ml_mcnemar" -> ((s, d) => {
      graft.operators.MlEval.mcnemarTest(
        Tables.documents(s, d), col("lang"),
        lit("en"),
        graft.operators.TextAnalysis.langId(col("text")))
    }),

    // Per-class precision/recall/F1 of the language detector against
    // the declared document language — the multi-class confusion
    // readout; every ratio one IEEE division from exact counts.
    "ml_classification_report" -> ((s, d) => {
      graft.operators.MlEval.classificationReport(
          Tables.documents(s, d), col("lang"),
          graft.operators.TextAnalysis.langId(col("text")))
        .orderBy(col("class"))
    }),

    // F1-optimal decision threshold per user segment: where to cut the
    // value score so purchase-prediction F1 peaks — the operating-point
    // companion to ml_auc_roc; argmax exact in 2^20 fixed point.
    "ml_best_f1" -> ((s, d) => {
      graft.operators.MlEval.bestF1Threshold(
          Tables.events(s, d).where(col("value").isNotNull),
          expr("user_id % 3"), col("value"),
          (col("event_type") === "purchase").cast("int"),
          keyName = "segment")
        .orderBy(col("segment"))
    }),

    // Decision stump per source: the best n_chars threshold separating
    // English from non-English docs by Gini decrease — the "is this
    // feature predictive" probe, argmax exact in 2^20 fixed point.
    "ml_decision_stump" -> ((s, d) => {
      graft.operators.MlEval.decisionStump(
          Tables.documents(s, d), col("source"), col("n_chars"),
          (col("lang") === "en").cast("int"), keyName = "source")
        .orderBy(col("source"))
    }),

    // discrete AdaBoost over decision stumps, integer weight-doubling:
    // a TRAINED boosted ensemble whose every round — weighted stump
    // argmin, reweighting, majority-vote accuracy — is exact integer
    // arithmetic, so the whole training loop is oracle-checked
    // (unrolled-round SQL replay, same pattern as the LPA oracle)
    "ml_adaboost_stumps" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.operators.MlEval.adaboostStumps(docs,
          Seq("n_chars" -> col("n_chars"),
            "n_tokens" -> (length(col("text")) -
              length(replace(col("text"), lit(" "), lit(""))) + 1)),
          (col("lang") === "en").cast("int"), rounds = 3)
        .orderBy(col("round"))
    }),

    // Poisson-bootstrap 95% CI of the mean event value per event type:
    // 40 resamples whose weights are integer threshold-counts of the
    // (event_id, replica) hash — no global coordination, exact sums,
    // discrete order-statistic bounds.
    "ml_bootstrap_ci" -> ((s, d) => {
      graft.operators.Hypothesis.bootstrapMeanCI(
          Tables.events(s, d), col("event_type"), col("event_id"),
          col("value"), replicas = 40, keyName = "event_type")
        .orderBy(col("event_type"))
    }),

    // NDCG@10 per brand of parts ranked by retail price against a
    // graded synthetic relevance (p_size mod 3) — integer fixed-point
    // discounts (2^40 div log2_fp) keep the sums order-independent.
    "ml_ndcg" -> ((s, d) => {
      graft.operators.MlEval.ndcgAtK(
          Tables.part(s, d), col("p_brand"), col("p_retailprice"),
          col("p_size") % 3, col("p_partkey"), k = 10,
          keyName = "p_brand")
        .orderBy(col("p_brand"))
    }),

    // Point-in-time-correct feature backfill: each purchase (label row)
    // carries the user's cumulative pre-purchase click count and click
    // value as of STRICTLY before the purchase instant — the
    // feature-store PIT join that prevents label-time leakage. One
    // tagged union + per-user running windows (label rows sort before
    // equal-timestamp feature rows, so same-instant features are
    // excluded); exact decimal feature sums.
    "ml_pit_features" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("ts_us", expr("ts div 1000"))
      val labels = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          lit(0).as("__side"), lit(null).cast("decimal(12,4)").as("__v"))
      val feats = ev.where(col("event_type") === "click")
        .select(lit(null).cast("long").as("event_id"), col("user_id"),
          col("ts_us"), lit(1).as("__side"),
          money(col("value")).as("__v"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("__side"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)
      labels.unionByName(feats)
        .withColumn("n_clicks_before", count(col("__v")).over(w))
        .withColumn("sum_click_value",
          coalesce(sum(col("__v")).over(w),
            lit(0).cast("decimal(12,4)")).cast("decimal(22,4)"))
        .where(col("__side") === 0)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("n_clicks_before"),
          col("sum_click_value").cast("double").as("sum_click_value"))
        .orderBy(col("user_id"), col("ts_us"), col("event_id"))
    }),

    // Confident-learning label-noise screen on the per-user propensity
    // dataset: rows whose score crosses the other class's mean-score
    // threshold are flagged for re-review. Division-free decimal
    // threshold tests; exact flag counts.
    "ml_label_noise" -> ((s, d) => {
      val per = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type").isin("click", "view"),
            money(col("value"))).otherwise(lit(0).cast("decimal(12,4)")))
            .as("score"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("label"))
      graft.operators.MlEval.labelNoise(per, col("score"), col("label"))
    }),

    // MRR@10 over the same brand rankings as ml_ndcg (first part with
    // p_size mod 3 > 0 under price-desc order) — integer fixed-point
    // reciprocals, one IEEE division at the end.
    "ml_mrr" -> ((s, d) => {
      graft.operators.MlEval.mrrAtK(
        Tables.part(s, d), col("p_brand"), col("p_retailprice"),
        col("p_size") % 3, col("p_partkey"), k = 10)
    }),

    // Reliability bins of a [0,1] probability score (value/100) against
    // the purchase label: 10 equal-width bins, exact decimal binning, per
    // bin support/confidence/accuracy/|gap| — the ECE inputs.
    "ml_calibration_bins" -> ((s, d) => {
      graft.operators.MlEval.calibrationBins(
          Tables.events(s, d)
            .withColumn("score", col("value") / lit(100.0d))
            .withColumn("label",
              when(col("event_type") === "purchase", 1L).otherwise(0L)),
          col("score"), col("label"), bins = 10)
        .orderBy(col("bin"))
    }),

    // Group-fairness audit of the value>=50 decision against the
    // purchase label across user segments: per-segment confusion +
    // rates, demographic-parity and equalized-odds gaps — exact counts,
    // IEEE readouts, the responsible-eval readout next to AUC/ECE.
    "ml_fairness_gaps" -> ((s, d) => {
      graft.operators.MlEval.fairnessGaps(
          Tables.events(s, d).where(col("value").isNotNull),
          expr("user_id % 3"),
          when(col("event_type") === "purchase", 1L).otherwise(0L),
          (col("value") >= 50.0).cast("long"))
        .orderBy(col("segment"))
    }),

    // Brier score of the same probability forecast — exact: (s-y)^2 is
    // a perfect integer square in 1e-8 units, one IEEE division total.
    "ml_brier" -> ((s, d) => {
      graft.operators.MlEval.brier(
        Tables.events(s, d)
          .withColumn("score", col("value") / lit(100.0d))
          .withColumn("label",
            when(col("event_type") === "purchase", 1L).otherwise(0L)),
        col("score"), col("label"))
    }),

    // Expected calibration error over the same reliability bins —
    // EXACT: n*|conf-acc| = |sum(score4) - n_pos*1e4| per bin in
    // integer 1e-4 units, one IEEE division total.
    "ml_ece" -> ((s, d) => {
      graft.operators.MlEval.ece(
        Tables.events(s, d)
          .withColumn("score", col("value") / lit(100.0d))
          .withColumn("label",
            when(col("event_type") === "purchase", 1L).otherwise(0L)),
        col("score"), col("label"), bins = 10)
    }),

    // Weight-of-evidence of each corpus source against the is-English
    // label, Laplace-smoothed, in exact 2^20 fixed point through log2_fp
    // — the supervised encoding whose log is bit-identical cross-engine.
    "ml_woe_encode" -> ((s, d) => {
      graft.operators.Encoding.woeEncode(
          Tables.documents(s, d),
          col("source"),
          when(col("lang") === "en", 1L).otherwise(0L),
          smooth = 1, catName = "source")
        .orderBy(col("source"))
    }),

    // Information value of the source feature against the is-English
    // label — the WOE-paired feature-selection score as one exact
    // integer rational over the common denominator pos*neg*2^20.
    "ml_information_value" -> ((s, d) => {
      graft.operators.Encoding.informationValue(
        Tables.documents(s, d), col("source"),
        when(col("lang") === "en", 1L).otherwise(0L))
    }),

    // Deterministic 2-negative sampling per order against the part
    // catalog, excluding the parts the order actually contains — indexed
    // md5 draws, one equi-join on the corpus index, never |Q|x|corpus|.
    "ml_negative_sample" -> ((s, d) => {
      graft.operators.Sampling.negativeSample(
          Tables.lineitem(s, d), col("l_orderkey"), col("l_partkey"),
          Tables.part(s, d), col("p_partkey"), k = 2)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Skip-gram (target, context) pair counts from per-user event
    // sequences, window 2 — the item2vec/word2vec training-pair
    // generator; one offset-explode equi-join, never a per-key cross
    // product. Aggregated counts gate every pair emission.
    "ml_skipgram_pairs" -> ((s, d) => {
      graft.operators.Packing.skipGramPairs(
          Tables.events(s, d), col("user_id"), col("ts"),
          col("event_type"), window = 2, keyName = "user_id")
        .groupBy(col("target"), col("context"), col("distance"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("target"), col("context"), col("distance"))
    }),

    // Freshness / completeness monitor per event source: lag of each
    // source's newest row behind the globally newest, last-day volume,
    // and a staleness flag — the ingestion-health readout a pipeline
    // checks before training on "current" data. Exact nanos integers.
    "profile_freshness" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val g = ev.agg(max(col("ts")).as("__gmax"))
      ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"), max(col("ts")).as("max_ts"))
        .crossJoin(broadcast(g))
        .join(
          ev.crossJoin(broadcast(g))
            .where(col("ts") > col("__gmax") - lit(86400000000000L))
            .groupBy(col("event_type"))
            .agg(count(lit(1)).as("n_last_day")),
          Seq("event_type"), "left")
        .select(col("event_type"), col("n_rows"), col("max_ts"),
          (col("__gmax") - col("max_ts")).as("lag_ns"),
          coalesce(col("n_last_day"), lit(0L)).as("n_last_day"),
          (col("__gmax") - col("max_ts") > 86400000000000L)
            .as("stale"))
        .orderBy(col("event_type"))
    }),

    // Weighted exact-k sample of orders, inclusion odds proportional to
    // order value (Efraimidis-Spirtakis in fixed point) — the weighted
    // slot between Bernoulli PPS (inexact k) and reservoirK (unweighted).
    "sample_weighted_k" -> ((s, d) => {
      graft.operators.Sampling.weightedSampleK(
          Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_custkey"),
              col("o_totalprice")),
          col("o_orderkey"),
          (money(col("o_totalprice")) * 100).cast("long"), k = 100)
        .orderBy(col("o_orderkey"))
    }),

    // Rolling-origin CV segments over the event stream: 5 time-ordered
    // equi-count segments; the readout pins exact sizes and that
    // segment time ranges never interleave (causality).
    "ml_rolling_origin" -> ((s, d) => {
      graft.operators.Sampling.rollingOriginSegments(
          Tables.events(s, d), col("ts"), col("event_id"), folds = 5)
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
        .orderBy(col("segment"))
    }),

    // Causality-respecting 70/30 time split of the event stream with a
    // one-day embargo after the boundary; the boundary is the exact
    // discrete percentile from a distributed prefix sum over the
    // distinct-timestamp domain. Grouped readout pins every row's label.
    "ml_time_split" -> ((s, d) => {
      graft.operators.Sampling.timeSplitEmbargo(
          Tables.events(s, d), col("ts"),
          trainPct = 70, embargoNanos = 86400L * 1000 * 1000 * 1000)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
        .orderBy(col("split"))
    }),

    // Rendezvous-hash layout of the document corpus over 8 shards —
    // stable under resharding (S -> S+1 moves only ~1/(S+1) of keys,
    // all into the new shard). Grouped readout pins every assignment
    // via per-shard count + id checksum.
    "ml_shard_rendezvous" -> ((s, d) => {
      graft.operators.Sampling.rendezvousShard(
          Tables.documents(s, d), col("doc_id"), shards = 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_id"))
        .orderBy(col("shard"))
    }),

    // Median/MAD robust scaling of the quantity feature — discrete
    // lower medians over distributed prefix sums, map-only transform
    // against one-row broadcast stats, NULL (never Inf) on MAD = 0.
    "ml_robust_scale" -> ((s, d) => {
      graft.operators.Encoding.robustScale(
          Tables.lineitem(s, d)
            .select(col("l_orderkey"), col("l_linenumber"),
              col("l_quantity")),
          Seq("qty" -> col("l_quantity")))
        .select(col("l_orderkey"), col("l_linenumber"), col("rz_qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // One-pass z-score standardization of two lineitem features: exact
    // decimal sufficient stats broadcast back, map-only per-row dag —
    // every standardized value bit-identical to the oracle replay.
    // group-wise imputation: numeric nulls <- per-user lower median
    // (pure element selection), categorical nulls <- per-user mode
    // (lexicographic tie-break), imp_* flags mark actual fills; nulls
    // planted deterministically so the repair is oracle-replayable
    "ml_impute" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"),
        col("user_id"),
        when(col("event_id") % 13 === 0, lit(null))
          .otherwise(col("value")).as("value"),
        when(col("event_id") % 17 === 0, lit(null))
          .otherwise(col("event_type")).as("etype"))
      graft.operators.Encoding.imputeByGroup(ev, col("user_id"),
          nums = Seq("value" -> col("value")),
          cats = Seq("etype" -> col("etype")))
        .select(col("event_id"), col("user_id"), col("value"),
          col("etype"), col("imp_value"), col("imp_etype"))
        .orderBy(col("event_id"))
    }),

    "ml_feature_scale" -> ((s, d) => {
      graft.operators.Encoding.standardize(
          Tables.lineitem(s, d)
            .select(col("l_orderkey"), col("l_linenumber"),
              col("l_quantity"), col("l_extendedprice")),
          Seq("qty" -> col("l_quantity"), "price" -> col("l_extendedprice")))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("z_qty"), col("z_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Epoch-1 deterministic training shuffle of the document corpus
    // into 8 shards: shard + dense within-shard position from the
    // cross-engine md5 permutation — the whole epoch order is oracle-
    // replayed row for row.
    "ml_epoch_shuffle" -> ((s, d) => {
      graft.operators.Sampling.epochShuffle(
          Tables.documents(s, d).select(col("doc_id")),
          col("doc_id"), epoch = 1, shards = 8)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("shard"), col("pos"))
    }),

    // Grouped 5-fold split of events by user: per-fold row/group
    // counts; every user's rows land in one fold by construction.
    "ml_group_kfold" -> ((s, d) => {
      graft.operators.Sampling.groupKFold(
          Tables.events(s, d), col("user_id"), k = 5)
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("fold"))
    }),

    // Curriculum order over documents: 4 exact equi-count difficulty
    // stages by n_chars, epoch-hash order within stage, dense global
    // curriculum position — the easiest-first loader layout.
    "ml_curriculum" -> ((s, d) => {
      graft.operators.Sampling.curriculumOrder(
          Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
          col("doc_id"), col("n_chars"), stages = 4, epoch = 1)
        .select(col("doc_id"), col("stage"), col("pos"))
        .orderBy(col("pos"))
    }),

    // Signed hashing-trick vectorization of document text into 128
    // buckets — the sparse (doc, bucket, signed count) feature matrix,
    // bit-identical to the oracle's md5 replay.
    "ml_feature_hash" -> ((s, d) => {
      graft.operators.Encoding.hashingTrick(
          Tables.documents(s, d), "doc_id", col("text"), dim = 128)
        .orderBy(col("doc_id"), col("bucket"))
    })
  )

  val oracles: Map[String, String] = Map(
    // unrolled-round AdaBoost replay: per round, cumulative weighted
    // error over every (feature, threshold, polarity) stump, LIMIT-1
    // argmin with the same tie-break, 1-row stump CTE feeding the next
    // round's weight product and the signed-majority accuracy
    "ml_adaboost_stumps" -> {
      val rounds = 3
      def predSql(p: String): String =
        s"""(CASE WHEN (CASE $p.f WHEN 'n_chars' THEN b.f_n_chars
           |  ELSE b.f_n_tokens END) <= $p.v THEN $p.pol
           |  ELSE 1 - $p.pol END)""".stripMargin
      val ctes = scala.collection.mutable.ArrayBuffer(
        s"""base AS (SELECT CAST(n_chars AS BIGINT) AS f_n_chars,
           |  CAST(length(text) - length(replace(text, ' ', '')) + 1
           |    AS BIGINT) AS f_n_tokens,
           |  CASE WHEN lang IS NULL THEN NULL
           |    WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           |  FROM documents
           |  WHERE lang IS NOT NULL AND text IS NOT NULL
           |    AND n_chars IS NOT NULL)""".stripMargin)
      (1 to rounds).foreach { t =>
        val prev = (1 until t).map(k => s"p$k")
        val wExpr =
          if (prev.isEmpty) "CAST(1 AS BIGINT)"
          else prev.map(p =>
            s"(CASE WHEN ${predSql(p)} != b.y THEN 2 ELSE 1 END)")
            .mkString(" * ")
        val from = ("base b" +: prev).mkString(", ")
        ctes += s"""wt$t AS (SELECT b.f_n_chars, b.f_n_tokens, b.y,
           |  CAST($wExpr AS BIGINT) AS w FROM $from)""".stripMargin
        ctes += s"""m$t AS (
           |  SELECT 'n_chars' AS f, f_n_chars AS v, y, w FROM wt$t
           |  UNION ALL
           |  SELECT 'n_tokens', f_n_tokens, y, w FROM wt$t)""".stripMargin
        ctes += s"""pv$t AS (SELECT f, v,
           |  SUM(CASE WHEN y = 1 THEN w ELSE 0 END) AS w1,
           |  SUM(CASE WHEN y = 0 THEN w ELSE 0 END) AS w0
           |  FROM m$t GROUP BY 1, 2)""".stripMargin
        ctes += s"""c$t AS (SELECT f, v,
           |  SUM(w0) OVER (PARTITION BY f ORDER BY v) AS cw0,
           |  SUM(w1) OVER (PARTITION BY f ORDER BY v) AS cw1,
           |  SUM(w0) OVER (PARTITION BY f) AS t0,
           |  SUM(w1) OVER (PARTITION BY f) AS t1 FROM pv$t)""".stripMargin
        ctes += s"""e$t AS (
           |  SELECT f, v, 1 AS pol, cw0 + t1 - cw1 AS err,
           |    t0 + t1 AS tw FROM c$t
           |  UNION ALL
           |  SELECT f, v, 0, cw1 + t0 - cw0, t0 + t1 FROM c$t)""".stripMargin
        ctes += s"""p$t AS (SELECT f, CAST(v AS BIGINT) AS v, pol,
           |  CAST(err AS BIGINT) AS err, CAST(tw AS BIGINT) AS tw
           |  FROM e$t ORDER BY err, f, v, pol LIMIT 1)""".stripMargin
        val votes = (1 to t).map(k =>
          s"(CASE WHEN ${predSql(s"p$k")} = 1 THEN 1 ELSE -1 END)")
          .mkString(" + ")
        val fromA = ("base b" +: (1 to t).map(k => s"p$k")).mkString(", ")
        ctes += s"""a$t AS (SELECT
           |  CAST(SUM(CASE WHEN (CASE WHEN ($votes) > 0 THEN 1 ELSE 0
           |    END) = b.y THEN 1 ELSE 0 END) AS BIGINT) AS correct,
           |  COUNT(*) AS n FROM $fromA)""".stripMargin
      }
      val out = (1 to rounds).map { t =>
        s"""SELECT $t AS round, p$t.f AS feature, p$t.v AS threshold,
           |  p$t.pol AS polarity, p$t.err AS weighted_err,
           |  p$t.tw AS total_weight, a$t.correct AS ensemble_correct,
           |  a$t.n AS n_rows FROM p$t, a$t""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ${ctes.mkString(",\n")}
         |$out
         |ORDER BY round""".stripMargin
    },

    // window replay of the keyed rank statistic; HUGEINT internally,
    // BIGINT at the seam (type-sensitive gate), one double dag at the end
    "ml_auc_roc" ->
      """WITH per AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN event_type IN ('click','view')
        |      THEN CAST(value AS DECIMAL(12,4))
        |      ELSE CAST(0 AS DECIMAL(12,4)) END) AS v,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY user_id
        |), keyed AS (
        |  SELECT user_id % 4 AS seg, CAST(v AS DECIMAL(12,4)) AS v, y
        |  FROM per WHERE v IS NOT NULL
        |), pv AS (
        |  SELECT seg, v, CAST(SUM(y) AS BIGINT) AS cp, COUNT(*) AS ct
        |  FROM keyed GROUP BY seg, v
        |), cum AS (
        |  SELECT seg, v, cp, ct,
        |    SUM(ct) OVER (PARTITION BY seg ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS c
        |  FROM pv
        |), agg AS (
        |  SELECT seg,
        |    CAST(SUM(cp) AS BIGINT) AS n_pos,
        |    CAST(SUM(ct - cp) AS BIGINT) AS n_neg,
        |    SUM(CAST(cp AS HUGEINT) * (2*c - ct + 1)) AS r2
        |  FROM cum GROUP BY seg
        |), fin AS (
        |  SELECT seg, n_pos, n_neg,
        |    CAST(r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS BIGINT)
        |      AS u2_pos
        |  FROM agg
        |)
        |SELECT seg, n_pos, n_neg, u2_pos,
        |  CASE WHEN n_pos > 0 AND n_neg > 0
        |    THEN CAST(u2_pos AS DOUBLE) /
        |      (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) END
        |    AS auc
        |FROM fin ORDER BY seg""".stripMargin,

    // descending-threshold replay; HUGEINT products, // floor-divide,
    // BIGINT at the seam
    "ml_pr_auc" ->
      """WITH per AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN event_type IN ('click','view')
        |      THEN CAST(value AS DECIMAL(12,4))
        |      ELSE CAST(0 AS DECIMAL(12,4)) END) AS v,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY user_id
        |), keyed AS (
        |  SELECT user_id % 4 AS seg, CAST(v AS DECIMAL(12,4)) AS v, y
        |  FROM per WHERE v IS NOT NULL
        |), pv AS (
        |  SELECT seg, v, CAST(SUM(y) AS BIGINT) AS cp, COUNT(*) AS ct
        |  FROM keyed GROUP BY seg, v
        |), cum AS (
        |  SELECT seg, v, cp, ct,
        |    SUM(cp) OVER (PARTITION BY seg ORDER BY v DESC
        |      ROWS UNBOUNDED PRECEDING) AS cP,
        |    SUM(ct) OVER (PARTITION BY seg ORDER BY v DESC
        |      ROWS UNBOUNDED PRECEDING) AS cT
        |  FROM pv
        |), terms AS (
        |  SELECT seg, cp, ct,
        |    (CAST(cp AS HUGEINT) * cP * 1048576) // cT AS fp
        |  FROM cum
        |), agg AS (
        |  SELECT seg, CAST(SUM(cp) AS BIGINT) AS n_pos,
        |    CAST(SUM(ct - cp) AS BIGINT) AS n_neg,
        |    CAST(SUM(fp) AS BIGINT) AS ap_fp
        |  FROM terms GROUP BY seg
        |)
        |SELECT seg, n_pos, n_neg, ap_fp,
        |  CASE WHEN n_pos > 0 THEN CAST(ap_fp AS DOUBLE)
        |    / (1048576.0 * CAST(n_pos AS DOUBLE)) END AS ap
        |FROM agg ORDER BY seg""".stripMargin,

    // the 8 MM rounds unrolled as CTEs (the HITS oracle protocol):
    // HUGEINT products, // floor-divides, BIGINT at every seam
    "ml_bradley_terry" -> {
      val rounds = (1 to 8).map { r =>
        val prev = s"p${r - 1}"
        s"""s$r AS MATERIALIZED (
           |  SELECT sym.i,
           |    SUM((CAST(nij AS HUGEINT) * 1099511627776)
           |      // (pi.p + pj.p)) AS s
           |  FROM sym JOIN $prev pi ON sym.i = pi.i
           |  JOIN $prev pj ON sym.j = pj.i
           |  GROUP BY sym.i
           |), r$r AS MATERIALIZED (
           |  SELECT tw.i,
           |    CASE WHEN s > 0 THEN CAST((CAST(wins AS HUGEINT)
           |      * 1099511627776) // s AS BIGINT) ELSE 0 END AS pn
           |  FROM tw JOIN s$r ON tw.i = s$r.i
           |), t$r AS MATERIALIZED (SELECT SUM(pn) AS tot FROM r$r),
           |p$r AS MATERIALIZED (
           |  SELECT i, CAST((CAST(pn AS HUGEINT) * c * 1048576) // tot
           |    AS BIGINT) AS p
           |  FROM r$r CROSS JOIN t$r CROSS JOIN cnt
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS MATERIALIZED (
         |  SELECT l_orderkey AS o, l_linenumber AS ln,
         |    CAST(l_extendedprice AS DECIMAL(12,4)) AS ep, p_brand AS b
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |), pr AS MATERIALIZED (
         |  SELECT CASE WHEN a.ep > b.ep THEN a.b ELSE b.b END AS w,
         |    CASE WHEN a.ep > b.ep THEN b.b ELSE a.b END AS l
         |  FROM li a JOIN li b ON a.o = b.o AND a.ln < b.ln
         |  WHERE a.b <> b.b AND a.ep <> b.ep
         |), wins AS MATERIALIZED (SELECT w, l, COUNT(*) AS n FROM pr GROUP BY w, l),
         |sym AS MATERIALIZED (
         |  SELECT i, j, CAST(SUM(n) AS BIGINT) AS nij FROM (
         |    SELECT w AS i, l AS j, n FROM wins
         |    UNION ALL SELECT l AS i, w AS j, n FROM wins)
         |  GROUP BY i, j
         |), items AS MATERIALIZED (SELECT DISTINCT i FROM sym),
         |tw AS MATERIALIZED (
         |  SELECT items.i, COALESCE(ww.wins, 0) AS wins
         |  FROM items LEFT JOIN (
         |    SELECT w, CAST(SUM(n) AS BIGINT) AS wins
         |    FROM wins GROUP BY w) ww ON items.i = ww.w
         |), cnt AS MATERIALIZED (SELECT COUNT(*) AS c FROM items),
         |p0 AS MATERIALIZED (SELECT i, CAST(1048576 AS BIGINT) AS p FROM items),
         |$rounds
         |SELECT tw.i AS item, wins, games, p8.p AS strength_fp,
         |  CAST(p8.p AS DOUBLE) / 1048576.0 AS strength
         |FROM tw
         |JOIN (SELECT i, CAST(SUM(nij) AS BIGINT) AS games
         |      FROM sym GROUP BY i) g ON tw.i = g.i
         |JOIN p8 ON tw.i = p8.i
         |ORDER BY item""".stripMargin
    },

    // time-split boundary replay feeding the PSI scaffolding; FLOOR
    // (not CAST) mirrors Spark's truncating double->long on [0,100]
    "ml_psi_split" ->
      s"""WITH RECURSIVE e AS (
         |  SELECT epoch_us(ts) * 1000 AS t, value FROM events
         |  WHERE ts IS NOT NULL
         |), tot0 AS (SELECT COUNT(*) AS n FROM e),
         |pv0 AS (SELECT t, COUNT(*) AS c FROM e GROUP BY t),
         |cum0 AS (
         |  SELECT t, SUM(c) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
         |    AS cm
         |  FROM pv0
         |), b AS (
         |  SELECT MIN(t) AS tstar FROM cum0 CROSS JOIN tot0
         |  WHERE cm * 100 >= n * 70
         |), lab AS (
         |  SELECT value,
         |    CASE WHEN t <= tstar THEN 'train'
         |      WHEN t <= tstar + 86400000000000 THEN 'embargo'
         |      ELSE 'test' END AS split
         |  FROM e CROSS JOIN b
         |), src AS (
         |  SELECT CAST(FLOOR(value) AS BIGINT) AS q, split FROM lab
         |  WHERE value IS NOT NULL
         |), cb AS (
         |  SELECT LEAST(9, GREATEST(0, (q * 10) // 100)) AS bucket,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM src WHERE split = 'train' GROUP BY 1
         |), cc AS (
         |  SELECT LEAST(9, GREATEST(0, (q * 10) // 100)) AS bucket,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM src WHERE split = 'test' GROUP BY 1
         |), spine AS (SELECT CAST(UNNEST(range(10)) AS BIGINT) AS bucket),
         |j AS (
         |  SELECT s.bucket, CAST(COALESCE(cb.c, 0) AS BIGINT) AS c_base,
         |    CAST(COALESCE(cc.c, 0) AS BIGINT) AS c_cur
         |  FROM spine s LEFT JOIN cb USING (bucket)
         |  LEFT JOIN cc USING (bucket)
         |), tot AS (
         |  SELECT CAST(SUM(c_base) + 10 AS BIGINT) AS tn,
         |    CAST(SUM(c_cur) + 10 AS BIGINT) AS rn
         |  FROM j
         |), xs AS (
         |  SELECT c_base + 1 AS x FROM j
         |  UNION SELECT c_cur + 1 FROM j
         |  UNION SELECT tn FROM tot UNION SELECT rn FROM tot
         |),
         |${graft.functions.FixedLog.duckdbCte("xs")}
         |SELECT j.bucket, j.c_base, j.c_cur,
         |  CAST(lb.l + lr.l - lc.l - lt.l AS BIGINT) AS log2r_fp,
         |  CAST(((j.c_base + 1) * tot.rn - (j.c_cur + 1) * tot.tn)
         |    * (lb.l + lr.l - lc.l - lt.l) AS BIGINT) AS psi_num,
         |  CAST(tot.tn * tot.rn * 1048576 AS BIGINT) AS denom
         |FROM j CROSS JOIN tot
         |JOIN lg lb ON lb.x = j.c_base + 1
         |JOIN lg lc ON lc.x = j.c_cur + 1
         |JOIN lg lt ON lt.x = tot.tn
         |JOIN lg lr ON lr.x = tot.rn
         |ORDER BY j.bucket""".stripMargin,

    // same 0-based Bresenham bucket rule ((r*k) div n + 1) over the
    // score-desc global rank; cross-products HUGEINT -> VARCHAR-routed
    "ml_lift_table" ->
      """WITH per AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN event_type IN ('click','view')
        |      THEN CAST(value AS DECIMAL(12,4))
        |      ELSE CAST(0 AS DECIMAL(12,4)) END) AS v,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY user_id
        |), keyed AS (
        |  SELECT user_id AS id, CAST(v AS DECIMAL(12,4)) AS v, y
        |  FROM per WHERE v IS NOT NULL
        |), nn AS (SELECT COUNT(*) AS n FROM keyed),
        |rk AS (
        |  SELECT id, v, y,
        |    ROW_NUMBER() OVER (ORDER BY v DESC, id) - 1 AS r
        |  FROM keyed
        |), bk AS (
        |  SELECT y, CAST((r * 10) // n + 1 AS BIGINT) AS decile
        |  FROM rk CROSS JOIN nn
        |), per2 AS (
        |  SELECT decile, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos
        |  FROM bk GROUP BY decile
        |), cum AS (
        |  SELECT decile, n, n_pos,
        |    CAST(SUM(n) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum_n,
        |    CAST(SUM(n_pos) OVER (ORDER BY decile
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos
        |  FROM per2
        |), tot AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS tn,
        |    CAST(SUM(n_pos) AS BIGINT) AS tp
        |  FROM per2
        |)
        |SELECT decile, n, n_pos, cum_n, cum_pos,
        |  CASE WHEN tp > 0
        |    THEN CAST(cum_pos AS DOUBLE) / CAST(tp AS DOUBLE) END AS gain,
        |  CASE WHEN tp > 0 AND cum_n > 0 THEN
        |    CAST(CAST(CAST(cum_pos AS HUGEINT) * tn AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(CAST(cum_n AS HUGEINT) * tp AS VARCHAR) AS DOUBLE)
        |  END AS lift
        |FROM cum CROSS JOIN tot ORDER BY decile""".stripMargin,

    // LOO-encode window replay feeding the same hash split, the same
    // division-free conservative rank, the same discrete q-hat
    "ml_conformal" -> {
      val bkt = s"(${graft.operators.Sampling.hashU32Sql("h")} % 100)"
      s"""WITH b AS (
         |  SELECT event_id, event_type, CAST(value AS DECIMAL(12,4)) AS v
         |  FROM events
         |), w AS (
         |  SELECT event_id, v,
         |    SUM(v) OVER (PARTITION BY event_type) AS sm,
         |    CAST(COUNT(v) OVER (PARTITION BY event_type) AS BIGINT) AS n
         |  FROM b
         |), enc AS (
         |  SELECT event_id, v,
         |    CASE WHEN v IS NOT NULL AND n > 1
         |      THEN CAST(CAST(sm - v AS VARCHAR) AS DOUBLE)
         |        / CAST(n - 1 AS DOUBLE) END AS p
         |  FROM w
         |), pt AS (
         |  SELECT event_id, CAST(p AS DECIMAL(12,4)) AS p4, v
         |  FROM enc WHERE p IS NOT NULL AND v IS NOT NULL
         |), hs AS (
         |  SELECT ABS(v - p4) AS s, md5(CAST(event_id AS VARCHAR)) AS h
         |  FROM pt
         |), sp AS (SELECT s, $bkt AS bkt FROM hs),
         |cal AS (SELECT s FROM sp WHERE bkt < 50),
         |tst AS (SELECT s FROM sp WHERE bkt >= 50),
         |pv AS (SELECT s, COUNT(*) AS c FROM cal GROUP BY s),
         |cum AS (
         |  SELECT s, SUM(c) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING)
         |    AS cm
         |  FROM pv
         |), nc AS (
         |  SELECT COALESCE(CAST(SUM(c) AS BIGINT), 0) AS n_cal FROM pv
         |), kk AS (
         |  SELECT n_cal, ((n_cal + 1) * 90 + 99) // 100 AS k FROM nc
         |), qh AS (
         |  SELECT MIN(s) AS qhat FROM cum CROSS JOIN kk WHERE cm >= k
         |), cov AS (
         |  SELECT COUNT(*) AS n_test,
         |    CAST(SUM(CASE WHEN qhat IS NULL OR s <= qhat
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
         |  FROM tst CROSS JOIN qh
         |)
         |SELECT n_cal, n_test,
         |  CAST(CAST(qhat AS VARCHAR) AS DOUBLE) AS qhat, n_covered,
         |  CASE WHEN n_test > 0 THEN CAST(n_covered AS DOUBLE)
         |    / CAST(n_test AS DOUBLE) END AS coverage
         |FROM kk CROSS JOIN cov CROSS JOIN qh""".stripMargin
    },

    // rater B replayed through TextDedup's shared lang-ID scaffolding;
    // marginal products in DECIMAL(19,0)*..., VARCHAR-routed doubles
    "ml_cohens_kappa" ->
      s"""WITH scored AS (SELECT lang,
         |    ${TextDedup.langHits}
         |  FROM documents),
         |b AS (SELECT *, ${TextDedup.langBest} AS best FROM scored),
         |r AS (SELECT lang AS ra, ${TextDedup.langChain} AS rb
         |  FROM b WHERE lang IS NOT NULL),
         |cells AS (SELECT ra, rb, COUNT(*) AS n FROM r GROUP BY ra, rb),
         |tot AS (
         |  SELECT CAST(SUM(n) AS BIGINT) AS nn,
         |    CAST(SUM(CASE WHEN ra = rb THEN n ELSE 0 END) AS BIGINT)
         |      AS diag
         |  FROM cells
         |), rs AS (
         |  SELECT ra AS l, CAST(SUM(n) AS BIGINT) AS r
         |  FROM cells GROUP BY ra
         |), cs AS (
         |  SELECT rb AS l, CAST(SUM(n) AS BIGINT) AS c
         |  FROM cells GROUP BY rb
         |), pe AS (
         |  SELECT COALESCE(CAST(SUM(CAST(rs.r AS DECIMAL(19,0)) * cs.c)
         |    AS DECIMAL(38,0)), CAST(0 AS DECIMAL(38,0))) AS pen
         |  FROM rs JOIN cs ON rs.l = cs.l
         |), fin AS (
         |  SELECT nn, diag,
         |    CAST(CAST(nn AS DECIMAL(19,0)) * diag - pen
         |      AS DECIMAL(38,0)) AS kn,
         |    CAST(CAST(nn AS DECIMAL(19,0)) * nn - pen
         |      AS DECIMAL(38,0)) AS kd
         |  FROM tot CROSS JOIN pe
         |)
         |SELECT nn AS n_items, diag AS agree,
         |  CAST(kn AS BIGINT) AS kappa_num,
         |  CAST(kd AS BIGINT) AS kappa_den,
         |  CASE WHEN kd <> 0 THEN CAST(CAST(kn AS VARCHAR) AS DOUBLE)
         |    / CAST(CAST(kd AS VARCHAR) AS DOUBLE) END AS kappa
         |FROM fin""".stripMargin,

    "ml_mcnemar" ->
      s"""WITH scored AS (SELECT lang,
         |    ${TextDedup.langHits}
         |  FROM documents),
         |b AS (SELECT *, ${TextDedup.langBest} AS best FROM scored),
         |r AS (SELECT ('en' = lang) AS ra,
         |    (${TextDedup.langChain}) = lang AS rb
         |  FROM b WHERE lang IS NOT NULL),
         |cells AS (
         |  SELECT COUNT(*) AS n_items,
         |    CAST(SUM(CASE WHEN ra AND rb THEN 1 ELSE 0 END) AS BIGINT)
         |      AS both_right,
         |    CAST(SUM(CASE WHEN NOT ra AND NOT rb THEN 1 ELSE 0 END)
         |      AS BIGINT) AS both_wrong,
         |    CAST(SUM(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END)
         |      AS BIGINT) AS b_only_wrong,
         |    CAST(SUM(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END)
         |      AS BIGINT) AS a_only_wrong
         |  FROM r)
         |SELECT *,
         |  GREATEST(ABS(b_only_wrong - a_only_wrong) - 1, 0)
         |    * GREATEST(ABS(b_only_wrong - a_only_wrong) - 1, 0)
         |    AS chi2_num,
         |  b_only_wrong + a_only_wrong AS chi2_den,
         |  CASE WHEN b_only_wrong + a_only_wrong > 0 THEN
         |    CAST(GREATEST(ABS(b_only_wrong - a_only_wrong) - 1, 0)
         |        * GREATEST(ABS(b_only_wrong - a_only_wrong) - 1, 0)
         |        AS DOUBLE)
         |      / CAST(b_only_wrong + a_only_wrong AS DOUBLE) END AS chi2
         |FROM cells""".stripMargin,

    "ml_classification_report" ->
      s"""WITH scored AS (SELECT lang,
         |    ${TextDedup.langHits}
         |  FROM documents),
         |b AS (SELECT *, ${TextDedup.langBest} AS best FROM scored),
         |r AS (SELECT lang AS y, ${TextDedup.langChain} AS p
         |  FROM b WHERE lang IS NOT NULL),
         |cells AS (SELECT y, p, COUNT(*) AS n FROM r GROUP BY y, p),
         |byl AS (SELECT y AS class, CAST(SUM(n) AS BIGINT) AS support,
         |    CAST(SUM(CASE WHEN p = y THEN n ELSE 0 END) AS BIGINT) AS tp
         |  FROM cells GROUP BY y),
         |byp AS (SELECT p AS class, CAST(SUM(n) AS BIGINT) AS pred_n
         |  FROM cells GROUP BY p),
         |j AS (SELECT COALESCE(byl.class, byp.class) AS class,
         |    COALESCE(support, 0) AS support, COALESCE(tp, 0) AS tp,
         |    COALESCE(pred_n, 0) - COALESCE(tp, 0) AS fp,
         |    COALESCE(support, 0) - COALESCE(tp, 0) AS fn
         |  FROM byl FULL OUTER JOIN byp ON byl.class = byp.class)
         |SELECT class, support, tp, CAST(fp AS BIGINT) AS fp,
         |  CAST(fn AS BIGINT) AS fn,
         |  CASE WHEN tp + fp > 0
         |    THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END
         |    AS "precision",
         |  CASE WHEN support > 0
         |    THEN CAST(tp AS DOUBLE) / CAST(support AS DOUBLE) END
         |    AS recall,
         |  CASE WHEN 2 * tp + fp + fn > 0
         |    THEN (2.0 * CAST(tp AS DOUBLE))
         |      / CAST(2 * tp + fp + fn AS DOUBLE) END AS f1
         |FROM j ORDER BY class""".stripMargin,

    "ml_best_f1" ->
      """WITH base0 AS (
        |  SELECT user_id % 3 AS segment,
        |    CAST(value AS DECIMAL(12,4)) AS v,
        |    CASE WHEN event_type IS NULL THEN NULL
        |      WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL),
        |base AS (SELECT * FROM base0 WHERE y IN (0, 1)),
        |perval AS (SELECT segment, v, CAST(SUM(y) AS BIGINT) AS cp,
        |    COUNT(*) AS ct
        |  FROM base GROUP BY 1, 2),
        |cum AS (SELECT *,
        |    SUM(cp) OVER wd AS tp, SUM(ct) OVER wd AS pred,
        |    SUM(cp) OVER (PARTITION BY segment) AS p
        |  FROM perval
        |  WINDOW wd AS (PARTITION BY segment ORDER BY v DESC
        |    ROWS UNBOUNDED PRECEDING)),
        |f AS (SELECT * FROM cum WHERE p > 0),
        |scored AS (SELECT *,
        |    (CAST(tp AS HUGEINT) * 2097152) // (pred + p) AS f1fp
        |  FROM f),
        |best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY segment
        |    ORDER BY f1fp DESC, v) AS rn
        |  FROM scored)
        |SELECT CAST(segment AS BIGINT) AS segment,
        |  CAST(CAST(v AS VARCHAR) AS DOUBLE) AS threshold,
        |  CAST(tp AS BIGINT) AS tp, CAST(pred - tp AS BIGINT) AS fp,
        |  CAST(p - tp AS BIGINT) AS fn, CAST(f1fp AS BIGINT) AS f1_fp,
        |  2.0 * CAST(tp AS DOUBLE) / CAST(pred + p AS DOUBLE) AS f1
        |FROM best WHERE rn = 1 ORDER BY segment""".stripMargin,

    "ml_decision_stump" ->
      """WITH base AS (
        |  SELECT source,
        |    CAST(n_chars AS DECIMAL(12,4)) AS v,
        |    CASE WHEN lang IS NULL THEN NULL
        |      WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |fbase AS (SELECT * FROM base WHERE v IS NOT NULL AND y IN (0, 1)),
        |perval AS (SELECT source, v, CAST(SUM(y) AS BIGINT) AS cp,
        |    COUNT(*) AS ct
        |  FROM fbase GROUP BY source, v),
        |cum AS (SELECT *,
        |    SUM(ct) OVER (PARTITION BY source ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS nl,
        |    SUM(cp) OVER (PARTITION BY source ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS pl,
        |    SUM(ct) OVER (PARTITION BY source) AS n,
        |    SUM(cp) OVER (PARTITION BY source) AS p
        |  FROM perval),
        |f AS (SELECT *, n - nl AS nr, p - pl AS pr FROM cum
        |  WHERE nl < n),
        |scored AS (SELECT *,
        |    ((CAST(pl AS HUGEINT) * pl
        |        + CAST(nl - pl AS HUGEINT) * (nl - pl)) * 1048576) // nl
        |    + ((CAST(pr AS HUGEINT) * pr
        |        + CAST(nr - pr AS HUGEINT) * (nr - pr)) * 1048576) // nr
        |      AS score_fp
        |  FROM f),
        |best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY score_fp DESC, v) AS rn
        |  FROM scored)
        |SELECT source, CAST(CAST(v AS VARCHAR) AS DOUBLE) AS threshold,
        |  CAST(nl AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS pos_left,
        |  CAST(nr AS BIGINT) AS n_right, CAST(pr AS BIGINT) AS pos_right,
        |  CAST(score_fp AS BIGINT) AS split_score_fp,
        |  CAST(score_fp AS DOUBLE) / 1048576.0 / CAST(n AS DOUBLE)
        |    - CAST(CAST(p AS HUGEINT) * p
        |        + CAST(n - p AS HUGEINT) * (n - p) AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS gini_gain
        |FROM best WHERE rn = 1 ORDER BY source""".stripMargin,

    // full replay: same hash, same integer thresholds (generated from
    // the one Scala constant table), same discrete rank selection
    "ml_bootstrap_ci" -> {
      val wSql = graft.operators.Hypothesis.PoissonThresholds
        .map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH base AS (
         |  SELECT event_type, event_id AS id,
         |    CAST(value AS DECIMAL(12,4)) AS v
         |  FROM events WHERE value IS NOT NULL
         |), expl AS (
         |  SELECT event_type, id, v, b FROM base
         |  CROSS JOIN (SELECT unnest(generate_series(0, 39)) AS b)
         |), hs AS (
         |  SELECT event_type, v, b,
         |    substring(md5(CAST(id AS VARCHAR) || '#'
         |      || CAST(b // 4 AS VARCHAR)), 1 + (b % 4) * 8, 8) AS h
         |  FROM expl
         |), hw AS (
         |  SELECT event_type, v, b,
         |    ${graft.operators.Sampling.hashU32Sql("h")} AS u
         |  FROM hs
         |), ww AS (
         |  SELECT event_type, v, b, $wSql AS w FROM hw
         |), rep AS (
         |  SELECT event_type, b, SUM(w * v) AS s,
         |    CAST(SUM(w) AS BIGINT) AS n
         |  FROM ww GROUP BY event_type, b
         |), mm AS (
         |  SELECT event_type, b,
         |    CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS m
         |  FROM rep WHERE n > 0
         |), rk AS (
         |  SELECT event_type, b, m,
         |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY m, b)
         |      AS rn,
         |    COUNT(*) OVER (PARTITION BY event_type) AS r
         |  FROM mm
         |)
         |SELECT event_type, CAST(MAX(r) AS BIGINT) AS n_replicas,
         |  MIN(CASE WHEN rn = (r + 39) // 40 THEN m END) AS ci_lo,
         |  MIN(CASE WHEN rn = r - (r + 39) // 40 + 1 THEN m END) AS ci_hi
         |FROM rk GROUP BY event_type ORDER BY event_type""".stripMargin
    },

    // same two windows (score and ideal), discounts via the shared
    // log2_fp CTE over ranks 2..k+1, HUGEINT sums cast at the seam
    "ml_ndcg" ->
      s"""WITH RECURSIVE ranked AS (
         |  SELECT p_brand, p_partkey, p_size % 3 AS rel,
         |    ROW_NUMBER() OVER (PARTITION BY p_brand
         |      ORDER BY p_retailprice DESC, p_partkey) AS rn,
         |    ROW_NUMBER() OVER (PARTITION BY p_brand
         |      ORDER BY p_size % 3 DESC, p_partkey) AS ri
         |  FROM part WHERE p_retailprice IS NOT NULL
         |), xs AS (SELECT unnest(generate_series(2, 11)) AS x),
         |${graft.functions.FixedLog.duckdbCte("xs")},
         |disc AS (SELECT x, 1099511627776 // l AS d FROM lg),
         |dcg AS (
         |  SELECT p_brand, CAST(SUM(rel * d) AS BIGINT) AS dcg_fp,
         |    COUNT(*) AS n_items
         |  FROM ranked JOIN disc ON rn + 1 = x
         |  WHERE rn <= 10 GROUP BY p_brand
         |), idcg AS (
         |  SELECT p_brand, CAST(SUM(rel * d) AS BIGINT) AS idcg_fp
         |  FROM ranked JOIN disc ON ri + 1 = x
         |  WHERE ri <= 10 GROUP BY p_brand
         |)
         |SELECT dcg.p_brand, n_items, dcg_fp, idcg_fp,
         |  CASE WHEN idcg_fp > 0
         |    THEN CAST(dcg_fp AS DOUBLE) / CAST(idcg_fp AS DOUBLE) END
         |    AS ndcg
         |FROM dcg JOIN idcg ON dcg.p_brand = idcg.p_brand
         |ORDER BY dcg.p_brand""".stripMargin,

    // same tagged union + strict-before frame (1 PRECEDING); null
    // ordering never decides a boundary (labels carry non-null ids,
    // features all-null ids, sides differ at equal ts)
    "ml_pit_features" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
        |    CAST(value AS DECIMAL(12,4)) AS v
        |  FROM events
        |), u AS (
        |  SELECT event_id, user_id, ts_us, 0 AS side,
        |    CAST(NULL AS DECIMAL(12,4)) AS v
        |  FROM ev WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT CAST(NULL AS BIGINT), user_id, ts_us, 1, v
        |  FROM ev WHERE event_type = 'click'
        |), r AS (
        |  SELECT event_id, user_id, ts_us, side,
        |    COUNT(v) OVER w AS n_clicks_before,
        |    SUM(v) OVER w AS sv
        |  FROM u
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts_us, side, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |)
        |SELECT event_id, user_id, ts_us,
        |  CAST(n_clicks_before AS BIGINT) AS n_clicks_before,
        |  CAST(CAST(COALESCE(sv, CAST(0 AS DECIMAL(12,4))) AS VARCHAR)
        |    AS DOUBLE) AS sum_click_value
        |FROM r WHERE side = 0
        |ORDER BY user_id, ts_us, event_id""".stripMargin,

    // same division-free cross-multiplied thresholds; widened decimal
    // products (the DuckDB int64 multiply trap), VARCHAR-routed doubles
    "ml_label_noise" ->
      """WITH per AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN event_type IN ('click','view')
        |      THEN CAST(value AS DECIMAL(12,4))
        |      ELSE CAST(0 AS DECIMAL(12,4)) END) AS v,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY user_id
        |), b AS (
        |  SELECT CAST(v AS DECIMAL(12,4)) AS s, y FROM per
        |  WHERE v IS NOT NULL
        |), st AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(y) AS BIGINT) AS n_pos,
        |    CAST(SUM(1 - y) AS BIGINT) AS n_neg,
        |    SUM(CASE WHEN y = 1 THEN s ELSE CAST(0 AS DECIMAL(12,4)) END)
        |      AS s1,
        |    SUM(CASE WHEN y = 0 THEN s ELSE CAST(0 AS DECIMAL(12,4)) END)
        |      AS s0
        |  FROM b
        |), fl AS (
        |  SELECT MAX(n) AS n, MAX(n_pos) AS n_pos, MAX(n_neg) AS n_neg,
        |    MAX(s1) AS s1, MAX(s0) AS s0,
        |    CAST(SUM(CASE WHEN y = 0 AND n_pos > 0
        |      AND CAST(s AS DECIMAL(19,4)) * n_pos >= s1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_in_neg,
        |    CAST(SUM(CASE WHEN y = 1 AND n_neg > 0
        |      AND CAST(s AS DECIMAL(19,4)) * n_neg <= s0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_in_pos
        |  FROM b CROSS JOIN st
        |)
        |SELECT n, n_pos, n_neg,
        |  CASE WHEN n_pos > 0 THEN CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
        |    / CAST(n_pos AS DOUBLE) END AS t_pos,
        |  CASE WHEN n_neg > 0 THEN CAST(CAST(s0 AS VARCHAR) AS DOUBLE)
        |    / CAST(n_neg AS DOUBLE) END AS t_neg,
        |  n_flag_in_neg, n_flag_in_pos,
        |  CASE WHEN n > 0
        |    THEN CAST(n_flag_in_neg + n_flag_in_pos AS DOUBLE)
        |      / CAST(n AS DOUBLE) END AS noise_rate
        |FROM fl""".stripMargin,

    // same window, MIN first-hit rank, 2^20 // rank reciprocals
    "ml_mrr" ->
      """WITH ranked AS (
        |  SELECT p_brand,
        |    p_size % 3 AS rel,
        |    ROW_NUMBER() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part WHERE p_retailprice IS NOT NULL
        |), fh AS (
        |  SELECT p_brand, MIN(rn) AS r FROM ranked
        |  WHERE rel > 0 AND rn <= 10 GROUP BY p_brand
        |), hits AS (
        |  SELECT COALESCE(COUNT(*), 0) AS n_hit,
        |    COALESCE(CAST(SUM(1048576 // r) AS BIGINT), 0) AS mrr_fp_sum
        |  FROM fh
        |), nq AS (
        |  SELECT COUNT(DISTINCT p_brand) AS n_queries FROM part
        |  WHERE p_retailprice IS NOT NULL
        |)
        |SELECT n_queries, n_hit, mrr_fp_sum,
        |  CASE WHEN n_queries > 0 THEN CAST(mrr_fp_sum AS DOUBLE)
        |    / (1048576.0 * CAST(n_queries AS DOUBLE)) END AS mrr
        |FROM nq CROSS JOIN hits""".stripMargin,

    // exact decimal binning (no float edges); decimal sums -> double
    // through VARCHAR per the parity rule
    "ml_fairness_gaps" ->
      """WITH base AS (
        |  SELECT user_id % 3 AS segment,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
        |    CASE WHEN value >= 50.0 THEN 1 ELSE 0 END AS p
        |  FROM events WHERE value IS NOT NULL),
        |per AS (
        |  SELECT segment, COUNT(*) AS n,
        |    CAST(SUM(y * p) AS BIGINT) AS tp,
        |    CAST(SUM((1 - y) * p) AS BIGINT) AS fp,
        |    CAST(SUM(y * (1 - p)) AS BIGINT) AS fn,
        |    CAST(SUM((1 - y) * (1 - p)) AS BIGINT) AS tn
        |  FROM base GROUP BY 1),
        |rates AS (
        |  SELECT segment, n, tp, fp, fn, tn,
        |    CAST(tp + fp AS DOUBLE) / CAST(n AS DOUBLE) AS sel_rate,
        |    CASE WHEN tp + fn > 0 THEN
        |      CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS tpr,
        |    CASE WHEN fp + tn > 0 THEN
        |      CAST(fp AS DOUBLE) / CAST(fp + tn AS DOUBLE) END AS fpr
        |  FROM per),
        |gaps AS (
        |  SELECT MAX(sel_rate) - MIN(sel_rate) AS dp_gap,
        |    GREATEST(MAX(tpr) - MIN(tpr), MAX(fpr) - MIN(fpr)) AS eo_gap
        |  FROM rates)
        |SELECT CAST(segment AS BIGINT) AS segment, n, tp, fp, fn, tn,
        |  sel_rate, tpr, fpr, dp_gap, eo_gap
        |FROM rates CROSS JOIN gaps ORDER BY segment""".stripMargin,

    "ml_brier" ->
      """WITH base AS (
        |  SELECT CAST(value / 100.0 AS DECIMAL(12,4)) AS s,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events
        |  WHERE value IS NOT NULL
        |), dom AS (
        |  SELECT CAST(s * 10000 AS BIGINT) - y * 10000 AS d
        |  FROM base WHERE s >= 0 AND s <= 1
        |)
        |SELECT COUNT(*) AS n_items,
        |  CAST(SUM(CAST(d AS HUGEINT) * d) AS BIGINT) AS brier_num8,
        |  CASE WHEN COUNT(*) > 0 THEN
        |    CAST(CAST(SUM(CAST(d AS HUGEINT) * d) AS VARCHAR) AS DOUBLE)
        |      / (CAST(COUNT(*) AS DOUBLE) * 100000000.0) END AS brier
        |FROM dom""".stripMargin,

    "ml_ece" ->
      """WITH base AS (
        |  SELECT CAST(value / 100.0 AS DECIMAL(12,4)) AS s,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events
        |  WHERE value IS NOT NULL
        |), dom AS (
        |  SELECT s, y FROM base WHERE s >= 0 AND s <= 1
        |), binned AS (
        |  SELECT LEAST(9, CAST(FLOOR(s * 10) AS INT)) AS bin, s, y
        |  FROM dom
        |), agg AS (
        |  SELECT bin, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS p,
        |    CAST(SUM(CAST(s * 10000 AS BIGINT)) AS BIGINT) AS ss4
        |  FROM binned GROUP BY bin
        |)
        |SELECT CAST(SUM(n) AS BIGINT) AS n_items,
        |  CAST(SUM(ABS(ss4 - p * 10000)) AS BIGINT) AS ece_num4,
        |  CASE WHEN SUM(n) > 0 THEN
        |    CAST(SUM(ABS(ss4 - p * 10000)) AS DOUBLE)
        |      / (CAST(SUM(n) AS DOUBLE) * 10000.0) END AS ece
        |FROM agg""".stripMargin,

    "ml_calibration_bins" ->
      """WITH base AS (
        |  SELECT CAST(value / 100.0 AS DECIMAL(12,4)) AS s,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events
        |  WHERE value IS NOT NULL
        |), dom AS (
        |  SELECT s, y FROM base WHERE s >= 0 AND s <= 1
        |), binned AS (
        |  SELECT LEAST(9, CAST(FLOOR(s * 10) AS INT)) AS bin, s, y
        |  FROM dom
        |), agg AS (
        |  SELECT bin, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
        |    SUM(s) AS ss
        |  FROM binned GROUP BY bin
        |), fin AS (
        |  SELECT bin, n, n_pos,
        |    CAST(CAST(ss AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
        |      AS conf,
        |    CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS acc
        |  FROM agg
        |)
        |SELECT bin, n, n_pos, conf, acc, ABS(conf - acc) AS gap
        |FROM fin ORDER BY bin""".stripMargin,

    // counts + four lookups into the shared log2_fp CTE (one per WOE
    // term); the double readout is one division by 2^20
    "ml_woe_encode" ->
      s"""WITH RECURSIVE pc AS (
         |  SELECT source,
         |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS np,
         |    CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
         |      AS nn
         |  FROM documents WHERE source IS NOT NULL GROUP BY source
         |), tot AS (
         |  SELECT CAST(SUM(np) AS BIGINT) AS pt,
         |    CAST(SUM(nn) AS BIGINT) AS nt, COUNT(*) AS c
         |  FROM pc
         |), xs AS (
         |  SELECT np + 1 AS x FROM pc UNION
         |  SELECT nn + 1 FROM pc UNION
         |  SELECT pt + c FROM tot UNION
         |  SELECT nt + c FROM tot
         |),
         |${graft.functions.FixedLog.duckdbCte("xs")},
         |fin AS (
         |  SELECT pc.source, pc.np, pc.nn,
         |    (lp.l - lpt.l) - (lq.l - lnt.l) AS wfp
         |  FROM pc CROSS JOIN tot
         |  JOIN lg lp ON pc.np + 1 = lp.x
         |  JOIN lg lq ON pc.nn + 1 = lq.x
         |  JOIN lg lpt ON tot.pt + tot.c = lpt.x
         |  JOIN lg lnt ON tot.nt + tot.c = lnt.x
         |)
         |SELECT source, np AS n_pos, nn AS n_neg,
         |  CAST(wfp AS BIGINT) AS woe_fp,
         |  CAST(wfp AS DOUBLE) / 1048576.0 AS woe
         |FROM fin ORDER BY source""".stripMargin,

    // WOE CTE extended with the exact-rational IV sum; x ln2 converts
    // the log2-based WOE to conventional natural-log IV units
    "ml_information_value" ->
      s"""WITH RECURSIVE pc AS (
         |  SELECT source,
         |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS np,
         |    CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
         |      AS nn
         |  FROM documents WHERE source IS NOT NULL GROUP BY source
         |), tot AS (
         |  SELECT CAST(SUM(np) AS BIGINT) AS pt,
         |    CAST(SUM(nn) AS BIGINT) AS nt, COUNT(*) AS c
         |  FROM pc
         |), xs AS (
         |  SELECT np + 1 AS x FROM pc UNION
         |  SELECT nn + 1 FROM pc UNION
         |  SELECT pt + c FROM tot UNION
         |  SELECT nt + c FROM tot
         |),
         |${graft.functions.FixedLog.duckdbCte("xs")},
         |woe AS (
         |  SELECT pc.np, pc.nn, tot.pt, tot.nt,
         |    (lp.l - lpt.l) - (lq.l - lnt.l) AS wfp
         |  FROM pc CROSS JOIN tot
         |  JOIN lg lp ON pc.np + 1 = lp.x
         |  JOIN lg lq ON pc.nn + 1 = lq.x
         |  JOIN lg lpt ON tot.pt + tot.c = lpt.x
         |  JOIN lg lnt ON tot.nt + tot.c = lnt.x
         |), terms AS (
         |  SELECT np, nn, pt, nt,
         |    (CAST(np AS HUGEINT) * nt - CAST(nn AS HUGEINT) * pt) * wfp
         |      AS term
         |  FROM woe
         |), fin AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_categories,
         |    CAST(SUM(term) AS BIGINT) AS iv_num,
         |    CAST(MAX(CAST(pt AS HUGEINT) * nt * 1048576)
         |      AS BIGINT) AS iv_den
         |  FROM terms
         |)
         |SELECT n_categories, iv_num, iv_den,
         |  CASE WHEN iv_den > 0
         |    THEN CAST(CAST(iv_num AS VARCHAR) AS DOUBLE)
         |      / CAST(CAST(iv_den AS VARCHAR) AS DOUBLE)
         |      * 0.6931471805599453 END AS iv
         |FROM fin""".stripMargin,

    // same indexed-draw protocol: dense corpus index by id order, md5
    // nibble hash mod N per (query, draw), positive exclusion, first-k
    // surviving draws in draw order
    "ml_negative_sample" ->
      s"""WITH pos AS (
         |  SELECT DISTINCT l_orderkey AS query_id, l_partkey AS pos_id
         |  FROM lineitem
         |), ids AS (SELECT DISTINCT p_partkey AS neg_id FROM part),
         |idx AS (
         |  SELECT neg_id,
         |    CAST(ROW_NUMBER() OVER (ORDER BY neg_id) - 1 AS BIGINT) AS i
         |  FROM ids
         |), cnt AS (SELECT COUNT(*) AS n FROM ids),
         |q AS (SELECT DISTINCT query_id FROM pos),
         |draws AS (
         |  SELECT query_id, j,
         |    md5(CAST(query_id AS VARCHAR) || '#' || CAST(j AS VARCHAR))
         |      AS h
         |  FROM q CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS j)
         |), dv AS (
         |  SELECT query_id, j,
         |    ${graft.operators.Sampling.hashU32Sql("h")} % n AS i
         |  FROM draws CROSS JOIN cnt
         |), cand AS (
         |  SELECT d.query_id, d.j, x.neg_id
         |  FROM dv d JOIN idx x ON d.i = x.i
         |  WHERE NOT EXISTS (SELECT 1 FROM pos p
         |    WHERE p.query_id = d.query_id AND p.pos_id = x.neg_id)
         |), dd AS (
         |  SELECT query_id, neg_id, MIN(j) AS j
         |  FROM cand GROUP BY query_id, neg_id
         |), rk AS (
         |  SELECT query_id, neg_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY j, neg_id) AS rank
         |  FROM dd
         |)
         |SELECT query_id, rank, neg_id FROM rk WHERE rank <= 2
         |ORDER BY query_id, rank""".stripMargin,

    // rank + offset self-join replay, both directions unioned
    "ml_skipgram_pairs" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) * 1000 AS t, event_type AS it
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), rk AS (
        |  SELECT user_id, it,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t, it)
        |      AS pos
        |  FROM e
        |), offs AS (SELECT unnest(generate_series(1, 2)) AS off),
        |j AS (
        |  SELECT a.it AS ta, b.it AS tb, o.off AS distance
        |  FROM rk a CROSS JOIN offs o
        |  JOIN rk b ON a.user_id = b.user_id AND a.pos + o.off = b.pos
        |), pairs AS (
        |  SELECT ta AS target, tb AS context, distance FROM j
        |  UNION ALL
        |  SELECT tb, ta, distance FROM j
        |)
        |SELECT target, context, distance, COUNT(*) AS n_pairs
        |FROM pairs GROUP BY target, context, distance
        |ORDER BY target, context, distance""".stripMargin,

    // same integer-nanos lag arithmetic over epoch_us * 1000
    "profile_freshness" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) * 1000 AS t FROM events
        |), g AS (SELECT MAX(t) AS gmax FROM e),
        |per AS (
        |  SELECT event_type, COUNT(*) AS n_rows,
        |    CAST(MAX(t) AS BIGINT) AS max_ts
        |  FROM e GROUP BY event_type
        |), ld AS (
        |  SELECT event_type, COUNT(*) AS n_last_day
        |  FROM e CROSS JOIN g WHERE t > gmax - 86400000000000
        |  GROUP BY event_type
        |)
        |SELECT per.event_type, per.n_rows, per.max_ts,
        |  CAST(gmax - per.max_ts AS BIGINT) AS lag_ns,
        |  CAST(COALESCE(ld.n_last_day, 0) AS BIGINT) AS n_last_day,
        |  (gmax - per.max_ts > 86400000000000) AS stale
        |FROM per CROSS JOIN g LEFT JOIN ld USING (event_type)
        |ORDER BY per.event_type""".stripMargin,

    // same positive fixed-point E-S key through the shared log CTE
    "sample_weighted_k" -> {
      val u32 = graft.operators.Sampling.hashU32Sql("h")
      s"""WITH RECURSIVE src AS (
         |  SELECT o_orderkey, o_custkey, o_totalprice,
         |    CAST(CAST(o_totalprice AS DECIMAL(12,4)) * 100 AS BIGINT)
         |      AS wt,
         |    md5(CAST(o_orderkey AS VARCHAR)) AS h
         |  FROM orders
         |), wu AS (
         |  SELECT o_orderkey, o_custkey, o_totalprice, wt,
         |    $u32 + 1 AS u
         |  FROM src WHERE wt > 0
         |), xs AS (SELECT DISTINCT u AS x FROM wu),
         |${graft.functions.FixedLog.duckdbCte("xs")},
         |keyed AS (
         |  SELECT wu.o_orderkey, wu.o_custkey, wu.o_totalprice,
         |    ((33554432 - lg.l) * 1048576) // wt AS k
         |  FROM wu JOIN lg ON wu.u = lg.x
         |)
         |SELECT o_orderkey, o_custkey, o_totalprice FROM keyed
         |ORDER BY k, o_orderkey LIMIT 100""".stripMargin
    },

    // same 0-based Bresenham segment rule over the (ts, id) global rank
    "ml_rolling_origin" ->
      """WITH e AS (
        |  SELECT epoch_us(ts) * 1000 AS t, event_id FROM events
        |), nn AS (SELECT COUNT(*) AS n FROM e),
        |rk AS (
        |  SELECT t, ROW_NUMBER() OVER (ORDER BY t, event_id) - 1 AS r
        |  FROM e
        |), seg AS (
        |  SELECT t, CAST((r * 5) // n + 1 AS BIGINT) AS segment
        |  FROM rk CROSS JOIN nn
        |)
        |SELECT segment, COUNT(*) AS n_rows,
        |  CAST(MIN(t) AS BIGINT) AS min_ts, CAST(MAX(t) AS BIGINT) AS max_ts
        |FROM seg GROUP BY segment ORDER BY segment""".stripMargin,

    // same division-free discrete percentile (100*cum >= N*pct) over
    // epoch-nanos, same three-way labeling
    "ml_time_split" ->
      """WITH e AS (SELECT epoch_us(ts) * 1000 AS t FROM events
        |  WHERE ts IS NOT NULL),
        |tot AS (SELECT COUNT(*) AS n FROM e),
        |pv AS (SELECT t, COUNT(*) AS c FROM e GROUP BY t),
        |cum AS (
        |  SELECT t, SUM(c) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
        |    AS cm
        |  FROM pv
        |), b AS (
        |  SELECT MIN(t) AS tstar FROM cum CROSS JOIN tot
        |  WHERE cm * 100 >= n * 70
        |), lab AS (
        |  SELECT t,
        |    CASE WHEN t <= tstar THEN 'train'
        |      WHEN t <= tstar + 86400000000000 THEN 'embargo'
        |      ELSE 'test' END AS split
        |  FROM e CROSS JOIN b
        |)
        |SELECT split, COUNT(*) AS n_rows,
        |  CAST(MIN(t) AS BIGINT) AS min_ts, CAST(MAX(t) AS BIGINT) AS max_ts
        |FROM lab GROUP BY split ORDER BY split""".stripMargin,

    // highest-random-weight replay: score all 8 candidates per doc with
    // the same md5 nibble hash, keep the argmax (ties to higher shard)
    "ml_shard_rendezvous" ->
      s"""WITH cand AS (
         |  SELECT doc_id, s,
         |    md5(CAST(doc_id AS VARCHAR) || '#' || CAST(s AS VARCHAR))
         |      AS h
         |  FROM documents
         |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS s)
         |), scored AS (
         |  SELECT doc_id, s,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY ${graft.operators.Sampling.hashU32Sql("h")} DESC,
         |        s DESC) AS rn
         |  FROM cand
         |)
         |SELECT s AS shard, COUNT(*) AS n_docs,
         |  CAST(SUM(doc_id) AS BIGINT) AS sum_id
         |FROM scored WHERE rn = 1
         |GROUP BY s ORDER BY shard""".stripMargin,

    // same two lower medians via window prefix sums; decimal -> double
    // through VARCHAR, identical dag association
    "ml_robust_scale" ->
      """WITH b AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(l_quantity AS DECIMAL(12,4)) AS q4
        |  FROM lineitem
        |), pv AS (SELECT q4 AS v, COUNT(*) AS c FROM b
        |  WHERE q4 IS NOT NULL GROUP BY q4),
        |cum AS (SELECT v, SUM(c) OVER (ORDER BY v
        |  ROWS UNBOUNDED PRECEDING) AS cm FROM pv),
        |nn AS (SELECT SUM(c) AS n FROM pv),
        |med AS (SELECT MIN(v) AS med FROM cum CROSS JOIN nn
        |  WHERE cm * 2 >= n),
        |dv AS (SELECT ABS(q4 - med) AS d FROM b CROSS JOIN med
        |  WHERE q4 IS NOT NULL),
        |dpv AS (SELECT d, COUNT(*) AS c FROM dv GROUP BY d),
        |dcum AS (SELECT d, SUM(c) OVER (ORDER BY d
        |  ROWS UNBOUNDED PRECEDING) AS cm FROM dpv),
        |dnn AS (SELECT SUM(c) AS n FROM dpv),
        |mad AS (SELECT MIN(d) AS mad FROM dcum CROSS JOIN dnn
        |  WHERE cm * 2 >= n)
        |SELECT l_orderkey, l_linenumber,
        |  CASE WHEN mad > 0
        |    THEN CAST(CAST(q4 - med AS VARCHAR) AS DOUBLE)
        |      / (CAST(CAST(mad AS VARCHAR) AS DOUBLE) * 1.4826)
        |  END AS rz_qty
        |FROM b CROSS JOIN med CROSS JOIN mad
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // same rank-selected lower median and (count desc, value) mode
    "ml_impute" ->
      """WITH e AS (
        |  SELECT event_id, user_id,
        |    CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END
        |      AS value,
        |    CASE WHEN event_id % 17 = 0 THEN NULL ELSE event_type END
        |      AS etype
        |  FROM events
        |), nv AS (
        |  SELECT user_id, value FROM e WHERE value IS NOT NULL
        |), mr AS (
        |  SELECT user_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value)
        |      AS rk,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n
        |  FROM nv
        |), med AS (
        |  SELECT user_id, MIN(value) AS mv FROM mr
        |  WHERE 2 * rk = n OR 2 * rk = n + 1 GROUP BY user_id
        |), cv AS (
        |  SELECT user_id, etype, COUNT(*) AS c FROM e
        |  WHERE etype IS NOT NULL GROUP BY 1, 2
        |), md AS (
        |  SELECT user_id, etype AS me FROM (
        |    SELECT user_id, etype, ROW_NUMBER() OVER (
        |      PARTITION BY user_id ORDER BY c DESC, etype) AS rk
        |    FROM cv) WHERE rk = 1
        |)
        |SELECT e.event_id, e.user_id,
        |  COALESCE(e.value, m.mv) AS value,
        |  COALESCE(e.etype, d.me) AS etype,
        |  (e.value IS NULL AND m.mv IS NOT NULL) AS imp_value,
        |  (e.etype IS NULL AND d.me IS NOT NULL) AS imp_etype
        |FROM e LEFT JOIN med m USING (user_id)
        |LEFT JOIN md d USING (user_id)
        |ORDER BY event_id""".stripMargin,

    // same sufficient-stat dag; decimal -> double through VARCHAR, the
    // variance from (q - s*s/n)/(n-1) with identical association
    "ml_feature_scale" ->
      """WITH b AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(l_quantity AS DECIMAL(12,4)) AS q4,
        |    CAST(l_extendedprice AS DECIMAL(12,4)) AS p4
        |  FROM lineitem
        |), st AS (
        |  SELECT
        |    CAST(COUNT(q4) AS DOUBLE) AS nq,
        |    CAST(CAST(SUM(q4) AS VARCHAR) AS DOUBLE) AS sq,
        |    CAST(CAST(SUM(CAST(q4 AS DECIMAL(19,4)) * q4) AS VARCHAR)
        |      AS DOUBLE) AS qq,
        |    CAST(COUNT(p4) AS DOUBLE) AS np,
        |    CAST(CAST(SUM(p4) AS VARCHAR) AS DOUBLE) AS sp,
        |    CAST(CAST(SUM(CAST(p4 AS DECIMAL(19,4)) * p4) AS VARCHAR)
        |      AS DOUBLE) AS qp
        |  FROM b
        |), v AS (
        |  SELECT (qq - sq*sq/nq) / (nq - 1.0) AS vq,
        |    (qp - sp*sp/np) / (np - 1.0) AS vp, nq, sq, np, sp
        |  FROM st
        |)
        |SELECT l_orderkey, l_linenumber,
        |  CASE WHEN nq > 1 AND vq > 0
        |    THEN (CAST(CAST(q4 AS VARCHAR) AS DOUBLE) - sq/nq) / sqrt(vq)
        |  END AS z_qty,
        |  CASE WHEN np > 1 AND vp > 0
        |    THEN (CAST(CAST(p4 AS VARCHAR) AS DOUBLE) - sp/np) / sqrt(vp)
        |  END AS z_price
        |FROM b CROSS JOIN v
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // same epoch salt, same md5 order, same shard modulus
    "ml_epoch_shuffle" ->
      s"""WITH b AS (
         |  SELECT doc_id, md5(concat('1:', CAST(doc_id AS VARCHAR))) AS h
         |  FROM documents
         |), s AS (
         |  SELECT doc_id, h,
         |    ${graft.operators.Sampling.hashU32Sql("h")} % 8 AS shard
         |  FROM b
         |)
         |SELECT doc_id, shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id)
         |    - 1 AS BIGINT) AS pos
         |FROM s ORDER BY shard, pos""".stripMargin,

    "ml_group_kfold" ->
      s"""WITH b AS (
         |  SELECT user_id, md5(CAST(user_id AS VARCHAR)) AS h FROM events
         |), f AS (
         |  SELECT user_id,
         |    ${graft.operators.Sampling.hashBucketSql("h", 5)} AS fold
         |  FROM b
         |)
         |SELECT fold, COUNT(*) AS n_rows,
         |  COUNT(DISTINCT user_id) AS n_users
         |FROM f GROUP BY fold ORDER BY fold""".stripMargin,

    // exactBucket replay (0-based global rank * stages // n) + the
    // epoch-hash order within stage
    "ml_curriculum" ->
      """WITH nn AS (SELECT COUNT(*) AS n FROM documents),
        |rk AS (
        |  SELECT doc_id,
        |    ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1 AS r
        |  FROM documents
        |), st AS (
        |  SELECT doc_id, CAST((r * 4) // n + 1 AS BIGINT) AS stage
        |  FROM rk CROSS JOIN nn
        |), hh AS (
        |  SELECT doc_id, stage,
        |    md5(concat('1:', CAST(doc_id AS VARCHAR))) AS h
        |  FROM st
        |)
        |SELECT doc_id, stage,
        |  CAST(ROW_NUMBER() OVER (ORDER BY stage, h, doc_id) - 1
        |    AS BIGINT) AS pos
        |FROM hh ORDER BY pos""".stripMargin,

    // same token md5: bucket from nibbles 1-8, sign from nibble 9
    "ml_feature_hash" -> {
      val nib9 = "CAST(ascii(substring(h,9,1)) - CASE WHEN " +
        "ascii(substring(h,9,1)) >= 97 THEN 87 ELSE 48 END AS BIGINT)"
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(str_split(text, ' ')) AS t
         |  FROM documents
         |), nz AS (
         |  SELECT doc_id, t, md5(t) AS h FROM tok WHERE length(t) > 0
         |), b AS (
         |  SELECT doc_id,
         |    ${graft.operators.Sampling.hashU32Sql("h")} % 128 AS bucket,
         |    CASE WHEN $nib9 % 2 = 0 THEN 1 ELSE -1 END AS sgn
         |  FROM nz
         |)
         |SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS value
         |FROM b GROUP BY doc_id, bucket
         |ORDER BY doc_id, bucket""".stripMargin
    }
  )
}
