package graft

import graft.operators.MlEval
import org.apache.spark.sql.functions._

/** Pins MlEval: ROC-AUC against hand-computed rank statistics
  * (including midrank ties and degenerate one-class keys) and
  * calibration bins against hand-binned counts; both bit-stable under
  * repartitioning. */
class MlEvalSpec extends SparkSpec {
  import spark.implicits._

  test("perfect, inverted, and random rankers hit exact AUC") {
    // scores 1..8, labels: top half positive -> AUC 1; inverted -> 0
    val perfect = (1 to 8).map(i => ("k", i.toDouble, if (i > 4) 1 else 0))
      .toDF("k", "s", "y")
    val m = MlEval.aucRoc(perfect, col("k"), col("s"), col("y"))
      .select("auc").as[Double].head()
    assert(m == 1.0)
    val inverted = (1 to 8).map(i => ("k", i.toDouble, if (i <= 4) 1 else 0))
      .toDF("k", "s", "y")
    assert(MlEval.aucRoc(inverted, col("k"), col("s"), col("y"))
      .select("auc").as[Double].head() == 0.0)
  }

  test("midrank ties match the hand-computed U") {
    // scores: pos {3, 2}, neg {2, 1}; tie at 2 -> U+ = 1*2 + 0.5 + 1 ... by
    // hand: ranks of sorted (1,2,2,3) = (1, 2.5, 2.5, 4); R+ = 2.5+4 = 6.5
    // U+ = R+ - n+(n++1)/2 = 6.5 - 3 = 3.5; AUC = 3.5/4 = 0.875
    val df = Seq(("k", 3.0, 1), ("k", 2.0, 1), ("k", 2.0, 0), ("k", 1.0, 0))
      .toDF("k", "s", "y")
    val r = MlEval.aucRoc(df, col("k"), col("s"), col("y"))
      .select("u2_pos", "auc").as[(Long, Double)].head()
    assert(r._1 == 7L) // 2*U+ exact
    assert(r._2 == 0.875)
  }

  test("one-class keys yield NULL auc, mixed keys compute per key") {
    val df = Seq(("a", 1.0, 1), ("a", 2.0, 1), // all positive
      ("b", 1.0, 0), ("b", 2.0, 1)).toDF("k", "s", "y")
    val m = MlEval.aucRoc(df, col("k"), col("s"), col("y"), "k")
      .select("k", "auc").as[(String, Option[Double])].collect().toMap
    assert(m("a").isEmpty)
    assert(m("b").contains(1.0))
  }

  test("average precision: perfect ranker = 1, hand-computed tie block, " +
      "no-positive key NULL") {
    val perfect = (1 to 6).map(i => ("k", i.toDouble, if (i > 3) 1 else 0))
      .toDF("k", "s", "y")
    assert(MlEval.averagePrecision(perfect, col("k"), col("s"), col("y"),
      "k").select("ap").as[Double].head() == 1.0)
    // blocks desc: s=3 (1 pos of 1), s=2 tie block (1 pos of 2 rows ->
    // c=3, cp=2), s=1 (neg). AP = (1*1/1 + 1*2/3)/2 = 5/6
    val tied = Seq(("k", 3.0, 1), ("k", 2.0, 1), ("k", 2.0, 0),
      ("k", 1.0, 0)).toDF("k", "s", "y")
    val r = MlEval.averagePrecision(tied, col("k"), col("s"), col("y"), "k")
      .select("ap_fp", "ap").as[(Long, Double)].head()
    // ap_fp = 2^20 + floor(2*2^20/3); ap within 2^-20 of 5/6
    assert(r._1 == 1048576L + (2L * 1048576L) / 3)
    assert(math.abs(r._2 - 5.0 / 6) < 2e-6)
    val noPos = Seq(("k", 1.0, 0), ("k", 2.0, 0)).toDF("k", "s", "y")
    assert(MlEval.averagePrecision(noPos, col("k"), col("s"), col("y"),
      "k").select("ap").as[Option[Double]].head().isEmpty)
  }

  test("labelNoise: planted mislabels flagged, clean separation flags " +
      "only boundary rows, threshold arithmetic exact") {
    // positives score ~0.9, negatives ~0.1, one negative scored 0.95
    // (the planted missed positive) and one positive scored 0.05
    val rows = Seq((0.9, 1), (0.92, 1), (0.88, 1), (0.05, 1),
      (0.1, 0), (0.12, 0), (0.08, 0), (0.95, 0)).toDF("s", "y")
    val r = MlEval.labelNoise(rows, col("s"), col("y"))
      .select("n", "n_pos", "n_neg", "n_flag_in_neg", "n_flag_in_pos")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r._1 == 8L && r._2 == 4L && r._3 == 4L)
    // t_pos = (0.9+0.92+0.88+0.05)/4 = 0.6875: only the 0.95 negative
    // crosses it; t_neg = (0.1+0.12+0.08+0.95)/4 = 0.3125: only the
    // 0.05 positive is at or below
    assert(r._4 == 1L && r._5 == 1L)
    // one-class input: the empty class flags nothing, no divide-by-zero
    val onePos = Seq((0.5, 1), (0.7, 1)).toDF("s", "y")
    val o = MlEval.labelNoise(onePos, col("s"), col("y"))
      .select("n_flag_in_neg", "n_flag_in_pos", "t_neg")
      .as[(Long, Long, Option[Double])].head()
    assert(o._1 == 0L && o._2 == 0L && o._3.isEmpty)
  }

  test("mrrAtK: exact reciprocals, no-hit queries count in the " +
      "denominator, k truncates") {
    // q1: first relevant at rank 2; q2: at rank 1; q3: none relevant
    val df = Seq(
      ("q1", 1L, 9.0, 0), ("q1", 2L, 8.0, 1), ("q1", 3L, 7.0, 1),
      ("q2", 4L, 9.0, 1), ("q2", 5L, 8.0, 0),
      ("q3", 6L, 9.0, 0)).toDF("q", "id", "s", "r")
    val m = MlEval.mrrAtK(df, col("q"), col("s"), col("r"), col("id"),
        k = 10)
      .select("n_queries", "n_hit", "mrr_fp_sum", "mrr")
      .as[(Long, Long, Long, Double)].head()
    assert(m._1 == 3L && m._2 == 2L)
    assert(m._3 == 1048576L / 2 + 1048576L)
    assert(m._4 == m._3.toDouble / (1048576.0 * 3))
    // k = 1: q1's rank-2 hit no longer counts
    val k1 = MlEval.mrrAtK(df, col("q"), col("s"), col("r"), col("id"), 1)
      .select("n_hit", "mrr_fp_sum").as[(Long, Long)].head()
    assert(k1 == ((1L, 1048576L)))
  }

  test("liftTable: perfect ranker concentrates gain, random is flat, " +
      "equi-depth deciles exact") {
    // 100 rows, top-20 scores are the 20 positives -> deciles 1-2 carry
    // all gain; lift of decile 1 = (10/10)/(20/100) = 5
    val perfect = (1 to 100).map(i =>
      (i.toLong, (101 - i).toDouble, if (i <= 20) 1 else 0))
      .toDF("id", "s", "y")
    val rows = MlEval.liftTable(perfect, col("id"), col("s"), col("y"))
      .select("decile", "n", "cum_pos", "lift")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._2).forall(_ == 10L)) // exact equi-depth
    assert(rows(0)._3 == 10L && rows(0)._4 == 5.0)
    assert(rows(1)._3 == 20L && rows(1)._4 == 5.0)
    assert(rows(9)._3 == 20L && rows(9)._4 == 1.0) // full-population lift
    // constant score: ties broken by id, gains still sum to 1
    val flat = (1 to 50).map(i => (i.toLong, 1.0, i % 2)).toDF("id", "s", "y")
    val g = MlEval.liftTable(flat, col("id"), col("s"), col("y"))
      .agg(max(col("gain"))).as[Double].head()
    assert(g == 1.0)
  }

  test("conformalSplit: conservative rank, coverage >= 1 - alpha on " +
      "exchangeable data, infinite qhat convention") {
    // scores constant 0, targets uniform |s| in 0..99 -> q-hat is the
    // discrete 90% quantile of the calibration half
    val df = (1L to 2000L).map(i => (i, 0.0, (i % 100).toDouble))
      .toDF("id", "p", "t")
    val full = MlEval.conformalSplit(df, col("id"), col("p"), col("t"),
        alphaPct = 10)
      .select("n_cal", "n_test", "qhat", "n_covered", "coverage")
      .as[(Long, Long, Double, Long, Double)].head()
    assert(full._1 + full._2 == 2000L)
    // q-hat lands at the discrete 90% quantile of the uniform 0..99
    // nonconformity domain (+- hash-split wobble)
    assert(full._3 >= 85.0 && full._3 <= 95.0)
    // the >= 1 - alpha guarantee is in EXPECTATION over the split;
    // this one fixed-hash realization sits near it
    assert(full._5 >= 0.85 && full._5 <= 1.0)
    // alpha tiny + small cal set: rank > n_cal -> qhat NULL, cover all
    val tiny = (1L to 8L).map(i => (i, 0.0, i.toDouble)).toDF("id", "p", "t")
    val inf = MlEval.conformalSplit(tiny, col("id"), col("p"), col("t"),
        alphaPct = 1)
      .select("qhat", "n_test", "n_covered")
      .as[(Option[Double], Long, Long)].head()
    assert(inf._1.isEmpty && inf._2 == inf._3)
  }

  test("cohensKappa: perfect = 1, independence = 0, hand-computed 2x2") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a"))
      .toDF("ra", "rb")
    val p = MlEval.cohensKappa(perfect, col("ra"), col("rb"))
      .select("kappa").as[Double].head()
    assert(p == 1.0)
    // exactly independent raters: every (A,B) cell once -> po = pe
    val indep = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"))
      .toDF("ra", "rb")
    assert(MlEval.cohensKappa(indep, col("ra"), col("rb"))
      .select("kappa").as[Double].head() == 0.0)
    // textbook 2x2: cells (a,a)=20 (a,b)=5 (b,a)=10 (b,b)=15, N=50
    // po = 35/50; r_a=25 c_a=30, r_b=25 c_b=20 -> pe_sum = 1250
    // num = 50*35 - 1250 = 500; den = 2500 - 1250 = 1250; k = 0.4
    val rows = Seq.fill(20)(("a", "a")) ++ Seq.fill(5)(("a", "b")) ++
      Seq.fill(10)(("b", "a")) ++ Seq.fill(15)(("b", "b"))
    val r = MlEval.cohensKappa(rows.toDF("ra", "rb"), col("ra"),
        col("rb"))
      .select("n_items", "agree", "kappa")
      .as[(Long, Long, Double)].head()
    assert(r == ((50L, 35L, 0.4)))
  }

  test("ndcgAtK: ideal order = 1, swapped pair matches the fixed-point " +
      "discount ratio, zero relevance NULL, k truncates") {
    // graded rel already in score order -> dcg = idcg -> exactly 1.0
    val ideal = Seq(("q", 1L, 30.0, 3), ("q", 2L, 20.0, 2),
      ("q", 3L, 10.0, 1)).toDF("q", "id", "s", "r")
    assert(MlEval.ndcgAtK(ideal, col("q"), col("s"), col("r"), col("id"),
      k = 10, "q").select("ndcg").as[Double].head() == 1.0)
    // the only relevant item ranked 2nd: ndcg = d2/d1 with
    // d_i = 2^40 div log2_fp(i+1)
    val swapped = Seq(("q", 1L, 30.0, 0), ("q", 2L, 20.0, 1))
      .toDF("q", "id", "s", "r")
    val d1 = (1L << 40) / graft.functions.FixedLog.log2Fp(2)
    val d2 = (1L << 40) / graft.functions.FixedLog.log2Fp(3)
    val got = MlEval.ndcgAtK(swapped, col("q"), col("s"), col("r"),
      col("id"), 10, "q").select("dcg_fp", "idcg_fp", "ndcg")
      .as[(Long, Long, Double)].head()
    assert(got == ((d2, d1, d2.toDouble / d1.toDouble)))
    // all-zero relevance: idcg = 0 -> NULL
    val zero = Seq(("q", 1L, 30.0, 0)).toDF("q", "id", "s", "r")
    assert(MlEval.ndcgAtK(zero, col("q"), col("s"), col("r"), col("id"),
      10, "q").select("ndcg").as[Option[Double]].head().isEmpty)
    // k truncation: 3 items, k=2 -> n_items = 2 and the rank-3 item's
    // relevance never contributes to dcg
    val three = Seq(("q", 1L, 30.0, 0), ("q", 2L, 20.0, 0),
      ("q", 3L, 10.0, 5)).toDF("q", "id", "s", "r")
    val t = MlEval.ndcgAtK(three, col("q"), col("s"), col("r"), col("id"),
      2, "q").select("n_items", "dcg_fp").as[(Long, Long)].head()
    assert(t == ((2L, 0L)))
  }

  test("calibration bins: exact edges, top-bin clamp, gap arithmetic") {
    // 0.05 -> bin 0; 0.10 lands in bin 1 (exact decimal edge, not a
    // float wobble); 1.0 clamps into bin 9
    val df = Seq((0.05, 0), (0.10, 1), (0.95, 1), (1.0, 1))
      .toDF("s", "y")
    val rows = MlEval.calibrationBins(df, col("s"), col("y"), bins = 10)
      .select("bin", "n", "n_pos").as[(Int, Long, Long)].collect().toSet
    assert(rows == Set((0, 1L, 0L), (1, 1L, 1L), (9, 2L, 2L)))
    val gap = MlEval.calibrationBins(df, col("s"), col("y"), bins = 10)
      .where(col("bin") === 9).select("gap").as[Double].head()
    assert(gap == math.abs((0.95 + 1.0) / 2 - 1.0))
  }

  test("out-of-range and null scores are excluded") {
    val df = Seq((Option(-0.1), 0), (Option(1.1), 1), (None, 1),
      (Option(0.5), 1)).toDF("s", "y")
    val rows = MlEval.calibrationBins(df, col("s"), col("y"), 10)
      .select("bin", "n").as[(Int, Long)].collect().toSeq
    assert(rows == Seq((5, 1L)))
  }

  test("bit-exact under repartitioning") {
    val big = (1L to 4000L).map(i =>
      (s"k${i % 3}", (i % 97).toDouble / 97, (i % 5 == 0).compareTo(false)))
      .toDF("k", "s", "y")
    def auc(parts: Int) =
      MlEval.aucRoc(big.repartition(parts), col("k"), col("s"), col("y"),
          "k")
        .select("k", "u2_pos", "auc").as[(String, Long, Double)]
        .collect().sortBy(_._1)
    assert(auc(1).sameElements(auc(17)))
    def cal(parts: Int) =
      MlEval.calibrationBins(big.repartition(parts), col("s"), col("y"))
        .select("bin", "n", "conf", "acc").as[(Int, Long, Double, Double)]
        .collect().sortBy(_._1)
    assert(cal(1).sameElements(cal(17)))
  }

  test("mcnemar: hand-computed discordant cells and corrected chi2") {
    // label y; A predicts y except on rows 1-6; B wrong on rows 1-2 and
    // 7-10 -> both_wrong = 2 (rows 1-2), a_only_wrong = 4 (rows 3-6),
    // b_only_wrong = 4 (rows 7-10), both_right = the remaining 10
    val rows = (1 to 20).map { i =>
      val y = "t"
      val a = if (i <= 6) "f" else "t"
      val b = if (i <= 2 || (i >= 7 && i <= 10)) "f" else "t"
      (y, a, b)
    }.toDF("y", "a", "b")
    val r = MlEval.mcnemarTest(rows, col("y"), col("a"), col("b"))
      .select("n_items", "both_right", "both_wrong", "b_only_wrong",
        "a_only_wrong", "chi2_num", "chi2_den")
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(r == ((20L, 10L, 2L, 4L, 4L, 0L, 8L))) // |4-4|-1 -> clamp 0
    // asymmetric case: b=7, c=1 -> chi2 = (|6|-1)^2/8 = 25/8
    val asym = ((1 to 7).map(_ => ("t", "t", "f")) :+ (("t", "f", "t")))
      .toDF("y", "a", "b")
    val r2 = MlEval.mcnemarTest(asym, col("y"), col("a"), col("b"))
      .select("chi2_num", "chi2_den", "chi2")
      .as[(Long, Long, Double)].head()
    assert(r2 == ((25L, 8L, 3.125)))
    // concordant-only input: chi2 NULL (den 0)
    val conc = Seq(("t", "t", "t"), ("t", "f", "f")).toDF("y", "a", "b")
    assert(MlEval.mcnemarTest(conc, col("y"), col("a"), col("b"))
      .select("chi2").as[Option[Double]].head().isEmpty)
  }

  test("classification report: hand confusion, pred-only class row") {
    // y: a a a b b c ; p: a a b b b d
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"),
      ("b", "b"), ("c", "d")).toDF("y", "p")
    val m = MlEval.classificationReport(df, col("y"), col("p"))
      .select("class", "support", "tp", "fp", "fn")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(m("a") == ((3L, 2L, 0L, 1L)))
    assert(m("b") == ((2L, 2L, 1L, 0L)))
    assert(m("c") == ((1L, 0L, 0L, 1L)))
    assert(m("d") == ((0L, 0L, 1L, 0L))) // appears only in pred
    val f1 = MlEval.classificationReport(df, col("y"), col("p"))
      .where(col("class") === "a").select("precision", "recall", "f1")
      .as[(Double, Double, Double)].head()
    assert(f1._1 == 1.0 && f1._2 == 2.0 / 3.0 && f1._3 == 4.0 / 5.0)
    // recall NULL for the pred-only class
    assert(MlEval.classificationReport(df, col("y"), col("p"))
      .where(col("class") === "d").select("recall")
      .as[Option[Double]].head().isEmpty)
  }

  test("fairnessGaps: hand confusion per segment, parity and odds gaps") {
    // seg A: 4 rows, sel 2/4, tpr 1/2, fpr 1/2; seg B: sel 1/2, tpr 1,
    // fpr 0 -> dp_gap = 0, eo_gap = max(1 - 1/2, 1/2 - 0) = 1/2
    val df = Seq(("a", 1L, 1L), ("a", 1L, 0L), ("a", 0L, 1L),
      ("a", 0L, 0L), ("b", 1L, 1L), ("b", 0L, 0L))
      .toDF("seg", "y", "p")
    val out = MlEval.fairnessGaps(df, col("seg"), col("y"), col("p"),
        "seg")
      .select("seg", "tp", "fp", "fn", "tn", "sel_rate", "tpr", "fpr",
        "dp_gap", "eo_gap")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert((a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4)) ==
      ((1L, 1L, 1L, 1L)))
    assert(a.getDouble(5) == 0.5 && a.getDouble(6) == 0.5 &&
      a.getDouble(7) == 0.5)
    assert(a.getDouble(8) == 0.0 && a.getDouble(9) == 0.5)
    // a one-class segment's undefined rate drops out of the gap
    val oneClass = df.union(Seq(("c", 1L, 1L)).toDF("seg", "y", "p"))
    val c = MlEval.fairnessGaps(oneClass, col("seg"), col("y"),
        col("p"), "seg")
      .where(col("seg") === "c").select("fpr", "eo_gap")
      .collect().head
    assert(c.isNullAt(0)) // no negatives in c -> fpr undefined
    assert(c.getDouble(1) == 0.5) // gaps unchanged by the null rate
  }

  test("bestF1Threshold: hand case, perfect separator hits F1=1, " +
      "no-positive key dropped") {
    // scores desc: 4(pos) 3(neg) 2(pos) 1(neg); candidates t=4: F1 =
    // 2*1/(1+2)=2/3; t=3: 2/4; t=2: 2*2/(3+2)=4/5 <- best; t=1: 4/6
    val df = Seq(("k", 4.0, 1), ("k", 3.0, 0), ("k", 2.0, 1),
      ("k", 1.0, 0)).toDF("k", "s", "y")
    val r = MlEval.bestF1Threshold(df, col("k"), col("s"), col("y"), "k")
      .select("threshold", "tp", "fp", "fn", "f1")
      .as[(Double, Long, Long, Long, Double)].head()
    assert(r == ((2.0, 2L, 1L, 0L, 0.8)))
    // perfect separator: threshold at the smallest positive, F1 = 1
    val perfect = (1 to 8).map(i => ("k", i.toDouble, if (i > 4) 1 else 0))
      .toDF("k", "s", "y")
    val p = MlEval.bestF1Threshold(perfect, col("k"), col("s"), col("y"),
        "k").select("threshold", "f1").as[(Double, Double)].head()
    assert(p == ((5.0, 1.0)))
    // a key with zero positives yields no row
    val none = Seq(("z", 1.0, 0), ("z", 2.0, 0)).toDF("k", "s", "y")
    assert(MlEval.bestF1Threshold(none, col("k"), col("s"), col("y"),
      "k").count() == 0)
  }

  test("decision stump finds the planted separator; argmax matches " +
      "brute force under repartitioning") {
    // feature < 10 -> label 0, feature >= 10 -> label 1: perfect split
    // at the largest left value (9)
    val sep = ((1 to 9).map(v => ("k", v.toDouble, 0)) ++
      (10 to 20).map(v => ("k", v.toDouble, 1))).toDF("k", "v", "y")
    val r = MlEval.decisionStump(sep, col("k"), col("v"), col("y"), "k")
      .select("threshold", "n_left", "pos_left", "n_right", "pos_right")
      .as[(Double, Long, Long, Long, Long)].head()
    assert(r == ((9.0, 9L, 0L, 11L, 11L)))
    // brute-force cross-check on a noisy set, stable across partitions
    val noisy = (1 to 60).map(i =>
      ("k", (i % 13).toDouble, if ((i * 7) % 11 < 4) 1 else 0))
    def bruteBest(rows: Seq[(String, Double, Int)]): (Double, Long) = {
      val vs = rows.map(_._2).distinct.sorted.init
      val cands = vs.map { t =>
        val (l, rt) = rows.partition(_._2 <= t)
        val fp = ((BigInt(l.count(_._3 == 1)).pow(2) +
          BigInt(l.count(_._3 == 0)).pow(2)) * 1048576 / l.size) +
          ((BigInt(rt.count(_._3 == 1)).pow(2) +
            BigInt(rt.count(_._3 == 0)).pow(2)) * 1048576 / rt.size)
        (t, fp.toLong)
      }
      cands.maxBy(c => (c._2, -c._1))
    }
    val expect = bruteBest(noisy)
    def got(parts: Int) =
      MlEval.decisionStump(noisy.toDF("k", "v", "y").repartition(parts),
          col("k"), col("v"), col("y"), "k")
        .select("threshold", "split_score_fp").as[(Double, Long)].head()
    assert(got(1) == expect)
    assert(got(13) == expect)
  }

  test("adaboost stumps: separable data solved in round 1; round-2 " +
      "reweighting corrects round-1 errors; min-err invariant holds") {
    // f1 separates perfectly at 10 -> round 1 must pick it, err 0,
    // full training accuracy from the first vote
    val sep = (1 to 40).map(i =>
      (i.toLong, (i % 7).toLong, if (i <= 20) 0L else 1L))
      .toDF("f1", "f2", "y")
    val r = MlEval.adaboostStumps(sep,
      Seq("f1" -> col("f1"), "f2" -> col("f2")), col("y"), rounds = 2)
      .orderBy($"round")
      .as[(Int, String, Long, Int, Long, Long, Long, Long)].collect()
    assert(r(0)._2 == "f1" && r(0)._5 == 0L, s"round 1 picked ${r(0)}")
    assert(r(0)._7 == 40L && r(0)._8 == 40L)

    // XOR-ish data no single stump solves: the doubled weights must
    // push round 2 to a DIFFERENT stump, and every round's weighted
    // error stays <= half the live total weight (the polarity-
    // complement argument: err(pol) + err(1-pol) = totW)
    val rng = new scala.util.Random(3)
    val hard = (1 to 200).map { i =>
      val a = rng.nextInt(20).toLong; val b = rng.nextInt(20).toLong
      val y = if ((a < 10) ^ (b < 10)) 1L else 0L
      (a, b, y)
    }.toDF("f1", "f2", "y")
    val h = MlEval.adaboostStumps(hard,
      Seq("f1" -> col("f1"), "f2" -> col("f2")), col("y"), rounds = 3)
      .orderBy($"round")
      .as[(Int, String, Long, Int, Long, Long, Long, Long)].collect()
    h.foreach { row =>
      assert(row._5 * 2 <= row._6, s"round ${row._1} err > totW/2: $row")
    }
    assert((h(0)._2, h(0)._3, h(0)._4) != ((h(1)._2, h(1)._3, h(1)._4)),
      "round 2 re-picked the identical stump despite doubled weights")
    // deterministic: a rerun reproduces the ensemble bit-for-bit
    val h2 = MlEval.adaboostStumps(hard,
      Seq("f1" -> col("f1"), "f2" -> col("f2")), col("y"), rounds = 3)
      .orderBy($"round")
      .as[(Int, String, Long, Int, Long, Long, Long, Long)].collect()
    assert(h.sameElements(h2))
  }
}
