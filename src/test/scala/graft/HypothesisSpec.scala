package graft

import graft.operators.Hypothesis
import org.apache.spark.sql.functions._

/** Two-sample tests: statistics validated against hand-computed
  * closed forms on small planted samples, plus invariance checks
  * (partitioning must not change a single bit — the determinism
  * contract the oracle hash relies on). */
class HypothesisSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(String, Double)]) =
    rows.toDF("g", "v")

  test("welchT matches the closed form on a planted sample") {
    // a: [1,2,3,4]  (n=4, mean=2.5, var=5/3)
    // b: [2,4,6]    (n=3, mean=4,   var=4)
    val d = df(Seq("a" -> 1d, "a" -> 2d, "a" -> 3d, "a" -> 4d,
      "b" -> 2d, "b" -> 4d, "b" -> 6d))
    val r = Hypothesis.welchT(d, col("g"), col("v"), "a", "b").head()
    assert(r.getAs[Long]("n_a") == 4 && r.getAs[Long]("n_b") == 3)
    assert(math.abs(r.getAs[Double]("mean_a") - 2.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("var_a") - 5.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("var_b") - 4.0) < 1e-12)
    val se2 = 5.0 / 3 / 4 + 4.0 / 3
    val t = (2.5 - 4.0) / math.sqrt(se2)
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-12)
    val dof = se2 * se2 /
      ((5.0 / 3 / 4) * (5.0 / 3 / 4) / 3 + (4.0 / 3) * (4.0 / 3) / 2)
    assert(math.abs(r.getAs[Double]("dof") - dof) < 1e-12)
  }

  test("mannWhitneyU matches hand-computed ranks incl. midrank ties") {
    // pooled sorted: 1(a) 2(a) 2(b) 3(a) 5(b) 7(b)
    // midranks:      1   2.5 2.5  4    5    6
    // R_a = 1 + 2.5 + 4 = 7.5 -> u2_a = 2*7.5 - 3*4 = 3 (U_a = 1.5)
    val d = df(Seq("a" -> 1d, "a" -> 2d, "a" -> 3d,
      "b" -> 2d, "b" -> 5d, "b" -> 7d))
    val r = Hypothesis.mannWhitneyU(d, col("g"), col("v"), "a", "b").head()
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 3)
    assert(r.getAs[Long]("u2_a") == 3L)
    assert(math.abs(r.getAs[Double]("u_a") - 1.5) < 1e-12)
    // tie-corrected sigma^2 = (9/12) * (7 - 6/(6*5)) = 5.1
    val z = (1.5 - 4.5) / math.sqrt(0.75 * (7.0 - 6.0 / 30.0))
    assert(math.abs(r.getAs[Double]("z_score") - z) < 1e-12)
  }

  test("statistics are bit-identical under repartitioning") {
    val base = Tables.events(spark, Sf0)
    for (parts <- Seq(1, 7)) {
      val d = base.repartition(parts)
      val w = Hypothesis.welchT(d, col("event_type"), col("value"),
        "click", "view").head()
      val u = Hypothesis.mannWhitneyU(d, col("event_type"), col("value"),
        "click", "view").head()
      val w1 = Hypothesis.welchT(base, col("event_type"), col("value"),
        "click", "view").head()
      val u1 = Hypothesis.mannWhitneyU(base, col("event_type"),
        col("value"), "click", "view").head()
      assert(w.toSeq == w1.toSeq, s"welch drifted at $parts partitions")
      assert(u.toSeq == u1.toSeq, s"mw drifted at $parts partitions")
    }
  }

  test("spearman: monotone = 1, known mixed case, ties via midranks") {
    def rho(rows: Seq[(Double, Double)]): java.lang.Double = {
      val r = Hypothesis.spearman(rows.toDF("x", "y"), col("x"), col("y"))
        .head()
      if (r.isNullAt(1)) null else r.getDouble(1)
    }
    // same tie pattern on both sides, monotone -> exactly 1 (mod ulp)
    assert(math.abs(rho(Seq(1d -> 10d, 2d -> 20d, 2d -> 20d,
      3d -> 40d)) - 1.0) < 1e-12)
    // outlier-proof: blowing up the top y does not move rho
    assert(math.abs(rho(Seq(1d -> 10d, 2d -> 20d, 2d -> 20d,
      3d -> 1e6)) - 1.0) < 1e-12)
    // ranks (1,2,3) vs (3,1,2): Pearson of ranks = -0.5
    assert(math.abs(rho(Seq(1d -> 3d, 2d -> 1d, 3d -> 2d)) + 0.5) < 1e-12)
    // constant side -> null
    assert(rho(Seq(1d -> 5d, 2d -> 5d, 3d -> 5d)) == null)
  }

  test("spearman is bit-identical under repartitioning") {
    val rows = (1 to 2000).map(i =>
      ((i % 97).toDouble, ((i * 7) % 89).toDouble))
    def run(np: Int) = {
      val base = rows.toDF("x", "y")
      Hypothesis.spearman(if (np > 0) base.repartition(np) else base,
        col("x"), col("y")).head().toSeq
    }
    assert(run(0) == run(13))
  }

  test("proportionZ: closed form on planted conversion counts") {
    // a: 30/100 convert, b: 20/100
    val rows = (1 to 100).map(i => ("a", if (i <= 30) 1L else 0L)) ++
      (1 to 100).map(i => ("b", if (i <= 20) 1L else 0L))
    val r = Hypothesis.proportionZ(rows.toDF("g", "s"), col("g"),
      col("s"), "a", "b").head()
    assert(r.getAs[Long]("conv_a") == 30 && r.getAs[Long]("conv_b") == 20)
    val p = 50.0 / 200
    val z = (0.3 - 0.2) / math.sqrt(p * (1 - p) * (1.0 / 100 + 1.0 / 100))
    assert(math.abs(r.getAs[Double]("z_score") - z) < 1e-12)
    // all-convert both sides: se2 = 0 -> null z, no crash
    val deg = Hypothesis.proportionZ(
      Seq(("a", 1L), ("b", 1L)).toDF("g", "s"), col("g"), col("s"),
      "a", "b").head()
    assert(deg.isNullAt(deg.fieldIndex("z_score")))
  }

  test("srmCheck: textbook chi2 and the 3.841 flag boundary") {
    def run(na: Int, nb: Int) = {
      val d = (Seq.fill(na)("a") ++ Seq.fill(nb)("b")).toDF("g")
      Hypothesis.srmCheck(d, col("g"), "a", "b").head()
    }
    val bad = run(60, 40) // chi2 = 2*(10^2/50) = 4.0 > 3.841
    assert(bad.getDouble(2) == 4.0 && bad.getBoolean(3))
    val ok = run(50, 50)
    assert(ok.getDouble(2) == 0.0 && !ok.getBoolean(3))
    // 90/10 against a designed 9:1 split is NOT an SRM
    val ninety = Hypothesis.srmCheck(
      (Seq.fill(90)("a") ++ Seq.fill(10)("b")).toDF("g"),
      col("g"), "a", "b", pn = 9, pd = 10).head()
    assert(ninety.getDouble(2) == 0.0 && !ninety.getBoolean(3))
  }

  test("cuped: covariate adjustment recovers the effect and shrinks " +
      "variance") {
    // post = pre + effect(group) + small per-unit wiggle: pre explains
    // most variance, so theta ~ 1 and t_adj should dwarf t_raw
    val rows = (1 to 400).map { i =>
      val pre = (i % 100).toDouble
      val grp = if (i % 2 == 0) "ctl" else "trt"
      val eff = if (grp == "trt") 1.0 else 0.0
      (grp, pre, pre + eff + (i % 7) * 0.1)
    }
    val r = Hypothesis.cuped(rows.toDF("g", "pre", "post"),
      col("g"), col("pre"), col("post"), "ctl", "trt").head()
    assert(r.getAs[Long]("n_a") == 200 && r.getAs[Long]("n_b") == 200)
    assert(math.abs(r.getAs[Double]("theta") - 1.0) < 0.01)
    val lift = r.getAs[Double]("mean_adj_b") - r.getAs[Double]("mean_adj_a")
    assert(math.abs(lift - 1.0) < 0.2, s"adjusted lift $lift")
    assert(math.abs(r.getAs[Double]("t_adj")) >
      5 * math.abs(r.getAs[Double]("t_raw")),
      s"t_adj ${r.getAs[Double]("t_adj")} vs t_raw ${r.getAs[Double]("t_raw")}")
  }

  test("cuped is bit-identical under repartitioning") {
    val rows = (1 to 300).map { i =>
      (if (i % 2 == 0) "a" else "b", (i % 13).toDouble,
        (i % 13) + (i % 5).toDouble)
    }
    def run(np: Int) = {
      val base = rows.toDF("g", "pre", "post")
      Hypothesis.cuped(if (np > 0) base.repartition(np) else base,
        col("g"), col("pre"), col("post"), "a", "b").head().toSeq
    }
    assert(run(0) == run(11))
  }

  test("welch degenerate group sizes yield null stats, not crashes") {
    val d = df(Seq("a" -> 1d, "b" -> 2d, "b" -> 3d))
    val r = Hypothesis.welchT(d, col("g"), col("v"), "a", "b").head()
    assert(r.getAs[Long]("n_a") == 1)
    assert(r.isNullAt(r.fieldIndex("var_a")))
    assert(r.isNullAt(r.fieldIndex("t_stat")))
  }

  test("bootstrapMeanCI: brackets the sample mean, Poisson weights " +
      "average ~1, bit-stable under repartition") {
    val rows = (1L to 600L).map(i => ("k", i, (i % 37).toDouble))
      .toDF("k", "id", "v")
    val ci = Hypothesis.bootstrapMeanCI(rows, $"k", $"id", $"v",
        replicas = 40, keyName = "k")
      .select("n_replicas", "ci_lo", "ci_hi")
      .as[(Long, Double, Double)].head()
    assert(ci._1 == 40L)
    val mean = (1L to 600L).map(i => (i % 37).toDouble).sum / 600
    // percentile CI must straddle the point estimate and be ordered
    assert(ci._2 < mean && mean < ci._3 && ci._2 < ci._3)
    // a 95% CI of a 600-row mean is tight: width under one unit of sd
    assert(ci._3 - ci._2 < 2.5)
    val again = Hypothesis.bootstrapMeanCI(rows.repartition(13), $"k",
        $"id", $"v", 40, "k")
      .select("n_replicas", "ci_lo", "ci_hi")
      .as[(Long, Double, Double)].head()
    assert(again == ci)
  }

  test("postStratified: hand-checked weighted lift; inestimable strata " +
      "drop; bit-identical under repartitioning") {
    // stratum X: ctl {10, 20} (mean 15), trt {19, 21} (mean 20): lift 5
    // stratum Y: ctl {100} (mean 100), trt {104, 112} (mean 108): lift 8
    // stratum Z: trt only -> dropped
    // ATE = (4*5 + 3*8) / 7 = 44/7
    val rows = Seq(
      ("ctl", "X", 10.0), ("ctl", "X", 20.0),
      ("trt", "X", 19.0), ("trt", "X", 21.0),
      ("ctl", "Y", 100.0),
      ("trt", "Y", 104.0), ("trt", "Y", 112.0),
      ("trt", "Z", 999.0))
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Hypothesis.postStratified(df, $"g", $"s", $"v",
          "ctl", "trt")
        .as[(Long, Long, Long, Long, Double)].head()
    val out = run(rows.toDF("g", "s", "v"))
    assert(out._1 == 2 && out._2 == 7)
    // exact rational check: ate_num/ate_den == 44/7 up to the 2^-20
    // per-stratum floor (each fp_s floors once; lifts here are exact
    // in 1e-4 money units so no floor loss at all)
    assert(out._3 == (4L * 5 + 3L * 8) * 10000 * (1L << 20),
      s"ate_num ${out._3}")
    assert(out._4 == 7L * 10000 * (1L << 20))
    assert(math.abs(out._5 - 44.0 / 7) < 1e-12)
    assert(run(rows.toDF("g", "s", "v").repartition(5)) == out)
    // negative lift survives the offset trick exactly
    val neg = run(Seq(("ctl", "X", 30.0), ("trt", "X", 10.0))
      .toDF("g", "s", "v"))
    assert(neg._3 == -20L * 10000 * (1L << 20) * 2 &&
      math.abs(neg._5 + 20.0) < 1e-12)
  }
}
