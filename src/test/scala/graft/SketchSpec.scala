package graft

import java.io.ByteArrayInputStream

import graft.functions.BloomFunctions
import graft.operators.{Bloom, Decontaminate, TextAnalysis}
import graft.queries.PrepOps
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Guarantees of the sketch-backed operators: bloom no-false-negatives
  * (=> prefiltered join exactness, decontamination no-leak), bloom fpp
  * in range, HLL estimate tolerance, CMS never-undercount. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("bloom has no false negatives and ~fpp false positives") {
    val members = (0L until 5000L).map(i => i * 3)
    val bytes = Bloom.buildBytes(members.toDF("k"), col("k"),
      expectedItems = 5000, fpp = 0.01)
    val hit = members.toDF("k")
      .filter(BloomFunctions.bloom_might_contain(bytes, col("k"))).count()
    assert(hit == members.size, "every inserted key must probe true")
    // non-members: fp fraction should be near the target rate
    val absent = (0L until 20000L).map(i => 1000000L + i)
    val fps = absent.toDF("k")
      .filter(BloomFunctions.bloom_might_contain(bytes, col("k"))).count()
    val rate = fps.toDouble / absent.size
    assert(rate < 0.05, s"fp rate $rate should be near 0.01")
  }

  test("replayable md5 bloom: no false negatives, bounded fp rate, " +
      "over-drop-only decontamination vs the exact kept set") {
    val members = (0L until 5000L).map(i => s"key-${i * 3}")
    val bitmap = Bloom.buildMd5Bitmap(members.toDF("k"), col("k"))
    val hit = members.toDF("k")
      .filter(BloomFunctions.md5_bloom_contains(bitmap, col("k"), 7))
      .count()
    assert(hit == members.size, "every inserted key must probe true")
    val absent = (0L until 20000L).map(i => s"absent-$i")
    val fps = absent.toDF("k")
      .filter(BloomFunctions.md5_bloom_contains(bitmap, col("k"), 7))
      .count()
    assert(fps.toDouble / absent.size < 0.01,
      s"fp rate ${fps.toDouble / absent.size} too high for 35k/1M bits")
    // empty build side returns null (convention shared with buildBytes)
    assert(Bloom.buildMd5Bitmap(members.toDF("k").limit(0), col("k")) == null)

    // decontamination: the bloom variant may only OVER-drop (fp
    // direction is safe); every doc the exact clean drops is dropped
    val docs = Tables.documents(spark, Sf0)
    val train = docs.filter($"doc_id" % 5 =!= 0)
    val ev = docs.filter($"doc_id" % 5 === 0)
    val exactKept = Decontaminate.clean(train, ev, col("doc_id"),
      col("text"), k = 4).select("doc_id").as[Long].collect().toSet
    val bloomKept = Decontaminate.cleanBloomReplayable(train, ev,
      col("doc_id"), col("text"), k = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(bloomKept.subsetOf(exactKept),
      "bloom kept a doc the exact decontamination drops (false negative)")
  }

  test("bloom-prefiltered join is bit-identical to the plain join") {
    val li = Tables.lineitem(spark, Sf0)
    val ord = Tables.orders(spark, Sf0)
      .filter(col("o_orderpriority") === "1-URGENT")
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderdate"))
    val pre = Bloom.prefilteredJoin(li, ord, col("l_orderkey"),
        col("o_orderkey"), expectedItems = 10000)
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderdate"))
    assert(pre.exceptAll(plain).isEmpty && plain.exceptAll(pre).isEmpty)
    // and the prefilter genuinely cuts the big side before the join
    val bytes = Bloom.buildBytes(ord, col("o_orderkey"), 10000)
    val kept = li.filter(
      BloomFunctions.bloom_might_contain(bytes, col("l_orderkey"))).count()
    assert(kept < li.count() / 2,
      s"prefilter kept $kept of ${li.count()} — no reduction")
  }

  test("bloom-prefiltered semi and anti joins match their plain forms") {
    val li = Tables.lineitem(spark, Sf0)
    val ord = Tables.orders(spark, Sf0)
      .filter(col("o_orderpriority") === "2-HIGH")
    for (jt <- Seq("left_semi", "left_anti")) {
      val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"), jt)
      val pre = Bloom.prefilteredJoin(li, ord, col("l_orderkey"),
        col("o_orderkey"), expectedItems = 10000, joinType = jt)
      assert(pre.exceptAll(plain).isEmpty && plain.exceptAll(pre).isEmpty,
        s"$jt prefiltered form must match")
      assert(pre.count() == plain.count(), s"$jt count")
    }
  }

  test("prefilteredJoin refuses outer join shapes") {
    val df = Seq(1L).toDF("k")
    val e = intercept[IllegalArgumentException] {
      Bloom.prefilteredJoin(df, df, col("k"), col("k"),
        expectedItems = 10, joinType = "left_outer")
    }
    assert(e.getMessage.contains("inner/semi"))
  }

  test("bloom decontamination never leaks, over-drops only ~fpp") {
    // the SAME split helper the queries use — a drifting convention
    // here would compare mismatched train/eval sets
    val (train, eval_) = PrepOps.evalSplit(spark, Sf0)
    val exact = Decontaminate.clean(train, eval_, col("doc_id"),
      col("text"), PrepOps.DecontamK).select(col("doc_id"))
    val bloom = Decontaminate.cleanBloom(train, eval_, col("doc_id"),
      col("text"), PrepOps.DecontamK, expectedShingles = 1L << 16)
      .select(col("doc_id"))
    // no false negatives: every truly contaminated doc is also dropped
    // by the bloom form => bloom keep-set is a SUBSET of the exact one
    assert(bloom.exceptAll(exact).isEmpty,
      "bloom decontamination must never keep a contaminated doc")
    // and the over-drop is bounded (fp-driven)
    val nExact = exact.count(); val nBloom = bloom.count()
    assert(nBloom >= (nExact * 0.9).toLong,
      s"bloom kept $nBloom of $nExact — over-dropping far beyond fpp")
  }

  test("empty eval set: bloom decontamination keeps everything") {
    val train = Seq((1L, "a b c")).toDF("doc_id", "text")
    val eval_ = train.filter(lit(false))
    val out = Decontaminate.cleanBloom(train, eval_, col("doc_id"),
      col("text"), 2)
    assert(out.count() == 1)
  }

  test("HLL partial/union estimate lands within 3% of exact") {
    val docs = Tables.documents(spark, Sf0)
    val parts = docs.groupBy(col("source"))
      .agg(hll_sketch_agg(col("doc_id")).as("sk"))
    val est = parts
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .as[Long].head()
    val exact = docs.select(col("doc_id")).distinct().count()
    assert(math.abs(est - exact).toDouble / exact <= 0.03,
      s"HLL estimate $est vs exact $exact")
  }

  test("theta sketch: exact-mode set ops equal true set arithmetic") {
    import graft.functions.ThetaFunctions._
    // two overlapping id sets, each well under 2^12 (exact mode)
    val a = (0L until 600L).toDF("v").repartition(4)
    val b = (300L until 1000L).toDF("v").repartition(4)
    val skA = a.agg(theta_sketch_agg(col("v"))).head().getAs[Array[Byte]](0)
    val skB = b.agg(theta_sketch_agg(col("v"))).head().getAs[Array[Byte]](0)
    assert(estimate(skA).round == 600L)
    assert(estimate(skB).round == 700L)
    assert(estimate(intersect(skA, skB)).round == 300L)
    assert(estimate(union(skA, skB)).round == 1000L)
    assert(estimate(aNotB(skA, skB)).round == 300L)
    assert(estimate(aNotB(skB, skA)).round == 400L)
  }

  test("theta sketch estimates within 5% in sampling mode") {
    import graft.functions.ThetaFunctions._
    // 200k distinct >> 2^12 nominal entries: sampling mode, bounded error
    val big = spark.range(200000).toDF("v")
    val sk = big.agg(theta_sketch_agg(col("v"), lgK = 12))
      .head().getAs[Array[Byte]](0)
    val est = estimate(sk)
    assert(math.abs(est - 200000.0) / 200000.0 < 0.05,
      s"theta sampling-mode estimate $est vs 200000")
  }

  test("theta sketch is insertion-order independent") {
    import graft.functions.ThetaFunctions._
    val xs = (0L until 5000L).map(i => i * 7919)
    val fwd = xs.toDF("v").coalesce(1)
      .agg(theta_sketch_agg(col("v"))).head().getAs[Array[Byte]](0)
    val rev = xs.reverse.toDF("v").repartition(8)
      .agg(theta_sketch_agg(col("v"))).head().getAs[Array[Byte]](0)
    assert(estimate(fwd) == estimate(rev))
    assert(estimate(intersect(fwd, rev)) == estimate(fwd),
      "same set => identical retained hashes")
  }

  test("KLL quantiles land within the rank-error bound") {
    import graft.functions.KllFunctions._
    val n = 50000
    val vals = spark.range(n).toDF("v") // 0..n-1 uniform
    val sk = vals.agg(kll_sketch_agg(col("v"))).head().getAs[Array[Byte]](0)
    assert(KllFunctions_n(sk) == n)
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = quantile(sk, q)
      val trueRank = (est + 1) / n // uniform 0..n-1: rank of v is (v+1)/n
      assert(math.abs(trueRank - q) < 0.03,
        s"quantile($q) = $est, implied rank $trueRank")
    }
    // rank() inverts quantile() within the same bound
    assert(math.abs(rank(sk, n / 2.0) - 0.5) < 0.03)
  }

  private def KllFunctions_n(b: Array[Byte]): Long =
    graft.functions.KllFunctions.n(b)

  test("KLL merge of partials equals one-pass sketch within bound") {
    import graft.functions.KllFunctions._
    val a = spark.range(0, 25000).toDF("v")
      .agg(kll_sketch_agg(col("v"))).head().getAs[Array[Byte]](0)
    val b = spark.range(25000, 50000).toDF("v")
      .agg(kll_sketch_agg(col("v"))).head().getAs[Array[Byte]](0)
    val m = merge(a, b)
    assert(KllFunctions_n(m) == 50000)
    val est = quantile(m, 0.5)
    assert(math.abs(est - 25000.0) / 50000.0 < 0.03,
      s"merged median $est")
  }

  test("CMS estimates never undercount; exact on the fixture vocabulary") {
    val toks = Tables.documents(spark, Sf0)
      .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
    val bytes = toks
      .agg(count_min_sketch(col("term"), lit(0.0001d), lit(0.999d),
        lit(42)).as("cms"))
      .head().getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
    val truth = toks.groupBy(col("term")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect()
    assert(truth.nonEmpty)
    truth.foreach { case (t, n) =>
      val est = cms.estimateCount(t)
      assert(est >= n, s"CMS undercounted $t: $est < $n")
      assert(est == n, s"CMS collided on fixture term $t: $est != $n")
    }
  }
}
