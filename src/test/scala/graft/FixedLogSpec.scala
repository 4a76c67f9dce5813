package graft

import graft.functions.{FixedLog, FixedLogFunctions}
import graft.operators.{Profiling, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Pins the fixed-point integer log2 (FixedLog.log2Fp / the log2_fp
  * expression) and the two statistics built on it: exactness anchors
  * (powers of two), accuracy vs Math.log, monotonicity, the SQL
  * registration, null domain handling, and hand-checks of the entropy
  * and PSI reports. */
class FixedLogSpec extends SparkSpec {
  import spark.implicits._

  private val F = FixedLog.FracBits

  private def samples(gen: Gen[Long], n: Int): Seq[Long] =
    (0 until n * 3).flatMap(_ => gen.sample).take(n)

  test("exact on powers of two, zero at one") {
    assert(FixedLog.log2Fp(1L) == 0L)
    (1 to 62).foreach { k =>
      assert(FixedLog.log2Fp(1L << k) == k.toLong << F, s"2^$k")
    }
  }

  test("within 2 ulps of the float log2, never above it") {
    samples(Gen.chooseNum(1L, Long.MaxValue), 300).foreach { x =>
      val fp = FixedLog.log2Fp(x)
      val ref = math.log(x.toDouble) / math.log(2.0) * (1L << F)
      // truncating algorithm: always <= the true value, within 2 units
      assert(fp <= ref + 1e-6, s"x=$x")
      assert(fp >= ref - 2.5, s"x=$x")
    }
  }

  test("monotone non-decreasing") {
    samples(Gen.chooseNum(1L, Long.MaxValue - 1), 300).foreach { x =>
      assert(FixedLog.log2Fp(x) <= FixedLog.log2Fp(x + 1), s"x=$x")
    }
  }

  test("expression: SQL-registered, codegen path matches JVM, null domain") {
    GraftFunctions.register(spark)
    val df = Seq(Some(1L), Some(7L), Some(0L), Some(-3L), None)
      .toDF("x")
    val got = df.select(expr("log2_fp(x)").as("l"))
      .as[Option[Long]].collect().toSeq
    assert(got == Seq(Some(0L), Some(FixedLog.log2Fp(7L)), None, None, None))
    // Column API agrees
    val viaCol = df.select(FixedLogFunctions.log2_fp(col("x")).as("l"))
      .as[Option[Long]].collect().toSeq
    assert(viaCol == got)
  }

  test("tokenEntropy: hand formula on a tiny corpus") {
    // group g: tokens a a b -> T=3, counts {a:2, b:1}
    // ent_num = 3*L(3) - (2*L(2) + 1*L(1)) = 3*L(3) - 2*2^20
    val out = TextAnalysis.tokenEntropy(
        Seq((1L, "g", "a a b")).toDF("id", "src", "text"),
        col("src"), col("text"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val l3 = FixedLog.log2Fp(3L)
    assert(out == Seq(("g", 3L, 2L, 2L * (1L << F), 3 * l3 - 2 * (1L << F))))
    // entropy of {2/3, 1/3} = 0.9183 bits; fixed point within 1e-5
    val h = out.head._5.toDouble / (out.head._2 * (1L << F))
    assert(math.abs(h - 0.918295) < 1e-5)
  }

  test("tokenEntropy: uniform distribution hits log2(V) exactly at powers of two") {
    val out = TextAnalysis.tokenEntropy(
        Seq((1L, "g", "a b c d")).toDF("id", "src", "text"),
        col("src"), col("text"))
      .as[(String, Long, Long, Long, Long)].collect().head
    // 4 distinct singletons: H = log2(4) = 2 bits, exact
    assert(out._5 == out._2 * (2L << F))
  }

  test("psiReport: identical distributions give zero drift everywhere") {
    val d = (1L to 100L).map(i => i % 10)
    val out = Profiling.psiReport(d.toDF("v"), d.toDF("v"), col("v"),
        0L, 10L, 5)
      .select(col("bucket"), col("log2r_fp"), col("psi_num"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.size == 5)
    assert(out.forall(r => r._2 == 0L && r._3 == 0L))
  }

  test("psiReport: hand-checked buckets, spine covers empty buckets") {
    // base: 4 values in bucket 0; cur: 4 values in bucket 1 (of 2)
    val base = Seq(0L, 0L, 1L, 1L).toDF("v")
    val cur = Seq(5L, 5L, 6L, 7L).toDF("v")
    val out = Profiling.psiReport(base, cur, col("v"), 0L, 8L, 2)
      .orderBy(col("bucket"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // T+n = R+n = 6; bucket 0: c_base=4, c_cur=0 -> p=5/6, q=1/6
    val l5 = FixedLog.log2Fp(5L); val l1 = 0L; val l6 = FixedLog.log2Fp(6L)
    assert(out(0) == ((0L, 4L, 0L, l5 - l1,
      (5L * 6 - 1L * 6) * (l5 - l1), 36L << F)))
    // symmetric bucket 1 mirrors with negated sign structure
    assert(out(1)._4 == l1 - l5)
    assert(out(1)._5 == (1L * 6 - 5L * 6) * (l1 - l5))
    // both contributions positive (p-q and log ratio share sign)
    assert(out.forall(_._5 >= 0L))
    // total PSI in nats: (5/6-1/6)*ln(5) + (1/6-5/6)*ln(1/5)
    //                  = (4/3)*ln(5) = 2.1459
    val psi = out.map(r => r._5.toDouble / r._6.toDouble).sum *
      math.log(2.0)
    assert(math.abs(psi - (4.0 / 3) * math.log(5.0)) < 1e-4)
  }

  test("mutualInfo: exactly zero on independent power-of-two uniforms") {
    // 2x2 perfectly independent: every cell n/4, margins n/2 — all
    // powers of two, so every lr_fp is exactly 0 (no truncation slack)
    val rows = for { a <- 0 to 1; b <- 0 to 1; _ <- 1 to 4 } yield (a, b)
    val out = Profiling.mutualInfo(rows.toDF("a", "b"), col("a"), col("b"))
      .select(col("lr_fp"), col("mi_num")).as[(Long, Long)]
      .collect().toSeq
    assert(out.size == 4 && out.forall(_ == ((0L, 0L))))
  }

  test("mutualInfo of a column with itself equals its entropy numerator") {
    // MI(X, X) = H(X): sum(mi_num) must equal tokenEntropy's ent_num
    // on the same distribution {a:2, b:1}
    val df = Seq("a", "a", "b").toDF("v")
    val mi = Profiling.mutualInfo(df, col("v"), col("v"))
      .agg(sum(col("mi_num"))).as[Long].collect().head
    val ent = TextAnalysis.tokenEntropy(
        Seq((1L, "g", "a a b")).toDF("id", "g", "t"), col("g"), col("t"))
      .select(col("ent_num")).as[Long].collect().head
    assert(mi == ent)
  }

  test("partition invariance of entropy and PSI") {
    val docs = (1L to 60L).map(i =>
      (i, s"s${i % 3}", s"w${i % 7} w${i % 5} w${i % 7} w${i % 2}"))
    def ent(parts: Int) = TextAnalysis.tokenEntropy(
        docs.toDF("id", "src", "text").repartition(parts),
        col("src"), col("text"))
      .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(ent(1) == ent(13))
    val vs = (1L to 500L).map(i => (i * 37) % 100)
    def psi(parts: Int) = Profiling.psiReport(
        vs.toDF("v").repartition(parts),
        vs.map(v => (v * 3) % 100).toDF("v").repartition(parts),
        col("v"), 0L, 100L, 10)
      .select(col("bucket"), col("psi_num").cast("string"))
      .as[(Long, String)].collect().sorted.toSeq
    assert(psi(1) == psi(7))
  }
}
