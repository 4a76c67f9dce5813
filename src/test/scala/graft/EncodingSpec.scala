package graft

import graft.operators.Encoding
import org.apache.spark.sql.functions._

/** Pins Encoding.targetEncodeLoo: hand-computed encodings, the
  * leakage property (a row's own label never reaches its feature),
  * NULL/singleton handling, reserved-name guards, and bit-exactness
  * under repartitioning. */
class EncodingSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
    (4L, "b", 5.0), (5L, "b", 7.0),
    (6L, "c", 99.0)).toDF("id", "cat", "t")

  test("leave-one-out means match hand computation") {
    val m = Encoding.targetEncodeLoo(df, col("cat"), col("t"))
      .select("id", "enc").as[(Long, Option[Double])].collect().toMap
    assert(m(1L).contains(25.0)) // (20+30)/2
    assert(m(2L).contains(20.0)) // (10+30)/2
    assert(m(3L).contains(15.0)) // (10+20)/2
    assert(m(4L).contains(7.0))
    assert(m(5L).contains(5.0))
    assert(m(6L).isEmpty) // singleton category: no evidence left
  }

  test("own label is excluded: outlier moves siblings, not itself") {
    val out = df.withColumn("t",
      when(col("id") === 1L, lit(1e6)).otherwise(col("t")))
    val m = Encoding.targetEncodeLoo(out, col("cat"), col("t"))
      .select("id", "enc").as[(Long, Option[Double])].collect().toMap
    assert(m(1L).contains(25.0)) // unchanged: its own label held out
    assert(m(2L).get > 1000.0 && m(3L).get > 1000.0)
  }

  test("NULL target and NULL category pass through with NULL encoding") {
    val withNulls = Seq(
      (1L, Option("a"), Option(10.0)), (2L, Option("a"), Option(20.0)),
      (3L, Option("a"), None), (4L, None, Option(7.0)))
      .toDF("id", "cat", "t")
    val m = Encoding.targetEncodeLoo(withNulls, col("cat"), col("t"))
      .select("id", "enc").as[(Long, Option[Double])].collect().toMap
    assert(m(1L).contains(20.0) && m(2L).contains(10.0))
    assert(m(3L).isEmpty && m(4L).isEmpty)
    // NULL-target rows contribute nothing: id=1 sees only id=2's label
  }

  test("reserved and duplicate output names are rejected") {
    intercept[IllegalArgumentException] {
      Encoding.targetEncodeLoo(df.withColumn("enc", lit(1)),
        col("cat"), col("t"))
    }
    intercept[IllegalArgumentException] {
      Encoding.targetEncodeLoo(df.withColumn("__te_n", lit(1)),
        col("cat"), col("t"))
    }
  }

  test("WOE matches the fixed-point log identity by hand") {
    // cat a: 3 pos, 1 neg; cat b: 1 pos, 3 neg; totals 4/4, C=2, s=1
    // woe_fp(a) = (lg(4)-lg(6)) - (lg(2)-lg(6)) = lg(4)-lg(2) = 2^20
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("a", 0),
      ("b", 1), ("b", 0), ("b", 0), ("b", 0)).toDF("c", "y")
    val m = Encoding.woeEncode(df, col("c"), col("y"), catName = "c")
      .select("c", "n_pos", "n_neg", "woe_fp")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(m("a") == ("a", 3L, 1L, 1048576L))
    assert(m("b") == ("b", 1L, 3L, -1048576L)) // symmetric by swap
  }

  test("WOE smoothing keeps empty cells finite and sums to balance") {
    val df = Seq(("a", 1), ("a", 1), ("b", 0)).toDF("c", "y")
    val rows = Encoding.woeEncode(df, col("c"), col("y"), catName = "c")
      .select("c", "woe_fp").as[(String, Long)].collect().toMap
    // cat a has zero negatives, cat b zero positives: both finite
    assert(rows("a") > 0 && rows("b") < 0)
  }

  test("informationValue: independence gives IV ~ 0, separation large, " +
      "sign structure exact") {
    // perfectly balanced: every (cat,label) cell equal -> all woe_fp = 0
    val indep = Seq(("a", 1), ("a", 0), ("b", 1), ("b", 0))
      .toDF("c", "y")
    val z = Encoding.informationValue(indep, col("c"), col("y"))
      .select("iv_num", "iv").as[(BigDecimal, Double)].head()
    assert(z._1 == BigDecimal(0) && z._2 == 0.0)
    // strong separation: a mostly-positive, b mostly-negative
    val sep = (Seq.fill(9)(("a", 1)) ++ Seq.fill(1)(("a", 0)) ++
      Seq.fill(1)(("b", 1)) ++ Seq.fill(9)(("b", 0))).toDF("c", "y")
    val iv = Encoding.informationValue(sep, col("c"), col("y"))
      .select("iv").as[Double].head()
    assert(iv > 1.0) // textbook "suspiciously strong" territory
    // IV is non-negative by construction (term and woe share sign)
    val skew = (Seq.fill(5)(("a", 1)) ++ Seq.fill(3)(("a", 0)) ++
      Seq.fill(2)(("b", 1)) ++ Seq.fill(6)(("b", 0)) ++
      Seq.fill(4)(("c", 1)) ++ Seq.fill(4)(("c", 0))).toDF("c", "y")
    assert(Encoding.informationValue(skew, col("c"), col("y"))
      .select("iv").as[Double].head() >= 0.0)
  }

  test("standardize: hand-computed z, nulls pass through, constant " +
      "feature yields NULL column, stable under repartition") {
    // x = 1,2,3: mean 2, var 1 -> z = -1, 0, 1
    val df3 = Seq((1L, Option(1.0)), (2L, Option(2.0)), (3L, Option(3.0)),
      (4L, None)).toDF("id", "x")
    val z = Encoding.standardize(df3, Seq("x" -> col("x")))
      .select("id", "z_x").as[(Long, Option[Double])].collect().toMap
    assert(z(1L).contains(-1.0) && z(2L).contains(0.0) &&
      z(3L).contains(1.0) && z(4L).isEmpty)
    // constant feature: sigma = 0 -> NULL everywhere, no NaN/Inf
    val const = Seq((1L, 5.0), (2L, 5.0)).toDF("id", "x")
    assert(Encoding.standardize(const, Seq("x" -> col("x")))
      .select("z_x").as[Option[Double]].collect().forall(_.isEmpty))
    // multi-feature, bit-exact across partitionings
    val big = (1L to 999L).map(i =>
      (i, (i % 83).toDouble / 7, (i % 311).toDouble)).toDF("id", "a", "b")
    def run(p: Int) = Encoding.standardize(big.repartition(p),
        Seq("a" -> col("a"), "b" -> col("b")))
      .select("id", "z_a", "z_b").as[(Long, Double, Double)]
      .collect().sortBy(_._1)
    assert(run(1).sameElements(run(13)))
  }

  test("robustScale: lower-median convention, outlier immunity, " +
      "MAD = 0 yields NULL, stable under repartition") {
    // values 1..5 + outlier 1000: median 3 (lower of {3,4} domain? n=6
    // -> lower median = 3rd smallest = 3), MAD of |x-3| = {2,1,0,1,2,
    // 997} -> sorted {0,1,1,2,2,997}, lower median (3rd) = 1
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 1000.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
    val z = Encoding.robustScale(df, Seq("x" -> col("x")))
      .select("id", "rz_x").as[(Long, Double)].collect().toMap
    assert(z(2L) == 0.0) // x = 3 = median
    assert(z(3L) == 1.0 / 1.4826) // (4-3)/(1*1.4826)
    // the outlier barely moves the scale (vs z-score where it dominates)
    assert(z(5L) == 997.0 / 1.4826)
    val const = Seq((1L, 7.0), (2L, 7.0), (3L, 7.0)).toDF("id", "x")
    assert(Encoding.robustScale(const, Seq("x" -> col("x")))
      .select("rz_x").as[Option[Double]].collect().forall(_.isEmpty))
    val big = (1L to 777L).map(i => (i, (i % 53).toDouble)).toDF("id", "x")
    def run(p: Int) = Encoding.robustScale(big.repartition(p),
        Seq("x" -> col("x")))
      .select("id", "rz_x").as[(Long, Double)].collect().sortBy(_._1)
    assert(run(1).sameElements(run(13)))
  }

  test("bit-exact under repartitioning") {
    val big = (1L to 2000L).map(i => (i, s"c${i % 7}",
      (i % 101).toDouble / 4)).toDF("id", "cat", "t")
    def run(parts: Int) =
      Encoding.targetEncodeLoo(big.repartition(parts), col("cat"),
          col("t"))
        .select("id", "enc").as[(Long, Double)].collect().sortBy(_._1)
    assert(run(1).sameElements(run(13)))
  }

  test("hashingTrick: signed counts, bounded buckets, cancellation kept") {
    val docs = Seq(
      (1L, "x x x y"),
      (2L, "x y"),
      (3L, ""),
      (4L, "  ")).toDF("doc_id", "t")
    val out = Encoding.hashingTrick(docs, "doc_id", col("t"), dim = 16)
      .as[(Long, Long, Long)].collect()
    // buckets bounded, empty/blank docs emit nothing
    assert(out.forall(r => r._2 >= 0 && r._2 < 16))
    assert(!out.exists(r => r._1 == 3L || r._1 == 4L))
    // |value| of a bucket never exceeds the token occurrences feeding
    // it, and doc 1's x-bucket magnitude is 3x doc 2's (same sign
    // per token across docs — the hash depends only on the token)
    val d1 = out.filter(_._1 == 1L).map(r => r._2 -> r._3).toMap
    val d2 = out.filter(_._1 == 2L).map(r => r._2 -> r._3).toMap
    assert(d2.keySet.subsetOf(d1.keySet))
    d2.foreach { case (b, v) =>
      val v1 = d1(b)
      // x and y may share a bucket; magnitudes still add coherently
      assert(math.abs(v1) <= 4 && math.abs(v) <= 2 && v != 0 || v == 0)
    }
    // exact-cancellation rows are kept (value 0), not dropped: build a
    // forced collision by hashing the same token with opposite signs —
    // impossible for one token, so assert the weaker invariant: total
    // signed mass equals the per-token sign sum recomputed directly
    val mass = out.filter(_._1 == 1L).map(_._3).sum +
      out.filter(_._1 == 2L).map(_._3).sum
    val direct = Seq("x", "x", "x", "y", "x", "y").map { t =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (Integer.parseInt(h.substring(8, 9), 16) % 2 == 0) 1L else -1L
    }.sum
    assert(mass == direct)
  }

  test("imputeByGroup: lower median, lexicographic mode, no-donor " +
      "groups stay NULL with a false flag") {
    val df = Seq(
      // g1 numeric donors 1,3,9 (odd -> median 3); cat donors b,b,a
      (1L, "g1", Some(1.0), Some("b")), (2L, "g1", Some(3.0), Some("b")),
      (3L, "g1", Some(9.0), Some("a")), (4L, "g1", None: Option[Double],
        None: Option[String]),
      // g2 numeric donors 2,8 (even -> LOWER median 2); cat tie a/b ->
      // lexicographic a
      (5L, "g2", Some(8.0), Some("b")), (6L, "g2", Some(2.0), Some("a")),
      (7L, "g2", None, None),
      // g3: no donors at all
      (8L, "g3", None, None))
      .toDF("id", "g", "v", "c")
    val out = graft.operators.Encoding.imputeByGroup(df, $"g",
        nums = Seq("v" -> $"v"), cats = Seq("c" -> $"c"))
      .select($"id", $"v", $"c", $"imp_v", $"imp_c")
      .as[(Long, Option[Double], Option[String], Boolean, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(4L) == ((Some(3.0), Some("b"), true, true)))
    assert(out(7L) == ((Some(2.0), Some("a"), true, true)))
    assert(out(8L) == ((None, None, false, false)))
    // donor rows untouched, flags false
    assert(out(1L) == ((Some(1.0), Some("b"), false, false)))
    // partition invariance
    val again = graft.operators.Encoding.imputeByGroup(
        df.repartition(7), $"g", Seq("v" -> $"v"), Seq("c" -> $"c"))
      .select($"id", $"v", $"c", $"imp_v", $"imp_c")
      .as[(Long, Option[Double], Option[String], Boolean, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out == again)
  }
}
