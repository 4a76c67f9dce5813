package graft

import graft.operators.Privacy
import org.apache.spark.sql.functions._

/** Pins the re-identification audits: class accounting, the l-diversity
  * homogeneity case k-anonymity alone misses, null quasi-values as
  * their own class, and row-level flagging consistency. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // (zip, age, disease): the classic table shape from the literature
  private def records = Seq(
    ("13053", 28, "flu"), ("13053", 29, "flu"), ("13053", 21, "cold"),
    ("13068", 21, "cold"), ("13068", 24, "flu"), ("13068", 22, "cold"),
    ("14853", 47, "cancer"), // singleton: k-violation
    ("14850", 55, "flu"), ("14850", 52, "flu"), ("14850", 59, "flu"))
    .toDF("zip", "age", "disease")
    .withColumn("age_band", floor($"age" / 10) * 10)

  private val quasi = Seq("zip" -> col("zip"), "age_band" -> col("age_band"))

  test("k-anonymity: only sub-k classes are flagged, sizes exact") {
    val out = Privacy.anonymityViolations(records, quasi, $"disease",
      k = 3, l = 1).orderBy($"zip", $"age_band").collect()
    // (13053,20)x3 ok; (13068,20)x3 ok; (14853,40)x1 and (14850,50)x3 ->
    // only the singleton violates k=3
    assert(out.map(r => (r.getString(0), r.getLong(2))).toSeq ==
      Seq(("14853", 1L)))
  }

  test("l-diversity catches the homogeneous class k-anonymity passes") {
    val out = Privacy.anonymityViolations(records, quasi, $"disease",
      k = 3, l = 2).collect()
    val zips = out.map(_.getString(0)).toSet
    // (14850,50) is 3-anonymous but every disease is 'flu' -> flagged
    assert(zips == Set("14853", "14850"))
  }

  test("riskRows returns exactly the members of flagged classes") {
    val rows = Privacy.riskRows(records, quasi, $"disease", k = 3, l = 2)
      .select($"zip").as[String].collect().toSeq.sorted
    assert(rows == Seq("14850", "14850", "14850", "14853"))
  }

  test("NULL quasi-identifier values form their own class") {
    val withNull = records.unionByName(
      Seq((null.asInstanceOf[String], 33, "flu"),
        (null.asInstanceOf[String], 35, "cold"))
        .toDF("zip", "age", "disease")
        .withColumn("age_band", floor($"age" / 10) * 10))
    val out = Privacy.anonymityViolations(withNull, quasi, $"disease",
      k = 3, l = 1)
    // the two NULL-zip rows are one class of size 2 -> k=3 violation
    assert(out.filter($"zip".isNull).select($"class_size")
      .as[Long].collect().toSeq == Seq(2L))
    val risk = Privacy.riskRows(withNull, quasi, $"disease", k = 3)
    assert(risk.filter($"zip".isNull).count() == 2)
  }

  test("invalid parameters are rejected") {
    intercept[IllegalArgumentException] {
      Privacy.anonymityViolations(records, Seq.empty, $"disease", 3)
    }
    intercept[IllegalArgumentException] {
      Privacy.anonymityViolations(records, quasi, $"disease", 0)
    }
    intercept[IllegalArgumentException] {
      Privacy.dpHistogram(records, $"zip", eps = 0.0)
    }
  }

  test("dpHistogram noise matches the closed-form keyed-hash Laplace") {
    val df = Seq.fill(100)("alpha").union(Seq.fill(40)("beta"))
      .toDF("k")
    val got = Privacy.dpHistogram(df, $"k", eps = 1.0)
      .orderBy($"k").collect()
    def expected(key: String, n: Long, eps: Double): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((key + ":dp").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val h = java.lang.Long.parseLong(hex, 16) - (1L << 31)
      val z = math.max((1L << 31) - math.abs(h), 1L)
      val lnz = (graft.functions.FixedLog.log2Fp(z) -
        31L * (1L << 20)).toDouble * 0.6931471805599453 / 1048576.0
      val sign = if (h >= 0) 1.0 else -1.0
      n.toDouble + (-1.0 / eps) * sign * lnz
    }
    assert(got.map(_.getString(0)).toSeq == Seq("alpha", "beta"))
    assert(got(0).getDouble(1) == expected("alpha", 100L, 1.0))
    assert(got(1).getDouble(1) == expected("beta", 40L, 1.0))
    // halving epsilon doubles the noise magnitude, exactly
    val wide = Privacy.dpHistogram(df, $"k", eps = 0.5)
      .orderBy($"k").collect()
    val n0 = got(0).getDouble(1) - 100.0
    assert(math.abs((wide(0).getDouble(1) - 100.0) - 2.0 * n0) < 1e-12)
    // the true count never appears in the output schema
    assert(!got.head.schema.fieldNames.contains("__n"))
  }

  test("dpMean: clipping, split budget, closed-form noise replay") {
    // key 'k': values 5, 10, 50 (clips to 20), -3 (clips to 0), null
    // (excluded) -> clipped sum 35, n = 4
    val df = Seq(("k", 5.0), ("k", 10.0), ("k", 50.0), ("k", -3.0))
      .toDF("g", "v")
      .union(Seq(("k", null.asInstanceOf[java.lang.Double]))
        .toDF("g", "v"))
    val r = Privacy.dpMean(df, $"g", $"v", clip = 20.0, eps = 1.0)
      .head()
    def lap(key: String, b: Double): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val h = java.lang.Long.parseLong(hex, 16) - (1L << 31)
      val z = math.max((1L << 31) - math.abs(h), 1L)
      val lnz = (graft.functions.FixedLog.log2Fp(z) -
        31L * (1L << 20)).toDouble * 0.6931471805599453 / 1048576.0
      -b * (if (h >= 0) 1.0 else -1.0) * lnz
    }
    val ns = 35.0 + lap("k:s:dpm", 40.0)
    val nc = 4.0 + lap("k:c:dpm", 2.0)
    assert(r.getDouble(1) == ns / math.max(nc, 1.0),
      s"got ${r.getDouble(1)}")
  }
}
