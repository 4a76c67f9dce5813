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
  }
}
