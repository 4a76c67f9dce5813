package graft

import graft.operators.Quality
import graft.operators.Quality._
import org.apache.spark.sql.functions._

/** Data-quality constraint semantics: fused report counts and row-level
  * violation tagging. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, 10.0, "A"),
    (1L, 99.0, null.asInstanceOf[String]), // dup id + out-of-range + null
    (2L, -5.0, "X"), // out-of-range + bad format
    (3L, 25.0, "N")
  ).toDF("id", "v", "flag")

  private val rules = Seq(
    NotNull("flag"),
    InRange("v", 0, 50),
    Matches("flag", "^[AN]$"),
    Unique(Seq("id")))

  test("report: one count per rule, nulls don't trip value rules") {
    val r = Quality.report(df, rules)
      .as[(String, Long)].collect().toMap
    assert(r("not_null(flag)") == 1)
    assert(r("in_range(v,0.0,50.0)") == 2)
    assert(r("matches(flag)") == 1) // the null flag doesn't double-count
    assert(r("unique(id)") == 1) // one row beyond the first for id=1
    // clean table reports all zeros
    val clean = Quality.report(df.filter($"id" === 3), rules)
      .as[(String, Long)].collect().toMap
    assert(clean.values.forall(_ == 0L))
  }

  test("observed: violation counters ride the pipeline's own action") {
    val rowRules = rules.filterNot(_.isInstanceOf[Unique])
    val (instrumented, obs) = Quality.observed(df, rowRules)
    // the pipeline's real work — no separate quality scan anywhere
    val kept = instrumented.filter($"v" >= 0).count()
    assert(kept == 3)
    val m = obs.get
    assert(m("not_null(flag)") == 1L)
    assert(m("in_range(v,0.0,50.0)") == 2L)
    assert(m("matches(flag)") == 1L)
    // Unique cannot ride a row stream
    intercept[IllegalArgumentException] {
      Quality.observed(df, rules)
    }
  }

  test("violations: failing rows tagged with every failed rule") {
    val v = Quality.violations(df, rules)
      .select($"id", $"v", $"failed_rules")
      .as[(Long, Double, Seq[String])].collect()
      .map(r => (r._1, r._2) -> r._3.toSet).toMap
    assert(v.size == 2)
    assert(v((1L, 99.0)) == Set("not_null(flag)", "in_range(v,0.0,50.0)"))
    assert(v((2L, -5.0)) == Set("in_range(v,0.0,50.0)", "matches(flag)"))
    intercept[IllegalArgumentException](
      Quality.violations(df, Seq(Unique(Seq("id")))))
  }
}
