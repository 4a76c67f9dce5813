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

  test("compressionStats: repetitive text compresses far better than " +
      "prose; ratio monotone; empty/null-safe") {
    val prose = "the quick brown fox jumps over a lazy dog while " +
      "seventeen violet zeppelins drift across the quiet harbor at dusk"
    val docs = Seq(
      (1L, "spam " * 400),                // pure repetition
      (2L, prose * 4),                    // natural-ish prose
      (3L, (1 to 200).map(i => s"w${i * 7919 % 9973}").mkString(" ")),
      (4L, ""),                           // empty: passes, null ratio
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .compressionStats(docs, "doc_id", col("text"), minRatio = 0.2)
      .collect().map(r => r.getLong(0) -> r).toMap
    def ratio(id: Long) = out(id).getAs[Double]("compress_ratio")
    assert(ratio(1L) < 0.05, s"repetition should crush: ${ratio(1L)}")
    assert(ratio(3L) > ratio(2L), "distinct tokens compress worse")
    assert(ratio(1L) < ratio(2L))
    assert(!out(1L).getAs[Boolean]("passes_compression"))
    assert(out(3L).getAs[Boolean]("passes_compression"))
    assert(out(4L).isNullAt(out(4L).fieldIndex("compress_ratio")))
    assert(out(4L).getAs[Boolean]("passes_compression"))
    assert(out(5L).getAs[Boolean]("passes_compression"))
    // SQL surface + codegen/eval parity for the native expression
    graft.GraftFunctions.register(spark)
    docs.createOrReplaceTempView("cmp_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, deflate_len(text) AS d FROM cmp_docs WHERE " +
        "text IS NOT NULL").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaSql(1L) == out(1L).getAs[Int]("n_deflate"))
    assert(viaSql(2L) == out(2L).getAs[Int]("n_deflate"))
  }

  test("madOutliers: hand-computed median/MAD per group, robust to " +
      "contamination that drags the mean") {
    // group a: values 1..9 plus two gross outliers; med = 5 over the
    // 11 values? values: 1..9 median 5 -> with outliers 1000,2000:
    // sorted [1..9,1000,2000], n=11, med = 6th = 6... keep it simple
    // and hand-compute: med=6, |x-6| = [5,4,3,2,1,0,1,2,3,994,1994],
    // MAD = median = 3, cutoff = 3*1.4826*3 = 13.3434
    val df = ((1 to 9).map(i => ("a", i.toDouble)) ++
      Seq(("a", 1000.0), ("a", 2000.0)) ++
      Seq(("b", 10.0), ("b", 10.0), ("b", 10.0), ("b", 10.5)))
      .toDF("g", "v")
    val out = Quality.madOutliers(df, $"g", $"v")
      .select($"g", $"v", $"med", $"mad", $"cutoff")
      .collect()
    val a = out.filter(_.getString(0) == "a")
    assert(a.map(_.getDouble(1)).sorted.toSeq == Seq(1000.0, 2000.0))
    assert(a.head.getDouble(2) == 6.0 && a.head.getDouble(3) == 3.0)
    assert(math.abs(a.head.getDouble(4) - 3 * 1.4826 * 3) < 1e-12)
    // group b: med=10, MAD=0 (zero-MAD caveat) -> only 10.5 flagged
    val b = out.filter(_.getString(0) == "b")
    assert(b.map(_.getDouble(1)).toSeq == Seq(10.5))
    // the mean-based view would call nothing in 1..9 an outlier after
    // contamination shifts the mean to ~277 — MAD still centers at 6
  }

  test("iqrOutliers: Tukey fences per group, nulls never flagged") {
    // group a: 1..9 + outlier 100 (+ a null, ignored by the quartiles and
    // never flagged). Sorted [1..9,100]: q1 interpolates at 2.25 -> 3.25,
    // q3 at 6.75 -> 7.75, iqr 4.5 -> fences [-3.5, 14.5]; only 100
    // escapes. group b: [5,5,5,6] -> q1 5.0, q3 5.25 -> fences
    // [4.625, 5.625]; 6.0 escapes.
    val df = ((1 to 9).map(i => ("a", Some(i.toDouble))) :+
      ("a", Some(100.0)) :+ ("a", Option.empty[Double]) :+
      ("b", Some(5.0)) :+ ("b", Some(5.0)) :+ ("b", Some(5.0)) :+
      ("b", Some(6.0)))
      .toDF("g", "v")
    val out = Quality.iqrOutliers(df, $"g", $"v")
      .select($"g", $"v", $"lo", $"hi")
      .as[(String, Double, Double, Double)].collect().sortBy(r => (r._1, r._2))
    assert(out.map(r => (r._1, r._2)).toSeq == Seq(("a", 100.0), ("b", 6.0)))
    val a = out.head
    assert(a._3 == 3.25 - 1.5 * 4.5 && a._4 == 7.75 + 1.5 * 4.5)
  }

  test("tableDiff: null-safe per-column flags and row classes") {
    import spark.implicits._
    val old_ = Seq((1L, Some("a"), Some(1.0)), (2L, None, Some(2.0)),
      (3L, Some("c"), None), (4L, Some("d"), Some(4.0)))
      .toDF("k", "s", "v")
    val new_ = Seq((1L, Some("a"), Some(1.0)), // unchanged
      (2L, Some("b"), Some(2.0)), // null -> value: changed_s
      (3L, Some("c"), None), // null <=> null: unchanged
      (5L, Some("e"), Some(5.0))) // added; 4 removed
      .toDF("k", "s", "v")
    val got = graft.operators.Diff
      .tableDiff(old_, new_, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("n_added" -> 1L, "n_removed" -> 1L,
      "n_changed" -> 1L, "n_unchanged" -> 2L,
      "changed_s" -> 1L, "changed_v" -> 0L))
  }

  test("readability counts and scores on known English sentences") {
    val docs = Seq(
      (1L, "The cat sat on the mat. It was happy!"),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis
      .readability(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    // sentence runs: ". " and "!" -> 2; words: 9 letter runs;
    // syllables: the(1) cat(1) sat(1) on(1) the(1) mat(1) it(1)
    // was(1) ha-ppy(2) = 10
    assert(r(0).getLong(1) == 2L && r(0).getLong(2) == 9L &&
      r(0).getLong(3) == 10L)
    val fk = 0.39 * (9.0 / 2) + 11.8 * (10.0 / 9) - 15.59
    assert(math.abs(r(0).getDouble(4) - fk) < 1e-12)
    // null text: zero words -> clamped sentence count, null scores
    assert(r(1).getLong(1) == 1L && r(1).getLong(2) == 0L)
    assert(r(1).isNullAt(4) && r(1).isNullAt(5))
  }

  test("winsorize keeps every row and clips exactly at the fences") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val w = Quality.winsorize(df, $"g", $"v", 0.10, 0.90)
    assert(w.count() == 100)
    val r = w.agg(min($"value_w"), max($"value_w"),
      sum(($"value_w" === $"lo").cast("long")),
      sum(($"value_w" === $"hi").cast("long"))).head()
    // percentile_cont fences on 1..100 at 0.1/0.9 — 90.1 lands on the
    // IEEE interpolation artifact 90.10000000000001, deterministically
    assert(r.getDouble(0) == 10.9 && r.getDouble(1) == 90.10000000000001)
    assert(r.getLong(2) == 10L && r.getLong(3) == 10L)
  }

  test("sentences: partition of the text, ordinals pin position") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "Hello world. How are you? Fine! Trailing frag"),
      (2L, "No terminator at all"),
      (3L, "Ends clean."),
      (4L, "Dots... then more.  "),
      (5L, "")).toDF("doc_id", "t")
    val out = TextAnalysis.sentences(docs, "doc_id", col("t"))
      .select($"doc_id", $"sent_idx", $"sentence", $"n_chars")
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    assert(out(1L).map(_._3) ==
      Seq("Hello world.", "How are you?", "Fine!", "Trailing frag"))
    assert(out(1L).map(_._2) == Seq(1L, 2L, 3L, 4L))
    assert(out(2L).map(_._3) == Seq("No terminator at all"))
    assert(out(3L).map(_._3) == Seq("Ends clean."))
    // "Dots..." consumes the ellipsis into one match; the trailing
    // blank match after the final '.' is dropped but never renumbered
    assert(out(4L).map(_._3) == Seq("Dots...", "then more."))
    assert(out(4L).map(_._2) == Seq(1L, 2L))
    assert(!out.contains(5L))
    assert(out(1L).forall(r => r._4 == r._3.length.toLong))
    // reversibility on the punctuated doc: matches concatenate (with
    // the original inter-sentence whitespace trimmed) to the full text
    assert(out(1L).map(_._3).mkString(" ") ==
      "Hello world. How are you? Fine! Trailing frag")
  }
}
