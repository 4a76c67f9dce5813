package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints — the validation layer an ingest
  * pipeline runs before committing a batch (unique keys, null checks,
  * range/format invariants). Each rule compiles to a plain filter/agg
  * plan; the whole report fuses into ONE pass over the data per rule
  * family (conditional aggregation for row rules, one groupBy for
  * uniqueness), so a report over 100 TB costs a scan, not a scan per
  * rule. */
object Quality {

  sealed trait Rule { def name: String }
  /** Column must be non-null. */
  final case class NotNull(col: String) extends Rule {
    val name = s"not_null($col)"
  }
  /** Column must lie in [lo, hi] (nulls don't violate — pair with
    * NotNull). */
  final case class InRange(col: String, lo: Double, hi: Double)
      extends Rule {
    val name = s"in_range($col,$lo,$hi)"
  }
  /** Column must match the regex (nulls don't violate). */
  final case class Matches(col: String, regex: String) extends Rule {
    val name = s"matches($col)"
  }
  /** Column set must be unique across the table (violations = rows
    * beyond the first per duplicate key). */
  final case class Unique(cols: Seq[String]) extends Rule {
    val name = s"unique(${cols.mkString(",")})"
  }

  private def rowPredicate(r: Rule): Option[Column] = r match {
    case NotNull(c) => Some(col(c).isNull)
    case InRange(c, lo, hi) =>
      Some(col(c).isNotNull && (col(c) < lo || col(c) > hi))
    case Matches(c, re) => Some(col(c).isNotNull && !col(c).rlike(re))
    case _: Unique => None
  }

  /** (rule, n_violations) per rule. Row rules fuse into one conditional
    * aggregation; each Unique rule adds one groupBy pass. Fully LAZY —
    * the report is a plan (row counts unpivoted from the one-row
    * aggregate), so it composes/unions without a driver round-trip. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty)
    val rowRules = rules.flatMap(r => rowPredicate(r).map(r.name -> _))
    val rowReport: Option[DataFrame] =
      if (rowRules.isEmpty) None
      else {
        val aggs = rowRules.map { case (n, p) =>
          sum(when(p, 1L).otherwise(0L)).as(n)
        }
        Some(df.agg(aggs.head, aggs.tail: _*)
          .unpivot(Array.empty[Column],
            rowRules.map { case (n, _) => col(s"`$n`") }.toArray,
            "rule", "n_violations"))
      }
    val uniqueReports = rules.collect { case u: Unique =>
      df.groupBy(u.cols.map(col): _*)
        .agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(col("n") - 1), lit(0L)).as("n_violations"))
        .select(lit(u.name).as("rule"), col("n_violations"))
    }
    (rowReport.toSeq ++ uniqueReports).reduce(_ unionByName _)
  }

  /** In-flight quality monitoring: attach the row rules' violation
    * counters to `df` as OBSERVED metrics — they ride whatever action
    * the pipeline runs anyway (zero extra scans; [[report]] costs its
    * own pass), the way a production ingest job meters itself. Returns
    * the instrumented frame and the Observation; after any action on a
    * derived frame, `observation.get` yields `rule -> n_violations`
    * (Unique rules are aggregation-level and cannot ride a row stream —
    * use [[report]]). Works identically under Structured Streaming
    * (observe is the streaming metrics API). */
  def observed(df: DataFrame, rules: Seq[Rule])
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val preds = rules.flatMap(r => rowPredicate(r).map(r.name -> _))
    require(preds.nonEmpty, "no row-level rules given")
    require(!rules.exists(_.isInstanceOf[Unique]),
      "Unique is table-level: it needs its own aggregation (use report)")
    val obs = org.apache.spark.sql.Observation()
    val metrics = preds.map { case (n, p) =>
      sum(when(p, 1L).otherwise(0L)).as(n)
    }
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** The rows failing any row-level rule, tagged with the failed rule
    * names (Unique rules are table-level and not included here). */
  def violations(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val preds = rules.flatMap(r => rowPredicate(r).map(r.name -> _))
    require(preds.nonEmpty, "no row-level rules given")
    val tags = array(preds.map { case (n, p) =>
      when(p, n).otherwise(lit(null))
    }: _*)
    df.withColumn("failed_rules", filter(tags, _.isNotNull))
      .filter(size(col("failed_rules")) > 0)
  }

  /** Per-group IQR (Tukey-fence) outliers: rows where `value` falls
    * outside [q1 - k*iqr, q3 + k*iqr] of their group's exact interpolated
    * quartiles — the distribution-free outlier rule (a z-score fence
    * needs mean/stddev, which the outliers themselves drag; quartiles
    * don't move). Returns the outlier rows with `lo`/`hi` fence columns.
    *
    * Scale shape: two passes — a per-group quartile aggregation (one
    * shuffle, output bounded by |groups|), broadcast back, map-only fence
    * test. Fence arithmetic is IEEE double with one fixed association
    * (q1 - k*(q3-q1)), bit-identical cross-engine; the quartiles
    * interpolate exactly like ANSI percentile_cont. Null values are never
    * outliers (NULL comparisons are false in both engines). */
  def iqrOutliers(df: DataFrame, group: Column, value: Column,
      k: Double = 1.5): DataFrame = {
    val stats = df.groupBy(group.as("__g"))
      .agg(percentile(value, lit(0.25)).as("__q1"),
        percentile(value, lit(0.75)).as("__q3"))
      .select(col("__g"),
        (col("__q1") - lit(k) * (col("__q3") - col("__q1"))).as("lo"),
        (col("__q3") + lit(k) * (col("__q3") - col("__q1"))).as("hi"))
    df.join(broadcast(stats), group === col("__g"))
      .filter(value < col("lo") || value > col("hi"))
      .drop("__g")
  }

  /** Robust per-group outliers by MEDIAN + MAD (median absolute
    * deviation) — the estimator of choice when the group itself is
    * heavily contaminated: IQR's quartile fences start drifting past
    * ~25% outliers, MAD's breakdown point is 50% (Hampel; Leys et al.
    * 2013). Flags rows with |x − med| > k · 1.4826 · MAD (1.4826
    * rescales MAD to σ under normality; k = 3 is the conventional
    * cutoff).
    *
    * Two grouped exact-percentile passes (median, then median of
    * absolute deviations) with a broadcast rejoin between — both
    * aggregates are bounded by |groups|, the flagging pass is map-only,
    * and the interpolated median is the same cross-engine-exact
    * percentile the IQR/winsorize family already pins. A zero-MAD group
    * (> 50% identical values) flags every row off the shared value —
    * the documented MAD caveat, left to the caller's k. */
  def madOutliers(df: DataFrame, group: Column, value: Column,
      k: Double = 3.0): DataFrame = {
    val med = df.groupBy(group.as("__g"))
      .agg(percentile(value, lit(0.5)).as("med"))
    val withMed = df.join(broadcast(med), group === col("__g")).drop("__g")
    val mad = withMed.groupBy(group.as("__g"))
      .agg(percentile(abs(value - col("med")), lit(0.5)).as("mad"))
    withMed.join(broadcast(mad), group === col("__g"))
      .withColumn("cutoff", lit(k) * lit(1.4826) * col("mad"))
      .filter(abs(value - col("med")) > col("cutoff"))
      .drop("__g")
  }

  /** Winsorize `value` per group: clip to the [pLo, pHi] percentile
    * fences instead of dropping rows — the robust-mean prep step
    * (heavy-tail damping before averaging, the usual companion of
    * [[iqrOutliers]] when rows must be KEPT). Same two-pass shape:
    * per-group percentile aggregate (bounded by |groups|), broadcast
    * back, map-only clip. Adds `value_w` (the clipped value), `lo`,
    * `hi`; percentiles interpolate exactly like ANSI percentile_cont,
    * and clipping double-vs-double is bit-deterministic. Null values
    * pass through unclipped (comparisons are false). */
  def winsorize(df: DataFrame, group: Column, value: Column,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad fences [$pLo,$pHi]")
    val fences = df.groupBy(group.as("__g"))
      .agg(percentile(value, lit(pLo)).as("lo"),
        percentile(value, lit(pHi)).as("hi"))
    df.join(broadcast(fences), group === col("__g"))
      .withColumn("value_w",
        when(value < col("lo"), col("lo"))
          .when(value > col("hi"), col("hi"))
          .otherwise(value))
      .drop("__g")
  }

  /** log10(1 + 1/d) for d = 1..9 — Benford's first-digit law. Computed
    * once on the JVM and embedded as literals in the plan (and rendered
    * into oracle SQL by the query layer), so no engine's libm is in the
    * data path and results are bit-identical everywhere. */
  val BenfordExpected: IndexedSeq[Double] =
    (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** Benford first-digit audit of a positive money-scale column — the
    * classic fabricated-data / unit-mixing detector for financial
    * pipelines. `value` is quantized to decimal(12,2) and the FIRST
    * DIGIT comes from its decimal string (both engines render decimals
    * identically; a double->int cast would differ: Spark truncates,
    * DuckDB rounds). Output per digit 1..9: observed count, Benford-
    * expected count (n * log10(1+1/d), IEEE-exact from the shared
    * literals), and the chi-square contribution — a fixed scalar dag
    * over exact integers, deterministic cross-engine.
    *
    * Scale shape: one map-side-partial aggregate to 9 groups; the
    * digit-total join is a broadcast of 9 rows. Non-positive values are
    * excluded (Benford is defined on positive magnitudes). */
  def benfordReport(df: DataFrame, value: Column): DataFrame = {
    val digits = df.filter(value > 0)
      .select(substring(value.cast("decimal(12,2)").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n_obs"))
    val expectedArr = array(BenfordExpected.map(lit): _*)
    digits
      .withColumn("__total", sum(col("n_obs"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("expected",
        col("__total").cast("double") * element_at(expectedArr, col("digit")))
      .withColumn("chi2_contrib",
        (col("n_obs").cast("double") - col("expected")) *
          (col("n_obs").cast("double") - col("expected")) / col("expected"))
      .select(col("digit"), col("n_obs"), col("expected"),
        col("chi2_contrib"))
  }
}
