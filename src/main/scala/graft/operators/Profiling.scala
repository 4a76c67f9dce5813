package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-distribution profiling — the diagnostics you run BEFORE picking
  * a physical strategy at 100 TB: a join/agg key's skew profile decides
  * between a plain shuffle join, a broadcast, or the salted-key plan
  * (operators.SkewJoin), and per-key counts decide shuffle-partition
  * sizing. No reference counterpart (its DBMS hides the physical
  * layer); sibling of Quality's corpus stats.
  *
  * All-integer outputs (counts, floor-division ratios in thousandths)
  * — the repo-wide fixed-point discipline, so profiles are
  * oracle-exact cross-engine.
  */
object Profiling {

  /** Skew ratios are thousandths: 1000 = perfectly uniform. */
  val Scale: Long = 1000L

  /** Key-distribution profile of a prospective join/agg key: the top
    * `topK` heaviest keys by (count desc, key), each row carrying the
    * global summary — total rows, distinct keys, max/avg per-key count
    * and `skew_x1000 = max*1000 div avg` (a 50x-skewed key reads
    * 50000). One aggregation over the data (map-side partial), a
    * 1-row summary broadcast onto a TakeOrderedAndProject top-k: no
    * full sort, no second scan. */
  def keySkew(df: DataFrame, key: Column, topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK=$topK must be >= 1")
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
    val summary = counts
      .agg(sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_cnt"))
      .select(col("n_rows"), col("n_keys"), col("max_cnt"),
        expr("n_rows div n_keys").as("avg_cnt"),
        expr(s"(max_cnt * $Scale) div (n_rows div n_keys)")
          .as("skew_x1000"))
    counts.orderBy(col("cnt").desc, col("key")).limit(topK)
      .crossJoin(broadcast(summary))
  }

  /** Exact distribution-drift report between two slices of a numeric
    * column (corpus version A vs B, yesterday vs today): fixed-width
    * histogram of each side, full-outer aligned by bucket, zero-filled,
    * with the per-bucket absolute difference. Sum `abs_diff` for the L1
    * (total-variation x2) drift in ROWS — integral end to end, so the
    * report is oracle-exact (the only float op is floor(x/width), an
    * IEEE-exact division+floor both engines share).
    *
    * Two map-side-partial aggregations + one bucket-keyed join of
    * histogram-sized (not data-sized) inputs — nothing here scales with
    * row count past the first aggregation. */
  def histogramDrift(a: DataFrame, b: DataFrame, x: Column, width: Double)
      : DataFrame = {
    require(width > 0, s"width=$width must be > 0")
    def hist(df: DataFrame, n: String) =
      df.select(floor(x / lit(width)).cast("long").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as(n))
    hist(a, "n_a").join(hist(b, "n_b"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        abs(coalesce(col("n_a"), lit(0L)) - coalesce(col("n_b"), lit(0L)))
          .as("abs_diff"))
  }

  /** Per-column table profile — the schema-discovery / constraint-
    * suggestion pass (null counts feed NOT NULL candidates, distinct
    * counts feed key candidates): one row per profiled column with
    * `n_rows`, `n_nulls`, exact `n_distinct` (counts nulls as a value
    * like SQL COUNT(DISTINCT) does NOT — nulls are excluded), and
    * min/max rendered as strings so heterogeneous columns stack.
    *
    * ONE aggregation pass over the data produces a single wide row
    * (Catalyst plans the multi-column COUNT(DISTINCT)s as one Expand —
    * data×|cols| rows through a partial aggregate, still map-side
    * combined and far cheaper than |cols| scans); the row then explodes
    * into the per-column report, so the report itself is |cols|-sized.
    * Cast non-string/date columns deterministically upstream (doubles
    * through decimal) if the profile must be engine-exact. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no column $c"))
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__cnt_$c"),
      countDistinct(col(c)).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__mn_$c"),
      max(col(c)).cast("string").as(s"__mx_$c")))
    df.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(explode(array(cols.map(c => struct(
          lit(c).as("col_name"),
          col("__n").as("n_rows"),
          (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
          col(s"__nd_$c").as("n_distinct"),
          col(s"__mn_$c").as("min_value"),
          col(s"__mx_$c").as("max_value"))): _*)).as("p"))
      .select(col("p.*"))
  }

  /** EXACT equi-depth histogram of an integral column: `buckets` ranges
    * each holding n/buckets (±1) rows, with per-bucket count and
    * lo/hi bounds — the statistics pass behind range-partition planning
    * and quantile reporting when approx (KLL) is not enough.
    *
    * The naive form — NTILE() over a global ORDER BY — collapses to one
    * partition (the same cliff Ids.denseGlobalRowNumber exists for), so
    * this routes through the range-repartitioned global row number and
    * assigns bucket = row_id*buckets div n (Bresenham-even sizes, a
    * deterministic pure-integer rule shared with the SQL oracle).
    * Cost: the zip's count job + main job, then a bucket-keyed
    * aggregation — full parallelism throughout. `order` must extend `v`
    * with a unique tiebreaker so the total order (and hence bucket
    * membership at duplicate values) is engine-independent. */
  def equiDepthHistogram(df: DataFrame, v: Column, tieBreak: Seq[String],
      buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets=$buckets must be >= 1")
    require(tieBreak.nonEmpty,
      "equiDepthHistogram needs a unique tiebreaker column")
    val base = df.select((v.as("__v") +: tieBreak.map(col)): _*)
    val (ranked, n) = Ids.denseGlobalRowNumberWithCount(base,
      col("__v") +: tieBreak.map(col))
    ranked
      .select(expr(s"(row_id * $buckets) div ${math.max(n, 1L)}L")
        .as("bucket"), col("__v"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), min(col("__v")).as("lo"),
        max(col("__v")).as("hi"))
  }

  /** Two-sample Kolmogorov-Smirnov drift statistic, EXACT: the KS
    * distance sup|F_a - F_b| is found by comparing empirical CDFs only
    * at observed values, and the comparison cross-multiplies instead of
    * dividing — |cumA * nB - cumB * nA| is exact decimal(38) — so the
    * argmax value, the scaled statistic, and every intermediate are
    * engine- and partitioning-exact (the usual float-CDF form drifts in
    * the last ulp and can flip the argmax). Output: one row — n_a, n_b,
    * ks_at (the value attaining the sup, earliest on ties), ks_x1e6
    * (floor-divided millionths of the statistic).
    *
    * Scale shape: one grouped count over the union, two distributed
    * prefix sums (Ids.prefixSum — no single-partition window), one
    * max-of-struct aggregate. Complements histogramDrift (bucketed L1)
    * with the distribution-free sup statistic. */
  def ksReport(a: DataFrame, b: DataFrame, v: Column): DataFrame = {
    val merged = a.select(v.as("value")).withColumn("ca", lit(1L))
      .withColumn("cb", lit(0L))
      .unionByName(b.select(v.as("value")).withColumn("ca", lit(0L))
        .withColumn("cb", lit(1L)))
      .where(col("value").isNotNull)
      .groupBy(col("value"))
      .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
    val c1 = Ids.prefixSum(merged, Seq(col("value")), col("ca"), "cum_a")
    val c2 = Ids.prefixSum(c1, Seq(col("value")), col("cb"), "cum_b")
    val tot = merged.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    c2.crossJoin(broadcast(tot))
      .withColumn("__d",
        abs(col("cum_a").cast("decimal(38,0)") * col("n_b") -
          col("cum_b").cast("decimal(38,0)") * col("n_a")))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(struct(col("__d"), (-col("value")).as("nv"))).as("__m"))
      .select(col("n_a"), col("n_b"), (-col("__m.nv")).as("ks_at"),
        expr("""CAST(__m.__d * 1000000 DIV
                (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)""")
          .as("ks_x1e6"))
  }

  /** Append `outCol` = this row's EXACT global k-quantile bucket
    * (1..k) under the total order (v, tieBreak) — the per-row companion
    * of [[equiDepthHistogram]], same scale rationale: global NTILE
    * collapses to one partition, the range-repartitioned row number
    * keeps full parallelism, and bucket = row_id*k div n is the
    * deterministic Bresenham rule an ANSI oracle reproduces. */
  def exactBucket(df: DataFrame, v: Column, tieBreak: Seq[Column],
      k: Int, outCol: String): DataFrame = {
    require(k >= 1 && tieBreak.nonEmpty)
    // n rides out of the ranking's own offsets job — no third pass over
    // the (often expensive) upstream, no crossJoin
    val (ranked, n) = Ids.denseGlobalRowNumberWithCount(
      df, v +: tieBreak, "__rk")
    ranked.withColumn(outCol,
        expr(s"(__rk * $k) div ${math.max(n, 1L)}L") + 1)
      .drop("__rk")
  }

  /** Functional-dependency audit: for each candidate `lhs -> rhs` pair,
    * does lhs determine rhs, and how badly does it fail? Output one row
    * per pair: distinct-lhs group count, number of groups where rhs
    * takes >1 value, and the worst group's variant count — the
    * discovery pass behind key/constraint suggestions and denormalized-
    * table sanity checks. One map-side-combined aggregation per pair
    * over (lhs, rhs) — pairs are few, data passes are per-pair but each
    * is a plain two-level aggregate, no joins, no windows. */
  def fdAudit(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "fdAudit needs at least one candidate pair")
    pairs.foreach { case (l, r) =>
      require(df.columns.contains(l) && df.columns.contains(r),
        s"no such columns ($l, $r)")
    }
    pairs.map { case (l, r) =>
      df.groupBy(col(l)).agg(countDistinct(col(r)).as("__nd"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("__nd") > 1, 1L).otherwise(0L)).as("n_violating"),
          max(col("__nd")).as("max_rhs_variants"))
        .select(lit(l).as("lhs_col"), lit(r).as("rhs_col"),
          col("n_groups"), col("n_violating"), col("max_rhs_variants"))
    }.reduce(_ unionAll _)
  }

  /** Chi-square association report between two low-cardinality
    * categorical columns: the contingency table with each cell's
    * observed count, expected count under independence, and chi-square
    * contribution (sum `contrib` for the statistic; the per-cell form
    * keeps every float op a fixed scalar dag over exact integers —
    * bit-identical cross-engine, where a distributed float SUM of the
    * statistic would drift with partition order).
    *
    * One aggregation over the data builds the cells; margins and the
    * total re-aggregate the CELLS (contingency-sized, not data-sized)
    * and broadcast back. Counts must stay under ~2^26 per margin pair
    * so r*c is float-exact (< 2^53) — true for any plausible
    * contingency use. */
  /** G-test of uniformity (the likelihood-ratio counterpart of the χ²
    * goodness-of-fit test — additive across partitions of the data,
    * which χ² is not): per key, G = 2·Σ_b O_b·ln(O_b/E) with
    * E = N/nBuckets, testing whether events spread evenly over the
    * bucket domain (hour-of-day skew, shard imbalance, die-fairness).
    *
    * HASH-EXACT through the integer log2: O_b·ln(O_b/E) =
    * O_b·(log2(O_b·nBuckets) − log2 N)·ln2, so
    * g_num_fp = Σ O_b·(L(O_b·nBuckets) − L(N)) in 2⁻²⁰ log2-units is a
    * pure-integer statistic (decimal(38,0) sums — O·L outruns int64
    * past N ≈ 10¹²; BIGINT at the gate) and `g_stat` = 2ln2·g_num_fp/2²⁰
    * is one fixed IEEE dag. Empty buckets contribute 0 (the O→0
    * limit), exactly as the G-test defines. Shuffle = the (key, bucket)
    * cell domain; the per-key total is a window over ≤nBuckets cells.
    * Output per key: (key, n_events, n_buckets_hit, g_num_fp, g_stat). */
  def gTestUniform(df: DataFrame, key: Column, bucket: Column,
      nBuckets: Int, keyName: String = "key"): DataFrame = {
    import graft.functions.FixedLogFunctions.log2_fp
    require(nBuckets > 1, s"nBuckets must exceed 1: $nBuckets")
    val cells = df.select(key.as(keyName), bucket.as("__b"))
      .where(col("__b").isNotNull)
      .groupBy(col(keyName), col("__b")).agg(count(lit(1)).as("__o"))
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyName))
    cells
      .withColumn("__n", sum(col("__o")).over(byKey))
      .withColumn("__term",
        (col("__o").cast("decimal(19,0)") *
          (log2_fp(col("__o") * nBuckets) - log2_fp(col("__n"))))
          .cast("decimal(38,0)"))
      .groupBy(col(keyName))
      .agg(max(col("__n")).as("n_events"),
        count(lit(1)).as("n_buckets_hit"),
        sum(col("__term")).cast("decimal(38,0)").as("__g"))
      .select(col(keyName), col("n_events"), col("n_buckets_hit"),
        col("__g").cast("long").as("g_num_fp"),
        (lit(1.3862943611198906d) * col("__g").cast("double") /
          lit(1048576.0d)).as("g_stat"))
  }

  def chi2Association(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df.groupBy(a.as("a"), b.as("b"))
      .agg(count(lit(1)).as("observed"))
    val ra = cells.groupBy(col("a")).agg(sum(col("observed")).as("__r"))
    val cb = cells.groupBy(col("b")).agg(sum(col("observed")).as("__c"))
    val tot = cells.agg(sum(col("observed")).as("__t"))
    val e = (col("__r") * col("__c")).cast("double") /
      col("__t").cast("double")
    val od = col("observed").cast("double")
    cells.join(broadcast(ra), "a").join(broadcast(cb), "b")
      .crossJoin(broadcast(tot))
      .withColumn("expected", e)
      .withColumn("contrib",
        (od - col("expected")) * (od - col("expected")) / col("expected"))
      .select(col("a"), col("b"), col("observed"), col("expected"),
        col("contrib"))
  }

  /** Mutual information between two categorical columns, HASH-EXACT —
    * the information-theoretic association measure next to
    * [[chi2Association]] (chi2 tests independence; MI quantifies the
    * shared information in bits, comparable across column pairs for
    * feature selection). Per-cell report:
    * `mi_num = n_ab * (L(N) + L(n_ab) - L(n_a) - L(n_b))` with L = the
    * fixed-point integer `log2_fp`, so
    * `MI_bits = sum(mi_num) / (N * 2^20)` — every op exact integer,
    * no libm, oracle-replayable. NULL categories are their own class
    * (GROUP BY semantics in both engines).
    *
    * One aggregation over the data builds the cells; margins and the
    * total re-aggregate the CELLS (contingency-sized) and broadcast
    * back — the chi2Association shape. */
  def mutualInfo(df: DataFrame, a: Column, b: Column): DataFrame = {
    import graft.functions.FixedLogFunctions.log2_fp
    val cells = df.groupBy(a.as("a"), b.as("b"))
      .agg(count(lit(1)).as("n_ab"))
    val ra = cells.groupBy(col("a")).agg(sum(col("n_ab")).as("n_a"))
    val cb = cells.groupBy(col("b")).agg(sum(col("n_ab")).as("n_b"))
    val tot = cells.agg(sum(col("n_ab")).as("n_tot"))
    cells.join(broadcast(ra), "a").join(broadcast(cb), "b")
      .crossJoin(broadcast(tot))
      .withColumn("lr_fp",
        log2_fp(col("n_tot")) + log2_fp(col("n_ab")) -
          log2_fp(col("n_a")) - log2_fp(col("n_b")))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        col("n_tot"), col("lr_fp"),
        (col("n_ab") * col("lr_fp")).as("mi_num"))
  }

  /** Population-stability-index (PSI) drift report between a baseline
    * and a current sample of one numeric column — the standard
    * ML-monitoring drift score, HASH-EXACT: the log lives in the
    * fixed-point integer `log2_fp` expression (no libm anywhere) and
    * each bucket's contribution is reported as an exact integer
    * FRACTION (`psi_num` over the constant `denom`) rather than a
    * float, so no cross-engine division semantics are involved.
    * `PSI_nats = ln(2) * sum(psi_num) / denom`.
    *
    * Buckets are `nBuckets` equal-width slices of the caller-declared
    * `[lo, hi)` Long domain (values clamp to the edge buckets — the
    * production convention where the bucket spec is frozen with the
    * baseline, NOT re-derived from data). Every bucket appears (a
    * broadcast 0..n-1 spine), with Laplace +1 smoothing so empty
    * buckets contribute finitely:
    * `p_b=(c_base+1)/(T+n), q_b=(c_cur+1)/(R+n)`, and
    * `psi_num = ((c_base+1)(R+n) - (c_cur+1)(T+n)) * log2r_fp`,
    * `log2r_fp = L(c_base+1)+L(R+n)-L(c_cur+1)-L(T+n)` with L =
    * log2_fp. Decimal(38) products keep 100 TB-scale counts exact
    * INTERNALLY; the gate projection casts psi_num/denom to BIGINT
    * (the no-final-decimal contract, SURVEY §5), which caps the
    * RATIONAL readout near 3M rows per sample side — past that the
    * rational columns null out while the double `psi` stays correct.
    * Two count aggregations (map-side partial) + bounded-state
    * broadcasts: nothing here grows past `nBuckets` rows. */
  def psiReport(base: DataFrame, cur: DataFrame, v: Column,
      lo: Long, hi: Long, nBuckets: Int): DataFrame = {
    require(nBuckets >= 2 && hi > lo,
      s"need nBuckets >= 2 and hi > lo: $nBuckets, [$lo, $hi)")
    import graft.functions.FixedLogFunctions.log2_fp
    val spark = base.sparkSession
    def bucketed(df: DataFrame, out: String): DataFrame =
      df.filter(v.isNotNull).select(v.cast("long").as("__pv"))
        .groupBy(expr(s"least(${nBuckets - 1}, greatest(0, " +
          s"((__pv - $lo) * $nBuckets) div ${hi - lo}))").as("bucket"))
        .agg(count(lit(1)).as(out))
    val cb = bucketed(base, "c_base")
    val cc = bucketed(cur, "c_cur")
    val spine = spark.range(nBuckets).select(col("id").as("bucket"))
      .join(cb, Seq("bucket"), "left").join(cc, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("c_base"), lit(0L)).as("c_base"),
        coalesce(col("c_cur"), lit(0L)).as("c_cur"))
    val tot = spine.agg(
      (sum(col("c_base")) + nBuckets).as("__tn"),
      (sum(col("c_cur")) + nBuckets).as("__rn"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    // internal math is exact decimal; the GATE projection is BIGINT —
    // the driver's hash converts decimal columns through a pandas path
    // that diverges from Spark's parquet decimal even at equal values,
    // so no final schema may carry DecimalType (see SURVEY §5)
    spine.crossJoin(broadcast(tot))
      .withColumn("log2r_fp",
        log2_fp(col("c_base") + 1) + log2_fp(col("__rn")) -
          log2_fp(col("c_cur") + 1) - log2_fp(col("__tn")))
      .select(col("bucket"), col("c_base"), col("c_cur"), col("log2r_fp"),
        ((dec(col("c_base") + 1) * dec(col("__rn")) -
          dec(col("c_cur") + 1) * dec(col("__tn"))) *
          dec(col("log2r_fp"))).cast("long").as("psi_num"),
        (dec(col("__tn")) * dec(col("__rn")) *
          dec(lit(1L << graft.functions.FixedLog.FracBits)))
          .cast("long").as("denom"))
  }

  /** Pairwise Pearson correlation across `cols` in ONE aggregation
    * pass: every per-column sum/square-sum and per-pair product sum
    * accumulates exactly (money-quantized decimal), then each pair's
    * r comes from the standard fixed double dag over those identical
    * inputs — order-free, hence hash-exact. Rows with a null in ANY
    * profiled column are excluded (one shared n keeps the matrix
    * internally consistent — the complete-case convention).
    *
    * Output: one row per unordered pair (col_a < col_b by input
    * order): (col_a, col_b, n, corr); corr null when either side is
    * constant. The K(K−1)/2 pair rows explode from the single
    * aggregate row — the corpus is scanned ONCE regardless of K. */
  def correlationPairs(df: DataFrame, cols: Seq[(String, Column)])
      : DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val named = cols.map { case (n, c) =>
      n -> graft.ColUtil.money(c).as(s"__v_$n") }
    val base = df.select(named.map(_._2): _*)
      .where(cols.map { case (n, _) => col(s"__v_$n").isNotNull }
        .reduce(_ && _))
    val aggs =
      cols.map { case (n, _) => sum(col(s"__v_$n")).as(s"__s_$n") } ++
      cols.map { case (n, _) =>
        sum((col(s"__v_$n") * col(s"__v_$n")).cast("decimal(38,8)"))
          .as(s"__q_$n") } ++
      cols.combinations(2).map { case Seq((a, _), (b, _)) =>
        sum((col(s"__v_$a") * col(s"__v_$b")).cast("decimal(38,8)"))
          .as(s"__p_${a}_$b") }.toSeq
    val agg = base.agg(count(lit(1)).as("n"), aggs: _*)
    def d(c: String) = col(c).cast("double")
    val dn = col("n").cast("double")
    val pairRows = cols.combinations(2).map { case Seq((a, _), (b, _)) =>
      val num = dn * d(s"__p_${a}_$b") - d(s"__s_$a") * d(s"__s_$b")
      val va = dn * d(s"__q_$a") - d(s"__s_$a") * d(s"__s_$a")
      val vb = dn * d(s"__q_$b") - d(s"__s_$b") * d(s"__s_$b")
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        when(va > 0 && vb > 0, num / (sqrt(va) * sqrt(vb)))
          .as("corr"))
    }.toSeq
    agg.select(col("n"), explode(array(pairRows: _*)).as("__pr"))
      .select(col("__pr.col_a"), col("__pr.col_b"), col("n"),
        col("__pr.corr"))
  }

  /** Order-independent content digest per group — "is this table the
    * same data over there": row digests are the arithmetic md5-nibble
    * u32 of a '|'-joined column key (the one hash protocol every
    * engine here reproduces — NOT xxhash64, which no oracle can
    * replay), folded per group as SUM and SUM OF SQUARES. Both folds
    * commute, so the digest is invariant to row order, partitioning,
    * and engine; the squares fold catches the multiset differences a
    * plain sum cancels (two rows swapped between groups, +d here −d
    * there). A replica diverging in ANY row changes (n_rows,
    * digest_sum, digest_sq) with overwhelming probability — the
    * cross-engine migration audit in one aggregation pass, no sort,
    * no row shipping. NULL columns fold as the literal 'ø' so
    * NULL-vs-empty-string differences register. */
  def contentDigest(df: DataFrame, group: Column, cols: Seq[Column])
      : DataFrame = {
    require(cols.nonEmpty, "contentDigest needs key columns")
    val key = concat_ws("|",
      cols.map(c => coalesce(c.cast("string"), lit("ø"))): _*)
    val u32 = conv(substring(md5(key), 1, 8), 16, 10)
      .cast("decimal(38,0)")
    // gate projection: digest_sum fits int64 (u32 sums), digest_sq can
    // exceed it (u32² sums), so it ships as the exact digit string —
    // no final-schema DecimalType (driver-hash hazard, SURVEY §5).
    // digest_sum shares the overflow class at ~4.3e9 rows/group (u32
    // draws average 2^31): the same digit-string route keeps the
    // digest exact at any group size
    df.select(group.as("grp"), u32.as("__h"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__h")).cast("decimal(38,0)")
          .cast("string").as("digest_sum"),
        sum(col("__h") * col("__h")).cast("decimal(38,0)")
          .cast("string").as("digest_sq"))
  }
}
