package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset splitting for training pipelines.
  *
  * Random `df.sample` draws differently per run, partition layout, and
  * engine — useless for a reproducible train/val/test protocol. The
  * standard fix is CONTENT-HASH bucketing: bucket = hash(id) % 100, split
  * by cumulative ranges. Assignment is then a pure map-only function of
  * the row id: stable across runs, engines, repartitions, and appends
  * (new rows join splits in ratio without reshuffling old ones).
  *
  * The bucket hash is md5 (cross-engine-identical hex) with the first 8
  * nibbles decoded arithmetically — Spark and any ANSI engine compute the
  * exact same integer, so the whole operator is oracle-checkable
  * (ascii/substring/CASE only; no engine-specific hash). */
object Sampling {

  /** Uniform bucket in [0, buckets) from the first 8 md5 nibbles of the
    * id rendered as a string (a full 32-bit value, so modulo bias is
    * < 2^-25 for buckets <= 10^4).
    *
    * Spark side decodes via ONE base-16 `conv` of the 8-char hex prefix
    * — the earlier per-nibble ascii-arithmetic tree repeated the md5
    * subexpression 16x in the plan and codegen did not always eliminate
    * it (a full lineitem pps filter ran 8x slower). Value is identical
    * (first 8 hex chars big-endian IS the nibble sum); the ANSI twin
    * [[hashBucketSql]] keeps the portable nibble-decode formula. */
  def hashBucket(id: Column, buckets: Int = 100): Column = {
    require(buckets > 0)
    // native digest-byte decode (HashExpressions) — identical value to
    // conv(substring(md5(x),1,8),16,10), ~6x faster than conv's generic
    // radix path (parity-spec'd in HashExprSpec)
    graft.functions.HashFunctions.md5_u32(id.cast("string")) % buckets
  }

  /** Split assignment by cumulative bucket ranges: `splits` are
    * (name, percent) summing to 100 — e.g. Seq(("train",80),("val",10),
    * ("test",10)). Adds a `split` column. */
  def hashSplit(df: DataFrame, id: Column,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100 &&
      splits.forall(_._2 > 0), s"split percents must sum to 100: $splits")
    val b = hashBucket(id, 100)
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val expr = splits.zip(cum).init.foldRight(
      lit(splits.last._1): Column) { case (((name, _), hi), acc) =>
      when(b < hi, name).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Weighted mixture sampling: per-GROUP deterministic keep rates — the
    * "domain mixing" step of a training-data pipeline (keep 100% of a
    * high-quality source, 10% of a crawl tier, ...). `rates` maps a group
    * value to its keep percentage; unlisted groups get `defaultRate`.
    *
    * Assignment is the same content-hash bucket as [[hashSplit]]:
    * map-only, stable across runs/engines/appends, and rows of one id
    * keep/drop consistently under every rate change that keeps them
    * (rate increases only ever ADD rows — bucket < 20 implies
    * bucket < 50 — so mixtures can be re-weighted without churning the
    * previously sampled set). Adds `keep_rate` and `kept`. */
  def weightedKeep(df: DataFrame, id: Column, group: Column,
      rates: Seq[(String, Int)], defaultRate: Int = 100): DataFrame = {
    require(rates.forall { case (_, r) => r >= 0 && r <= 100 } &&
      defaultRate >= 0 && defaultRate <= 100,
      s"rates must be percentages in [0,100]: $rates / $defaultRate")
    val rate = rates.foldRight(lit(defaultRate): Column) {
      case ((g, r), acc) => when(group === g, lit(r)).otherwise(acc)
    }
    df.withColumn("keep_rate", rate)
      .withColumn("kept", hashBucket(id, 100) < col("keep_rate"))
  }

  /** Per-group cap: keep at most `k` rows per group, chosen by the
    * deterministic md5 order of the id — a reproducible uniform-ish
    * per-group sample (the "cap every source/domain at N docs" mixture
    * control; the md5 rank is the stand-in for a random draw that is
    * stable across runs, engines, and partitionings). One shuffle on the
    * group key; the per-group window never globalizes. */
  def capPerGroup(df: DataFrame, id: Column, group: Column, k: Int)
      : DataFrame = {
    require(k > 0, s"capPerGroup needs k > 0: $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(md5(id.cast("string")), id)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Exact-k global uniform sample without replacement — the distributed
    * stand-in for reservoir sampling, chosen by the deterministic md5
    * order of the id (same draw protocol as [[capPerGroup]], applied
    * globally). Where [[weightedKeep]]/[[ppsKeep]] hit a TARGET COUNT
    * only in expectation, this returns exactly min(k, n) rows, stable
    * across runs/engines/partitionings.
    *
    * The plan is the point: orderBy(...).limit(k) compiles to
    * TakeOrderedAndProject — each partition keeps a local k-row
    * bounded heap and only those k-row heaps reach the driver-side
    * merge. No global sort, no full shuffle, O(partitions * k) moved:
    * the same cost profile as a per-partition reservoir + merge, but
    * deterministic and oracle-checkable (`ORDER BY md5(id) LIMIT k`). */
  def reservoirK(df: DataFrame, id: Column, k: Int): DataFrame = {
    require(k > 0, s"reservoirK needs k > 0: $k")
    df.orderBy(md5(id.cast("string")), id).limit(k)
  }

  /** Proportional stratified sample: keep exactly ceil(n_g * pct / 100)
    * rows of every group g — the "same fraction of every stratum"
    * guarantee that [[weightedKeep]]'s per-row hash test only hits in
    * expectation (a 10-row stratum at 30% keeps exactly 3 here, not
    * binomial(10, 0.3)). Rows are chosen by the deterministic md5 order
    * of the id, so the sample is stable across runs/engines/partitions.
    *
    * The keep rule is DIVISION-FREE: rank <= ceil(n*pct/100) tested as
    * (rank-1)*100 < n*pct — exact integers, no rounding-mode drift.
    * One shuffle on the group key (rank and count ride the same window
    * partition); a dominant stratum serializes its own window, the
    * standard trade for exact per-group counts. */
  def stratifiedSample(df: DataFrame, id: Column, group: Column,
      pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100]: $pct")
    val byG = org.apache.spark.sql.expressions.Window.partitionBy(group)
    val w = byG.orderBy(md5(id.cast("string")), id)
    df.withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(byG))
      // row_number is IntegerType: (rk-1)*100 overflows int for strata
      // past ~21.4M rows — widen to long BEFORE the multiply (the count
      // side is already long)
      .filter((col("__rk").cast("long") - 1) * 100 < col("__n") * pct)
      .drop("__rk", "__n")
  }

  /** Probability-proportional-to-size Bernoulli sampling: keep a row iff
    * hashBucket(id, den) < weight, i.e. with probability weight/den —
    * the importance-sampling primitive (oversample long documents, heavy
    * orders, rare classes) in the same deterministic md5-nibble protocol
    * as [[hashSplit]]: map-only, no shuffle, stable across runs/engines/
    * appends, and exactly reproducible in ANSI SQL via [[hashBucketSql]].
    * `weight` must be integral-valued in [0, den] (0 = never, den =
    * always); rows keep independently, so the sample needs no global
    * coordination at any scale. */
  def ppsKeep(df: DataFrame, id: Column, weight: Column, den: Int)
      : DataFrame = {
    require(den > 0, s"den must be positive: $den")
    df.filter(hashBucket(id, den) < weight)
  }

  /** The same nibble-decode bucket as ANSI SQL text (for oracle parity
    * and raw-SQL users): identical formula, identical value. */
  /** DSIR-style hashed n-gram importance scores (Xie et al., NeurIPS
    * 2023, "Data Selection for Language Models via Importance
    * Resampling"): rank raw-corpus documents by how target-domain-like
    * their hashed n-gram distribution is. Features are word bigrams
    * hashed into `buckets` cells via the cross-engine md5 bucket
    * ([[hashBucket]] on the gram string); the target and raw corpora
    * reduce to bucket count vectors; a document's importance is the sum
    * over its grams of the add-1-smoothed FIXED-POINT frequency ratio
    *   floor(scale * (c_target[b] + 1) / (c_raw[b] + buckets))
    * — a monotone surrogate for the paper's log-likelihood ratio (sum of
    * ratios, not sum of logs: ln() is not correctly-rounded IEEE and
    * drifts between engines; the integer form is exact everywhere, so
    * the whole operator is oracle-checkable). Feed the scores to
    * [[ppsKeep]] for the resampling step.
    *
    * Returns one row per `raw` document: (id, n_grams, imp_score) —
    * gramless docs score 0. Scale shape: the bucket count vectors are
    * <= `buckets` rows (broadcast); the gram stream is map-only and the
    * only corpus-sized shuffles are the bucket-keyed count (map-side
    * partial, `buckets`-bounded output) and the per-doc score groupBy.
    * The corpus is read twice (count pass + score pass) — inherent to
    * the estimator, both passes pipelined column scans. */
  def importanceScores(raw: DataFrame, target: DataFrame, idCol: String,
      text: Column, buckets: Int = 256,
      scale: Long = 1000000L): DataFrame = {
    require(buckets > 1 && scale > 0, s"buckets=$buckets scale=$scale")
    def grams(df: DataFrame, cols: Seq[Column]) = df.select(
      cols :+ explode(graft.functions.ShingleFunctions
        .word_shingles(text, 2)).as("g"): _*)
    // coalesce marks the computed bucket non-nullable so the broadcast
    // equi-joins below can't resurrect a derived null-filter that
    // re-evaluates the md5 tree (the computed-column pushdown trap)
    def bucketed(df: DataFrame) =
      df.withColumn("b", coalesce(hashBucket(col("g"), buckets), lit(-1L)))
    val rawG = bucketed(grams(raw, Seq(col(idCol))))
    val cRaw = rawG.groupBy(col("b")).agg(count(lit(1)).as("c_raw"))
    val cTgt = bucketed(grams(target, Seq.empty))
      .groupBy(col("b")).agg(count(lit(1)).as("c_tgt"))
    val scored = rawG
      .join(broadcast(cRaw), Seq("b"))
      .join(broadcast(cTgt), Seq("b"), "left")
      .withColumn("imp", expr(
        s"($scale * (coalesce(c_tgt, 0L) + 1L)) div (c_raw + $buckets)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("imp")).as("imp_score"))
    raw.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("imp_score"), lit(0L)).as("imp_score"))
  }

  /** Cross-source QUANTILE NORMALIZATION — the batch-effect correction
    * for mixing corpora whose metric scales disagree (one crawl's
    * "quality 0.9" is another's 0.5): every row's value is replaced by
    * the POOLED value at the same relative rank, so all sources leave
    * with the pooled distribution and downstream thresholds mean the
    * same thing everywhere. Type-1 (floor) quantile matching on exact
    * integer ranks: row with within-source rank r of n_s maps to
    * pooled order statistic ceil(r·N/n_s) — all-integer, so the
    * mapping is engine-exact and fully oracle-checkable.
    *
    * Scale shape: the within-source rank is one window keyed by source
    * (parallel across sources, bounded by the largest source — the
    * sessionize-family contract); the pooled order index is the
    * distributed [[Ids.denseGlobalRowNumber]] (range repartition +
    * zipWithIndex, never a single-partition window); one equi-join on
    * the index hands each row its normalized value.
    *
    * Output: (id, source, value, normalized), money-quantized. */
  def quantileNormalize(df: DataFrame, id: Column, source: Column,
      value: Column): DataFrame = {
    val base = df.select(id.as("id"), source.as("source"),
        graft.ColUtil.money(value).as("value"))
      .where(col("value").isNotNull)
    val wS = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("value"), col("id"))
    val ranked = base
      .withColumn("__r", row_number().over(wS))
      .join(base.groupBy(col("source")).agg(count(lit(1)).as("__ns")),
        "source")
      .crossJoin(broadcast(base.agg(count(lit(1)).as("__N"))))
    val pooled = Ids.denseGlobalRowNumber(
        base.select(col("value").as("normalized"),
          col("source").as("__ps"), col("id").as("__pid")),
        Seq(col("normalized"), col("__ps"), col("__pid")), "__gi")
      .select((col("__gi") + 1).as("__gidx"), col("normalized"))
    ranked
      // ceil(r*N/ns) as exact integers, decimal-widened: r*N reaches
      // N^2 which outruns int64 at corpus scale
      .withColumn("__gidx", expr(
        "CAST((CAST(__r AS DECIMAL(38,0)) * __N + __ns - 1) div __ns" +
          " AS BIGINT)"))
      .join(pooled, "__gidx")
      // exact money-decimals internally; DOUBLE at the gate
      // (final-schema DecimalType is a driver-hash hazard, SURVEY §5)
      .select(col("id"), col("source"),
        col("value").cast("double").as("value"),
        col("normalized").cast("double").as("normalized"))
  }

  /** Deterministic epoch OVERSAMPLING — the materialization half of
    * mixture weighting: a row with replication factor f (fixed-point
    * x1e6, e.g. 2.5e6 = "2.5 epochs of this source") emits floor(f)
    * copies plus one more iff its md5 draw lands under the fractional
    * part — so every engine, rerun, and partitioning materializes the
    * IDENTICAL multiset, and each source's realized volume is within
    * one doc-draw of n * f (the "repeat the high-quality sources" knob
    * of LLM data curricula, done reproducibly instead of by RNG).
    *
    * Map-only: a codegen'd draw + a bounded sequence explode per row;
    * no shuffle at any size. The `copy` index (0-based) keeps replicas
    * distinguishable downstream (epoch-shuffle keys, pack salts). */
  def epochOversample(df: DataFrame, id: Column, factorX1e6: Column)
      : DataFrame = {
    val base = df.withColumn("__f", factorX1e6.cast("long"))
      .where(col("__f") > 0)
    // threshold compares the u32 draw against frac(f) scaled to 2^32;
    // the div is exact integer arithmetic in both engines
    val thr = expr("(__f % 1000000) * 4294967296 div 1000000")
    val u = graft.functions.HashFunctions.md5_u32(
      concat(lit("os#"), id.cast("string")))
    base
      .withColumn("__n",
        expr("__f div 1000000") + when(u < thr, 1L).otherwise(0L))
      .where(col("__n") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__f", "__n")
  }

  /** Weighted exact-k sampling without replacement — the
    * Efraimidis–Spirtakis (2006) A-ES scheme, deterministic: each row
    * draws u = its md5 32-bit hash (uniform over [1, 2³²]) and ranks by
    * u^(1/w); the top k ranks win, giving inclusion odds proportional
    * to weight with EXACTLY k survivors — the slot [[ppsKeep]]
    * (weighted, Bernoulli, inexact k) and [[reservoirK]] (exact k,
    * unweighted) both leave open.
    *
    * With u/2³² uniform on (0,1], maximizing u^(1/w) is minimizing
    * (32 − log2 u)/w, held in fixed point as the POSITIVE key
    * ((32·2²⁰ − log2_fp(u))·2²⁰) div w — positive integer division, so
    * truncation equals floor in every engine (a negative-numerator key
    * would split on Spark-truncates vs DuckDB-floors) and the selection
    * is bit-deterministic (quantization: keys collide only within 2⁻²⁰
    * of log-ratio, broken by id). One TakeOrdered bottom-k, no shuffle
    * beyond it; weights must be positive integers (scale rationals
    * up). */
  def weightedSampleK(df: DataFrame, id: Column, weight: Column, k: Int)
      : DataFrame = {
    require(k > 0, s"k must be positive: $k")
    import graft.functions.FixedLogFunctions.log2_fp
    val u = conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") + 1L
    df.where(weight.isNotNull && weight > 0)
      .withColumn("__es_l", log2_fp(u))
      .withColumn("__es_w", weight.cast("long"))
      // enforce the documented 'positive integer weights' contract at
      // the CAST value: a fractional weight in (0,1) passes the raw
      // `> 0` filter but truncates to 0, which would divide by zero
      // (ANSI crash) or null-key-win the sample — exclude it instead
      .where(col("__es_w") >= 1L)
      .withColumn("__es_key",
        expr("((33554432 - __es_l) * 1048576) div __es_w"))
      .orderBy(col("__es_key"), id)
      .limit(k)
      .drop("__es_l", "__es_w", "__es_key")
  }

  /** Exact class balancing — downsample every label class to the
    * MINORITY class size, the standard rebalance before training on
    * skewed labels: per-class keeps are the first min-count rows in the
    * deterministic md5 order ([[capPerGroup]]'s draw protocol), so the
    * balanced set is deterministic for a given input (same rows in →
    * same keeps out, across runs/engines/partitionings) with EXACTLY
    * min-class-count survivors per class. (The kept id set is NOT
    * stable under appends: a new row whose md5 draw ranks inside the
    * top min-count displaces an existing keep.) One bounded driver
    * action (the min class count — a single long), then one group-keyed
    * window; the rank <= k cut plans as WindowGroupLimit, k survivors
    * per partition before the exchange. */
  def classBalance(df: DataFrame, id: Column, label: Column): DataFrame = {
    val k = df.groupBy(label).agg(count(lit(1)).as("__n"))
      .agg(min(col("__n"))).collect().headOption
      .filterNot(_.isNullAt(0)).map(_.getLong(0)).getOrElse(0L)
    require(k > 0 && k <= Int.MaxValue, s"degenerate class floor: $k")
    capPerGroup(df, id, label, k.toInt)
  }

  /** Rolling-origin (expanding-window) cross-validation segments — the
    * time-series CV protocol (Tashman 2000): rows rank into `folds`
    * time-ordered EQUI-COUNT segments; evaluation fold f trains on
    * segments 1..f and tests on segment f+1, so every fold respects
    * causality and fold sizes are exact, not quantile-approximate.
    * Segments come from [[Profiling.exactBucket]]'s range-partitioned
    * global rank (no one-partition NTILE); `tiebreak` pins rows with
    * equal timestamps deterministically. Adds int-like `segment`
    * (1-based). Compose with [[timeSplitEmbargo]] when an embargo gap
    * between train and test is also needed. */
  def rollingOriginSegments(df: DataFrame, ts: Column, tiebreak: Column,
      folds: Int): DataFrame = {
    require(folds >= 2, s"need >= 2 folds: $folds")
    Profiling.exactBucket(df, ts, Seq(tiebreak), folds, "segment")
  }

  /** Rendezvous (highest-random-weight) shard assignment — the stable
    * sharding protocol (Thaler & Ravishankar 1998): every row scores
    * all `shards` candidates with the cross-engine md5 nibble hash of
    * `id#shard` and lands on the argmax. The property modulo sharding
    * lacks: growing S → S+1 moves only ~1/(S+1) of keys, and every
    * moved key moves INTO the new shard (each existing pairwise order
    * is untouched) — so resizing a 100 TB corpus's shard layout
    * rewrites one new shard's worth of data, not all of it.
    *
    * Map-only; S md5 evaluations per row, so meant for shard counts in
    * the tens-to-hundreds (layout/bucketing), not millions. Ties in the
    * 32-bit hash break to the higher shard index, deterministically.
    * Adds an int `shard` column. */
  def rendezvousShard(df: DataFrame, id: Column, shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    def score(s: Int): Column =
      conv(substring(md5(concat(id.cast("string"), lit("#"),
        lit(s.toString))), 1, 8), 16, 10).cast("long")
    df.withColumn("shard",
      array_max(array((0 until shards).map(s =>
        struct(score(s).as("h"), lit(s).as("s"))): _*)).getField("s"))
  }

  /** Leakage-safe temporal train/test split with an embargo gap — the
    * time-series evaluation protocol (purged splits; López de Prado
    * 2018): rows at or before the `trainPct`-th percentile timestamp
    * train, rows inside `(t*, t* + embargoNanos]` are EMBARGOED (labeled
    * so the caller drops them — they leak label horizon across the
    * boundary), and rows after the gap test. Unlike [[hashSplit]], which
    * is exchangeable by design, this split respects causality: nothing
    * in train happens after anything in test.
    *
    * The boundary t* is the EXACT discrete percentile (smallest t with
    * 100·cum ≥ N·pct — division-free integers), computed from value
    * counts + one distributed prefix sum (shuffled volume = the distinct
    * timestamp domain, no global sort). The labeling pass is map-only
    * against the one-row broadcast boundary. `ts` must be the engine's
    * epoch-nanos long. Adds a `split` column: train/embargo/test. */
  def timeSplitEmbargo(df: DataFrame, ts: Column, trainPct: Int,
      embargoNanos: Long): DataFrame = {
    require(trainPct > 0 && trainPct < 100,
      s"trainPct must be in (0,100): $trainPct")
    require(embargoNanos >= 0, s"embargo must be >= 0: $embargoNanos")
    val perVal = df.select(ts.as("__t")).where(col("__t").isNotNull)
      .groupBy(col("__t")).agg(count(lit(1)).as("__n"))
    val cum = Ids.prefixSum(perVal, Seq(col("__t")), col("__n"), "__cum")
    val tot = perVal.agg(sum(col("__n")).as("__N"))
    // cum and tot share perVal lineage: alias both sides so the analyzer
    // can't see one attribute twice through the self-join
    val boundary = cum.alias("c").crossJoin(broadcast(tot.alias("n")))
      .where(col("c.__cum") * 100 >= col("n.__N") * trainPct)
      .agg(min(col("c.__t")).as("__tstar"))
    df.crossJoin(broadcast(boundary))
      .withColumn("split",
        when(ts <= col("__tstar"), "train")
          .when(ts <= col("__tstar") + lit(embargoNanos), "embargo")
          .otherwise("test"))
      .drop("__tstar")
  }

  /** Deterministic k-negative sampling with positive exclusion — the
    * contrastive-training staple (word2vec/SGNS lineage, Mikolov et al.
    * 2013): for every distinct query in `positives`, draw `k` corpus
    * ids the query is NOT positively paired with, reproducibly.
    *
    * The scale-right shape is INDEXED draws, not candidate joins: the
    * corpus gets a dense global index once (range-partitioned zip — no
    * global-sort cliff), each query derives k+overdraw pseudo-random
    * indices as md5(query#j) mod N (the same cross-engine nibble hash
    * as [[hashBucket]]), and ONE equi-join on the index resolves them —
    * |Q|·(k+overdraw) rows through the exchange, never |Q|×|corpus|.
    * Draws that hit a positive (or repeat within a query) are dropped
    * and the overdraw absorbs the loss: the result keeps the first k
    * surviving draws in draw order (a per-query window over ≤
    * k+overdraw rows). A query whose draws all collide yields fewer
    * than k rows — deterministically; raise `overdraw` if exactness
    * matters (collisions are ~(k+overdraw)·(pos+k)/N).
    *
    * Returns (query_id, rank, neg_id), rank 1..k in draw order. */
  def negativeSample(positives: DataFrame, query: Column, positive: Column,
      corpus: DataFrame, corpusId: Column, k: Int, overdraw: Int = 4)
      : DataFrame = {
    require(k > 0 && overdraw >= 0, s"need k > 0: $k, overdraw >= 0")
    val pos = positives.select(query.as("query_id"), positive.as("pos_id"))
    val ids = corpus.select(corpusId.as("neg_id")).distinct()
    // the two-job zip already counts the corpus — reuse it instead of a
    // separate count() action over the distinct (r10 optimization)
    val (indexed, n) = Ids.denseGlobalRowNumberWithCount(
      ids, Seq(col("neg_id")), "__idx")
    require(n > 0, "empty corpus") // bounded driver state: one long
    val draws = pos.select(col("query_id")).distinct()
      .select(col("query_id"),
        explode(sequence(lit(0), lit(k + overdraw - 1))).as("__j"))
      .withColumn("__idx",
        conv(substring(md5(concat(col("query_id").cast("string"),
          lit("#"), col("__j").cast("string"))), 1, 8), 16, 10)
          .cast("long") % n)
    draws.join(indexed, "__idx")
      .join(pos.withColumnRenamed("pos_id", "neg_id"),
        Seq("query_id", "neg_id"), "left_anti")
      .groupBy(col("query_id"), col("neg_id"))
      .agg(min(col("__j")).as("__j"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("__j"), col("neg_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neg_id"))
  }

  /** Epoch-deterministic global training-order shuffle — the "reshuffle
    * the corpus every epoch" step of a training loader, with no RNG
    * state to carry: the permutation IS the md5 order of `epoch:id`, so
    * any engine, any re-run, and any cluster size derives the identical
    * order, and epoch e+1's order is independent of epoch e's without
    * materializing either (the loader never stores a permutation for a
    * 100 TB corpus; it recomputes the keys).
    *
    * Rows land in `shards` output shards (shard = hash(id) under the
    * epoch salt, mod shards) and get a dense 0-based `pos` within their
    * shard — the physical layout a sharded loader consumes: shard files
    * read sequentially, order within file = sample order. One hash
    * exchange on the shard key plus a per-shard sort; no global sort
    * and no one-partition window (the window partitions BY shard, so
    * parallelism = shard count — size shards to the cluster). 128-bit
    * hex collisions break by id. */
  def epochShuffle(df: DataFrame, id: Column, epoch: Int, shards: Int)
      : DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    val h = md5(concat(lit(s"$epoch:"), id.cast("string")))
    df.withColumn("__eh", h)
      .withColumn("shard",
        conv(substring(col("__eh"), 1, 8), 16, 10).cast("long") % shards)
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("__eh"), id))
        .cast("long") - 1L)
      .drop("__eh")
  }

  /** Deterministic weighted source interleave — the LOAD-TIME mixing
    * schedule of a training pipeline: given per-source integer weights,
    * produce one merged global order in which sources appear in weight
    * proportion over EVERY prefix, not just in expectation. This is
    * weighted fair queuing's virtual-finish-time schedule (Demers,
    * Keshav & Shenker 1989) applied to corpus mixing: row r (0-based,
    * in [[epochShuffle]]'s md5 order within its source) gets virtual
    * time vt = ((r+1) · 2²⁰) div w, and the merged order sorts by
    * (vt, source, id) — a source with twice the weight fires twice as
    * often, interleaved, never batched. The proportion guarantee is
    * the scheduler's: it holds over every prefix WHILE ALL SOURCES
    * REMAIN BACKLOGGED (row counts roughly ∝ weights); once a source
    * drains, the remainder interleaves whatever is left — size the
    * per-source row budgets to the weights (e.g. via [[weightedKeep]])
    * when end-to-end proportion matters. Contrast [[weightedKeep]]
    * (which SUBSAMPLES to a mixture) — this op keeps every row and
    * ORDERS the stream, so one pass over the merged order realizes the
    * mixture at any cut-off.
    *
    * All-integer (floor divisions of positive ints), so the schedule
    * is bit-identical cross-engine. Per-source rank is one window
    * partitioned by source; the global position is the distributed
    * zipWithIndex rank over (vt, source, id) — no one-partition sort.
    * Unlisted sources get `defaultW`. Adds `vt` and a dense 0-based
    * global `pos`. */
  def interleaveByWeight(df: DataFrame, id: Column, source: Column,
      weights: Map[String, Int], defaultW: Int = 1, epoch: Int = 1)
      : DataFrame = {
    require(defaultW > 0 && weights.values.forall(_ > 0),
      s"weights must be positive: $weights / $defaultW")
    val w = weights.foldLeft(lit(defaultW)) { case (acc, (src, wt)) =>
      when(source === src, wt).otherwise(acc)
    }
    val h = md5(concat(lit(s"$epoch:"), id.cast("string")))
    val r = row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(source).orderBy(h, id)).cast("long")
    val staged = df.withColumn("__w", w.cast("long"))
      .withColumn("__r", r)
      .withColumn("vt", expr("(__r * 1048576) div __w"))
      .drop("__w", "__r")
    Ids.denseGlobalRowNumber(staged, Seq(col("vt"), source, id), "pos")
  }

  /** Grouped k-fold assignment — cross-validation hygiene when rows
    * cluster under an entity (user, document, session): every row of a
    * group lands in the SAME fold, fold = content-hash of the group
    * key, so no group straddles a train/eval boundary and entity-level
    * leakage is structurally impossible (scikit-learn's GroupKFold
    * protocol, hash-assigned instead of size-balanced — the price of
    * determinism under appends). Same cross-engine md5 bucket as
    * [[hashSplit]]: map-only, stable across runs/engines/appends. Adds
    * a 0-based long `fold`. */
  def groupKFold(df: DataFrame, group: Column, k: Int): DataFrame = {
    require(k >= 2, s"need >= 2 folds: $k")
    df.withColumn("fold", hashBucket(group, k))
  }

  /** Curriculum ordering — arrange the corpus easiest-first for
    * curriculum training (Bengio et al. 2009): rows rank into `stages`
    * exact equi-count difficulty stages ([[Profiling.exactBucket]]'s
    * range-partitioned global rank — no one-partition NTILE), and
    * within a stage the order is the [[epochShuffle]] hash of
    * `epoch:id` (so each epoch re-shuffles within stages while the
    * stage ramp stays fixed). `pos` is the dense 0-based GLOBAL
    * curriculum position, from the distributed zipWithIndex rank over
    * (stage, hash, id) — two range exchanges and a count job, no global
    * sort through one partition. Adds `stage` (1-based) and `pos`. */
  def curriculumOrder(df: DataFrame, id: Column, difficulty: Column,
      stages: Int, epoch: Int): DataFrame = {
    require(stages >= 1, s"stages must be positive: $stages")
    val staged = Profiling.exactBucket(df, difficulty, Seq(id), stages,
      "stage")
    val h = md5(concat(lit(s"$epoch:"), id.cast("string")))
    Ids.denseGlobalRowNumber(staged.withColumn("__ch", h),
        Seq(col("stage"), col("__ch"), id), "pos")
      .drop("__ch")
  }

  def hashBucketSql(idExpr: String, buckets: Int = 100): String =
    s"(${hashU32Sql(idExpr)} % $buckets)"

  /** The raw 32-bit value (no modulo) of the first 8 md5 nibbles of
    * `h` — the ANSI twin of `conv(substring(md5(x),1,8),16,10)`;
    * expects the enclosing query to bind `h` to the md5 hex string.
    * [[Privacy.dpHistogram]]'s oracle turns this into the Laplace
    * uniform. */
  def hashU32Sql(idExpr: String): String = {
    def nibSql(i: Int): String =
      s"CAST(ascii(substring(h,$i,1)) - CASE WHEN ascii(substring(h,$i,1))" +
        s" >= 97 THEN 87 ELSE 48 END AS BIGINT)"
    val sum = (1 to 8)
      .map(i => s"${nibSql(i)} * ${1L << (4 * (8 - i))}")
      .mkString(" + ")
    s"($sum)"
  }
}
