package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with an evaluation/benchmark set (the standard contamination
  * control before LLM training; GPT-3 appendix C / PaLM-style n-gram
  * overlap, with k configurable — production uses k≈13, the tiny test
  * vocabulary uses a smaller k to stay discriminative).
  *
  * Scale shape: the eval set's distinct shingles are SMALL by construction
  * (benchmarks are thousands of docs, not billions) — they broadcast; the
  * training side streams map-only through explode -> broadcast-hash-join
  * -> partial-agg'd groupBy(doc). No all-pairs, no shuffle of the corpus
  * text itself; the only exchange is the per-doc overlap count (bounded by
  * contaminated docs, not corpus size).
  */
object Decontaminate {

  /** FUZZY decontamination: training docs whose full-document n-gram
    * JACCARD against some eval doc reaches `tau` — the near-duplicate
    * contamination the n-gram-hit forms above can't express (a train doc
    * sharing a handful of common grams is noise; a train doc that IS an
    * eval doc lightly paraphrased shares most of its shingle set). This
    * is the document-level fuzzy-dedup-against-benchmarks control
    * Llama-family pipelines run alongside exact n-gram overlap.
    *
    * Exact, not sketched: the CROSS-corpus inverted-index join (train
    * postings ⋈ eval postings on the shingle hash) materializes
    * candidates only for pairs sharing a shingle, with the same
    * exact-preserving length-ratio prune as [[Dedup.jaccardPairs]] —
    * the eval side is benchmark-sized, so the join is bounded by
    * contamination, never |train|². Returns the contaminated pairs
    * (train_id, eval_id, n_inter, n_train, n_eval, jaccard); compose
    * with an anti-join to drop them ([[cleanFuzzy]]). */
  def fuzzyPairs(train: DataFrame, eval: DataFrame, id: Column,
      text: Column, k: Int = 3, tau: Double = 0.5): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0,1]: $tau")
    def postings(df: DataFrame, idAs: String, nAs: String) =
      df.select(id.as(idAs),
          Dedup.fence(array_distinct(graft.functions.ShingleFunctions
            .word_shingle_hashes(text, k))).as("set"))
        .select(col(idAs), size(col("set")).as(nAs),
          explode(col("set")).as("sh"))
    val t = postings(train, "train_id", "n_train")
    val e = postings(eval, "eval_id", "n_eval")
    t.join(e, t("sh") === e("sh") &&
        least(col("n_train"), col("n_eval")) >=
          greatest(col("n_train"), col("n_eval")) * tau)
      .groupBy(col("train_id"), col("eval_id"), col("n_train"),
        col("n_eval"))
      .agg(count(lit(1)).as("n_inter"))
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("n_train") + col("n_eval") - col("n_inter")))
      .filter(col("jaccard") >= tau)
      .select(col("train_id"), col("eval_id"), col("n_inter"),
        col("n_train"), col("n_eval"), col("jaccard"))
  }

  /** The cleaned corpus: training rows minus [[fuzzyPairs]] hits. */
  def cleanFuzzy(train: DataFrame, eval: DataFrame, id: Column,
      text: Column, k: Int = 3, tau: Double = 0.5): DataFrame =
    train.join(
      fuzzyPairs(train, eval, id, text, k, tau)
        .select(col("train_id")).distinct(),
      id === col("train_id"), "left_anti")

  /** Distinct word-k-gram set of the eval corpus. */
  def evalShingles(eval: DataFrame, text: Column, k: Int): DataFrame =
    eval.select(explode(TextAnalysis.shingles(text, k)).as("shingle"))
      .distinct()

  /** (`__id`, shingle) pairs where a training doc's k-gram hits the
    * eval set: train explodes map-only and broadcast-hash-joins the
    * (small) eval shingle set — the shared core of both the report and
    * the cleaning form. Output is bounded by contamination, not corpus
    * size. */
  private def shingleHits(train: DataFrame, eval: DataFrame, id: Column,
      text: Column, k: Int): DataFrame =
    train
      .select(id.as("__id"), explode(TextAnalysis.shingles(text, k))
        .as("shingle"))
      .join(broadcast(evalShingles(eval, text, k)), "shingle")

  /** Per-training-doc contamination report: `n_overlap` = number of the
    * doc's DISTINCT k-grams also present in the eval set, plus the
    * resulting `contaminated` flag. Every training doc appears exactly
    * once (zero-overlap docs report 0 / false). */
  def overlapReport(train: DataFrame, eval: DataFrame, id: Column,
      text: Column, k: Int): DataFrame = {
    // distinct AFTER the join: (__id, shingle) dedup over just the hit
    // set (bounded by contamination) counts the same distinct k-grams
    // as deduping the full exploded train side first, for less shuffle
    val hits = shingleHits(train, eval, id, text, k)
      .select(col("__id"), col("shingle")).distinct()
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_overlap"))
    train.select(id.as("__id"))
      .join(hits, Seq("__id"), "left")
      .select(col("__id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") > 0)
  }

  /** Per-document n-gram NOVELTY against a reference corpus — the
    * graded form of [[overlapReport]] and the memorization-risk audit
    * (Lee et al. 2022 motivate it: training data already public in a
    * reference set teaches little and raises regurgitation risk):
    * novelty = 1 − |doc's distinct k-grams ∩ reference| / |doc's
    * distinct k-grams|. Low-novelty docs are near-copies of reference
    * material even when no single shingle pair crosses a dedup
    * threshold.
    *
    * One distinct pass over the train shingles feeds BOTH counts (the
    * denominator needs it anyway — unlike overlapReport, which can
    * defer dedup to the hit sliver); the reference side broadcasts as
    * a distinct shingle set. Docs with fewer than k tokens have no
    * shingles: novelty NULL. Output: (__id, n_shingles, n_known,
    * novelty). */
  def noveltyReport(train: DataFrame, ref: DataFrame, id: Column,
      text: Column, k: Int): DataFrame = {
    val sh = train.select(id.as("__id"),
        explode(TextAnalysis.shingles(text, k)).as("shingle"))
      .distinct()
    val tot = sh.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_shingles"))
    val known = sh.join(broadcast(evalShingles(ref, text, k)), "shingle")
      .groupBy(col("__id")).agg(count(lit(1)).as("n_known"))
    train.select(id.as("__id"))
      .join(tot, Seq("__id"), "left")
      .join(known, Seq("__id"), "left")
      .select(col("__id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_known"), lit(0L)).as("n_known"))
      .withColumn("novelty",
        when(col("n_shingles") > 0,
          lit(1.0d) - col("n_known").cast("double") /
            col("n_shingles").cast("double")))
  }

  /** Bloom-filter cleaning for eval sets too big to broadcast as a
    * shingle TABLE: the eval shingles aggregate into a fixed-size bloom
    * filter (~1.2 MB per 1M shingles at 1% fpp — size independent of
    * shingle width), and the train side probes it map-only. No false
    * negatives means every truly contaminated doc is dropped; false
    * positives over-drop ~fpp of clean docs — the SAFE direction for
    * decontamination (a benchmark leak costs more than a lost doc).
    * Exchange: only the contaminated-id sliver, never corpus text. */
  def cleanBloom(train: DataFrame, eval: DataFrame, id: Column,
      text: Column, k: Int, expectedShingles: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    val bytes = Bloom.buildBytes(evalShingles(eval, text, k),
      col("shingle"), expectedShingles, fpp)
    if (bytes == null) train // empty eval set: nothing to decontaminate
    else {
      val contaminatedIds = train
        .select(id.as("__id"), explode(TextAnalysis.shingles(text, k))
          .as("shingle"))
        .filter(graft.functions.BloomFunctions
          .bloom_might_contain(bytes, col("shingle")))
        .select(col("__id")).distinct()
      train.join(contaminatedIds.withColumnRenamed("__id", "___cid"),
        id === col("___cid"), "left_anti")
    }
  }

  /** [[cleanBloom]] with the REPLAYABLE md5 double-hash bloom
    * ([[graft.functions.Md5BloomUtil]]) instead of spark-sketch's
    * xxhash/murmur filter: the bitmap, every probe, and therefore the
    * exact kept set (INCLUDING any false-positive over-drops) are
    * reproducible from md5 hex arithmetic alone, which makes this gate
    * fully oracle-checkable in ANSI SQL. Same plan shape: benchmark-side
    * bitmap build, map-only broadcast probe of the corpus, LEFT ANTI on
    * the contaminated ids. */
  def cleanBloomReplayable(train: DataFrame, eval: DataFrame, id: Column,
      text: Column, k: Int, mBits: Int = 1 << 20, kHashes: Int = 7)
      : DataFrame = {
    val bitmap = Bloom.buildMd5Bitmap(evalShingles(eval, text, k),
      col("shingle"), mBits, kHashes)
    if (bitmap == null) train
    else {
      val contaminatedIds = train
        .select(id.as("__id"), explode(TextAnalysis.shingles(text, k))
          .as("shingle"))
        .filter(graft.functions.BloomFunctions
          .md5_bloom_contains(bitmap, col("shingle"), kHashes))
        .select(col("__id")).distinct()
      train.join(contaminatedIds.withColumnRenamed("__id", "___cid"),
        id === col("___cid"), "left_anti")
    }
  }

  /** The cleaning form: training docs with NO k-gram overlap with the
    * eval set — a broadcast LEFT ANTI join against the contaminated-id
    * set, keeping the full training schema. */
  def clean(train: DataFrame, eval: DataFrame, id: Column, text: Column,
      k: Int): DataFrame = {
    val contaminatedIds = shingleHits(train, eval, id, text, k)
      .select(col("__id")).distinct()
    train.join(contaminatedIds.withColumnRenamed("__id", "___cid"),
      id === col("___cid"), "left_anti")
  }

  /** SEMANTIC decontamination: drop training rows whose `embedding`
    * has cosine >= `tau` to ANY eval-set embedding — the contamination
    * tier lexical overlap cannot see (a benchmark item rewritten in
    * different words shares no shingles but lands next to it in
    * embedding space). Third rung of the ladder: exact n-grams
    * ([[clean]]) -> fuzzy Jaccard ([[cleanFuzzy]]) -> embeddings.
    *
    * Scoring is the quantized-exact cosine (Similarity.quantize:
    * int64 dots, double only at the final division) so the judgment is
    * cross-engine deterministic; zero-norm embeddings score NaN, never
    * >= tau, and are kept — the Similarity-family convention.
    *
    * Scale shape: the eval side is benchmark-sized by construction and
    * BROADCASTS; the corpus streams through one map-only LEFT ANTI
    * broadcast-nested-loop pass (each row scores |eval| dots and is
    * emitted or not) — no shuffle of the corpus, no candidate
    * materialization, nothing driver-side. At |eval| in the thousands
    * this is the same per-row cost class as the n-gram probes. */
  def semantic(train: DataFrame, evalSet: DataFrame, tau: Double)
      : DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0,1]: $tau")
    val ev = evalSet
      .select(Similarity.quantize(col("embedding")).as("__ev"))
      .withColumn("__en",
        sqrt(graft.functions.VectorFunctions
          .vec_dot_long(col("__ev"), col("__ev")).cast("double")))
    train
      .withColumn("__qv", Similarity.quantize(col("embedding")))
      .withColumn("__cn",
        sqrt(graft.functions.VectorFunctions
          .vec_dot_long(col("__qv"), col("__qv")).cast("double")))
      .join(broadcast(ev),
        graft.functions.VectorFunctions
          .vec_dot_long(col("__qv"), col("__ev")).cast("double") /
          (col("__cn") * col("__en")) >= tau,
        "left_anti")
      .drop("__qv", "__cn")
  }
}
