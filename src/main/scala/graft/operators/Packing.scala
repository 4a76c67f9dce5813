package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the LLM-training data op that concatenates
  * documents into fixed-capacity token sequences (docs flow contiguously;
  * a document crossing a capacity boundary starts its sequence at the
  * boundary it begins in, the classic pack-then-chunk layout).
  *
  * Scale shape: a GLOBAL packing order would be a single-partition
  * window; instead documents are sharded by the deterministic
  * [[Sampling.hashBucket]] and packed within shards (the standard
  * practice — shards are the training data-parallel unit anyway), so the
  * window partitions by shard and parallelism is shard-wide. All
  * arithmetic is integral (token counts, cumulative sums, div/mod), so
  * the layout is bit-identical across engines and fully oracle-checkable.
  */
object Packing {

  /** Assign each document a (shard, seq_id, tok_offset): documents pack
    * in doc-id order within their hash shard; `seq_id` is the capacity
    * bin its span STARTS in, `tok_offset` the position within that bin.
    * `nTokens` must be an integral token-count column. `within` adds
    * outer packing units (e.g. the train/val split column) so each unit
    * packs independently. */
  def packSequences(df: DataFrame, id: Column, nTokens: Column,
      capTokens: Int, shards: Int = 64,
      within: Seq[Column] = Seq.empty): DataFrame = {
    require(capTokens > 0 && shards > 0)
    val w = Window.partitionBy(within :+ col("shard"): _*).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", Sampling.hashBucket(id, shards))
      .withColumn("n_tok", nTokens.cast("long"))
      .withColumn("start", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("seq_id", expr(s"start div ${capTokens.toLong}"))
      .withColumn("tok_offset", col("start") % capTokens.toLong)
      .drop("start")
  }

  /** Length-quantile bucketing — group rows into `nBuckets` equal-count
    * buckets by a length column (the batch-shaping step that keeps padded
    * batches dense: similar-length sequences train together). Semantically
    * `ntile(nBuckets) OVER (ORDER BY len, tiebreak)` — but a global NTILE
    * window collapses to ONE partition, the 100 TB cliff, so the bucket
    * comes from [[Ids.denseGlobalRowNumber]] (range-repartition + two-job
    * zip) and the closed-form `bucket = rn * nBuckets div N`. Equal-count
    * up to one row, deterministic under the (len, tiebreak) total order,
    * exactly reproducible in ANSI SQL (the oracle uses the same formula).
    *
    * Costs one extra count() action for N — O(1) driver state. */
  def lengthBuckets(df: DataFrame, len: Column, tiebreak: Column,
      nBuckets: Int): DataFrame = {
    require(nBuckets > 0)
    val n = df.count()
    require(n > 0, "lengthBuckets on an empty input")
    Ids.denseGlobalRowNumber(df, Seq(len, tiebreak), "__rn")
      .withColumn("bucket",
        expr(s"CAST(__rn * $nBuckets div ${n}L AS INT)"))
      .drop("__rn")
  }

  /** Fixed-token-window document chunking with overlap — the RAG/context
    * chunking step (and packing's dual: one long doc fans OUT to many
    * windows). Chunk j covers tokens [1 + j*stride, 1 + j*stride +
    * chunkTokens); starts are emitted while they land inside the doc, so
    * the tail chunk may be short and `stride < chunkTokens` gives the
    * usual overlap. Null-text docs produce no chunks.
    *
    * Returns (all input columns, chunk_id, start_token, n_chunk_tokens,
    * chunk_text). Scale shape: a pure MAP-SIDE fan-out — sequence +
    * posexplode + slice on the materialized token array, no shuffle, no
    * per-doc state; the token array materializes once per row (slicing
    * the raw split() would re-split per chunk, the interpreted-HOF trap
    * documented at dropBoilerplateSpans). */
  def chunkByTokens(df: DataFrame, text: Column,
      chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens > 0 && strideTokens > 0,
      s"need chunkTokens > 0 and strideTokens > 0: $chunkTokens / $strideTokens")
    // the output appends fixed columns via select(col("*"), ...): a clash
    // with an input column would yield ambiguous duplicates downstream
    val reserved =
      Seq("chunk_id", "start_token", "n_chunk_tokens", "chunk_text", "__ws")
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"chunkByTokens reserves output columns ${reserved.mkString(", ")}; " +
        s"input already has: ${clash.mkString(", ")}")
    val withWs = df.filter(text.isNotNull)
      .withColumn("__ws", TextAnalysis.tokens(text))
    val ws = col("__ws")
    val starts = sequence(lit(1), size(ws), lit(strideTokens))
    withWs
      .select(col("*"), posexplode(starts).as(Seq("chunk_id", "start_token")))
      .select(col("*"),
        least(lit(chunkTokens), size(ws) - col("start_token") + 1)
          .as("n_chunk_tokens"),
        concat_ws(" ", slice(ws, col("start_token"), lit(chunkTokens)))
          .as("chunk_text"))
      .drop("__ws")
  }

  /** Inverse of [[chunkByTokens]] for NON-overlapping chunks (stride ==
    * chunk size): reassemble each document from its chunks in chunk_id
    * order. One shuffle on the document key; the per-group collect is
    * bounded by the document's own chunk count (a document's size, not
    * the corpus's), the same bound chunking itself assumes. With
    * overlapping chunks reassembly is lossy by construction — callers
    * wanting roundtrips use stride == chunkTokens. */
  def mergeChunks(chunks: DataFrame, idCol: String): DataFrame =
    chunks.groupBy(col(idCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
          x => x.getField("chunk_text")),
        " ").as("text"))

  /** Skip-gram (target, context) pair generation from ordered event/
    * token sequences — the training-data op behind word2vec/item2vec
    * embeddings (Mikolov et al. 2013): within each `key`'s sequence
    * (ordered by `order`, ties to `item`), every pair at positional
    * distance 1..`window` is emitted in BOTH directions with its
    * distance.
    *
    * Scale shape: positions come from a per-key rank window, then ONE
    * equi-join on (key, pos + offset) after a 1..window offset explode
    * — |rows|·window join rows, never a per-key cross product; both
    * directions come from the same joined row. Output:
    * (key named `keyName`, target, context, distance). */
  def skipGramPairs(df: DataFrame, key: Column, order: Column,
      item: Column, window: Int, keyName: String = "key"): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    val ranked = df.select(key.as(keyName), order.as("__o"),
        item.as("__it"))
      .where(col(keyName).isNotNull && col("__o").isNotNull &&
        col("__it").isNotNull)
      .withColumn("__pos", row_number().over(Window
        .partitionBy(col(keyName)).orderBy(col("__o"), col("__it"))))
      .select(col(keyName), col("__pos"), col("__it"))
    val lhs = ranked
      .withColumn("__off",
        explode(sequence(lit(1), lit(window))))
      .select(col(keyName), (col("__pos") + col("__off")).as("__pos2"),
        col("__it").as("__a"), col("__off"))
    val joined = lhs.join(
      ranked.select(col(keyName), col("__pos").as("__pos2"),
        col("__it").as("__b")),
      Seq(keyName, "__pos2"))
    joined.select(col(keyName), col("__a").as("target"),
        col("__b").as("context"), col("__off").as("distance"))
      .unionByName(joined.select(col(keyName),
        col("__b").as("target"), col("__a").as("context"),
        col("__off").as("distance")))
  }

  /** Sentence-boundary-aware chunking — the RAG/embedding prep that
    * [[chunkByTokens]]'s fixed token windows cannot give: sentences
    * NEVER split across chunks. Greedy offset rule: a sentence joins
    * chunk `floor(tokens-before-it / budgetTokens)` — chunks fill to
    * the budget and the sentence straddling a boundary belongs to the
    * chunk its FIRST token falls in (so a chunk may overrun by at most
    * one sentence; a sentence longer than the budget still lands
    * whole). Deterministic, replayable, append-stable per doc.
    *
    * Returns one row per (idCol, chunk_id): n_sents, n_chunk_tokens,
    * chunk_text (sentences joined in order). Scale shape: sentence
    * explode (map-only) -> one doc-keyed running-sum window -> one
    * (doc, chunk) reassembly groupBy. */
  def chunkBySentences(df: DataFrame, idCol: String, text: Column,
      budgetTokens: Int): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens must be >= 1: $budgetTokens")
    val sents = TextAnalysis.sentences(df, idCol, text)
      .withColumn("__nt", size(split(col("sentence"), " ")).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("sent_idx"))
    sents
      .withColumn("__before", sum(col("__nt")).over(w) - col("__nt"))
      .withColumn("chunk_id",
        expr(s"__before div ${budgetTokens.toLong}").cast("int"))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(count(lit(1)).as("n_sents"),
        sum(col("__nt")).as("n_chunk_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("sent_idx"),
            col("sentence")))),
          x => x.getField("sentence")), " ").as("chunk_text"))
  }

  /** T5-style span-corruption pairs (Raffel et al. 2020 §3.1.4, the
    * denoising pretraining objective): contiguous `spanTokens`-token
    * blocks are masked with probability `maskPct`%, the input keeps a
    * `<extra_id_K>` sentinel per masked block (K = per-doc masked
    * ordinal, left to right) and the target lists each sentinel
    * followed by the tokens it hides. The mask draw is the repo's
    * md5-bucket protocol on (doc, block) — deterministic across
    * runs/engines/partitionings, so the generated pairs are
    * oracle-exact, replayable, and stable under corpus appends (a new
    * doc never reshuffles another doc's masks).
    *
    * Returns (idCol, n_tokens, n_masked, input_text, target_text);
    * docs whose every block survives get target_text ''. Scale shape:
    * token posexplode -> (doc, block) agg -> per-doc ordinal window
    * (keyed on the doc id, never global) -> one groupBy(doc)
    * reassembly. Map-only except the two doc-keyed shuffles. */
  def spanCorruptionPairs(df: DataFrame, idCol: String, text: Column,
      spanTokens: Int = 3, maskPct: Int = 15): DataFrame = {
    require(spanTokens >= 1, s"spanTokens must be >= 1: $spanTokens")
    require(maskPct >= 0 && maskPct <= 100, s"bad maskPct: $maskPct")
    val toks = df.select(col(idCol),
      posexplode(TextAnalysis.tokens(text)).as(Seq("__i", "__tok")))
    val blocks = toks
      .withColumn("__blk", expr(s"__i div $spanTokens"))
      .groupBy(col(idCol), col("__blk"))
      .agg(count(lit(1)).as("__bn"),
        array_join(transform(
          array_sort(collect_list(struct(col("__i"), col("__tok")))),
          x => x.getField("__tok")), " ").as("__btxt"))
      .withColumn("__masked", Sampling.hashBucket(
        concat(col(idCol).cast("string"), lit(":"),
          col("__blk").cast("string")), 100) < maskPct)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__blk"))
    val flag = when(col("__masked"), 1L).otherwise(0L)
    val numbered = blocks
      .withColumn("__k", sum(flag).over(w) - flag)
      .withColumn("__sent",
        concat(lit("<extra_id_"), col("__k").cast("string"), lit(">")))
    numbered.groupBy(col(idCol))
      .agg(sum(col("__bn")).as("n_tokens"),
        sum(when(col("__masked"), col("__bn")).otherwise(0L))
          .as("n_masked"),
        array_join(transform(
          array_sort(collect_list(struct(col("__blk"),
            when(col("__masked"), col("__sent")).otherwise(col("__btxt"))
              .as("__piece")))),
          x => x.getField("__piece")), " ").as("input_text"),
        array_join(transform(
          array_sort(collect_list(when(col("__masked"),
            struct(col("__blk"),
              concat(col("__sent"), lit(" "), col("__btxt"))
                .as("__tp"))))),
          x => x.getField("__tp")), " ").as("target_text"))
  }

  /** Serpentine balanced sharding — equal-WORK data shards for a fixed
    * shard count (training wants every worker's shard to cost the
    * same, not to hold the same row count): rows rank globally by
    * (weight desc, tiebreak), then round r = rank div S walks the
    * shards boustrophedon (0..S−1, then S−1..0, ...), so each shard
    * takes exactly one row per round and alternating direction cancels
    * the within-round descent across consecutive round PAIRS: max−min
    * load over the whole assignment is bounded by the single largest
    * weight (the sorted-round-robin guarantee, tight when one head row
    * dominates; with a flat tail the spread collapses to the tail
    * scale — same approximation family as LPT but embarrassingly
    * parallel and, unlike LPT's least-loaded-heap, fully deterministic
    * and oracle-replayable).
    *
    * Contrast [[packSequences]]: that packs into CAPACITY-bounded
    * sequences (count varies, cap fixed); this balances a FIXED shard
    * count (load varies minimally). Scale shape: one range exchange +
    * count job ([[Ids.denseGlobalRowNumber]]), then a map-only shard
    * formula — no window over the corpus, no driver state. Adds
    * `shard`; `weight` must be non-negative. */
  def balancedShards(df: DataFrame, id: Column, weight: Column,
      shards: Int): DataFrame = {
    require(shards >= 1, s"shards must be >= 1: $shards")
    require(!df.columns.contains("__bw") && !df.columns.contains("__gr"),
      "reserved temp columns __bw/__gr present in the input")
    val ranked = graft.operators.Ids.denseGlobalRowNumber(
      df.withColumn("__bw", weight.cast("long")),
      Seq(col("__bw").desc, id), "__gr")
    ranked.withColumn("shard", expr(
      s"""CAST(CASE WHEN (__gr div $shards) % 2 = 0
         |  THEN __gr % $shards
         |  ELSE ${shards - 1} - (__gr % $shards) END AS INT)"""
        .stripMargin))
      .drop("__bw", "__gr")
  }
}
