package graft.queries

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search query surface over the `embeddings` table.
  *
  * `ann_cosine_exact` is the oracle-checked variant: cosine accumulated in
  * decimal(38,18) so the result is bit-identical in Spark and DuckDB
  * independent of summation order. (float -> decimal(12,9) casts are
  * tie-free: a binary float can only tie at scale 9 if its exponent is
  * >= -10, impossible for 24-bit-mantissa unit-scale embeddings — so
  * HALF_UP-vs-HALF_EVEN rounding differences never fire.)
  *
  * `ann_cosine_topk` (wider-k bounded-heap ranking, disjoint query
  * slice) shares the quantized-exact scoring, so both brute-force tiers
  * are fully oracle-checked; `ann_lsh_topk` (SRP-bucketed) and the
  * IVF/PQ family are the approximate scale paths — engine-specific
  * float ordering / hashing, so rows-only driver checks plus recall
  * specs in SimilaritySpec (the double fast path stays reachable via
  * `bruteForceTopK(exact = false)` and is spec-pinned there too).
  */
object AnnOps {
  type Q = (SparkSession, String) => DataFrame

  val NQueries = 20
  val TopK = 5
  val TopKWide = 10
  val Dim = 64
  val SubVecs = 4
  val JlDim = 16
  val PcaIters = 100
  val PcaK = 4       // components of the integer orthogonal iteration
  val PcaKIters = 30 // fixed rounds — the replayability contract
  val KmCells = 8
  val KmIters = 6
  val PqM = 4
  val PqCodes = 8
  val PqIters = 4
  val PqCandMult = 4
  // fixtures carry no planted near-dups (max pairwise cosine ~0.5-0.6);
  // 0.4 yields a non-empty, engine-checkable pair set at every SF
  val NearDupTau = 0.4

  val defs: Map[String, Q] = Map(
    "ann_cosine_exact" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(
          emb.filter(col("vec_id") < NQueries), emb, TopK, exact = true)
        .orderBy(col("query_id"), col("rank"))
    }),

    // SMOTE-style minority oversampling: each minority vector pairs
    // with its k same-class exact-cosine neighbors and emits the
    // floor-midpoint on the quantized grid — synthetic class balancing
    // whose vectors are bit-identical cross-engine; the gate hashes the
    // element-sum and exact self-dot digests of every synthetic vector
    "ann_smote_oversample" -> ((s, d) => {
      Similarity.smoteMidpoints(Tables.embeddings(s, d), TopK)
        .orderBy(col("vec_id"), col("rank"))
    }),

    // k-NN majority-vote classification: predicted label = mode of the
    // k exact-cosine nearest labels (ties: most votes, then smallest
    // label) — the embedding-quality / pseudo-labeling audit; fully
    // oracle-checked because ranking and voting are integer-exact.
    "ann_knn_classify" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.knnClassify(
          emb.filter(col("vec_id") < NQueries), emb, TopK)
        .orderBy(col("query_id"))
    }),

    // the brute-force top-k tier, rebased on quantized int64 cosine so
    // the native bounded-heap ranking is FULLY oracle-checked (round-7
    // conversion; the double fast path stays available via
    // bruteForceTopK(exact = false) and is recall-spec'd): distinct gate
    // surface from ann_cosine_exact — wider k, disjoint query slice
    "ann_cosine_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(
          emb.filter(col("vec_id") >= NQueries &&
            col("vec_id") < 3 * NQueries), emb, TopKWide, exact = true)
        .orderBy(col("query_id"), col("rank"))
    }),

    // filtered ANN: metadata predicate + vector top-k composed as
    // PRE-filter — `label` is a stored column, so the predicate reaches
    // the parquet scan (PushedFilters) and the scored set shrinks before
    // any vector math runs; a post-filter would pay the full dot-product
    // cost for rows it then throws away (and return < k survivors).
    // Same exact-decimal scoring as ann_cosine_exact -> fully
    // oracle-checked
    "ann_filtered_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(
          emb.filter(col("vec_id") < NQueries),
          emb.filter(col("label") === 1), TopK, exact = true)
        .orderBy(col("query_id"), col("rank"))
    }),

    // hard-negative mining: per query, nearest neighbors with a
    // DIFFERENT label (contrastive-training negatives) — exact quantized
    // scoring, fully oracle-checked; the label inequality is a per-pair
    // join predicate, not a pre-filter
    "ann_hard_negatives" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.hardNegativesTopK(
          emb.filter(col("vec_id") < NQueries), emb, TopK)
        .orderBy(col("query_id"), col("rank"))
    }),

    // ColBERT-style late interaction: the 64-dim embedding read as 4
    // token vectors of 16 dims; score = sum over query tokens of the
    // best doc-token int64 dot. All-integer -> bit-exact cross-engine,
    // FULL oracle (the multi-vector retrieval model, not another
    // single-vector ANN tier)
    "ann_maxsim_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.maxSimTopK(emb.filter(col("vec_id") < NQueries), emb,
          TopK, subVecs = SubVecs)
        .orderBy(col("query_id"), col("rank"))
    }),

    // exact MIPS gate: top-k by INNER PRODUCT (not cosine) — int64 dots
    // of 1e4-quantized vectors, bit-exact cross-engine
    "ann_mips_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.mipsTopK(emb.filter(col("vec_id") < NQueries), emb, TopK)
        .orderBy(col("query_id"), col("rank"))
    }),

    // SRP-bucketed ANN on the REPLAYABLE integer planes (round-7
    // conversion): deterministic ±1 Rademacher projections over the
    // quantized vectors mean a SQL oracle regenerates the candidate
    // buckets AND the exact re-rank — the approximate tier itself is
    // FULLY oracle-checked (the gaussian-plane fast path stays as
    // Similarity.lshTopK, recall-spec'd in SimilaritySpec)
    "ann_lsh_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopKInt(emb.filter(col("vec_id") < NQueries), emb,
          TopK, Dim)
        .orderBy(col("query_id"), col("rank"))
    }),

    // OPQ rebased on the EXACT-INTEGER pipeline (round-8 conversion):
    // per-dim integer energies pick the rotation (high/low-variance dim
    // pairs, one 45-degree Givens each — integer sums/differences),
    // pairs snake-draft into energy-balanced subspaces, then the
    // oracle-checked integer PQ tier. Energies, pairing, rotation,
    // allocation, codebooks, ADC and ranking ALL replay in SQL — the
    // last ANN-family gate goes fully oracle-checked. The float
    // eigenbasis opqTopK stays the paper-faithful spec'd sibling.
    "ann_opq_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.opqIntTopK(emb.filter(col("vec_id") < NQueries), emb,
          TopK, Dim, m = PqM, kCodes = PqCodes, iters = PqIters,
          candMult = PqCandMult)
        .orderBy(col("query_id"), col("rank"))
    }),

    // norm-augmented SRP buckets serving MIPS, on the REPLAYABLE integer
    // pipeline (round-7 conversion): the augmentation itself is integer
    // (exact int64 self-dots, corpus-max M², one correctly-rounded sqrt
    // of an exact integer), buckets are the deterministic ±1 planes, the
    // re-rank is the exact int64 inner product — the oracle regenerates
    // ALL of it. The float-augmented gaussian path stays as
    // Similarity.mipsLshTopK with its recall spec.
    "ann_mips_lsh_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.mipsLshTopKInt(emb.filter(col("vec_id") < NQueries), emb,
          TopK, Dim)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF coarse-quantizer ANN (per-label centroid codebook, nprobe
    // cells) — rebased on INTEGER label centroids (truncating per-dim
    // means, DuckDB `//` parity) with 1e8-grid exact cosine rescore:
    // fully oracle-checked. The float ivfTopK tier stays spec'd.
    "ann_ivf_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfLabelIntTopK(emb.filter(col("vec_id") < NQueries),
          emb, TopK, Dim)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF over a REAL distributed k-means codebook — rebased on the
    // INTEGER Lloyd's tier (Similarity.kMeansIntCodebook: exact
    // arithmetic, deterministic ties, truncating-division centroid
    // updates that match DuckDB's `//`), so codebook, cells, probe
    // sets, 1e8-grid cosine scores and ranking ALL replay in SQL —
    // the k-means ANN family's first fully oracle-checked gate. The
    // float kMeansCodebook/ivfTopK tier stays spec'd in SimilaritySpec.
    "ann_ivf_kmeans_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfIntTopK(emb.filter(col("vec_id") < NQueries), emb,
          TopK, Dim, kCells = KmCells, iters = KmIters, nprobe = 3)
        .orderBy(col("query_id"), col("rank"))
    }),

    // the integer Lloyd's loop itself, gate-checked end to end:
    // (vec_id, winning cell, exact squared L2 to its centroid) after
    // KmIters fixed rounds — the oracle unrolls the same rounds
    "embed_kmeans_int" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = Similarity.kMeansIntCodebook(emb, KmCells, KmIters, Dim)
      Similarity.kMeansIntAssign(emb, cents)
        .orderBy(col("vec_id"))
    }),

    // product-quantization ANN (Jégou et al. 2011): per-subspace
    // codebooks, m-code compression, ADC table scan, exact re-rank —
    // rebased on the INTEGER Lloyd's subspace codebooks so codebooks,
    // codes, ADC scores, the candidate cut and the final ranking all
    // replay in SQL: fully oracle-checked. The float pqTopK tier stays
    // spec'd in SimilaritySpec.
    "ann_pq_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqIntTopK(emb.filter(col("vec_id") < NQueries), emb,
          TopK, Dim, m = PqM, kCodes = PqCodes, iters = PqIters,
          candMult = PqCandMult)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF-PQ composite (FAISS IVFADC shape): the coarse quantizer cuts
    // each query's ADC scan to nprobe cells — the PQ scale path when the
    // corpus outgrows a per-query linear scan. Rows-only + recall spec
    // rebased on the integer coarse + subspace codebooks: the composed
    // IVFADC pipeline — cells, codes, ADC cut, exact re-rank — replays
    // end to end in SQL. The float ivfPqTopK tier stays spec'd.
    "ann_ivfpq_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfPqIntTopK(emb.filter(col("vec_id") < NQueries), emb,
          TopK, Dim, kCells = KmCells, coarseIters = KmIters, m = PqM,
          kCodes = PqCodes, pqIters = PqIters, nprobe = 3,
          candMult = PqCandMult)
        .orderBy(col("query_id"), col("rank"))
    }),

    // embedding-cosine near-duplicate pairs, quantized exact all-pairs —
    // the ORACLE GATE for embedding dedup (size-guarded; see the operator
    // scaladoc). The operator the engine ships at scale is the LSH form
    // below, whose recall this gate measures in SimilaritySpec.
    // PCA-filtered ANN rebased on the INTEGER orthogonal iteration
    // (round-8 conversion): top-PcaK components from fixed-round
    // Gram-Schmidt'd power iteration in exact Long arithmetic,
    // projected-cosine prefilter, exact full-dim re-rank — components,
    // projections, prefilter and rescore ALL replay in SQL. The float
    // eigenbasis pcaTopK stays the spec'd sibling.
    "ann_pca_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pcaIntTopK(emb.filter(col("vec_id") < NQueries), emb,
          TopK, Dim, nComp = PcaK, iters = PcaKIters)
        .orderBy(col("query_id"), col("rank"))
    }),

    // top-PcaK integer-PCA projections per vector, exact int64 dots —
    // FULLY oracle-checked (round-8 conversion; the float Jacobi
    // pcaProject stays spec'd: planted-direction recovery,
    // orthonormality, variance capture in SimilaritySpec).
    "embed_pca_project" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pcaIntProject(emb, Dim, nComp = PcaK,
          iters = PcaKIters)
        .orderBy(col("vec_id"))
    }),

    "dedup_embedding_cosine" -> ((s, d) => {
      Similarity.nearDupPairs(Tables.embeddings(s, d), tau = NearDupTau)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // semantic decontamination: corpus rows too close in embedding
    // space to ANY "benchmark" vector (vec_id < NQueries stands in for
    // the eval set) are dropped — the paraphrase-contamination tier
    // lexical n-gram overlap misses. One map-only broadcast anti pass,
    // quantized-exact cosine -> fully oracle-checked
    "decontaminate_semantic" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      graft.operators.Decontaminate.semantic(
          emb.filter(col("vec_id") >= NQueries),
          emb.filter(col("vec_id") < NQueries), tau = NearDupTau)
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id"))
    }),

    // THE embedding-dedup operator: SRP-bucketed candidate pairs + exact
    // quantized re-check, on the replayable integer planes (round-7
    // conversion) — the oracle regenerates the buckets, the candidate
    // join, and the verification, so the LSH dedup tier is FULLY
    // oracle-checked; recall vs the exact all-pairs gate stays spec'd in
    // SimilaritySpec for both plane families.
    "dedup_embedding_lsh" -> ((s, d) => {
      Similarity.nearDupPairsLshInt(Tables.embeddings(s, d),
          tau = NearDupTau, dim = Dim)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // SemDeDup (Abbas et al. 2023) rebased on the replayable integer-SRP
    // cells: cluster = table-0 SRP bucket, intra-cell prune by the
    // quantized-exact cosine — FULLY oracle-checked (DuckDB regenerates
    // the cells and the keep rule). The k-means tier remains
    // Similarity.semanticDedup with planted-duplicate specs in
    // SimilaritySpec.
    "dedup_semantic" -> ((s, d) => {
      Similarity.semanticDedupLshInt(Tables.embeddings(s, d),
          tau = NearDupTau, dim = Dim)
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id"))
    }),

    // Johnson–Lindenstrauss ±1 projection (Achlioptas 2003) as ANN
    // prefilter + exact full-dim rescore: 64 -> 16 dims (4x cheaper
    // dots), deterministic integer planes — FULLY oracle-checked
    // (DuckDB regenerates the projection, both cosines, and the
    // ranking); JL recall vs the exact ranking spec'd in SimilaritySpec
    "ann_jl_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.jlTopK(emb.filter(col("vec_id") < NQueries), emb,
          TopK, Dim, outDim = JlDim)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Matryoshka truncation audit (Kusupati et al. 2022): per query,
    // overlap between the full-64-dim exact top-k and the
    // first-16-dims top-k — the serve-truncated-embeddings decision
    // metric, exact integers both sides
    "embed_matryoshka_eval" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.matryoshkaOverlap(emb.filter(col("vec_id") < NQueries),
          emb, TopKWide, prefixDim = JlDim)
        .orderBy(col("query_id"))
    }),

    // exact-integer power-iteration PCA: distributed Gramian, 100
    // driver matvecs in pure Long arithmetic with deterministic shift
    // normalization, map-only projection — the FULLY oracle-checked
    // principal-direction tier (float embed_pca_project stays
    // model-specific); eigen alignment spec'd in SimilaritySpec
    "embed_pca_power" -> ((s, d) => {
      Similarity.powerIterationPc1(Tables.embeddings(s, d), Dim,
          iters = PcaIters)
        .orderBy(col("vec_id"))
    }),

    // the projection op itself: per-vector digest of the 16 projected
    // integer coordinates (the embed_quantize gate shape) — the
    // replayable dimensionality-reduction tier next to float PCA
    "embed_jl_project" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(col("vec_id"), Similarity.jlProjectInt(
          Similarity.quantizeAt(col("embedding"), 1e4), Dim, JlDim).as("pv"))
        .select(col("vec_id"), size(col("pv")).as("n_dims"),
          aggregate(col("pv"), lit(0L), (a, x) => a + x).as("sum_p"),
          array_min(col("pv")).as("min_p"),
          array_max(col("pv")).as("max_p"),
          graft.functions.VectorFunctions.vec_dot_long(col("pv"), col("pv"))
            .as("ssq_p"))
        .orderBy(col("vec_id"))
    }),

    // bitext-style alignment: label-0 vectors as the source space,
    // label-1 as the target — mutual nearest neighbors with both
    // directions' best-vs-second margins, exact scoring throughout
    "ann_bitext_mutual" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.mutualNearestPairs(
          emb.filter(col("label") === 0), emb.filter(col("label") === 1))
        .orderBy(col("src_id"))
    }),

    // active-learning margin mining: the 50 embeddings whose two
    // closest label centroids score nearest each other — exact quantized
    // cosines, bounded-heap top-2 per vector, TakeOrdered smallest-k
    "ann_margin_mining" -> ((s, d) => {
      Similarity.marginMining(Tables.embeddings(s, d), k = 50)
    }),

    // label-conditioned centroid similarity: every embedding joined to its
    // label's centroid with an exact cross-engine quantized cosine —
    // exercises array aggregation + broadcast rejoin + integer dot
    "ann_label_centroid" -> ((s, d) => {
      Similarity.labelCentroidCosine(Tables.embeddings(s, d))
        .orderBy(col("vec_id"))
    }),

    // greedy k-center coreset (diversity selection): exact int64
    // quantized distances make the whole iterative selection
    // bit-deterministic, so the oracle replays all k greedy stages as
    // unrolled DuckDB CTEs — a FULL oracle over an iterative algorithm,
    // not a rows-only check
    "ann_kcenter_coreset" -> ((s, d) => {
      // null/empty embeddings are excluded to MATCH the oracle's q CTE
      // (the operator itself returns them with null center columns;
      // the fixture has none today, but the gate must not depend on it)
      graft.operators.Coreset
        .kCenter(Tables.embeddings(s, d)
            .filter(col("embedding").isNotNull && size(col("embedding")) > 0),
          "vec_id", col("embedding"), k = KCenterK)
        .select(col("vec_id"), col("center_id"), col("center_rank"),
          col("d2_to_center"))
        .orderBy(col("vec_id"))
    })
  )

  val KCenterK = 6

  // quantized-integer cosine (see Similarity.cosineExactDecimal scaladoc);
  // int sums go to double via VARCHAR: DuckDB's HUGEINT->DOUBLE cast
  // double-rounds, its string parse is correctly rounded like the JVM's l2d
  private def qel(v: String): String =
    s"CAST(ROUND(CAST($v AS DOUBLE) * 100000000) AS BIGINT)"
  private def duckCosExact(a: String, b: String): String =
    s"""CAST(CAST(list_sum(list_transform(range(1, ${Dim + 1}),
       |      i -> ${qel(s"$a.embedding[i]")} * ${qel(s"$b.embedding[i]")})) AS STRING) AS DOUBLE)
       |  / (SQRT(CAST(CAST(list_sum(list_transform(range(1, ${Dim + 1}),
       |      i -> ${qel(s"$a.embedding[i]")} * ${qel(s"$a.embedding[i]")})) AS STRING) AS DOUBLE))
       |   * SQRT(CAST(CAST(list_sum(list_transform(range(1, ${Dim + 1}),
       |      i -> ${qel(s"$b.embedding[i]")} * ${qel(s"$b.embedding[i]")})) AS STRING) AS DOUBLE)))""".stripMargin

  // ---- replayable integer-SRP machinery (ann_lsh_topk /
  // dedup_embedding_lsh oracles regenerate the engine's buckets) ------
  private val SrpBits = 8
  private val SrpTables = 4

  /** The ±1 weights of one plane as a SQL list literal — srpWeight's
    * md5-parity constants inlined verbatim (weights are plan-time
    * constants on both sides; no hash arithmetic in the SQL). */
  private def planeLit(t: Int, b: Int, bits: Int, pdim: Int): String =
    (0 until pdim).map(i =>
      graft.operators.Similarity.srpWeight(t, b, i, bits, pdim))
      .mkString("[", ",", "]")

  /** Bucket id of hash table `t` over a quantized-list column — the SQL
    * twin of Similarity.srpBucketsInt/srpWeight (same flat plane index,
    * same md5-parity weights). `pdim` = the plane dimensionality (Dim
    * for raw vectors, Dim+1 for the MIPS norm-augmented ones). */
  private def srpBucketSql(qvCol: String, t: Int, pdim: Int = Dim): String =
    (0 until SrpBits).map { b =>
      s"""(CASE WHEN list_sum(list_transform(range(1, ${pdim + 1}),
         |    i -> $qvCol[i] * (${planeLit(t, b, SrpBits, pdim)})[i])) >= 0
         |  THEN ${1 << b} ELSE 0 END)""".stripMargin
    }.mkString("\n  + ")

  /** The 16 JL projection coordinates of a quantized-list column — the
    * SQL twin of Similarity.jlProjectInt (table 0, bits = JlDim of the
    * shared md5-parity plane family, weights inlined). */
  private def jlListSql(qvCol: String): String = {
    val coords = (0 until JlDim).map { j =>
      s"""CAST(list_sum(list_transform(range(1, ${Dim + 1}),
         |      i -> $qvCol[i] * (${planeLit(0, j, JlDim, Dim)})[i]))
         |    AS BIGINT)""".stripMargin
    }
    s"[${coords.mkString(",\n    ")}]"
  }

  /** Exact-int cosine between two list columns over dims [1, n]. */
  private def duckCosN(a: String, b: String, n: Int, nrmA: String,
      nrmB: String): String =
    s"""(CAST(CAST(list_sum(list_transform(range(1, ${n + 1}),
       |    i -> $a[i] * $b[i])) AS STRING) AS DOUBLE)
       |  / ($nrmA * $nrmB))""".stripMargin

  private def duckNrmN(v: String, n: Int): String =
    s"""SQRT(CAST(CAST(list_sum(list_transform(range(1, ${n + 1}),
       |    i -> $v[i] * $v[i])) AS STRING) AS DOUBLE))""".stripMargin

  /** Unrolled integer-Lloyd's CTE chain (MATERIALIZED — a plain chain
    * re-expands the scan per round): q4t (1e4 grid), km_c0 (the k
    * smallest vec_ids), then per round exact-L2 argmin assignment
    * (ties to the smaller cell), truncating-division centroid update,
    * and empty-cell carryover. Ends at km_c$iters. */
  private val q4tCte: String =
    s"""q4t AS MATERIALIZED (SELECT vec_id, list_transform(embedding,
       |  x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q4
       |  FROM embeddings)""".stripMargin

  private def sqL2(dim: Int): String =
    s"""CAST(list_sum(list_transform(range(1, ${dim + 1}),
       |        i -> (v.q4[i] - c.cv[i]) * (v.q4[i] - c.cv[i])))
       |        AS BIGINT)""".stripMargin

  /** Unrolled integer-Lloyd's chain over a (vec_id, q4) source CTE
    * (MATERIALIZED — a plain chain re-expands the scan per round):
    * ${p}c0 = the k smallest vec_ids, then per round exact-L2 argmin
    * assignment (ties to the smaller cell), truncating-division
    * centroid update, empty-cell carryover. Ends at ${p}c$iters. */
  private def kmeansChain(kCells: Int, iters: Int, dim: Int,
      p: String, src: String): String = {
    val m = "AS MATERIALIZED"
    val head =
      s"""${p}c0 $m (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1
         |    AS cell, q4 AS cv
         |  FROM (SELECT vec_id, q4 FROM $src ORDER BY vec_id
         |    LIMIT $kCells))""".stripMargin
    val steps = (1 to iters).flatMap { t =>
      Seq(
        s"""${p}a$t $m (SELECT vec_id, q4, cell FROM (
           |  SELECT v.vec_id, v.q4, c.cell,
           |    ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
           |      ${sqL2(dim)}, c.cell) AS rk
           |  FROM $src v, ${p}c${t - 1} c) WHERE rk = 1)""".stripMargin,
        s"""${p}u$t $m (SELECT cell, list(s ORDER BY i) AS cv FROM (
           |  SELECT a.cell, r.i AS i,
           |    CAST(SUM(a.q4[r.i]) AS BIGINT) // COUNT(*) AS s
           |  FROM ${p}a$t a, range(1, ${dim + 1}) r(i)
           |  GROUP BY a.cell, r.i) GROUP BY cell)""".stripMargin,
        s"""${p}c$t $m (SELECT cell, cv FROM ${p}u$t
           |  UNION ALL SELECT cell, cv FROM ${p}c${t - 1}
           |  WHERE cell NOT IN (SELECT cell FROM ${p}u$t))""".stripMargin)
    }
    (head +: steps).mkString(",\n")
  }

  /** The integer-PQ replay (subspace Lloyd's chains, argmin codes,
    * exact ADC tables, candidate cut, 1e8-grid cosine re-rank) over a
    * (vec_id, q4) source CTE — shared by the PQ and OPQ oracles (OPQ =
    * the same replay over the rotated vectors). Emits everything AFTER
    * the `WITH ...,` prefix, ending in the final SELECT. */
  private def pqReplay(src: String): String = {
    val subDim = Dim / PqM
    val subCtes = (0 until PqM).map { s =>
      val lo = s * subDim + 1; val hi = (s + 1) * subDim
      s"""pq${s}q4 AS MATERIALIZED (
         |  SELECT vec_id, q4[$lo:$hi] AS q4 FROM $src)""".stripMargin +
        ",\n" + kmeansChain(PqCodes, PqIters, subDim, s"pq${s}_",
          s"pq${s}q4")
    }.mkString(",\n")
    def subL2(dim: Int): String =
      s"""CAST(list_sum(list_transform(range(1, ${dim + 1}),
         |      i -> (v.q4[i] - c.cv[i]) * (v.q4[i] - c.cv[i])))
         |      AS BIGINT)""".stripMargin
    val codeSel = (0 until PqM).map { s =>
      s"""SELECT vec_id, $s AS s, cell AS code FROM (
         |  SELECT v.vec_id, c.cell,
         |    ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
         |      ${subL2(subDim)}, c.cell) AS rk
         |  FROM pq${s}q4 v, pq${s}_c$PqIters c) WHERE rk = 1""".stripMargin
    }.mkString("\n  UNION ALL ")
    val tabSel = (0 until PqM).map { s =>
      s"""SELECT v.vec_id AS query_id, $s AS s, c.cell AS code,
         |  ${subL2(subDim)} AS d
         |FROM pq${s}q4 v, pq${s}_c$PqIters c
         |WHERE v.vec_id < $NQueries""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""$subCtes,
       |codes AS MATERIALIZED (
       |  $codeSel),
       |qtab AS MATERIALIZED (
       |  $tabSel),
       |adc AS (
       |  SELECT t.query_id, cd.vec_id AS neighbor_id,
       |    CAST(SUM(t.d) AS BIGINT) AS adc
       |  FROM codes cd JOIN qtab t
       |    ON t.s = cd.s AND t.code = cd.code
       |    AND cd.vec_id != t.query_id
       |  GROUP BY 1, 2),
       |cand AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY adc, neighbor_id) AS rk FROM adc)
       |  WHERE rk <= ${PqCandMult * TopK}),
       |q8 AS MATERIALIZED (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> ${qel("x")}) AS qv
       |  FROM embeddings),
       |qn8 AS MATERIALIZED (
       |  SELECT vec_id, qv, ${duckNrmN("qv", Dim)} AS nrm FROM q8),
       |scored AS (
       |  SELECT cd.query_id, cd.neighbor_id,
       |    ${duckCosN("a.qv", "b.qv", Dim, "a.nrm", "b.nrm")}
       |      AS cos_sim
       |  FROM cand cd
       |  JOIN qn8 a ON a.vec_id = cd.query_id
       |  JOIN qn8 b ON b.vec_id = cd.neighbor_id),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, cos_sim FROM ranked
       |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin
  }

  /** Integer orthogonal-iteration replay (SQL twin of
    * `Similarity.pcaIntComponents`): the shifted Gramian, then per
    * component `iters` rounds of matvec -> 18-bit shift ->
    * fixed-point Gram-Schmidt against every finished component. After
    * this block `pcv<c>`/(list form) `pl<c>` hold component c. All
    * arithmetic is the driver loop's exactly: `//` truncates toward
    * zero like Scala `/`, `>>` floor-shifts, `length(bin(MAX(ABS(x))))`
    * is bitlen. */
  private def pcaIntCtes(nComp: Int, iters: Int): String = {
    val m = "AS MATERIALIZED"
    val head = Seq(
      s"""qq $m (SELECT vec_id, list_transform(embedding,
         |  x -> CAST(ROUND(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS q4
         |  FROM embeddings)""".stripMargin,
      s"""cov $m (SELECT jj.j AS j, kk.k AS k,
         |  CAST(SUM(q4[jj.j] * q4[kk.k]) AS BIGINT) AS c0
         |  FROM qq, range(1, ${Dim + 1}) jj(j), range(1, ${Dim + 1}) kk(k)
         |  GROUP BY 1, 2)""".stripMargin,
      s"""cm $m (SELECT j, k, c0 >> (SELECT
         |  greatest(length(bin(MAX(ABS(c0)))) - 34, 0) FROM cov) AS val
         |  FROM cov)""".stripMargin)
    val comps = (0 until nComp).flatMap { c =>
      val start = s"""c${c}v0 $m (SELECT r.j AS j, CAST(1 AS BIGINT)
        |  AS v FROM range(1, ${Dim + 1}) r(j))""".stripMargin
      val iterCtes = (1 to iters).flatMap { t =>
        val w =
          s"""c${c}w$t $m (SELECT cm.j AS j, CAST(SUM(cm.val * p.v)
             |  AS BIGINT) AS w FROM cm JOIN c${c}v${t - 1} p
             |  ON cm.k = p.j GROUP BY cm.j)""".stripMargin
        val u0 =
          s"""c${c}u${t}x0 $m (SELECT j, w >> (SELECT
             |  greatest(length(bin(MAX(ABS(w)))) - 18, 0)
             |  FROM c${c}w$t) AS v FROM c${c}w$t)""".stripMargin
        val orthos = (0 until c).map { pi =>
          s"""c${c}u${t}x${pi + 1} $m (SELECT u.j,
             |  CASE WHEN ((SELECT CAST(SUM(p3.v * p3.v) AS BIGINT)
             |      FROM pcv$pi p3) >> 20) = 0 THEN u.v
             |  ELSE u.v - ((((SELECT CAST(SUM(u2.v * p2.v) AS BIGINT)
             |      FROM c${c}u${t}x$pi u2 JOIN pcv$pi p2
             |      ON p2.j = u2.j)
             |    // ((SELECT CAST(SUM(p3.v * p3.v) AS BIGINT)
             |      FROM pcv$pi p3) >> 20)) * p.v) >> 20) END AS v
             |  FROM c${c}u${t}x$pi u JOIN pcv$pi p
             |  ON p.j = u.j)""".stripMargin
        }
        val vFin = s"c${c}v$t $m (SELECT j, v FROM c${c}u${t}x$c)"
        Seq(w, u0) ++ orthos :+ vFin
      }
      (start +: iterCtes) ++ Seq(
        s"pcv$c $m (SELECT j, v FROM c${c}v$iters)",
        s"pl$c $m (SELECT list(v ORDER BY j) AS vv FROM pcv$c)")
    }
    (head ++ comps).mkString(",\n")
  }

  private def kmeansCtes(kCells: Int, iters: Int): String =
    q4tCte + ",\n" + kmeansChain(kCells, iters, Dim, "km_", "q4t")

  /** Final-codebook assignment CTE: every vector's winning cell + exact
    * integer squared L2, from km_c$iters. */
  private def kmeansAssignCte(iters: Int): String =
    s"""km_fin AS MATERIALIZED (SELECT vec_id, q4, cell, d AS dist_sq
       |  FROM (
       |  SELECT v.vec_id, v.q4, c.cell,
       |    ${sqL2(Dim)} AS d,
       |    ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
       |      ${sqL2(Dim)}, c.cell) AS rk
       |  FROM q4t v, km_c$iters c) WHERE rk = 1)""".stripMargin

  /** Shared CTE prefix: quantized vectors + exact norms + per-table
    * bucket rows. */
  private lazy val srpCtes: String = {
    val bandSelects = (0 until SrpTables).map { t =>
      s"SELECT vec_id, $t AS tbl, ${srpBucketSql("qv", t)} AS bkt FROM qn"
    }.mkString("\n  UNION ALL\n  ")
    s"""q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> ${qel("x")}) AS qv
       |  FROM embeddings),
       |qn AS (
       |  SELECT vec_id, qv,
       |    SQRT(CAST(CAST(list_sum(list_transform(range(1, ${Dim + 1}),
       |      i -> qv[i] * qv[i])) AS STRING) AS DOUBLE)) AS nrm
       |  FROM q),
       |bk AS (
       |  $bandSelects)""".stripMargin
  }

  private def duckCosQv(a: String, b: String): String =
    s"""(CAST(CAST(list_sum(list_transform(range(1, ${Dim + 1}),
       |    i -> $a.qv[i] * $b.qv[i])) AS STRING) AS DOUBLE)
       |  / ($a.nrm * $b.nrm))""".stripMargin

  /** MIPS replay CTEs: 1e4-quantized vectors, exact self-dots, integer
    * norm augmentation, per-table buckets over the (Dim+1)-dim planes. */
  private lazy val mipsSrpCtes: String = {
    val q4el = "CAST(ROUND(CAST(x AS DOUBLE) * 10000) AS BIGINT)"
    val bkC = (0 until SrpTables).map { t =>
      s"SELECT vec_id, $t AS tbl, ${srpBucketSql("av", t, Dim + 1)} " +
        "AS bkt FROM aug"
    }.mkString("\n  UNION ALL\n  ")
    val bkQ = (0 until SrpTables).map { t =>
      s"SELECT vec_id, $t AS tbl, ${srpBucketSql("av", t, Dim + 1)} " +
        s"AS bkt FROM augq WHERE vec_id < $NQueries"
    }.mkString("\n  UNION ALL\n  ")
    s"""q4 AS (
       |  SELECT vec_id, list_transform(embedding, x -> $q4el) AS qv
       |  FROM embeddings),
       |sq AS (
       |  SELECT vec_id, qv,
       |    CAST(list_sum(list_transform(range(1, ${Dim + 1}),
       |      i -> qv[i] * qv[i])) AS BIGINT) AS n2
       |  FROM q4),
       |m2 AS (SELECT MAX(n2) AS m FROM sq),
       |aug AS (
       |  SELECT vec_id, qv, list_append(qv,
       |    CAST(ROUND(SQRT(CAST(GREATEST(0, (SELECT m FROM m2) - n2)
       |      AS DOUBLE))) AS BIGINT)) AS av
       |  FROM sq),
       |augq AS (
       |  SELECT vec_id, qv, list_append(qv, CAST(0 AS BIGINT)) AS av
       |  FROM sq),
       |bkc AS (
       |  $bkC),
       |bkq AS (
       |  $bkQ)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "ann_mips_lsh_topk" ->
      s"""WITH $mipsSrpCtes,
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM bkq q JOIN bkc c
         |    ON q.tbl = c.tbl AND q.bkt = c.bkt
         |    AND c.vec_id != q.vec_id),
         |scored AS (
         |  SELECT cd.query_id, cd.neighbor_id,
         |    CAST(list_sum(list_transform(range(1, ${Dim + 1}),
         |      i -> a.qv[i] * b.qv[i])) AS BIGINT) AS ip
         |  FROM cand cd
         |  JOIN q4 a ON a.vec_id = cd.query_id
         |  JOIN q4 b ON b.vec_id = cd.neighbor_id),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY ip DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, ip FROM ranked
         |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin,

    "ann_lsh_topk" ->
      s"""WITH $srpCtes,
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS query_id, y.vec_id AS neighbor_id
         |  FROM bk x JOIN bk y
         |    ON x.tbl = y.tbl AND x.bkt = y.bkt
         |    AND x.vec_id < $NQueries AND y.vec_id != x.vec_id),
         |scored AS (
         |  SELECT c.query_id, c.neighbor_id,
         |    ${duckCosQv("a", "b")} AS cos_sim
         |  FROM cand c
         |  JOIN qn a ON a.vec_id = c.query_id
         |  JOIN qn b ON b.vec_id = c.neighbor_id),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, cos_sim FROM ranked
         |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin,

    "dedup_embedding_lsh" ->
      s"""WITH $srpCtes,
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
         |  FROM bk x JOIN bk y
         |    ON x.tbl = y.tbl AND x.bkt = y.bkt AND x.vec_id < y.vec_id)
         |SELECT c.id_a, c.id_b, ${duckCosQv("a", "b")} AS cos_sim
         |FROM cand c
         |JOIN qn a ON a.vec_id = c.id_a
         |JOIN qn b ON b.vec_id = c.id_b
         |WHERE ${duckCosQv("a", "b")} >= $NearDupTau
         |ORDER BY id_a, id_b""".stripMargin,

    // JL replay: 16 projected integer coordinates from the 1e4 grid,
    // projected-space ranking, full-dim 1e8 exact rescore of survivors
    "ann_jl_topk" ->
      s"""WITH q AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> ${qel("x")}) AS qv,
         |    list_transform(embedding,
         |      x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000) AS BIGINT))
         |      AS q4
         |  FROM embeddings),
         |p AS (
         |  SELECT vec_id, qv, ${jlListSql("q4")} AS pv FROM q),
         |pn AS (
         |  SELECT vec_id, qv, pv,
         |    ${duckNrmN("pv", JlDim)} AS pnrm,
         |    ${duckNrmN("qv", Dim)} AS nrm
         |  FROM p),
         |scored AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    ${duckCosN("a.pv", "b.pv", JlDim, "a.pnrm", "b.pnrm")}
         |      AS cos_sim,
         |    ${duckCosN("a.qv", "b.qv", Dim, "a.nrm", "b.nrm")}
         |      AS cos_full
         |  FROM pn a JOIN pn b ON b.vec_id != a.vec_id
         |  WHERE a.vec_id < $NQueries),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, cos_sim, cos_full
         |FROM ranked WHERE rank <= $TopK
         |ORDER BY query_id, rank""".stripMargin,

    // matryoshka replay: full-64 and first-16 exact rankings on the
    // same 1e8 grid, overlap counted with nulls-preserving left join
    "embed_matryoshka_eval" ->
      s"""WITH q AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> ${qel("x")}) AS qv
         |  FROM embeddings),
         |qn AS (
         |  SELECT vec_id, qv,
         |    ${duckNrmN("qv", Dim)} AS nrm64,
         |    ${duckNrmN("qv", JlDim)} AS nrm16
         |  FROM q),
         |sf AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
         |      ${duckCosN("a.qv", "b.qv", Dim, "a.nrm64", "b.nrm64")}
         |        DESC, b.vec_id) AS rank
         |  FROM qn a JOIN qn b ON b.vec_id != a.vec_id
         |  WHERE a.vec_id < $NQueries),
         |sp AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
         |      ${duckCosN("a.qv", "b.qv", JlDim, "a.nrm16", "b.nrm16")}
         |        DESC, b.vec_id) AS rank
         |  FROM qn a JOIN qn b ON b.vec_id != a.vec_id
         |  WHERE a.vec_id < $NQueries)
         |SELECT f.query_id,
         |  CAST(COUNT(p.neighbor_id) AS INTEGER) AS n_overlap
         |FROM (SELECT * FROM sf WHERE rank <= $TopKWide) f
         |LEFT JOIN (SELECT * FROM sp WHERE rank <= $TopKWide) p
         |  ON f.query_id = p.query_id AND f.neighbor_id = p.neighbor_id
         |GROUP BY f.query_id ORDER BY f.query_id""".stripMargin,

    // label-centroid IVF replay: truncating per-dim label means,
    // label-ascending cells, same probe/score/rank chain
    "ann_ivf_topk" ->
      s"""WITH q4t AS MATERIALIZED (
         |  SELECT vec_id, label, list_transform(embedding,
         |    x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q4
         |  FROM embeddings),
         |lc AS MATERIALIZED (
         |  SELECT label, list(c ORDER BY i) AS cv FROM (
         |    SELECT label, r.i AS i,
         |      CAST(SUM(q4[r.i]) AS BIGINT) // COUNT(*) AS c
         |    FROM q4t, range(1, ${Dim + 1}) r(i)
         |    GROUP BY label, r.i) GROUP BY label),
         |cells AS MATERIALIZED (
         |  SELECT ROW_NUMBER() OVER (ORDER BY label) - 1 AS cell, cv
         |  FROM lc),
         |fin AS MATERIALIZED (
         |  SELECT vec_id, cell FROM (
         |    SELECT v.vec_id, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
         |        CAST(list_sum(list_transform(range(1, ${Dim + 1}),
         |          i -> (v.q4[i] - c.cv[i]) * (v.q4[i] - c.cv[i])))
         |          AS BIGINT), c.cell) AS rk
         |    FROM q4t v, cells c) WHERE rk = 1),
         |q8 AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> ${qel("x")}) AS qv
         |  FROM embeddings),
         |qn8 AS MATERIALIZED (
         |  SELECT vec_id, qv, ${duckNrmN("qv", Dim)} AS nrm FROM q8),
         |probes AS (
         |  SELECT vec_id AS query_id, cell FROM (
         |    SELECT v.vec_id, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
         |        CAST(list_sum(list_transform(range(1, ${Dim + 1}),
         |          i -> (v.q4[i] - c.cv[i]) * (v.q4[i] - c.cv[i])))
         |          AS BIGINT), c.cell) AS rk
         |    FROM q4t v, cells c
         |    WHERE v.vec_id < $NQueries) WHERE rk <= 3),
         |scored AS (
         |  SELECT p.query_id, f.vec_id AS neighbor_id,
         |    ${duckCosN("a.qv", "b.qv", Dim, "a.nrm", "b.nrm")}
         |      AS cos_sim
         |  FROM probes p JOIN fin f ON f.cell = p.cell
         |    AND f.vec_id != p.query_id
         |  JOIN qn8 a ON a.vec_id = p.query_id
         |  JOIN qn8 b ON b.vec_id = f.vec_id),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, cos_sim FROM ranked
         |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin,

    // PQ replay: per-subspace Lloyd's chains over q4 slices, argmin
    // codes, exact integer ADC tables for the query side, (adc,
    // neighbor) candidate cut, 1e8-grid cosine re-rank
    "ann_pq_topk" -> s"WITH $q4tCte,\n${pqReplay("q4t")}",

    // OPQ replay = the integer rotation CTEs (per-dim energies, rank
    // pairing, snake-drafted 45-degree Givens slots — r4t) composed
    // with the SAME PQ replay over the rotated vectors; the re-rank
    // stays on the original embeddings
    "ann_opq_topk" -> {
      val subDim = Dim / PqM
      s"""WITH $q4tCte,
         |opq_en AS MATERIALIZED (
         |  SELECT r.i AS dim, CAST(SUM(q4[r.i] * q4[r.i]) AS BIGINT)
         |    AS e
         |  FROM q4t, range(1, ${Dim + 1}) r(i) GROUP BY r.i),
         |opq_rk AS (
         |  SELECT dim, e, ROW_NUMBER() OVER (ORDER BY e DESC, dim) AS r
         |  FROM opq_en),
         |opq_prs AS (
         |  SELECT h.r AS p, h.dim AS hi, l.dim AS lo, h.e + l.e AS ce
         |  FROM opq_rk h JOIN opq_rk l ON l.r = ${Dim + 1} - h.r
         |  WHERE h.r <= ${Dim / 2}),
         |opq_po AS (
         |  SELECT *, ROW_NUMBER() OVER (ORDER BY ce DESC, p) - 1 AS j
         |  FROM opq_prs),
         |opq_mp AS (
         |  SELECT hi, lo, j,
         |    CASE WHEN (j // $PqM) % 2 = 0 THEN j % $PqM
         |         ELSE ${PqM - 1} - (j % $PqM) END AS bucket
         |  FROM opq_po),
         |opq_mp2 AS MATERIALIZED (
         |  SELECT hi, lo, bucket, ROW_NUMBER() OVER (
         |    PARTITION BY bucket ORDER BY j) - 1 AS bslot
         |  FROM opq_mp),
         |r4t AS MATERIALIZED (
         |  SELECT vec_id, list(val ORDER BY pos) AS q4 FROM (
         |    SELECT v.vec_id,
         |      m.bucket * $subDim + 2 * m.bslot + 1 AS pos,
         |      v.q4[m.hi] + v.q4[m.lo] AS val FROM q4t v, opq_mp2 m
         |    UNION ALL
         |    SELECT v.vec_id,
         |      m.bucket * $subDim + 2 * m.bslot + 2 AS pos,
         |      v.q4[m.hi] - v.q4[m.lo] AS val FROM q4t v, opq_mp2 m)
         |  GROUP BY vec_id),
         |${pqReplay("r4t")}""".stripMargin
    },

    // IVFADC replay: coarse chain + subspace chains composed — corpus
    // cells and codes, query probe sets and ADC tables, cell-filtered
    // ADC cut, 1e8-grid cosine re-rank
    "ann_ivfpq_topk" -> {
      val subDim = Dim / PqM
      val subCtes = (0 until PqM).map { s =>
        val lo = s * subDim + 1; val hi = (s + 1) * subDim
        s"""pq${s}q4 AS MATERIALIZED (
           |  SELECT vec_id, q4[$lo:$hi] AS q4 FROM q4t)""".stripMargin +
          ",\n" + kmeansChain(PqCodes, PqIters, subDim, s"pq${s}_",
            s"pq${s}q4")
      }.mkString(",\n")
      def subL2: String =
        s"""CAST(list_sum(list_transform(range(1, ${subDim + 1}),
           |      i -> (v.q4[i] - c.cv[i]) * (v.q4[i] - c.cv[i])))
           |      AS BIGINT)""".stripMargin
      val codeSel = (0 until PqM).map { s =>
        s"""SELECT vec_id, $s AS s, cell AS code FROM (
           |  SELECT v.vec_id, c.cell,
           |    ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
           |      $subL2, c.cell) AS rk
           |  FROM pq${s}q4 v, pq${s}_c$PqIters c) WHERE rk = 1""".stripMargin
      }.mkString("\n  UNION ALL ")
      val tabSel = (0 until PqM).map { s =>
        s"""SELECT v.vec_id AS query_id, $s AS s, c.cell AS code,
           |  $subL2 AS d
           |FROM pq${s}q4 v, pq${s}_c$PqIters c
           |WHERE v.vec_id < $NQueries""".stripMargin
      }.mkString("\n  UNION ALL ")
      s"""WITH ${kmeansCtes(KmCells, KmIters)},
         |${kmeansAssignCte(KmIters)},
         |$subCtes,
         |codes AS MATERIALIZED (
         |  $codeSel),
         |probes AS (
         |  SELECT vec_id AS query_id, cell FROM (
         |    SELECT v.vec_id, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
         |        ${sqL2(Dim)}, c.cell) AS rk
         |    FROM q4t v, km_c$KmIters c
         |    WHERE v.vec_id < $NQueries) WHERE rk <= 3),
         |qtab AS MATERIALIZED (
         |  $tabSel),
         |adc AS (
         |  SELECT t.query_id, cd.vec_id AS neighbor_id,
         |    CAST(SUM(t.d) AS BIGINT) AS adc
         |  FROM codes cd
         |  JOIN km_fin f ON f.vec_id = cd.vec_id
         |  JOIN probes p ON p.cell = f.cell
         |  JOIN qtab t ON t.query_id = p.query_id
         |    AND t.s = cd.s AND t.code = cd.code
         |  WHERE cd.vec_id != p.query_id
         |  GROUP BY 1, 2),
         |cand AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY adc, neighbor_id) AS rk FROM adc)
         |  WHERE rk <= ${PqCandMult * TopK}),
         |q8 AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> ${qel("x")}) AS qv
         |  FROM embeddings),
         |qn8 AS MATERIALIZED (
         |  SELECT vec_id, qv, ${duckNrmN("qv", Dim)} AS nrm FROM q8),
         |scored AS (
         |  SELECT cd.query_id, cd.neighbor_id,
         |    ${duckCosN("a.qv", "b.qv", Dim, "a.nrm", "b.nrm")}
         |      AS cos_sim
         |  FROM cand cd
         |  JOIN qn8 a ON a.vec_id = cd.query_id
         |  JOIN qn8 b ON b.vec_id = cd.neighbor_id),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, cos_sim FROM ranked
         |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin
    },

    // integer-Lloyd's replay: unrolled rounds, final assignment
    "embed_kmeans_int" ->
      s"""WITH ${kmeansCtes(KmCells, KmIters)},
         |${kmeansAssignCte(KmIters)}
         |SELECT vec_id, CAST(cell AS INTEGER) AS cell, dist_sq
         |FROM km_fin ORDER BY vec_id""".stripMargin,

    // IVF replay over the same codebook: corpus cells from km_fin,
    // query probe sets = nprobe smallest exact centroid distances
    // (ties to the smaller cell), 1e8-grid cosine scoring + ranking
    "ann_ivf_kmeans_topk" ->
      s"""WITH ${kmeansCtes(KmCells, KmIters)},
         |${kmeansAssignCte(KmIters)},
         |q8 AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> ${qel("x")}) AS qv
         |  FROM embeddings),
         |qn8 AS MATERIALIZED (
         |  SELECT vec_id, qv, ${duckNrmN("qv", Dim)} AS nrm FROM q8),
         |probes AS (
         |  SELECT vec_id AS query_id, cell FROM (
         |    SELECT v.vec_id, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
         |        CAST(list_sum(list_transform(range(1, ${Dim + 1}),
         |          i -> (v.q4[i] - c.cv[i]) * (v.q4[i] - c.cv[i])))
         |          AS BIGINT), c.cell) AS rk
         |    FROM q4t v, km_c$KmIters c
         |    WHERE v.vec_id < $NQueries) WHERE rk <= 3),
         |scored AS (
         |  SELECT p.query_id, f.vec_id AS neighbor_id,
         |    ${duckCosN("a.qv", "b.qv", Dim, "a.nrm", "b.nrm")}
         |      AS cos_sim
         |  FROM probes p JOIN km_fin f ON f.cell = p.cell
         |    AND f.vec_id != p.query_id
         |  JOIN qn8 a ON a.vec_id = p.query_id
         |  JOIN qn8 b ON b.vec_id = f.vec_id),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, cos_sim FROM ranked
         |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin,

    // power-iteration replay: the same Gramian, C-shift, and 100
    // shift-normalized matvecs unrolled as MATERIALIZED CTEs (inlined
    // CTEs would re-expand the scan per iteration); >> is arithmetic
    // (floor) on both engines, bin() gives the exact bit length
    "embed_pca_power" -> {
      val m = "AS MATERIALIZED"
      val head = Seq(
        s"""qq $m (SELECT vec_id, list_transform(embedding,
           |  x -> CAST(ROUND(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS q4
           |  FROM embeddings)""".stripMargin,
        s"""cov $m (SELECT jj.j AS j, kk.k AS k,
           |  CAST(SUM(q4[jj.j] * q4[kk.k]) AS BIGINT) AS c0
           |  FROM qq, range(1, ${Dim + 1}) jj(j), range(1, ${Dim + 1}) kk(k)
           |  GROUP BY 1, 2)""".stripMargin,
        s"""cm $m (SELECT j, k, c0 >> (SELECT
           |  greatest(length(bin(MAX(ABS(c0)))) - 34, 0) FROM cov) AS val
           |  FROM cov)""".stripMargin,
        s"""v0 $m (SELECT r.j AS j, CAST(1 AS BIGINT) AS v
           |  FROM range(1, ${Dim + 1}) r(j))""".stripMargin)
      val steps = (1 to PcaIters).flatMap { t =>
        Seq(
          s"""w$t $m (SELECT cm.j AS j, CAST(SUM(cm.val * v${t - 1}.v)
             |  AS BIGINT) AS w FROM cm JOIN v${t - 1} ON cm.k = v${t - 1}.j
             |  GROUP BY cm.j)""".stripMargin,
          s"""v$t $m (SELECT j, w >> (SELECT
             |  greatest(length(bin(MAX(ABS(w)))) - 20, 0) FROM w$t) AS v
             |  FROM w$t)""".stripMargin)
      }
      val tail = s"pv $m (SELECT list(v ORDER BY j) AS vv FROM v$PcaIters)"
      s"""WITH ${(head ++ steps :+ tail).mkString(",\n")}
         |SELECT vec_id, CAST(list_sum(list_transform(range(1, ${Dim + 1}),
         |  i -> q4[i] * vv[i])) AS BIGINT) AS pc1_proj
         |FROM qq, pv ORDER BY vec_id""".stripMargin
    },

    // integer top-k PCA replay: components from the unrolled
    // orthogonal iteration, projections as exact int64 dots
    "embed_pca_project" -> {
      val froms = (0 until PcaK).map(c => s"pl$c").mkString(", ")
      val dots = (0 until PcaK).map(c =>
        s"""CAST(list_sum(list_transform(range(1, ${Dim + 1}),
           |    i -> qq.q4[i] * pl$c.vv[i])) AS BIGINT)
           |    AS proj_${c + 1}""".stripMargin).mkString(",\n  ")
      s"""WITH ${pcaIntCtes(PcaK, PcaKIters)}
         |SELECT qq.vec_id,
         |  $dots
         |FROM qq, $froms
         |ORDER BY qq.vec_id""".stripMargin
    },

    // PCA-prefiltered ANN replay: projected-space cosine ranking over
    // the SAME integer components, full-dim 1e8 exact rescore
    "ann_pca_topk" -> {
      val froms = (0 until PcaK).map(c => s"pl$c").mkString(", ")
      val pvList = "[" + (0 until PcaK).map(c =>
        s"""(CAST(list_sum(list_transform(range(1, ${Dim + 1}),
           |      i -> q2.q4[i] * pl$c.vv[i])) AS BIGINT) >> 12)"""
          .stripMargin)
        .mkString(",\n    ") + "]"
      s"""WITH ${pcaIntCtes(PcaK, PcaKIters)},
         |q2 AS MATERIALIZED (
         |  SELECT e.vec_id, list_transform(e.embedding,
         |    x -> ${qel("x")}) AS qv, qq.q4 AS q4
         |  FROM embeddings e JOIN qq ON qq.vec_id = e.vec_id),
         |pp AS MATERIALIZED (
         |  SELECT q2.vec_id, q2.qv, $pvList AS pv
         |  FROM q2, $froms),
         |ppn AS (
         |  SELECT vec_id, qv, pv,
         |    ${duckNrmN("pv", PcaK)} AS pnrm,
         |    ${duckNrmN("qv", Dim)} AS nrm
         |  FROM pp),
         |scored AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    ${duckCosN("a.pv", "b.pv", PcaK, "a.pnrm", "b.pnrm")}
         |      AS cos_sim,
         |    ${duckCosN("a.qv", "b.qv", Dim, "a.nrm", "b.nrm")}
         |      AS cos_full
         |  FROM ppn a JOIN ppn b ON b.vec_id != a.vec_id
         |  WHERE a.vec_id < $NQueries),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, cos_sim, cos_full
         |FROM ranked WHERE rank <= $TopK
         |ORDER BY query_id, rank""".stripMargin
    },

    // projection digest replay: same 16 coordinates, integer stats
    "embed_jl_project" ->
      s"""WITH q AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q4
         |  FROM embeddings),
         |p AS (SELECT vec_id, ${jlListSql("q4")} AS pv FROM q)
         |SELECT vec_id, CAST($JlDim AS INTEGER) AS n_dims,
         |  CAST(list_sum(pv) AS BIGINT) AS sum_p,
         |  CAST(list_min(pv) AS BIGINT) AS min_p,
         |  CAST(list_max(pv) AS BIGINT) AS max_p,
         |  CAST(list_sum(list_transform(range(1, ${JlDim + 1}),
         |    i -> pv[i] * pv[i])) AS BIGINT) AS ssq_p
         |FROM p ORDER BY vec_id""".stripMargin,

    // SemDeDup replay: drop any vector with a smaller-id mate in ANY
    // table's SRP cell at quantized cosine >= tau (OR-amplified cells)
    "dedup_semantic" ->
      s"""WITH $srpCtes,
         |dups AS (
         |  SELECT DISTINCT c1.vec_id
         |  FROM bk c1 JOIN bk c2
         |    ON c1.tbl = c2.tbl AND c1.bkt = c2.bkt
         |    AND c1.vec_id > c2.vec_id
         |  JOIN qn a ON a.vec_id = c1.vec_id
         |  JOIN qn b ON b.vec_id = c2.vec_id
         |  WHERE ${duckCosQv("a", "b")} >= $NearDupTau)
         |SELECT e.vec_id, e.label FROM embeddings e
         |WHERE e.vec_id NOT IN (SELECT vec_id FROM dups)
         |ORDER BY e.vec_id""".stripMargin,

    "ann_mips_topk" ->
      s"""WITH q AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
         |  FROM embeddings),
         |scored AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    CAST(list_sum(list_transform(range(1, ${Dim + 1}),
         |      i -> a.qv[i] * b.qv[i])) AS BIGINT) AS ip
         |  FROM q a JOIN q b ON a.vec_id != b.vec_id
         |  WHERE a.vec_id < $NQueries),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY ip DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, ip FROM ranked
         |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin,

    "ann_maxsim_topk" -> {
      val m = Dim / SubVecs
      // MaxSim between two quantized lists: per query token t, the max
      // over doc tokens u of the int64 sub-vector dot (1-based list
      // indexing: element t*m+i)
      val msim =
        s"""CAST(list_sum(list_transform(range(0, $SubVecs), t ->
           |    list_max(list_transform(range(0, $SubVecs), u ->
           |      list_sum(list_transform(range(1, ${m + 1}),
           |        i -> a.qv[t * $m + i] * b.qv[u * $m + i]))))))
           |  AS BIGINT)""".stripMargin
      s"""WITH q AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
         |  FROM embeddings),
         |scored AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    $msim AS maxsim
         |  FROM q a JOIN q b ON a.vec_id != b.vec_id
         |  WHERE a.vec_id < $NQueries),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY maxsim DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, maxsim FROM ranked
         |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin
    },

    "ann_cosine_exact" ->
      s"""WITH scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${duckCosExact("q", "c")} AS cos_sim
         |  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
         |  WHERE q.vec_id < $NQueries),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, cos_sim FROM ranked
         |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin,

    "ann_cosine_topk" ->
      s"""WITH scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${duckCosExact("q", "c")} AS cos_sim
         |  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
         |  WHERE q.vec_id >= $NQueries AND q.vec_id < ${3 * NQueries}),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, cos_sim FROM ranked
         |WHERE rank <= $TopKWide ORDER BY query_id, rank""".stripMargin,

    "ann_smote_oversample" -> {
      val midEl = {
        val s = s"(${qel("a.embedding[i]")} + ${qel("b.embedding[i]")})"
        s"(($s - ((($s % 2) + 2) % 2)) // 2)"
      }
      s"""WITH cnt AS (SELECT label, COUNT(*) AS n FROM embeddings
         |  GROUP BY 1),
         |m AS (SELECT label FROM cnt ORDER BY n, label LIMIT 1),
         |mi AS (SELECT e.* FROM embeddings e JOIN m ON e.label = m.label),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${duckCosExact("q", "c")} AS cos_sim
         |  FROM mi q JOIN mi c ON q.vec_id != c.vec_id),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored),
         |top AS (SELECT query_id, rank, neighbor_id FROM ranked
         |  WHERE rank <= $TopK)
         |SELECT t.query_id AS vec_id, CAST(t.rank AS INT) AS rank,
         |  t.neighbor_id AS nb_id, CAST($Dim AS INT) AS n_dims,
         |  CAST(list_sum(list_transform(range(1, ${Dim + 1}),
         |    i -> $midEl)) AS BIGINT) AS sum_mid,
         |  CAST(list_sum(list_transform(range(1, ${Dim + 1}),
         |    i -> $midEl * $midEl)) AS BIGINT) AS ssq_mid
         |FROM top t
         |JOIN mi a ON a.vec_id = t.query_id
         |JOIN mi b ON b.vec_id = t.neighbor_id
         |ORDER BY vec_id, rank""".stripMargin
    },

    "ann_knn_classify" ->
      s"""WITH scored AS (
         |  SELECT q.vec_id AS query_id, q.label AS true_label,
         |    c.vec_id AS neighbor_id, c.label AS nb_label,
         |    ${duckCosExact("q", "c")} AS cos_sim
         |  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
         |  WHERE q.vec_id < $NQueries),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored),
         |votes AS (
         |  SELECT query_id, true_label, nb_label, COUNT(*) AS votes
         |  FROM ranked WHERE rank <= $TopK GROUP BY 1, 2, 3),
         |best AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY votes DESC, nb_label) AS rn
         |  FROM votes)
         |SELECT query_id, CAST(true_label AS BIGINT) AS true_label,
         |  CAST(nb_label AS BIGINT) AS pred_label,
         |  CAST(votes AS BIGINT) AS votes,
         |  CAST(CASE WHEN nb_label = true_label THEN 1 ELSE 0 END
         |    AS BIGINT) AS correct
         |FROM best WHERE rn = 1 ORDER BY query_id""".stripMargin,

    "ann_hard_negatives" ->
      s"""WITH scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    c.label AS neg_label, ${duckCosExact("q", "c")} AS cos_sim
         |  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
         |  WHERE q.vec_id < $NQueries AND q.label != c.label),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, neg_label, cos_sim FROM ranked
         |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin,

    "ann_filtered_topk" ->
      s"""WITH scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${duckCosExact("q", "c")} AS cos_sim
         |  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
         |  WHERE q.vec_id < $NQueries AND c.label = 1),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, cos_sim FROM ranked
         |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin,

    // centroid = per-label element-wise quantized mean with TRUNCATING
    // integer division (// truncates toward zero like Spark's `div`);
    // integer dots go to double via VARCHAR (HUGEINT->DOUBLE double-rounds)
    "ann_bitext_mutual" ->
      s"""WITH fs AS (
         |  SELECT s.vec_id AS src_id, t.vec_id AS n_id,
         |    ${duckCosExact("s", "t")} AS c,
         |    ROW_NUMBER() OVER (PARTITION BY s.vec_id
         |      ORDER BY ${duckCosExact("s", "t")} DESC, t.vec_id) AS rn
         |  FROM embeddings s JOIN embeddings t
         |    ON s.label = 0 AND t.label = 1),
         |f1 AS (SELECT src_id, n_id AS tgt_best, c AS fc1 FROM fs
         |  WHERE rn = 1),
         |f2 AS (SELECT src_id, c AS fc2 FROM fs WHERE rn = 2),
         |bs AS (
         |  SELECT t.vec_id AS tgt_id, s.vec_id AS n_id,
         |    ${duckCosExact("t", "s")} AS c,
         |    ROW_NUMBER() OVER (PARTITION BY t.vec_id
         |      ORDER BY ${duckCosExact("t", "s")} DESC, s.vec_id) AS rn
         |  FROM embeddings t JOIN embeddings s
         |    ON s.label = 0 AND t.label = 1),
         |b1 AS (SELECT tgt_id, n_id AS src_best, c AS bc1 FROM bs
         |  WHERE rn = 1),
         |b2 AS (SELECT tgt_id, c AS bc2 FROM bs WHERE rn = 2)
         |SELECT f1.src_id, b1.tgt_id, f1.fc1 AS cos_sim,
         |  f1.fc1 - f2.fc2 AS margin_src, b1.bc1 - b2.bc2 AS margin_tgt
         |FROM f1
         |JOIN f2 USING (src_id)
         |JOIN b1 ON f1.tgt_best = b1.tgt_id AND b1.src_best = f1.src_id
         |JOIN b2 USING (tgt_id)
         |ORDER BY src_id""".stripMargin,

    "ann_margin_mining" ->
      s"""WITH q AS (
         |  SELECT vec_id, label,
         |    list_transform(embedding,
         |      x -> ${qel("x")}) AS qv
         |  FROM embeddings),
         |ex AS (
         |  SELECT label, i AS pos, qv[i] AS v
         |  FROM q, range(1, ${Dim + 1}) t(i)),
         |cent AS (
         |  SELECT label, pos, CAST(SUM(v) AS BIGINT) // COUNT(*) AS cv_i
         |  FROM ex GROUP BY label, pos),
         |centv AS (
         |  SELECT label AS c_label, list(cv_i ORDER BY pos) AS cv
         |  FROM cent GROUP BY label),
         |sc AS (
         |  SELECT q.vec_id, q.label, c.c_label,
         |    CAST(CAST(list_sum(list_transform(range(1, ${Dim + 1}),
         |        i -> qv[i] * cv[i])) AS STRING) AS DOUBLE)
         |    / (SQRT(CAST(CAST(list_sum(list_transform(range(1, ${Dim + 1}),
         |        i -> qv[i] * qv[i])) AS STRING) AS DOUBLE))
         |     * SQRT(CAST(CAST(list_sum(list_transform(range(1, ${Dim + 1}),
         |        i -> cv[i] * cv[i])) AS STRING) AS DOUBLE))) AS cos_c
         |  FROM q CROSS JOIN centv c),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY cos_c DESC, c_label) AS rn FROM sc),
         |p AS (SELECT r1.vec_id, r1.label,
         |    r1.c_label AS best_label, r1.cos_c AS best_cos,
         |    r2.c_label AS second_label, r2.cos_c AS second_cos,
         |    r1.cos_c - r2.cos_c AS margin
         |  FROM r r1 JOIN r r2
         |    ON r1.vec_id = r2.vec_id AND r1.rn = 1 AND r2.rn = 2)
         |SELECT vec_id, label, best_label, best_cos,
         |  second_label, second_cos, margin
         |FROM p ORDER BY margin, vec_id LIMIT 50""".stripMargin,

    "ann_label_centroid" ->
      s"""WITH q AS (
         |  SELECT vec_id, label,
         |    list_transform(embedding,
         |      x -> ${qel("x")}) AS qv
         |  FROM embeddings),
         |ex AS (
         |  SELECT label, i AS pos, qv[i] AS v
         |  FROM q, range(1, ${Dim + 1}) t(i)),
         |cent AS (
         |  SELECT label, pos, CAST(SUM(v) AS BIGINT) // COUNT(*) AS cv_i
         |  FROM ex GROUP BY label, pos),
         |centv AS (
         |  SELECT label, list(cv_i ORDER BY pos) AS cv
         |  FROM cent GROUP BY label)
         |SELECT q.vec_id, q.label,
         |  CAST(CAST(list_sum(list_transform(range(1, ${Dim + 1}),
         |      i -> qv[i] * cv[i])) AS STRING) AS DOUBLE)
         |  / (SQRT(CAST(CAST(list_sum(list_transform(range(1, ${Dim + 1}),
         |      i -> qv[i] * qv[i])) AS STRING) AS DOUBLE))
         |   * SQRT(CAST(CAST(list_sum(list_transform(range(1, ${Dim + 1}),
         |      i -> cv[i] * cv[i])) AS STRING) AS DOUBLE))) AS cos_centroid
         |FROM q JOIN centv USING (label)
         |ORDER BY q.vec_id""".stripMargin,

    "dedup_embedding_cosine" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${duckCosExact("a", "b")} AS cos_sim
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE ${duckCosExact("a", "b")} >= $NearDupTau
         |ORDER BY id_a, id_b""".stripMargin,

    "decontaminate_semantic" ->
      s"""WITH bad AS (
         |  SELECT DISTINCT c.vec_id
         |  FROM embeddings c JOIN embeddings q
         |    ON c.vec_id >= $NQueries AND q.vec_id < $NQueries
         |  WHERE ${duckCosExact("q", "c")} >= $NearDupTau)
         |SELECT c.vec_id, c.label FROM embeddings c
         |WHERE c.vec_id >= $NQueries
         |  AND c.vec_id NOT IN (SELECT vec_id FROM bad)
         |ORDER BY c.vec_id""".stripMargin,

    "ann_kcenter_coreset" -> kCenterOracle
  )

  /** Greedy k-center, replayed stage by stage in SQL: the operator's
    * quantized distances are exact int64, so every greedy pick is
    * engine-independent and each of the k selection rounds unrolls to a
    * CTE pair (min-dist-to-selected per row, then the argmax row with
    * ties to the smaller vec_id — the operator's (dist, -id) key). The
    * final assignment replays array_min's (d2, rank) order. */
  private def kCenterOracle: String = {
    // exact squared distance between two quantized BIGINT lists
    def d2(a: String, b: String): String =
      s"""CAST(list_sum(list_transform(range(1, ${Dim + 1}),
         |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)""".stripMargin
    // min-dist per row via join+GROUP BY, not a correlated subquery:
    // DuckDB lambdas cannot capture correlated outer columns
    val stages = (1 until KCenterK).map { r =>
      s"""m$r AS (
         |  SELECT q.vec_id, MIN(${d2("q.v", "s.v")}) AS md
         |  FROM q CROSS JOIN sel${r - 1} s
         |  GROUP BY q.vec_id),
         |s$r AS (
         |  SELECT $r AS rank, q.vec_id AS cid, q.v
         |  FROM m$r m JOIN q ON q.vec_id = m.vec_id
         |  ORDER BY m.md DESC, m.vec_id LIMIT 1),
         |sel$r AS (SELECT * FROM sel${r - 1} UNION ALL SELECT * FROM s$r)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) > 0),
       |sel0 AS (
       |  SELECT 0 AS rank, vec_id AS cid, v FROM q
       |  ORDER BY vec_id LIMIT 1),
       |$stages,
       |assigned AS (
       |  SELECT q.vec_id, s.cid, s.rank, ${d2("q.v", "s.v")} AS d2,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${d2("q.v", "s.v")}, s.rank) AS rn
       |  FROM q CROSS JOIN sel${KCenterK - 1} s)
       |SELECT vec_id, cid AS center_id, rank AS center_rank,
       |  d2 AS d2_to_center
       |FROM assigned WHERE rn = 1 ORDER BY vec_id""".stripMargin
  }
}
