package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-analytics query surface (operators.Graph).
  *
  * The fixture graph is the customer<->supplier trade graph: a directed
  * edge per DISTINCT (customer, supplier) pair that traded (orders x
  * lineitem), symmetrized so both endpoints rank. Node ids are disjoint by
  * parity: customer c -> 2c, supplier s -> 2s+1.
  *
  * PageRank runs in fixed-point bigint arithmetic (operators.Graph.Scale),
  * so the DuckDB oracle — the same power iteration unrolled as chained
  * CTEs — matches bit-for-bit, iteration by iteration.
  */
object GraphOps {
  type Q = (SparkSession, String) => DataFrame

  private val Iters = 5
  private val LpaIters = 4
  private val KCoreK = 36
  private val KCoreRounds = 6
  private val BfsHops = 4

  private val HitsIters = 4

  private val WalkLen = 4
  private val WalksPerNode = 2
  private val SkipWindow = 2

  /** The random-walk CTE chain shared by the walk + skip-gram oracles:
    * ranked adjacency, per-node degree, then one unrolled CTE per step
    * replaying the engine's md5 draw (`hashU32Sql` over the hex digest
    * of start#rep#step, mod out-degree) against the dst-rank. Ends with
    * a `walk(start, rep, step, node)` union of all step levels. */
  private def walkCtes: String = {
    val steps = (1 to WalkLen).map { t =>
      s"""w$t AS MATERIALIZED (
         |  SELECT x.start, x.rep, a.dst AS cur
         |  FROM (
         |    SELECT w.start, w.rep, w.cur,
         |      ${graft.operators.Sampling.hashU32Sql("h")} % dd.deg AS idx
         |    FROM (
         |      SELECT start, rep, cur,
         |        md5(CAST(start AS VARCHAR) || '#' ||
         |            CAST(rep AS VARCHAR) || '#${t - 1}') AS h
         |      FROM w${t - 1}
         |    ) w JOIN deg dd ON dd.node = w.cur
         |  ) x JOIN adj a ON a.src = x.cur AND a.rk = x.idx
         |)""".stripMargin
    }.mkString(",\n")
    val union = (0 to WalkLen).map(t =>
      s"SELECT start, rep, CAST($t AS BIGINT) AS step, cur AS node FROM w$t")
      .mkString("\n  UNION ALL ")
    s"""$EdgesCte,
       |adj AS (
       |  SELECT src, dst, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY src ORDER BY dst) - 1 AS BIGINT) AS rk
       |  FROM e),
       |deg AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY src),
       |w0 AS MATERIALIZED (
       |  SELECT d.node AS start, CAST(r.rep AS BIGINT) AS rep,
       |    d.node AS cur
       |  FROM deg d CROSS JOIN (
       |    ${(0 until WalksPerNode).map(r => s"SELECT $r AS rep")
             .mkString(" UNION ALL ")}) r),
       |$steps,
       |walk AS MATERIALIZED (
       |  $union)""".stripMargin
  }

  /** PPR restart set: customer nodes (custkey*2 in the bipartite
    * encoding) 1, 7, 13 — present with orders at every fixture SF. */
  private val PprSeeds = Seq(2L, 14L, 26L)

  /** The buyer->seller half of [[tradeEdges]], kept DIRECTED (HITS
    * needs direction; a symmetric graph collapses hub == auth). */
  private def directedTradeEdges(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
  }

  private def tradeEdges(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
    val pairs = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    // symmetrize in ONE map-side explode pass — a union of pairs with
    // its reversal would execute the join+distinct subplan twice; and
    // the result stays distinct by construction (endpoint parity
    // differs), so pageRank can skip its own dedup shuffle
    pairs.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
  }

  /** tradeEdges with a deterministic small-integer weight per edge
    * ((custkey + suppkey) % 5 + 1, symmetric by construction) — small
    * weights keep the oracle's hop-bounded closure at O(V * maxCost)
    * distinct rows. */
  private def weightedTradeEdges(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
    val pairs = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"),
        ((col("o_custkey") + col("l_suppkey")) % 5 + 1).as("w"))
      .distinct()
    pairs.select(explode(array(
        struct(col("src"), col("dst"), col("w")),
        struct(col("dst").as("src"), col("src").as("dst"), col("w"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"),
        col("e.w").as("w"))
  }

  /** Part co-purchase graph: parts linked when they appear in the same
    * order — naturally sparse (~0.6% density at sf0.1) and SF-scaled;
    * emitted canonical (p1 < p2, distinct). */
  private def coBuyEdges(s: SparkSession, d: String): DataFrame = {
    // ONE exchange on the basket key feeds everything downstream: the
    // (o, p) dedup AND both self-join sides are then partition-local
    // (HashPartitioning(o) satisfies the join and the distinct's
    // clustering), so the only other exchange is the final (p1, p2)
    // dedup — was 4 exchanges (distinct + 2 join sides + distinct),
    // measured −55% on the pair-gen subplan (guide §2.4)
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .repartition(col("o"))
      .distinct()
    val a = li.select(col("o"), col("p").as("p1"))
    val b = li.select(col("o").as("o2"), col("p").as("p2"))
    a.join(b, col("o") === col("o2") && col("p1") < col("p2"))
      .select(col("p1"), col("p2")).distinct()
  }

  val defs: Map[String, Q] = Map(
    // 5 synchronous damped power iterations over the symmetrized trade
    // graph; bigint fixed-point ranks are engine- and partitioning-exact
    "graph_pagerank" -> ((s, d) => {
      graft.operators.Graph.pageRank(tradeEdges(s, d), "src", "dst", Iters,
          edgesDistinct = true)
        .orderBy(col("node"))
    }),

    // personalized PageRank from three customer seeds: all teleport
    // mass restarts at the seeds, so ranks measure proximity to them
    // (the seeded-relevance curation primitive); unreachable nodes
    // converge to exactly 0 — oracle unrolls the same iterations
    "graph_ppr_seeded" -> ((s, d) => {
      graft.operators.Graph.pageRank(tradeEdges(s, d), "src", "dst",
          Iters, edgesDistinct = true, seeds = Some(PprSeeds))
        .orderBy(col("node"))
    }),

    // HITS on the DIRECTED buyer->seller graph (no symmetrize):
    // hubs = discerning customers, authorities = sought-after
    // suppliers — the two-score centrality PageRank can't express.
    // Integer L1-normalized rounds; the oracle unrolls all of them
    "graph_hits" -> ((s, d) => {
      graft.operators.Graph.hits(directedTradeEdges(s, d), "src", "dst",
          HitsIters, edgesDistinct = true)
        .orderBy(col("node"))
    }),

    // WEIGHTED PageRank over the co-purchase graph: edge weight = how
    // many orders co-bought the pair, rank flow proportional to weight
    // ((rank * w) div strength, same fixed-point discipline) — hub
    // parts that co-occur often rank above incidental neighbors
    "graph_pagerank_weighted" -> ((s, d) => {
      // (o, p) deduped BEFORE the pair fan-out: the joined (o, p1, p2)
      // triples are then unique, so the weight is a plain count — the
      // previous countDistinct(o) re-deduplicated the multi-million-row
      // pair stream inside a two-phase aggregate (r10 optimization;
      // count == countDistinct proven by the unchanged oracle). The
      // distinct also shrinks the join input itself.
      // repartition on the basket key BEFORE the dedup: the distinct
      // and both self-join sides then run partition-local off one
      // reused exchange (r11; measured 1.6 s -> 0.7 s on this subplan)
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .repartition(col("o"))
        .distinct()
      val a = li.select(col("o"), col("p").as("p1"))
      val b = li.select(col("o").as("o2"), col("p").as("p2"))
      val wp = a.join(b, col("o") === col("o2") && col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2"))
        .agg(count(lit(1)).as("w"))
      val sym = wp.select(explode(array(
          struct(col("p1").as("src"), col("p2").as("dst"), col("w")),
          struct(col("p2").as("src"), col("p1").as("dst"), col("w"))))
          .as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"),
          col("e.w").as("w"))
      graft.operators.Graph.pageRank(sym, "src", "dst", Iters,
          edgesDistinct = true, weightCol = Some("w"))
        .orderBy(col("node"))
    }),

    // degree profile of the same graph (symmetrized: in == out per node)
    "graph_degrees" -> ((s, d) => {
      graft.operators.Graph.degrees(tradeEdges(s, d), "src", "dst")
        .orderBy(col("node"))
    }),

    // degree assortativity of the trade graph: do hubs link to hubs?
    // six exact integer sufficient statistics, one IEEE dag readout
    "graph_assortativity" -> ((s, d) => {
      graft.operators.Graph.assortativity(tradeEdges(s, d), "src", "dst")
    }),

    // modularity of the NATION partition on the trade graph — the
    // community-quality score for a domain-given assignment, held as
    // the exact integer rational Q = sum_g(intra_g*M - d_g^2) / M^2
    "graph_modularity" -> ((s, d) => {
      val cust = Tables.customer(s, d)
        .select((col("c_custkey") * 2).as("node"),
          col("c_nationkey").as("grp"))
      val sup = Tables.supplier(s, d)
        .select((col("s_suppkey") * 2 + 1).as("node"),
          col("s_nationkey").as("grp"))
      graft.operators.Graph.modularity(tradeEdges(s, d), "src", "dst",
        cust.unionByName(sup))
    }),

    // bipartite projection of the user->event_type graph onto the item
    // side: co-occurrence weights (the item-item edge list behind
    // co-view recommenders), hub keys capped BEFORE the quadratic pair
    // fan-out — the projection's classic bot-session hazard
    "graph_bipartite_project" -> ((s, d) => {
      graft.operators.Graph.bipartiteProject(Tables.events(s, d),
          col("user_id"), col("event_type"), maxPerKey = 10)
        .orderBy(col("item_a"), col("item_b"))
    }),

    // exact triangle census of the part co-purchase graph (parts joined
    // when they appear in the same order) — naturally sparse (~0.6%
    // density at sf0.1, vs the complete co-supplier graph) and growing
    // with SF. Degree-ordered O(m^1.5) wedge join in the engine, naive
    // a<b<c three-way join in the oracle: same count by construction
    "graph_triangles" -> ((s, d) => {
      graft.operators.Graph.triangleCount(coBuyEdges(s, d), "p1", "p2",
        edgesCanonical = true)
    }),

    // per-node triangle counts + local clustering coefficient on the
    // same co-purchase graph (the trade graph is bipartite — no odd
    // cycles, so its triangle census is degenerately zero). lcc is one
    // double division over exact integers: IEEE-bit-identical to the
    // DuckDB oracle
    "graph_tri_stats" -> ((s, d) => {
      graft.operators.Graph.triangleStats(coBuyEdges(s, d), "p1", "p2",
        edgesCanonical = true).orderBy(col("node"))
    }),

    // synchronous LPA communities on the symmetrized co-purchase graph;
    // the canonical p1<p2 edge set plus its reversal is distinct by
    // construction, so the operator's dedup shuffle is skipped
    "graph_communities" -> ((s, d) => {
      val sym = coBuyEdges(s, d).select(explode(array(
          struct(col("p1").as("src"), col("p2").as("dst")),
          struct(col("p2").as("src"), col("p1").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      graft.operators.Graph.labelPropagation(sym, "src", "dst", LpaIters,
        edgesDistinct = true).orderBy(col("node"))
    }),

    // common-neighbor link prediction over the REPEAT co-purchase graph
    // (pairs co-bought in >= 2 orders — the frequent-itemset edge set):
    // top-20 part pairs that share the most co-purchase partners but
    // were never co-bought themselves — "customers also bought"
    "graph_link_predict" -> ((s, d) => {
      // same pre-distinct -> plain-count rewrite as
      // graph_pagerank_weighted (triples unique after the dedup)
      // same one-exchange-on-o layout as graph_pagerank_weighted (r11)
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .repartition(col("o"))
        .distinct()
      val a = li.select(col("o"), col("p").as("p1"))
      val b = li.select(col("o").as("o2"), col("p").as("p2"))
      val repeat = a.join(b,
          col("o") === col("o2") && col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2).select(col("p1"), col("p2"))
      graft.operators.Graph.linkPredict(repeat, "p1", "p2", k = 20,
        edgesCanonical = true)
    }),

    // 36-core of the trade graph: keep only customers/suppliers still
    // trading with >= 36 dense counterparties after iterative peeling
    // (652 of 1600 nodes at sf0.01). The symmetrized input collapses
    // back to canonical form in the operator's normalization pass
    "graph_kcore" -> ((s, d) => {
      graft.operators.Graph.kCore(tradeEdges(s, d), "src", "dst",
        k = KCoreK, maxRounds = KCoreRounds).orderBy(col("node"))
    }),

    // pairwise association rules over order baskets: support >= 2
    // co-purchases promoted to directed rules ranked by exact
    // fixed-point lift (decimal(38) products, floor-divided thousandths)
    "basket_rules" -> ((s, d) => {
      graft.operators.Itemsets.pairRules(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey", minSupport = 2, topK = 20)
    }),

    // multi-source BFS over the symmetrized trade graph: hop distance
    // from nation 0's suppliers, capped at 4 — the oracle replays the
    // frontier expansion as a hop-bounded recursive CTE + MIN(hop)
    "graph_shortest_hops" -> ((s, d) => {
      val seeds = Tables.supplier(s, d)
        .filter(col("s_nationkey") === 0)
        .select((col("s_suppkey") * 2 + 1).as("seed"))
      graft.operators.Graph.shortestHops(tradeEdges(s, d), "src", "dst",
          seeds, "seed", maxHops = BfsHops)
        .orderBy(col("node"))
    }),

    // hop-bounded closeness centrality for three seed suppliers: one
    // labeled multi-source BFS, the statistic an exact (reached, hops)
    // rational per seed
    "graph_closeness_seeds" -> ((s, d) => {
      val seeds = Tables.supplier(s, d)
        .filter(col("s_suppkey") <= 3)
        .select((col("s_suppkey") * 2 + 1).as("seed"))
      graft.operators.Graph.closenessSeeds(tradeEdges(s, d), "src",
          "dst", seeds, "seed", maxHops = BfsHops)
        .orderBy(col("seed"))
    }),

    // hop-bounded WEIGHTED cheapest paths (Bellman-Ford): integer edge
    // costs, exact min-cost over paths of <= BfsHops edges — the oracle
    // reproduces the identical semantics as a hop-bounded recursive CTE
    "graph_cheapest_paths" -> ((s, d) => {
      val seeds = Tables.supplier(s, d)
        .filter(col("s_nationkey") === 0)
        .select((col("s_suppkey") * 2 + 1).as("seed"))
      graft.operators.Graph.cheapestPaths(weightedTradeEdges(s, d),
          "src", "dst", "w", seeds, "seed", maxHops = BfsHops)
        .orderBy(col("node"))
    }),

    // structural node similarity: exact fixed-point neighbor-set
    // Jaccard over the symmetrized trade graph, top 20 pairs — the
    // normalized cousin of graph_link_predict's raw common counts.
    // Center cap 100 keeps the wedge stream off the ~230-degree
    // supplier hubs (36 s -> sub-second at sf0.1); the oracle
    // replicates the cap, so the gate stays exact
    "graph_jaccard_neighbors" -> ((s, d) => {
      graft.operators.Graph.neighborJaccard(tradeEdges(s, d),
        "src", "dst", minCommon = 2, k = 20, maxCenterDegree = 100)
    }),

    // the HUB-SCALE neighbor-similarity tier (round-7 item 4): MinHash
    // signatures over neighbor SETS + banded bucket join + exact integer
    // verify — no wedge enumeration, so hub degree never goes quadratic.
    // The perms are deterministic integer arithmetic over node ids, so
    // the oracle replays the banding bit-for-bit: FULLY oracle-checked
    // even though candidates are LSH-found
    "graph_jaccard_minhash" -> ((s, d) => {
      graft.operators.Graph.neighborJaccardMinHash(tradeEdges(s, d),
        "src", "dst", minCommon = 2, tauX1e6 = 500000L,
        perms = JmhPerms, bands = JmhBands, maxBucket = JmhMaxBucket)
    }),

    // DeepWalk corpus: 2 hash-driven truncated walks of 4 steps from
    // every node — each step a deterministic md5 draw over the
    // dst-sorted adjacency, so the oracle replays every walk exactly
    "graph_random_walks" -> ((s, d) => {
      graft.operators.Graph.randomWalks(tradeEdges(s, d), "src", "dst",
          WalkLen, WalksPerNode, edgesDistinct = true)
        .orderBy(col("start"), col("rep"), col("step"))
    }),

    // the walks' skip-gram training pairs: symmetric (center, context)
    // co-occurrence counts within a +-2 window along each walk
    "graph_walk_skipgrams" -> ((s, d) => {
      val walks = graft.operators.Graph.randomWalks(tradeEdges(s, d),
        "src", "dst", WalkLen, WalksPerNode, edgesDistinct = true)
      graft.operators.Graph.walkSkipGrams(walks, SkipWindow)
        .orderBy(col("center"), col("context"))
    })
  )

  private val CoBuyCte =
    """e AS (
      |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
      |  FROM lineitem x JOIN lineitem y
      |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      |)""".stripMargin

  val JmhPerms = 16
  val JmhBands = 8
  val JmhMaxBucket = 200

  /** DuckDB replay of [[graft.operators.Graph.neighborJaccardMinHash]]'s
    * banding: same Carter-Wegman constants, same band keys, same exact
    * verify — the approximate tier is oracle-checked END-TO-END because
    * nothing in it is engine-specific. */
  private lazy val jaccardMinhashOracle: String = {
    val P = graft.functions.SketchUtil.MinhashP
    val rows = JmhPerms / JmhBands
    val sigExprs = (0 until JmhPerms).map { i =>
      val (a, b) = graft.functions.SketchUtil.minhashPerm(i)
      s"list_min(list_transform(nbrs, n -> ((n % $P) * $a + $b) % $P))"
    }
    val bandSelects = (0 until JmhBands).map { bd =>
      val key = (0 until rows).map(r => s"CAST(s[${bd * rows + r + 1}] " +
        "AS VARCHAR)").mkString(" || ':' || ")
      s"SELECT node, $bd AS band, $key AS key FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH $EdgesCte,
       |adj AS (
       |  SELECT src AS node, list_sort(list(DISTINCT dst)) AS nbrs,
       |    CAST(COUNT(DISTINCT dst) AS BIGINT) AS deg
       |  FROM e GROUP BY src),
       |sig AS (
       |  SELECT node, [${sigExprs.mkString(",\n    ")}] AS s
       |  FROM adj),
       |banded AS (
       |  $bandSelects),
       |cool AS (
       |  SELECT band, key FROM banded GROUP BY band, key
       |  HAVING COUNT(*) <= $JmhMaxBucket),
       |kept AS (
       |  SELECT b.* FROM banded b JOIN cool USING (band, key)),
       |cand AS (
       |  SELECT DISTINCT x.node AS a, y.node AS b
       |  FROM kept x JOIN kept y
       |    ON x.band = y.band AND x.key = y.key AND x.node < y.node),
       |verified AS (
       |  SELECT c.a, c.b,
       |    CAST(len(list_intersect(na.nbrs, nb.nbrs)) AS BIGINT)
       |      AS n_common,
       |    na.deg AS deg_a, nb.deg AS deg_b
       |  FROM cand c
       |  JOIN adj na ON na.node = c.a
       |  JOIN adj nb ON nb.node = c.b)
       |SELECT a, b, n_common, deg_a, deg_b,
       |  CAST(n_common * 1000000 // (deg_a + deg_b - n_common) AS BIGINT)
       |    AS jaccard_x1e6
       |FROM verified
       |WHERE n_common >= 2
       |  AND n_common * 1000000 // (deg_a + deg_b - n_common) >= 500000
       |ORDER BY jaccard_x1e6 DESC, a, b""".stripMargin
  }

  private val EdgesCte =
    """ep AS (
      |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |), e AS (
      |  SELECT src, dst FROM ep
      |  UNION
      |  SELECT dst AS src, src AS dst FROM ep
      |)""".stripMargin

  /** One unrolled power iteration: prev CTE -> next CTE. Mirrors
    * operators.Graph.pageRank's update rule exactly (all `//` floor
    * divisions on non-negative bigints = Spark `div`); the CAST pins
    * DuckDB's HUGEINT sum widening back to the bigint the engine
    * carries. `contrib` is the per-edge flow term — unweighted rank
    * share by default, (rank * w) // strength for the weighted gate. */
  private def iterCte(prev: String, next: String,
      contrib: String = "r.rank // ew.od",
      tpSql: String =
        "(15 * (1000000000000 // (SELECT n FROM nn))) // 100"): String =
    s"""$next AS (
       |  SELECT n.node, CAST(
       |      $tpSql
       |      + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS rank
       |  FROM nodes n LEFT JOIN (
       |    SELECT ew.dst AS node, SUM($contrib) AS s
       |    FROM ew JOIN $prev r ON r.node = ew.src
       |    GROUP BY ew.dst
       |  ) s ON s.node = n.node
       |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "graph_jaccard_minhash" -> jaccardMinhashOracle,

    "graph_jaccard_neighbors" ->
      s"""WITH $EdgesCte,
         |deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
         |  FROM e GROUP BY src),
         |ce AS (SELECT e.* FROM e JOIN deg ON deg.node = e.src
         |  WHERE deg.deg <= 100),
         |cmn AS (
         |  SELECT x.dst AS a, y.dst AS b,
         |    CAST(COUNT(*) AS BIGINT) AS n_common
         |  FROM ce x JOIN ce y ON x.src = y.src AND x.dst < y.dst
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
         |SELECT a, b, n_common, da.deg AS deg_a, db.deg AS deg_b,
         |  CAST(n_common * 1000000
         |    // (da.deg + db.deg - n_common) AS BIGINT) AS jaccard_x1e6
         |FROM cmn JOIN deg da ON da.node = a JOIN deg db ON db.node = b
         |ORDER BY jaccard_x1e6 DESC, a, b LIMIT 20""".stripMargin,

    "graph_random_walks" ->
      s"""WITH $walkCtes
         |SELECT start, rep, step, node FROM walk
         |ORDER BY start, rep, step""".stripMargin,

    "graph_walk_skipgrams" ->
      s"""WITH $walkCtes,
         |pr AS (
         |  SELECT a.node AS center, b.node AS context
         |  FROM walk a JOIN walk b
         |    ON a.start = b.start AND a.rep = b.rep
         |    AND b.step BETWEEN a.step + 1 AND a.step + $SkipWindow
         |  UNION ALL
         |  SELECT b.node AS center, a.node AS context
         |  FROM walk a JOIN walk b
         |    ON a.start = b.start AND a.rep = b.rep
         |    AND b.step BETWEEN a.step + 1 AND a.step + $SkipWindow
         |)
         |SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n_cooc
         |FROM pr GROUP BY 1, 2
         |ORDER BY center, context""".stripMargin,

    "basket_rules" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
        |ic AS (SELECT it, COUNT(*) AS n FROM b GROUP BY it),
        |nt AS (SELECT COUNT(DISTINCT bk) AS n_total FROM b),
        |p AS (
        |  SELECT x.it AS a, y.it AS c, COUNT(*) AS n_both
        |  FROM b x JOIN b y ON x.bk = y.bk AND x.it <> y.it
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT p.a AS antecedent, p.c AS consequent,
        |  CAST(p.n_both AS BIGINT) AS n_both,
        |  ia.n AS n_ante, iz.n AS n_cons, nt.n_total AS n_total,
        |  CAST(p.n_both * 1000 // ia.n AS BIGINT) AS conf_x1000,
        |  CAST((CAST(p.n_both AS HUGEINT) * nt.n_total * 1000)
        |    // (CAST(ia.n AS HUGEINT) * iz.n) AS BIGINT) AS lift_x1000
        |FROM p JOIN ic ia ON ia.it = p.a JOIN ic iz ON iz.it = p.c, nt
        |ORDER BY lift_x1000 DESC, conf_x1000 DESC, antecedent, consequent
        |LIMIT 20""".stripMargin,

    "graph_shortest_hops" ->
      s"""WITH RECURSIVE ep AS (
         |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |), e AS (
         |  SELECT src, dst FROM ep
         |  UNION
         |  SELECT dst AS src, src AS dst FROM ep
         |), walk(node, hop) AS (
         |  SELECT CAST(s_suppkey * 2 + 1 AS BIGINT), 0
         |  FROM supplier WHERE s_nationkey = 0
         |  UNION
         |  SELECT e.dst, w.hop + 1 FROM walk w
         |  JOIN e ON e.src = w.node WHERE w.hop < $BfsHops
         |)
         |SELECT node, CAST(MIN(hop) AS BIGINT) AS hops
         |FROM walk GROUP BY node ORDER BY node""".stripMargin,

    // hop-bounded weighted closure: the walk carries (node, cost, hop);
    // small integer weights bound distinct cost values, keeping the
    // closure O(V * maxCost * hops) rows
    "graph_cheapest_paths" ->
      s"""WITH RECURSIVE ep AS (
         |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
         |    (o_custkey + l_suppkey) % 5 + 1 AS w
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |), e AS (
         |  SELECT src, dst, w FROM ep
         |  UNION
         |  SELECT dst AS src, src AS dst, w FROM ep
         |), walk(node, cost, hop) AS (
         |  SELECT CAST(s_suppkey * 2 + 1 AS BIGINT), CAST(0 AS BIGINT), 0
         |  FROM supplier WHERE s_nationkey = 0
         |  UNION
         |  SELECT e.dst, w.cost + e.w, w.hop + 1 FROM walk w
         |  JOIN e ON e.src = w.node WHERE w.hop < $BfsHops
         |)
         |SELECT node, MIN(cost) AS cost
         |FROM walk GROUP BY node ORDER BY node""".stripMargin,

    "graph_pagerank" -> {
      val iters = (1 to Iters)
        .map(i => iterCte(s"r${i - 1}", s"r$i")).mkString(",\n")
      s"""WITH $EdgesCte,
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |nn AS (SELECT COUNT(*) AS n FROM nodes),
         |deg AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),
         |ew AS (SELECT e.src, e.dst, d.od FROM e JOIN deg d ON d.src = e.src),
         |r0 AS (
         |  SELECT node,
         |    CAST(1000000000000 // (SELECT n FROM nn) AS BIGINT) AS rank
         |  FROM nodes),
         |$iters
         |SELECT node, rank FROM r$Iters ORDER BY node""".stripMargin
    },

    // same unrolled iterations with the teleport term concentrated on
    // the seed set; init rank = Scale div |seeds| on seeds else 0
    "graph_ppr_seeded" -> {
      val seedList = PprSeeds.mkString(", ")
      val k = PprSeeds.size
      val tp = s"(CASE WHEN n.node IN ($seedList) " +
        s"THEN (15 * (1000000000000 // $k)) // 100 ELSE 0 END)"
      val iters = (1 to Iters)
        .map(i => iterCte(s"r${i - 1}", s"r$i", tpSql = tp)).mkString(",\n")
      s"""WITH $EdgesCte,
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |nn AS (SELECT COUNT(*) AS n FROM nodes),
         |deg AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),
         |ew AS (SELECT e.src, e.dst, d.od FROM e JOIN deg d ON d.src = e.src),
         |r0 AS (
         |  SELECT node,
         |    CAST(CASE WHEN node IN ($seedList)
         |      THEN 1000000000000 // $k ELSE 0 END AS BIGINT) AS rank
         |  FROM nodes),
         |$iters
         |SELECT node, rank FROM r$Iters ORDER BY node""".stripMargin
    },

    // every L1-normalized half-round unrolled; hugeint // matches the
    // operator's nonnegative decimal floor division bit-for-bit.
    // Every stage is AS MATERIALIZED: each level is referenced more
    // than once (join + total), and DuckDB's default CTE inlining
    // re-evaluates per reference — ~3^(2*iters) base-join blowup
    // without it (measured: minutes vs milliseconds)
    "graph_hits" -> {
      val sc = graft.operators.Graph.Scale
      val rounds = (1 to HitsIters).map { i =>
        val hp = if (i == 1) "h0" else s"h${i - 1}"
        s"""a${i}raw AS MATERIALIZED (
           |  SELECT e.dst AS node, SUM(h.hub) AS s
           |  FROM e JOIN $hp h ON h.node = e.src GROUP BY e.dst),
           |a$i AS MATERIALIZED (
           |  SELECT n.node, (COALESCE(r.s, 0) * $sc)
           |    // (SELECT SUM(s) FROM a${i}raw) AS auth
           |  FROM nodes n LEFT JOIN a${i}raw r ON r.node = n.node),
           |h${i}raw AS MATERIALIZED (
           |  SELECT e.src AS node, SUM(a.auth) AS s
           |  FROM e JOIN a$i a ON a.node = e.dst GROUP BY e.src),
           |h$i AS MATERIALIZED (
           |  SELECT n.node, (COALESCE(r.s, 0) * $sc)
           |    // (SELECT SUM(s) FROM h${i}raw) AS hub
           |  FROM nodes n LEFT JOIN h${i}raw r ON r.node = n.node)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |nodes AS MATERIALIZED (
         |  SELECT src AS node FROM e UNION SELECT dst FROM e),
         |h0 AS MATERIALIZED (
         |  SELECT node, CAST($sc AS HUGEINT) AS hub FROM nodes),
         |$rounds
         |SELECT a.node, CAST(a.auth AS BIGINT) AS auth,
         |  CAST(h.hub AS BIGINT) AS hub
         |FROM a$HitsIters a JOIN h$HitsIters h ON a.node = h.node
         |ORDER BY a.node""".stripMargin
    },

    "graph_triangles" ->
      s"""WITH $CoBuyCte, nn AS (
        |  SELECT COUNT(*) AS n_nodes FROM
        |    (SELECT a AS v FROM e UNION SELECT b FROM e)
        |), ne AS (SELECT COUNT(*) AS n_edges FROM e),
        |nt AS (
        |  SELECT COUNT(*) AS n_triangles FROM e e1
        |  JOIN e e2 ON e2.a = e1.b
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        |)
        |SELECT n_nodes, n_edges, n_triangles FROM nn, ne, nt""".stripMargin,

    "graph_tri_stats" ->
      s"""WITH $CoBuyCte, deg AS (
        |  SELECT node, COUNT(*) AS d FROM
        |    (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        |  GROUP BY node
        |), t AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM e e1
        |  JOIN e e2 ON e2.a = e1.b
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        |), tc AS (
        |  SELECT node, COUNT(*) AS n_tri FROM (
        |    SELECT x AS node FROM t
        |    UNION ALL SELECT y FROM t
        |    UNION ALL SELECT z FROM t)
        |  GROUP BY node
        |)
        |SELECT deg.node, deg.d AS degree,
        |  COALESCE(tc.n_tri, 0) AS n_tri,
        |  CASE WHEN deg.d < 2 THEN CAST(0 AS DOUBLE)
        |    ELSE CAST(COALESCE(tc.n_tri, 0) * 2 AS DOUBLE)
        |      / CAST(deg.d * (deg.d - 1) AS DOUBLE) END AS lcc
        |FROM deg LEFT JOIN tc ON tc.node = deg.node
        |ORDER BY deg.node""".stripMargin,

    "graph_communities" -> {
      // one unrolled LPA round: count in-neighbor labels, pick
      // (count desc, label asc), keep the old label when isolated —
      // mirrors operators.Graph.labelPropagation exactly
      def round(i: Int): String = {
        val (p, c, pk, l) = (s"l${i - 1}", s"c$i", s"p$i", s"l$i")
        s"""$c AS (
           |  SELECT es.dst AS node, l.lab, COUNT(*) AS c
           |  FROM es JOIN $p l ON l.node = es.src
           |  GROUP BY es.dst, l.lab
           |), $pk AS (
           |  SELECT node, lab FROM (
           |    SELECT node, lab, ROW_NUMBER() OVER
           |      (PARTITION BY node ORDER BY c DESC, lab) AS rn
           |    FROM $c)
           |  WHERE rn = 1
           |), $l AS (
           |  SELECT n.node, COALESCE(p.lab, n.lab) AS lab
           |  FROM $p n LEFT JOIN $pk p ON p.node = n.node
           |)""".stripMargin
      }
      val rounds = (1 to LpaIters).map(round).mkString(",\n")
      s"""WITH $CoBuyCte,
         |es AS (SELECT a AS src, b AS dst FROM e
         |       UNION ALL SELECT b, a FROM e),
         |nodes AS (SELECT DISTINCT src AS node FROM es),
         |l0 AS (SELECT node, node AS lab FROM nodes),
         |$rounds
         |SELECT node, lab AS community FROM l$LpaIters
         |ORDER BY node""".stripMargin
    },

    "graph_pagerank_weighted" -> {
      val iters = (1 to Iters)
        .map(i => iterCte(s"r${i - 1}", s"r$i",
          contrib = "(r.rank * ew.w) // ew.od")).mkString(",\n")
      s"""WITH ew0 AS MATERIALIZED (
         |  SELECT x.l_partkey AS a, y.l_partkey AS b,
         |    COUNT(DISTINCT x.l_orderkey) AS w
         |  FROM lineitem x JOIN lineitem y
         |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
         |  GROUP BY 1, 2
         |), e AS (
         |  SELECT a AS src, b AS dst, w FROM ew0
         |  UNION ALL SELECT b, a, w FROM ew0
         |),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |nn AS (SELECT COUNT(*) AS n FROM nodes),
         |deg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS od
         |        FROM e GROUP BY src),
         |ew AS MATERIALIZED (
         |  SELECT e.src, e.dst, e.w, d.od
         |  FROM e JOIN deg d ON d.src = e.src),
         |r0 AS (
         |  SELECT node,
         |    CAST(1000000000000 // (SELECT n FROM nn) AS BIGINT) AS rank
         |  FROM nodes),
         |$iters
         |SELECT node, rank FROM r$Iters ORDER BY node""".stripMargin
    },

    "graph_link_predict" ->
      """WITH ee AS MATERIALIZED (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2 HAVING COUNT(DISTINCT x.l_orderkey) >= 2
        |), es AS (
        |  SELECT a AS u, b AS v FROM ee UNION ALL SELECT b, a FROM ee
        |), w AS (
        |  SELECT e1.v AS v1, e2.v AS v2, COUNT(*) AS common
        |  FROM es e1 JOIN es e2 ON e1.u = e2.u AND e1.v < e2.v
        |  GROUP BY 1, 2
        |)
        |SELECT v1, v2, common FROM w
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM ee WHERE ee.a = w.v1 AND ee.b = w.v2)
        |ORDER BY common DESC, v1, v2 LIMIT 20""".stripMargin,

    "graph_kcore" -> {
      // one unrolled peel round; trailing rounds past the fixpoint are
      // no-ops, which is exactly the operator's early-exit contract.
      // Each e$i is MATERIALIZED: every round references its
      // predecessor three times, so inlined CTEs would expand 3^R
      // scans of the base tables (DuckDB runs out of file handles)
      def peel(i: Int): String =
        s"""d$i AS (
           |  SELECT node, COUNT(*) AS d FROM
           |    (SELECT a AS node FROM e${i - 1}
           |     UNION ALL SELECT b FROM e${i - 1})
           |  GROUP BY node
           |), k$i AS (SELECT node FROM d$i WHERE d >= $KCoreK),
           |e$i AS MATERIALIZED (
           |  SELECT a, b FROM e${i - 1}
           |  WHERE a IN (SELECT node FROM k$i)
           |    AND b IN (SELECT node FROM k$i)
           |)""".stripMargin
      val rounds = (1 to KCoreRounds).map(peel).mkString(",\n")
      s"""WITH $EdgesCte,
         |e0 AS MATERIALIZED (
         |  SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
         |  FROM ep),
         |$rounds
         |SELECT node, COUNT(*) AS core_deg FROM
         |  (SELECT a AS node FROM e$KCoreRounds
         |   UNION ALL SELECT b FROM e$KCoreRounds)
         |GROUP BY node ORDER BY node""".stripMargin
    },

    "graph_closeness_seeds" ->
      s"""WITH RECURSIVE ep AS (
         |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |), e AS (
         |  SELECT src, dst FROM ep
         |  UNION
         |  SELECT dst AS src, src AS dst FROM ep
         |), walk(seed, node, hop) AS (
         |  SELECT CAST(s_suppkey * 2 + 1 AS BIGINT),
         |    CAST(s_suppkey * 2 + 1 AS BIGINT), 0
         |  FROM supplier WHERE s_suppkey <= 3
         |  UNION
         |  SELECT w.seed, e.dst, w.hop + 1 FROM walk w
         |  JOIN e ON e.src = w.node WHERE w.hop < $BfsHops
         |), dist AS (
         |  SELECT seed, node, MIN(hop) AS hops
         |  FROM walk GROUP BY seed, node)
         |SELECT seed, CAST(COUNT(*) - 1 AS BIGINT) AS n_reached,
         |  CAST(SUM(hops) AS BIGINT) AS sum_hops,
         |  CASE WHEN SUM(hops) > 0 THEN
         |    CAST(COUNT(*) - 1 AS DOUBLE) / CAST(SUM(hops) AS DOUBLE)
         |  END AS closeness
         |FROM dist GROUP BY seed ORDER BY seed""".stripMargin,

    "graph_assortativity" ->
      s"""WITH $EdgesCte,
         |deg AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY 1),
         |wd AS (SELECT dx.deg AS x, dy.deg AS y
         |  FROM e JOIN deg dx ON dx.node = e.src
         |  JOIN deg dy ON dy.node = e.dst),
         |s AS (SELECT COUNT(*) AS m,
         |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
         |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
         |    SUM(CAST(y AS HUGEINT) * y) AS syy
         |  FROM wd),
         |f AS (SELECT m,
         |    CAST(CAST(CAST(m AS HUGEINT) * sxy - sx * sy AS VARCHAR)
         |      AS DOUBLE) AS num,
         |    CAST(CAST(CAST(m AS HUGEINT) * sxx - sx * sx AS VARCHAR)
         |      AS DOUBLE) AS varx,
         |    CAST(CAST(CAST(m AS HUGEINT) * syy - sy * sy AS VARCHAR)
         |      AS DOUBLE) AS vary
         |  FROM s)
         |SELECT m AS m_edges, num, varx, vary,
         |  CASE WHEN varx > 0 AND vary > 0
         |    THEN num / (SQRT(varx) * SQRT(vary)) END AS assortativity
         |FROM f""".stripMargin,

    "graph_modularity" ->
      s"""WITH $EdgesCte,
         |a AS (SELECT c_custkey * 2 AS node, c_nationkey AS grp
         |    FROM customer
         |  UNION ALL
         |  SELECT s_suppkey * 2 + 1, s_nationkey FROM supplier),
         |wg AS (SELECT ga.grp AS gs, gb.grp AS gd
         |  FROM e JOIN a ga ON ga.node = e.src
         |  JOIN a gb ON gb.node = e.dst),
         |m AS (SELECT COUNT(*) AS m_edges FROM wg),
         |dsum AS (SELECT gs AS grp, COUNT(*) AS d FROM wg GROUP BY 1),
         |intra AS (SELECT gs AS grp, COUNT(*) AS i FROM wg
         |  WHERE gs = gd GROUP BY 1),
         |terms AS (SELECT CAST(COALESCE(i.i, 0) AS HUGEINT) * m.m_edges
         |    - CAST(d.d AS HUGEINT) * d.d AS t
         |  FROM dsum d LEFT JOIN intra i ON i.grp = d.grp CROSS JOIN m)
         |SELECT m.m_edges,
         |  (SELECT COUNT(*) FROM dsum) AS n_groups,
         |  CAST((SELECT SUM(t) FROM terms) AS BIGINT) AS q_num,
         |  CAST(CAST(m.m_edges AS HUGEINT) * m.m_edges AS BIGINT) AS q_den,
         |  CAST(CAST((SELECT SUM(t) FROM terms) AS VARCHAR) AS DOUBLE)
         |    / CAST(CAST(CAST(m.m_edges AS HUGEINT) * m.m_edges
         |        AS VARCHAR) AS DOUBLE) AS modularity
         |FROM m""".stripMargin,

    "graph_bipartite_project" ->
      """WITH pairs AS (
        |  SELECT DISTINCT user_id AS k, event_type AS i FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |deg AS (SELECT k, COUNT(*) AS d FROM pairs GROUP BY k),
        |kept AS (SELECT pairs.k, pairs.i FROM pairs
        |  JOIN deg ON deg.k = pairs.k WHERE deg.d <= 10)
        |SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS n_keys
        |FROM kept a JOIN kept b ON a.k = b.k AND a.i < b.i
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "graph_degrees" ->
      s"""WITH $EdgesCte,
         |od AS (SELECT src AS node, COUNT(*) AS out_deg FROM e GROUP BY src),
         |id AS (SELECT dst AS node, COUNT(*) AS in_deg FROM e GROUP BY dst)
         |SELECT COALESCE(od.node, id.node) AS node,
         |  COALESCE(out_deg, 0) AS out_deg, COALESCE(in_deg, 0) AS in_deg
         |FROM od FULL OUTER JOIN id ON od.node = id.node
         |ORDER BY node""".stripMargin
  )
}
