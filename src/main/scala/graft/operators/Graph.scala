package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge DataFrames.
  *
  * The reference has no graph surface (its `querySql` passthrough could at
  * most push a recursive CTE to the DBMS — reference
  * database/dbms/reader/parameter.go:94-101); in a training-data pipeline,
  * link-graph centrality ranks crawl frontiers and duplicates-cluster
  * canonicals. Sibling of Dedup.connectedComponents (same iterative
  * one-action-per-round discipline).
  *
  * PageRank here is FIXED-POINT INTEGER arithmetic: ranks are bigint
  * multiples of 1/SCALE, every division is an integral floor division, so
  * the result is bit-identical in any engine and under any partitioning —
  * the same determinism trick as the md5-nibble samplers and the quantized
  * cosine (double-based PageRank cannot be oracle-checked exactly: the
  * per-node contribution sum is order-dependent in IEEE arithmetic).
  */
object Graph {
  val Scale: Long = 1000000000000L // ranks are multiples of 1e-12

  /** Damped PageRank with `iters` synchronous power iterations.
    *
    * rank_0(v)   = SCALE div N
    * rank_i+1(v) = (15 * (SCALE div N)) div 100
    *             + (85 * sum_{(u,v) in E} (rank_i(u) div outdeg(u))) div 100
    *
    * (d = 0.85 as 85/100; all `div` are integral floor divisions on
    * non-negative values, so Spark `div` and DuckDB `//` agree exactly.)
    *
    * Dangling mass: a node with no out-edges keeps receiving rank but
    * redistributes none (its mass leaks, the common simplification) —
    * callers that need a strongly-connected input should symmetrize edges
    * first, as the trade-graph gate query does.
    *
    * Scale posture: each iteration is ONE shuffle join (edges x ranks on
    * src) + ONE aggregation (sum by dst) — the textbook shape; the node
    * count enters the plan as a broadcast 1-row scalar, never a driver
    * value; lineage is cut per iteration with localCheckpoint so the
    * 10-iteration plan does not nest 10 joins deep. Edge dedup + degree
    * are computed once and cached across iterations.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters=$iters out of [1,100]")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    // dst-only nodes (dangling: inflow but no outflow) still rank
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    // broadcast scalars: N and the per-node teleport term
    val nn = broadcast(nodes.agg(count(lit(1)).as("n")))
    // edges pre-joined with out-degree, reused every iteration
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val ew = e.join(deg, "src").cache()
    try {
      var ranks = nodes.crossJoin(nn)
        .select(col("node"), expr(s"$Scale div n").as("rank"))
        .localCheckpoint()
      var i = 0
      while (i < iters) {
        val sums = ew.join(ranks, ew("src") === ranks("node"))
          .select(col("dst"), expr("rank div od").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("s"))
        ranks = nodes.crossJoin(nn)
          .join(sums, nodes("node") === sums("dst"), "left")
          .select(col("node"),
            expr(s"(15 * ($Scale div n)) div 100" +
              s" + (85 * coalesce(s, 0L)) div 100").as("rank"))
          .localCheckpoint()
        i += 1
      }
      ranks
    } finally { ew.unpersist(); nodes.unpersist() }
  }

  /** In/out degree per node — the cheap first look at any edge table. */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
      .join(e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg")),
        Seq("node"), "full_outer")
      .select(col("node"), coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }
}
