package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial distance joins on integer planar coordinates.
  *
  * The reference delegates every join to the backing DBMS (querySql
  * passthrough, `/root/reference/database/dbms/reader/parameter.go:94-101`);
  * a distance-threshold ("epsilon") join is the canonical spatial case a
  * 100 TB pipeline meets (dedup of geotagged records, neighbor features,
  * map-matching candidates). The naive form is an O(n^2) cross join — a
  * non-starter at scale. This operator is the textbook GRID-BLOCKED
  * epsilon join: partition the plane into r x r cells, replicate ONE side
  * of the self-join to its 3x3 cell neighborhood, equi-join on the cell
  * key, and verify the exact distance on the candidates. Shuffle cost is
  * O(9n) rows hashed by cell; candidate verification cost is bounded by
  * the point density per cell, never by n^2. A pair within radius r can
  * never span more than one cell boundary per axis, so the 3x3
  * neighborhood is exhaustive (no recall loss) and each unordered pair
  * meets exactly once (the left row sits in its own cell; the right
  * row's nine replicas contain that cell exactly once).
  *
  * Coordinates are integers and the predicate is on SQUARED distance —
  * every comparison is exact int64 arithmetic, so results are
  * bit-identical across engines/partitionings (fully oracle-checkable,
  * unlike float-haversine forms whose last-ulp differs across libm
  * implementations). Callers with float coords quantize first (one
  * multiply) — standard practice for geohash/S2-style cell schemes.
  *
  * 100 TB posture: one shuffle each side (hash by packed cell key), 9x
  * replication of the probe side only, exact verify inside the join —
  * no cartesian anywhere (plan-guarded in SpatialSpec). Dense hot cells
  * (city centers) are ordinary join skew: AQE skew-join splits them, or
  * pre-salt the cell key like SkewJoin does.
  */
object Spatial {

  /** Pack a 2-d cell index into one long join key. Cell indices are
    * |x|/r + 1 bounded; 2^31 headroom per axis keeps the pack injective
    * for any realistic plane. */
  private def cellKey(cx: Column, cy: Column): Column =
    cx * lit(1L << 32) + cy

  /** Packed key of the r-cell CONTAINING (x, y) — the probe key for
    * [[neighborhoodIndex]]. Non-negative integer coords. */
  def cellKeyOf(x: Column, y: Column, r: Long): Column = {
    def cellOf(c: Column): Column =
      ((c.cast("long") - pmod(c.cast("long"), lit(r))) / lit(r))
        .cast("long")
    cellKey(cellOf(x), cellOf(y))
  }

  /** Static 3x3-neighborhood population index: for every cell, the
    * number of `points` anywhere in that cell's 3x3 neighborhood —
    * i.e. probing [[cellKeyOf]] of a location answers "how many indexed
    * points are within one r-cell of me" with ONE stateless equi-join
    * lookup (the streaming-enrichment form of the grid join: the index
    * is a bounded static table, the probe side needs no state). Built
    * by the same 9-cell replication as [[gridWithinJoin]]'s probe side,
    * then one count per cell. */
  def neighborhoodIndex(points: DataFrame, xCol: String, yCol: String,
      r: Long): DataFrame = {
    require(r > 0, s"radius must be positive: $r")
    val offsets = array((for { dx <- -1 to 1; dy <- -1 to 1 }
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    points
      .select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"),
        explode(offsets).as("o"))
      .select((cellKeyOf(col("x"), col("y"), r) +
        col("o.dx") * lit(1L << 32) + col("o.dy")).as("cell"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_nearby"))
  }

  /** All pairs (a, b) with `a.id < b.id` whose squared euclidean
    * distance is <= r^2, via grid blocking. `points` must expose long
    * (or int) columns `idCol`, `xCol`, `yCol` with non-negative coords;
    * output columns: id_a, id_b, dist2 (exact squared distance).
    *
    * Cell side = r exactly: candidates per probe = the 3x3 neighborhood
    * population, the minimum-replication choice that stays exhaustive. */
  def gridWithinJoin(points: DataFrame, idCol: String, xCol: String,
      yCol: String, r: Long): DataFrame = {
    require(r > 0, s"radius must be positive: $r")
    val reserved = Seq("__cx", "__cy", "__cell")
    require(!reserved.exists(points.columns.contains),
      s"input must not contain reserved columns ${reserved.mkString(",")}")
    val base = points.select(col(idCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))

    // exact floor division (Column./ is double division; this subtract-
    // mod form divides an exactly-divisible long, so the double quotient
    // is the exact integer for any |result| < 2^53)
    def cellOf(c: Column): Column =
      ((c - pmod(c, lit(r))) / lit(r)).cast("long")

    // build side: each point once, in its own cell
    val left = base.withColumn("__cell",
      cellKey(cellOf(col("x")), cellOf(col("y"))))

    // probe side: replicated to the 3x3 neighborhood of its own cell —
    // one explode, 9 rows per point, all map-side (no shuffle until the
    // join hashes by the packed key)
    val offsets = array((for { dx <- -1 to 1; dy <- -1 to 1 }
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val right = base
      .select(col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"),
        explode(offsets).as("o"))
      .withColumn("__cell",
        cellKey(cellOf(col("xb")) + col("o.dx"),
          cellOf(col("yb")) + col("o.dy")))
      .drop("o")

    val dx = col("x") - col("xb")
    val dy = col("y") - col("yb")
    left.join(right, Seq("__cell"))
      .filter(col("id") < col("id_b"))
      .withColumn("dist2", dx * dx + dy * dy)
      .filter(col("dist2") <= lit(r * r))
      .select(col("id").as("id_a"), col("id_b"), col("dist2"))
  }

  /** For each point, the count of neighbors within r and the nearest
    * neighbor (smallest dist2, ties to the smallest id) — the DBSCAN
    * core-point / kNN-feature primitive, from one grid pass. Points with
    * no neighbor within r are absent (left-join at the call site if the
    * zero rows matter). */
  def neighborStats(points: DataFrame, idCol: String, xCol: String,
      yCol: String, r: Long): DataFrame = {
    val pairs = gridWithinJoin(points, idCol, xCol, yCol, r)
    // undirect the a<b pairs so every endpoint sees the edge — one
    // map-side explode, not a self-union that would run the grid join
    // twice
    val sym = pairs.select(explode(array(
        struct(col("id_a").as("id"), col("id_b").as("nb"), col("dist2")),
        struct(col("id_b").as("id"), col("id_a").as("nb"), col("dist2"))))
        .as("e"))
      .select(col("e.id").as("id"), col("e.nb").as("nb"),
        col("e.dist2").as("dist2"))
    sym.groupBy(col("id"))
      .agg(count(lit(1)).as("n_neighbors"),
        min(struct(col("dist2"), col("nb"))).as("__nn"))
      .select(col("id"), col("n_neighbors"),
        col("__nn.nb").as("nn_id"), col("__nn.dist2").as("nn_dist2"))
  }

  /** Radius-capped k-nearest-neighbor join: for each point, its k
    * nearest neighbors AMONG those within distance r (rank by exact
    * dist2, ties to the smaller id) — the spatial feature/candidate
    * primitive (map-matching candidates, neighbor feature vectors,
    * geo dedup shortlists). The radius cap is what keeps the operator
    * grid-blockable and the semantics honest at scale: an uncapped kNN
    * would need unbounded ring expansion for isolated points, turning
    * the worst case into a full scan per such point; capped, one 3×3
    * grid pass is exhaustive and the per-point cost is density-bounded.
    *
    * The rank-k cut is a row_number ≤ k filter, which Spark plans as
    * WindowGroupLimit — each shuffle partition pre-trims to k per id
    * before the final sort, so the exchange after the grid join carries
    * O(k·points) rows, not the full eps-graph. Points with no neighbor
    * within r are absent. Output: (id, rank, nb_id, dist2). */
  def knnWithin(points: DataFrame, idCol: String, xCol: String,
      yCol: String, r: Long, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val pairs = gridWithinJoin(points, idCol, xCol, yCol, r)
    // symmetrize in ONE map-side explode pass — a union of pairs with
    // its reversal would execute the grid-join subplan (the dominant
    // stage) twice
    val sym = pairs.select(explode(array(
        struct(col("id_a").as("id"), col("id_b").as("nb"), col("dist2")),
        struct(col("id_b").as("id"), col("id_a").as("nb"), col("dist2"))))
        .as("e"))
      .select(col("e.id").as("id"), col("e.nb").as("nb"),
        col("e.dist2").as("dist2"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
      .orderBy(col("dist2"), col("nb"))
    sym.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("id"), col("rank"), col("nb").as("nb_id"), col("dist2"))
  }

  /** DBSCAN density clustering, composed from the grid epsilon join and
    * the pointer-jumping connected components (Ester et al., KDD 1996 —
    * the distributed formulation is exactly this composition):
    * core points have >= minPts points in their eps-ball (self
    * included); clusters are the connected components of the core-core
    * eps-graph; border points adopt the SMALLEST cluster label among
    * their core neighbors (the deterministic tie rule — textbook DBSCAN
    * leaves border assignment order-dependent, which would be
    * partition-dependent here); everything else is noise.
    *
    * Output: id, cluster (min core id of the component; null for
    * noise), role ('core' | 'border' | 'noise'). All decisions are
    * integer comparisons on exact int64 distances — fully
    * oracle-checkable against a recursive-CTE replay.
    *
    * Scale shape: one grid join (O(9n) shuffle + density-bounded
    * verify), one degree aggregate, CC on the core subgraph (iterative,
    * O(log n) pointer-jumping rounds), one border min-join. No stage
    * ever materializes more than the eps-graph. */
  def dbscan(points: DataFrame, idCol: String, xCol: String, yCol: String,
      eps: Long, minPts: Long): DataFrame = {
    require(minPts >= 1, s"minPts must be >= 1: $minPts")
    val pairs = gridWithinJoin(points, idCol, xCol, yCol, eps)
    val sym = pairs.select(col("id_a").as("id"), col("id_b").as("nb"))
      .unionAll(pairs.select(col("id_b").as("id"), col("id_a").as("nb")))
    val ids = points.select(col(idCol).cast("long").as("id"))
    val deg = sym.groupBy(col("id")).agg(count(lit(1)).as("__deg"))
    val core = ids.join(deg, Seq("id"), "left")
      .filter(coalesce(col("__deg"), lit(0L)) + 1 >= minPts)
      .select(col("id"))
    val coreEdges = sym
      .join(core.select(col("id")), Seq("id"))
      .join(core.select(col("id").as("nb")), Seq("nb"))
      .select(col("id").as("id_a"), col("nb").as("id_b"))
    val comp = Dedup.connectedComponents(
      core.select(col("id").as("node")), coreEdges, "node", "id_a", "id_b")
    val coreOut = comp.select(col("node").as("id"),
      col("component").as("cluster"), lit("core").as("role"))
    val borderOut = sym
      .join(comp.select(col("node").as("nb"), col("component")), Seq("nb"))
      .join(core.select(col("id"), lit(1).as("__isc")), Seq("id"), "left")
      .filter(col("__isc").isNull)
      .groupBy(col("id")).agg(min(col("component")).as("cluster"))
      .withColumn("role", lit("border"))
    val noiseOut = ids
      .join(coreOut.select(col("id")).unionAll(borderOut.select(col("id"))),
        Seq("id"), "left_anti")
      .select(col("id"), lit(null).cast("long").as("cluster"),
        lit("noise").as("role"))
    coreOut.unionByName(borderOut.select(col("id"), col("cluster"),
      col("role"))).unionByName(noiseOut)
  }

  // ---- deterministic cross-engine coordinates (test/oracle harness) ----

  /** Integer in [0, 16^n) decoded from md5 nibbles [start, start+n) of
    * the id rendered as a string — the Sampling.hashBucket trick, here
    * yielding a uniform synthetic coordinate both engines compute
    * identically (see [[hexCoordSql]] for the ANSI twin). One base-16
    * `conv` of the hex slice, same single-md5-eval rationale as
    * Sampling.hashBucket. */
  def hexCoord(id: Column, start: Int, n: Int): Column = {
    require(start >= 1 && n >= 1 && start + n <= 33 && n <= 15)
    conv(substring(md5(id.cast("string")), start, n), 16, 10).cast("long")
  }

  /** ANSI SQL text computing exactly [[hexCoord]] given a hex column
    * `h` = md5(CAST(id AS VARCHAR)). */
  def hexCoordSql(h: String, start: Int, n: Int): String = {
    def nibSql(i: Int): String =
      s"CAST(ascii(substring($h,$i,1)) - CASE WHEN ascii(substring($h,$i,1))" +
        s" >= 97 THEN 87 ELSE 48 END AS BIGINT)"
    "(" + (0 until n)
      .map(j => s"${nibSql(start + j)} * ${math.pow(16, n - 1 - j).toLong}")
      .mkString(" + ") + ")"
  }
}
