package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._
import graft.operators.Spatial

/** Grid-blocked epsilon join: exactness vs the brute-force form, grid
  * edge cases, and the no-cartesian plan guard that IS the operator's
  * 100 TB claim. */
class SpatialSpec extends SparkSpec {

  import spark.implicits._

  private def bruteWithin(pts: DataFrame, r: Long): DataFrame = {
    val a = pts.select(col("id").as("id_a"), col("x").as("xa"),
      col("y").as("ya"))
    val b = pts.select(col("id").as("id_b"), col("x").as("xb"),
      col("y").as("yb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist2") <= lit(r * r))
      .select(col("id_a"), col("id_b"), col("dist2"))
  }

  private lazy val pts = {
    // deterministic scatter incl. same-cell, cross-cell-boundary, and
    // exactly-at-radius pairs
    val rows = (0L until 400L).map { i =>
      (i, (i * 37) % 1000, (i * 91) % 1000)
    } ++ Seq((1000L, 0L, 0L), (1001L, 64L, 0L), // exactly r apart
      (1002L, 63L, 0L), (1003L, 65L, 0L)) // either side of the cell wall
    rows.toDF("id", "x", "y")
  }

  test("grid join equals brute force on every pair") {
    val r = 64L
    val grid = Spatial.gridWithinJoin(pts, "id", "x", "y", r)
      .orderBy("id_a", "id_b").collect().toSeq
    val brute = bruteWithin(pts, r).orderBy("id_a", "id_b").collect().toSeq
    assert(grid.nonEmpty && grid == brute)
    // the exactly-at-radius pair is inclusive
    assert(grid.exists(row => row.getLong(0) == 1000L && row.getLong(1) == 1001L))
  }

  test("no duplicate pairs from the 3x3 replication") {
    val g = Spatial.gridWithinJoin(pts, "id", "x", "y", 64L)
    assert(g.count() == g.distinct().count())
  }

  test("r = 1 degenerate grid still exact") {
    val tiny = Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 0L, 1L), (4L, 3L, 3L))
      .toDF("id", "x", "y")
    val got = Spatial.gridWithinJoin(tiny, "id", "x", "y", 1L)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 1L), (1L, 3L, 1L)))
  }

  test("neighbor stats match a hand computation") {
    val tiny = Seq((1L, 0L, 0L), (2L, 3L, 0L), (3L, 0L, 4L), (4L, 100L, 100L))
      .toDF("id", "x", "y")
    val got = Spatial.neighborStats(tiny, "id", "x", "y", 5L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // 1-2 d2=9, 1-3 d2=16, 2-3 d2=25 (= r^2, inclusive); 4 isolated
    assert(got == Seq((1L, 2L, 2L, 9L), (2L, 2L, 1L, 9L), (3L, 2L, 1L, 16L)))
  }

  test("knnWithin equals the brute-force ranked form; WindowGroupLimit " +
      "trims the rank cut") {
    val r = 64L
    val k = 3
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id")).orderBy(col("dist2"), col("nb"))
    val sym = bruteWithin(pts, r)
    val brute = sym.select(col("id_a").as("id"), col("id_b").as("nb"),
        col("dist2"))
      .unionAll(sym.select(col("id_b").as("id"), col("id_a").as("nb"),
        col("dist2")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("id", "rank", "nb", "dist2")
      .as[(Long, Int, Long, Long)].collect().sorted.toSeq
    val got = Spatial.knnWithin(pts, "id", "x", "y", r, k)
      .select("id", "rank", "nb_id", "dist2")
      .as[(Long, Int, Long, Long)].collect().sorted.toSeq
    assert(got == brute)
    assert(got.nonEmpty)
    // the rank<=k cut must plan as WindowGroupLimit (partial trim
    // before the final sort), not a full window materialization
    val plan = Spatial.knnWithin(pts, "id", "x", "y", r, k)
      .queryExecution.explainString(SimpleMode)
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("plan is an equi-join on the cell key - no cartesian anywhere") {
    val p = SparkEntry.queries("spatial_within_join")(spark, Sf0)
      .queryExecution.explainString(SimpleMode)
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"))
  }

  test("dbscan: planted clusters, border tie rule, noise") {
    // cluster A: tight knot at (0,0); cluster B: knot at (1000,1000);
    // border point 50 within eps of A's cores but itself sparse;
    // noise point far from everything
    val pts = Seq(
      (1L, 0L, 0L), (2L, 1L, 0L), (3L, 0L, 1L), (4L, 1L, 1L), // A cores
      (50L, 6L, 0L), // border: within eps of core 2 only (1+self < 4)
      (10L, 1000L, 1000L), (11L, 1001L, 1000L), (12L, 1000L, 1001L),
      (13L, 1001L, 1001L), // B cores
      (99L, 5000L, 5000L) // noise
    ).toDF("id", "x", "y")
    val got = graft.operators.Spatial.dbscan(pts, "id", "x", "y",
        eps = 5L, minPts = 4L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2))).toSeq
    // A cores 1-4 have >= 4 points (incl. self) within 5 -> cluster 1;
    // 50 is within 5 of cores 2 and 4 only -> border of cluster 1;
    // B forms cluster 10; 99 is noise
    assert(got == Seq(
      (1L, 1L, "core"), (2L, 1L, "core"), (3L, 1L, "core"),
      (4L, 1L, "core"), (10L, 10L, "core"), (11L, 10L, "core"),
      (12L, 10L, "core"), (13L, 10L, "core"), (50L, 1L, "border"),
      (99L, -1L, "noise")))
  }

  test("hexCoord matches its SQL twin") {
    val ids = (0L until 200L).toDF("id")
    val sparkSide = ids.select(col("id"),
        Spatial.hexCoord(col("id"), 1, 3).as("x"),
        Spatial.hexCoord(col("id"), 4, 3).as("y"))
      .orderBy("id").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    ids.createOrReplaceTempView("hex_ids")
    val x = Spatial.hexCoordSql("h", 1, 3)
    val y = Spatial.hexCoordSql("h", 4, 3)
    val sqlSide = spark.sql(
      s"""SELECT id, $x AS x, $y AS y
         |FROM (SELECT id, md5(CAST(id AS STRING)) AS h FROM hex_ids)
         |ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(sparkSide == sqlSide)
    assert(sparkSide.forall { case (a, b) =>
      a >= 0 && a < 4096 && b >= 0 && b < 4096 })
  }
}
