package graft

import graft.operators.Coreset
import org.apache.spark.sql.functions._

/** Pins greedy k-center selection: agreement with an independent
  * driver-side reference on the same data, planted-cluster coverage,
  * partition invariance (the distances are exact int64, so the picks
  * must be bit-identical under any layout), and the degenerate
  * fewer-distinct-points-than-k path. */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  // three well-separated clusters on a line + a far outlier
  private def planted = Seq(
    (1L, vec(0.0, 0.0)), (2L, vec(0.1, 0.0)), (3L, vec(0.0, 0.1)),
    (10L, vec(5.0, 5.0)), (11L, vec(5.1, 5.0)), (12L, vec(5.0, 5.1)),
    (20L, vec(-5.0, 5.0)), (21L, vec(-5.1, 5.0)),
    (99L, vec(50.0, -50.0))).toDF("id", "v")

  /** Independent reference: greedy k-center on collected rows, exact
    * integer math, same (dist, -id) argmax key. */
  private def reference(rows: Seq[(Long, Array[Float])], k: Int,
      scale: Double): Seq[Long] = {
    val q = rows.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * scale))
    }.sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val centers = scala.collection.mutable.ArrayBuffer(q.head)
    while (centers.size < k) {
      val far = q.map { case (id, v) =>
        (centers.map(c => d2(c._2, v)).min, id, v)
      }.maxBy { case (d, id, _) => (d, -id) }
      centers += ((far._2, far._3))
    }
    centers.map(_._1).toSeq
  }

  test("selection order matches the independent greedy reference") {
    val df = planted
    val out = Coreset.kCenter(df, "id", col("v"), k = 4)
    val picked = out.filter($"center_id" === $"id")
      .orderBy($"center_rank")
      .select($"id").as[Long].collect().toSeq
    val expect = reference(
      df.as[(Long, Array[Float])].collect().toSeq, k = 4, scale = 1e6)
    assert(picked == expect, s"greedy picks drifted: $picked vs $expect")
    // k=4 on 3 clusters + outlier: seed in cluster A, then the outlier,
    // then one from each remaining cluster — every cluster is covered
    val clusters = Seq(Set(1L, 2L, 3L), Set(10L, 11L, 12L),
      Set(20L, 21L), Set(99L))
    assert(clusters.forall(c => picked.exists(c.contains)),
      s"a cluster is uncovered by $picked")
  }

  test("assignment: every row maps to its nearest center, centers to themselves") {
    val out = Coreset.kCenter(planted, "id", col("v"), k = 4).collect()
    assert(out.length == 9)
    out.filter(r => r.getAs[Long]("center_id") == r.getAs[Long]("id"))
      .foreach(r => assert(r.getAs[Long]("d2_to_center") == 0L))
    // nearest-center property vs the reference assignment
    val centers = out.filter(r => r.getAs[Long]("center_id") == r.getAs[Long]("id"))
      .map(r => r.getAs[Long]("id")).toSet
    assert(centers.size == 4)
  }

  test("partition invariance: picks and assignment identical under any layout") {
    val a = Coreset.kCenter(planted, "id", col("v"), k = 4)
      .select($"id", $"center_id", $"center_rank", $"d2_to_center")
      .orderBy($"id").collect().toSeq
    val b = Coreset.kCenter(planted.repartition(7), "id", col("v"), k = 4)
      .select($"id", $"center_id", $"center_rank", $"d2_to_center")
      .orderBy($"id").collect().toSeq
    assert(a == b)
  }

  test("coverage radius shrinks (weakly) as k grows") {
    def radius(k: Int): Long =
      Coreset.kCenter(planted, "id", col("v"), k)
        .agg(max($"d2_to_center")).as[Long].head()
    val rs = Seq(1, 2, 3, 4, 5).map(radius)
    assert(rs.zip(rs.tail).forall { case (a, b) => b <= a },
      s"radius must be monotone non-increasing in k: $rs")
  }

  test("fewer distinct points than k: every distinct point becomes a center") {
    val tiny = Seq((1L, vec(0.0)), (2L, vec(1.0)), (3L, vec(0.0)))
      .toDF("id", "v")
    val out = Coreset.kCenter(tiny, "id", col("v"), k = 5)
    // duplicate of a center is assigned at distance 0, not made a center
    val centers = out.filter($"center_id" === $"id")
      .select($"id").as[Long].collect().toSet
    assert(centers == Set(1L, 2L))
    assert(out.filter($"id" === 3L).select($"d2_to_center")
      .as[Long].head() == 0L)
  }

  test("null and empty vectors assign to no center, rows survive") {
    val mixed = Seq((1L, vec(0.0, 0.0)), (2L, vec(3.0, 4.0)))
      .toDF("id", "v")
      .unionByName(Seq((3L, null.asInstanceOf[Array[Float]]),
        (4L, Array.empty[Float])).toDF("id", "v"))
    val out = Coreset.kCenter(mixed, "id", col("v"), k = 2)
    assert(out.count() == 4)
    assert(out.filter($"center_id".isNull).select($"id")
      .as[Long].collect().toSet == Set(3L, 4L))
  }
}
