package graft

import graft.operators.Skyline
import org.apache.spark.sql.functions._

/** Pins the bucketed two-phase skyline (operators.Skyline) against the
  * O(n²) dominance definition: randomized parity with a brute-force
  * frontier, bucket-count invariance (the bucketing is a pure
  * parallelization device, never a semantics knob), duplicate survival,
  * group independence, and null exclusion. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  /** brute-force 2-D minimize-frontier over (x, y) pairs */
  private def brute(pts: Seq[(Double, Double)]): Set[(Double, Double)] =
    pts.filter { case (px, py) =>
      !pts.exists { case (qx, qy) =>
        qx <= px && qy <= py && (qx < px || qy < py)
      }
    }.toSet

  private def run(pts: Seq[(Double, Double)], buckets: Int)
      : Set[(Double, Double)] =
    Skyline.pareto2d(pts.toDF("x", "y"), col("x"), col("y"),
        buckets = buckets)
      .as[(Double, Double)].collect().toSet

  test("randomized parity with brute force, across bucket counts") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      // small value domain on purpose: forces x-ties and exact duplicates
      val pts = Seq.fill(120)(
        (rnd.nextInt(12).toDouble, rnd.nextInt(12).toDouble))
      val expect = brute(pts)
      for (b <- Seq(1, 3, 64))
        assert(run(pts, b) == expect, s"trial=$trial buckets=$b")
    }
  }

  test("duplicates of a frontier point all survive") {
    val df = Seq((1.0, 5.0, "a"), (1.0, 5.0, "b"), (2.0, 1.0, "c"),
      (3.0, 3.0, "d")).toDF("x", "y", "tag")
    val out = Skyline.pareto2d(df, col("x"), col("y"))
      .select("tag").as[String].collect().toSet
    // (3,3) is dominated by nothing? (1,5): 1<=3, 5>3 no; (2,1): 2<=3,1<=3
    // and strict -> dominated. So frontier = {(1,5) x2, (2,1)}.
    assert(out == Set("a", "b", "c"))
  }

  test("per-group frontiers are independent") {
    val df = Seq(("g1", 1.0, 1.0), ("g1", 2.0, 2.0),
      ("g2", 2.0, 2.0), ("g2", 5.0, 5.0)).toDF("g", "x", "y")
    val out = Skyline.pareto2d(df, col("x"), col("y"), groupCols = Seq("g"))
      .as[(String, Double, Double)].collect().toSet
    // (2,2) is dominated in g1 but is g2's own minimum
    assert(out == Set(("g1", 1.0, 1.0), ("g2", 2.0, 2.0)))
  }

  test("null dimensions are excluded, not frontier members") {
    val df = Seq((Some(1.0), Some(2.0)), (None, Some(0.0)),
      (Some(0.0), None)).toDF("x", "y")
    val out = Skyline.pareto2d(df, col("x"), col("y"))
      .as[(Option[Double], Option[Double])].collect().toSet
    assert(out == Set((Some(1.0), Some(2.0))))
  }

  test("maximize via negation") {
    val df = Seq((1.0, 1.0), (5.0, 5.0), (4.0, 6.0)).toDF("x", "y")
    val out = Skyline.pareto2d(df, -col("x"), -col("y"))
      .as[(Double, Double)].collect().toSet
    assert(out == Set((5.0, 5.0), (4.0, 6.0)))
  }

  test("reserved temp names are rejected loudly") {
    val df = Seq((1.0, 2.0)).toDF("x", "__sx")
    intercept[IllegalArgumentException] {
      Skyline.pareto2d(df, col("x"), col("__sx"))
    }
  }
}
