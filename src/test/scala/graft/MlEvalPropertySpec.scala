package graft

import graft.operators.MlEval
import org.apache.spark.sql.functions._

/** Randomized cross-checks of the rank-statistic metrics against
  * brute-force O(n²)/O(n log n) references computed in plain Scala —
  * the midrank/tie/segment edge cases hand-picked examples miss. The
  * RNG is seeded: failures reproduce. */
class MlEvalPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(20260815L)

  private def randomDataset(n: Int, distinctScores: Int)
      : Seq[(String, Double, Int)] =
    (1 to n).map { _ =>
      (s"k${rng.nextInt(3)}",
        // few distinct values on purpose: ties are the hard part
        (rng.nextInt(distinctScores) + 1).toDouble / 4,
        if (rng.nextInt(3) == 0) 1 else 0)
    }

  /** Brute-force AUC with the tie convention: pairs (pos, neg) scored
    * 1 if pos > neg, 0.5 if tied. */
  private def bruteAuc(rows: Seq[(Double, Int)]): Option[Double] = {
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    if (pos.isEmpty || neg.isEmpty) None
    else {
      val wins = (for (p <- pos; q <- neg) yield
        if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
      Some(wins / (pos.size.toDouble * neg.size.toDouble))
    }
  }

  /** Brute-force step-rule AP over descending distinct-score blocks,
    * with the same 2^-20 per-block floor the operator documents. */
  private def bruteApFp(rows: Seq[(Double, Int)]): (Long, Long) = {
    val blocks = rows.groupBy(_._1).toSeq.sortBy(-_._1)
    var cumP = 0L; var cumT = 0L; var fp = 0L
    blocks.foreach { case (_, rs) =>
      val p = rs.count(_._2 == 1); val t = rs.size
      cumP += p; cumT += t
      fp += (p.toLong * cumP * 1048576L) / cumT
    }
    (rows.count(_._2 == 1).toLong, fp)
  }

  test("aucRoc matches brute-force pair counting on 30 random " +
      "tie-heavy datasets") {
    (1 to 30).foreach { trial =>
      val data = randomDataset(n = 40 + rng.nextInt(120),
        distinctScores = 2 + rng.nextInt(10))
      val got = MlEval.aucRoc(data.toDF("k", "s", "y"), col("k"),
          col("s"), col("y"), "k")
        .select("k", "auc").as[(String, Option[Double])].collect().toMap
      data.groupBy(_._1).foreach { case (k, rows) =>
        val want = bruteAuc(rows.map(r => (r._2, r._3)))
        val g = got(k)
        (want, g) match {
          case (None, None) => ()
          case (Some(w), Some(v)) =>
            assert(math.abs(v - w) < 1e-12,
              s"trial $trial key $k: got $v want $w over ${rows.size}")
          case other => fail(s"trial $trial key $k: mismatch $other")
        }
      }
    }
  }

  test("averagePrecision matches the brute-force block recurrence " +
      "bit-for-bit on 30 random datasets") {
    (1 to 30).foreach { trial =>
      val data = randomDataset(n = 40 + rng.nextInt(120),
        distinctScores = 2 + rng.nextInt(10))
      val got = MlEval.averagePrecision(data.toDF("k", "s", "y"),
          col("k"), col("s"), col("y"), "k")
        .select("k", "n_pos", "ap_fp").as[(String, Long, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      data.groupBy(_._1).foreach { case (k, rows) =>
        val want = bruteApFp(rows.map(r => (r._2, r._3)))
        assert(got(k) == want,
          s"trial $trial key $k: got ${got(k)} want $want")
      }
    }
  }

  test("ndcg of a randomly permuted ranking never exceeds 1 and hits 1 " +
      "only when the permutation is relevance-sorted") {
    (1 to 20).foreach { _ =>
      val rels = Seq.fill(8)(rng.nextInt(4))
      val scores = rng.shuffle((1 to 8).map(_.toDouble))
      val df = rels.zip(scores).zipWithIndex.map { case ((r, s), i) =>
        ("q", i.toLong, s, r)
      }.toDF("q", "id", "s", "r")
      val out = MlEval.ndcgAtK(df, col("q"), col("s"), col("r"),
          col("id"), 8, "q")
        .select("dcg_fp", "idcg_fp").as[(Long, Long)].head()
      assert(out._1 <= out._2)
      val sortedByRel = rels.zip(scores).sortBy(-_._1)
      val isIdeal = rels.zip(scores).sortBy(-_._2).map(_._1) ==
        sortedByRel.map(_._1)
      if (out._2 > 0 && isIdeal) assert(out._1 == out._2)
    }
  }
}
