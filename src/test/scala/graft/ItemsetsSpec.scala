package graft

import graft.operators.Itemsets
import org.apache.spark.sql.functions._

/** Pins pairwise association rules (operators.Itemsets) on hand-counted
  * baskets: duplicate (basket, item) rows count once, support pruning,
  * directed confidence asymmetry, exact fixed-point lift, and the
  * deterministic top-k order. */
class ItemsetsSpec extends SparkSpec {
  import spark.implicits._

  private def rules(rows: Seq[(Long, Long)], minSup: Long = 1,
                    topK: Int = 100) =
    Itemsets.pairRules(rows.toDF("bk", "it"), "bk", "it", minSup, topK)
      .select("antecedent", "consequent", "n_both", "n_ante", "n_cons",
        "n_total", "conf_x1000", "lift_x1000")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq

  test("hand-counted rules: directed confidence, symmetric lift") {
    // baskets: {1,2}, {1,2}, {1,3}, {2} -> N=4, n1=3, n2=3, n3=1, n12=2
    val rows = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L), (13L, 2L))
    val got = rules(rows, minSup = 2).toSet
    // conf(1->2) = 2*1000 div 3 = 666; lift = 2*4*1000 div 9 = 888
    assert(got == Set(
      (1L, 2L, 2L, 3L, 3L, 4L, 666L, 888L),
      (2L, 1L, 2L, 3L, 3L, 4L, 666L, 888L)))
  }

  test("duplicate item lines in one basket count once") {
    val rows = Seq((10L, 1L), (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L))
    val got = rules(rows, minSup = 2).toSet
    // n_both=2 not 3; n_ante(1)=2 despite three lines
    assert(got.map(r => (r._1, r._2, r._3, r._4)) ==
      Set((1L, 2L, 2L, 2L), (2L, 1L, 2L, 2L)))
  }

  test("support pruning drops rare pairs before any rule math") {
    val rows = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 3L))
    assert(rules(rows, minSup = 2).isEmpty)
    assert(rules(rows, minSup = 1).size == 4) // both pairs, both ways
  }

  test("topK cuts on the (lift, conf, a, c) total order") {
    // 1 and 2 also appear alone, diluting their lift (n_ante grows, N
    // grows): lift(1,2) = 2*6*1000 div 9 = 1333 < lift(3,4) =
    // 2*6*1000 div 4 = 3000 — the rare perfectly-coupled pair wins
    val rows = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 3L), (12L, 4L), (13L, 3L), (13L, 4L),
      (14L, 1L), (15L, 2L))
    val top = rules(rows, minSup = 2, topK = 2)
    assert(top.map(r => (r._1, r._2)) == Seq((3L, 4L), (4L, 3L)))
  }
}
