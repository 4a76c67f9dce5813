package graft

import graft.operators.{Graph, RangeDim}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Randomized parity: the distributed graph/range operators vs naive
  * single-machine references on small random inputs — the algorithms
  * (degree-ordered wedges, sync LPA, peeling, binary search) must agree
  * with the obvious O(n^3)/O(n*m) formulations on every sample. */
class GraphPropertySpec extends SparkSpec {
  import spark.implicits._

  private val edgeGen: Gen[List[(Long, Long)]] = Gen.listOf(for {
    a <- Gen.chooseNum(0L, 11L)
    b <- Gen.chooseNum(0L, 11L)
  } yield (a, b))

  private def canon(edges: Seq[(Long, Long)]): Set[(Long, Long)] =
    edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.toSet

  private def samples(n: Int): Seq[List[(Long, Long)]] =
    (0 until n * 3).flatMap(_ => edgeGen.sample).filter(_.nonEmpty).take(n)

  test("triangleCount matches the O(n^3) reference on random graphs") {
    samples(6).foreach { raw =>
      val e = canon(raw)
      val nodes = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
      val ref = nodes.combinations(3).count { case Seq(a, b, c) =>
        e((a, b)) && e((b, c)) && e((a, c))
      }
      val got = Graph.triangleCount(raw.toDF("src", "dst"), "src", "dst")
        .as[(Long, Long, Long)].collect().head
      assert(got == ((nodes.size.toLong, e.size.toLong, ref.toLong)),
        s"edges: $e")
    }
  }

  test("triangleStats matches per-node reference counts") {
    samples(4).foreach { raw =>
      val e = canon(raw)
      val nodes = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
      val tris = nodes.combinations(3).filter { case Seq(a, b, c) =>
        e((a, b)) && e((b, c)) && e((a, c)) }.toSeq
      val perNode = nodes.map(n => n ->
        tris.count(_.contains(n)).toLong).toMap
      val deg = nodes.map(n => n ->
        e.count(p => p._1 == n || p._2 == n).toLong).toMap
      val got = Graph.triangleStats(raw.toDF("src", "dst"), "src", "dst")
        .as[(Long, Long, Long, Double)].collect()
      assert(got.map(r => r._1 -> r._2).toMap == deg, s"edges: $e")
      assert(got.map(r => r._1 -> r._3).toMap == perNode, s"edges: $e")
      got.foreach { r =>
        val want = if (r._2 < 2) 0.0
          else (2.0 * r._3) / (r._2 * (r._2 - 1)).toDouble
        assert(r._4 == want, s"lcc of ${r._1}, edges: $e")
      }
    }
  }

  test("labelPropagation matches a synchronous replay") {
    samples(5).foreach { raw =>
      val e = canon(raw)
      val sym = e.toSeq.flatMap(p => Seq(p, p.swap))
      val inNbrs = sym.groupBy(_._2).map { case (v, es) =>
        v -> es.map(_._1) }
      val nodes = e.flatMap(p => Seq(p._1, p._2))
      var labs = nodes.map(n => n -> n).toMap
      (1 to 3).foreach { _ =>
        labs = labs.map { case (v, l) =>
          inNbrs.get(v) match {
            case None => v -> l
            case Some(ns) =>
              val byLab = ns.groupBy(labs).map { case (lb, xs) =>
                (lb, xs.size) }
              val best = byLab.toSeq.minBy { case (lb, c) => (-c, lb) }._1
              v -> best
          }
        }
      }
      val got = Graph.labelPropagation(sym.toDF("src", "dst"),
        "src", "dst", iters = 3, edgesDistinct = true)
        .as[(Long, Long)].collect().toMap
      assert(got == labs, s"edges: $e")
    }
  }

  test("kCore matches peel-to-fixpoint reference") {
    samples(5).foreach { raw =>
      var e = canon(raw)
      var changed = true
      while (changed) {
        val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
          .groupBy(identity).map { case (n, xs) => n -> xs.size }
        val keep = deg.filter(_._2 >= 3).keySet
        val next = e.filter(p => keep(p._1) && keep(p._2))
        changed = next != e
        e = next
      }
      val ref = e.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
      val got = Graph.kCore(raw.toDF("src", "dst"), "src", "dst", k = 3)
        .as[(Long, Long)].collect().toMap
      assert(got == ref, s"edges: ${canon(raw)}")
    }
  }

  test("lookupJoin matches a BETWEEN join on random interval sets") {
    val dimGen = for {
      cuts <- Gen.listOfN(8, Gen.chooseNum(0L, 100L))
      probes <- Gen.listOfN(20, Gen.chooseNum(-5L, 110L))
    } yield (cuts.distinct.sorted, probes)
    (0 until 5).flatMap(_ => dimGen.sample).foreach { case (cuts, probes) =>
      // adjacent [c_i, c_{i+1} - 1] intervals from sorted distinct cuts
      val ivs = cuts.sliding(2).collect {
        case List(a, b) if b - 1 >= a => (a, b - 1)
      }.toList.zipWithIndex.map { case ((lo, hi), i) => (lo, hi, s"z$i") }
      if (ivs.nonEmpty) {
        val ref = probes.map { p =>
          p -> ivs.find(iv => iv._1 <= p && p <= iv._2).map(_._3)
        }.toSet
        val got = RangeDim.lookupJoin(probes.toDF("v"),
            ivs.toDF("lo", "hi", "lab"), col("v"), "lo", "hi", Seq("lab"))
          .as[(Long, Option[String])].collect().toSet
        assert(got == ref, s"ivs: $ivs probes: $probes")
      }
    }
  }
}
