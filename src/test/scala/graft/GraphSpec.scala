package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Pins the fixed-point PageRank semantics (operators.Graph): rank-mass
  * conservation up to floor loss, centrality ordering on known shapes,
  * component independence, and exact invariance to input partitioning —
  * the property the integer arithmetic exists to guarantee. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 5)
      : Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("star graph: the hub outranks every leaf") {
    // undirected 5-leaf star: hub 0, leaves 1..5
    val e = (1L to 5L).flatMap(l => Seq((0L, l), (l, 0L)))
    val r = ranks(e)
    assert((1L to 5L).forall(l => r(0L) > r(l)))
    // leaves are symmetric -> identical ranks
    assert((1L to 5L).map(r).toSet.size == 1)
  }

  test("symmetric regular graph: uniform ranks, mass conserved") {
    // 4-cycle, both directions: perfectly regular -> uniform fixed point
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val r = ranks(e, iters = 10)
    assert(r.values.toSet.size == 1)
    // no dangling nodes: total rank stays within floor loss of Scale
    // (each node's update floors at most 3 divisions per iteration)
    val total = r.values.sum
    assert(total <= Graph.Scale && total > Graph.Scale - 10 * 4 * 3)
  }

  test("disconnected components do not exchange rank") {
    // two disjoint 2-cliques; adding an unrelated component must not
    // change the first component's ranks
    val c1 = Seq((0L, 1L), (1L, 0L))
    val c2 = Seq((10L, 11L), (11L, 10L))
    val alone = ranks(c1 ++ c2)
    // both components are regular 2-node graphs over an N=4 node set:
    // every node converges to the same rank
    assert(alone.values.toSet.size == 1)
  }

  test("dangling nodes leak mass but still receive teleport + inflow") {
    // 0 -> 1 only: node 1 never redistributes (dangling)
    val r = ranks(Seq((0L, 1L)))
    assert(r(1L) > r(0L)) // 1 gets teleport + 0's contribution
    assert(r.values.sum < Graph.Scale) // the leak is real
  }

  test("bit-exact under repartitioning and input duplication") {
    val e = (0L until 40L).map(i => (i, (i * 7 + 3) % 40))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val base = ranks(e)
    val shuffled = Graph.pageRank(
      e.toDF("src", "dst").repartition(13).union(e.toDF("src", "dst")),
      "src", "dst", 5).as[(Long, Long)].collect().toMap
    assert(base == shuffled)
  }

  private def tri(edges: Seq[(Long, Long)]): (Long, Long, Long) =
    Graph.triangleCount(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long, Long)].collect().head

  test("triangles: K4 has 4, a cycle has 0, a star has 0") {
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    assert(tri(k4) == ((4L, 6L, 4L)))
    assert(tri(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))) ==
      ((4L, 4L, 0L)))
    assert(tri((1L to 5L).map(l => (0L, l))) == ((6L, 5L, 0L)))
  }

  test("triangles: reversed duplicates and self-loops do not change it") {
    val k3 = Seq((0L, 1L), (1L, 2L), (0L, 2L))
    val noisy = k3 ++ k3.map(_.swap) ++ Seq((0L, 0L), (1L, 1L))
    assert(tri(noisy) == ((3L, 3L, 1L)))
    // pendant node adds a node and an edge, no triangle
    assert(tri(k3 :+ (2L, 9L)) == ((4L, 4L, 1L)))
  }

  test("tri stats: K4 all-1.0 lcc; wedge and pendant corners zero-fill") {
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val s4 = Graph.triangleStats(k4.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long, Long, Double)].collect().sorted
    assert(s4.toSeq == (0L to 3L).map(n => (n, 3L, 3L, 1.0)))
    // k3 plus a pendant: corner 2 has d=3 but only 1 triangle
    val s = Graph.triangleStats(
      Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 9L)).toDF("src", "dst"),
      "src", "dst").as[(Long, Long, Long, Double)].collect().sorted
    assert(s.toSeq == Seq((0L, 2L, 1L, 1.0), (1L, 2L, 1L, 1.0),
      (2L, 3L, 1L, 1.0 / 3.0), (9L, 1L, 0L, 0.0)))
  }

  test("triangle family: ids past uint32 fall back to the unpacked key") {
    val big = 5000000000L // > 2^32
    val k3 = Seq((big, big + 1), (big + 1, big + 2), (big, big + 2))
    assert(tri(k3) == ((3L, 3L, 1L)))
    val s = Graph.triangleStats(k3.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long, Long, Double)].collect().sorted
    assert(s.toSeq == Seq((big, 2L, 1L, 1.0), (big + 1, 2L, 1L, 1.0),
      (big + 2, 2L, 1L, 1.0)))
  }

  private def lpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = edges ++ edges.map(_.swap)
    Graph.labelPropagation(sym.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap
  }

  test("lpa: disjoint triangles converge to their min node id") {
    val two = Seq((0L, 1L), (1L, 2L), (0L, 2L),
      (10L, 11L), (11L, 12L), (10L, 12L))
    assert(lpa(two, 3) ==
      Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("lpa: one round of a star — hub takes min spoke, spokes take hub") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    assert(lpa(star, 1) == Map(0L -> 1L, 1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("lpa: result is partitioning-invariant") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L),
      (5L, 6L), (6L, 7L))
    val sym = edges ++ edges.map(_.swap)
    val base = lpa(edges, 4)
    val shuffled = Graph.labelPropagation(
      sym.toDF("src", "dst").repartition(7), "src", "dst", 4)
      .as[(Long, Long)].collect().toMap
    assert(base == shuffled)
  }

  private def core(edges: Seq[(Long, Long)], k: Int, rounds: Int = 20)
      : Map[Long, Long] =
    Graph.kCore(edges.toDF("src", "dst"), "src", "dst", k, rounds)
      .as[(Long, Long)].collect().toMap

  test("kcore: pendant chain peels link by link down to the triangle") {
    // triangle {0,1,2} with a 4-link tail: the 2-core must shed the
    // tail one node per round (far end first) — the cascade case
    val g = Seq((0L, 1L), (1L, 2L), (0L, 2L),
      (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(core(g, 2) == Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
    // insufficient rounds stop mid-cascade: after 2 rounds nodes 5,6
    // are gone but the rest of the tail still stands
    assert(core(g, 2, rounds = 2) ==
      Map(0L -> 2L, 1L -> 2L, 2L -> 3L, 3L -> 2L, 4L -> 1L))
  }

  test("kcore: K4 is its own 3-core; K4 minus an edge dissolves") {
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    assert(core(k4, 3) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    assert(core(k4.filterNot(_ == ((2L, 3L))), 3) == Map.empty)
  }

  test("triangle closing probe is a broadcast semi join on a packed key") {
    // the operators run eagerly (localCheckpoint), so the 100 TB shape
    // must be asserted on the EXECUTED plans captured via listener: the
    // wedge stream may never cross an exchange on its way to the probe
    val plans = scala.collection.mutable.ArrayBuffer[String]()
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
      Graph.triangleCount(k4.toDF("src", "dst"), "src", "dst")
      // listener delivery is async; poll until the semi-join plan lands
      val deadline = System.nanoTime() + 10000000000L
      def probe = plans.synchronized {
        plans.filter(p => p.contains("LeftSemi")).toList }
      while (probe.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(probe.nonEmpty, "no semi-join plan captured")
      // broadcast probe (never a shuffled semi), keyed on the packed long
      assert(probe.exists(p => p.contains("BroadcastHashJoin") &&
        p.contains("shiftleft")))
      assert(!probe.exists(_.contains("SortMergeJoin")))
    } finally spark.listenerManager.unregister(l)
  }

  test("pagerank: weightCol of all-1s is bit-identical to unweighted") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val plain = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", 4)
      .as[(Long, Long)].collect().toMap
    val ones = Graph.pageRank(
      edges.map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "w"),
      "src", "dst", 4, weightCol = Some("w"))
      .as[(Long, Long)].collect().toMap
    assert(plain == ones)
  }

  test("pagerank weighted: the heavier edge carries more rank") {
    // 0 splits rank 9:1 between 1 and 2; symmetrized so ranks flow back
    val w = Seq((0L, 1L, 9L), (0L, 2L, 1L), (1L, 0L, 9L), (2L, 0L, 1L))
    val r = Graph.pageRank(w.toDF("src", "dst", "w"), "src", "dst", 3,
      weightCol = Some("w")).as[(Long, Long)].collect().toMap
    assert(r(1L) > r(2L))
    // weighted duplicates merge by summing: two w=4/w=5 copies == one w=9
    val dup = Seq((0L, 1L, 4L), (0L, 1L, 5L), (0L, 2L, 1L),
      (1L, 0L, 9L), (2L, 0L, 1L))
    val r2 = Graph.pageRank(dup.toDF("src", "dst", "w"), "src", "dst", 3,
      weightCol = Some("w")).as[(Long, Long)].collect().toMap
    assert(r2 == r)
  }

  test("link predict: common neighbors of non-adjacent pairs, hub cap") {
    // square 0-1-2-3-0: the two diagonals share both their neighbors
    val sq = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val got = Graph.linkPredict(sq.toDF("src", "dst"), "src", "dst", 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L, 2L), (1L, 3L, 2L)))
    // K4 has no non-adjacent pairs at all
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    assert(Graph.linkPredict(k4.toDF("src", "dst"), "src", "dst", 10)
      .count() == 0L)
    // a degree cap excludes the star hub as a wedge corner: the spokes
    // stop looking similar
    val star = (1L to 5L).map(l => (0L, l))
    assert(Graph.linkPredict(star.toDF("src", "dst"), "src", "dst", 10)
      .count() == 10L) // C(5,2) spoke pairs via the hub
    assert(Graph.linkPredict(star.toDF("src", "dst"), "src", "dst", 10,
      maxDegree = 4).count() == 0L)
  }

  test("degrees: full-outer of in/out sides, zeros filled") {
    val m = Graph.degrees(Seq((1L, 2L), (1L, 3L), (3L, 1L))
        .toDF("src", "dst"), "src", "dst")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(m(1L) == ((2L, 1L)) && m(2L) == ((0L, 1L)) && m(3L) == ((1L, 1L)))
  }

  private def hops(edges: Seq[(Long, Long)], seeds: Seq[Long], cap: Int)
      : Map[Long, Long] =
    Graph.shortestHops(edges.toDF("src", "dst"), "src", "dst",
        seeds.toDF("seed"), "seed", cap)
      .as[(Long, Long)].collect().toMap

  test("BFS: line graph distances, cap respected, unreachable absent") {
    // directed line 0->1->2->3->4->5
    val line = (0L to 4L).map(i => (i, i + 1))
    assert(hops(line, Seq(0L), 3) ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L)) // 4,5 beyond cap
    // edges are directed: nothing upstream of the seed is reached
    assert(hops(line, Seq(3L), 5) == Map(3L -> 0L, 4L -> 1L, 5L -> 2L))
  }

  test("BFS: multi-seed takes the minimum; isolated seed is hop 0") {
    val line = (0L to 4L).map(i => (i, i + 1))
    val m = hops(line, Seq(0L, 4L, 99L), 5)
    assert(m(4L) == 0L && m(5L) == 1L && m(3L) == 3L && m(99L) == 0L)
  }

  test("BFS: randomized parity with a sequential BFS") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 3) {
      val edges = Seq.fill(150)(
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      val seeds = Seq(rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)
      val cap = 1 + rnd.nextInt(5)
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var dist = seeds.distinct.map(_ -> 0L).toMap
      var front = seeds.distinct
      for (h <- 1 to cap) {
        val nxt = front.flatMap(n => adj.getOrElse(n, Nil))
          .distinct.filterNot(dist.contains)
        nxt.foreach(n => dist += n -> h.toLong)
        front = nxt
      }
      assert(hops(edges, seeds, cap) == dist, s"trial=$trial cap=$cap")
    }
  }

  test("HITS: authorities and hubs separate on a directed bipartite " +
      "shape; partition-invariant") {
    // 1 points at both authorities, 2 and 3 only at 10 -> 10 is the
    // stronger authority, 1 the stronger hub
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L))
    def run(np: Int) = {
      val base = edges.toDF("src", "dst")
      Graph.hits(if (np > 0) base.repartition(np) else base,
          "src", "dst", iters = 4)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2))).toMap
    }
    val h = run(0)
    assert(h(10L)._1 > h(11L)._1, s"authority order: $h")
    assert(h(1L)._2 > h(2L)._2, s"hub order: $h")
    // pure sources have zero authority; pure sinks zero hub
    assert(h(1L)._1 == 0L && h(10L)._2 == 0L)
    // scores L1-normalize to Scale up to floor loss
    val authSum = h.values.map(_._1).sum
    assert(authSum <= Graph.Scale &&
      authSum > Graph.Scale - h.size, s"auth mass $authSum")
    assert(run(7) == h)
  }

  test("Bellman-Ford: cheaper long path beats direct edge; hop cap bites") {
    import spark.implicits._
    // 1 -> 2 direct cost 10; 1 -> 3 -> 4 -> 2 cost 1+1+1 = 3
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 4L, 1L),
      (4L, 2L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("seed")
    def run(h: Int) = graft.operators.Graph
      .cheapestPaths(edges, "src", "dst", "w", seeds, "seed", h)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(3) == Map(1L -> 0L, 2L -> 3L, 3L -> 1L, 4L -> 2L))
    // with only 1 relaxation round the direct edge is the best 2 can do
    assert(run(1) == Map(1L -> 0L, 2L -> 10L, 3L -> 1L))
  }

  test("Bellman-Ford: randomized parity with sequential hop-bounded BF") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    for (trial <- 1 to 2) {
      val n = 30
      val edges = Seq.fill(120)((rng.nextInt(n).toLong,
        rng.nextInt(n).toLong, rng.nextInt(9) + 1L))
        .filter(e => e._1 != e._2).distinct
      val seeds = Seq(0L, (n / 2).toLong)
      val cap = 4
      // sequential reference: cap rounds of full relaxation
      var dist = seeds.map(_ -> 0L).toMap
      for (_ <- 1 to cap) {
        val next = edges.flatMap { case (s, d, w) =>
          dist.get(s).map(c => d -> (c + w)) }
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
        dist = (dist.keySet ++ next.keySet).map { k =>
          k -> math.min(dist.getOrElse(k, Long.MaxValue),
            next.getOrElse(k, Long.MaxValue))
        }.toMap
      }
      val got = graft.operators.Graph.cheapestPaths(
          edges.toDF("src", "dst", "w"), "src", "dst", "w",
          seeds.toDF("seed"), "seed", cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == dist, s"trial=$trial")
    }
  }

  test("personalized pagerank: mass stays in the seeds' reachable " +
      "set; unreachable nodes are exactly zero") {
    import graft.operators.Graph
    // cycle 1->2->3->1 reachable from seed 1; island 4->5 is not
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L))
      .toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iters = 6,
        seeds = Some(Seq(1L)))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(4L) == 0L && r(5L) == 0L)
    assert(r(1L) > 0L && r(2L) > 0L && r(3L) > 0L)
    // seed-proximity ordering: the seed itself carries the teleport
    assert(r(1L) > r(3L) || r(1L) > r(2L))
    // a seed absent from the graph mints nothing
    val r2 = Graph.pageRank(edges, "src", "dst", iters = 3,
        seeds = Some(Seq(99L)))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r2.values.forall(_ == 0L))
    // determinism under repartition
    val r3 = Graph.pageRank(edges.repartition(5), "src", "dst",
        iters = 6, seeds = Some(Seq(1L)))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == r3)
  }

  private def walks(edges: Seq[(Long, Long)], len: Int, reps: Int)
      : Seq[(Long, Long, Long, Long)] =
    Graph.randomWalks(edges.toDF("src", "dst"), "src", "dst", len, reps)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted

  test("random walks: every step follows an edge, walks start at start") {
    // K4 both directions: no dangling, every walk runs full length
    val e = (for (a <- 0L to 3L; b <- 0L to 3L if a != b) yield (a, b))
    val w = walks(e, len = 5, reps = 3)
    val eset = e.toSet
    // 4 nodes x 3 reps x 6 steps
    assert(w.size == 4 * 3 * 6)
    val byWalk = w.groupBy(x => (x._1, x._2))
    assert(byWalk.size == 12)
    for (((start, _), rows) <- byWalk) {
      val path = rows.sortBy(_._3).map(_._4)
      assert(rows.map(_._3) == (0L to 5L), "contiguous steps")
      assert(path.head == start, "step 0 is the start node")
      path.sliding(2).foreach { case Seq(a, b) =>
        assert(eset.contains((a, b)), s"($a,$b) not an edge")
      }
    }
  }

  test("random walks: dangling node truncates; no walk starts there") {
    // path 0->1->2, nothing out of 2
    val e = Seq((0L, 1L), (1L, 2L))
    val w = walks(e, len = 4, reps = 1)
    // starts only from nodes with out-edges
    assert(w.map(_._1).distinct.sorted == Seq(0L, 1L))
    // the walk from 0 is forced 0,1,2 then truncates at dangling 2;
    // from 1 it is 1,2 and truncates
    assert(w.filter(_._1 == 0L).sortBy(_._3).map(_._4) == Seq(0L, 1L, 2L))
    assert(w.filter(_._1 == 1L).sortBy(_._3).map(_._4) == Seq(1L, 2L))
  }

  test("random walks: bit-identical under repartitioning and dup edges") {
    val e = (for (a <- 0L to 9L; b <- 0L to 9L if a != b) yield (a, b))
      .filter { case (a, b) => (a + b) % 3 != 0 }
    val base = walks(e, len = 4, reps = 2)
    val again = Graph.randomWalks(
        (e ++ e ++ e).toDF("src", "dst").repartition(7),
        "src", "dst", 4, 2)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(base == again)
  }

  test("neighborJaccard: hand-checked scores, minCommon prunes, " +
      "partitioning-invariant") {
    // square 0-1-2-3-0 (undirected): opposite corners share BOTH
    // neighbors -> jaccard 2/(2+2-2) = 1.0; adjacent corners share none
    val sq = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val out = Graph.neighborJaccard(sq.toDF("src", "dst"), "src", "dst",
        minCommon = 2, k = 10)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(out == Seq((0L, 2L, 2L, 2L, 2L, 1000000L),
      (1L, 3L, 2L, 2L, 2L, 1000000L)))
    // pendant attached to 0 dilutes: star 0-{1,2,3} + edge 1-2 means
    // 1,2 share {0} plus each other... check minCommon=1 exact values
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val s1 = Graph.neighborJaccard(star.toDF("src", "dst"), "src", "dst",
        minCommon = 1, k = 10)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    // leaves pairwise share exactly {0}: 1/(1+1-1) = 1.0
    assert(s1 == Seq((1L, 2L, 1L, 1L, 1L, 1000000L),
      (1L, 3L, 1L, 1L, 1L, 1000000L), (2L, 3L, 1L, 1L, 1L, 1000000L)))
    val rep = Graph.neighborJaccard(
        (sq ++ sq).toDF("src", "dst").repartition(7), "src", "dst",
        minCommon = 2, k = 10)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(rep == out)
    // center cap: hub 0 (degree 3) stops generating wedges under cap 2,
    // so the star's leaf pairs vanish; the square (all degree 2) is
    // unaffected — and TRUE degrees still feed the denominator
    val capped = Graph.neighborJaccard(star.toDF("src", "dst"),
        "src", "dst", minCommon = 1, k = 10, maxCenterDegree = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(capped.isEmpty)
    val sqCap = Graph.neighborJaccard(sq.toDF("src", "dst"), "src", "dst",
        minCommon = 2, k = 10, maxCenterDegree = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(sqCap == out)
  }

  test("neighborJaccardMinHash: precision 1 vs the exact tier, planted " +
      "identical-neighbor pairs always found, scores exact") {
    // square: opposite corners have IDENTICAL neighbor sets (J = 1) —
    // identical sets mean identical signatures, so EVERY band matches
    // and banding recall on them is 1 deterministically
    val sq = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val mh = Graph.neighborJaccardMinHash(sq.toDF("src", "dst"),
        "src", "dst", minCommon = 2, tauX1e6 = 500000L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(mh == Seq((0L, 2L, 2L, 2L, 2L, 1000000L),
      (1L, 3L, 2L, 2L, 2L, 1000000L)))
    // fixture graph: every minhash-found pair must appear in the exact
    // tier's uncapped output with the SAME verified score (precision 1);
    // every J = 1 pair of the exact output must be found (recall 1 on
    // identical sets)
    val edges = {
      val o = graft.Tables.orders(spark, Sf0)
        .select(col("o_orderkey"), col("o_custkey"))
      val l = graft.Tables.lineitem(spark, Sf0)
        .select(col("l_orderkey"), col("l_suppkey"))
      val pairs = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst")).distinct()
      pairs.union(pairs.select(col("dst"), col("src")))
    }
    val exact = Graph.neighborJaccard(edges, "src", "dst",
        minCommon = 1, k = 1000000)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val found = Graph.neighborJaccardMinHash(edges, "src", "dst",
        minCommon = 1, tauX1e6 = 0L)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(found.nonEmpty)
    found.foreach { r =>
      assert(exact.contains((r._1, r._2)), s"false pair $r")
      assert(exact((r._1, r._2)) == r, s"score mismatch $r")
    }
    val foundSet = found.map(r => (r._1, r._2)).toSet
    val identical = exact.values.filter(_._6 == 1000000L)
    assert(identical.nonEmpty) // the dense sf0.001 graph plants these
    identical.foreach(r => assert(foundSet.contains((r._1, r._2)),
      s"J=1 pair $r missed — identical sets must always collide"))
    // hot-bucket cap: star leaves {1,2,3} share neighbor set {0}, so
    // all three land in every band's bucket (size 3) — cap 2 skips the
    // bucket and the pairs vanish; uncapped finds all three
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val uncapped = Graph.neighborJaccardMinHash(star.toDF("src", "dst"),
        "src", "dst", minCommon = 1, tauX1e6 = 0L)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(uncapped.map(r => (r._1, r._2)).toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val capped = Graph.neighborJaccardMinHash(star.toDF("src", "dst"),
        "src", "dst", minCommon = 1, tauX1e6 = 0L, maxBucket = 2)
      .collect()
    assert(capped.isEmpty)
  }

  test("neighborJaccardMinHash bounds row size: signatures fold " +
      "incrementally (no full-graph collect), over-cap hubs verify " +
      "array-free, and both verify paths are bit-identical") {
    // dense-ish fixture with hubs: square + star + shared neighbors
    val base = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L),
      (9L, 0L), (9L, 1L), (9L, 2L), (9L, 3L), (8L, 0L), (8L, 2L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val df = base.toDF("src", "dst")
    def run(cap: Int) = Graph.neighborJaccardMinHash(df, "src", "dst",
        minCommon = 1, tauX1e6 = 0L, maxVerifyArrayDeg = cap)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val arrPath = run(Int.MaxValue) // every candidate on the array path
    val edgePath = run(1) // every candidate forced onto the edge path
    assert(arrPath.nonEmpty)
    assert(arrPath == edgePath,
      "array and edge-join verify paths must agree bit-for-bit")
    // a mixed cap (hub 9 with deg 4 over it, others under) must also
    // agree: pairs touching the hub go edge-path, the rest array-path
    assert(run(3) == arrPath,
      "mixed array/edge routing must agree bit-for-bit")
  }

  test("walk skip-grams: hand-checked symmetric window pairs") {
    // one walk 10,20,30,40 with window 2:
    // d=1 pairs: (10,20)(20,30)(30,40) + reverses
    // d=2 pairs: (10,30)(20,40) + reverses -> all counts 1
    val wdf = Seq((0L, 0L, 0L, 10L), (0L, 0L, 1L, 20L),
        (0L, 0L, 2L, 30L), (0L, 0L, 3L, 40L))
      .toDF("start", "rep", "step", "node")
    val got = Graph.walkSkipGrams(wdf, window = 2)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val fwd = Seq((10L, 20L), (20L, 30L), (30L, 40L), (10L, 30L),
      (20L, 40L))
    val want = (fwd ++ fwd.map(_.swap)).map { case (a, b) => (a, b, 1L) }
      .sorted
    assert(got == want)
    // two identical walks double every count
    val got2 = Graph.walkSkipGrams(wdf.union(
        wdf.withColumn("rep", lit(1L))), window = 2)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got2 == want.map { case (a, b, _) => (a, b, 2L) })
  }

  test("closenessSeeds: hand values on a path graph, hop bound clips " +
      "the horizon, isolated seed is NULL") {
    // path 0-1-2-3-4 (symmetrized); seed 0: hops 1+2+3+4=10, reached 4
    // -> closeness 0.4; seed 2 (center): 1+1+2+2=6 -> 4/6
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val seeds = Seq(0L, 2L, 9L).toDF("seed") // 9 isolated
    val got = Graph.closenessSeeds(path, "src", "dst", seeds, "seed", 10)
      .select("seed", "n_reached", "sum_hops")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got(0L) == ((4L, 10L)))
    assert(got(2L) == ((4L, 6L)))
    assert(got(9L) == ((0L, 0L)))
    val cNull = Graph.closenessSeeds(path, "src", "dst", seeds, "seed",
        10).where(col("seed") === 9L)
      .select("closeness").as[Option[Double]].head()
    assert(cNull.isEmpty)
    // maxHops=2 clips seed 0's horizon to {1,2}: 1+2=3
    val clipped = Graph.closenessSeeds(path, "src", "dst",
        Seq(0L).toDF("seed"), "seed", 2)
      .select("n_reached", "sum_hops").as[(Long, Long)].head()
    assert(clipped == ((2L, 3L)))
  }

  test("assortativity: star graph is perfectly disassortative (-1), " +
      "ring is degree-constant (undefined)") {
    // 4-leaf star, symmetrized: every edge joins deg 4 to deg 1
    val star = (1L to 4L).flatMap(l => Seq((0L, l), (l, 0L)))
      .toDF("src", "dst")
    val r = Graph.assortativity(star, "src", "dst")
      .select("m_edges", "assortativity").as[(Long, Double)].head()
    assert(r._1 == 8L)
    assert(math.abs(r._2 + 1.0) < 1e-12, r.toString)
    // a 4-ring: every endpoint degree 2 -> zero variance -> NULL
    val ring = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    assert(Graph.assortativity(ring, "src", "dst")
      .select("assortativity").as[Option[Double]].head().isEmpty)
  }

  test("modularity: two disconnected triangles under their own " +
      "partition hit the hand value; merged partition scores zero") {
    // triangles {0,1,2} and {3,4,5}, symmetrized: M = 12 directed edges
    val tri = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L),
        (3L, 5L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val byTri = (0L to 5L).map(n => (n, n / 3)).toDF("node", "grp")
    val r = Graph.modularity(tri, "src", "dst", byTri)
      .select("m_edges", "n_groups", "q_num", "q_den", "modularity")
      .as[(Long, Long, Long, Long, Double)].head()
    // per group: intra = 6, d = 6 -> term = 6*12 - 36 = 36; Q = 72/144
    assert(r == ((12L, 2L, 72L, 144L, 0.5)))
    // everything in ONE group: intra = M, d = M -> Q = (M*M - M^2)/M^2 = 0
    val one = (0L to 5L).map(n => (n, 0L)).toDF("node", "grp")
    assert(Graph.modularity(tri, "src", "dst", one)
      .select("modularity").as[Double].head() == 0.0)
  }

  test("bipartiteProject: co-occurrence weights, hub key capped BEFORE " +
      "the pair fan-out, duplicate incidences collapse") {
    // users 1,2 share {a,b}; user 3 adds {b,c}; user 9 is a bot touching
    // everything incl. d,e — over the cap, must contribute NOTHING
    val rows = Seq((1L, "a"), (1L, "b"), (1L, "b"), // dup incidence
      (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "c"),
      (9L, "a"), (9L, "b"), (9L, "c"), (9L, "d"), (9L, "e"))
    val got = Graph.bipartiteProject(rows.toDF("u", "item"), col("u"),
        col("item"), maxPerKey = 4)
      .as[(String, String, Long)].collect().toSeq.sorted
    assert(got == Seq(("a", "b", 2L), ("b", "c", 1L)))
    // without the cap the bot fans in: every pair gains user 9
    val uncapped = Graph.bipartiteProject(rows.toDF("u", "item"),
        col("u"), col("item"), maxPerKey = 100)
      .as[(String, String, Long)].collect().toSeq.sorted
    assert(uncapped.size == 10) // C(5,2) pairs
    assert(uncapped.contains(("a", "b", 3L)))
  }
}
