package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1) else "32"
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
    graft.Tables.RequiredConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark

    // minhash candidate-stage cardinalities (graph_jaccard_minhash);
    // tradeEdges inlined (private in GraphOps)
    val o = graft.Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_custkey"))
    val l = graft.Tables.lineitem(s, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"))
    val pairs0 = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = pairs0.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val P = graft.functions.SketchUtil.MinhashP
    val perms = 16; val bands = 8; val rows = 2; val maxBucket = 200
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint()
    println(s"[scratch] |E|=${e.count()}")
    val sigAggs = count(lit(1)).cast("long").as("deg") +:
      (0 until perms).map { i =>
        val (a, b) = graft.functions.SketchUtil.minhashPerm(i)
        min(pmod(pmod(col("dst"), lit(P)) * lit(a) + lit(b), lit(P)))
          .as(s"__sig$i")
      }
    val sigs = e.groupBy(col("src").as("node"))
      .agg(sigAggs.head, sigAggs.tail: _*).localCheckpoint()
    println(s"[scratch] |V|=${sigs.count()}")
    val bandKeys = array((0 until bands).map { bd =>
      col(s"__sig${bd * rows}") * lit(P) + col(s"__sig${bd * rows + 1}")
    }: _*)
    val banded0 = sigs.select(col("node"),
      posexplode(bandKeys).as(Seq("band", "key")))
    val bcnt = banded0.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("__bn"))
    println(s"[scratch] buckets=${bcnt.count()} " +
      s"hot=${bcnt.filter(col("__bn") > maxBucket).count()}")
    val banded = banded0.join(
      bcnt.filter(col("__bn") <= maxBucket).select(col("band"), col("key")),
      Seq("band", "key"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.node") < col("y.node"))
      .select(col("x.node").as("a"), col("y.node").as("b"))
    val t0 = System.nanoTime()
    println(s"[scratch] candRaw=${cand.count()}  " +
      s"(${(System.nanoTime()-t0)/1e9}s)")
    val t1 = System.nanoTime()
    val candD = cand.distinct()
    println(s"[scratch] candDistinct=${candD.count()}  " +
      s"(${(System.nanoTime()-t1)/1e9}s)")
    // degree distribution of candidate nodes
    val candNodes = candD.select(col("a").as("node"))
      .union(candD.select(col("b").as("node"))).distinct()
    println(s"[scratch] candNodes=${candNodes.count()}")
    val degq = sigs.select(col("node"), col("deg"))
      .join(candNodes, "node")
      .agg(sum(col("deg")), max(col("deg")), expr("percentile(deg, 0.99)"))
    degq.show(false)
    // verify-stage cost: arrays
    val t2 = System.nanoTime()
    val adjC = e.groupBy(col("src").as("node"))
      .agg(sort_array(collect_set(col("dst"))).as("nbrs")).localCheckpoint()
    println(s"[scratch] adjC build ${(System.nanoTime()-t2)/1e9}s")
    val t3 = System.nanoTime()
    val nCommonArr = candD
      .join(adjC.select(col("node").as("a"), col("nbrs").as("__na")), "a")
      .join(adjC.select(col("node").as("b"), col("nbrs").as("__nb")), "b")
      .select(col("a"), col("b"),
        graft.functions.VectorFunctions.set_intersect_count(
          col("__na"), col("__nb")).as("n_common"))
      .filter(col("n_common") >= 2)
    println(s"[scratch] nCommon>=2: ${nCommonArr.count()}  " +
      s"(${(System.nanoTime()-t3)/1e9}s)")
    // degree-compatibility prefilter selectivity (tau = 0.5)
    val tau = 500000L
    val dg = sigs.select(col("node"), col("deg"))
    val candDeg = candD
      .join(dg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(dg.select(col("node").as("b"), col("deg").as("db")), "b")
    val kept = candDeg.filter(
      least(col("da"), col("db")) * lit(1000000L) >=
        lit(tau) * greatest(col("da"), col("db")))
    println(s"[scratch] candDegFiltered=${kept.count()}")
    // final output size (J >= tau, n >= 2)
    val fin = nCommonArr
      .join(dg.select(col("node").as("a"), col("deg").as("deg_a")), "a")
      .join(dg.select(col("node").as("b"), col("deg").as("deg_b")), "b")
      .withColumn("jx", expr("n_common * 1000000 div (deg_a + deg_b - n_common)"))
      .filter(col("jx") >= tau)
    println(s"[scratch] finalPairs=${fin.count()}")
    spark.stop()
  }
}
