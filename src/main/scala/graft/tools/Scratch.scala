package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
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

    def tradeEdges() = {
      val o = graft.Tables.orders(s, sfDir)
        .select(col("o_orderkey"), col("o_custkey"))
      val l = graft.Tables.lineitem(s, sfDir)
        .select(col("l_orderkey"), col("l_suppkey"))
      val pairs0 = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      pairs0.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
    }
    val nPart = s.sessionState.conf.numShufflePartitions

    def lpaRounds(e: DataFrame, iters: Int): Double = {
      val nodes = e.select(explode(array(col("src"), col("dst")))
        .as("node")).distinct()
      var labels = nodes.select(col("node"), col("node").as("lab"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      var i = 0
      while (i < iters) {
        val cnt = e.join(labels, e("src") === labels("node"))
          .groupBy(col("dst"), col("lab")).agg(count(lit(1)).as("c"))
        val pick = cnt.groupBy(col("dst"))
          .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("m"))
          .select(col("dst"), (-col("m.nl")).as("plab"))
        labels = labels.join(pick, labels("node") === pick("dst"), "left")
          .select(labels("node"), coalesce(col("plab"), col("lab")).as("lab"))
          .localCheckpoint()
        i += 1
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warmup (JIT + codegen)
    lpaRounds(tradeEdges().repartition(col("src")).localCheckpoint(), 3)

    // A: current (unnumbered repartition, AQE-on pin)
    var t = System.nanoTime()
    val eA = tradeEdges().repartition(col("src")).localCheckpoint()
    val bA = (System.nanoTime() - t) / 1e9
    println(s"[scratch] A build=$bA rounds=${lpaRounds(eA, 8)}")

    // B: one-stage AQE-off partitioned pin
    t = System.nanoTime()
    val eB = graft.operators.Pin.workingSetPartitioned(
      tradeEdges().repartition(nPart, col("src"))
        .sortWithinPartitions(col("src")))
    val bB = (System.nanoTime() - t) / 1e9
    println(s"[scratch] B build=$bB rounds=${lpaRounds(eB, 8)}")

    // C: two-stage (AQE build pin, then AQE-off layout pin)
    t = System.nanoTime()
    val p1 = tradeEdges().localCheckpoint()
    val eC = graft.operators.Pin.workingSetPartitioned(
      p1.repartition(nPart, col("src")).sortWithinPartitions(col("src")))
    val bC = (System.nanoTime() - t) / 1e9
    println(s"[scratch] C build=$bC rounds=${lpaRounds(eC, 8)}")

    // D: C's layout + broadcast-hinted label side per round
    def lpaRoundsB(e: DataFrame, iters: Int): Double = {
      val nodes = e.select(explode(array(col("src"), col("dst")))
        .as("node")).distinct()
      var labels = nodes.select(col("node"), col("node").as("lab"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      var i = 0
      while (i < iters) {
        val cnt = e.join(broadcast(labels), e("src") === labels("node"))
          .groupBy(col("dst"), col("lab")).agg(count(lit(1)).as("c"))
        val pick = cnt.groupBy(col("dst"))
          .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("m"))
          .select(col("dst"), (-col("m.nl")).as("plab"))
        labels = labels.join(pick, labels("node") === pick("dst"), "left")
          .select(labels("node"), coalesce(col("plab"), col("lab")).as("lab"))
          .localCheckpoint()
        i += 1
      }
      (System.nanoTime() - t0) / 1e9
    }
    println(s"[scratch] D rounds=${lpaRoundsB(eC, 8)}")
    // re-run A and C once more to bound drift
    val eA2 = tradeEdges().repartition(col("src")).localCheckpoint()
    println(s"[scratch] A2 rounds=${lpaRounds(eA2, 8)}")
    println(s"[scratch] C2 rounds=${lpaRounds(eC, 8)}")
    spark.stop()
  }
}
