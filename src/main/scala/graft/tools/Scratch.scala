package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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

    // replicate randomWalks adj + one step
    val o = graft.Tables.orders(s, sfDir).select(col("o_orderkey"), col("o_custkey"))
    val l = graft.Tables.lineitem(s, sfDir).select(col("l_orderkey"), col("l_suppkey"))
    val pairs = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val e = pairs.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val degs = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val nPart = s.sessionState.conf.numShufflePartitions
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val adj = e.select(col("src"),
        (row_number().over(Window.partitionBy(col("src")).orderBy(col("dst"))) - 1)
          .cast("long").as("rk"), col("dst"))
      .join(degs.select(col("node").as("dst"), col("deg").as("dst_deg")), Seq("dst"), "left")
      .repartition(nPart, col("src"), col("rk"))
      .sortWithinPartitions(col("src"), col("rk"))
      .localCheckpoint()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    println("[scratch] adj partitioning preserved? plan:")
    println(adj.queryExecution.executedPlan.toString.take(400))
    val frontier = degs
      .select(col("node").as("start"), explode(sequence(lit(0), lit(1))).as("rep"), col("deg"))
      .select(col("start"), col("rep").cast("long").as("rep"),
        col("start").as("cur"), col("deg").as("cur_deg"))
      .localCheckpoint()
    val draw = graft.functions.HashFunctions.md5_u32(
      concat(col("start").cast("string"), lit("#"), col("rep").cast("string"), lit("#0")))
    val idx = frontier.where(col("cur_deg").isNotNull)
      .select(col("start"), col("rep"), col("cur"), pmod(draw, col("cur_deg")).as("idx"))
    val step = idx.join(adj, idx("cur") === adj("src") && idx("idx") === adj("rk"))
      .select(col("start"), col("rep"), col("dst").as("cur"), col("dst_deg").as("cur_deg"))
    step.write.format("noop").mode("overwrite").save()
    println("[scratch] step executed plan:")
    println(step.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
