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

    // er_fellegi_sunter candidate volumes
    val recs0 = graft.Tables.part(s, sfDir).select(
      col("p_partkey").as("id"), col("p_name").as("name"),
      when(col("p_partkey") % 7 =!= 0, col("p_brand")).as("brand"),
      col("p_retailprice").as("price"))
    val keyed = recs0.select(col("id"), col("name"), col("brand"),
        col("price"),
        substring_index(col("name"), " ", 2).as("__fs_k0"),
        substring_index(col("name"), " ", -2).as("__fs_k1"))
      .repartition(col("id")).localCheckpoint()
    println(s"[scratch] N=${keyed.count()}")
    val base = keyed.select(col("id").as("__fs_id"), col("__fs_k0"),
      col("__fs_k1"))
    def blockPass(i: Int) =
      base.as("a").join(base.as("b"),
          col(s"a.__fs_k$i") === col(s"b.__fs_k$i") &&
            col("a.__fs_id") < col("b.__fs_id"))
        .select(col("a.__fs_id").as("id_a"), col("b.__fs_id").as("id_b"))
    var t = System.nanoTime()
    val p0 = blockPass(0); val p1 = blockPass(1)
    println(s"[scratch] pass0=${p0.count()} (${(System.nanoTime()-t)/1e9}s)")
    t = System.nanoTime()
    println(s"[scratch] pass1=${p1.count()} (${(System.nanoTime()-t)/1e9}s)")
    t = System.nanoTime()
    val pairs = p0.unionByName(p1).distinct()
    println(s"[scratch] distinct=${pairs.count()} (${(System.nanoTime()-t)/1e9}s)")
    // block-size distribution
    keyed.groupBy(col("__fs_k0")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)), max(col("n")), expr("percentile(n, 0.99)"),
        sum(col("n")*(col("n")-1)/2)).show(false)
    keyed.groupBy(col("__fs_k1")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)), max(col("n")), expr("percentile(n, 0.99)"),
        sum(col("n")*(col("n")-1)/2)).show(false)
    // scoring-join cost
    t = System.nanoTime()
    val aSide = keyed.select(col("id").as("id_a"), col("name").as("na"),
      col("brand").as("ba"), col("price").as("pa"))
    val bSide = keyed.select(col("id").as("id_b"), col("name").as("nb"),
      col("brand").as("bb"), col("price").as("pb"))
    val scored = pairs.join(aSide, "id_a").join(bSide, "id_b")
      .select(col("id_a"), col("id_b"),
        (when(col("na") === col("nb"), 1L).otherwise(0L) +
         when(col("ba") === col("bb"), 1L).otherwise(0L) +
         when(col("pa") === col("pb"), 1L).otherwise(0L)).as("n_agree"))
    println(s"[scratch] scored=${scored.count()} (${(System.nanoTime()-t)/1e9}s)")
    spark.stop()
  }
}
