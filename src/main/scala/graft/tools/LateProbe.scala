package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Empirically pin the late-row drop boundary: watermark after batch 1
  * = max(event_time) - 10min. Batch 2 carries rows AT the watermark,
  * 1us before, 1us after. Which survive an append-mode windowed agg? */
object LateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("late-probe").config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("lateprobe").toString
    val src = new java.io.File(base, "src"); src.mkdirs()
    def stage(rows: Seq[(java.sql.Timestamp, String)], name: String, mt: Long): Unit = {
      val tmp = new java.io.File(base, s"st-$name").toString
      rows.toDF("event_time", "k").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles.find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(src, s"$name.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath); dst.setLastModified(mt); ()
    }
    def ts(us: Long) = new java.sql.Timestamp(us / 1000) // ms precision here
    val H = 3600L * 1000000L
    // batch1 max event time = t0 + 2H  => wm after b1 = t0 + 2H - 10min
    val t0 = 1600000000L * 1000000L
    val wm = t0 + 2 * H - 600L * 1000000L
    // align wm exactly on an hour boundary: max(b1) = t0 + 2H + 10min
    // => wm = t0 + 2H. Batch-2 windows: [t0, t0+H) end t0+H < wm
    // (dropped?), [t0+H, t0+2H) end == wm (boundary), [t0+2H, ...) end
    // > wm (kept in state).
    stage(Seq((ts(t0), "b1a"), (ts(t0 + 2 * H + 600L * 1000000L), "b1max")),
      "b1", System.currentTimeMillis - 100000)
    stage(Seq((ts(t0 + 1000000L), "end_lt_wm"),
      (ts(t0 + H + 1000000L), "end_eq_wm"),
      (ts(t0 + 2 * H + 1000000L), "end_gt_wm")), "b2",
      System.currentTimeMillis - 50000)
    // batch 3: a row into the [t0, t0+H) window AFTER two batches have
    // advanced the watermark past its end twice over
    stage(Seq((ts(t0 + 2000000L), "b3_very_late"),
      (ts(t0 + 2 * H + 2000000L), "b3_live")), "b3",
      System.currentTimeMillis - 25000)
    val stream = spark.readStream.schema("event_time TIMESTAMP, k STRING")
      .option("maxFilesPerTrigger", 1).parquet(src.toString)
    val agg = stream.withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "1 hour"))
      .agg(count(lit(1)).as("n"), collect_list(col("k")).as("ks"))
    val out = new java.io.File(base, "out").toString
    val q = agg.select(unix_micros(col("window.start")).as("ws"), col("n"), col("ks"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", new java.io.File(base, "ck").toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    println("PROGRESS_DROPPED=" + q.recentProgress.map(p =>
      p.stateOperators.map(_.numRowsDroppedByWatermark).sum).sum)
    q.recentProgress.foreach(p => println(
      s"BATCH ${p.batchId} rows=${p.numInputRows} wm=${p.eventTime.get("watermark")}"))
    val res = spark.read.parquet(out).orderBy("ws").collect()
    res.foreach(r => println(s"WIN ${r.getLong(0)} n=${r.getLong(1)} ks=${r.getSeq[String](2).sorted.mkString(",")}"))
    spark.stop()
  }
}
