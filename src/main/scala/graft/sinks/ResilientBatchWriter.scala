package graft.sinks

import graft.sources.WriterConfig
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

/** Executor-side row sink: one instance per partition (the analogue of the
  * reference's per-task writer, writer/task.go:17-32). `writeBatch` must
  * either write all rows or throw. */
trait RowSink extends Serializable {
  def open(partitionId: Int): Unit = {}
  def writeBatch(rows: Seq[Row]): Unit
  def close(): Unit = {}
}

/** Error classification — the reference's pluggable Judger surface
  * (database/table.go:72-77; MySQL mysql/table.go:72-85, Oracle
  * oracle/table.go:72-80): transient errors retry the whole batch, data
  * errors degrade to row-wise replay. */
trait RetryJudge extends Serializable {
  def shouldRetry(e: Throwable): Boolean
  def isDataError(e: Throwable): Boolean
}

object RetryJudge {
  /** Default: nothing retries, everything is a data error (degrade path). */
  val dataErrorsOnly: RetryJudge = new RetryJudge {
    def shouldRetry(e: Throwable): Boolean = false
    def isDataError(e: Throwable): Boolean = true
  }
}

/** Resilient batched writer — the reference's write path (SURVEY.md §2.11
  * W2-W6) as a Spark-native sink:
  *
  *  - W2 batch buffer with dual flush (size >= batchSize OR age >=
  *    batchTimeout — the timeout only matters for slow upstream iterators,
  *    e.g. foreachBatch over a trickle stream);
  *  - W4 whole-batch retry while `judge.shouldRetry`;
  *  - W5 one-by-one degrade on data errors: the failed batch replays
  *    row-wise and bad rows land in the returned DLQ DataFrame (original
  *    row as JSON + error message) instead of failing the job — Spark has
  *    no built-in for this (badRecordsPath is read-side only);
  *  - W6 terminal flush on iterator exhaustion; sink close in finally.
  *
  * Scale: pure mapPartitions — no driver involvement, no shuffle; DLQ rows
  * stream back as the transform's output so callers decide where to land
  * them (`write(df).write.parquet(dlqPath)`).
  */
object ResilientBatchWriter {

  val DlqSchema: StructType = StructType(Seq(
    StructField("row_json", StringType, nullable = true),
    StructField("error", StringType, nullable = true)))

  /** Runs the write as a Spark job; returns the DLQ as a DataFrame of
    * (row_json, error). The side-effecting sink writes run exactly once
    * inside this call: the DLQ RDD is persisted and materialized (count)
    * before returning, so callers can run any number of actions on the
    * returned frame without re-executing the writes. Callers that are
    * fully done with the DLQ may `df.unpersist()` it. */
  def write(df: DataFrame, cfg: WriterConfig, judge: RetryJudge,
      sinkFactory: Int => RowSink): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    val batchSize = cfg.batchSize
    val timeoutMs = cfg.batchTimeout.toMillis
    val retries = cfg.retries
    val ignoreRowErrors = cfg.ignoreOneByOneError

    val dlqRdd = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val sink = sinkFactory(pid)
      sink.open(pid)
      val dlq = ArrayBuffer.empty[Row]
      val buf = ArrayBuffer.empty[Row]
      var lastFlush = System.nanoTime()

      def writeWithRetry(rows: Seq[Row]): Unit = {
        var attempt = 0
        var done = false
        while (!done) {
          try { sink.writeBatch(rows); done = true }
          catch {
            case NonFatal(e) if attempt < retries && judge.shouldRetry(e) =>
              attempt += 1
            case NonFatal(e) if judge.isDataError(e) =>
              // W5: row-wise replay; quarantine the bad rows
              rows.foreach { r =>
                try sink.writeBatch(Seq(r))
                catch {
                  case NonFatal(re) =>
                    if (!ignoreRowErrors && !judge.isDataError(re)) throw re
                    dlq += Row(r.json, String.valueOf(re.getMessage))
                }
              }
              done = true
          }
        }
      }

      def flush(): Unit = if (buf.nonEmpty) {
        writeWithRetry(buf.toSeq)
        buf.clear()
        lastFlush = System.nanoTime()
      }

      try {
        it.foreach { r =>
          buf += r
          val aged = (System.nanoTime() - lastFlush) / 1000000L >= timeoutMs
          if (buf.size >= batchSize || aged) flush()
        }
        flush() // W6 terminal flush
      } finally sink.close()
      dlq.iterator
    }
    // Pin the side effects: one job evaluates every partition now; later
    // actions on the returned DLQ read the cached rows, never the sink.
    val out = spark.createDataFrame(dlqRdd, DlqSchema).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    out
  }
}
