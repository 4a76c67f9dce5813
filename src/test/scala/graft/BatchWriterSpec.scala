package graft

import graft.sinks.{ParquetUpsert, ResilientBatchWriter, RetryJudge, RowSink}
import graft.sources.WriterConfig
import graft.sources.TableId
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** W2-W6 write-path semantics: dual flush batching, whole-batch retry on
  * transient errors, one-by-one degrade with DLQ on data errors, terminal
  * flush, and the replace-mode upsert. Sinks record into static state
  * (local-mode executors share the JVM). */
object BatchWriterSpec {
  val written = new ConcurrentLinkedQueue[Seq[String]]()
  val batches = new ConcurrentLinkedQueue[Int]()
  @volatile var transientFailures = 0

  class RecordingSink(failKey: String, transientFirstN: Int)
      extends RowSink {
    private var seenTransient = 0
    def writeBatch(rows: Seq[Row]): Unit = {
      if (transientFirstN > 0 && transientFailures < transientFirstN) {
        transientFailures += 1
        throw new java.io.IOException("transient: connection reset")
      }
      if (rows.exists(_.getString(1).contains(failKey)))
        throw new IllegalArgumentException(
          if (rows.size > 1) "data error in batch" else "bad row")
      batches.add(rows.size)
      written.add(rows.map(_.getString(1)))
    }
  }

  val judge: RetryJudge = new RetryJudge {
    def shouldRetry(e: Throwable): Boolean = e.isInstanceOf[java.io.IOException]
    def isDataError(e: Throwable): Boolean =
      e.isInstanceOf[IllegalArgumentException]
  }
}

class BatchWriterSpec extends SparkSpec {
  import spark.implicits._
  import BatchWriterSpec._

  private def reset(): Unit = {
    written.clear(); batches.clear(); transientFailures = 0
  }

  private def df(n: Int) =
    spark.range(n).select($"id", concat(lit("row"), $"id").as("v"))
      .coalesce(1)

  private val cfg = WriterConfig(table = TableId(name = "t"), batchSize = 10)

  test("batches flush at batchSize with terminal flush (W2/W6)") {
    reset()
    val dlq = ResilientBatchWriter.write(df(25), cfg, judge,
      _ => new RecordingSink("-none-", 0))
    assert(dlq.count() == 0)
    assert(batches.asScala.toSeq.sorted == Seq(5, 10, 10))
    assert(written.asScala.flatten.size == 25)
  }

  test("transient errors retry the whole batch (W4)") {
    reset()
    val dlq = ResilientBatchWriter.write(df(8), cfg, judge,
      _ => new RecordingSink("-none-", 2))
    assert(dlq.count() == 0)
    assert(transientFailures == 2)
    assert(written.asScala.flatten.size == 8)
  }

  test("data errors degrade one-by-one; bad rows land in DLQ (W5)") {
    reset()
    val dlq = ResilientBatchWriter.write(df(20),
      cfg.copy(ignoreOneByOneError = true), judge,
      _ => new RecordingSink("row7", 0)).cache()
    assert(dlq.count() == 1)
    val d = dlq.head()
    assert(d.getString(0).contains("row7") && d.getString(1) == "bad row")
    assert(written.asScala.flatten.size == 19)
    assert(!written.asScala.flatten.toSeq.contains("row7"))
  }

  test("retries exhausted on persistent transient error -> propagates") {
    reset()
    intercept[org.apache.spark.SparkException] {
      ResilientBatchWriter.write(df(5), cfg.copy(retries = 1), judge,
        _ => new RecordingSink("-none-", 100)).count()
    }
  }

  test("parquet upsert: replace-by-key semantics (S8 analogue)") {
    val dir = java.nio.file.Files.createTempDirectory("upsert").toString
    val path = s"$dir/t"
    spark.range(5).select($"id", lit("old").as("v"))
      .write.parquet(path)
    val updates = spark.range(3, 8).select($"id", lit("new").as("v"))
    ParquetUpsert.upsert(updates, path, Seq("id"))
    val out = spark.read.parquet(path)
    assert(out.count() == 8)
    assert(out.filter($"v" === "new").count() == 5)
    assert(out.filter($"id" < 3 && $"v" === "old").count() == 3)
  }

  test("pre/post sql hooks reject select (S10 guard)") {
    intercept[IllegalArgumentException] {
      ParquetUpsert.withHooks(spark, Seq("select 1"), Nil)(())
    }
    val cfgBad = WriterConfig(table = TableId(name = "t"),
      preSql = Seq("SELECT * from x"))
    assert(cfgBad.validateHookSql.isLeft)
    assert(cfg.validateHookSql.isRight)
  }
}
