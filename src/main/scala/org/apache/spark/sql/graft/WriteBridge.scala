package org.apache.spark.sql.graft

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOptions, ParquetUtils}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Commit message of one [[GraftParquetDataWriter]]: the staged file it
  * produced (empty when the task wrote no rows and deleted its file). */
case class GraftWrittenFiles(paths: Seq[String]) extends WriterCommitMessage

/** Executor-side parquet writing for the lake's DSv2 row-level write
  * path (SQL MERGE/UPDATE/DELETE): wraps Spark's OWN parquet
  * `OutputWriter` — the exact writer `df.write.parquet` uses, so staged
  * row-level files are byte-compatible with every other lake file
  * (INT64 TIMESTAMP_MICROS, footer stats usable, vectorized-reader
  * friendly) — behind a serializable `DataWriterFactory`.
  *
  * Lives under `org.apache.spark.sql` (like [[StreamBridge]]) because
  * `ParquetUtils.prepareWrite` and `OutputWriterFactory` are
  * `private[sql]`. */
object WriteBridge {

  /** A factory writing one parquet file per task under `stageDir`.
    * `prepareWrite` runs on the DRIVER (it configures the job conf with
    * the schema + compression); executors only deserialize the conf and
    * instantiate writers. */
  def parquetFactory(spark: SparkSession, stageDir: String,
      schema: StructType): DataWriterFactory = {
    val sqlConf = spark.sessionState.conf.clone()
    // the lake's standard: INT64 micros (stats-usable, interoperable),
    // never INT96 — same contract as VersionedTable.stageFiles
    sqlConf.setConfString("spark.sql.parquet.outputTimestampType",
      "TIMESTAMP_MICROS")
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val owf = ParquetUtils.prepareWrite(sqlConf, job, schema,
      new ParquetOptions(Map.empty[String, String], sqlConf))
    GraftParquetWriterFactory(owf,
      new SerializableConfiguration(job.getConfiguration), stageDir, schema)
  }
}

private case class GraftParquetWriterFactory(owf: OutputWriterFactory,
    conf: SerializableConfiguration, stageDir: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = {
    // fresh Configuration per writer: TaskAttemptContext mutates it
    val c = new Configuration(conf.value)
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graft-rowlevel", 0), TaskType.MAP, partitionId),
      (taskId % Int.MaxValue).toInt)
    val ctx = new TaskAttemptContextImpl(c, attempt)
    val path = s"$stageDir/part-$partitionId-${UUID.randomUUID()}.parquet"
    new GraftParquetDataWriter(
      owf.newInstance(path, schema, ctx), path, c, schema)
  }
}

private class GraftParquetDataWriter(
    out: org.apache.spark.sql.execution.datasources.OutputWriter,
    path: String, conf: Configuration, schema: StructType)
    extends DataWriter[InternalRow] {
  private val nCols = schema.fields.length
  private var rows = 0L
  private var proj: org.apache.spark.sql.catalyst.ProjectingInternalRow = _
  private var checked = false
  override def write(record: InternalRow): Unit = {
    // Group-based ReplaceData (SQL MERGE/UPDATE/DELETE) prepends the
    // __row_operation column, and Spark applies its row projection
    // ONLY when the operation declares metadata attributes
    // (ReplaceDataExec.writingTask picks the projection-less plain
    // task otherwise — connectors like Iceberg always declare metadata
    // columns, so the plain shape reaches writers unprojected). Rows
    // therefore arrive as [op | data...]: detect the one extra leading
    // field once per task and project it off; rows already matching
    // the schema write through untouched.
    if (!checked) {
      checked = true
      if (record.numFields == nCols + 1)
        // project ordinals 1..n (drop the leading operation column)
        proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(
          schema, (1 to nCols).toIndexedSeq)
      else require(record.numFields == nCols,
        s"row-level write row has ${record.numFields} fields, " +
          s"expected $nCols or ${nCols + 1}")
    }
    if (proj != null) { proj.project(record); out.write(proj) }
    else out.write(record)
    rows += 1
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    if (rows == 0L) { // nothing written: don't stage an empty file
      val p = new Path(path)
      p.getFileSystem(conf).delete(p, false)
      GraftWrittenFiles(Nil)
    } else GraftWrittenFiles(Seq(path))
  }
  override def abort(): Unit = {
    try out.close() catch { case scala.util.control.NonFatal(_) => () }
    val p = new Path(path)
    p.getFileSystem(conf).delete(p, false)
  }
  override def close(): Unit = ()
}
