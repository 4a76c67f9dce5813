package graft.sources

import graft.operators.split.RangeSplitter
import graft.sinks.ParquetUpsert
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** End-to-end execution of the reference's JSON job wire format — the
  * full lifecycle its engine runs (reader job -> split -> exchange ->
  * writer job, /root/reference/database/dbms/reader/job.go:122-187 +
  * writer/job.go:54-109), re-planned on Catalyst:
  *
  *  - the reader resolves its table against a registered temp view or a
  *    parquet dataset directory, applies the projection + raw `where`
  *    text, then the split plan: one union branch per `querySql`
  *    statement (X4), or the key-range splitter (X1-X3, X5) over the
  *    split key — Catalyst flattens the union and schedules the
  *    branches concurrently, which is the reference's task-per-slice
  *    parallelism without per-task sessions;
  *  - the writer honors pre/post SQL hooks (select forbidden,
  *    writer/config.go:167-175), the writeMode insert|replace split
  *    (S7/S8: parquet append vs key-upsert), and the column projection.
  *
  * This is the config-driven face of the engine: everything it does is
  * also reachable as plain DataFrame calls; a JSON job is just a plan
  * description, not a separate execution engine.
  */
object JobRunner {

  /** Register each `<dir>/<name>.parquet` as a temp view so JSON jobs'
    * table/querySql references resolve (the "connected source"). */
  def registerDataset(spark: SparkSession, dir: String,
      tables: Seq[String]): Unit =
    tables.foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }

  /** Run a reader config: projection + where + split plan. `numSplits`
    * mirrors the job's requested task count (reader/job.go:133-135:
    * degenerate to one task when no key or n == 1). */
  def read(spark: SparkSession, cfg: ReaderConfig,
      numSplits: Int = 1): DataFrame = {
    if (cfg.querySql.nonEmpty) return QuerySqlReader.read(spark, cfg)
    val base0 = spark.table(cfg.table.name)
    val base =
      if (cfg.columns == Seq("*")) base0
      else base0.select(cfg.columns.map(col): _*)
    val filtered =
      if (cfg.where.isEmpty) base else base.filter(expr(cfg.where))
    val key = cfg.split.key
    if (key.isEmpty || numSplits <= 1) filtered // X5 degenerate split
    else {
      import org.apache.spark.sql.types._
      base0.schema(key).dataType match {
        case _: StringType =>
          RangeSplitter.splitScanString(filtered, key, numSplits)
        case _: TimestampType | _: TimestampNTZType =>
          val unitMicros = RangeSplitter.AccuracyNanos
            .getOrElse(cfg.split.timeAccuracy.toLowerCase,
              throw new IllegalArgumentException(
                s"unknown timeAccuracy '${cfg.split.timeAccuracy}'")) /
            1000L match { case 0L => 1L; case m => m }
          RangeSplitter.splitScanTime(filtered, key, numSplits, unitMicros)
        case _ => RangeSplitter.splitScan(filtered, key, numSplits)
      }
    }
  }

  /** Run a writer config against a parquet target: pre hooks, then
    * insert (append) or replace (upsert by `keys`), then post hooks.
    * Returns the rows written. */
  def write(df: DataFrame, targetDir: String, cfg: WriterConfig,
      keys: Seq[String] = Seq.empty): Long = {
    cfg.validateHookSql.left.foreach(m =>
      throw new IllegalArgumentException(m))
    val out = if (cfg.columns.isEmpty) df
      else df.select(cfg.columns.map(col): _*)
    val spark = df.sparkSession
    ParquetUpsert.withHooks(spark, cfg.preSql, cfg.postSql) {
      cfg.writeMode match {
        case "insert" =>
          out.write.mode("append").parquet(targetDir)
        case "replace" =>
          require(keys.nonEmpty, "replace mode needs upsert keys")
          ParquetUpsert.upsert(out, targetDir, keys)
        case other =>
          throw new IllegalArgumentException(s"unknown writeMode: $other")
      }
    }
    spark.read.parquet(targetDir).count()
  }

  /** Full job: parse both JSON specs, read, write. */
  def run(spark: SparkSession, readerJson: String, writerJson: String,
      targetDir: String, numSplits: Int = 1,
      upsertKeys: Seq[String] = Seq.empty): Long = {
    val rc = ConfigJson.reader(readerJson)
    val wc = ConfigJson.writer(writerJson)
    write(read(spark, rc, numSplits), targetDir, wc, upsertKeys)
  }

  /** S10 live: pre/post SQL hooks run ON the DBMS connection, exactly
    * where the reference runs them (writer/job.go:64-93 executes each
    * statement against the writer's Execer before/after the job); the
    * select guard has already rejected queries at config validation
    * (writer/config.go:167-175). */
  def execHooksLive(url: String, sql: Seq[String]): Unit =
    if (sql.nonEmpty)
      scala.util.Using.resource(JdbcLive.connect(url)) { c =>
        scala.util.Using.resource(c.createStatement()) { st =>
          sql.foreach(st.executeUpdate)
        }
      }

  /** The reference's actual deployment shape, end-to-end on a live
    * DBMS: a reader job JSON (projection + where + split key) and a
    * writer job JSON (mode/batch/hooks) drive DB -> DB ETL — split
    * bounds probed live, one JDBC session per slice, pre hooks, the
    * resilient batch writer, post hooks. `numSplits` is the
    * framework-side channel count (reader/job.go:133-135), passed
    * separately from the config exactly as the reference does.
    * Returns the writer's DLQ frame. */
  def runLive(spark: SparkSession, readerJson: String, writerJson: String,
      srcUrl: String, dstUrl: String, dialect: SqlDialect,
      numSplits: Int = 1): DataFrame = {
    val rc = ConfigJson.reader(readerJson).copy(numPartitions = numSplits)
    val wc = ConfigJson.writer(writerJson)
    wc.validateHookSql.left.foreach(m => throw new IllegalArgumentException(m))
    val df = JdbcLive.read(spark, srcUrl, rc, dialect)
    execHooksLive(dstUrl, wc.preSql)
    val dlq = JdbcLive.write(df, dstUrl, wc, dialect)
    execHooksLive(dstUrl, wc.postSql)
    dlq
  }
}
