package graft.queries

import graft.Tables
import graft.operators.split.RangeSplitter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ColUtil._

/** Partitioned-ingest query surface (SURVEY.md §2.9 X1-X6): the split
  * planner's union-of-range-scans must be indistinguishable from the plain
  * scan — the oracle reads the whole table, so any slice gap/overlap fails
  * the exact compare. */
object SplitOps {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // X1: long-key split of lineitem into 8 range scans, unioned back
    "split_scan_union" -> ((s, d) => {
      RangeSplitter.splitScan(Tables.lineitem(s, d), "l_orderkey", 8)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_rows"),
          sum(money(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy(col("l_orderkey"))
    }),

    // X2 time domain: day-accuracy split of orders on o_orderdate into 6
    // range scans, unioned back — must equal the plain scan exactly
    "split_scan_time" -> ((s, d) => {
      RangeSplitter.splitScanTime(Tables.orders(s, d), "o_orderdate", 6)
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("n_orders"),
          sum(money(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy(col("yr"))
    }),

    // X2 string domain: base-128 split of customer on c_name (fixed-width
    // ASCII keys) into 5 range scans, unioned back
    "split_scan_string" -> ((s, d) => {
      RangeSplitter.splitScanString(Tables.customer(s, d), "c_name", 5)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
        .orderBy(col("c_custkey"))
    }),

    // X2 ns accuracy: sub-microsecond split of events on its epoch-nanos
    // ts into 6 range scans, unioned back — the union must equal the
    // plain scan exactly (output µs-truncated only because DuckDB's
    // parquet reader can't see below µs; the SPLIT math runs at ns)
    "split_scan_nanos" -> ((s, d) => {
      RangeSplitter.splitScanNanos(Tables.events(s, d), "ts", 6,
          accuracy = "ns")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          min(expr("ts div 1000")).as("min_us"),
          max(expr("ts div 1000")).as("max_us"))
        .orderBy(col("event_type"))
    }),

    // X4: querySql split — one union branch per raw SQL statement
    // (reference runs one task per statement); the three year-range
    // slices partition orders, so the union must equal the single
    // whole-table aggregation the oracle runs
    "querysql_split" -> ((s, d) => {
      Tables.registerAll(s, d)
      val stmt = (w: String) =>
        s"""SELECT year(o_orderdate) AS yr, count(*) AS n_orders,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE)
           |    AS sum_price
           |FROM orders WHERE $w GROUP BY year(o_orderdate)""".stripMargin
      graft.sources.QuerySqlReader.read(s, graft.sources.ReaderConfig(
        table = graft.sources.TableId(name = "orders"),
        querySql = Seq(
          stmt("year(o_orderdate) < 1994"),
          stmt("year(o_orderdate) BETWEEN 1994 AND 1995"),
          stmt("year(o_orderdate) >= 1996"))))
        .orderBy(col("yr"))
    }),

    // S5-S9 live: the full JDBC runtime round-trip against embedded Derby
    // (the one live DBMS on this classpath) — parquet source -> dialect
    // DDL -> ResilientBatchWriter over real connections in Tx mode ->
    // bounds-probed split read back (one JDBC session per slice). The
    // oracle reads the parquet directly, so any row lost/duplicated/
    // mistyped anywhere in the write-read cycle fails the exact compare.
    // Text-format source paths end-to-end: the corpus written to JSONL
    // (the interchange format LLM corpora actually ship as) and read
    // back through the JSON source with an explicit schema — the read
    // must be byte-identical to the parquet fixture. Escaping (quotes,
    // newlines, unicode) is pinned by SourcesSpec on adversarial rows;
    // the fixture pins the bulk path.
    "source_jsonl_roundtrip" -> ((s, d) => {
      val src = Tables.documents(s, d)
      val dir = s"/tmp/graft_jsonl_${Integer.toHexString(d.hashCode)}"
      src.write.mode("overwrite").json(dir)
      s.read.schema(src.schema).json(dir)
        .orderBy(col("doc_id"))
    }),

    // Same contract through the CSV source: RFC-4180 quoting (escape =
    // quote char), multiLine read for embedded newlines, \N as the
    // null sentinel so NULL and '' survive distinctly.
    "source_csv_roundtrip" -> ((s, d) => {
      val src = Tables.documents(s, d)
      val dir = s"/tmp/graft_csv_${Integer.toHexString(d.hashCode)}"
      src.write.mode("overwrite")
        .option("quoteAll", true).option("escape", "\"")
        .option("nullValue", "\\N")
        .csv(dir)
      s.read.schema(src.schema)
        .option("multiLine", true).option("escape", "\"")
        .option("nullValue", "\\N")
        .csv(dir)
        .orderBy(col("doc_id"))
    }),

    // Hive-style partitioned layout: write partitioned by the scan's
    // hottest predicate column, read back ONE partition — values must
    // round-trip exactly and the filter must prune at the LISTING level
    // (PartitionFilters, asserted in PlanSpec): at 100 TB the
    // difference between reading one directory and reading them all.
    "source_partitioned_roundtrip" -> ((s, d) => {
      val src = Tables.events(s, d).select(col("event_id"),
        col("user_id"), col("event_type"), col("value"))
      val dir = s"/tmp/graft_part_${Integer.toHexString(d.hashCode)}"
      src.write.mode("overwrite").partitionBy("event_type").parquet(dir)
      s.read.parquet(dir)
        .where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
        .orderBy(col("event_id"))
    }),

    // The third columnar format Spark ships natively: ORC write + read
    // must round-trip the fixture exactly (decimal/timestamp fidelity
    // differs from parquet's physical encodings — this pins it).
    "source_orc_roundtrip" -> ((s, d) => {
      val src = Tables.supplier(s, d)
      val dir = s"/tmp/graft_orc_${Integer.toHexString(d.hashCode)}"
      src.write.mode("overwrite").orc(dir)
      s.read.schema(src.schema).orc(dir)
        .orderBy(col("s_suppkey"))
    }),

    "jdbc_live_roundtrip" -> ((s, d) => {
      import graft.sources._
      JdbcLive.ensureDerbyRegistered()
      val url =
        s"jdbc:derby:memory:graft_rt_${Integer.toHexString(d.hashCode)};create=true"
      val src = Tables.supplier(s, d)
      val t = TableId(name = "supplier_rt")
      JdbcLive.dropTableIfExists(url, DerbyStyle, t)
      JdbcLive.createTable(url, DerbyStyle, t, src.schema)
      val dlq = JdbcLive.write(src, url, WriterConfig(table = t,
        batchSize = 200, execMode = graft.sinks.ExecMode.Tx), DerbyStyle)
      require(dlq.isEmpty, "live JDBC write quarantined rows")
      JdbcLive.read(s, url, ReaderConfig(table = t,
          split = SplitConfig(key = "s_suppkey"), numPartitions = 8),
          DerbyStyle)
        .orderBy(col("s_suppkey"))
    }),

    // The reference's deployment shape end-to-end on a live DBMS:
    // reader + writer job JSONs (the reference's wire format) drive
    // DB -> DB ETL over Derby — live bounds probe, one JDBC session
    // per split slice, preSQL clearing the target (idempotent re-runs),
    // the Tx batch writer, postSQL stamping an audit row ON the DBMS.
    // The copied table read back must equal the oracle's filtered
    // projection of the source fixture.
    "jdbc_job_json" -> ((s, d) => {
      import graft.sources._
      JdbcLive.ensureDerbyRegistered()
      val url =
        s"jdbc:derby:memory:graft_job_${Integer.toHexString(d.hashCode)};create=true"
      val src = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      val srcT = TableId(name = "customer_src")
      val dstT = TableId(name = "customer_dst")
      val logT = TableId(name = "job_log")
      JdbcLive.dropTableIfExists(url, DerbyStyle, srcT)
      JdbcLive.dropTableIfExists(url, DerbyStyle, dstT)
      JdbcLive.dropTableIfExists(url, DerbyStyle, logT)
      JdbcLive.createTable(url, DerbyStyle, srcT, src.schema)
      JdbcLive.createTable(url, DerbyStyle, dstT, src.schema)
      JdbcLive.createTable(url, DerbyStyle, logT,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("run_marker",
            org.apache.spark.sql.types.LongType))))
      val seedDlq = JdbcLive.write(src, url,
        WriterConfig(table = srcT, batchSize = 500), DerbyStyle)
      require(seedDlq.isEmpty, "seed load quarantined rows")
      val readerJson =
        """{"connection": {"table": {"name": "customer_src"}},
          | "column": ["c_custkey", "c_name", "c_nationkey"],
          | "where": "\"c_nationkey\" < 10",
          | "split": {"key": "c_custkey"}}""".stripMargin
      val writerJson =
        """{"connection": {"table": {"name": "customer_dst"}},
          | "writeMode": "insert", "execMode": "Tx", "batchSize": 300,
          | "preSQL": ["delete from \"customer_dst\"",
          |            "delete from \"job_log\""],
          | "postSQL": ["insert into \"job_log\" values (1)"]}""".stripMargin
      val dlq = JobRunner.runLive(s, readerJson, writerJson, url, url,
        DerbyStyle, numSplits = 6)
      require(dlq.isEmpty, "job quarantined rows")
      val logged = JdbcLive.read(s, url,
        ReaderConfig(table = logT), DerbyStyle).count()
      require(logged == 1, s"post hook must stamp exactly one row, got $logged")
      JdbcLive.read(s, url, ReaderConfig(table = dstT,
          split = SplitConfig(key = "c_custkey"), numPartitions = 4),
          DerbyStyle)
        .orderBy(col("c_custkey"))
    }),

    // A1/A2: the bounds probe itself (fetchMin/fetchMax)
    "split_min_max_probe" -> ((s, d) => {
      Tables.lineitem(s, d)
        .agg(min(col("l_orderkey")).as("min_key"),
          max(col("l_orderkey")).as("max_key"),
          count(lit(1)).as("n_rows"))
    })
  )

  val oracles: Map[String, String] = Map(
    "split_scan_union" ->
      """SELECT l_orderkey, COUNT(*) AS n_rows,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "split_scan_time" ->
      """SELECT YEAR(o_orderdate) AS yr, COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin,

    "split_scan_string" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "split_scan_nanos" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  MIN(epoch_us(ts)) AS min_us, MAX(epoch_us(ts)) AS max_us
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    "querysql_split" ->
      """SELECT YEAR(o_orderdate) AS yr, COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin,

    "jdbc_live_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
        |ORDER BY s_suppkey""".stripMargin,

    "source_jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin,

    "source_orc_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
        |ORDER BY s_suppkey""".stripMargin,

    "source_csv_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin,

    "source_partitioned_roundtrip" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "jdbc_job_json" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE c_nationkey < 10 ORDER BY c_custkey""".stripMargin,

    "split_min_max_probe" ->
      """SELECT MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key,
        |  COUNT(*) AS n_rows FROM lineitem""".stripMargin
  )
}
