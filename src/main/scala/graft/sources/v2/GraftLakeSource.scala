package graft.sources.v2

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, WriteBuilder}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, InsertableRelation}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sinks.VersionedTable

/** DataSource V2 face of the versioned lake — the Spark-native
  * realization of the reference's pluggable source registry
  * (`/root/reference/database/dialect.go:9-27` registers dialects by
  * name; Spark's `DataSourceRegister` SPI registers formats by name),
  * so plain `spark.read.format("graft")` / SQL users reach snapshot
  * reads without touching the library API:
  *
  * {{{
  *   spark.read.format("graft").load(root)                    // head
  *   spark.read.format("graft")
  *     .option("versionAsOf", 3).load(root)                   // version
  *     .option("timestampAsOf", "2026-08-15 12:00:00")        // time
  *     .option("tag", "train-v1")                             // release
  * }}}
  *
  * Scale design: the scan builder receives Spark's pushed filters and
  * required columns, prunes the PINNED manifest's file list through the
  * same stats logic `readWhere` uses ([[VersionedTable.pruneFiles]] —
  * min/max + null presence + optional per-file blooms, O(|files|)
  * driver work, zero footer reads), then delegates the surviving files
  * to Spark's own vectorized parquet scan with the same filters and
  * column pruning pushed through to the row-group level. At 100 TB the
  * format path therefore skips whole files from the manifest first and
  * row groups second, identical to the library path — one pruning
  * implementation, two front doors.
  *
  * Snapshot isolation: the manifest resolves ONCE per load (pinned in
  * the provider between `inferSchema` and `getTable`); concurrent
  * commits never change what a planned scan reads.
  */
class GraftLakeSource extends TableProvider with DataSourceRegister
    with CreatableRelationProvider {

  override def shortName(): String = "graft"

  /** V1 seam for the SaveModes the V2 writer API doesn't carry
    * (ErrorIfExists — the DataFrameWriter default — and Ignore);
    * Append/Overwrite take the V2 path above and never land here. */
  override def createRelation(sqlContext0: org.apache.spark.sql.SQLContext,
      mode: org.apache.spark.sql.SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame): BaseRelation = {
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft needs a path"))
    val spark = data.sparkSession
    val exists = VersionedTable.versions(spark, root).nonEmpty
    mode match {
      case org.apache.spark.sql.SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"graft table already exists under $root (mode ErrorIfExists)")
      case org.apache.spark.sql.SaveMode.Ignore if exists => ()
      case org.apache.spark.sql.SaveMode.Append if exists =>
        VersionedTable.append(data, root); ()
      case _ => VersionedTable.write(data, root); ()
    }
    new BaseRelation {
      override def sqlContext: org.apache.spark.sql.SQLContext = sqlContext0
      override def schema: StructType = data.schema
    }
  }

  // inferSchema and getTable run as separate calls on one provider
  // instance per load(): pin the resolved snapshot by its option key so
  // both see the SAME manifest even if a concurrent commit advances the
  // head in between.
  private val pinned =
    new java.util.concurrent.ConcurrentHashMap[
      (String, String, String, String), VersionedTable.Snapshot]()

  private def resolve(get: String => String): VersionedTable.Snapshot = {
    def opt(k: String) = Option(get(k)).map(_.trim).filter(_.nonEmpty)
    val root = opt("path").getOrElse(throw new IllegalArgumentException(
      """graft needs a table root: spark.read.format("graft").load(<root>)"""))
    val key = (root, opt("versionAsOf").getOrElse(""),
      opt("timestampAsOf").getOrElse(""), opt("tag").getOrElse(""))
    pinned.computeIfAbsent(key, _ => {
      val spark = SparkSession.active
      val picks = Seq("versionAsOf", "timestampAsOf", "tag").flatMap(opt)
      require(picks.size <= 1,
        s"at most one of versionAsOf/timestampAsOf/tag (got $picks)")
      val version: Option[Long] =
        opt("versionAsOf").map(_.toLong)
          .orElse(opt("timestampAsOf").map(ts =>
            VersionedTable.versionAsOfTime(spark, root, parseMillis(ts))))
          .orElse(opt("tag").map { name =>
            VersionedTable.tags(spark, root)
              .collectFirst { case (n, v) if n == name => v }
              .getOrElse(throw new IllegalArgumentException(
                s"no tag '$name' under $root"))
          })
      // a root with no committed version resolves to the EMPTY snapshot
      // (version -1): reads fail with a clear error at scan planning,
      // while the write path works — the first
      // `df.write.format("graft").save(root)` CREATES the table
      if (version.isEmpty && VersionedTable.versions(spark, root).isEmpty)
        VersionedTable.Snapshot(root, -1L, new StructType(), Nil, Map.empty)
      else {
        val snap = VersionedTable.snapshot(spark, root, version)
        // parquet file reads always surface nullable fields (a file
        // could be missing values); match the library read path exactly
        snap.copy(schema = GraftLakeSource.relaxed(snap.schema))
      }
    })
  }

  /** `timestampAsOf` accepts epoch millis, `yyyy-MM-dd[ HH:mm:ss[.f]]`
    * (session-local like SQL timestamps), or an ISO-8601 instant. */
  private def parseMillis(ts: String): Long =
    if (ts.forall(_.isDigit)) ts.toLong
    else if (ts.length == 10) // date only
      java.sql.Timestamp.valueOf(ts + " 00:00:00").getTime
    else scala.util.Try(java.sql.Timestamp.valueOf(ts).getTime)
      .getOrElse(java.time.Instant.parse(ts).toEpochMilli)

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolve(options.get).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val cis = new CaseInsensitiveStringMap(properties)
    new GraftLakeTable(resolve(cis.get))
  }
}

/** One pinned lake snapshot as a V2 table. Reads plan from the pinned
  * manifest; writes route through the library's transactional commit
  * paths (append = schema-validated commit, overwrite = full-replace
  * commit — history stays append-only either way, and the
  * optimistic-concurrency claim loop is the same one every writer
  * uses). ACCEPT_ANY_SCHEMA delegates schema validation to the lake's
  * own evolve contract, which both validates appends by (name, type)
  * and lets an overwrite legitimately define a fresh schema. */
private[v2] class GraftLakeTable(snap: VersionedTable.Snapshot)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft.`${snap.root}` @v${snap.version}"
  override def schema(): StructType = snap.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    if (snap.version < 0) throw new IllegalStateException(
      s"no committed version under ${snap.root} — write one first " +
        """(df.write.format("graft").save(root) or VersionedTable.write)""")
    new GraftScanBuilder(SparkSession.active, snap)
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(snap.root, replace = false,
      tableSchema = if (snap.version < 0) None else Some(snap.schema))
}

/** V1Write seam: the insert receives the aligned driver-side DataFrame
  * and commits through the library — one transactional code path for
  * every front door. `truncate()` (DataFrameWriter mode "overwrite")
  * maps to a full-replace commit, the lake's natural overwrite: old
  * versions stay time-travelable, vacuum owns retention. */
private[v2] class GraftWriteBuilder(root: String, replace: Boolean,
    tableSchema: Option[StructType])
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new GraftWriteBuilder(root, replace = true, tableSchema)
  override def build(): org.apache.spark.sql.connector.write.Write =
    new V1Write {
      override def toInsertableRelation: InsertableRelation =
        new InsertableRelation {
          override def insert(data: org.apache.spark.sql.Dataset[Row],
              overwrite: Boolean): Unit = {
            val spark = data.sparkSession
            // SQL `INSERT INTO` resolves BY POSITION, and because this
            // table declares ACCEPT_ANY_SCHEMA Spark hands the query's
            // frame over verbatim — its own names (col1, col2, ...) and
            // its own literal types (INT for small numbers). Realign
            // names positionally and cast to the table's field types —
            // exactly the coercion the engine performs for V1 sources —
            // before the library's strict name-based append. Frames of
            // a DIFFERENT arity pass through untouched and hit the
            // library's schema validation (mergeSchema semantics).
            val aligned = tableSchema match {
              case Some(ts) if data.columns.length == ts.fields.length =>
                data.toDF(ts.fieldNames.toIndexedSeq: _*)
                  .select(ts.fields.toIndexedSeq.map(f =>
                    org.apache.spark.sql.functions.col(
                      s"`${f.name}`").cast(f.dataType)
                      .as(f.name)): _*)
              case _ => data.toDF()
            }
            if (replace || overwrite ||
                VersionedTable.versions(spark, root).isEmpty)
              VersionedTable.write(aligned, root)
            else VersionedTable.append(aligned, root)
            ()
          }
        }
    }
}

/** Scan planning: collect Spark's pushed filters + required columns,
  * prune the snapshot's files by manifest stats, then hand the kept
  * files to Spark's vectorized parquet scan with the same pushdown
  * state. All filters are returned as residuals (`pushFilters` returns
  * its input) — stats pruning and parquet row-group filtering are both
  * best-effort, so Spark re-evaluates above the scan and results never
  * depend on pruning, exactly like [[VersionedTable.readWhere]]. */
private[v2] class GraftScanBuilder(spark: SparkSession,
    snap: VersionedTable.Snapshot)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private val fieldNames = snap.schema.fields.map(_.name).toSet
  private var required: StructType = snap.schema
  private var accepted: Array[sources.Filter] = Array.empty

  override def pushFilters(
      filters: Array[sources.Filter]): Array[sources.Filter] = {
    accepted = filters.filter(f =>
      GraftScanBuilder.toColumn(f, fieldNames).isDefined)
    filters // conservative: every filter is also a post-scan residual
  }

  override def pushedFilters(): Array[sources.Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val cond: Option[Column] = accepted.toSeq
      .flatMap(GraftScanBuilder.toColumn(_, fieldNames))
      .reduceOption(_ && _)
    val kept = cond match {
      case Some(c) => VersionedTable.pruneFiles(spark, snap, c)
      case None => snap.files
    }
    val index = new InMemoryFileIndex(spark,
      kept.map(new Path(_)).toIndexedSeq, Map.empty[String, String],
      Some(snap.schema))
    val pb = ParquetScanBuilder(spark, index, snap.schema, snap.schema,
      CaseInsensitiveStringMap.empty())
    // forward the same predicate (resolved against the snapshot schema)
    // so parquet row-group/page stats and dictionary filters also apply
    cond.foreach { c =>
      VersionedTable.resolvePredicate(spark, snap.schema, c)
        .foreach(e => pb.pushFilters(Seq(e)))
    }
    pb.pruneColumns(required)
    pb.build()
  }
}

private[v2] object GraftLakeSource {
  /** Everything-nullable view of a schema (what `spark.read.parquet`
    * itself serves, whatever the declared schema says). */
  def relaxed(s: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    def relax(dt: DataType): DataType = dt match {
      case st: StructType => StructType(st.fields.map(f =>
        f.copy(dataType = relax(f.dataType), nullable = true)))
      case at: ArrayType =>
        ArrayType(relax(at.elementType), containsNull = true)
      case mt: MapType => MapType(relax(mt.keyType),
        relax(mt.valueType), valueContainsNull = true)
      case o => o
    }
    relax(s).asInstanceOf[StructType]
  }
}

private[v2] object GraftScanBuilder {

  /** V2 source filter -> Column over the snapshot schema; None for
    * shapes we don't prune on (they stay residuals) and for attribute
    * names that aren't plain top-level columns (nested-field pushdown
    * carries dotted names — stats exist only per top-level column). */
  def toColumn(f: sources.Filter, fields: Set[String]): Option[Column] = {
    def ref(a: String): Option[Column] =
      if (fields.contains(a)) Some(col(s"`$a`")) else None
    f match {
      case sources.EqualTo(a, v) => ref(a).map(_ === lit(v))
      case sources.EqualNullSafe(a, v) => ref(a).map(_ <=> lit(v))
      case sources.GreaterThan(a, v) => ref(a).map(_ > lit(v))
      case sources.GreaterThanOrEqual(a, v) => ref(a).map(_ >= lit(v))
      case sources.LessThan(a, v) => ref(a).map(_ < lit(v))
      case sources.LessThanOrEqual(a, v) => ref(a).map(_ <= lit(v))
      case sources.In(a, vs) =>
        ref(a).map(_.isin(vs.toIndexedSeq: _*))
      case sources.IsNull(a) => ref(a).map(_.isNull)
      case sources.IsNotNull(a) => ref(a).map(_.isNotNull)
      case sources.StringStartsWith(a, p) => ref(a).map(_.startsWith(p))
      case sources.StringEndsWith(a, p) => ref(a).map(_.endsWith(p))
      case sources.StringContains(a, p) => ref(a).map(_.contains(p))
      case sources.And(l, r) =>
        for { lc <- toColumn(l, fields); rc <- toColumn(r, fields) }
          yield lc && rc
      case sources.Or(l, r) =>
        for { lc <- toColumn(l, fields); rc <- toColumn(r, fields) }
          yield lc || rc
      case sources.Not(c) => toColumn(c, fields).map(!_)
      case _ => None
    }
  }
}
