package graft.sources.v2

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

import graft.sinks.VersionedTable

/** Native SQL `CALL` surface for the lake's maintenance operations —
  * Spark 4's `ProcedureCatalog` SPI (the Iceberg convention:
  * `CALL graft.system.<proc>(...)`), completing the catalog front door
  * so retention, compaction, rollback, release tagging and CHECK
  * constraints are all reachable from pure SQL:
  *
  * {{{
  *   CALL graft.system.vacuum('db.t', 3)
  *   CALL graft.system.compact('db.t')
  *   CALL graft.system.restore('db.t', 2)
  *   CALL graft.system.tag('db.t', 'train-v1', 4)
  *   CALL graft.system.untag('db.t', 'train-v1')
  *   CALL graft.system.history('db.t')
  *   CALL graft.system.add_constraint('db.t', 'pos_qty', 'qty > 0')
  *   CALL graft.system.drop_constraint('db.t', 'pos_qty')
  * }}}
  *
  * Every procedure returns a result-set row (counts/versions), served
  * as a [[LocalScan]] — driver-side metadata work only, same as the
  * library calls they wrap. Table arguments resolve as dotted
  * identifiers under the catalog's warehouse root. */
private[v2] object GraftProcedures {

  /** One IN-parameter procedure skeleton: bind is identity (parameters
    * are declared, Spark coerces arguments), call wraps the library
    * operation's result row into a LocalScan. */
  private abstract class Proc(procName: String,
      params: Seq[(String, DataType)], desc: String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] =
      params.map { case (n, t) =>
        ProcedureParameter.in(n, t).build()
      }.toArray
    override def isDeterministic: Boolean = false
    /** (output schema, rows) computed from the bound arguments. */
    def run(spark: SparkSession, args: InternalRow): (StructType, Seq[Row])
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val (schema, resultRows) = run(spark, input)
      val conv = CatalystTypeConverters.createToCatalystConverter(schema)
      val converted =
        resultRows.map(r => conv(r).asInstanceOf[InternalRow]).toArray
      val scan: Scan = new LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] = converted
        override def description(): String = s"graft.system.$procName"
      }
      java.util.Collections.singletonList(scan).iterator()
    }
  }

  private def out(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  def all(cat: GraftCatalog): Map[String, UnboundProcedure] = {
    def root(args: InternalRow): String = cat.resolveTableDir(
      args.getUTF8String(0).toString)

    val vacuum = new Proc("vacuum",
      Seq("table" -> StringType, "keep_versions" -> IntegerType),
      "remove files and manifests outside the retention window " +
        "(tagged versions stay pinned)") {
      def run(spark: SparkSession, a: InternalRow) =
        (out("removed_files" -> IntegerType),
          Seq(Row(VersionedTable.vacuum(spark, root(a), a.getInt(1)))))
    }
    val compact = new Proc("compact", Seq("table" -> StringType),
      "bin-pack small files into a content-identical commit") {
      def run(spark: SparkSession, a: InternalRow) =
        (out("new_version" -> LongType),
          Seq(Row(VersionedTable.compact(spark, root(a))
            .map(Long.box).orNull)))
    }
    val restore = new Proc("restore",
      Seq("table" -> StringType, "version" -> LongType),
      "roll the head back to a version, as a NEW commit") {
      def run(spark: SparkSession, a: InternalRow) =
        (out("new_version" -> LongType),
          Seq(Row(VersionedTable.restore(spark, root(a), a.getLong(1)))))
    }
    val tag = new Proc("tag", Seq("table" -> StringType,
      "name" -> StringType, "version" -> LongType),
      "pin a named release pointer to a version") {
      def run(spark: SparkSession, a: InternalRow) = {
        VersionedTable.tag(spark, root(a),
          a.getUTF8String(1).toString, a.getLong(2))
        (out("tagged_version" -> LongType), Seq(Row(a.getLong(2))))
      }
    }
    val untag = new Proc("untag",
      Seq("table" -> StringType, "name" -> StringType),
      "drop a named release pointer") {
      def run(spark: SparkSession, a: InternalRow) =
        (out("removed" -> BooleanType),
          Seq(Row(VersionedTable.untag(spark, root(a),
            a.getUTF8String(1).toString))))
    }
    val history = new Proc("history", Seq("table" -> StringType),
      "the commit log as rows (DESCRIBE HISTORY)") {
      def run(spark: SparkSession, a: InternalRow) = {
        val df = VersionedTable.history(spark, root(a))
        (df.schema, df.collect().toSeq) // O(|versions|) driver rows
      }
    }
    val addConstraint = new Proc("add_constraint",
      Seq("table" -> StringType, "name" -> StringType,
        "expr" -> StringType),
      "add a CHECK constraint (existing data must satisfy it)") {
      def run(spark: SparkSession, a: InternalRow) =
        (out("committed_version" -> LongType),
          Seq(Row(VersionedTable.addConstraint(spark, root(a),
            a.getUTF8String(1).toString, a.getUTF8String(2).toString))))
    }
    val dropConstraint = new Proc("drop_constraint",
      Seq("table" -> StringType, "name" -> StringType),
      "drop a CHECK constraint by name") {
      def run(spark: SparkSession, a: InternalRow) =
        (out("committed_version" -> LongType),
          Seq(Row(VersionedTable.dropConstraint(spark, root(a),
            a.getUTF8String(1).toString))))
    }
    // OPTIMIZE ... ZORDER BY in CALL form: rewrite the whole head
    // Morton-clustered on the named columns (comma-separated) into
    // `n_files` files, so readWhere/DSv2 scans prune selective filters
    // on ANY participating dimension afterwards — the periodic layout
    // job, now reachable without the library API.
    val optimizeZorder = new Proc("optimize_zorder",
      Seq("table" -> StringType, "columns" -> StringType,
        "n_files" -> IntegerType),
      "rewrite the head Z-ordered (columns default to the table's " +
        "CLUSTER BY spec, n_files to the current file count; old " +
        "versions keep their files until vacuum)") {
      // columns/n_files are OPTIONAL: '' resolves to the table's
      // declared CLUSTER BY columns (graft.clustering property), 0 to
      // the head's current file count — `CALL optimize_zorder('db.t')`
      // is the whole periodic layout job for a CLUSTER BY table
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("columns", StringType)
          .defaultValue("''").build(),
        ProcedureParameter.in("n_files", IntegerType)
          .defaultValue("0").build())
      def run(spark: SparkSession, a: InternalRow) = {
        val r = root(a)
        val given = Option(a.getUTF8String(1)).map(_.toString)
          .getOrElse("").split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val cols =
          if (given.nonEmpty) given
          else VersionedTable.tableProperties(spark, r)
            .collectFirst { case (VersionedTable.ClusteringProp, v) =>
              v.split(",").map(_.trim).filter(_.nonEmpty).toSeq }
            .getOrElse(Seq.empty)
        require(cols.nonEmpty,
          "optimize_zorder: no columns given and the table declares " +
            "no CLUSTER BY spec")
        val nGiven = if (a.isNullAt(2)) 0 else a.getInt(2)
        val n = if (nGiven > 0) nGiven
          else math.max(1, VersionedTable.snapshot(spark, r).files.size)
        (out("new_version" -> LongType),
          Seq(Row(VersionedTable.compactZOrdered(spark, r,
            cols.toIndexedSeq.map(org.apache.spark.sql.functions.col),
            n))))
      }
    }
    // SHALLOW CLONE in CALL form: zero-copy manifest-reference branch
    // of a table (optionally at a pinned version) under a new dotted
    // identifier — branching a petabyte table is O(|files|) driver
    // metadata. The destination's namespace must exist; the clone is
    // immediately a first-class catalog table (copy-on-write
    // divergence, own retention — see VersionedTable.cloneShallow).
    val clone = new Proc("clone",
      Seq("source" -> StringType, "target" -> StringType,
        "version" -> LongType),
      "shallow-clone a table (zero data copied); version < 0 = head") {
      def run(spark: SparkSession, a: InternalRow) = {
        val src = root(a)
        val dst = cat.stageCloneTarget(a.getUTF8String(1).toString)
        val v = a.getLong(2)
        (out("cloned_version" -> LongType),
          Seq(Row(VersionedTable.cloneShallow(spark, src, dst,
            asOf = if (v < 0) None else Some(v)))))
      }
    }
    Seq(vacuum, compact, restore, tag, untag, history, addConstraint,
      dropConstraint, optimizeZorder, clone)
      .map(p => p.name() -> (p: UnboundProcedure)).toMap
  }
}
