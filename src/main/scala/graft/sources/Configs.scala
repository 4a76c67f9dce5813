package graft.sources

import scala.concurrent.duration._

/** Typed mirrors of the reference's reader/writer job configs
  * (/root/reference/database/dbms/reader/config.go:38-46 and
  * /root/reference/database/dbms/writer/config.go:42-54) — the public
  * configuration surface a reference user would carry over. Where the
  * reference transports these as JSON plans, here they are case classes
  * that compile directly into DataFrame reader/writer plans.
  */
final case class TableId(db: String = "", schema: String = "", name: String)

final case class SplitRange(rangeType: String, left: String, right: String)

/** `split` block: key column + optional user-declared range + time
  * accuracy (day|min|s|ms|us|ns — reader/split.go:312-327). */
final case class SplitConfig(
    key: String = "",
    timeAccuracy: String = "day",
    range: Option[SplitRange] = None) {

  /** Key-type/range-type agreement matrix (reader/split.go:84-111):
    * long keys need a bigint range; string keys accept bigint|string;
    * time keys need a time range. */
  def checkType(keyType: String): Either[String, Unit] = {
    val ok = (keyType, range.map(_.rangeType)) match {
      case (_, None) => true
      case ("long", Some("bigint")) => true
      case ("string", Some("bigint" | "string")) => true
      case ("time", Some("time")) => true
      case _ => false
    }
    if (ok) Right(()) else Left(s"split range type ${range.map(_.rangeType)}" +
      s" incompatible with key type $keyType")
  }
}

/** Reader job config (reader/config.go:38-46). `querySql` non-empty ->
  * raw-SQL passthrough, one task per statement (reader/job.go:123-131). */
final case class ReaderConfig(
    columns: Seq[String] = Seq("*"),
    table: TableId,
    where: String = "",
    split: SplitConfig = SplitConfig(),
    querySql: Seq[String] = Seq.empty,
    numPartitions: Int = 1,
    trimChar: Boolean = false) // CHAR-padding trim (config.go:97-111)

/** Writer job config (writer/config.go:42-54). Defaults 1000 rows / 1 s
  * mirror writer/config.go:20-23; execMode mirrors the reference's
  * Normal/Stmt/Tx/StmtTx batch execution knob (batch_writer.go:23-28). */
final case class WriterConfig(
    columns: Seq[String] = Seq.empty,
    table: TableId,
    writeMode: String = "insert", // insert | replace (upsert-by-key)
    execMode: String = "Normal", // Normal | Stmt | Tx | StmtTx
    batchSize: Int = 1000,
    batchTimeout: FiniteDuration = 1.second,
    preSql: Seq[String] = Seq.empty,
    postSql: Seq[String] = Seq.empty,
    retries: Int = 3,
    ignoreOneByOneError: Boolean = false,
    trimChar: Boolean = false) { // CHAR-padding trim (config.go:97-111)

  /** preSQL/postSQL must not be SELECT (writer/config.go:167-175). */
  def validateHookSql: Either[String, Unit] = {
    val bad = (preSql ++ postSql)
      .find(_.trim.toLowerCase.startsWith("select"))
    bad.toLeft(()).left.map(s => s"select not allowed in pre/post sql: $s")
  }
}
