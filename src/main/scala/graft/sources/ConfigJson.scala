package graft.sources

import org.json4s._
import org.json4s.jackson.JsonMethods
import scala.concurrent.duration.{Duration, FiniteDuration}

/** JSON codec for the reference's job-config wire format, so a reference
  * user's existing JSON job specs load verbatim into the typed configs:
  * reader fields `column/connection{url,table{db,schema,name}}/where/
  * split{key,timeAccuracy,range{type,layout,left,right}}/querySql`
  * (/root/reference/database/dbms/reader/config.go:38-45,103-118,
  * split.go:40-44,114-118) and writer fields `writeMode/batchSize/
  * batchTimeout/preSQL/postSQL` (writer/config.go:42-54). Connection
  * credentials/URL are intentionally NOT modeled — they belong to Spark's
  * JDBC options, not the job plan. Missing fields take the reference's
  * defaults. */
object ConfigJson {

  private def str(v: JValue, default: String = ""): String = v match {
    case JString(s) => s
    case _ => default
  }

  private def strs(v: JValue): Seq[String] = v match {
    case JArray(xs) => xs.collect { case JString(s) => s }
    case _ => Seq.empty
  }

  private def int(v: JValue, default: Int): Int = v match {
    case JInt(n) => n.toInt
    case _ => default
  }

  private def tableOf(j: JValue): TableId = {
    val t = j \ "connection" \ "table"
    TableId(str(t \ "db"), str(t \ "schema"), str(t \ "name"))
  }

  def reader(json: String): ReaderConfig = {
    val j = JsonMethods.parse(json)
    val sp = j \ "split"
    val rng = sp \ "range"
    ReaderConfig(
      columns = strs(j \ "column") match {
        case Seq() => Seq("*")
        case cols => cols
      },
      table = tableOf(j),
      where = str(j \ "where"),
      split = SplitConfig(
        key = str(sp \ "key"),
        timeAccuracy = str(sp \ "timeAccuracy", "day"),
        range = str(rng \ "type") match {
          case "" => None
          case t => Some(SplitRange(t, str(rng \ "left"), str(rng \ "right")))
        }),
      querySql = strs(j \ "querySql"))
  }

  def writer(json: String): WriterConfig = {
    val j = JsonMethods.parse(json)
    // Go-style duration strings ("1s", "500ms") parse as scala Durations
    val timeout = str(j \ "batchTimeout", "1s")
    WriterConfig(
      columns = strs(j \ "column"),
      table = tableOf(j),
      writeMode = str(j \ "writeMode", "insert"),
      execMode = str(j \ "execMode", ExecModeDefault),
      batchSize = int(j \ "batchSize", 1000),
      batchTimeout = Duration(timeout) match {
        case f: FiniteDuration => f
        case _ => throw new IllegalArgumentException(
          s"batchTimeout must be finite: $timeout")
      },
      preSql = strs(j \ "preSQL"),
      postSql = strs(j \ "postSQL"))
  }

  private val ExecModeDefault = "Normal"
}
