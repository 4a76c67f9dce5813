package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, trim, when}
import org.apache.spark.sql.types._

/** Schema-normalization utilities preserving the reference's "dynamic,
  * source-owned schema" semantics (SURVEY.md §1.3): schemas are read from
  * the source, duplicate column names are renamed by appending the
  * ordinal (/root/reference/database/db.go:425-431), and unsupported
  * column types reject the table (db.go:435-439).
  */
object SchemaNormalize {

  /** Spark types the engine's canonical 7-type transport model supports
    * (SURVEY.md §1.2) plus the nested types Spark adds natively. */
  def isSupported(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
        FloatType | DoubleType | StringType | BinaryType | DateType |
        TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case ArrayType(et, _) => isSupported(et)
    case MapType(kt, vt, _) => isSupported(kt) && isSupported(vt)
    case StructType(fs) => fs.forall(f => isSupported(f.dataType))
    case _ => false
  }

  /** Rename duplicate columns `c, c, c -> c, c1, c2` (ordinal suffix per
    * occurrence index, first keeps the bare name). */
  def dedupColumnNames(df: DataFrame): DataFrame = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val renamed = df.schema.fields.map { f =>
      val k = f.name.toLowerCase
      val n = seen.getOrElse(k, 0)
      seen(k) = n + 1
      if (n == 0) f.name else s"${f.name}$n"
    }
    df.toDF(renamed.toIndexedSeq: _*)
  }

  /** Columnar form of the dialect's read-side string conventions
    * ([[SqlDialect.readString]]): Oracle ''≡NULL canonicalization
    * (oracle/field.go:193-195) and trimChar CHAR-padding trim
    * (database/config.go:97-111) applied to every string column.
    * `charCols` marks the fixed-width CHAR columns — Spark schemas don't
    * retain CHAR-ness across the JDBC boundary, so the caller passes the
    * probed set. Map-only projection; pushdown-transparent. */
  def applyReadConventions(df: DataFrame, dialect: SqlDialect,
      trimChar: Boolean, charCols: Set[String] = Set.empty): DataFrame = {
    val converted = df.schema.fields.map { f =>
      val c = col(s"`${f.name}`")
      f.dataType match {
        case StringType =>
          val isChar = charCols.contains(f.name)
          val base = // '' -> NULL strictly before any trim (reference order)
            if (dialect.emptyStringIsNull)
              when(c === "", lit(null).cast(StringType)).otherwise(c)
            else c
          val conv = if (isChar && trimChar) trim(base) else base
          conv.as(f.name)
        case _ => c
      }
    }
    df.select(converted.toIndexedSeq: _*)
  }

  /** Reject unsupported column types with the full list of offenders. */
  def requireSupported(schema: StructType): Either[String, Unit] = {
    val bad = schema.fields.filterNot(f => isSupported(f.dataType))
    if (bad.isEmpty) Right(())
    else Left(bad.map(f => s"${f.name}: ${f.dataType.simpleString}")
      .mkString("unsupported column types: ", ", ", ""))
  }
}
