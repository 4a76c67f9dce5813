package graft.sources

/** Dialect-pluggable SQL-text builders — the reference's pure-function
  * query-generation surface (SURVEY.md §2.1 S5-S9), kept as side-effect-
  * free builders of (sql, bind-arg count) so they are exactly unit-testable
  * the way the reference's builders are (SURVEY.md §5).
  *
  * These feed the JDBC paths (`spark.read.jdbc(url, table, predicates,
  * props)` and driver-side pre/post statements); the parquet engine never
  * needs them, but they are the portability seam a reference user expects.
  */
trait SqlDialect {
  def name: String
  /** Identifier quoting: backticks for MySQL-style, double quotes for
    * Oracle-style (mysql/field.go:50-52, oracle/field.go:55-65). */
  def quote(ident: String): String
  /** Positional bind variable for index i (0-based): `?` vs `:1`. */
  def bindVar(i: Int): String

  /** Oracle stores '' AS NULL; other engines keep them distinct
    * (oracle/field.go:193-195). */
  def emptyStringIsNull: Boolean = false

  /** Read-side string convention (oracle/field.go:191-200): NULL
    * canonicalization first (Oracle's '' never reaches the trim), then
    * fixed-width CHAR padding trim when the table's trimChar knob is set
    * (TrimStringChar, database/config.go:97-111). */
  def readString(v: String, charType: Boolean, trimChar: Boolean): String =
    if (v == null) null
    else if (emptyStringIsNull && v.isEmpty) null
    else if (charType && trimChar) v.trim
    else v

  /** Write-side convention (oracle/field.go:255-263): a NULL string binds
    * as '' for engines where '' IS NULL; others bind NULL as NULL. */
  def writeString(v: String): String =
    if (v == null && emptyStringIsNull) "" else v

  def quoteTable(t: TableId): String =
    Seq(t.db, t.schema, t.name).filter(_.nonEmpty).map(quote).mkString(".")

  /** `select c1,c2 from t where (user) and (split)` — the S1 scan shape
    * (reader/parameter.go:94-120). */
  def scanSql(t: TableId, cols: Seq[String], where: Seq[String]): String = {
    val proj = if (cols.isEmpty || cols == Seq("*")) "*"
      else cols.map(quote).mkString(",")
    val w = where.filter(_.nonEmpty) match {
      case Nil => ""
      case ws => ws.map(c => s"($c)").mkString(" where ", " and ", "")
    }
    s"select $proj from ${quoteTable(t)}$w"
  }

  /** Schema probe: zero rows, metadata only (table.go:229-233). */
  def probeSql(t: TableId, cols: Seq[String]): String =
    scanSql(t, cols, Seq("1 = 2"))

  /** min/max bounds probe for the split planner (parameter.go:203-249). */
  def minMaxSql(t: TableId, key: String, where: String): String =
    scanSql(t, Seq.empty, Seq(where)).replaceFirst("\\*",
      s"min(${quote(key)}) as min_key, max(${quote(key)}) as max_key")

  /** Multi-row insert: `insert into t(c..) values (..),(..)` with one
    * bind var per cell (table.go:156-214). */
  def insertSql(t: TableId, cols: Seq[String], rows: Int): String = {
    val tuple = (i: Int) =>
      cols.indices.map(j => bindVar(i * cols.size + j))
        .mkString("(", ",", ")")
    s"insert into ${quoteTable(t)}(${cols.map(quote).mkString(",")})" +
      s" values ${(0 until rows).map(tuple).mkString(",")}"
  }
}

/** MySQL-style dialect: backticks, `?`, and `replace into` upsert
  * (mysql/table.go:63-69,100-146). */
object MySqlStyle extends SqlDialect {
  val name = "mysql"
  def quote(ident: String): String = s"`$ident`"
  def bindVar(i: Int): String = "?"

  def replaceSql(t: TableId, cols: Seq[String], rows: Int): String =
    insertSql(t, cols, rows).replaceFirst("insert into", "replace into")
}

/** Oracle-style dialect: double quotes, `:n` bind vars, single-row SQL
  * with column-wise array binding (oracle/table.go:95-153). */
object OracleStyle extends SqlDialect {
  val name = "oracle"
  def quote(ident: String): String = "\"" + ident + "\""
  def bindVar(i: Int): String = s":${i + 1}"
  override val emptyStringIsNull = true

  /** Array-DML shape: one row of binds; the driver binds column arrays. */
  def arrayInsertSql(t: TableId, cols: Seq[String]): String =
    insertSql(t, cols, 1)

  /** S9 array-DML bind builder (oracle/table.go:120-153 Agrs): ONE bind
    * value per COLUMN — an array spanning the batch's rows — pairing with
    * [[arrayInsertSql]]'s single-row statement; the driver executes the
    * statement once over the arrays. String NULLs bind through
    * [[writeString]] ('' for Oracle); other NULLs bind as null slots. */
  def arrayBindArgs(rows: Seq[org.apache.spark.sql.Row]): Seq[Array[Any]] =
    if (rows.isEmpty) Seq.empty
    else {
      val schema = rows.head.schema
      schema.fields.indices.map { j =>
        val isStr =
          schema(j).dataType == org.apache.spark.sql.types.StringType
        rows.map { r =>
          if (isStr) writeString(if (r.isNullAt(j)) null else r.getString(j))
          else if (r.isNullAt(j)) null
          else r.get(j)
        }.toArray[Any]
      }
    }
}

/** Dialect registry — the reference's RegisterDialect/panic-on-dup
  * surface (database/dialect.go:9-27). */
object Dialects {
  private val reg = scala.collection.concurrent.TrieMap[String, SqlDialect](
    MySqlStyle.name -> MySqlStyle, OracleStyle.name -> OracleStyle)

  def register(d: SqlDialect): Unit =
    if (reg.putIfAbsent(d.name, d).isDefined)
      throw new IllegalArgumentException(s"dialect exists: ${d.name}")

  def apply(name: String): SqlDialect =
    reg.getOrElse(name, throw new NoSuchElementException(s"dialect: $name"))

  def unregisterAll(): Unit = {
    reg.clear()
    reg += MySqlStyle.name -> MySqlStyle
    reg += OracleStyle.name -> OracleStyle
  }
}
