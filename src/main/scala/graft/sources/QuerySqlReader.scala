package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-statement querySql split (SURVEY.md §2.9 X4).
  *
  * The reference's power-user read path runs one reader task per raw SQL
  * statement when `querySql` is non-empty, each task executing exactly one
  * statement, results merged downstream
  * (/root/reference/database/dbms/reader/job.go:123-131 — Split() returns
  * one cloned config per statement and skips the key-range planner
  * entirely).
  *
  * Spark-native shape: each statement compiles to its own logical subplan
  * and the statements union — Catalyst's CombineUnions flattens the chain
  * into a single n-ary Union whose branches are INDEPENDENT leaf scans, so
  * the statements execute concurrently within one job (strictly better
  * than the reference's task-per-statement scheduling: no per-task session
  * setup, shared shuffle service, and AQE balances the branches).
  * Statement schemas must union by name, mirroring the reference's
  * single-record-channel contract.
  */
object QuerySqlReader {

  /** One union branch per statement of `cfg.querySql`. Statements resolve
    * against registered views/tables (the Spark analogue of the connected
    * source). */
  def read(spark: SparkSession, cfg: ReaderConfig): DataFrame = {
    require(cfg.querySql.nonEmpty,
      "querySql split requires at least one statement (reader/job.go:123)")
    cfg.querySql.map(spark.sql).reduce(_ unionByName _)
  }
}
