package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2 + LLM-pipeline
  * operators), one entry per operator; `oracleSql` holds the DuckDB-
  * equivalent SQL for every query whose semantics are ANSI-SQL-expressible.
  * Implementations live in graft.queries.* (thin declarative plans over the
  * operator library in graft.operators / graft.functions).
  */
object SparkEntry {
  type Q = (SparkSession, String) => DataFrame

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] =
    graft.queries.Relational.defs ++
      graft.queries.TextDedup.defs ++
      graft.queries.AnnOps.defs ++
      graft.queries.EventOps.defs ++
      graft.queries.SplitOps.defs ++
      graft.queries.MediaOps.defs ++
      graft.queries.PrepOps.defs ++
      graft.queries.SketchOps.defs ++
      graft.queries.StreamOps.defs ++
      graft.queries.GraphOps.defs ++
      graft.queries.MlOps.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.TextDedup.oracles ++
      graft.queries.AnnOps.oracles ++
      graft.queries.EventOps.oracles ++
      graft.queries.SplitOps.oracles ++
      graft.queries.MediaOps.oracles ++
      graft.queries.PrepOps.oracles ++
      graft.queries.SketchOps.oracles ++
      graft.queries.StreamOps.oracles ++
      graft.queries.GraphOps.oracles ++
      graft.queries.MlOps.oracles
}
