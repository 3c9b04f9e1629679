package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` aggregate per-area modules under
  * `graft.queries.*`; every key present in both maps is hash-compared
  * against a DuckDB oracle by the driver (t2 correctness gate).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.Ais.queries ++
      graft.queries.Ais2.queries ++
      graft.queries.GeoQueries.queries ++ graft.queries.LlmQueries.queries ++
      graft.queries.IvefQueries.queries ++ graft.queries.Advanced.queries ++
      graft.queries.Mixing.queries ++ graft.queries.Curation.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++ graft.queries.Ais.oracleSql ++
      graft.queries.Ais2.oracleSql ++
      graft.queries.GeoQueries.oracleSql ++ graft.queries.LlmQueries.oracleSql ++
      graft.queries.IvefQueries.oracleSql ++ graft.queries.Advanced.oracleSql ++
      graft.queries.Mixing.oracleSql ++ graft.queries.Curation.oracleSql
}
