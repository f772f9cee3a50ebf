package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full registry of verifiable operators; every entry
  * with SQL-expressible semantics also appears in `oracleSql` (DuckDB
  * dialect) with identically-aliased output columns.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q04StarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.all ++ graft.queries.Pipeline.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver's rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.Pipeline.oracles
}
