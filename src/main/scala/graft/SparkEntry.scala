package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator coverage surface (one entry per implemented
  * operator from SURVEY §2); `oracleSql` holds the DuckDB-equivalent SQL
  * for every hash-checkable query (queries whose output is engine-specific
  * — sketches, LSH candidates — are rows-only by design).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    GoldQueries.queries("q37_daily_metrics")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Temporal.queries ++ TextQueries.queries ++
      VectorQueries.queries ++ GoldQueries.queries ++ FintechQueries.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ Temporal.oracles ++ TextQueries.oracles ++
      VectorQueries.oracles ++ GoldQueries.oracles ++ FintechQueries.oracles
}
