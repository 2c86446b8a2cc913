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

  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks
    * rows>0): the gold fact build — lineitem enriched with order/customer
    * dims (broadcast joins) — rolled up to exact-decimal daily revenue by
    * market segment. */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val fact = graft.gold.Gold.factLineitem(
      Tables.load(spark, dir, "lineitem"),
      Tables.load(spark, dir, "orders"),
      Tables.load(spark, dir, "customer"))
    fact.groupBy(to_date(col("o_orderdate")).as("day"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_items"),
        Q.revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("day"), col("c_mktsegment"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Temporal.queries ++ TextQueries.queries ++
      VectorQueries.queries ++ GoldQueries.queries ++
      FintechQueries.queries ++ OpsQueries.queries ++
      VersionedQueries.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ Temporal.oracles ++ TextQueries.oracles ++
      VectorQueries.oracles ++ GoldQueries.oracles ++
      FintechQueries.oracles ++ OpsQueries.oracles ++
      VersionedQueries.oracles
}
