package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gold.Gold
import Q._

/** Gold-layer star schema (the reference's declared tables, SURVEY §2.6 A7). */
object GoldQueries {

  type QFn = (SparkSession, String) => DataFrame

  val queries: Map[String, QFn] = Map(
    "q36_dim_date" -> ((s, dir) => {
      Gold.dimDate(t(s, dir, "orders"), "o_orderdate").orderBy(col("day"))
    }),

    "q37_daily_metrics" -> ((s, dir) => {
      Gold.aggDailyMetrics(t(s, dir, "orders")).orderBy(col("day"))
    }),

    "q38_customer360" -> ((s, dir) => {
      Gold.aggCustomer360(t(s, dir, "customer"), t(s, dir, "orders"))
        .orderBy(col("c_custkey"))
    }),

    "q39_supplier_perf" -> ((s, dir) => {
      Gold.aggSupplierPerformance(t(s, dir, "lineitem"))
        .orderBy(col("l_suppkey"))
    }))

  val oracles: Map[String, String] = Map(
    "q36_dim_date" ->
      """SELECT DISTINCT CAST(o_orderdate AS DATE) AS day,
        |  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS year,
        |  CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS quarter,
        |  CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS month,
        |  CAST(EXTRACT(dow FROM o_orderdate) AS BIGINT) AS day_of_week
        |FROM orders ORDER BY day""".stripMargin,

    "q37_daily_metrics" ->
      s"""SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders,
         |  COUNT(DISTINCT o_custkey) AS n_customers,
         |  ${sqlDsum("o_totalprice")} AS revenue
         |FROM orders GROUP BY 1 ORDER BY day""".stripMargin,

    "q38_customer360" ->
      s"""WITH per AS (
         |  SELECT c.c_custkey, c.c_nationkey,
         |    COUNT(o.o_orderkey) AS n_orders,
         |    ${sqlDsum("o.o_totalprice")} AS total_spend,
         |    MIN(o.o_orderdate) AS first_order,
         |    MAX(o.o_orderdate) AS last_order
         |  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
         |  GROUP BY c.c_custkey, c.c_nationkey)
         |SELECT c_custkey, c_nationkey, n_orders, total_spend, first_order, last_order,
         |  CAST(rank() OVER (PARTITION BY c_nationkey
         |    ORDER BY COALESCE(total_spend, CAST(0 AS DOUBLE)) DESC, c_custkey) AS BIGINT) AS spend_rank
         |FROM per ORDER BY c_custkey""".stripMargin,

    "q39_supplier_perf" ->
      s"""SELECT l_suppkey, COUNT(*) AS volume,
         |  ${sqlRevenueSum("l_extendedprice", "l_discount")} AS net_revenue,
         |  COUNT(DISTINCT l_partkey) AS n_parts,
         |  ${sqlRevenueSum("l_extendedprice", "l_discount")} / CAST(COUNT(*) AS DOUBLE) AS avg_ticket
         |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin)
}
