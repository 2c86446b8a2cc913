package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Gold-layer dimensional builders (SURVEY §2.6 A7, §2.5 J2 — the
  * reference's *declared* star schema, `src/config/base.py:83-97`, whose
  * transformation code was never committed; semantics derived from the
  * schemas and table names).
  *
  * Re-expressed over the driver's TPC-H-ish tables: orders/lineitem are the
  * facts, customer/supplier/date the dimensions.
  *
  * Determinism & money: monetary doubles are cast to DECIMAL(18,2) before
  * summation (exact — the synthetic data is 2-decimal), and only the final
  * aggregate is cast back to double. This makes results independent of
  * partial-aggregation order, which both correctness (oracle hash-match) and
  * reproducible accounting at 100 TB require.
  */
object Gold {

  private val money = DecimalType(18, 2)
  /** Exact-decimal sum surfaced as double — THE one definition
    * (`queries.Q.dsum`), re-exported for gold callers: an inlined copy
    * here drifted apart from the oracle twin (`Q.sqlDsum`) once before
    * a parity fix could reach both. */
  def dsum(c: Column): Column = graft.queries.Q.dsum(c)

  /** dim_date from the fact's date span (reference `dim_date`,
    * base.py:88). Day-of-week is 0=Sunday..6=Saturday. */
  def dimDate(fact: DataFrame, tsCol: String): DataFrame = fact
    .select(to_date(col(tsCol)).as("day")).distinct()
    .select(
      col("day"),
      year(col("day")).cast(LongType).as("year"),
      quarter(col("day")).cast(LongType).as("quarter"),
      month(col("day")).cast(LongType).as("month"),
      (dayofweek(col("day")) - 1).cast(LongType).as("day_of_week"))

  /** agg_daily_metrics (reference base.py:92): per-day order count, distinct
    * customers, exact revenue. Partial+final aggregation is Catalyst's; the
    * single shuffle is on `day`. */
  def aggDailyMetrics(orders: DataFrame): DataFrame = orders
    .groupBy(to_date(col("o_orderdate")).as("day"))
    .agg(
      count(lit(1)).as("n_orders"),
      countDistinct(col("o_custkey")).as("n_customers"),
      dsum(col("o_totalprice")).as("revenue"))

  /** agg_customer_360 (reference base.py:93): per-customer order stats +
    * first/last activity + spend rank within nation. The left join keeps
    * order-less customers (n_orders=0, spend NULL). One shuffle on
    * c_custkey for the aggregate; the rank runs through the two-phase
    * [[graft.ops.Transforms.rankWithinGroupScalable]] — a raw
    * `Window.partitionBy(c_nationkey)` would cram each nation's ENTIRE
    * customer population into one task (25 stragglers at any cluster
    * size); the unique c_custkey tiebreak makes rank ≡ row_number, so
    * the two-phase row_number IS the rank. */
  def aggCustomer360(customer: DataFrame, orders: DataFrame): DataFrame = {
    val per = customer
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_nationkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        dsum(col("o_totalprice")).as("total_spend"),
        min(col("o_orderdate")).as("first_order"),
        max(col("o_orderdate")).as("last_order"))
    graft.ops.Transforms.rankWithinGroupScalable(per, "spend_rank",
      Seq("c_nationkey"),
      Seq(coalesce(col("total_spend"), lit(0.0)).desc, col("c_custkey")))
  }

  /** agg_merchant_performance analogue over suppliers (reference
    * base.py:94): volume, exact revenue, distinct parts, average ticket. */
  def aggSupplierPerformance(lineitem: DataFrame): DataFrame = lineitem
    .groupBy(col("l_suppkey"))
    .agg(
      count(lit(1)).as("volume"),
      // Q.revenueSum — the one copy whose oracle twin is Q.sqlRevenueSum
      graft.queries.Q.revenueSum(col("l_extendedprice"), col("l_discount"))
        .as("net_revenue"),
      countDistinct(col("l_partkey")).as("n_parts"))
    .withColumn("avg_ticket",
      col("net_revenue") / col("volume").cast(DoubleType))

  /** fact_transactions analogue (reference base.py:91): lineitem enriched
    * with order and customer attributes. NEITHER side is force-broadcast:
    * customer scales WITH the fact in TPC-H (SF 100,000 ≈ 15B customers —
    * an explicit `broadcast()` hint would bypass AQE's size guard and die
    * on the 8 GB broadcast cap), and orders is order-of-fact-sized. AQE
    * broadcasts the customer projection automatically whenever it
    * actually fits the threshold; at 100 TB make both joins exchange-free
    * by bucketing the tables on their join keys
    * ([[graft.io.Writers.writeBucketed]] — the zero-Exchange co-location
    * the plan tests assert). Force-broadcast is reserved for BOUNDED
    * dimensions (nation, region, date) whose size is independent of SF. */
  def factLineitem(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame): DataFrame = lineitem
    .join(orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus"),
      lineitem("l_orderkey") === col("o_orderkey"), "left")
    .join(customer.select("c_custkey", "c_nationkey", "c_mktsegment"),
      col("o_custkey") === col("c_custkey"), "left")
}
