package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Shared helpers for the oracle-checked query surface.
  *
  * Oracle-parity rules (driver hashes values after sorting columns by name):
  *  - Monetary doubles are exactly 2-decimal in the test data; cast to
  *    DECIMAL(18,2) BEFORE summing so aggregation is exact and independent
  *    of partial-agg order, then cast the final aggregate to DOUBLE. The
  *    DuckDB oracle does the identical cast chain.
  *  - Averages are expressed as exact-sum / count with an explicit double
  *    division (identical operands ⇒ identical IEEE result in both engines).
  *  - Integer-ish outputs are BIGINT on both sides (DuckDB SUM(int) is
  *    HUGEINT — always CAST in the oracle SQL).
  *  - Every query ends in a deterministic ORDER BY.
  */
object Q {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  val money: DecimalType = DecimalType(18, 2)

  /** Exact decimal sum of a 2-decimal double column, surfaced as double. */
  def dsum(c: Column): Column = sum(c.cast(money)).cast(DoubleType)

  /** Exact decimal product of two 2-decimal doubles (scale 4). */
  def dmul(a: Column, b: Column): Column = a.cast(money) * b.cast(money)

  /** sum(a * (1-b)) computed exactly in decimal, as double. */
  def revenueSum(price: Column, discount: Column): Column =
    sum(price.cast(money) * (lit(1).cast(money) - discount.cast(money)))
      .cast(DoubleType)

  /** The matching DuckDB SQL fragment for [[dsum]]. */
  def sqlDsum(c: String): String =
    s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"

  /** The matching DuckDB SQL fragment for [[revenueSum]]. */
  def sqlRevenueSum(price: String, discount: String): String =
    s"CAST(SUM(CAST($price AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST($discount AS DECIMAL(18,2)))) AS DOUBLE)"
}
