package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schemas.Silver

/** Bronze → Silver typing pipeline (SURVEY §2.4 P7, §7.3.4 — the casts the
  * reference declares via `src/schemas/silver.py` but whose transformation
  * notebooks were never committed; semantics derived from the schema and
  * the generator's formats: timestamps `yyyy-MM-dd HH:mm:ss`
  * (generator.py:543-544), booleans as "True"/"False" strings, pipe-joined
  * fraud indicators (:540)).
  *
  * All narrow column operations — a single projection node per table, no
  * shuffle; the derived date column becomes the partition key for silver
  * writes (partition pruning at read time).
  */
object SilverPipeline {

  // try_* parse forms throughout: bronze is all-string and only partially
  // DQ-screened (the contract validates the columns it checks, not every
  // castable field), so unparseable values must become NULL — the
  // reference's PySpark non-ANSI cast semantics — rather than throw, which
  // is what a plain cast/to_timestamp does under Spark 4's default ANSI
  // mode. On parseable data try_* is value-identical to the plain forms.
  // the full Spark/PySpark boolean-cast domain with a NULL fallback:
  // `=== "true"` mapped '1'/'t'/'yes' — and every junk string — to
  // FALSE, so a feed encoding flags as 1/0 silently zeroed n_flagged /
  // fraud_rate with no quarantine signal (the try-semantics contract
  // above says unparseable must become NULL, not a value)
  private def parseBool(c: Column): Column = {
    val s = lower(trim(c))
    when(s.isin("true", "t", "yes", "y", "1"), lit(true))
      .when(s.isin("false", "f", "no", "n", "0"), lit(false))
      .otherwise(lit(null).cast("boolean"))
  }
  /** THE bronze timestamp format — shared with the DQ parseability
    * screen (Pipeline.transactionChecks): two drifting copies would
    * re-open the __HIVE_DEFAULT_PARTITION__ loss hole the screen closes
    * (a row passing the screen's format but failing silver's lands in
    * the null partition and vanishes from date-pruned reads). */
  val TsFormat = "yyyy-MM-dd HH:mm:ss"
  private def parseTs(c: Column): Column =
    try_to_timestamp(c, lit(TsFormat))
  private def parseDate(c: Column): Column = try_to_date(c, "yyyy-MM-dd")

  /** Age in whole years at `asOf` (reference silver.py:80 derived col).
    * `asOf` is a parameter — not bare current_date() — so results are
    * reproducible in tests and backfills. Calendar arithmetic, not
    * floor(days/365.25): the division form understates by one for days
    * after a birthday whenever the span carries fewer than span/4 leap
    * days (an 18th birthday with 4 leap days ⇒ 6574/365.25 = 17.998 →
    * 17) — wrong exactly where the KYC age gate looks. */
  def ageYears(dob: Column, asOf: Column): Column =
    (year(asOf) - year(dob) -
      when(month(asOf) < month(dob) ||
        (month(asOf) === month(dob) && dayofmonth(asOf) < dayofmonth(dob)),
        1).otherwise(0)).cast(IntegerType)

  def transactionsToSilver(bronze: DataFrame): DataFrame = {
    val ts = parseTs(col("transaction_timestamp"))
    bronze.select(
      col("transaction_id"),
      col("customer_id"),
      col("merchant_id"),
      col("amount").try_cast(Silver.money).as("amount"),
      col("currency"),
      col("amount_usd").try_cast(Silver.money).as("amount_usd"),
      col("fee_amount").try_cast(Silver.money).as("fee_amount"),
      col("net_amount").try_cast(Silver.money).as("net_amount"),
      col("transaction_type"),
      col("payment_method"),
      col("channel"),
      col("status"),
      col("merchant_country"),
      col("customer_country"),
      parseBool(col("is_cross_border")).as("is_cross_border"),
      parseBool(col("is_flagged")).as("is_flagged"),
      Transforms.parseDelimitedArray(col("fraud_indicators")).as("fraud_indicators"),
      col("ip_address"),
      col("device_id"),
      ts.as("transaction_timestamp"),
      parseTs(col("created_at")).as("created_at"),
      to_date(ts).as("transaction_date"),
      hour(ts).as("transaction_hour"),
      dayofweek(ts).as("transaction_day_of_week"))
  }

  def customersToSilver(bronze: DataFrame,
      asOf: Column = current_date()): DataFrame = {
    val dob = parseDate(col("date_of_birth"))
    bronze.select(
      col("customer_id"),
      col("first_name"),
      col("last_name"),
      col("email"),
      col("phone"),
      col("country"),
      col("city"),
      col("postal_code"),
      dob.as("date_of_birth"),
      ageYears(dob, asOf).as("age"),
      col("segment"),
      col("kyc_status"),
      parseDate(col("kyc_verified_date")).as("kyc_verified_date"),
      col("risk_score").try_cast(IntegerType).as("risk_score"),
      parseBool(col("is_pep")).as("is_pep"),
      parseTs(col("created_at")).as("created_at"),
      parseTs(col("updated_at")).as("updated_at"))
  }

  def merchantsToSilver(bronze: DataFrame,
      asOf: Column = current_date()): DataFrame = {
    val onboarding = parseDate(col("onboarding_date"))
    bronze.select(
      col("merchant_id"),
      col("merchant_name"),
      col("mcc_code"),
      col("mcc_category"),
      col("country"),
      col("currency"),
      col("risk_tier"),
      col("avg_ticket_size").try_cast(Silver.money).as("avg_ticket_size"),
      col("monthly_volume").try_cast(IntegerType).as("monthly_volume"),
      onboarding.as("onboarding_date"),
      datediff(asOf, onboarding).cast(IntegerType).as("days_active"),
      col("status"),
      col("fee_rate").try_cast(Silver.rate).as("fee_rate"),
      parseTs(col("created_at")).as("created_at"),
      parseTs(col("updated_at")).as("updated_at"))
  }

  def exchangeRatesToSilver(bronze: DataFrame): DataFrame = bronze.select(
    parseDate(col("rate_date")).as("rate_date"),
    col("source_currency"),
    col("target_currency"),
    col("exchange_rate").try_cast(DecimalType(18, 6)).as("exchange_rate"),
    parseTs(col("created_at")).as("created_at"))
}
