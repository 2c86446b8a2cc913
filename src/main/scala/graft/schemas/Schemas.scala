package graft.schemas

import org.apache.spark.sql.types._

/** Layer schemas (reference `src/schemas/bronze.py`, `src/schemas/silver.py`
  * — SURVEY §1.3).
  *
  * Bronze is all-string by design ("preserve raw, cast in Silver",
  * bronze.py:5-12); Silver carries the typing contract: DECIMAL(18,2)
  * money, timestamps, booleans, arrays, and nullable=false on PK/FK/money
  * fields. The silver case classes give `Dataset[T]` compile-time field
  * checks where the reference relies on convention.
  */
object Bronze {
  private def allString(names: String*): StructType =
    StructType(names.map(StructField(_, StringType, nullable = true)))

  /** 21 columns (bronze.py:16-40). */
  val transactions: StructType = allString(
    "transaction_id", "customer_id", "merchant_id", "amount", "currency",
    "amount_usd", "fee_amount", "net_amount", "transaction_type",
    "payment_method", "channel", "status", "merchant_country",
    "customer_country", "is_cross_border", "is_flagged", "fraud_indicators",
    "ip_address", "device_id", "transaction_timestamp", "created_at")

  /** 16 columns (bronze.py:43-62). */
  val customers: StructType = allString(
    "customer_id", "first_name", "last_name", "email", "phone", "country",
    "city", "postal_code", "date_of_birth", "segment", "kyc_status",
    "kyc_verified_date", "risk_score", "is_pep", "created_at", "updated_at")

  /** 14 columns (bronze.py:65-82). */
  val merchants: StructType = allString(
    "merchant_id", "merchant_name", "mcc_code", "mcc_category", "country",
    "currency", "risk_tier", "avg_ticket_size", "monthly_volume",
    "onboarding_date", "status", "fee_rate", "created_at", "updated_at")

  /** 5 columns (bronze.py:85-93). */
  val exchangeRates: StructType = allString(
    "rate_date", "source_currency", "target_currency", "exchange_rate",
    "created_at")
}

object Silver {
  val money: DecimalType = DecimalType(18, 2)
  val rate: DecimalType = DecimalType(8, 4)

  /** silver.py:25-63 + derived cols :54-59. */
  val transactions: StructType = StructType(Seq(
    StructField("transaction_id", StringType, nullable = false),
    StructField("customer_id", StringType, nullable = false),
    StructField("merchant_id", StringType, nullable = false),
    StructField("amount", money, nullable = false),
    StructField("currency", StringType, nullable = false),
    StructField("amount_usd", money, nullable = true),
    StructField("fee_amount", money, nullable = true),
    StructField("net_amount", money, nullable = true),
    StructField("transaction_type", StringType, nullable = false),
    StructField("payment_method", StringType, nullable = true),
    StructField("channel", StringType, nullable = true),
    StructField("status", StringType, nullable = false),
    StructField("merchant_country", StringType, nullable = true),
    StructField("customer_country", StringType, nullable = true),
    StructField("is_cross_border", BooleanType, nullable = true),
    StructField("is_flagged", BooleanType, nullable = true),
    StructField("fraud_indicators", ArrayType(StringType), nullable = true),
    StructField("ip_address", StringType, nullable = true),
    StructField("device_id", StringType, nullable = true),
    StructField("transaction_timestamp", TimestampType, nullable = false),
    StructField("created_at", TimestampType, nullable = true),
    StructField("transaction_date", DateType, nullable = false),
    StructField("transaction_hour", IntegerType, nullable = true),
    StructField("transaction_day_of_week", IntegerType, nullable = true)))

  /** silver.py:66-90 (+ age :80). */
  val customers: StructType = StructType(Seq(
    StructField("customer_id", StringType, nullable = false),
    StructField("first_name", StringType, nullable = true),
    StructField("last_name", StringType, nullable = true),
    StructField("email", StringType, nullable = true),
    StructField("phone", StringType, nullable = true),
    StructField("country", StringType, nullable = true),
    StructField("city", StringType, nullable = true),
    StructField("postal_code", StringType, nullable = true),
    StructField("date_of_birth", DateType, nullable = true),
    StructField("age", IntegerType, nullable = true),
    StructField("segment", StringType, nullable = true),
    StructField("kyc_status", StringType, nullable = false),
    StructField("kyc_verified_date", DateType, nullable = true),
    StructField("risk_score", IntegerType, nullable = true),
    StructField("is_pep", BooleanType, nullable = true),
    StructField("created_at", TimestampType, nullable = true),
    StructField("updated_at", TimestampType, nullable = true)))

  /** silver.py:93-116 (+ days_active :107). */
  val merchants: StructType = StructType(Seq(
    StructField("merchant_id", StringType, nullable = false),
    StructField("merchant_name", StringType, nullable = true),
    StructField("mcc_code", StringType, nullable = true),
    StructField("mcc_category", StringType, nullable = true),
    StructField("country", StringType, nullable = true),
    StructField("currency", StringType, nullable = true),
    StructField("risk_tier", StringType, nullable = true),
    StructField("avg_ticket_size", money, nullable = true),
    StructField("monthly_volume", IntegerType, nullable = true),
    StructField("onboarding_date", DateType, nullable = true),
    StructField("days_active", IntegerType, nullable = true),
    StructField("status", StringType, nullable = false),
    StructField("fee_rate", rate, nullable = true),
    StructField("created_at", TimestampType, nullable = true),
    StructField("updated_at", TimestampType, nullable = true)))
}
