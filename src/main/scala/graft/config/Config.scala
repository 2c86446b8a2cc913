package graft.config

/** Domain enums and operational config (reference `src/config/base.py`,
  * `dev.py`, `prod.py` — SURVEY §1.4, §6).
  *
  * Pure data — no Spark. Values mirror the reference's centralized business
  * rules: transaction enums (base.py:20-47), AML thresholds (base.py:49-50),
  * DQ thresholds (base.py:57-60), environment sizing (dev.py/prod.py).
  */
object Enums {
  val transactionTypes: Seq[String] =
    Seq("PURCHASE", "REFUND", "TRANSFER", "WITHDRAWAL")
  val paymentMethods: Seq[String] =
    Seq("CREDIT_CARD", "DEBIT_CARD", "DIGITAL_WALLET", "BANK_TRANSFER", "CRYPTO")
  val channels: Seq[String] = Seq("WEB", "MOBILE_APP", "POS", "ATM")
  val transactionStatuses: Seq[String] =
    Seq("COMPLETED", "PENDING", "FAILED", "REVERSED")
  val kycStatuses: Seq[String] = Seq("VERIFIED", "PENDING", "REJECTED", "EXPIRED")
  val customerSegments: Seq[String] =
    Seq("HIGH_VALUE", "REGULAR", "OCCASIONAL", "NEW", "CHURNING")
  val riskTiers: Seq[String] = Seq("LOW", "MEDIUM", "HIGH")
  val merchantStatuses: Seq[String] = Seq("ACTIVE", "SUSPENDED", "TERMINATED")
  val currencies: Seq[String] =
    Seq("USD", "EUR", "GBP", "JPY", "CAD", "AUD", "CHF", "CNY", "INR")
  val countries: Seq[String] =
    Seq("US", "GB", "DE", "FR", "JP", "CA", "AU", "CH", "CN", "IN")
  val fraudIndicators: Seq[String] = Seq(
    "VELOCITY_SPIKE", "NEW_DEVICE", "GEO_MISMATCH", "UNUSUAL_AMOUNT",
    "STRUCTURING", "AFTER_HOURS")
}

/** Regulatory + validation thresholds (reference base.py:20-21, 49-60). */
object Thresholds {
  val minTransactionAmount: Double = 0.01
  val maxTransactionAmount: Double = 100000.0
  /** Currency Transaction Report threshold (AML). */
  val amlCtrThreshold: Double = 10000.0
  /** Structuring detection floor: repeated just-below-CTR amounts. */
  val amlStructuringThreshold: Double = 9000.0
  val dqCompletenessThreshold: Double = 0.95
  val dqUniquenessThreshold: Double = 1.0
  val dqFreshnessHours: Double = 24.0
  val volumeChangeThreshold: Double = 0.5
}

/** Environment config (reference dev.py / prod.py). */
final case class EnvConfig(
    env: String,
    bronzePath: String,
    silverPath: String,
    goldPath: String,
    quarantinePath: String,
    checkpointPath: String,
    batchSize: Int,
    maxWorkers: Int,
    enableOptimization: Boolean,
    pipelineSlaMinutes: Int,
    freshnessSlaHours: Int)

object EnvConfig {
  def dev(root: String): EnvConfig = EnvConfig("dev",
    s"$root/bronze", s"$root/silver", s"$root/gold", s"$root/quarantine",
    s"$root/checkpoints", batchSize = 10000, maxWorkers = 2,
    enableOptimization = false, pipelineSlaMinutes = 60, freshnessSlaHours = 24)

  def prod(root: String): EnvConfig = EnvConfig("prod",
    s"$root/bronze", s"$root/silver", s"$root/gold", s"$root/quarantine",
    s"$root/checkpoints", batchSize = 100000, maxWorkers = 8,
    enableOptimization = true, pipelineSlaMinutes = 60, freshnessSlaHours = 4)
}
