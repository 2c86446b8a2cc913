package graft.generator

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.config.Enums

/** Seeded synthetic fintech data (reference `src/data_generator/generator.py`
  * — SURVEY §1.4). Faithful to the reference's distributions: lognormal(3.5,
  * 1.5) amounts capped [0.01, 50000] (generator.py:451-453), 2.5% fraud rate
  * with indicator arrays (:38,:504-521), structuring pattern $9–10k
  * (:511-515), after-hours pattern (:517-521), cross-border =
  * merchant_country ≠ customer_country (:495-497).
  *
  * Architecture differs deliberately (SURVEY: "not a port"): the reference
  * builds rows in a Python loop on one machine; here every column is derived
  * from `spark.range(n)` via counter-based hashing — `u(id, salt)` turns
  * xxhash64 into a uniform [0,1) — so generation is embarrassingly parallel,
  * deterministic under ANY partitioning (no `rand()`, whose draw depends on
  * partition layout), and scales to billions of rows by changing `n`.
  * Output is bronze-shaped: all columns strings (bronze contract).
  */
object DataGenerator {

  val Seed = 42

  /** Caller's seed, threaded implicitly so every hash helper derives from
    * it without plumbing an explicit arg through ~40 call sites. Default
    * [[Seed]] keeps byte-identical output for every pre-existing caller
    * (the oracle gates hash generated data). */
  private final case class GenSeed(v: Int) extends AnyVal

  /** Uniform [0,1) from the row id and a salt: top 53 bits of xxhash64. */
  private def u(id: Column, salt: String)(implicit seed: GenSeed): Column =
    shiftrightunsigned(xxhash64(id, lit(salt), lit(seed.v)), 11).cast(DoubleType) /
      lit(9007199254740992.0) // 2^53

  /** Uniform pick from a value list. */
  private def pick(id: Column, salt: String, values: Seq[String])(
      implicit seed: GenSeed): Column =
    element_at(typedlit(values),
      (u(id, salt) * values.size).cast(IntegerType) + 1)

  /** Weighted pick — the reference's `random.choices(values, weights)`
    * (generator.py:301-313, :403): one hash uniform walked through the
    * cumulative weight thresholds. */
  private def pickWeighted(id: Column, salt: String, values: Seq[String],
      weights: Seq[Double])(implicit seed: GenSeed): Column = {
    require(values.size == weights.size && values.nonEmpty)
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / weights.sum)
    val uu = u(id, salt)
    values.init.zip(cum.init)
      .foldLeft(Option.empty[Column]) { case (acc, (v, c)) =>
        Some(acc.fold(when(uu < c, v))(_.when(uu < c, v)))
      }
      .fold(lit(values.last))(_.otherwise(values.last))
  }

  /** Beta(2, 8) draw — the reference's `random.betavariate(2, 8)` risk
    * score shape (generator.py:308): for integer parameters,
    * Beta(k, n+1−k) is the k-th order statistic of n iid uniforms, so the
    * 2nd-smallest of 9 hash uniforms IS an exact Beta(2,8) sample — pure
    * column expressions, no rejection loop, deterministic under any
    * partitioning. */
  private def beta28(id: Column, salt: String)(
      implicit seed: GenSeed): Column =
    element_at(array_sort(array((1 to 9).map(i => u(id, s"${salt}_$i")): _*)),
      2)

  /** Standard normal via Box–Muller on two hash uniforms. */
  private def gaussian(id: Column, salt: String)(
      implicit seed: GenSeed): Column =
    sqrt(lit(-2.0) * log(lit(1.0) - u(id, salt + "_u1"))) *
      cos(lit(2.0 * math.Pi) * u(id, salt + "_u2"))

  /** 2-decimal plain string (no locale/thousands separators). */
  private def money2(c: Column): Column =
    round(c, 2).cast(org.apache.spark.sql.types.DecimalType(18, 2)).cast("string")

  /** 4-decimal plain string. */
  private def dec4(c: Column): Column =
    round(c, 4).cast(org.apache.spark.sql.types.DecimalType(8, 4)).cast("string")

  private val baseTs = "2024-01-01 00:00:00"

  /** The one KYC-status expression (weights 85/8/4/3, generator.py:
    * 301-303) — shared by the status column and the verified-date
    * condition so the two can never decouple. */
  private def kycStatus(id: Column)(implicit seed: GenSeed): Column =
    pickWeighted(id, "kyc", Enums.kycStatuses, Seq(0.85, 0.08, 0.04, 0.03))

  def customers(spark: SparkSession, n: Long, seed: Int = Seed): DataFrame = {
    implicit val gs: GenSeed = GenSeed(seed)
    val id = col("id")
    val firstNames = Seq("John", "Jane", "Alex", "Maria", "Wei", "Yuki",
      "Hans", "Ana", "Raj", "Emma")
    val lastNames = Seq("Smith", "Doe", "Garcia", "Chen", "Tanaka", "Mueller",
      "Silva", "Patel", "Brown", "Wilson")
    spark.range(n).select(
      format_string("CUST%06d", id).as("customer_id"),
      pick(id, "fn", firstNames).as("first_name"),
      pick(id, "ln", lastNames).as("last_name"),
      concat(lower(pick(id, "fn", firstNames)), lit("."), id.cast("string"),
        lit("@example.com")).as("email"),
      format_string("+1-555-%07d", (u(id, "ph") * 10000000).cast(LongType)).as("phone"),
      pick(id, "co", Enums.countries).as("country"),
      concat(lit("City"), (u(id, "ci") * 100).cast(IntegerType).cast("string")).as("city"),
      format_string("%05d", (u(id, "pc") * 100000).cast(LongType)).as("postal_code"),
      // ages 18–80 at the fixed 2024-01-01 anchor (generator.py:328-330
      // draws randint(18*365, 80*365) days before now; a fixed anchor
      // keeps generation deterministic)
      date_format(date_sub(lit("2024-01-01").cast("date"),
        lit(18 * 365) + (u(id, "dob") * (62 * 365)).cast(IntegerType)),
        "yyyy-MM-dd").as("date_of_birth"),
      // segment weights 10/50/25/10/5 (generator.py:311-313)
      pickWeighted(id, "seg", Enums.customerSegments,
        Seq(0.10, 0.50, 0.25, 0.10, 0.05)).as("segment"),
      // KYC weights 85/8/4/3 (generator.py:301-303); ONE bound Column
      // drives both the status and the date condition so they can never
      // drift apart
      kycStatus(id).as("kyc_status"),
      // verified date exists ONLY for VERIFIED customers, 1–14 days after
      // creation (generator.py:305-307)
      when(kycStatus(id) === "VERIFIED",
        date_format(date_add(lit(baseTs).cast("date"),
          lit(1) + (u(id, "kvd") * 14).cast(IntegerType)), "yyyy-MM-dd"))
        .as("kyc_verified_date"),
      // Beta(2,8)-skewed 0–99 risk score (generator.py:308: most are low)
      (beta28(id, "rs") * 100).cast(IntegerType).cast("string")
        .as("risk_score"),
      // PEP rate 0.5% (generator.py:316)
      when(u(id, "pep") < 0.005, "True").otherwise("False").as("is_pep"),
      lit(baseTs).as("created_at"),
      lit(baseTs).as("updated_at"))
  }

  /** The reference's MCC triples (generator.py:188-204): code, category,
    * and risk tier are ONE consistent pick — a gambling merchant is HIGH
    * risk by construction, never independently LOW. */
  private val MccTriples: Seq[(String, String, String)] = Seq(
    ("5411", "Grocery Stores", "LOW"),
    ("5812", "Restaurants", "LOW"),
    ("5912", "Drug Stores", "LOW"),
    ("5541", "Gas Stations", "LOW"),
    ("5311", "Department Stores", "LOW"),
    ("5732", "Electronics Stores", "MEDIUM"),
    ("5945", "Hobby & Toy Stores", "LOW"),
    ("7011", "Hotels & Lodging", "MEDIUM"),
    ("4511", "Airlines", "MEDIUM"),
    ("7512", "Car Rentals", "MEDIUM"),
    ("5999", "Miscellaneous Retail", "MEDIUM"),
    ("7995", "Gambling", "HIGH"),
    ("5962", "Direct Marketing", "HIGH"),
    ("6051", "Crypto Exchanges", "HIGH"),
    ("4829", "Wire Transfers", "HIGH"))

  def merchants(spark: SparkSession, n: Long, seed: Int = Seed): DataFrame = {
    implicit val gs: GenSeed = GenSeed(seed)
    val id = col("id")
    // one index pick drives the whole MCC triple (generator.py:369)
    val mccIdx = (u(id, "mcc") * MccTriples.size).cast(IntegerType) + 1
    val mccCode = element_at(typedlit(MccTriples.map(_._1)), mccIdx)
    val mccCat = element_at(typedlit(MccTriples.map(_._2)), mccIdx)
    val riskTier = element_at(typedlit(MccTriples.map(_._3)), mccIdx)
    // fee = risk-tier base (LOW .015 / MEDIUM .025 / HIGH .035) ± 0.005
    // (generator.py:383-384)
    val feeBase = when(riskTier === "LOW", 0.015)
      .when(riskTier === "MEDIUM", 0.025).otherwise(0.035)
    // monthly volume uniform [10k, 5M], avg ticket = volume / a uniform
    // 100–10000 txn count (generator.py:387-388)
    val monthlyVolume = (lit(10000.0) + u(id, "mv") * 4990000.0)
    val avgTicket = monthlyVolume /
      (lit(100) + (u(id, "tk") * 9901).cast(IntegerType))
    spark.range(n).select(
      format_string("MERCH%05d", id).as("merchant_id"),
      concat(lit("Merchant "), id.cast("string")).as("merchant_name"),
      mccCode.as("mcc_code"),
      mccCat.as("mcc_category"),
      pick(id, "co", Enums.countries).as("country"),
      // USD merchants at home; others settle in a major currency
      // (generator.py:379)
      when(pick(id, "co", Enums.countries) === "US", "USD")
        .otherwise(pick(id, "cur", Enums.currencies.take(5))).as("currency"),
      riskTier.as("risk_tier"),
      money2(avgTicket).as("avg_ticket_size"),
      monthlyVolume.cast(IntegerType).cast("string").as("monthly_volume"),
      date_format(date_add(lit("2018-01-01").cast("date"),
        (u(id, "ob") * 2190).cast(IntegerType)), "yyyy-MM-dd").as("onboarding_date"),
      // status weights 95/3/2 (generator.py:396-398)
      pickWeighted(id, "st", Enums.merchantStatuses, Seq(0.95, 0.03, 0.02))
        .as("status"),
      dec4(feeBase + (u(id, "fr") - 0.5) * 0.01).as("fee_rate"),
      lit(baseTs).as("created_at"),
      lit(baseTs).as("updated_at"))
  }

  /** 90 days × 9 currencies = 810 rows by default (generator.py:586-601). */
  def exchangeRates(spark: SparkSession, days: Int = 90,
      seed: Int = Seed): DataFrame = {
    implicit val gs: GenSeed = GenSeed(seed)
    val id = col("id")
    val nCur = Enums.currencies.size
    spark.range(days.toLong * nCur).select(
      date_format(date_add(lit("2024-01-01").cast("date"),
        (id / nCur).cast(IntegerType)), "yyyy-MM-dd").as("rate_date"),
      element_at(typedlit(Enums.currencies),
        (id % nCur).cast(IntegerType) + 1).as("source_currency"),
      lit("USD").as("target_currency"),
      dec4(lit(0.5) + u(id, "rate") * 1.5).as("exchange_rate"),
      lit(baseTs).as("created_at"))
  }

  /** Bronze transactions with the reference's fraud/AML patterns baked in. */
  def transactions(spark: SparkSession, n: Long, nCustomers: Long,
      nMerchants: Long, days: Int = 90, seed: Int = Seed): DataFrame = {
    implicit val gs: GenSeed = GenSeed(seed)
    val id = col("id")
    // base lognormal(3.5, 1.5) capped [0.01, 50000] (generator.py:451-453)
    val baseAmount = least(greatest(
      round(exp(lit(3.5) + lit(1.5) * gaussian(id, "amt")), 2),
      lit(0.01)), lit(50000.0))
    // structuring pattern: ~0.5% of rows pushed just under the CTR line
    // ($9000–9999.99), concentrated on a handful of "offender" customers
    // inside a two-week burst — the repeated-near-threshold shape the AML
    // window screen exists to catch
    val structuring = u(id, "struct") < 0.005
    val amount = when(structuring,
      round(lit(9000.0) + u(id, "samt") * 999.0, 2)).otherwise(baseAmount)
    // after-hours pattern: 1% forced into 00:00–04:59
    val afterHours = u(id, "ah") < 0.01
    val secondOfDay =
      when(afterHours, (u(id, "sod") * 18000).cast(LongType))
        .otherwise((u(id, "sod") * 86400).cast(LongType))
    // 2024-01-01T00:00:00Z; fixed constant (not Timestamp.valueOf, which
    // would depend on the JVM default timezone). Structuring bursts land
    // in the first 14 days — clamped to the corpus window, or a short
    // `days` would plant its AML rows on dates the rate table and the
    // normal corpus never reach
    val burstDays = math.min(14L, days.toLong)
    val dayOffset = when(structuring,
        (u(id, "day") * burstDays).cast(LongType))
      .otherwise((u(id, "day") * days).cast(LongType))
    val ts = timestamp_seconds(lit(1704067200L) +
      dayOffset * 86400 + secondOfDay)
    val mc = pick(id, "mco", Enums.countries)
    val cc = pick(id, "cco", Enums.countries)
    // fraud flags at 2.5% base rate, plus all structuring rows; the random
    // indicator pool excludes STRUCTURING — that label is reserved for the
    // actual structuring pattern
    val flagged = (u(id, "fraud") < 0.025) || structuring
    // two indicators sample WITHOUT replacement (like the reference):
    // the second pick draws from the n−1 values after the first, offset
    // modulo n, so "NEW_DEVICE|NEW_DEVICE" can never be emitted
    val randomIndicators = Enums.fraudIndicators.filterNot(_ == "STRUCTURING")
    val nInd = randomIndicators.size
    val idx1 = (u(id, "ind1") * nInd).cast(IntegerType)
    val idx2 = pmod(idx1 + 1 + (u(id, "ind2") * (nInd - 1)).cast(IntegerType),
      lit(nInd))
    val indicator1 = element_at(typedlit(randomIndicators), idx1 + 1)
    val indicator2 = element_at(typedlit(randomIndicators), idx2 + 1)
    val indicators = when(!flagged, lit(""))
      .when(structuring, lit("STRUCTURING"))
      .when(u(id, "nind") < 0.5, indicator1)
      .otherwise(concat_ws("|", indicator1, indicator2))
    val feeRate = lit(0.015) + u(id, "fee") * 0.015
    val fee = round(amount * feeRate, 2)

    spark.range(n).select(
      format_string("TXN%09d", id).as("transaction_id"),
      when(structuring, format_string("CUST%06d",
        (u(id, "scust") * math.min(10L, nCustomers)).cast(LongType)))
        .otherwise(format_string("CUST%06d",
          (u(id, "cust") * nCustomers).cast(LongType))).as("customer_id"),
      format_string("MERCH%05d", (u(id, "merch") * nMerchants).cast(LongType)).as("merchant_id"),
      money2(amount).as("amount"),
      pick(id, "cur", Enums.currencies).as("currency"),
      money2(amount).as("amount_usd"),
      money2(fee).as("fee_amount"),
      money2(round(amount - fee, 2)).as("net_amount"),
      pick(id, "tt", Enums.transactionTypes).as("transaction_type"),
      pick(id, "pm", Enums.paymentMethods).as("payment_method"),
      pick(id, "ch", Enums.channels).as("channel"),
      pick(id, "st", Enums.transactionStatuses).as("status"),
      mc.as("merchant_country"),
      cc.as("customer_country"),
      when(mc =!= cc, "True").otherwise("False").as("is_cross_border"),
      when(flagged, "True").otherwise("False").as("is_flagged"),
      indicators.as("fraud_indicators"),
      format_string("10.%d.%d.%d",
        (u(id, "ip1") * 256).cast(IntegerType),
        (u(id, "ip2") * 256).cast(IntegerType),
        (u(id, "ip3") * 256).cast(IntegerType)).as("ip_address"),
      format_string("DEV%08d", (u(id, "dev") * 100000000).cast(LongType)).as("device_id"),
      // render the instant AS UTC regardless of the session timezone:
      // date_format alone renders in spark.sql.session.timeZone, which
      // would shift every string (and the planted after-hours window)
      // in a non-UTC session — the to_utc_timestamp shift exactly
      // cancels the session-zone rendering
      date_format(to_utc_timestamp(ts,
          spark.sessionState.conf.sessionLocalTimeZone),
        "yyyy-MM-dd HH:mm:ss").as("transaction_timestamp"),
      lit(baseTs).as("created_at"))
  }
}
