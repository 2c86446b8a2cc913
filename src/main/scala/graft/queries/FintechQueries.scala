package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{AsOfJoin, Multimodal}
import graft.generator.DataGenerator
import graft.gold.FintechGold
import graft.ops.SilverPipeline

/** Fintech-domain coverage (the reference's own data model end-to-end:
  * seeded generator → bronze → silver casts → gold star schema → AML
  * screens) plus the multimodal plumbing queries. These operate on
  * engine-generated deterministic data (seed 42), not the driver parquet,
  * so they are rows-only for the driver gate; exact values are asserted in
  * ScalaTest (FintechSpec).
  */
object FintechQueries {

  type QFn = (SparkSession, String) => DataFrame

  // modest volumes: enough to exercise every pattern incl. AML tails
  private def silverTxns(s: SparkSession): DataFrame =
    SilverPipeline.transactionsToSilver(
      DataGenerator.transactions(s, 20000, nCustomers = 1000, nMerchants = 100))

  val queries: Map[String, QFn] = Map(
    // generator → silver casts → gold daily metrics, fully deterministic
    "q40_fintech_daily" -> ((s, _) => {
      FintechGold.aggDailyMetrics(silverTxns(s))
        .orderBy(col("transaction_date"), col("status"))
    }),

    // customer 360 over generated customers + txns
    "q41_fintech_c360" -> ((s, _) => {
      val cust = SilverPipeline.customersToSilver(
        DataGenerator.customers(s, 1000), asOf = lit("2024-06-01").cast("date"))
      FintechGold.aggCustomer360(silverTxns(s), cust)
        .orderBy(col("customer_id"))
    }),

    // AML: CTR screen at the $10k reporting threshold
    "q42_aml_ctr" -> ((s, _) => {
      FintechGold.amlCtr(silverTxns(s)).orderBy(col("transaction_id"))
    }),

    // AML: structuring screen — ≥3 just-under-CTR txns in a 7-day window
    "q43_aml_structuring" -> ((s, _) => {
      FintechGold.amlStructuring(silverTxns(s))
        .orderBy(col("customer_id"), col("transaction_timestamp"))
    }),

    // J3 exactly as declared: each txn takes the latest exchange rate at or
    // before its date, per currency (as-of join, one shuffle on currency)
    "q44_rate_asof" -> ((s, _) => {
      val txns = silverTxns(s)
        .select(col("transaction_id"), col("currency"),
          col("transaction_timestamp").as("ts"), col("amount"))
      val rates = SilverPipeline.exchangeRatesToSilver(
        DataGenerator.exchangeRates(s, days = 90))
        .select(col("source_currency").as("currency"),
          col("rate_date").cast("timestamp").as("rts"),
          col("exchange_rate").cast("double").as("rate"))
      AsOfJoin.asOfBackward(txns, rates, Seq("currency"), "ts", "rts",
          Seq("rate"))
        .orderBy(col("transaction_id"))
    }),

    // multimodal plumbing: binary assets → per-partition batched feature
    // extraction (decode stubbed, Spark contract real)
    "q45_media_features" -> ((s, dir) => {
      Multimodal.extractFeatures(
        Multimodal.assetsFromDocuments(s, Q.t(s, dir, "documents")))
        .toDF().orderBy(col("asset_id"))
    }),

    // multimodal frame sampling (flatMap/generator shape over binary)
    "q46_media_frames" -> ((s, dir) => {
      Multimodal.sampleFrames(
        Multimodal.assetsFromDocuments(s, Q.t(s, dir, "documents")),
        framesPer = 4)
        .orderBy(col("asset_id"), col("frame_idx"))
    }))

  val oracles: Map[String, String] = Map.empty
}
