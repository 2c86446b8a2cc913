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
  * engine-generated deterministic data (seed 42), not the driver parquet.
  *
  * Oracle strategy: the generator can't run in DuckDB, but it IS
  * deterministic and partition-independent — so `Verify` dumps the exact
  * silver inputs ([[oracleTables]]) to parquet next to the query outputs,
  * and the oracle SQL reads them back via `read_parquet` (the
  * [[OutPlaceholder]] token is replaced with the absolute output dir at
  * dump time). That turns the whole fintech gold/AML layer from rows-only
  * into DuckDB-hash-checked.
  */
object FintechQueries {

  type QFn = (SparkSession, String) => DataFrame

  /** Token in oracle SQL that Verify rewrites to the absolute out dir. */
  val OutPlaceholder = "__GRAFT_OUT__"

  /** `read_parquet` reference to a Verify-dumped oracle input table.
    * Lives in a sibling `<outDir>_inputs` dir, NOT inside outDir — the
    * driver's gate enumerates every subdir of outDir as a query output. */
  private def st(name: String): String =
    s"read_parquet('${OutPlaceholder}_inputs/$name/*.parquet')"

  // modest volumes: enough to exercise every pattern incl. AML tails
  private def silverTxns(s: SparkSession): DataFrame =
    SilverPipeline.transactionsToSilver(
      DataGenerator.transactions(s, 20000, nCustomers = 1000, nMerchants = 100))

  private def silverCustomers(s: SparkSession): DataFrame =
    SilverPipeline.customersToSilver(
      DataGenerator.customers(s, 1000), asOf = lit("2024-06-01").cast("date"))

  private def silverRates(s: SparkSession): DataFrame =
    SilverPipeline.exchangeRatesToSilver(
      DataGenerator.exchangeRates(s, days = 90))

  /** The exact silver inputs the fintech queries consume, for Verify to
    * dump so the DuckDB oracle can recompute q40–q44 from the same bytes. */
  def oracleTables(s: SparkSession): Map[String, DataFrame] = Map(
    "silver_txns" -> silverTxns(s),
    "silver_customers" -> silverCustomers(s),
    "silver_rates" -> silverRates(s))

  val queries: Map[String, QFn] = Map(
    // generator → silver casts → gold daily metrics, fully deterministic.
    // DECIMAL outputs are cast to DOUBLE at the query boundary: the driver
    // hashes Spark parquet via pyarrow (Decimal '1763.20') vs the oracle
    // via DuckDB->pandas (float64 '1763.2'), so decimals can never
    // hash-match even when values are identical (Q parity rules).
    "q40_fintech_daily" -> ((s, _) => {
      FintechGold.aggDailyMetrics(silverTxns(s))
        .withColumn("total_amount_usd", col("total_amount_usd").cast("double"))
        .withColumn("total_fees", col("total_fees").cast("double"))
        .orderBy(col("transaction_date"), col("status"))
    }),

    // customer 360 over generated customers + txns
    "q41_fintech_c360" -> ((s, _) => {
      FintechGold.aggCustomer360(silverTxns(s), silverCustomers(s))
        .withColumn("total_spend_usd", col("total_spend_usd").cast("double"))
        .orderBy(col("customer_id"))
    }),

    // AML: CTR screen at the $10k reporting threshold
    "q42_aml_ctr" -> ((s, _) => {
      FintechGold.amlCtr(silverTxns(s))
        .withColumn("amount_usd", col("amount_usd").cast("double"))
        .orderBy(col("transaction_id"))
    }),

    // AML: structuring screen — ≥3 just-under-CTR txns in a 7-day window
    "q43_aml_structuring" -> ((s, _) => {
      FintechGold.amlStructuring(silverTxns(s))
        .withColumn("amount_usd", col("amount_usd").cast("double"))
        .withColumn("sum_window", col("sum_window").cast("double"))
        .orderBy(col("customer_id"), col("transaction_timestamp"))
    }),

    // J3 exactly as declared: each txn takes the latest exchange rate at or
    // before its date, per currency (as-of join, one shuffle on currency)
    "q44_rate_asof" -> ((s, _) => {
      val txns = silverTxns(s)
        .select(col("transaction_id"), col("currency"),
          col("transaction_timestamp").as("ts"),
          col("amount").cast("double").as("amount"))
      val rates = silverRates(s)
        .select(col("source_currency").as("currency"),
          col("rate_date").cast("timestamp").as("rts"),
          col("exchange_rate").cast("double").as("rate"))
      AsOfJoin.asOfBackward(txns, rates, Seq("currency"), "ts", "rts",
          Seq("rate"))
        .orderBy(col("transaction_id"))
    }),

    // multimodal plumbing: binary assets → per-partition batched feature
    // extraction. The decode stub's derivation is engine-portable
    // integer algebra (position-weighted byte sum mod 2^31-1), so the
    // DuckDB oracle replays the WHOLE path — UTF-8 payload bytes,
    // type routing, pseudo-dimension/duration/intensity math — and the
    // gate hash-checks every value. Ints cast to BIGINT for the
    // column-type compare.
    "q45_media_features" -> ((s, dir) => {
      Multimodal.extractFeatures(
        Multimodal.assetsFromDocuments(s, Q.t(s, dir, "documents")))
        .toDF()
        .withColumn("width", col("width").cast("long"))
        .withColumn("height", col("height").cast("long"))
        .orderBy(col("asset_id"))
    }),

    // multimodal frame sampling (flatMap/generator shape over binary):
    // REAL frame extraction — each doc renders an actual 3-frame
    // animated GIF, decoded back frame-by-frame via the JDK's GIF
    // reader (hash/dimensions from real pixels, no stub on this path).
    // Gated per frame_idx as (count, asset-id sum, dims sums, pixel-hash
    // sum mod p): DuckDB cannot decode GIF, so the oracle PINS these
    // aggregates (deterministic for the fixed seed-42 testdata) — a
    // dropped frame, a wrong pixel, or a mis-sampled raster flips a sum.
    "q46_media_frames" -> ((s, dir) => {
      Multimodal.sampleFrames(
        Multimodal.syntheticVideoAssets(Q.t(s, dir, "documents"),
          framesPer = 3),
        framesPer = 4)
        .groupBy(col("frame_idx"))
        .agg(count(lit(1)).as("n"),
          sum(col("asset_id")).as("id_sum"),
          sum(col("width").cast("long")).as("w_sum"),
          sum(col("height").cast("long")).as("h_sum"),
          sum(pmod(col("frame_hash"), lit(1000003L))).as("hash_sum"))
        .orderBy(col("frame_idx"))
    }),

    // perceptual image near-dup: real PNG render → real JDK decode →
    // dHash → banded Hamming join. Docs sharing a pattern group are
    // planted near-dup clusters (brightness-jittered copies), so the
    // pair graph exercises identical-hash clustering AND banding.
    // Gated per hamming distance (pair count, endpoint-id sums) against
    // a PINNED oracle — pixel-sampling dHash is engine-specific, so
    // DuckDB cannot recompute it, but the aggregates are deterministic
    // for the fixed testdata and any pairing change flips them.
    "q82_image_neardup" -> ((s, dir) => {
      Multimodal.imageNearDupPairs(
        Multimodal.syntheticImageAssets(Q.t(s, dir, "documents")),
        maxHamming = 3)
        .groupBy(col("hamming"))
        .agg(count(lit(1)).as("n"),
          sum(col("a")).as("a_sum"), sum(col("b")).as("b_sum"))
        .orderBy(col("hamming"))
    }),

    // audio near-dup twin of q82: real WAV render → real JDK decode →
    // envelope fingerprint → banded Hamming join over planted
    // volume-jittered clusters. Same pinned-aggregate gate shape as q82
    // (frame-sampled envelope math is engine-specific).
    "q90_audio_neardup" -> ((s, dir) => {
      Multimodal.audioNearDupPairs(
        Multimodal.syntheticAudioAssets(Q.t(s, dir, "documents")),
        maxHamming = 3)
        .groupBy(col("hamming"))
        .agg(count(lit(1)).as("n"),
          sum(col("a")).as("a_sum"), sum(col("b")).as("b_sum"))
        .orderBy(col("hamming"))
    }))

  /** DuckDB equivalents over the Verify-dumped silver parquet. Decimal sums
    * mirror Spark's cast chain; ratios are exact-numerator ÷ count with an
    * explicit double division (queries.Q parity rules). */
  val oracles: Map[String, String] = Map(

    // PINNED GOLDENS for the real-decode media gates: DuckDB cannot
    // decode GIF/PNG/WAV, so these three oracles pin the expected
    // aggregates instead of recomputing them. The values are
    // deterministic functions of the FIXED seed-42 testdata (TESTDATA.md:
    // generated once, read-only) through pure-JDK decode paths — pixel
    // sampling, dHash, PCM envelope math are bit-stable across runs.
    // Pinned at sf0.01, the only scale the correctness gate runs at; a
    // regenerated documents table would invalidate them (then re-pin).
    // DERIVATION + auditable re-pin recipe: FIXTURES.md §4 — the pins
    // are the Verify dump of these three queries printed by the one-
    // liner there; never re-pin to green a red gate without a testdata
    // regeneration in the same commit.
    "q46_media_frames" ->
      """SELECT CAST(frame_idx AS INTEGER) AS frame_idx,
        |  CAST(n AS BIGINT) AS n, CAST(id_sum AS BIGINT) AS id_sum,
        |  CAST(w_sum AS BIGINT) AS w_sum, CAST(h_sum AS BIGINT) AS h_sum,
        |  CAST(hash_sum AS BIGINT) AS hash_sum
        |FROM (VALUES
        |  (0, 500, 124750, 24000, 16000, 261244850),
        |  (1, 500, 124750, 24000, 16000, 259594160),
        |  (2, 500, 124750, 24000, 16000, 233919250))
        |  AS t(frame_idx, n, id_sum, w_sum, h_sum, hash_sum)
        |ORDER BY frame_idx""".stripMargin,

    "q82_image_neardup" ->
      """SELECT CAST(hamming AS BIGINT) AS hamming, CAST(n AS BIGINT) AS n,
        |  CAST(a_sum AS BIGINT) AS a_sum, CAST(b_sum AS BIGINT) AS b_sum
        |FROM (VALUES (0, 464, 8829, 123959))
        |  AS t(hamming, n, a_sum, b_sum)
        |ORDER BY hamming""".stripMargin,

    "q90_audio_neardup" ->
      """SELECT CAST(hamming AS BIGINT) AS hamming, CAST(n AS BIGINT) AS n,
        |  CAST(a_sum AS BIGINT) AS a_sum, CAST(b_sum AS BIGINT) AS b_sum
        |FROM (VALUES (0, 450, 11025, 123525))
        |  AS t(hamming, n, a_sum, b_sum)
        |ORDER BY hamming""".stripMargin,

    // Full replay of the portable stub decode: UTF-8 payload bytes via
    // encode(), per-byte hex extraction, the position-weighted sum mod
    // 2^31-1 (weights 31^(pos%8) mod p — products < 2^40, partials <
    // 2^60, overflow-free), and the derived dims/duration/intensity.
    "q45_media_features" ->
      """WITH assets AS (
        |  SELECT doc_id AS asset_id,
        |    ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1]
        |      AS media_type,
        |    encode(text) AS content
        |  FROM documents),
        |hx AS (SELECT asset_id, hex(content) AS hs,
        |         octet_length(content) AS n FROM assets),
        |b AS (
        |  SELECT asset_id, p.pos,
        |    ('0x' || substr(hs, CAST(p.pos * 2 + 1 AS BIGINT), 2))::BIGINT AS bv
        |  FROM hx, LATERAL (SELECT unnest(range(0, n)) AS pos) p),
        |hs AS (
        |  SELECT asset_id,
        |    CAST(SUM((bv + 1) * CASE CAST(pos % 8 AS INTEGER)
        |      WHEN 0 THEN 1 WHEN 1 THEN 31 WHEN 2 THEN 961
        |      WHEN 3 THEN 29791 WHEN 4 THEN 923521 WHEN 5 THEN 28629151
        |      WHEN 6 THEN 887503681 ELSE 1742810335 END)
        |      % 2147483647 AS BIGINT) AS h,
        |    CAST(SUM(bv) AS BIGINT) AS sumb
        |  FROM b GROUP BY asset_id)
        |SELECT a.asset_id, a.media_type,
        |  CAST(COALESCE(octet_length(a.content), 0) AS BIGINT) AS n_bytes,
        |  64 + COALESCE(h.h, 0) % 1024 AS width,
        |  64 + (COALESCE(h.h, 0) // 1024) % 1024 AS height,
        |  CASE WHEN a.media_type = 'image' THEN 0
        |       ELSE COALESCE(h.h, 0) % 600000 END AS duration_ms,
        |  CASE WHEN COALESCE(octet_length(a.content), 0) = 0 THEN 0.0
        |       ELSE CAST(h.sumb AS DOUBLE)
        |         / CAST(octet_length(a.content) AS DOUBLE) END
        |    AS mean_intensity,
        |  COALESCE(h.h, 0) AS feature_hash
        |FROM assets a LEFT JOIN hs h USING (asset_id)
        |ORDER BY a.asset_id""".stripMargin,
    "q40_fintech_daily" ->
      s"""SELECT transaction_date, status, COUNT(*) AS n_transactions,
         |  CAST(CAST(SUM(amount_usd) AS DECIMAL(38,2)) AS DOUBLE) AS total_amount_usd,
         |  CAST(CAST(SUM(fee_amount) AS DECIMAL(38,2)) AS DOUBLE) AS total_fees,
         |  CAST(SUM(CASE WHEN is_flagged THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         |  COUNT(DISTINCT customer_id) AS n_customers
         |FROM ${st("silver_txns")}
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q41_fintech_c360" ->
      s"""WITH per AS (
         |  SELECT customer_id, COUNT(*) AS n_transactions,
         |    CAST(CAST(SUM(amount_usd) AS DECIMAL(38,2)) AS DOUBLE) AS total_spend_usd,
         |    CAST(CAST(SUM(amount_usd) AS DECIMAL(38,2)) AS DOUBLE)
         |      / CAST(COUNT(*) AS DOUBLE) AS avg_transaction_usd,
         |    MIN(transaction_date) AS first_transaction_date,
         |    MAX(transaction_date) AS last_transaction_date,
         |    CAST(SUM(CASE WHEN is_flagged THEN 1 ELSE 0 END) AS DOUBLE)
         |      / CAST(COUNT(*) AS DOUBLE) AS fraud_rate,
         |    COUNT(DISTINCT merchant_id) AS n_merchants
         |  FROM ${st("silver_txns")} GROUP BY 1)
         |SELECT c.customer_id, c.segment, c.kyc_status, c.risk_score, c.country,
         |  p.n_transactions, p.total_spend_usd, p.avg_transaction_usd,
         |  p.first_transaction_date, p.last_transaction_date, p.fraud_rate,
         |  p.n_merchants
         |FROM ${st("silver_customers")} c LEFT JOIN per p USING (customer_id)
         |ORDER BY c.customer_id""".stripMargin,

    "q42_aml_ctr" ->
      s"""SELECT transaction_id, customer_id,
         |  CAST(amount_usd AS DOUBLE) AS amount_usd, transaction_date
         |FROM ${st("silver_txns")}
         |WHERE amount_usd >= 10000 ORDER BY transaction_id""".stripMargin,

    "q43_aml_structuring" ->
      s"""WITH sub AS (
         |  SELECT customer_id, transaction_id, transaction_timestamp, amount_usd
         |  FROM ${st("silver_txns")}
         |  WHERE amount_usd >= 9000 AND amount_usd < 10000
         |    AND transaction_timestamp IS NOT NULL),
         |w AS (
         |  SELECT customer_id, transaction_id, transaction_timestamp, amount_usd,
         |    COUNT(*) OVER win AS n_window,
         |    CAST(SUM(amount_usd) OVER win AS DECIMAL(38,2)) AS sum_window
         |  FROM sub
         |  WINDOW win AS (PARTITION BY customer_id
         |    ORDER BY CAST(FLOOR(epoch(transaction_timestamp)) AS BIGINT)
         |    RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW))
         |SELECT customer_id, transaction_id, transaction_timestamp,
         |  CAST(amount_usd AS DOUBLE) AS amount_usd, n_window,
         |  CAST(sum_window AS DOUBLE) AS sum_window
         |FROM w WHERE n_window >= 3
         |ORDER BY customer_id, transaction_timestamp""".stripMargin,

    "q44_rate_asof" ->
      s"""WITH t AS (
         |  SELECT transaction_id, currency, transaction_timestamp AS ts,
         |    CAST(amount AS DOUBLE) AS amount
         |  FROM ${st("silver_txns")}),
         |r AS (
         |  SELECT source_currency AS currency, CAST(rate_date AS TIMESTAMP) AS rts,
         |    CAST(exchange_rate AS DOUBLE) AS rate
         |  FROM ${st("silver_rates")})
         |SELECT t.currency, t.ts, t.transaction_id, t.amount,
         |  r.rts AS asof_rts, r.rate AS asof_rate
         |FROM t ASOF LEFT JOIN r ON t.currency = r.currency AND r.rts <= t.ts
         |ORDER BY t.transaction_id""".stripMargin)
}
