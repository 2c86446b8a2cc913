package graft

import org.apache.spark.sql.functions._

import graft.generator.DataGenerator

/** Statistical distribution-parity gates for the generator (VERDICT r16
  * #2): GenDataSpec pins defaults/seeding/CSV contracts structurally, but
  * the SURVEY §1.4 semantics the reference encodes as BUSINESS MEANING —
  * lognormal(3.5, 1.5) amounts capped [0.01, 50000]
  * (reference generator.py:451-453), the 2.5% fraud base rate (:38),
  * structuring concentrated at $9–10k (:511-515), and is_cross_border ⇔
  * merchant_country ≠ customer_country (:495-497) — were asserted
  * nowhere. These gates run on a seeded 100k-transaction sample, so a
  * distribution change that silently breaks reference semantics fails the
  * suite.
  *
  * Tolerances: boolean rates get ±4σ binomial bands (at n=100k,
  * p=0.025 → σ≈0.049%, so ±0.2%); quantiles of the lognormal get bands
  * derived from the order-statistic normal approximation, widened ~3x for
  * comfort — wide enough that hash-draw luck can't flake the suite,
  * narrow enough that using the wrong μ/σ (or forgetting the cap) fails
  * it. All checks aggregate Spark-side; only scalar summaries reach the
  * driver. */
class GeneratorDistributionSpec extends SparkSpec {

  private val N = 100000L

  private lazy val txns = {
    val df = DataGenerator.transactions(spark, N, nCustomers = 10000L,
      nMerchants = 500L, days = 90)
      .select(
        col("amount").cast("double").as("amount"),
        col("is_flagged"), col("fraud_indicators"),
        col("merchant_country"), col("customer_country"),
        col("is_cross_border"))
    df.cache(); df.count(); df
  }

  test("amounts stay inside [0.01, 50000] and the lognormal tail is " +
    "present (generator.py:451-453)") {
    val r = txns.agg(
      min(col("amount")).as("lo"), max(col("amount")).as("hi"))
      .head()
    assert(r.getAs[Double]("lo") >= 0.01)
    assert(r.getAs[Double]("hi") <= 50000.0)
    // the 50000 cap itself is ~never hit at n=100k (P(X>50000) ≈ 5e-7 for
    // lognormal(3.5,1.5)) — what IS observable is the heavy tail: the
    // sample max concentrates around e^(3.5 + 1.5*z_{1-1/n}) ≈ e^9.9 ≈
    // 20k; a max below ~2000 means the tail (σ) shrank
    assert(r.getAs[Double]("hi") > 2000.0,
      s"max ${r.getAs[Double]("hi")} too small — lognormal tail missing")
  }

  test("non-structuring amounts follow lognormal(3.5, 1.5): median ≈ " +
    "e^3.5 ≈ 33.1 and p90 ≈ e^(3.5+1.2816*1.5) ≈ 226 (generator.py:451)") {
    val qs = txns.filter(col("fraud_indicators") =!= "STRUCTURING")
      .stat.approxQuantile("amount", Array(0.5, 0.9), 0.001)
    val (med, p90) = (qs(0), qs(1))
    assert(med > 30.0 && med < 36.5,
      s"median $med outside the lognormal(3.5,1.5) band [30, 36.5]")
    assert(p90 > 205.0 && p90 < 250.0,
      s"p90 $p90 outside the lognormal(3.5,1.5) band [205, 250]")
  }

  test("fraud base rate ≈ 2.5% on non-structuring rows (generator.py:38)" +
    " and every flagged row carries indicators, every clean row none") {
    val r = txns.agg(
      sum(when(col("fraud_indicators") =!= "STRUCTURING" &&
        col("is_flagged") === "True", 1).otherwise(0)).as("baseFlagged"),
      sum(when(col("fraud_indicators") =!= "STRUCTURING", 1).otherwise(0))
        .as("nonStruct"),
      sum(when(col("is_flagged") === "True" &&
        col("fraud_indicators") === "", 1).otherwise(0)).as("flaggedEmpty"),
      sum(when(col("is_flagged") === "False" &&
        col("fraud_indicators") =!= "", 1).otherwise(0)).as("cleanWithInd"))
      .head()
    val rate = r.getAs[Long]("baseFlagged").toDouble /
      r.getAs[Long]("nonStruct")
    // 4σ band at p=0.025, n≈99.5k: ±0.20%
    assert(rate > 0.023 && rate < 0.027,
      f"base fraud rate $rate%.4f outside [0.023, 0.027]")
    assert(r.getAs[Long]("flaggedEmpty") == 0L,
      "flagged rows must carry at least one fraud indicator")
    assert(r.getAs[Long]("cleanWithInd") == 0L,
      "unflagged rows must carry no fraud indicators")
  }

  test("structuring rows sit at ~0.5% of the corpus, are ALL flagged, " +
    "and every amount lands in [9000, 10000) — the just-under-the-CTR " +
    "pattern (generator.py:511-515)") {
    val r = txns.agg(
      sum(when(col("fraud_indicators") === "STRUCTURING", 1).otherwise(0))
        .as("n"),
      sum(when(col("fraud_indicators") === "STRUCTURING" &&
        (col("amount") < 9000.0 || col("amount") >= 10000.0), 1)
        .otherwise(0)).as("outOfBand"),
      sum(when(col("fraud_indicators") === "STRUCTURING" &&
        col("is_flagged") =!= "True", 1).otherwise(0)).as("unflagged"))
      .head()
    val rate = r.getAs[Long]("n").toDouble / N
    // 4σ band at p=0.005, n=100k: ±0.09%
    assert(rate > 0.0041 && rate < 0.0059,
      f"structuring rate $rate%.4f outside [0.0041, 0.0059]")
    assert(r.getAs[Long]("outOfBand") == 0L,
      "structuring amounts must all land in [9000, 10000)")
    assert(r.getAs[Long]("unflagged") == 0L,
      "structuring rows must all be flagged")
  }

  test("is_cross_border ⇔ merchant_country ≠ customer_country on EVERY " +
    "row (generator.py:495-497), and both branches occur") {
    val r = txns.agg(
      sum(when((col("merchant_country") =!= col("customer_country")) =!=
        (col("is_cross_border") === "True"), 1).otherwise(0)).as("bad"),
      sum(when(col("is_cross_border") === "True", 1).otherwise(0)).as("xb"))
      .head()
    assert(r.getAs[Long]("bad") == 0L,
      "is_cross_border must equal (merchant_country != customer_country)")
    val xb = r.getAs[Long]("xb")
    assert(xb > 0L && xb < N, "both cross-border branches must occur")
  }

  test("the distribution contracts hold under a NON-DEFAULT seed too " +
    "(semantics are seed-independent; only the draws change)") {
    val df = DataGenerator.transactions(spark, 20000L, nCustomers = 1000L,
      nMerchants = 100L, days = 30, seed = 7)
      .select(col("amount").cast("double").as("amount"),
        col("is_flagged"), col("fraud_indicators"))
    val r = df.agg(
      min(col("amount")).as("lo"), max(col("amount")).as("hi"),
      avg(when(col("is_flagged") === "True", 1.0).otherwise(0.0))
        .as("flagRate")).head()
    assert(r.getAs[Double]("lo") >= 0.01 && r.getAs[Double]("hi") <= 50000.0)
    // total flag rate = base 2.5% + structuring 0.5% (minus overlap);
    // 5σ band at n=20k for p≈0.0299: ±0.6%
    val fr = r.getAs[Double]("flagRate")
    assert(fr > 0.024 && fr < 0.036,
      f"seed-7 flag rate $fr%.4f outside [0.024, 0.036]")
  }
}
