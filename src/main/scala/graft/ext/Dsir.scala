package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): select raw-corpus docs whose hashed bag-of-words
  * distribution looks like a TARGET corpus (curated text, a benchmark
  * domain), by importance weight under two hashed-unigram LMs:
  *
  *   log w(doc) = Σ_tokens [ log p_target(bucket(t)) − log p_raw(bucket(t)) ]
  *
  * and Gumbel-max sampling: top-k of (log w + Gumbel noise) is an exact
  * sample without replacement ∝ w — the paper's estimator.
  *
  * Determinism (the cross-engine contract every piece of this repo's
  * oracle gate relies on): bucket log-ratios are integer MICRO-NATS
  * (round(·×1e6) — the q67 class), so per-doc weights are
  * order-independent long sums; the Gumbel noise is derived from a
  * per-doc hash-uniform (no RNG), so the whole selection replays
  * bit-identically under any partitioning.
  *
  * Scale shape: the two bucket LMs are ONE aggregate each over the
  * token streams (map-side combine onto ≤ `dim` keys), collected as a
  * `dim`-sized literal that rides the scan — scoring is a narrow
  * projection, no join against the corpus; selection is a top-k
  * (TakeOrderedAndProject), no global sort. */
object Dsir {

  /** Per-bucket micro-nat log-ratio table: mi[b] =
    * round(1e6 · ln( p_target(b) / p_raw(b) )) with add-one smoothing
    * over `dim` buckets. Computed IN Spark (same round/ln codepath the
    * oracle's SQL mirrors), collected as a dim-sized array. */
  private def logRatioMicros(raw: DataFrame, target: DataFrame,
      textCol: String, dim: Int, hash: Column => Column): Array[Long] = {
    val spark = raw.sparkSession
    def bucketCounts(docs: DataFrame): DataFrame =
      docs
        .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
        .select(explode(regexp_extract_all(lower(col(textCol)), lit("\\S+"), lit(0))).as("__t"))
        .select(pmod(hash(col("__t")), lit(dim.toLong)).as("__b"))
        .groupBy(col("__b")).agg(count(lit(1)).as("__c"))
    val rawC = bucketCounts(raw)
    val tgtC = bucketCounts(target)
    // dense 0..dim-1 bucket frame so absent buckets still smooth to +1
    val buckets = spark.range(dim).select(col("id").as("__b"))
    // persist the dim-sized count table: the totals action and the
    // log-ratio collect below must not EACH re-scan both token streams
    val joined = buckets
      .join(tgtC.withColumnRenamed("__c", "__ct"), Seq("__b"), "left")
      .join(rawC.withColumnRenamed("__c", "__cr"), Seq("__b"), "left")
      .select(col("__b"),
        coalesce(col("__ct"), lit(0L)).as("__ct"),
        coalesce(col("__cr"), lit(0L)).as("__cr"))
      .persist()
    try {
      val totals = joined.agg(sum(col("__ct")).as("__tt"),
        sum(col("__cr")).as("__tr")).head()
      val tt = totals.getLong(0); val tr = totals.getLong(1)
      // p(b) = (c_b + 1) / (T + dim); ratio folded in one ln, one round
      val mi = round(
        log((col("__ct").cast("double") + 1.0) / lit((tt + dim).toDouble) /
          ((col("__cr").cast("double") + 1.0) / lit((tr + dim).toDouble)))
          * lit(1e6), 0).cast(LongType)
      val rows = joined.select(col("__b"), mi.as("__mi")).collect()
      val out = new Array[Long](dim)
      rows.foreach(r => out(r.getLong(0).toInt) = r.getLong(1))
      out
    } finally joined.unpersist(blocking = false)
  }

  /** Select `k` docs from `raw` by importance to `target`. Output:
    * (idCol, score_micros = doc log-weight in micro-nats, key_micros =
    * score + Gumbel noise — the sampling key), ordered by
    * (key_micros desc, id), exactly `k` rows (fewer if the corpus is
    * smaller). Pass `hash = TextStats.md5Hash64` for the
    * oracle-checkable variant; keep the xxhash64 default in
    * production. */
  def resample(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, dim: Int = 64,
      hash: Column => Column = xxhash64(_)): DataFrame = {
    require(k > 0, "k must be positive")
    require(dim > 0, "dim must be positive")
    val mi = logRatioMicros(raw, target, textCol, dim, hash)
    val miLit = typedlit(mi.toSeq)
    // Σ over tokens of mi[bucket(token)] — long fold, order-independent
    val score = aggregate(
      transform(regexp_extract_all(lower(col(textCol)), lit("\\S+"), lit(0)),
        t => element_at(miLit, pmod(hash(t), lit(dim.toLong))
          .cast("int") + 1)),
      lit(0L), (acc, x) => acc + x)
    // hash-uniform in (0,1): (h mod 1e6 + 0.5)/1e6; Gumbel = −ln(−ln u)
    val u = (pmod(hash(concat(col(idCol).cast("string"), lit(":dsir"))),
      lit(1000000L)).cast("double") + 0.5) / 1000000.0
    val gumbel = round(-log(-log(u)) * lit(1e6), 0).cast(LongType)
    raw
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol), score.as("score_micros"), gumbel.as("__g"))
      .withColumn("key_micros", col("score_micros") + col("__g"))
      .drop("__g")
      .orderBy(col("key_micros").desc, col(idCol))
      .limit(k)
  }
}
