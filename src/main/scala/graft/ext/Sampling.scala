package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines: split assignment
  * and sampling decisions are pure functions of the row's id hash, so
  * they are stable across runs, partitionings, cluster sizes and Spark
  * versions — the property that matters for reproducible train/val/test
  * membership and for incrementally-growing corpora (a doc's split never
  * changes when new data arrives). Seeded `df.sample`/`sampleBy` give
  * none of these guarantees.
  *
  * All decisions compare an integer bucket `pmod(hash(id), 1e6)` against
  * integer thresholds (`round(rate * 1e6)`) — no float boundaries, so an
  * external system (or SQL oracle) reproducing the arithmetic gets the
  * identical row set. Narrow Column algebra: no shuffle, no UDF; a
  * sample/split over 100 TB is a map-only scan that combines with
  * filter/column pushdown. Hash is pluggable like the other ext
  * operators: xxhash64 by default, [[TextStats.md5Hash64]] when the
  * assignment must be reproducible outside the JVM.
  */
object Sampling {

  /** Bucket resolution: rates are honored to 1e-6. */
  val Buckets = 1000000L

  /** Integer bucket in [0, Buckets) from the id hash. Ids are hashed via
    * their canonical string form so any engine can reproduce the bucket.
    *
    * NULL-id contract: xxhash64 of an all-null input is its SEED, so
    * every null-id row lands in ONE constant bucket — sampling and split
    * decisions for them are all-or-nothing (deterministic, and leak-safe
    * for splits: identity-less rows stay together, never straddling
    * train/test), and the constant differs per hash function (md5Hash64
    * nulls out instead and such rows drop from samples / take the last
    * split). Rows without identity cannot be independently resampled by
    * ANY keyed scheme; filter them upstream when per-row inclusion
    * probabilities matter. */
  def bucket(id: Column, hash: Column => Column = xxhash64(_)): Column =
    pmod(hash(id.cast("string")), lit(Buckets))

  /** Assign every row a stable split label ("train"/"val"/"test"...) from
    * `weights` (need not sum to 1 — they are normalized). Assignment is
    * by cumulative-bucket interval in the given order of `weights`; the
    * last split takes the otherwise-branch, so no row is ever
    * unassigned. */
  def hashSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Double)],
      splitCol: String = "split",
      hash: Column => Column = xxhash64(_)): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0) &&
      weights.map(_._2).sum > 0, "weights must be non-negative, sum > 0")
    val total = weights.map(_._2).sum
    val b = bucket(col(idCol), hash)
    val uppers = weights
      .map(w => w._2 / total)
      .scanLeft(0.0)(_ + _).tail
      .map(u => math.round(u * Buckets))
    val label = weights.map(_._1).zip(uppers).init
      .foldLeft(Option.empty[Column]) { case (acc, (name, upper)) =>
        Some(acc.fold(when(b < upper, lit(name)))(_.when(b < upper, lit(name))))
      }
      .fold(lit(weights.last._1))(_.otherwise(lit(weights.last._1)))
    df.withColumn(splitCol, label)
  }

  /** Leakage-safe split: [[hashSplit]] keyed on the doc's NEAR-DUP
    * COMPONENT representative instead of the doc itself, so near-
    * duplicates can never straddle a split boundary. A doc-keyed split
    * leaks eval answers into training whenever the corpus still contains
    * near-copies (it always does before dedup, and residually after);
    * grouping by the minhash-LSH ≥`minJaccard` component closes that
    * hole — the group moves between splits as a unit.
    *
    * Output: the input plus `group_id` (the component's min doc id;
    * singletons are their own group) and `splitCol`. Split RATES are
    * honored at component granularity, so realized doc-level proportions
    * drift with dup-cluster sizes — inherent to leakage safety.
    *
    * Scale design: pair mining and components are the q57 dedup path
    * (banded LSH candidates + exact-Jaccard verify, pointer-jumping CC —
    * every stage keyed, bucket-capped, no all-pairs); the component
    * re-attach is one join keyed on the id whose right side holds only
    * docs that belong to some dup pair (a sliver of the corpus); the
    * split itself stays a narrow hash of `group_id`. */
  def leakSafeSplit(docs: DataFrame, idCol: String, textCol: String,
      weights: Seq[(String, Double)],
      shingleSize: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      minJaccard: Double = 0.8, splitCol: String = "split",
      hash: Column => Column = xxhash64(_)): DataFrame = {
    val pairs = Dedup.minHashLsh(docs, idCol, textCol, shingleSize,
      bands, rowsPerBand, minJaccard)
    // connectedComponents materializes eagerly, so the pair blocks can
    // be released here — via Caches.release: minHashLsh returns a
    // SNAPSHOT frame, and Dataset.unpersist on those is a silent no-op
    // (localCheckpoint blocks, not CacheManager entries)
    val comps = Dedup.connectedComponents(pairs)
    graft.util.Caches.release(pairs)
    val grouped = docs
      .join(comps.select(col("id").as(idCol), col("component")),
        Seq(idCol), "left")
      .withColumn("group_id", coalesce(col("component"), col(idCol)))
      .drop("component")
    hashSplit(grouped, "group_id", weights, splitCol, hash)
  }

  /** Deterministic Bernoulli sample at `rate`: keeps a row iff its id
    * bucket falls under `round(rate * 1e6)`. Same row set on every run. */
  def hashSample(df: DataFrame, idCol: String, rate: Double,
      hash: Column => Column = xxhash64(_)): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate $rate outside [0,1]")
    df.filter(bucket(col(idCol), hash) < math.round(rate * Buckets))
  }

  /** Seeded per-row key input. `concat_ws` SKIPS nulls, so a bare null
    * id would hash to the seed alone — every null-id row then shares one
    * key and an id tiebreak compares nulls, making which rows
    * survive/rank run-dependent. Null ids get an explicit marker
    * (distinct from any real id string), and callers append
    * [[rowTiebreak]] as the LAST sort key. */
  private def seededId(idCol: String, seed: Long): Column =
    concat_ws(":",
      coalesce(col(idCol).cast("string"), lit("\u0000<null-id>")),
      lit(seed.toString))

  /** Content-hash tiebreak over every hashable column: rows that tie on
    * (key, id) — null-id twins, id collisions — order by their content,
    * so the output is deterministic up to BIT-IDENTICAL rows (which are
    * interchangeable by definition). Map-typed columns are unhashable
    * and excluded. */
  private def rowTiebreak(df: DataFrame): Column = {
    val hashable = df.schema.fields
      .filterNot(_.dataType.catalogString.contains("map<"))
      .map(f => col(f.name)).toSeq
    if (hashable.isEmpty) lit(0L) else xxhash64(hashable: _*)
  }

  /** Deterministic corpus shuffle: a seeded hash of the id becomes the
    * sort key, giving a reproducible "random" row order for training-data
    * writes (epoch order must be stable across reruns and restarts; a
    * different seed = a different epoch permutation). The plan is a
    * range-partitioned sort — no global window, no single-partition stage —
    * so it scales like any ORDER BY. Ties (hash collisions, null-id
    * twins) break by id then content hash, making the total order fully
    * deterministic up to bit-identical rows. */
  def shuffled(df: DataFrame, idCol: String, seed: Long = 0,
      keyCol: String = "shuffle_key",
      hash: Column => Column = xxhash64(_)): DataFrame =
    df.withColumn(keyCol, hash(seededId(idCol, seed)))
      .orderBy(col(keyCol), col(idCol), rowTiebreak(df))

  /** Keep at most `n` rows per group, chosen deterministically by seeded
    * id hash (the C4-style per-domain cap: no domain may dominate the
    * mixture however large its crawl). ONE shuffle on the group key; the
    * per-group ranking is a window, so a pathological mega-group
    * (the "blogspot.com problem") still sorts within one partition —
    * cap AFTER domain-level filtering, or pre-thin giant groups with
    * [[hashSample]] when a group alone outweighs a partition. Hash ties
    * break by id: fully deterministic, stable across reruns. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String, n: Int,
      seed: Long = 0, hash: Column => Column = xxhash64(_)): DataFrame = {
    require(n > 0, "cap must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(hash(seededId(idCol, seed)), col(idCol), rowTiebreak(df))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Deterministic stratified sample: a per-stratum rate (default for
    * strata not listed). The training-mixture primitive — e.g. keep 100%
    * of books, 10% of web crawl. Map-only; no shuffle. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      hash: Column => Column = xxhash64(_)): DataFrame = {
    require((defaultRate +: rates.values.toSeq).forall(r => r >= 0 && r <= 1),
      "rates must be in [0,1]")
    val threshold = rates.foldLeft(lit(math.round(defaultRate * Buckets))) {
      case (acc, (k, r)) =>
        when(col(strataCol) === k, lit(math.round(r * Buckets))).otherwise(acc)
    }
    df.filter(bucket(col(idCol), hash) < threshold)
  }

  /** Temperature-weighted source mixture table (the Pile/LLaMA data-mix
    * recipe): per source s with token share p_s, mixture weight
    * w_s = p_s^α / Σ p^α — α &lt; 1 flattens the mix (upweights small
    * curated sources against the web crawl), α = 1 is natural sampling.
    * `rate` = targetTokens · w_s / tokens_s is the expected EPOCH COUNT
    * over that source (may exceed 1: small sources repeat).
    *
    * Determinism: token totals are exact long sums; the power-sum
    * normalizer folds over the collected per-source list in source
    * order (a handful of rows — collect_list is bounded by the number
    * of SOURCES, never docs), so no double addition depends on
    * partitioning. Output doubles round to 6. */
  def mixtureWeights(df: DataFrame, sourceCol: String, tokensCol: String,
      alpha: Double, targetTokens: Long): DataFrame = {
    require(alpha > 0, "alpha must be positive")
    require(df.schema(sourceCol).dataType ==
      org.apache.spark.sql.types.StringType,
      s"$sourceCol must be STRING — cast upstream (the driver-side rate " +
        "table is keyed by string)")
    val spark = df.sparkSession
    import spark.implicits._
    // ONE corpus scan: the per-source totals are bounded by the number of
    // SOURCES (a mixture has tens, not millions) — driver-sized by
    // construction, same pattern as Ivf centroids. Chaining the
    // normalizer as DataFrame aggregates instead would recompute this
    // aggregate once per downstream branch (4 corpus scans, measured).
    // Null-source rows are EXCLUDED (they'd NPE the string sort and have
    // no principled mixture membership).
    val per = df.filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol))
      // cast + coalesce: a double tokens column must not ClassCast the
      // getLong, and a source whose tokens are ALL null must read as 0,
      // not NPE the driver unboxing
      .agg(coalesce(sum(col(tokensCol).cast("long")), lit(0L))
        .as("n_tokens"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1) // fixed fold order: no double sum depends on anything
    val total = per.map(_._2).sum.toDouble
    val empty = Seq.empty[(String, Long, Double, Double)]
      .toDF(sourceCol, "n_tokens", "weight", "rate")
    if (per.isEmpty || total == 0) return empty // all-zero corpus: no mix
    val pa = per.map { case (_, n) => math.pow(n / total, alpha) }
    val z = pa.sum // source-ordered fold
    // mirror Spark's Round expression exactly (BigDecimal.valueOf = the
    // double's SHORTEST decimal rep, not its exact binary expansion —
    // the variant DuckDB's ROUND agreed with in the oracle gate)
    def r6(v: Double): Double = java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    per.zip(pa).map { case ((s, n), p) =>
      // a zero-token source has no mass to repeat: weight/rate 0, not
      // the 0/0 NaN that would throw in BigDecimal.valueOf
      val rate = if (n == 0) 0.0 else targetTokens.toDouble * (p / z) / n
      require(rate <= 1e6,
        s"source '$s' would repeat ${rate.toLong}x — targetTokens " +
          s"$targetTokens is implausible against its $n tokens")
      (s, n, r6(p / z), r6(rate))
    }.toSeq.toDF(sourceCol, "n_tokens", "weight", "rate")
  }

  /** Materialize the mixture: every doc repeats `floor(rate_s)` times
    * plus one more iff its id bucket clears the fractional remainder —
    * deterministic expected-token-exact sampling WITH repetition (rates
    * over 1 mean epochs, the small-source case). Output adds `epoch`
    * (1-based repeat index); docs whose source samples to zero drop out.
    * One broadcast join against the source-count table + a narrow
    * sequence-explode — the corpus never shuffles. */
  def mixtureSample(df: DataFrame, sourceCol: String, idCol: String,
      tokensCol: String, alpha: Double, targetTokens: Long,
      hash: Column => Column = xxhash64(_)): DataFrame = {
    val rates = mixtureWeights(df, sourceCol, tokensCol, alpha, targetTokens)
      .select(col(sourceCol), col("rate"))
    val whole = floor(col("rate")).cast("int")
    val fracThreshold = round((col("rate") - floor(col("rate"))) *
      lit(Buckets.toDouble), 0)
    val repeats = whole +
      when(bucket(col(idCol), hash) < fracThreshold, 1).otherwise(0)
    // null-source docs drop here BY DESIGN, consistently with
    // mixtureWeights, which excludes them from the rate table too ("no
    // principled mixture membership" — their mass shapes no weight, so
    // they belong in no sample); the equi-join IS the exclusion
    df.join(broadcast(rates), Seq(sourceCol))
      .withColumn("__n", repeats)
      .filter(col("__n") > 0)
      .withColumn("epoch", explode(sequence(lit(1), col("__n"))))
      .drop("__n", "rate")
  }

  /** Budget-constrained quality selection — "keep the best docs until the
    * token budget runs out", the subset-construction step behind
    * classifier-filtered pretraining corpora (select top-quality mass,
    * e.g. an edu-scored web crawl cut to a 1.5T-token budget).
    *
    * Semantics (exact, deterministic): order docs by
    * (quality band DESC, id-hash ASC, id ASC) — band =
    * `floor(score·bands)` clipped to [0, bands) — and keep the maximal
    * PREFIX whose cumulative `tokensCol` stays ≤ `budgetTokens`. The
    * hash tiebreak inside a band makes the boundary cut an unbiased
    * sample of the boundary band rather than an id-ordered slice.
    *
    * Scale shape — the corpus never globally sorts and never shuffles:
    *  1. one map-side aggregate of token mass per (band, hash-prefix
    *     bucket) — ≤ bands·256 rows collected (the only driver data);
    *  2. the driver walks groups in selection order to find the boundary
    *     group and its remaining budget;
    *  3. one windowed cumsum over JUST the boundary group (~1/(bands·256)
    *     of the corpus, filter-pushed) resolves the exact cut row;
    *  4. the selection is then a broadcast-literal filter riding a plain
    *     corpus scan.
    * A global ORDER BY + running sum computes the same thing in one
    * shot — and range-shuffles the entire corpus to do it.
    *
    * Rows with a null score or null/negative tokens are ineligible and
    * never selected; zero-token rows are free and keep whole-band
    * semantics. `scoreCol` must lie in [0, 1] (clipped); ids must be
    * unique. The id hash is [[TextStats.md5Hash64]] of
    * `"<seed>|<id>"` — reproducible in any engine. */
  def selectByTokenBudget(df: DataFrame, idCol: String, scoreCol: String,
      tokensCol: String, budgetTokens: Long, bands: Int = 256,
      seed: Long = 0): DataFrame = {
    require(budgetTokens >= 0, "budgetTokens must be >= 0")
    require(bands > 0, "bands must be positive")
    // a null id cannot be deterministically bucketed (its seeded hash is
    // null, which would surface as a null-bucket group and NPE the
    // driver walk) — null-id rows are ineligible, like null scores
    // !isnan: a NaN score passes isNotNull, floor(NaN*bands) = NaN,
    // greatest(NaN, 0) = NaN (NaN compares greatest) and least clamps it
    // to the TOP band — unscored garbage would spend the budget FIRST
    val eligible = col(scoreCol).isNotNull &&
      !isnan(col(scoreCol).cast("double")) && col(tokensCol).isNotNull &&
      col(tokensCol) >= 0 && col(idCol).isNotNull
    val band = least(greatest(floor(col(scoreCol) * bands), lit(0)),
      lit(bands - 1)).cast("int")
    val h = TextStats.md5Hash64(
      concat(lit(seed.toString), lit("|"), col(idCol).cast("string")))
    // md5Hash64 ∈ [0, 2^60): the top 8 bits give 256 buckets whose
    // ascending order EQUALS ascending hash order — the group walk and
    // the row order agree by construction
    val bucketOf = shiftright(h, 52).cast("int")
    val keyed = df.filter(eligible)
      .select(col(idCol).as("__id"), col(tokensCol).cast("long").as("__t"),
        band.as("__band"), bucketOf.as("__bkt"), h.as("__h"))
    val groups = keyed.groupBy(col("__band"), col("__bkt"))
      .agg(sum(col("__t")).as("t"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .sortBy { case (b, k, _) => (-b, k) }
    var cum = 0L
    var boundary: Option[(Int, Int, Long)] = None // (band, bucket, remaining)
    val it = groups.iterator
    while (boundary.isEmpty && it.hasNext) {
      val (b, k, t) = it.next()
      if (cum + t > budgetTokens) boundary = Some((b, k, budgetTokens - cum))
      else cum += t
    }
    boundary match {
      case None => df.filter(eligible) // whole eligible corpus fits
      case Some((bStar, kStar, remaining)) =>
        val pre = band > bStar ||
          (band === bStar && bucketOf < kStar)
        // resolve the exact cut row inside the boundary group: window
        // cumsum over ~1/(bands·256) of the corpus, then keep rows at or
        // before the last fitting (hash, id) — collected as two literals
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("__h").asc, col("__id").asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val lastKept = keyed
          .filter(col("__band") === bStar && col("__bkt") === kStar)
          .withColumn("__cum", sum(col("__t")).over(w))
          .filter(col("__cum") <= remaining)
          .orderBy(col("__h").desc, col("__id").desc)
          .limit(1).collect()
        val bnd = lastKept.headOption.map { r =>
          val hStar = r.getAs[Long]("__h")
          band === bStar && bucketOf === kStar &&
            (h < hStar || (h === hStar && col(idCol) <= lit(r.get(0))))
        }.getOrElse(lit(false))
        df.filter(eligible && (pre || bnd))
    }
  }

  /** Weighted sample WITHOUT replacement (Efraimidis–Spirakis A-ES,
    * IPL 2006): the `k` rows with the smallest key −ln(u)/w, where u is
    * a deterministic uniform in (0, 1] from a seeded hash of the id and
    * w = `weightCol` — at every sequential selection step each
    * remaining row's inclusion odds are proportional to its weight (the
    * importance-sampling primitive: quality-weighted corpus draws,
    * upweighted rare-source draws). Same seed ⇒ same sample, and with
    * the default [[TextStats.md5Hash64]] the draw reproduces in any
    * engine with md5 — the exponential key is pure arithmetic on an
    * exactly-representable dyadic uniform (h mod 2⁵³ + 1)/2⁵³.
    *
    * Rows with null/non-positive weight are ineligible (w ≤ 0 has no
    * sampling odds). `groupCols` empty draws one global sample as a
    * TakeOrderedAndProject (top-k, never a global sort); non-empty
    * draws k per group through ONE shuffle + per-group window. Ties
    * (impossible absent hash collisions) break by id. Output: input
    * columns + `sample_rank` (1-based selection order within the
    * group — the order sequential A-ES would have drawn them). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, groupCols: Seq[String] = Nil, seed: Long = 0,
      hash: Column => Column = TextStats.md5Hash64(_)): DataFrame = {
    require(k > 0, "k must be > 0")
    val twoTo53 = 9007199254740992L // 2^53: dyadic → u is exact in double
    val u = (pmod(hash(seededId(idCol, seed)), lit(twoTo53)) + lit(1L))
      .cast("double") / lit(twoTo53.toDouble)
    val key = -log(u) / col(weightCol).cast("double")
    // !isnan: NaN > 0 is TRUE in Spark — a NaN weight would enter with
    // key = NaN (sorts last, but still selected whenever a group has
    // fewer than k finite-weight rows), as ineligible as a null weight
    val eligible = df.filter(col(weightCol).isNotNull &&
        !isnan(col(weightCol).cast("double")) && col(weightCol) > 0)
      .withColumn("__key", key)
    val tiebreak = rowTiebreak(df)
    val ranked =
      if (groupCols.isEmpty)
        eligible.orderBy(col("__key"), col(idCol), tiebreak).limit(k)
          .withColumn("sample_rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("__key"), col(idCol), tiebreak)))
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(groupCols.map(col): _*)
          .orderBy(col("__key"), col(idCol), tiebreak)
        eligible.withColumn("sample_rank", row_number().over(w))
          .filter(col("sample_rank") <= k)
      }
    ranked.drop("__key")
  }
}
