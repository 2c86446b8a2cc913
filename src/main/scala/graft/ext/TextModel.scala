package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Corpus-level language modeling primitives for data curation:
  * vocabulary building (tokenizer-training prep) and unigram LM scoring
  * (the CCNet-style "perplexity filter" shape — docs with high negative
  * log-likelihood under a reference corpus distribution are outliers:
  * boilerplate, gibberish, wrong-language).
  */
object TextModel {

  /** Whitespace-lowercase token stream (idCol, term); blank/null docs
    * contribute nothing. One narrow explode — combines with pushdown. */
  private def tokens(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))

  /** Full corpus vocabulary: (term, n_tokens = total occurrences,
    * n_docs = containing docs), `minCount` floor. ONE shuffle on term with
    * map-side partial aggregation — the 100 TB shape (the vocab of a web
    * corpus is ~1e8 terms: far too big for the driver or a global window,
    * fine as a distributed frame). */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long = 1): DataFrame =
    tokens(docs, idCol, textCol)
      .groupBy("term")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_tokens") >= minCount)

  /** Top-`v` vocabulary with a 1-based frequency rank (ties break by
    * term). The full vocab reduces via TakeOrderedAndProject (no global
    * sort); the rank window runs only over the LIMITED, driver-sized
    * result — never over the full term set. */
  def topVocabulary(docs: DataFrame, idCol: String, textCol: String,
      v: Int): DataFrame = {
    require(v > 0, "v must be positive")
    vocabulary(docs, idCol, textCol)
      .orderBy(col("n_tokens").desc, col("term"))
      .limit(v)
      .withColumn("rank",
        row_number()
          .over(Window.orderBy(col("n_tokens").desc, col("term")))
          .cast(LongType))
  }

  /** Per-doc unigram negative log-likelihood under the corpus (or
    * `reference`) term distribution, with add-`alpha` smoothing:
    * p(t) = (count(t) + α) / (T + α·V). Output: (idCol, n_tokens,
    * nll_micros, avg_nll) where nll_micros = Σ round(−ln p · 1e6).
    *
    * Determinism: each token contributes an INTEGER micro-nat count, so
    * the per-doc sum is order-independent (long addition commutes —
    * unlike double sums, whose value depends on partial-aggregation
    * order) and the score is reproducible cross-engine; `avg_nll` divides
    * the exact integer total once at the end.
    *
    * Scale: explode → count-by-term (map-side combine) → token⋈count join
    * on term → integer sum by doc. Three shuffles over the token stream —
    * the honest cost of corpus-wide LM scoring; the (T, V) totals are one
    * single-row broadcast aggregate. `alpha` must be > 0 when scoring
    * docs with terms outside the reference (else p = 0 → infinite NLL). */
  def unigramNll(docs: DataFrame, idCol: String, textCol: String,
      alpha: Double = 0.0, roundTo: Int = 4,
      reference: Option[DataFrame] = None): DataFrame = {
    val toks = tokens(docs, idCol, textCol)
    val refToks = reference.map(tokens(_, idCol, textCol)).getOrElse(toks)
    val counts = refToks.groupBy("term").agg(count(lit(1)).as("__nt"))
    val stats = counts.agg(sum(col("__nt")).as("__T"),
      count(lit(1)).as("__V"))
    val p = (coalesce(col("__nt"), lit(0L)).cast("double") + lit(alpha)) /
      (col("__T").cast("double") + lit(alpha) * col("__V").cast("double"))
    toks.join(counts, Seq("term"), "left")
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        round(-log(p) * lit(1e6), 0).cast(LongType).as("__m"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__m")).as("nll_micros"))
      .withColumn("avg_nll",
        round(col("nll_micros").cast("double") / lit(1e6) /
          col("n_tokens").cast("double"), roundTo))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020,
    * arXiv:1911.00359): score every doc with the corpus (or reference)
    * unigram LM and split the corpus at the `lo`/`hi` avg-NLL
    * percentiles into head / middle / tail — the standard recipe for
    * quality-tiered pretraining mixtures (head = most fluent under the
    * reference distribution).
    *
    * Scale shape: the thresholds are ONE single-row exact-percentile
    * aggregate broadcast back into a narrow projection — no global sort
    * or window over the corpus. The scored frame appears twice in the
    * plan (threshold agg + bucketing side); Spark reuses the underlying
    * shuffle exchanges, and callers looping over buckets should persist
    * [[unigramNll]]'s output and bucket it themselves.
    *
    * Determinism: avg_nll is the round(·,4) of an integer micro-nat sum
    * (order-independent), thresholds round(·,6) after the standard
    * linear-interpolation percentile — both cross-engine-stable (the
    * q67/q50 parity classes). */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
      alpha: Double = 0.0, lo: Double = 1.0 / 3, hi: Double = 2.0 / 3,
      reference: Option[DataFrame] = None): DataFrame = {
    require(lo > 0 && hi < 1 && lo < hi, s"need 0 < lo < hi < 1; got $lo, $hi")
    val scored = unigramNll(docs, idCol, textCol, alpha,
      reference = reference)
    val th = scored.agg(
      round(expr(s"percentile(avg_nll, $lo)"), 6).as("__t1"),
      round(expr(s"percentile(avg_nll, $hi)"), 6).as("__t2"))
    scored.crossJoin(broadcast(th))
      .withColumn("bucket",
        when(col("avg_nll") <= col("__t1"), lit("head"))
          .when(col("avg_nll") <= col("__t2"), lit("middle"))
          .otherwise(lit("tail")))
      .drop("__t1", "__t2")
  }

  /** Feature-hashed bag-of-words embedding (the hashing trick; Weinberger
    * et al. 2009): token t increments bucket `hash(t) mod dim`, giving a
    * dense `array<double>` of counts that plugs a text-only corpus
    * straight into the vector operators ([[Similarity.clusterDedup]],
    * [[Similarity.bruteForceTopK]], [[Quantize.int8]]) with no neural
    * embedding table. Counts are left UN-normalized: cosine — the
    * consumer metric — is scale-invariant, and integer-valued doubles are
    * exactly cross-engine-reproducible.
    *
    * Pure narrow Column algebra — no explode, no shuffle; at 100 TB the
    * embedding rides the scan like any projection. The histogram costs
    * O(dim · tokens) lambda steps per doc (a probe per bucket), so keep
    * `dim` modest — hashed BoW gains little past a few dozen buckets.
    * Pass `hash = TextStats.md5Hash64` for oracle-checkable output, keep
    * the xxhash64 default for production throughput. */
  def hashEmbedding(text: Column, dim: Int = 64,
      hash: Column => Column = xxhash64(_)): Column = {
    val buckets = transform(split(lower(trim(text)), "\\s+"),
      t => pmod(hash(t), lit(dim)))
    // let-bind the bucket array (transform-over-singleton) so the
    // histogram probes don't re-hash every token once per bucket
    element_at(transform(array(buckets), bs =>
      transform(sequence(lit(0), lit(dim - 1)),
        b => size(filter(bs, x => x === b)).cast("double"))), 1)
  }
}
