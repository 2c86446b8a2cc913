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
        explode(regexp_extract_all(lower(col(textCol)), lit("\\S+"), lit(0))).as("term"))

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
    // with a reference LM, an out-of-reference token has p = 0 at
    // alpha = 0: -log(0) = Infinity, the micro-nat LongType cast
    // saturates to Long.MaxValue, and TWO such tokens wrap the per-doc
    // sum NEGATIVE — the most out-of-distribution garbage would score
    // as the most fluent. Self-scored corpora (reference = None) never
    // see a zero count, so alpha = 0 stays legal there.
    require(reference.isEmpty || alpha > 0,
      "unigramNll needs alpha > 0 when scoring against a reference LM " +
        "(out-of-reference tokens have probability 0 otherwise)")
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

  /** Adjacent lowercase token pairs (idCol, w1, w2) — one narrow
    * zip-of-slices per row, no join, no shuffle; docs with fewer than
    * two tokens contribute nothing. */
  private def bigrams(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val ts = regexp_extract_all(lower(col(textCol)), lit("\\S+"), lit(0))
    docs.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol), element_at(transform(array(ts), a =>
        arrays_zip(slice(a, lit(1), size(a) - 1),
          slice(a, lit(2), size(a) - 1))), 1)
        .as("__ps"))
      .select(col(idCol), explode(col("__ps")).as("__p"))
      .select(col(idCol), col("__p.0").as("w1"), col("__p.1").as("w2"))
  }

  /** Per-doc INTERPOLATED BIGRAM negative log-likelihood — the next rung
    * above [[unigramNll]] on the CCNet-style fluency ladder (a bigram LM
    * separates scrambled-word gibberish from fluent text where a unigram
    * model cannot: both have the same word histogram):
    *
    *   p(w2 | w1) = λ · c(w1,w2)/c(w1·)  +  (1−λ) · (c(w2)+α)/(T+α·V)
    *
    * with c(w1·) the context count (occurrences of w1 as a left token)
    * and the second term the add-α unigram exactly as [[unigramNll]].
    * `λ < 1` and `α > 0` are required so unseen contexts/words keep
    * finite NLL (the interpolation floor — the standard Jelinek-Mercer
    * backoff shape). Output: (idCol, n_bigrams, nll_micros, avg_nll);
    * docs with fewer than two tokens yield no row.
    *
    * Determinism: per-pair integer micro-nats, long-summed — the q67
    * parity class (order-independent, cross-engine-stable; round
    * absorbs last-ulp `ln` differences).
    *
    * Scale: the reference tables (bigram, context, unigram counts) are
    * DISTRIBUTED frames — a web-corpus bigram table is ~1e9+ rows, far
    * past broadcast — and scoring joins shuffle the pair stream on
    * (w1,w2), w1, w2 plus one integer sum by doc: the honest cost of
    * corpus-wide LM scoring, the same family as [[unigramNll]]'s three
    * token shuffles. The (T, V) totals are one single-row broadcast. */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.75, alpha: Double = 1.0, roundTo: Int = 4,
      reference: Option[DataFrame] = None): DataFrame = {
    require(lambda >= 0 && lambda < 1,
      s"lambda must be in [0, 1) — the unigram floor handles unseen " +
        s"contexts; got $lambda")
    require(alpha > 0, s"alpha must be > 0 (unseen-word smoothing), got $alpha")
    val docPairs = bigrams(docs, idCol, textCol)
    val refPairs = reference.map(bigrams(_, idCol, textCol))
      .getOrElse(docPairs)
    val big = refPairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("__cb"))
    val ctx = refPairs.groupBy(col("w1")).agg(count(lit(1)).as("__cc"))
    val uni = reference.map(tokens(_, idCol, textCol))
      .getOrElse(tokens(docs, idCol, textCol))
      .groupBy(col("term")).agg(count(lit(1)).as("__cu"))
      .withColumnRenamed("term", "w2")
    val stats = uni.agg(sum(col("__cu")).as("__T"), count(lit(1)).as("__V"))
    val pMl = when(coalesce(col("__cc"), lit(0L)) > 0,
      coalesce(col("__cb"), lit(0L)).cast("double") /
        col("__cc").cast("double"))
      .otherwise(lit(0.0))
    val pUni = (coalesce(col("__cu"), lit(0L)).cast("double") + lit(alpha)) /
      (col("__T").cast("double") + lit(alpha) * col("__V").cast("double"))
    val p = lit(lambda) * pMl + lit(1.0 - lambda) * pUni
    docPairs
      .join(big, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(uni, Seq("w2"), "left")
      .crossJoin(broadcast(stats))
      .select(col(idCol), round(-log(p) * lit(1e6), 0).cast(LongType).as("__m"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__m")).as("nll_micros"))
      .withColumn("avg_nll",
        round(col("nll_micros").cast("double") / lit(1e6) /
          col("n_bigrams").cast("double"), roundTo))
  }

  /** Per-doc top-`k` keywords by TF-IDF (sklearn-style smoothed idf):
    *
    *   tfidf(t, d) = tf(t,d) · (ln((N+1)/(df(t)+1)) + 1)
    *
    * Output: (idCol, term, tf, df, tfidf, rnk), rnk 1-based per doc by
    * tfidf desc with term tiebreak. The score is a SINGLE product of a
    * long tf and one `ln` — no float summation anywhere — so it is
    * order-independent and cross-engine-reproducible at `roundTo`
    * digits (ranking runs on the ROUNDED value so ties break
    * identically everywhere).
    *
    * Scale: per-(doc, term) tf is one keyed aggregate with map-side
    * combine; df reduces the tf frame by term; N is a single-row
    * broadcast; the df re-attach shuffles on term and the top-k window
    * on the doc id — all keyed, no global sort, vocabulary stays a
    * distributed frame. */
  def keywords(docs: DataFrame, idCol: String, textCol: String,
      k: Int, roundTo: Int = 6): DataFrame = {
    require(k > 0, "k must be positive")
    val tf = tokens(docs, idCol, textCol)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nd = tf.agg(countDistinct(col(idCol)).as("__n"))
    val scored = tf.join(df, Seq("term"))
      .crossJoin(broadcast(nd))
      .withColumn("tfidf", round(
        col("tf").cast("double") *
          (log((col("__n").cast("double") + lit(1.0)) /
            (col("df").cast("double") + lit(1.0))) + lit(1.0)),
        roundTo))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("tfidf"), col("rnk"))
  }

  /** Collocation mining by pointwise mutual information over adjacent
    * token pairs (the phrase-discovery pass of tokenizer / n-gram
    * pipeline prep — "new york" scores high because its joint count far
    * exceeds the independence expectation):
    *
    *   pmi(a,b) = ln( (c(a,b) · T · T) / (B · c(a) · c(b)) )
    *
    * with T total tokens, B total bigrams. Only pairs with c(a,b) ≥
    * `minCount` are emitted (PMI of rare pairs is pure noise — the
    * standard floor). Output: (term_a, term_b, n_pair, n_a, n_b, pmi).
    *
    * Scale: bigram and unigram counts are keyed aggregates with map-side
    * combine (distributed frames, never collected); the two count
    * re-attaches shuffle the SURVIVING pair set (already floored by
    * `minCount`) on each term; T and B are single-row broadcasts. */
  def pmiCollocations(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long = 5, roundTo: Int = 4): DataFrame =
    pmiCollocationCounts(docs, idCol, textCol, minCount)
      .select(col("term_a"), col("term_b"), col("n_pair"),
        col("n_a"), col("n_b"),
        round(log(
          (col("n_pair").cast("double") * col("t_total") * col("t_total")) /
            (col("b_total").cast("double") * col("n_a") * col("n_b"))),
          roundTo).as("pmi"))

  /** The integer sufficient statistics behind [[pmiCollocations]]:
    * (term_a, term_b, n_pair, n_a, n_b, t_total, b_total) — everything
    * needed to reconstruct PMI, all BIGINT. This is the cross-engine
    * reproducible surface: `round(ln(...), k)` of a ratio of large
    * integers can legitimately flip its last digit between libm
    * implementations when the true value lands within ~1 ulp of a
    * rounding-grid boundary (it did, twice, on the external hash gate),
    * so hash-gated consumers compare THESE exact counts and let the
    * float score live only in the analyst-facing [[pmiCollocations]]
    * view. Same plan shape as pmiCollocations minus the `ln`. */
  def pmiCollocationCounts(docs: DataFrame, idCol: String,
      textCol: String, minCount: Long = 5): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    val pairs = bigrams(docs, idCol, textCol)
    val toks = tokens(docs, idCol, textCol)
    val uc = toks.groupBy(col("term")).agg(count(lit(1)).as("__cu"))
    val tot = toks.agg(count(lit(1)).as("t_total"))
    val btot = pairs.agg(count(lit(1)).as("b_total"))
    pairs.groupBy(col("w1").as("term_a"), col("w2").as("term_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
      .join(uc.select(col("term").as("term_a"), col("__cu").as("n_a")),
        Seq("term_a"))
      .join(uc.select(col("term").as("term_b"), col("__cu").as("n_b")),
        Seq("term_b"))
      .crossJoin(broadcast(tot))
      .crossJoin(broadcast(btot))
      .select(col("term_a"), col("term_b"), col("n_pair"),
        col("n_a"), col("n_b"), col("t_total"), col("b_total"))
  }

  /** Per-doc n-gram novelty: the share of a doc's DISTINCT word
    * `n`-grams that appear in NO other document (corpus df == 1) — the
    * cheap memorization/boilerplate screen: low novelty means the doc is
    * assembled from text the corpus already contains (template spam,
    * mirrored pages, quotation-heavy pages), high novelty means unique
    * content worth keeping. Docs shorter than `n` tokens contribute one
    * whole-text gram (the [[Shingles.wordShingles]] convention), so every
    * non-empty doc gets a score.
    *
    * Output: (idCol, n_grams, n_unique, novelty = n_unique / n_grams
    * rounded to `roundTo`).
    *
    * Scale design: the per-doc distinct grams ride the scan (one HOF
    * pass per row); gram document frequency is a groupBy + equi-join,
    * NOT `count(*) over (partition by gram)` — a window partition is
    * one unsplittable task, so a boilerplate gram present in 1e8 docs
    * ("all rights reserved") would funnel its entire exploded mass
    * through a single straggler, where the groupBy gets map-side
    * partial combine and the join gets AQE skew splitting. Both join
    * inputs shuffle on __gram from the SAME exploded subtree, so
    * exchange reuse runs the tokenize/explode once. No all-pairs stage,
    * nothing collected. */
  def noveltyScore(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, roundTo: Int = 6): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val dg = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol),
        explode(array_distinct(Shingles.wordShingles(col(textCol), n)))
          .as("__gram"))
    val gdf = dg.groupBy(col("__gram")).agg(count(lit(1)).as("__df"))
    dg.join(gdf, Seq("__gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .select(col(idCol), col("n_grams"), col("n_unique"),
        round(col("n_unique").cast("double") /
          col("n_grams").cast("double"), roundTo).as("novelty"))
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
    // coalesce: NULL text would null-propagate into the histogram where
    // size(filter(null, ...)) is the -1 sentinel — every null-text doc
    // got the constant [-1.0, ...] vector, pairwise cosine exactly 1.0,
    // a giant fake near-dup cluster. A blank doc instead embeds as the
    // all-zero vector, which every scoring path excludes as unscorable.
    val buckets = transform(
      regexp_extract_all(lower(coalesce(text, lit(""))), lit("\\S+"), lit(0)),
      t => pmod(hash(t), lit(dim)))
    // let-bind the bucket array (transform-over-singleton) so the
    // histogram probes don't re-hash every token once per bucket
    element_at(transform(array(buckets), bs =>
      transform(sequence(lit(0), lit(dim - 1)),
        b => size(filter(bs, x => x === b)).cast("double"))), 1)
  }
}
