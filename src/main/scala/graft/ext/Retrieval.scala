package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Retrieval primitives for RAG / data-curation pipelines: Okapi BM25
  * lexical scoring and sliding-token-window document chunking. Both are
  * pure Column algebra (codegen'd, no UDFs).
  */
object Retrieval {

  /** Okapi BM25 score of every document against a FIXED literal query
    * (the lexical-retrieval counterpart of [[Similarity.bruteTopK]]).
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * with the Lucene-style smoothed idf(t) = ln(1 + (N − df + ½)/(df + ½)).
    *
    * Scale design: query terms are a literal handful, so per-doc tf is a
    * fixed set of `filter(tokens, = term)` counts inside one narrow
    * projection — the corpus is NEVER exploded to (doc, term) rows and
    * never shuffled. Corpus statistics (N, Σdl, per-term df) reduce to ONE
    * single-row aggregate (map-side partial) that re-joins via a broadcast
    * cross join. Two corpus scans total, both map-only.
    *
    * Determinism: the per-term contributions are added in the FIXED order
    * of `terms` — a literal expression chain, not a float aggregation — so
    * the double result is reproducible; `roundTo` (default 4) absorbs
    * last-ulp `ln` differences across math libraries for cross-engine
    * comparison. Tokens are whitespace-split lowercase words. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      roundTo: Int = 4): DataFrame = {
    require(terms.nonEmpty, "at least one query term")
    // null text scores 0 like an empty doc ("score of every document"):
    // without the coalesce, split(null) nulls every tf and the NULL
    // propagates through the score sum into downstream consumers (rrfFuse
    // would rank NULL-scored rows by engine null ordering)
    val toks = regexp_extract_all(lower(coalesce(col(textCol), lit(""))), lit("\\S+"), lit(0))
    def tf(i: Int): String = s"__tf$i"
    // one narrow projection: doc length + one tf column per query term,
    // let-bound so the split runs once per row (lambda capture re-evaluates
    // per element otherwise)
    val perDoc = docs.select(
      col(idCol) +:
        element_at(transform(array(toks), ts =>
          struct(
            (when(trim(col(textCol)) === "" || col(textCol).isNull, lit(0L))
              .otherwise(size(ts).cast(LongType))).as("dl") +:
              terms.zipWithIndex.map { case (t, i) =>
                size(filter(ts, x => x === lit(t))).cast(LongType).as(tf(i))
              }: _*)), 1).as("__d") +: Nil: _*)
      .select(col(idCol) +: col("__d.dl").as("__dl") +:
        terms.indices.map(i => col(s"__d.${tf(i)}").as(tf(i))): _*)
    // single-row corpus stats: N, total tokens, per-term doc frequency
    val statCols = sum(col("__dl")).as("__sdl") +:
      terms.indices.map(i =>
        sum(when(col(tf(i)) > 0, 1L).otherwise(0L)).as(s"__df$i"))
    val stats = perDoc.agg(count(lit(1)).as("__n"), statCols: _*)
    val joined = perDoc.crossJoin(broadcast(stats))
    val nD = col("__n").cast("double")
    // an ALL-blank corpus has avgdl = 0 — under ANSI, dl/avgdl would be
    // a job-killing 0/0; every doc scores 0 regardless, so any positive
    // stand-in is exact
    val avgdl0 = col("__sdl").cast("double") / nD
    val avgdl = when(avgdl0 > 0, avgdl0).otherwise(lit(1.0))
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl").cast("double") / avgdl)
    val score = terms.indices.map { i =>
      val tfd = col(tf(i)).cast("double")
      val dfd = col(s"__df$i").cast("double")
      val idf = log(lit(1.0) + (nD - dfd + lit(0.5)) / (dfd + lit(0.5)))
      // b = 1 and a blank doc give norm = 0 with tf = 0: the term's
      // score is 0 by limit, but the raw 0/0 throws under ANSI — guard
      // the quotient (nonzero tf implies a nonzero denominator)
      when(tfd + norm > 0, idf * (tfd * lit(k1 + 1.0)) / (tfd + norm))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    joined.select(col(idCol), round(score, roundTo).as("score"))
  }

  /** BM25 top-k: score, keep positives, TakeOrderedAndProject. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame =
    bm25(docs, idCol, textCol, terms, k1, b)
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher, SIGIR'09) of N
    * candidate rankings: every doc scores Σ_lists 1/(k0 + rank_list) —
    * the standard way to combine lexical (BM25) and dense (embedding)
    * retrieval without score calibration, since only RANKS enter the sum.
    * Inputs are (idCol, scoreCol) frames; rank = row_number by (score
    * desc, id). Output: (idCol, rrf, n_lists), rrf rounded to `roundTo`.
    *
    * Contract: inputs are TOP-K CANDIDATE LISTS (bm25TopK, Pq.topKRerank,
    * Ivf.topK output for one query…), already bounded — the ranking
    * window is global (no partitionBy), which is exactly right for a
    * bounded list and exactly wrong for a full corpus. Fusion itself is
    * one union + one groupBy over ≤ Σ|lists| rows. The per-doc sum folds
    * over the (list, contribution) pairs in list order — deterministic
    * regardless of partitioning. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String,
      scoreCol: String = "score", k0: Int = 60,
      roundTo: Int = 6): DataFrame = {
    require(rankings.nonEmpty, "at least one ranking")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(scoreCol).desc, col(idCol))
    val contribs = rankings.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol), col(scoreCol))
        .withColumn("__r", row_number().over(w))
        .select(col(idCol), lit(i).as("__list"),
          (lit(1.0) / (lit(k0.toDouble) + col("__r").cast("double")))
            .as("__c"))
    }.reduce(_ unionByName _)
    contribs.groupBy(col(idCol))
      .agg(
        round(aggregate(
          array_sort(collect_list(struct(col("__list"), col("__c")))),
          lit(0.0), (acc, e) => acc + e.getField("__c")), roundTo).as("rrf"),
        count(lit(1)).as("n_lists"))
  }

  /** Sliding token-window chunking: `chunkSize` tokens per chunk, a new
    * chunk every `stride` tokens (overlap = chunkSize − stride) — the RAG /
    * context-assembly shape. Output: (idCol, chunk_id, chunk_text,
    * n_tokens), chunk_id 0-based in document order; the final chunk may be
    * short; blank/null docs yield no chunks.
    *
    * Scale: narrow per-row explode — no shuffle, combines with pushdown.
    * Tokens are whitespace-split (case preserved — chunk text should stay
    * faithful to the source; normalize downstream if needed). */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 256, stride: Int = 192): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be > 0")
    val nonBlank = docs.filter(col(textCol).isNotNull &&
      trim(col(textCol)) =!= "")
    val toks = regexp_extract_all(col(textCol), lit("\\S+"), lit(0))
    // let-bind the token array; build one struct per window start
    val chunks = element_at(transform(array(toks), ts =>
      transform(sequence(lit(0), size(ts) - 1, lit(stride)), st =>
        struct(
          concat_ws(" ", slice(ts, st + 1, lit(chunkSize))).as("chunk_text"),
          least(size(ts) - st, lit(chunkSize)).cast(LongType)
            .as("n_tokens")))), 1)
    nonBlank
      .select(col(idCol), posexplode(chunks).as(Seq("__pos", "__c")))
      .select(col(idCol), col("__pos").cast(LongType).as("chunk_id"),
        col("__c.chunk_text").as("chunk_text"),
        col("__c.n_tokens").as("n_tokens"))
  }

  /** Hard-negative mining for embedding-model training (the DPR /
    * contrastive-learning data op): for each query item, the `k` corpus
    * items MOST similar by cosine that carry a DIFFERENT label — maximally
    * confusing non-matches, which is exactly what a contrastive loss needs
    * as negatives. Label comparison is null-safe: a null-label corpus item
    * counts as a different label than any labelled query (unknown
    * provenance must not be silently treated as a positive and excluded).
    *
    * Output: (query_id, neg_id, sim, rnk), rnk 1-based per query by sim
    * desc with id tiebreak.
    *
    * Scale design: identical to [[Similarity.bruteForceTopK]] — the query
    * batch is broadcast, the corpus (the 100 TB side) never shuffles for
    * scoring; norms computed once per row before the join; per-query
    * top-k via window over the scored sliver. Similarities are rounded to
    * `roundDigits` before ranking so rank order is robust to last-ulp
    * noise. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int,
      roundDigits: Int = 4): DataFrame = {
    require(k > 0, "k must be > 0")
    // the Similarity.scorable discipline: a NaN/Infinite norm passes a
    // bare `> 0` guard (NaN compares greater) and NaN similarity would
    // take rank 1..k of EVERY query's hard negatives — poisoned
    // contrastive training data with no error
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(labelCol).as("__ql"), col(vecCol).as("__qv"),
      Similarity.norm(col(vecCol)).as("__qn"))
      .filter(Similarity.scorable(col("__qn"))))
    val c = corpus.select(col(idCol).as("neg_id"),
      col(labelCol).as("__cl"), col(vecCol).as("__cv"),
      Similarity.norm(col(vecCol)).as("__cn"))
      .filter(Similarity.scorable(col("__cn")))
    val scored = q.join(c,
        col("query_id") =!= col("neg_id") && !(col("__cl") <=> col("__ql")))
      .withColumn("sim", round(
        when(col("__qn") > 0 && col("__cn") > 0,
          Similarity.dot(col("__qv"), col("__cv")) /
            (col("__qn") * col("__cn")))
          .otherwise(lit(0.0)), roundDigits))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neg_id").asc)
    scored.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neg_id"), col("sim"), col("rnk"))
  }
}
