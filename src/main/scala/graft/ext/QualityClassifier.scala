package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable document-quality classifier — the fastText/CCNet-style
  * linear filter every pretraining corpus pass runs: logistic regression
  * over feature-hashed bag-of-words, trained on a (small) labeled seed
  * set, applied to the (huge) corpus.
  *
  * The 100 TB split that makes this viable:
  *   - TRAINING runs on the seed via `spark.ml` LogisticRegression
  *     (L-BFGS; the seed is thousands-to-millions of rows — executor
  *     iterations are fine there);
  *   - SCORING is pure Column algebra over the BROADCAST weight vector
  *     (a `dim`-length literal array): `sigmoid(b + Σ_tok w[hash(tok) %
  *     dim] / n_tok)`. No model object, no UDF, no shuffle — the score
  *     rides the corpus scan inside whole-stage codegen exactly like any
  *     other projection, and the per-doc cost is O(tokens), independent
  *     of `dim`.
  *
  * Featurization is identical on both paths (mean of hashed token
  * counts), so the Column score reproduces the ml model's decision
  * function bit-for-bit up to float-vs-double rounding.
  */
object QualityClassifier {

  /** Broadcast-able trained model: `weights(dim)` + intercept, with the
    * feature-hash arity baked in so score/train can't drift apart. */
  final case class LinearTextModel(weights: Seq[Double], intercept: Double,
      dim: Int)

  /** Mean-of-hashed-counts feature vector as a Column (`array<double>`,
    * length `dim`): bucket b holds count(tokens hashing to b) / n_tokens.
    * Shared by train (materialized to ml vectors) and available to
    * callers who want the raw features; [[scoreColumn]] never builds it —
    * the dot product folds directly over the token stream. */
  def meanHashFeatures(text: Column, dim: Int,
      hash: Column => Column = xxhash64(_)): Column = {
    val counts = TextModel.hashEmbedding(text, dim, hash)
    // let-bind the count array; divide by the total ONCE (empty/blank
    // docs have a single "" token — n ≥ 1 by construction of split)
    element_at(transform(array(counts), cs =>
      transform(cs, c => c / aggregate(cs, lit(0.0), (a, x) => a + x))), 1)
  }

  /** Train on `labeled` (textCol + 0/1 labelCol): returns the weight
    * vector for [[scoreColumn]]. Runs entirely on the seed frame —
    * L-BFGS with L2; `regParam` keeps hash-collided buckets from
    * memorizing. Deterministic given a deterministic seed frame. */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
      dim: Int = 256, maxIter: Int = 100, regParam: Double = 1e-3,
      hash: Column => Column = xxhash64(_)): LinearTextModel = {
    // right-size the seed's partitioning for the iteration loop: every
    // L-BFGS step is a treeAggregate whose task count is the partition
    // count, and a small seed spread over 32 scan partitions pays ~30×
    // per-task scheduling overhead per iteration (measured: a 5k-row
    // seed fit 3.9 s at 32 partitions). repartition, NOT coalesce — a
    // coalesce would collapse the featurization itself to `parts`
    // threads (measured 5× slower); the shuffle barrier keeps the
    // featurization scan fully parallel and moves only the compact
    // (label, vector) rows. One count() up front is cheaper than one
    // wasted iteration; ~50k rows per task keeps million-row seeds
    // parallel.
    val n = labeled.count()
    val parts = math.max(1L, math.min(32L, n / 50000L)).toInt
    val feats = labeled.select(
        col(labelCol).cast("double").as("label"),
        org.apache.spark.ml.functions.array_to_vector(
          meanHashFeatures(col(textCol), dim, hash)).as("features"))
      .repartition(parts)
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(maxIter)
      .setRegParam(regParam)
      .setElasticNetParam(0.0) // pure L2 — dense weights broadcast fine
      .setStandardization(false)
      .setFitIntercept(true)
    // persist the featurized seed for the duration of the fit: without
    // it every L-BFGS iteration re-runs the tokenize+hash featurization
    // scan (spark.ml only caches internally under some configurations —
    // don't depend on it). Released before returning (Caches contract).
    feats.persist()
    try {
      val m = lr.fit(feats)
      LinearTextModel(m.coefficients.toArray.toSeq, m.intercept, dim)
    } finally { feats.unpersist(blocking = false); () }
  }

  /** P(quality=1) as a pure Column: `sigmoid(b + (Σ_tok w[bucket(tok)]) /
    * n_tok)`. The weights ship as a literal array (Catalyst folds it into
    * the plan — the "broadcast" is plan-side, zero runtime exchange), and
    * the fold is O(tokens) per doc regardless of `dim` — cheaper than
    * materializing the feature histogram when dim ≫ mean doc length. */
  def scoreColumn(text: Column, model: LinearTextModel,
      hash: Column => Column = xxhash64(_)): Column = {
    val w = typedlit(model.weights)
    val toks = regexp_extract_all(lower(text), lit("\\S+"), lit(0))
    // let-bind the token array: `size` and the fold must not re-split
    // blank text tokenizes to ZERO tokens: guard the mean's divisor (ANSI
    // division by zero throws) — no evidence means score = σ(intercept)
    element_at(transform(array(toks), ts =>
      lit(1.0) / (lit(1.0) + exp(-(lit(model.intercept) +
        when(size(ts) > 0,
          aggregate(ts, lit(0.0), (acc, t) =>
            acc + element_at(w,
              (pmod(hash(t), lit(model.dim)) + 1).cast("int"))) /
            size(ts).cast("double"))
          .otherwise(lit(0.0)))))), 1)
  }

  /** Distill a Column heuristic into a trained filter — the standard
    * bootstrap when no human labels exist (CCNet uses a reference-corpus
    * LM the same way): weak-label the seed with `heuristic` ≥ `threshold`,
    * train, return the model. The classifier generalizes the heuristic's
    * signal to token evidence the heuristic never looked at. */
  def distill(seed: DataFrame, textCol: String, heuristic: Column,
      threshold: Double, dim: Int = 256, maxIter: Int = 100,
      regParam: Double = 1e-3,
      hash: Column => Column = xxhash64(_)): LinearTextModel =
    train(
      seed.withColumn("__label",
        (heuristic >= lit(threshold)).cast("int")),
      textCol, "__label", dim, maxIter, regParam, hash)
}
