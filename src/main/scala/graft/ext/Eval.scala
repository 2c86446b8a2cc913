package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Evaluation aggregates for retrieval and labeling pipelines: ranked-
  * retrieval quality (recall@k / MRR / nDCG against graded relevance
  * judgments) and inter-annotator agreement (Cohen's kappa). Both are
  * the measurement half of the curation loop — retrieval metrics grade
  * the BM25/ANN/RRF rankers ([[Retrieval]], [[Similarity]]) against
  * ground truth, kappa grades two labelers (human or heuristic, e.g.
  * the declared corpus language vs [[TextStats.langId]]) against each
  * other before their labels are trusted as filter signals.
  */
object Eval {

  /** Per-query ranked-retrieval metrics at cutoff `k` against graded
    * relevance judgments.
    *
    * Inputs: `results` (queryCol, docCol, rankCol — rank 1-based within
    * each query's candidate list) and `qrels` (queryCol, docCol, relCol
    * — graded relevance; rows with rel ≤ 0 are ignored). Queries are
    * the qrels query set (TREC convention): a query with judgments but
    * no retrieved hits scores zeros; retrieved queries without any
    * judgment row are dropped.
    *
    * Output, one row per judged query:
    * (queryCol, n_rel, n_hits, recall_at_k, mrr_at_k, ndcg_at_k) with
    *   recall@k = |retrieved∩relevant, rank ≤ k| / |relevant|
    *   MRR@k    = 1 / min rank of a relevant hit (0 if none ≤ k)
    *   nDCG@k   = Σ_hits (2^rel − 1)/log2(rank+1) normalized by the
    *              ideal DCG of the top-k judgments sorted by rel desc.
    *
    * Scale: `results` is top-k candidate lists (bounded per query) and
    * `qrels` is human-judgment-sized; the hit join shuffles on
    * (query, doc) and each metric is one per-query aggregate — no
    * corpus-sized frame enters. Doubles: contributions are O(1)
    * like-magnitude terms and ≤ k per query, so partial-agg order
    * noise (~1e-15) sits far below the `roundTo` grid (repo q87/q94
    * convention). */
  def retrievalMetrics(results: DataFrame, qrels: DataFrame,
      queryCol: String, docCol: String, rankCol: String, relCol: String,
      k: Int, roundTo: Int = 6): DataFrame = {
    require(k > 0, "k must be > 0")
    val rel = qrels.filter(col(relCol) > 0)
      .select(col(queryCol), col(docCol),
        col(relCol).cast("double").as("__rel"))
    // ideal DCG: judgments ranked by grade desc (doc id tiebreak — any
    // total order over equal grades yields the same DCG), cut at k
    val wIdeal = Window.partitionBy(col(queryCol))
      .orderBy(col("__rel").desc, col(docCol))
    val gain = (r: org.apache.spark.sql.Column,
        pos: org.apache.spark.sql.Column) =>
      (pow(lit(2.0), r) - lit(1.0)) / log2(pos.cast("double") + lit(1.0))
    val ideal = rel
      .withColumn("__i", row_number().over(wIdeal))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_rel"),
        sum(when(col("__i") <= k, gain(col("__rel"), col("__i")))
          .otherwise(lit(0.0))).as("__idcg"))
    val hits = results.filter(col(rankCol) <= k)
      .join(rel, Seq(queryCol, docCol))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_hits"),
        min(col(rankCol)).cast("double").as("__minr"),
        sum(gain(col("__rel"), col(rankCol))).as("__dcg"))
    ideal.join(hits, Seq(queryCol), "left")
      .select(col(queryCol), col("n_rel"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_rel").cast("double"), roundTo).as("recall_at_k"),
        round(coalesce(lit(1.0) / col("__minr"), lit(0.0)), roundTo)
          .as("mrr_at_k"),
        // __idcg > 0 whenever n_rel > 0 (the best judgment contributes
        // (2^rel − 1)/log2(2) > 0 at position 1)
        round(coalesce(col("__dcg"), lit(0.0)) / col("__idcg"), roundTo)
          .as("ndcg_at_k"))
  }

  /** Cohen's kappa between two nominal labelers, per group.
    *
    * Input: one row per doubly-labeled item with label columns `aCol`,
    * `bCol`; rows where either label is null are excluded (and counted
    * in `n_excluded` — silent exclusion would overstate n). Output per
    * group: (groupCols…, n, n_excluded, po, pe, kappa) where
    * po = observed agreement rate, pe = Σ_c pA(c)·pB(c) is chance
    * agreement from the two labelers' marginals, and
    * kappa = (po − pe)/(1 − pe) — null when pe = 1 (both labelers
    * constant and identical: agreement is unmeasurable, not perfect).
    *
    * Scale: two grouped counts per labeler marginal + an inner join on
    * (group, category) — all keyed on the group columns, O(groups ×
    * categories) intermediate, never item-sized after the first
    * aggregate. */
  def cohenKappa(labeled: DataFrame, groupCols: Seq[String],
      aCol: String, bCol: String, roundTo: Int = 6): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    val g = groupCols.map(col)
    val valid = labeled.filter(col(aCol).isNotNull && col(bCol).isNotNull)
    val base = labeled.groupBy(g: _*)
      .agg(count(lit(1)).as("__tot"),
        sum(when(col(aCol).isNull || col(bCol).isNull, 1L).otherwise(0L))
          .as("n_excluded"))
    val agree = valid.groupBy(g: _*)
      .agg(count(lit(1)).as("__n"),
        sum(when(col(aCol) === col(bCol), 1L).otherwise(0L)).as("__agree"))
    val margA = valid.groupBy(g :+ col(aCol).as("__cat"): _*)
      .agg(count(lit(1)).as("__na"))
    val margB = valid.groupBy(g :+ col(bCol).as("__cat"): _*)
      .agg(count(lit(1)).as("__nb"))
    // categories missing from one labeler contribute 0 to pe — inner join
    val pe = margA.join(margB, groupCols :+ "__cat")
      .groupBy(g: _*)
      .agg(sum(col("__na") * col("__nb")).as("__ab"))
    val po = col("__agree").cast("double") / col("__n").cast("double")
    // exact integer ratio: Σ na·nb / n² in one division, not a float dot
    // product of marginal rates — deterministic under any agg order.
    // coalesce(0): labelers sharing NO category have pe = 0 exactly
    val peC = coalesce(col("__ab"), lit(0L)).cast("double") /
      (col("__n").cast("double") * col("__n").cast("double"))
    // left joins from base: a group whose every row lost a label still
    // reports (n = 0, n_excluded) instead of vanishing. NULL-SAFE on the
    // group keys: a NULL group value is a real group (dirty data routes
    // there), and a plain column-name join would report its agreement as
    // n = 0 while n_excluded said nothing was dropped. Shared definition
    // in [[graft.util.Joins]]; bcastRight = false keeps this site's
    // original plan shape (group-cardinality frames, no hint).
    def nsJoin(l: org.apache.spark.sql.DataFrame,
        r: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      graft.util.Joins.nullSafeEqui(l, r, groupCols, how = "left",
        bcastRight = false)
    nsJoin(nsJoin(base, agree), pe)
      .select(g ++ Seq(
        coalesce(col("__n"), lit(0L)).as("n"), col("n_excluded"),
        round(po, roundTo).as("po"),
        round(peC, roundTo).as("pe"),
        round(when(peC < 1.0, (po - peC) / (lit(1.0) - peC)), roundTo)
          .as("kappa")): _*)
  }

  /** Exact ROC AUC of a score against a boolean label — the
    * classifier-quality headline (0.5 random, 1.0 perfect), computed
    * WITHOUT a global row ranking: rows collapse to one cell per
    * DISTINCT score (nPos_s, nNeg_s), and the Mann–Whitney identity
    *   AUC = Σ_s nPos_s·(cumNegBelow_s + nNeg_s/2) / (nPos·nNeg)
    * folds tied scores in exactly (each tie contributes half a win).
    * The cumulative-negative prefix runs TWO-PHASE over the cell frame
    * (range partition by score, per-partition running sums, broadcast
    * per-partition offsets): with a CONTINUOUS score the distinct-score
    * frame is row-sized, and a bare global-order window would funnel it
    * through one task — the same single-partition cliff the scalable
    * surrogate-key builder avoids. Rows with null/NaN score or null
    * label are excluded (a NaN score cell would sort greatest and
    * corrupt the prefix); a degenerate single-class input yields null.
    * Output (one row): n_pos, n_neg, auc. */
  def binaryAuc(df: DataFrame, scoreCol: String, labelCol: String,
      roundTo: Int = 6): DataFrame = {
    val sd = col(scoreCol).cast("double")
    val cells = df
      .filter(col(scoreCol).isNotNull && !isnan(sd) &&
        col(labelCol).isNotNull)
      .groupBy(sd.as("__s"))
      .agg(
        sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L))
          .as("__np"),
        sum(when(col(labelCol).cast("boolean"), 0L).otherwise(1L))
          .as("__nn"))
    // two-phase prefix sum (identical values to the global window):
    // range-partition cells by score so partitions are score-ordered,
    // run the window WITHIN each partition, add each partition's
    // broadcast exclusive total
    val ordered = graft.util.Caches.snapshot(cells
      .repartitionByRange(col("__s"))
      .sortWithinPartitions(col("__s"))
      .withColumn("__pid", spark_partition_id()))
    val offsets = ordered.groupBy("__pid")
      .agg(sum(col("__nn")).as("__pn"))
      .withColumn("__poff",
        coalesce(sum(col("__pn")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__poff"))
    val local = Window.partitionBy(col("__pid")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withCum = ordered.join(broadcast(offsets), "__pid")
      .withColumn("__cumNegBelow",
        col("__poff") + coalesce(sum(col("__nn")).over(local), lit(0L)))
    withCum.agg(
        sum(col("__np")).as("n_pos"),
        sum(col("__nn")).as("n_neg"),
        sum(col("__np").cast("double") *
          (col("__cumNegBelow").cast("double") +
            col("__nn").cast("double") / lit(2.0))).as("__u"))
      .select(col("n_pos"), col("n_neg"),
        round(when(col("n_pos") > 0L && col("n_neg") > 0L,
          col("__u") / (col("n_pos").cast("double") *
            col("n_neg").cast("double"))), roundTo).as("auc"))
  }
}
