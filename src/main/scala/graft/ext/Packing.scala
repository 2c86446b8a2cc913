package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Sequence packing for training pipelines: assign documents to
  * fixed-token-budget packs (context-window filling). Semantics are
  * contiguous-fill in id order — pack p holds the docs whose PRECEDING
  * token mass lies in [p·budget, (p+1)·budget) — i.e. a streaming
  * first-fit, deterministic for a given ordering, the standard shape for
  * assembling pretraining examples (docs are not reordered, a doc
  * straddling a boundary starts pack p and spills into it).
  *
  * Two forms, same output: [[packByBudget]] uses a global ordered window
  * (one cumsum — fine up to millions of docs, single-partition window at
  * the extreme); [[packByBudgetScalable]] computes the identical running
  * sum with range partitioning + per-partition cumsum + broadcast
  * offsets (the two-phase pattern of `addSurrogateKeyScalable`) — no
  * single-partition stage, safe at corpus scale.
  */
object Packing {

  /** Exact long floor-division (`div`): a double cast would lose precision
    * past 2^53 cumulative tokens and silently misassign boundary docs.
    * Token counts are non-negative, so truncation == floor. */
  private def floorDiv(num: Column, budget: Long): Column =
    Bridge.column(new IntegralDivide(Bridge.expression(num), Literal(budget)))

  /** (idCol, tokensCol) → + pack_id via one global cumulative sum. */
  def packByBudget(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, packCol: String = "pack_id"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val before = coalesce(
      sum(guardedTokens(tokensCol)).over(Window.orderBy(col(idCol))
        .rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    df.withColumn(packCol, floorDiv(before, budget))
  }

  /** Token counts must be non-negative for the pack math to hold: a
    * NEGATIVE count makes the running sum non-monotone AND breaks the
    * floorDiv truncation == floor identity (IntegralDivide truncates
    * toward zero: -150 div 100 = -1 where floor is -2) — wrong,
    * possibly negative pack ids with no error. Fail loudly at the
    * offending row. NULL counts pass as 0 mass (sum skips them) — note
    * that a long run of zero-mass docs all lands in one pack, so
    * [[assemblePacks]]' bounded-group claim assumes upstream length
    * floors (tokenCount > 0 filters) the curation pipeline applies. */
  private def guardedTokens(tokensCol: String): Column =
    when(col(tokensCol) < 0, raise_error(concat(
      lit("packByBudget: negative token count "), col(tokensCol),
      lit(" — pack assignment would be non-monotone; fix the counter"))))
      .otherwise(col(tokensCol))

  /** Identical assignment without a global window: range-partition by id,
    * per-partition running sum, partition token totals broadcast as
    * offsets (k scalars — driver-sized by construction). */
  def packByBudgetScalable(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, packCol: String = "pack_id"): DataFrame =
    packByBudgetOrdered(df, Seq(col(idCol)), tokensCol, budget, packCol)

  /** Materialize the packed training examples: one row per pack with the
    * member docs' text concatenated in pack order (the sequence a
    * trainer would consume), plus member count and token total. The
    * `orderCols` must be the SAME total order packing used — the
    * within-pack sort is what makes the concatenation deterministic.
    * The sort is an ascending STRUCT sort: encode a descending member
    * (curriculum quality) by negation (`-col("quality")`), mirroring
    * how it was packed.
    *
    * Scale: one shuffle on pack_id; each group holds only the docs of
    * one budget-bounded pack, so `collect_list` state is capped by
    * budget/min-doc-tokens members — group size is bounded by
    * construction, the safe shape for collect_list. */
  def assemblePacks(packed: DataFrame, textCol: String,
      orderCols: Seq[Column], tokensCol: String,
      packCol: String = "pack_id", sep: String = "\n\n"): DataFrame = {
    require(orderCols.nonEmpty, "at least one order column")
    packed
      .withColumn("__ord", struct(orderCols: _*))
      .groupBy(col(packCol))
      .agg(
        concat_ws(sep, transform(
          array_sort(collect_list(struct(col("__ord"), col(textCol)))),
          e => e.getField(textCol))).as("pack_text"),
        count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("n_tokens"))
  }

  /** Per-pack member SPAN table: one row per (pack, member) with the
    * member's 0-based token offset and length inside the concatenated
    * pack — the attention-reset / loss-mask boundary artifact a trainer
    * consumes alongside [[assemblePacks]]' pack_text (cross-document
    * attention inside a packed example is masked at exactly these
    * boundaries; without the table the trainer would have to re-tokenize
    * the pack to find them). `orderCols` must be the same total order
    * packing used; `sepTokens` accounts for a k-token separator joined
    * between members (offset shifts by (rank−1)·k).
    *
    * Output: (packCol, member_rank 1-based, idCol, start, len).
    * Scale: one window partitioned by pack — groups are budget-bounded
    * by construction, and the running sum rides the same shuffle the
    * assembly pass uses. Null token counts carry 0 mass (matching
    * [[packByBudget]]'s cumsum, where `sum` skips them). */
  def packSpans(packed: DataFrame, idCol: String, orderCols: Seq[Column],
      tokensCol: String, packCol: String = "pack_id",
      sepTokens: Int = 0): DataFrame = {
    require(sepTokens >= 0, "sepTokens must be >= 0")
    require(orderCols.nonEmpty, "at least one order column")
    val w = Window.partitionBy(col(packCol)).orderBy(orderCols: _*)
    val len = coalesce(guardedTokens(tokensCol).cast("long"), lit(0L))
    packed
      .withColumn("__rank", row_number().over(w).cast("long"))
      .withColumn("__before", coalesce(
        sum(guardedTokens(tokensCol)).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(packCol), col("__rank").as("member_rank"), col(idCol),
        (col("__before") + (col("__rank") - 1L) * lit(sepTokens.toLong))
          .as("start"),
        len.as("len"))
  }

  /** [[packByBudgetScalable]] generalized to an arbitrary TOTAL order —
    * the curriculum-packing shape: sort by (quality desc, id) and the
    * cumulative token budget walks the curriculum, so early packs hold
    * the highest-quality docs. `sortCols` must be a total order
    * (append the id as tiebreaker) or pack assignment is
    * nondeterministic. Same two-phase cumsum: range partition on the
    * sort key, per-partition running sum, broadcast partition offsets. */
  def packByBudgetOrdered(df: DataFrame, sortCols: Seq[Column],
      tokensCol: String, budget: Long,
      packCol: String = "pack_id"): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(sortCols.nonEmpty, "at least one sort column")
    // eager snapshot: offsets and the main join must see the SAME
    // sampled range boundaries (same reasoning as
    // addSurrogateKeyScalable — exchange reuse usually guarantees it,
    // the materialized snapshot makes it unconditional without leaving
    // a CacheManager entry behind)
    val ordered = graft.util.Caches.snapshot(
      df.repartitionByRange(sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
        .withColumn("__pid", spark_partition_id()))
    val localBefore = coalesce(
      sum(guardedTokens(tokensCol)).over(
        Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
          .rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    val withLocal = ordered.withColumn("__lsum", localBefore)
    val offsets = withLocal.groupBy("__pid")
      // guard HERE too: the window frame above ends at -1, so a
      // partition-FINAL row's count is never evaluated by it — an
      // unguarded offsets sum would let one negative count on a
      // partition boundary silently shift every later partition's packs
      // instead of failing loudly
      .agg(sum(guardedTokens(tokensCol)).as("__ptotal"))
      .withColumn("__offset",
        coalesce(
          sum(col("__ptotal")).over(
            Window.orderBy(col("__pid"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__offset"))
    withLocal.join(broadcast(offsets), "__pid")
      .withColumn(packCol, floorDiv(col("__offset") + col("__lsum"), budget))
      .drop("__pid", "__lsum", "__offset")
  }
}
