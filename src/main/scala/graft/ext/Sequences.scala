package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence assembly — turning an event log into per-entity
  * ordered histories (the training-example shape for behavior/session
  * models, and the feature shape for "last-N actions" serving).
  */
object Sequences {

  /** Per-entity ordered payload sequence, capped to the LAST `maxLen`
    * events. Output: (entityCol, n_events, seq) where `seq` is the
    * payloads in ascending `orderCols` order and `n_events` is the
    * entity's TRUE (pre-cap) event count — the capped length is simply
    * `size(seq)`; reporting the capped count as "n_events" would make
    * every heavy entity look like it had exactly `maxLen` events.
    *
    * Scale: the length cap applies BEFORE collection (row_number over
    * the entity window + filter), so a pathological mega-entity bounds
    * at `maxLen` rows of state — an uncapped collect_list would buffer
    * a bot's entire history in one aggregation buffer. The window and
    * the groupBy share ONE hash exchange on the entity key (same
    * partitioning, no second shuffle — plan-asserted). Determinism:
    * `orderCols` must form a total order per entity (pass the event id
    * as tiebreaker); the collected structs re-sort inside the row, so
    * partial-aggregation order never shows. */
  def userSequences(events: DataFrame, entityCol: String,
      orderCols: Seq[String], payload: Column,
      maxLen: Int = 100): DataFrame = {
    require(orderCols.nonEmpty, "at least one order column")
    require(maxLen > 0, "maxLen must be positive")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(orderCols.map(col(_).desc): _*)
    // the true count rides the SAME window spec (full frame), so both
    // window functions evaluate in one Window operator on one exchange
    val wAll = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val capped = events
      .withColumn("__rk", row_number().over(w))
      .withColumn("__tot", count(lit(1)).over(wAll))
      .filter(col("__rk") <= maxLen)
    capped
      .groupBy(col(entityCol))
      .agg(max(col("__tot")).as("n_events"),
        transform(
          array_sort(collect_list(struct(
            orderCols.map(col) :+ payload.as("__p"): _*))),
          e => e.getField("__p")).as("seq"))
  }

  /** Sliding next-event training pairs from capped sequences: for each
    * entity, (context = events [0, i), target = event i) for every
    * i ≥ `minContext` — the autoregressive example generator. Narrow
    * explode over [[userSequences]] output; examples per entity ≤
    * maxLen. Output: (entityCol, context, target). */
  def nextEventExamples(events: DataFrame, entityCol: String,
      orderCols: Seq[String], payload: Column, maxLen: Int = 100,
      minContext: Int = 1): DataFrame = {
    val seqs = userSequences(events, entityCol, orderCols, payload, maxLen)
    seqs
      .select(col(entityCol),
        posexplode(col("seq")).as(Seq("__i", "target")),
        col("seq"))
      .filter(col("__i") >= minContext)
      .select(col(entityCol),
        slice(col("seq"), lit(1), col("__i")).as("context"),
        col("target"))
  }
}
