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
    // sort with an explicit comparator over the ORDER columns only:
    // natural struct ordering would demand the payload field be
    // orderable too, failing analysis for map-typed payloads that never
    // needed to participate in the comparison (orderCols form the
    // promised total order). Nulls sort FIRST per field, matching the
    // struct ordering this replaced.
    def cmp(l: Column, r: Column): Column =
      orderCols.foldRight(lit(0): Column) { (c, acc) =>
        val (lf, rf) = (l.getField(c), r.getField(c))
        when(lf.isNull && rf.isNull, acc)
          .when(lf.isNull, -1)
          .when(rf.isNull, 1)
          .when(lf < rf, -1)
          .when(lf > rf, 1)
          .otherwise(acc)
      }
    capped
      .groupBy(col(entityCol))
      .agg(max(col("__tot")).as("n_events"),
        transform(
          array_sort(collect_list(struct(
            orderCols.map(col) :+ payload.as("__p"): _*)),
            (l, r) => cmp(l, r)),
          e => e.getField("__p")).as("seq"))
  }

  /** Chat-transcript assembly for SFT/dialog training data: serialize
    * each conversation's turns into one "role: text" transcript,
    * flagging broken role alternation and truncating to a token budget
    * by WHOLE turns from the end (most-recent context survives — the
    * chat-window convention).
    *
    * Input: one row per turn. `orderCols` must totally order turns
    * within a conversation (pass the event id as tiebreaker). Output,
    * one row per conversation:
    * (convCol, n_turns, n_turns_kept, n_tokens_kept, is_alternating,
    * transcript) where is_alternating = no two ADJACENT turns (in the
    * full pre-truncation conversation) share a role, n_tokens counts
    * whitespace tokens of the text payload, and `transcript` joins the
    * kept turns as "role: text" lines in turn order. A conversation
    * whose latest turn alone exceeds the budget keeps zero turns
    * (empty transcript) rather than a truncated turn — a cut-off turn
    * is worse training data than a dropped conversation.
    *
    * Scale: one hash exchange on the conversation key shared by the
    * window pass (turn index, lag-role, reverse token cumsum) and the
    * final groupBy — the [[userSequences]] single-shuffle shape. The
    * collected transcript is bounded by `tokenBudget`, not by the raw
    * conversation length, so a bot's mega-thread cannot blow an
    * aggregation buffer. */
  def assembleTranscripts(turns: DataFrame, convCol: String,
      orderCols: Seq[String], roleCol: String, textCol: String,
      tokenBudget: Long): DataFrame = {
    require(orderCols.nonEmpty, "at least one order column")
    require(tokenBudget > 0, "tokenBudget must be positive")
    val wAsc = Window.partitionBy(col(convCol))
      .orderBy(orderCols.map(col): _*)
    val wDesc = Window.partitionBy(col(convCol))
      .orderBy(orderCols.map(col(_).desc): _*)
    val toks = when(col(textCol).isNull, lit(0L))
      .otherwise(size(regexp_extract_all(col(textCol), lit("\\S+"),
        lit(0))).cast("long"))
    val marked = turns
      .withColumn("__i", row_number().over(wAsc))
      .withColumn("__brk",
        when(lag(col(roleCol), 1).over(wAsc) === col(roleCol), 1L)
          .otherwise(0L))
      // suffix token count: this turn + everything after it
      .withColumn("__suffix", sum(toks).over(
        wDesc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy(col(convCol))
      .agg(count(lit(1)).as("n_turns"),
        sum(when(col("__suffix") <= tokenBudget, 1L).otherwise(0L))
          .as("n_turns_kept"),
        coalesce(max(when(col("__suffix") <= tokenBudget, col("__suffix"))),
          lit(0L)).as("n_tokens_kept"),
        (sum(col("__brk")) === 0).as("is_alternating"),
        array_join(transform(
          array_sort(collect_list(when(col("__suffix") <= tokenBudget,
            struct(col("__i"),
              concat_ws(": ", col(roleCol), coalesce(col(textCol), lit("")))
                .as("__line"))))),
          e => e.getField("__line")), "\n").as("transcript"))
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

  /** Entry-path analysis: each entity's FIRST `depth` states joined
    * into a journey string ("view>click>purchase"), counted across
    * entities with the share of all entities — the onboarding/funnel
    * exploration view ([[transitionMatrix]] is memoryless; this keeps
    * the actual prefix). Entities with fewer than `depth` events keep
    * their shorter path — dropping them would hide every short journey.
    *
    * Scale: the depth cap applies BEFORE collection (the
    * [[userSequences]] discipline — row_number + filter bounds
    * per-entity state at `depth` rows); path counting is a second
    * shuffle on the (≤ |states|^depth) path strings; the entity total
    * is a broadcast single-row aggregate.
    * Output: (path, n_entities, share), share = n/total entities. */
  def entryPaths(events: DataFrame, entityCol: String,
      orderCols: Seq[String], stateCol: String, depth: Int = 3,
      roundTo: Int = 6): DataFrame = {
    require(depth > 0, "depth must be > 0")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(orderCols.map(col): _*)
    // null entities drop from BOTH sides: countDistinct skips nulls, so
    // an un-filtered path build emitted a null-entity path counted in a
    // numerator whose denominator never saw it — shares no longer summed
    // to 1 (same null-key discipline as pairRules/Graph)
    val paths = events
      .filter(col(entityCol).isNotNull)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= depth)
      .groupBy(col(entityCol))
      .agg(concat_ws(">", transform(
        array_sort(collect_list(struct(
          orderCols.map(col) :+ col(stateCol).as("__s"): _*))),
        e => e.getField("__s"))).as("path"))
    // total entities straight from the input (every entity with a row
    // has a path), so the path frame isn't computed twice
    val total = events.filter(col(entityCol).isNotNull)
      .agg(countDistinct(col(entityCol)).as("__t"))
    paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_entities"))
      .crossJoin(broadcast(total))
      .select(col("path"), col("n_entities"),
        round(col("n_entities").cast("double") / col("__t").cast("double"),
          roundTo).as("share"))
  }

  /** First-order transition matrix over per-entity event sequences:
    * for every consecutive (state → next) pair, the transition count,
    * conditional probability p(next|state), and lift against the
    * unconditional next-state share — lift ≫ 1 marks "state A pulls B"
    * structure (funnel edges, scripted bot paths); lift ≈ 1 means the
    * sequence carries no signal over the base rate.
    *
    * Transitions come from a lead window over (orderCols) within each
    * entity — ONE shuffle on the entity; the matrix, margins and the
    * base distribution then aggregate the transition-count frame
    * (cells ≤ |states|², broadcast-joined back). All probabilities are
    * explicit count-ratio double divisions (oracle-parity rule).
    * Output: (state, next, n, p_next_given_state, lift). */
  def transitionMatrix(events: DataFrame, entityCol: String,
      orderCols: Seq[String], stateCol: String,
      roundTo: Int = 6): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
      .orderBy(orderCols.map(col): _*)
    // a null ORIGIN state would survive into `trans` and count in the
    // __na lift denominator yet silently vanish at the fromTot equi-join
    // (null keys never match) — emitted lifts were then computed against
    // a universe including the dropped mass. Null states carry no
    // transition semantics; drop them from both ends.
    val trans = events
      .filter(col(stateCol).isNotNull)
      .withColumn("__next", lead(col(stateCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(stateCol).as("state"), col("__next").as("next"))
      .agg(count(lit(1)).as("n"))
      .persist()
    trans.count()
    val fromTot = trans.groupBy(col("state"))
      .agg(sum(col("n")).as("__nf"))
    val toTot = trans.groupBy(col("next"))
      .agg(sum(col("n")).as("__nt"))
    val all = trans.agg(sum(col("n")).as("__na"))
    val out = trans
      .join(broadcast(fromTot), Seq("state"))
      .join(broadcast(toTot), Seq("next"))
      .crossJoin(broadcast(all))
      .select(col("state"), col("next"), col("n"),
        round(col("n").cast("double") / col("__nf").cast("double"),
          roundTo).as("p_next_given_state"),
        round((col("n").cast("double") / col("__nf").cast("double")) /
          (col("__nt").cast("double") / col("__na").cast("double")),
          roundTo).as("lift"))
    val snap = graft.util.Caches.snapshot(out)
    trans.unpersist(blocking = false)
    snap
  }
}
