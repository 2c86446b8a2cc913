package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join (SURVEY §2.5 J3 — the reference's declared
  * exchange-rate lookup: for each fact row, the latest rate row with
  * rate ts ≤ fact ts, per key).
  *
  * Spark-first design: instead of a range join (O(n·m) without a custom
  * operator) or a per-row subquery, both sides are unioned and a single
  * `last(..., ignoreNulls)` running window per key fills each left row with
  * the most recent right-side values. ONE hash shuffle on the keys, merge
  * semantics identical to a sort-merge as-of join; scales linearly and
  * keeps whole-stage codegen (window exec aside).
  *
  * Tie rule: a right row at exactly left ts matches (≤). Right side should
  * be unique per (keys, ts) — pre-aggregate otherwise (else which duplicate
  * wins is plan-dependent). Right rows with a NULL timestamp are dropped
  * (they evidence no point in time; unfiltered they'd sort NULLS FIRST and
  * be handed to every left row with no real predecessor).
  *
  * Skew bound: all rows of one key land in ONE window partition — the
  * linear-scaling claim assumes no single key dominates (AQE's skew
  * handling covers joins, not window exec). For a dominant key (80% of
  * facts in USD), pre-split it: salt the LEFT side into s sub-keys and
  * replicate the (tiny) right side into each — the
  * [[graft.ops.SkewJoin]] pattern — then as-of join on (key, salt).
  */
object AsOfJoin {

  /** For each row of `left`, attach `valueCols` of the latest `right` row
    * with `right.rightTs <= left.leftTs`, equi-matched on `keys`. Output =
    * all left columns + `<prefix>ts` + prefixed value columns (null when no
    * right row precedes). */
  def asOfBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq

    // Align schemas: keys, event time, side marker (right sorts before left
    // at equal ts so "<=" holds), left payload (null on right rows), right
    // payload (null on left rows).
    // a NULL right timestamp sorts NULLS FIRST ascending: unfiltered,
    // that row's (non-null) struct would be picked as the "latest
    // preceding" match for every left row with no real predecessor —
    // fabricated lookups carrying asof ts = NULL. A null-ts right row
    // cannot be evidence of any point in time; drop it.
    // NULL-key right rows drop too: the contract is an equi-JOIN on the
    // keys, and SQL join semantics never match NULL = NULL — but the
    // window's partitionBy GROUPS nulls together, so an unfiltered
    // null-key right row would be handed to every null-key left row
    // (semantics a join-based as-of, e.g. DuckDB's ASOF, disagrees
    // with). Null-key LEFT rows still pass through — partitioned alone,
    // they fill with nulls, exactly a left join's answer.
    val rightU = right
      .filter(col(rightTs).isNotNull &&
        keys.map(col(_).isNotNull).reduce(_ && _))
      .select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++
        valueCols.map(c => col(c).as(s"__r_$c")): _*)
    val leftU = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)

    // Fill with the latest right ROW as one struct: row-atomic, so a NULL
    // value inside the winning right row stays NULL (filling each value
    // column independently would skip back to an older row for that
    // column and disagree with the reported asof ts).
    val rightRow = when(col("__side") === 0,
      struct(col("__ts").as("__rts") +: valueCols.map(c => col(s"__r_$c")): _*))
    val filled = rightU.unionByName(leftU)
      .withColumn("__last_right", last(rightRow, ignoreNulls = true).over(w))
      .withColumn(s"$prefix$rightTs", col("__last_right.__rts"))
    val withVals = valueCols.foldLeft(filled) { (df, c) =>
      df.withColumn(s"$prefix$c", col(s"__last_right.__r_$c"))
    }

    val restored =
      keys.map(col) ++
        Seq(col("__ts").as(leftTs)) ++
        leftCols.filterNot(k => keys.contains(k) || k == leftTs)
          .map(c => col(s"__l_$c").as(c)) ++
        Seq(col(s"$prefix$rightTs")) ++ valueCols.map(c => col(s"$prefix$c"))
    withVals.filter(col("__side") === 1).select(restored: _*)
  }
}
