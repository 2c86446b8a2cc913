package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Per-entity rolling feature engineering over event streams — the
  * velocity-check / behavioral-feature staple (fraud: "how many
  * transactions in the last hour"; training data: per-user activity
  * features attached to each example).
  */
object Features {

  /** Rolling per-entity features on a timestamped event frame: for each
    * row, the previous value (lag 1), the mean over the trailing
    * `nRows` rows (current included, shorter at partition start), and
    * the event count + value sum over the trailing `rangeSeconds`
    * seconds (current included — the velocity window).
    *
    * Row order within an entity is (tsCol, tieCol) — the tiebreak makes
    * row-frame features deterministic under equal timestamps; the
    * time-range frame is keyed on whole epoch seconds (fractional
    * seconds truncate), so its membership is tiebreak-independent.
    *
    * Output: input columns + prev_value, avg_rows, n_range, sum_range.
    *
    * Scale: ONE shuffle on the entity, and all four features share the
    * same (partition, sort) — Catalyst evaluates them in a single
    * Window exec over one sort, no extra exchange per feature (verify:
    * one Exchange + one/two Window nodes in `.explain`). A pathological
    * mega-entity sorts within one partition — cap or pre-split such
    * keys upstream, same caveat as [[Sampling.capPerGroup]]. Rolling
    * sums/means of doubles follow frame order; cross-engine noise sits
    * below `roundTo` (q94 convention). */
  def velocityFeatures(df: DataFrame, entityCol: String, tsCol: String,
      tieCol: String, valueCol: String, nRows: Int = 3,
      rangeSeconds: Long = 3600, roundTo: Int = 6): DataFrame = {
    require(nRows >= 1, "nRows must be >= 1")
    require(rangeSeconds >= 0, "rangeSeconds must be >= 0")
    val byRow = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tieCol))
    val lastRows = byRow.rowsBetween(-(nRows - 1).toLong, 0)
    val epoch = col(tsCol).cast(LongType)
    val byTime = Window.partitionBy(col(entityCol))
      .orderBy(epoch)
      .rangeBetween(-rangeSeconds, 0)
    df
      .withColumn("prev_value", lag(col(valueCol), 1).over(byRow))
      .withColumn("avg_rows",
        round(avg(col(valueCol).cast(DoubleType)).over(lastRows), roundTo))
      .withColumn("n_range", count(lit(1)).over(byTime))
      .withColumn("sum_range",
        round(sum(col(valueCol).cast(DoubleType)).over(byTime), roundTo))
  }

  /** Time-weighted average per key — the TWAP/position-exposure
    * aggregate: each observation's value holds until the NEXT
    * observation (step function), and the average weights each value
    * by its holding duration in whole seconds:
    *   twa = Σ vᵢ·(tᵢ₊₁ − tᵢ) / (t_last − t_first).
    * A plain AVG over irregular samples over-counts bursts (ten quotes
    * in one minute ≠ ten minutes at that price); the step integral
    * doesn't. The last observation of a key carries no duration and
    * contributes only its timestamp (standard TWAP bracketing); keys
    * with one observation yield null (no measurable interval).
    *
    * One shuffle on the key: a lead window for the hold duration, then
    * one keyed aggregate. Durations are exact integer MICROseconds
    * (`unix_micros` — full timestamp resolution; `tieCol` makes the
    * step order deterministic under equal timestamps); the
    * value·duration products and the final division run in double
    * (`roundTo` absorbs partial-agg order noise).
    * Output: keys*, n_obs, t_first, t_last, time_weighted_avg. */
  def timeWeightedAverage(df: DataFrame, keyCols: Seq[String],
      tsCol: String, tieCol: String, valueCol: String,
      roundTo: Int = 6): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val stepped = df
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .withColumn("__dur",
        (lead(unix_micros(col(tsCol)), 1).over(w) -
          unix_micros(col(tsCol))).cast(DoubleType))
    stepped.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_obs"),
        min(col(tsCol)).as("t_first"),
        max(col(tsCol)).as("t_last"),
        round(when(sum(col("__dur")) > 0.0,
          sum(col(valueCol).cast(DoubleType) * col("__dur")) /
            sum(col("__dur"))), roundTo).as("time_weighted_avg"))
  }
}
