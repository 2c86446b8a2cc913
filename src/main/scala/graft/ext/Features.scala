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
}
