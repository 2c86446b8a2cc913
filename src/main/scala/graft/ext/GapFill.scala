package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: metric tables built by `groupBy(day)`
  * simply have NO row for a silent day, which breaks window math
  * downstream (a 7-day moving average over 5 present rows is not a
  * 7-day average) and hides outages from anomaly screens. Gap filling
  * materializes the missing periods explicitly.
  */
object GapFill {

  /** Fill missing days per key over each key's [min, max] date span:
    * generate the full daily spine per key (sequence-explode — narrow
    * after one tiny per-key min/max aggregate), left-join the observed
    * rows back on (key, date), and default the `fillZero` columns to 0
    * while `fillForward` columns carry the last observed value
    * (`last(ignoreNulls)` running window). Two shuffles on the key —
    * the spine join and the forward-fill window share partitioning.
    * Output: one row per key per day, `is_filled` flagging synthesized
    * rows. */
  def daily(df: DataFrame, keyCol: String, dateCol: String,
      fillZero: Seq[String] = Nil,
      fillForward: Seq[String] = Nil): DataFrame = {
    val spans = df.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("__d0"), max(col(dateCol)).as("__d1"))
    val spine = spans.select(col(keyCol),
      explode(sequence(col("__d0"), col("__d1"),
        expr("interval 1 day"))).as(dateCol))
    val joined = spine.join(
      df.withColumn("__obs", lit(1)), Seq(keyCol, dateCol), "left")
    val zeroed = fillZero.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c, coalesce(col(c), lit(0L)))
    }
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val forwarded = fillForward.foldLeft(zeroed) { (acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    forwarded
      .withColumn("is_filled", col("__obs").isNull)
      .drop("__obs")
  }
}
