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

  /** Linear interpolation of null observations between their known
    * neighbors (per key, time-ordered): sensor dropouts and sparse
    * metric samples get v(t) = v₀ + (v₁−v₀)·(t−t₀)/(t₁−t₀) from the
    * bracketing non-null readings — [[daily]]'s forward-fill holds a
    * step; this draws the line. Nulls before the first or after the
    * last known value stay null (no extrapolation — that's a model,
    * not a fill). Equal-timestamp neighbors (t₁ = t₀) take v₀.
    *
    * ONE shuffle on the key: the backward- and forward-looking
    * `last/first(ignoreNulls)` windows share the same (partition,
    * sort); time runs in exact microseconds; the interpolation runs in
    * double, rounded. `tieCol` pins the order under equal timestamps.
    * Output: input columns + `value_filled` + `is_interpolated`. */
  def interpolateLinear(df: DataFrame, keyCols: Seq[String],
      tsCol: String, tieCol: String, valueCol: String,
      roundTo: Int = 6): DataFrame = {
    val base = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val back = base.rowsBetween(Window.unboundedPreceding, 0)
    val fwd = base.rowsBetween(0, Window.unboundedFollowing)
    val t = unix_micros(col(tsCol)).cast("double")
    val known = when(col(valueCol).isNotNull, t)
    val v0 = last(col(valueCol), ignoreNulls = true).over(back)
    val t0 = last(known, ignoreNulls = true).over(back)
    val v1 = first(col(valueCol), ignoreNulls = true).over(fwd)
    val t1 = first(known, ignoreNulls = true).over(fwd)
    val interp = when(t1 === t0, v0)
      .otherwise(v0 + (v1 - v0) * (t - t0) / (t1 - t0))
    df.withColumn("value_filled",
        when(col(valueCol).isNotNull, col(valueCol).cast("double"))
          .otherwise(round(
            when(v0.isNotNull && v1.isNotNull, interp), roundTo)))
      .withColumn("is_interpolated",
        col(valueCol).isNull && col("value_filled").isNotNull)
  }

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
    // backtick-quote every USER-SUPPLIED name that goes through col()
    // (doubling embedded backticks, Spark's escape): a column name
    // containing a dot would otherwise parse as a nested-field path and
    // fail to resolve. (Handle-based resolution — spine(name)/obs(name) —
    // would dodge the parse but trips DetectAmbiguousSelfJoin on this
    // spine-derives-from-obs self-join; quoting keeps both properties.)
    def q(n: String) = "`" + n.replace("`", "``") + "`"
    val spans = df.groupBy(col(q(keyCol)))
      .agg(min(col(q(dateCol))).as("__d0"), max(col(q(dateCol))).as("__d1"))
    val spine = spans.select(col(q(keyCol)),
      explode(sequence(col("__d0"), col("__d1"),
        expr("interval 1 day"))).as(dateCol))
    // NULL-SAFE key equality: the spine's null-key row EXISTS because the
    // input has a null-key group (groupBy kept it) — a plain equi-join
    // would then never match those observations back, silently turning
    // every real null-key row into a zero-filled synthetic one. <=> keeps
    // the null group behaving like any other key, consistent with the
    // window fills below (partitionBy also groups nulls).
    val obs = df.withColumn("__obs", lit(1))
    val projected: Seq[org.apache.spark.sql.Column] =
      Seq(col(s"__sp.${q(keyCol)}").as(keyCol),
        col(s"__sp.${q(dateCol)}").as(dateCol)) ++
        obs.columns.filterNot(c => c == keyCol || c == dateCol)
          .map(c => col(s"__ob.${q(c)}").as(c))
    val joined = spine.alias("__sp").join(obs.alias("__ob"),
        col(s"__sp.${q(keyCol)}") <=> col(s"__ob.${q(keyCol)}") &&
          col(s"__sp.${q(dateCol)}") <=> col(s"__ob.${q(dateCol)}"), "left")
      .select(projected: _*)
    val zeroed = fillZero.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c, coalesce(col(q(c)), lit(0L)))
    }
    val w = Window.partitionBy(col(q(keyCol))).orderBy(col(q(dateCol)))
      .rowsBetween(Window.unboundedPreceding, 0)
    val forwarded = fillForward.foldLeft(zeroed) { (acc, c) =>
      acc.withColumn(c, last(col(q(c)), ignoreNulls = true).over(w))
    }
    forwarded
      .withColumn("is_filled", col("__obs").isNull)
      .drop("__obs")
  }
}
