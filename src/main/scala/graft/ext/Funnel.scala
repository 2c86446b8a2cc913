package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Product-analytics operators over event streams: ordered funnel
  * conversion and cohort retention. Both are chained keyed aggregations —
  * no window over an unpartitioned frame, no driver-side loops over data.
  */
object Funnel {

  /** Ordered funnel: how many users reach each stage, where stage `i`
    * counts only events strictly AFTER the user's stage `i-1` entry time
    * (first-touch per stage). Output: one row per stage —
    * (stage_idx, stage, n_users, pct_of_first) ordered by stage_idx.
    *
    * Scale design: stage `i` scans only the `stages(i)` event-type slice
    * (filter pushes to the scan) and joins it against the shrinking
    * survivor frame from stage `i-1`; every join and aggregate is keyed
    * on the user column, so AQE can reuse the partitioning and the big
    * event table is never globally sorted. The per-stage counts are
    * single-row aggregates unioned at the end (driver-safe: `stages` is
    * a handful). */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    // a NULL user is not a user: unfiltered it would count into stage 0
    // (groupBy keeps the null group) but could never convert (the stage
    // joins drop null keys), silently deflating pct_of_first — the
    // entryPaths/transitionMatrix null-key rule applies here too
    val evs = events.filter(col(userCol).isNotNull)
    // survivors(i): (user, __t) = first time the user completed stage i
    var survivors = evs
      .filter(col(typeCol) === stages.head && col(tsCol).isNotNull)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("__t"))
    val counts = Seq.newBuilder[DataFrame]
    counts += survivors.agg(count(lit(1)).as("n_users"))
      .select(lit(0L).as("stage_idx"), lit(stages.head).as("stage"),
        col("n_users"))
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      val prev = survivors.withColumnRenamed("__t", "__tprev")
      survivors = evs
        .filter(col(typeCol) === st && col(tsCol).isNotNull)
        .join(prev, Seq(userCol))
        .filter(col(tsCol) > col("__tprev"))
        .groupBy(col(userCol))
        .agg(min(col(tsCol)).as("__t"))
      counts += survivors.agg(count(lit(1)).as("n_users"))
        .select(lit(i.toLong).as("stage_idx"), lit(st).as("stage"),
          col("n_users"))
    }
    val all = counts.result().reduce(_.unionByName(_))
    val first = all.filter(col("stage_idx") === 0L)
      .select(col("n_users").as("__n0"))
    all.crossJoin(broadcast(first))
      .select(col("stage_idx"), col("stage"), col("n_users"),
        round(when(col("__n0") > 0,
            col("n_users").cast("double") / col("__n0").cast("double"))
          .otherwise(lit(0.0)), 6).as("pct_of_first"))
      .orderBy(col("stage_idx"))
  }

  /** Cohort retention: users grouped by first-active day (their cohort);
    * for each (cohort_day, day_offset ≤ maxOffset), the count of cohort
    * members active that day and the retention rate vs cohort size.
    * Output: (cohort_day, day_offset, n_active, n_cohort, retention).
    * offset 0 is the cohort day itself (retention 1.0 by construction).
    *
    * Scale design: per-user first day is one keyed aggregate; per-user
    * active days collapse through a (user, day) distinct BEFORE the join,
    * so the join input is bounded by users × active-days, not raw events;
    * cohort sizes re-attach via broadcast (one row per cohort day). Null
    * timestamps are excluded (they belong to completeness checks, not the
    * activity baseline), and so are NULL users: unfiltered, a null user
    * would inflate its cohort_day's n_cohort (groupBy keeps the null
    * group) while never counting active (the activity join drops null
    * keys) — a silently deflated retention denominator. */
  def retention(events: DataFrame, userCol: String, tsCol: String,
      maxOffset: Int): DataFrame = {
    require(maxOffset >= 0, "maxOffset >= 0")
    val nonNull = events.filter(col(tsCol).isNotNull &&
      col(userCol).isNotNull)
    val firstDay = nonNull.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort_day"))
    val activeDays = nonNull
      .select(col(userCol), to_date(col(tsCol)).as("__day"))
      .distinct()
    val cohortSizes = firstDay.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("n_cohort"))
    activeDays.join(firstDay, Seq(userCol))
      .withColumn("day_offset",
        datediff(col("__day"), col("cohort_day")).cast(LongType))
      .filter(col("day_offset") <= maxOffset)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(cohortSizes), Seq("cohort_day"))
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        col("n_cohort"),
        round(col("n_active").cast("double") /
          col("n_cohort").cast("double"), 6).as("retention"))
  }
}
