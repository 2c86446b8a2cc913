package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.ext.AsOfJoin
import graft.monitoring.Monitoring
import Q._

/** Time-oriented operators (SURVEY §2.5 J3, §2.10 batch-equivalents):
  * as-of join, tumbling-window aggregation, sessionization (gap-and-island),
  * volume-anomaly, freshness. Their streaming twins live in
  * `graft.streaming` and are exercised by ScalaTest (streams can't be
  * oracle-hashed by a batch SQL engine).
  */
object Temporal {
  // Per-process scratch suffix (VERDICT r16 #4). Temp views are
  // session-scoped (they die with the process and are invisible to other
  // processes), so unlike OpsQueries' managed-table case nothing leaks
  // or collides across processes — the suffix only guards the view names
  // against a second harness sharing this SparkSession in-process. No
  // reaping needed; drop-on-entry covers same-session re-runs.
  private val scratchSuffix: String = ProcessHandle.current().pid().toString

  type QFn = (SparkSession, String) => DataFrame

  val queries: Map[String, QFn] = Map(
    // J3 as-of join: each purchase gets the latest click at or before its
    // ts, per user. One shuffle on user_id (union + running-last window) —
    // the merge-join as-of shape, no range cross join.
    "q19_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("click_value"))
      AsOfJoin.asOfBackward(purchases, clicks, Seq("user_id"),
          "ts", "ts", Seq("click_value"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_ts"), col("asof_click_value"))
        .orderBy(col("event_id"))
    }),

    // Tumbling hourly window (batch twin of the streaming agg).
    "q20_hourly_agg" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // Native session_window in batch mode (the same merging-window
    // operator the streaming sessionizer uses): per-user sessions that
    // close after 30 minutes of inactivity. Merge rule is STRICT
    // containment — an event exactly `gap` after the previous one starts
    // a NEW session (window [t, t+gap) does not contain t+gap), so the
    // oracle's island break is diff >= gap, unlike q21's stateful
    // convention (> gap). session_end = last event + gap (window close).
    "q158_session_window" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(col("ts").isNotNull)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), col("total_value"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // Ordered funnel signup → view → click → purchase: stage i counts
    // users whose first stage-i event is strictly after their stage-(i-1)
    // entry. Chained user-keyed joins over shrinking survivor frames.
    "q108_funnel" -> ((s, dir) => {
      graft.ext.Funnel.funnel(t(s, dir, "events"), "user_id", "ts",
        "event_type", Seq("signup", "view", "click", "purchase"))
    }),

    // Cohort retention: users bucketed by first-active day, per-offset
    // active counts and rates up to day 14.
    "q109_retention" -> ((s, dir) => {
      graft.ext.Funnel.retention(t(s, dir, "events"), "user_id", "ts",
          maxOffset = 14)
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // Daily metric gap-fill: event types with silent days get explicit
    // zero rows over their [min, max] span, so downstream window math
    // (7-day averages, anomaly screens) sees a regular series. The
    // filled series is DuckDB-hash-checked.
    "q93_gap_fill" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      graft.ext.GapFill.daily(daily, "event_type", "day",
          fillZero = Seq("n"))
        .select(col("event_type"), col("day"), col("n"), col("is_filled"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Per-user last-20 event sequences (behavior-sequence training prep):
    // cap before collect, one shared user shuffle; the pipe-joined
    // sequence string is DuckDB-hash-checked.
    "q91_event_sequences" -> ((s, dir) => {
      graft.ext.Sequences.userSequences(t(s, dir, "events"), "user_id",
          Seq("ts", "event_id"), col("event_type"), maxLen = 20)
        .select(col("user_id"), col("n_events"),
          concat_ws("|", col("seq")).as("seq"))
        .orderBy(col("user_id"))
    }),

    // SFT transcript assembly: the event log as synthetic dialogs —
    // click/view turns speak as 'user', everything else as 'assistant';
    // role-alternation flag + whole-turn truncation to a 30-token budget
    // keeping the most recent turns. Every transcript string is
    // DuckDB-hash-checked.
    "q115_sft_transcripts" -> ((s, dir) => {
      val turns = t(s, dir, "events")
        .withColumn("role",
          when(col("event_type").isin("click", "view"), "user")
            .otherwise("assistant"))
        .withColumn("txt", concat_ws(" ", col("event_type"), col("props")))
      graft.ext.Sequences.assembleTranscripts(turns, "user_id",
          Seq("ts", "event_id"), "role", "txt", tokenBudget = 30L)
        .orderBy(col("user_id"))
    }),

    // Bradley–Terry preference strengths over event types: each user's
    // consecutive event pairs vote (higher value wins, ties dropped),
    // 10 MM rounds — the RLHF leaderboard shape. Hash-checked against a
    // DuckDB oracle unrolling the same 10 iterations (q94 convention).
    "q118_bradley_terry" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val comps = t(s, dir, "events")
        .withColumn("nt", lead(col("event_type"), 1).over(w))
        .withColumn("nv", lead(col("value"), 1).over(w))
        .filter(col("nt").isNotNull && col("event_type") =!= col("nt") &&
          col("value") =!= col("nv"))
        .select(
          when(col("value") > col("nv"), col("event_type"))
            .otherwise(col("nt")).as("winner"),
          when(col("value") > col("nv"), col("nt"))
            .otherwise(col("event_type")).as("loser"))
      graft.ext.Preference.bradleyTerry(comps, "winner", "loser",
          iters = 10)
        .orderBy(col("item"))
    }),

    // Robust per-row feature scaling: (v - median)/(1.4826*MAD) per
    // event type — outlier-resistant normalization, every scaled value
    // hash-checked.
    "q143_robust_scale" -> ((s, dir) => {
      graft.ext.Stats.robustScale(
          t(s, dir, "events").select(col("event_id"), col("event_type"),
            col("value")),
          Seq("event_type"), "value")
        .orderBy(col("event_id"))
    }),

    // Market-basket rules over (user, event_type) baskets: support,
    // both confidences, lift. Hash-checked pair by pair.
    "q145_association_rules" -> ((s, dir) => {
      graft.ext.Associations.pairRules(t(s, dir, "events"), "user_id",
          "event_type", minSupport = 0.01)
        .orderBy(col("item_a"), col("item_b"))
    }),

    // Entry-path journeys: each user's first three event types as a
    // path string, counted with entity shares. Hash-checked.
    "q144_entry_paths" -> ((s, dir) => {
      graft.ext.Sequences.entryPaths(t(s, dir, "events"), "user_id",
          Seq("ts", "event_id"), "event_type", depth = 3)
        .orderBy(col("path"))
    }),

    // Robust per-type outlier profile on event values: exact median +
    // MAD (both quantile_cont-parity percentiles) and the robust-z
    // outlier count — anomaly detection that mean/stddev rules get
    // dragged away from by the very outliers they hunt. Hash-checked.
    "q121_mad_outliers" -> ((s, dir) => {
      graft.ext.Stats.madOutliers(t(s, dir, "events"),
          Seq("event_type"), "value")
        .orderBy(col("event_type"))
    }),

    // Linear interpolation of planted dropouts (every 7th event's value
    // nulled): bracketing-neighbor line fill per user, no
    // extrapolation. Every filled value hash-checked.
    "q142_interpolate" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value"))
            .as("value"))
      graft.ext.GapFill.interpolateLinear(e, Seq("user_id"), "ts",
          "event_id", "value")
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    }),

    // TWAP per user: step-function time-weighted value average — the
    // exposure/price aggregate a plain AVG over irregular samples gets
    // wrong. Hash-checked per user.
    "q140_time_weighted_avg" -> ((s, dir) => {
      graft.ext.Features.timeWeightedAverage(t(s, dir, "events"),
          Seq("user_id"), "ts", "event_id", "value")
        .orderBy(col("user_id"))
    }),

    // Recency-weighted user activity (7-day half-life as of 2024-01-31):
    // the reproducible behavioral-feature aggregate — asOf is explicit,
    // never wall clock. Hash-checked per user.
    "q139_decayed_activity" -> ((s, dir) => {
      graft.ext.Stats.decayedSum(t(s, dir, "events"), Seq("user_id"),
          "ts", "value", halfLifeDays = 7.0,
          asOfEpochSec = 1706659200L)
        .orderBy(col("user_id"))
    }),

    // First-order event transition matrix per user: counts, p(next|state)
    // and lift vs the base next-state rate — funnel-edge / bot-path
    // structure detection. Hash-checked cell by cell.
    "q136_transition_matrix" -> ((s, dir) => {
      graft.ext.Sequences.transitionMatrix(t(s, dir, "events"),
          "user_id", Seq("ts", "event_id"), "event_type")
        .orderBy(col("state"), col("next"))
    }),

    // Numeric-feature drift: PSI of purchase values against click
    // values on the reference's exact decile bins — every bin share,
    // contribution and the total PSI hash-checked.
    "q133_psi" -> ((s, dir) => {
      val e = t(s, dir, "events")
      graft.ext.Stats.populationStability(
          e.filter(col("event_type") === "click"),
          e.filter(col("event_type") === "purchase"), "value")
        .orderBy(col("bin"))
    }),

    // Welch's t-test between click and purchase values: decimal-exact
    // moment sums, unpooled SE, Welch–Satterthwaite df. Hash-checked.
    "q134_welch_ttest" -> ((s, dir) => {
      graft.ext.Stats.welchTTest(t(s, dir, "events"), "event_type",
        "value", "click", "purchase")
    }),

    // Incremental aggregate maintenance: three disjoint per-partition
    // states built independently, k-way merged, finalized — the oracle
    // recomputes from the FULL table, so the hash check proves
    // incremental ≡ full recompute bit-exactly (associative decimal
    // state algebra).
    "q131_incremental_agg" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val states = Seq(0, 1, 2).map(i =>
        graft.ops.IncrementalAgg.aggState(
          e.filter(col("event_id") % 3 === i), Seq("event_type"), "value"))
      graft.ops.IncrementalAgg.finalizeState(
          graft.ops.IncrementalAgg.mergeStates(states, Seq("event_type")),
          Seq("event_type"))
        .orderBy(col("event_type"))
    }),

    // Mergeable KLL quantile states (q131's percentile analogue): two
    // disjoint partial sketches per group, k-way merged, quantiles read
    // from the MERGED state. Sketch values are engine- and merge-order-
    // specific, so the hashed payload is the sketch's rank-error
    // contract instead (like q50b): each returned quantile's true rank,
    // recomputed against the data, must sit within 5%·n + 1 of the
    // target rank (k=200 guarantees ~1.65% — 3x headroom, so the flag
    // is deterministic in practice). A merge that loses data or a
    // reader off by a compactor level flips a flag red.
    "q173_kll_rollup" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val probs = Seq(0.25, 0.5, 0.75)
      val parts = Seq(0, 1).map(i =>
        graft.ops.IncrementalAgg.quantileState(
          li.filter(col("l_linenumber") % 2 === i),
          Seq("l_returnflag"), "l_extendedprice"))
      val merged = graft.ops.IncrementalAgg.mergeQuantileStates(
        parts, Seq("l_returnflag"))
      val est = graft.ops.IncrementalAgg.finalizeQuantiles(
          merged, Seq("l_returnflag"), probs)
        .select(col("l_returnflag").as("rf"),
          posexplode(array(col("q_25"), col("q_50"), col("q_75")))
            .as(Seq("pos", "value")))
        .select(col("rf"),
          element_at(typedlit(probs), col("pos") + 1).as("quantile"),
          col("value"))
      li.select(col("l_returnflag"),
          col("l_extendedprice").cast("double").as("x"))
        .join(broadcast(est), col("l_returnflag") === col("rf"))
        .groupBy(col("l_returnflag"), col("quantile"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("x") <= col("value"), 1L).otherwise(0L))
            .as("rank_le"))
        .select(col("l_returnflag"), col("quantile"),
          (abs(col("rank_le").cast("double") -
            col("quantile") * col("n")) <=
            col("n").cast("double") * 0.05 + 1.0).as("within_bound"))
        .orderBy(col("l_returnflag"), col("quantile"))
    }),

    // Per-user rolling velocity features: lag, trailing-3-row mean,
    // 1-hour event count + value sum — one shuffle, all four features
    // on one sort. Every feature value hash-checked.
    "q128_velocity_features" -> ((s, dir) => {
      graft.ext.Features.velocityFeatures(
          t(s, dir, "events").select(col("user_id"), col("event_id"),
            col("ts"), col("value")),
          "user_id", "ts", "event_id", "value")
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    }),

    // Gap-and-island sessionization (30-min inactivity gap), batch form.
    // One shuffle on user_id; both windows share the same partitioning.
    "q21_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, 0)
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            (col("ts").cast(LongType) - col("prev_ts").cast(LongType)) > 1800, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_sess")).over(wRun).cast(LongType))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // DAU / rolling-7-day active users / stickiness per observed day —
    // distinct-over-sliding-window via day-explosion, no range join.
    // Hash-checked.
    "q149_active_users" -> ((s, dir) => {
      Monitoring.rollingActiveUsers(t(s, dir, "events"), "ts", "user_id")
        .orderBy(col("day"))
    }),

    // q149's 100 TB form: per-day HLL sketches unioned over the window —
    // no distinct shuffle, no day-explosion of user rows. The sketch
    // ESTIMATES are engine-specific, so the hashed payload is the exact
    // counts plus the estimator's error contract (lgConfigK=12 → rsd
    // ~1.6%; flags allow 5% + 1): the flags are computed Spark-side
    // against the exact recompute and the oracle expects TRUE — a
    // broken sketch union or a degraded estimate flips them red.
    "q171_approx_active_users" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val exact = Monitoring.rollingActiveUsers(ev, "ts", "user_id")
      val approx = Monitoring
        .rollingActiveUsersApprox(ev, "ts", "user_id")
        .select(col("day"), col("dau").as("dau_est"),
          col("rolling_active").as("rolling_est"))
      exact.join(approx, Seq("day"))
        .select(col("day"), col("dau"), col("rolling_active"),
          (abs(col("dau_est") - col("dau")).cast("double") <=
            col("dau") * 0.05 + 1.0).as("dau_within"),
          (abs(col("rolling_est") - col("rolling_active")).cast("double") <=
            col("rolling_active") * 0.05 + 1.0).as("rolling_within"))
        .orderBy(col("day"))
    }),

    // Seasonal-naive backtest: forecast = same weekday last week
    // (calendar join, not a row lag), per-day APE + per-type MAPE —
    // the baseline any forecaster must beat. Hash-checked.
    "q148_forecast_backtest" -> ((s, dir) => {
      Monitoring.seasonalNaiveBacktest(t(s, dir, "events"), "ts",
          Seq("event_type"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Day-of-week seasonal anomaly: each day vs its own weekday
    // cohort's mean — the weekly-rhythm-aware variant of q22.
    // Hash-checked (exact counts, explicit double ratios).
    "q137_seasonal_anomaly" -> ((s, dir) => {
      Monitoring.seasonalAnomalyDF(t(s, dir, "events"), "ts")
        .orderBy(col("day"))
    }),

    // A6 volume anomaly as one declarative plan.
    "q22_volume_anomaly" -> ((s, dir) => {
      Monitoring.volumeAnomalyDF(t(s, dir, "events"), "ts",
          threshold = 0.5, lookbackDays = 7)
        .orderBy(col("day"))
    }),

    // A5 freshness probe per group.
    "q23_freshness" -> ((s, dir) => {
      Monitoring.freshnessDF(t(s, dir, "events"), "ts", Seq("event_type"))
        .orderBy(col("event_type"))
    }),

    // Semi-structured payloads: JSON props column → typed values → agg
    // (the §1.2 map/JSON surface).
    "q53_parse_props" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          countDistinct(col("k")).as("n_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // The streaming engine itself, oracle-checked: the hourly agg runs as
    // a real Structured Streaming query (AvailableNow over a file source,
    // complete mode into a memory sink) and must hash-match the same SQL
    // a batch engine produces — exact decimal sums make the streaming
    // result independent of micro-batch arrival order.
    "q47_stream_hourly" -> ((s, dir) => {
      val srcDir = java.nio.file.Files.createTempDirectory("q47-events")
      val src = srcDir.toString
      t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .write.mode("overwrite").parquet(src)
      // per-process sink name (VERDICT r16 #4 — two harnesses in one
      // session-sharing context must not drop each other's view); a
      // leftover from a crashed same-process run is dropped on the way in
      val name = s"q47_hourly_sink_$scratchSuffix"
      if (s.catalog.tableExists(name)) s.catalog.dropTempView(name)
      // size the streaming STATE partitions to the state, not the batch
      // default: the agg holds ~hours×event_types keys, and each state
      // partition pays per-batch checkpoint I/O whether or not it holds
      // keys (32 partitions measured 1.80 s vs 4 at 1.37 s warm). The
      // partition count is pinned into the query's checkpoint at first
      // start, so the session conf only needs to cover .start().
      val prevSp = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val q =
        try graft.streaming.Streams
          .hourlyAgg(graft.streaming.Streams.eventsStream(s, src))
          .writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        finally s.conf.set("spark.sql.shuffle.partitions", prevSp)
      // a timed-out stream must fail LOUDLY: stopping it and reading the
      // memory sink anyway would verify a silently partial aggregate as
      // the query's answer (an oracle mismatch masquerading as an engine
      // bug instead of a machine-contention timeout)
      val finished = q.awaitTermination(120000)
      q.stop()
      require(finished,
        "q47 stream did not finish within 120 s — partial result discarded")
      // detach the result from the memory sink + temp source so repeated
      // invocations in one session don't accumulate tables/dirs
      val rows = s.table(name).orderBy(col("hour"), col("event_type")).collect()
      val schema = s.table(name).schema
      s.catalog.dropTempView(name)
      graft.util.Fs.deleteRecursively(srcDir)
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .orderBy(col("hour"), col("event_type"))
    }),

    // Streaming stateful dedup (§2.10's last ScalaTest-only surface,
    // VERDICT r14 #4), oracle-checked: a deterministic replay through
    // `dropDuplicatesWithinWatermark`. Batch files: the events slice
    // split in two, then a third file RE-SENDING every user_id%3==0 row
    // byte-identically; maxFilesPerTrigger=1 forces one file per
    // micro-batch, so the planted duplicates arrive in a LATER batch
    // than their originals and only cross-batch dedup STATE can drop
    // them — a lost state store, a key-expiry bug, or an emit-twice bug
    // each flips the row count and the hash. The watermark delay
    // exceeds the table's whole event-time span (nothing evicts
    // mid-replay) and duplicate copies are identical bytes, so the
    // keep-first output is batch-boundary-independent: exactly the
    // distinct events, which is what the batch oracle states.
    "q181_stream_dedup" -> ((s, dir) => {
      val srcDir = java.nio.file.Files.createTempDirectory("q181-events")
      val src = srcDir.toString
      val base = t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      base.coalesce(2).write.mode("overwrite").parquet(src)
      base.filter(col("user_id") % 3 === 0)
        .coalesce(1).write.mode("append").parquet(src)
      val name = s"q181_dedup_sink_$scratchSuffix"
      if (s.catalog.tableExists(name)) s.catalog.dropTempView(name)
      // state partitions sized to the state (the q47 lesson)
      val prevSp = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val q =
        try graft.streaming.Streams
          .dedupByKey(
            graft.streaming.Streams.eventsStream(s, src,
              maxFilesPerTrigger = Some(1)),
            keys = Seq("event_id"), watermark = "36500 days")
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        finally s.conf.set("spark.sql.shuffle.partitions", prevSp)
      val finished = q.awaitTermination(120000)
      q.stop()
      require(finished,
        "q181 stream did not finish within 120 s — partial result discarded")
      val rows = s.table(name).orderBy(col("event_id")).collect()
      val schema = s.table(name).schema
      s.catalog.dropTempView(name)
      graft.util.Fs.deleteRecursively(srcDir)
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .orderBy(col("event_id"))
    }))

  /** One unrolled Bradley–Terry MM round: s'_i = W_i / Σ_j n_ij/(s_i+s_j)
    * (UNNORMALIZED — the map is homogeneous, Σ s = 1 is imposed once in
    * the final select) — the exact expression `Preference.bradleyTerry`
    * evaluates, same join shape, so the doubles agree to the bits that
    * survive round(·, 6). */
  private def btStep(prev: String, cur: String): String =
    // MATERIALIZED: each step references the previous one twice (sa, sb);
    // DuckDB inlines plain CTEs per reference, which unrolls 10 chained
    // steps into 2^10 base-table scans (observed: "Too many open files").
    // Materializing makes the oracle evaluate each step once, like the
    // Spark loop.
    s"""$cur AS MATERIALIZED (
       |  SELECT it.item,
       |    CASE WHEN it.wins = 0 THEN CAST(0 AS DOUBLE)
       |         ELSE CAST(it.wins AS DOUBLE)
       |           / SUM(p.n / (sa.s + sb.s)) END AS s
       |  FROM pairs p
       |  JOIN $prev sa ON sa.item = p.a
       |  JOIN $prev sb ON sb.item = p.b
       |  JOIN items it ON it.item = p.a
       |  GROUP BY it.item, it.wins)""".stripMargin

  private val q118Oracle: String = {
    val steps = (0 until 10).map(i => btStep(s"s$i", s"s${i + 1}"))
      .mkString(",\n")
    s"""WITH nxt AS MATERIALIZED (
       |  SELECT event_type AS a, lead(event_type) OVER w AS b,
       |    value AS va, lead(value) OVER w AS vb
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |comp AS MATERIALIZED (
       |  SELECT CASE WHEN va > vb THEN a ELSE b END AS winner,
       |         CASE WHEN va > vb THEN b ELSE a END AS loser
       |  FROM nxt WHERE b IS NOT NULL AND a <> b AND va <> vb),
       |pairs AS MATERIALIZED (
       |  SELECT a, b, CAST(COUNT(*) AS DOUBLE) AS n FROM (
       |    SELECT winner AS a, loser AS b FROM comp
       |    UNION ALL
       |    SELECT loser AS a, winner AS b FROM comp)
       |  GROUP BY a, b),
       |wintab AS (SELECT winner AS item, COUNT(*) AS wins FROM comp GROUP BY winner),
       |items AS MATERIALIZED (
       |  SELECT i.item, COALESCE(w.wins, 0) AS wins
       |  FROM (SELECT DISTINCT a AS item FROM pairs) i
       |  LEFT JOIN wintab w ON w.item = i.item),
       |np AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM items),
       |s0 AS (SELECT item, 1.0 / (SELECT n FROM np) AS s FROM items),
       |$steps
       |SELECT it.item, CAST(it.wins AS BIGINT) AS wins,
       |  CAST(pc.nc AS BIGINT) AS n_comp,
       |  ROUND(s.s / (SELECT SUM(s) FROM s10), 6) AS strength
       |FROM items it
       |JOIN s10 s ON s.item = it.item
       |JOIN (SELECT a AS item, SUM(n) AS nc FROM pairs GROUP BY a) pc
       |  ON pc.item = it.item
       |ORDER BY it.item""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // q149's exact recompute + the error-contract flags pinned TRUE: the
    // HLL estimates themselves are engine-specific, the CONTRACT is not
    "q171_approx_active_users" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |days AS (SELECT DISTINCT day FROM du),
        |dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY day),
        |roll AS (
        |  SELECT s.day, COUNT(DISTINCT d.user_id) AS rolling_active
        |  FROM days s JOIN du d ON d.day BETWEEN s.day - 6 AND s.day
        |  GROUP BY s.day)
        |SELECT dau.day, CAST(dau.dau AS BIGINT) AS dau,
        |  CAST(roll.rolling_active AS BIGINT) AS rolling_active,
        |  TRUE AS dau_within, TRUE AS rolling_within
        |FROM dau JOIN roll ON dau.day = roll.day
        |ORDER BY dau.day""".stripMargin,

    // per (group × quantile): the rank-error flag pinned TRUE — the
    // sketch's returned values are merge-order-specific, the contract
    // is the gate
    "q173_kll_rollup" ->
      """SELECT l_returnflag, q.quantile, TRUE AS within_bound
        |FROM (SELECT DISTINCT l_returnflag FROM lineitem) g
        |CROSS JOIN (SELECT CAST(0.25 AS DOUBLE) AS quantile
        |  UNION ALL SELECT CAST(0.5 AS DOUBLE)
        |  UNION ALL SELECT CAST(0.75 AS DOUBLE)) q
        |ORDER BY l_returnflag, q.quantile""".stripMargin,

    // BETWEEN formulation — result-identical to the day-explosion plan
    "q149_active_users" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |days AS (SELECT DISTINCT day FROM du),
        |dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY day),
        |roll AS (
        |  SELECT s.day, COUNT(DISTINCT d.user_id) AS rolling_active
        |  FROM days s JOIN du d ON d.day BETWEEN s.day - 6 AND s.day
        |  GROUP BY s.day)
        |SELECT dau.day, CAST(dau.dau AS BIGINT) AS dau,
        |  CAST(roll.rolling_active AS BIGINT) AS rolling_active,
        |  ROUND(CAST(dau.dau AS DOUBLE) / CAST(roll.rolling_active AS DOUBLE), 6)
        |    AS stickiness
        |FROM dau JOIN roll ON dau.day = roll.day
        |ORDER BY dau.day""".stripMargin,

    // same calendar day−7 self-join + APE/MAPE arithmetic
    "q148_forecast_backtest" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |j AS (
        |  SELECT d.event_type, d.day, d.n, f.n AS forecast
        |  FROM daily d LEFT JOIN daily f
        |    ON d.event_type = f.event_type AND f.day = d.day - 7),
        |m AS (
        |  SELECT event_type,
        |    ROUND(AVG(abs(CAST(n AS DOUBLE) - CAST(forecast AS DOUBLE))
        |      / CAST(n AS DOUBLE)), 6) AS mape
        |  FROM j WHERE forecast IS NOT NULL GROUP BY event_type)
        |SELECT j.event_type, j.day, CAST(j.n AS BIGINT) AS n,
        |  CAST(j.forecast AS BIGINT) AS forecast,
        |  ROUND(abs(CAST(j.n AS DOUBLE) - CAST(j.forecast AS DOUBLE))
        |    / CAST(j.n AS DOUBLE), 6) AS ape,
        |  m.mape
        |FROM j LEFT JOIN m ON j.event_type = m.event_type
        |ORDER BY j.event_type, j.day""".stripMargin,

    // DuckDB dayofweek is 0=Sunday; Spark's is 1=Sunday — +1 aligns
    "q137_seasonal_anomaly" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events
        |  WHERE ts IS NOT NULL GROUP BY 1),
        |c AS (
        |  SELECT dayofweek(day) + 1 AS dow, SUM(n) AS cs, COUNT(*) AS cc
        |  FROM daily GROUP BY 1)
        |SELECT d.day, CAST(c.dow AS INT) AS dow, CAST(d.n AS BIGINT) AS n,
        |  ROUND(CAST(c.cs AS DOUBLE) / CAST(c.cc AS DOUBLE), 6) AS dow_mean,
        |  ROUND(CAST(d.n AS DOUBLE)
        |    / (CAST(c.cs AS DOUBLE) / CAST(c.cc AS DOUBLE)), 6) AS ratio,
        |  (CAST(d.n AS DOUBLE) / (CAST(c.cs AS DOUBLE) / CAST(c.cc AS DOUBLE)) > 2.0
        |   OR CAST(d.n AS DOUBLE) / (CAST(c.cs AS DOUBLE) / CAST(c.cc AS DOUBLE)) < 0.5)
        |    AS is_anomaly
        |FROM daily d JOIN c ON dayofweek(d.day) + 1 = c.dow
        |ORDER BY d.day""".stripMargin,

    // identical bracketing windows (IGNORE NULLS last/first), micros time
    "q142_interpolate" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value
        |  FROM events),
        |w AS (
        |  SELECT user_id, event_id, ts, value,
        |    CAST(epoch_us(ts) AS DOUBLE) AS t,
        |    last_value(value IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v0,
        |    last_value(CASE WHEN value IS NOT NULL
        |        THEN CAST(epoch_us(ts) AS DOUBLE) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t0,
        |    first_value(value IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v1,
        |    first_value(CASE WHEN value IS NOT NULL
        |        THEN CAST(epoch_us(ts) AS DOUBLE) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS t1
        |  FROM e)
        |SELECT user_id, event_id, ts, value,
        |  CASE WHEN value IS NOT NULL THEN value
        |       WHEN v0 IS NOT NULL AND v1 IS NOT NULL THEN
        |         ROUND(CASE WHEN t1 = t0 THEN v0
        |           ELSE v0 + (v1 - v0) * (t - t0) / (t1 - t0) END, 6)
        |  END AS value_filled,
        |  (value IS NULL AND v0 IS NOT NULL AND v1 IS NOT NULL)
        |    AS is_interpolated
        |FROM w ORDER BY user_id, ts, event_id""".stripMargin,

    // identical step integral: micros durations by (ts, event_id) order
    "q140_time_weighted_avg" ->
      """WITH s AS (
        |  SELECT user_id, ts, value,
        |    CAST(lead(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) - epoch_us(ts) AS DOUBLE) AS dur
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL)
        |SELECT user_id, COUNT(*) AS n_obs,
        |  MIN(ts) AS t_first, MAX(ts) AS t_last,
        |  ROUND(CASE WHEN SUM(dur) > 0
        |    THEN SUM(value * dur) / SUM(dur) END, 6) AS time_weighted_avg
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,

    // same decay arithmetic: whole-second age, 0.5^(age/halfLife)
    "q139_decayed_activity" ->
      """SELECT user_id, COUNT(*) AS n,
        |  ROUND(SUM(value * power(0.5,
        |    (1706659200.0 - CAST(CAST(floor(epoch(ts)) AS BIGINT) AS DOUBLE))
        |      / 604800.0)), 6) AS decayed_sum,
        |  MAX(ts) AS last_ts
        |FROM events
        |WHERE ts IS NOT NULL AND value IS NOT NULL
        |  AND CAST(floor(epoch(ts)) AS BIGINT) <= 1706659200
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // identical lead-window transitions + count-ratio arithmetic
    "q136_transition_matrix" ->
      """WITH tr AS (
        |  SELECT event_type AS state,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next
        |  FROM events),
        |c AS (SELECT state, next, COUNT(*) AS n FROM tr
        |      WHERE next IS NOT NULL GROUP BY state, next),
        |f AS (SELECT state, SUM(n) AS nf FROM c GROUP BY state),
        |t2 AS (SELECT next, SUM(n) AS nt FROM c GROUP BY next),
        |a AS (SELECT SUM(n) AS na FROM c)
        |SELECT c.state, c.next, CAST(c.n AS BIGINT) AS n,
        |  ROUND(CAST(c.n AS DOUBLE) / CAST(f.nf AS DOUBLE), 6)
        |    AS p_next_given_state,
        |  ROUND((CAST(c.n AS DOUBLE) / CAST(f.nf AS DOUBLE))
        |    / (CAST(t2.nt AS DOUBLE) / CAST(a.na AS DOUBLE)), 6) AS lift
        |FROM c JOIN f ON c.state = f.state
        |JOIN t2 ON c.next = t2.next, a
        |ORDER BY c.state, c.next""".stripMargin,

    // same decile cuts (quantile_cont array == Spark percentile array),
    // same list-filter binning, floor, and ln contributions
    "q133_psi" ->
      """WITH r AS (
        |  SELECT CAST(value AS DOUBLE) AS v FROM events
        |  WHERE event_type = 'click' AND value IS NOT NULL),
        |c AS (
        |  SELECT CAST(value AS DOUBLE) AS v FROM events
        |  WHERE event_type = 'purchase' AND value IS NOT NULL),
        |cuts AS (SELECT quantile_cont(v,
        |  [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS q FROM r),
        |rb AS (SELECT 1 + len(list_filter((SELECT q FROM cuts),
        |         x -> v > x)) AS bin FROM r),
        |cb AS (SELECT 1 + len(list_filter((SELECT q FROM cuts),
        |         x -> v > x)) AS bin FROM c),
        |rs AS (SELECT bin, COUNT(*) AS n_ref FROM rb GROUP BY bin),
        |cs AS (SELECT bin, COUNT(*) AS n_cur FROM cb GROUP BY bin),
        |sc AS (SELECT CAST(i AS INT) AS bin FROM range(1, 11) t(i)),
        |j AS (
        |  SELECT sc.bin, CAST(COALESCE(rs.n_ref, 0) AS BIGINT) AS n_ref,
        |    CAST(COALESCE(cs.n_cur, 0) AS BIGINT) AS n_cur
        |  FROM sc LEFT JOIN rs ON sc.bin = rs.bin
        |  LEFT JOIN cs ON sc.bin = cs.bin),
        |tt AS (SELECT CAST(SUM(n_ref) AS DOUBLE) AS tr,
        |              CAST(SUM(n_cur) AS DOUBLE) AS tc FROM j),
        |w AS (
        |  SELECT bin, n_ref, n_cur,
        |    greatest(CAST(n_ref AS DOUBLE) / tt.tr, 1e-6) AS pr,
        |    greatest(CAST(n_cur AS DOUBLE) / tt.tc, 1e-6) AS pc
        |  FROM j, tt),
        |p AS (SELECT SUM((pc - pr) * ln(pc / pr)) AS psi FROM w)
        |SELECT bin, n_ref, n_cur,
        |  ROUND(pr, 6) AS p_ref, ROUND(pc, 6) AS p_cur,
        |  ROUND((pc - pr) * ln(pc / pr), 6) AS contrib,
        |  ROUND(p.psi, 6) AS psi
        |FROM w, p ORDER BY bin""".stripMargin,

    // identical moment algebra: decimal-exact s/ss, then the same
    // double expression tree for mean/var/t/df
    "q134_welch_ttest" ->
      """WITH g AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))
        |      * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS ss
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        |  GROUP BY event_type),
        |a AS (
        |  SELECT n AS n_a, s / CAST(n AS DOUBLE) AS ma,
        |    CASE WHEN n > 1 THEN (CAST(n AS DOUBLE) * ss - s * s)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) END AS va
        |  FROM g WHERE event_type = 'click'),
        |b AS (
        |  SELECT n AS n_b, s / CAST(n AS DOUBLE) AS mb,
        |    CASE WHEN n > 1 THEN (CAST(n AS DOUBLE) * ss - s * s)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) END AS vb
        |  FROM g WHERE event_type = 'purchase')
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
        |  ROUND(va, 6) AS var_a, ROUND(vb, 6) AS var_b,
        |  ROUND(CASE WHEN va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE) > 0
        |    THEN (ma - mb) / sqrt(va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE)) END, 6) AS t_stat,
        |  ROUND(CASE WHEN va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE) > 0
        |    THEN (va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE))
        |       * (va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE))
        |       / ((va / CAST(n_a AS DOUBLE)) * (va / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0)
        |          + (vb / CAST(n_b AS DOUBLE)) * (vb / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0)) END, 6) AS df
        |FROM a, b""".stripMargin,

    // full recompute — equality with the merged incremental states IS
    // the check
    "q131_incremental_agg" ->
      """SELECT event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  MIN(CAST(value AS DOUBLE)) AS min_value,
        |  MAX(CAST(value AS DOUBLE)) AS max_value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS avg_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // identical frames: (ts, event_id) row order, whole-epoch-second range
    "q128_velocity_features" ->
      """SELECT user_id, event_id, ts, value,
        |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS prev_value,
        |  ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS avg_rows,
        |  COUNT(*) OVER (PARTITION BY user_id
        |    ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_range,
        |  ROUND(SUM(value) OVER (PARTITION BY user_id
        |    ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 6) AS sum_range
        |FROM events ORDER BY user_id, ts, event_id""".stripMargin,

    // same median/MAD chain as q121, surfaced per row
    "q143_robust_scale" ->
      """WITH med AS (
        |  SELECT event_type, median(value) AS med FROM events GROUP BY event_type),
        |mad AS (
        |  SELECT e.event_type, median(abs(e.value - m.med)) AS mad
        |  FROM events e JOIN med m ON e.event_type = m.event_type
        |  GROUP BY e.event_type)
        |SELECT e.event_id, e.event_type, e.value,
        |  ROUND(CASE WHEN x.mad > 0
        |    THEN (e.value - m.med) / (1.4826 * x.mad) END, 6) AS robust_z
        |FROM events e JOIN med m ON e.event_type = m.event_type
        |JOIN mad x ON e.event_type = x.event_type
        |ORDER BY e.event_id""".stripMargin,

    // same basket dedup / cap / pair-count chain (cap never binds at
    // 5 event types, but the predicate is mirrored for parity)
    "q145_association_rules" ->
      """WITH b AS (
        |  SELECT DISTINCT user_id AS e, event_type AS i FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |keep AS (SELECT e FROM b GROUP BY e HAVING COUNT(*) <= 100),
        |k AS (SELECT b.e, b.i FROM b JOIN keep ON b.e = keep.e),
        |t AS (SELECT CAST(COUNT(DISTINCT e) AS DOUBLE) AS n FROM k),
        |ic AS (SELECT i, COUNT(*) AS ni FROM k GROUP BY i),
        |co AS (
        |  SELECT a.i AS item_a, b2.i AS item_b, COUNT(*) AS n_co
        |  FROM k a JOIN k b2 ON a.e = b2.e AND a.i < b2.i
        |  GROUP BY 1, 2)
        |SELECT co.item_a, co.item_b, CAST(co.n_co AS BIGINT) AS n_co,
        |  ROUND(CAST(co.n_co AS DOUBLE) / t.n, 6) AS support,
        |  ROUND(CAST(co.n_co AS DOUBLE) / CAST(na.ni AS DOUBLE), 6) AS conf_a_to_b,
        |  ROUND(CAST(co.n_co AS DOUBLE) / CAST(nb.ni AS DOUBLE), 6) AS conf_b_to_a,
        |  ROUND(CAST(co.n_co AS DOUBLE) * t.n
        |    / (CAST(na.ni AS DOUBLE) * CAST(nb.ni AS DOUBLE)), 6) AS lift
        |FROM co
        |JOIN ic na ON co.item_a = na.i
        |JOIN ic nb ON co.item_b = nb.i, t
        |WHERE co.n_co >= CEIL(0.01 * t.n - 1e-9)
        |ORDER BY item_a, item_b""".stripMargin,

    // first-depth states by (ts, event_id), shares over all users
    "q144_entry_paths" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
        |  FROM events WHERE user_id IS NOT NULL),
        |p AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rk) AS path
        |  FROM r WHERE rk <= 3 GROUP BY user_id),
        |t AS (SELECT COUNT(DISTINCT user_id) AS tot FROM events)
        |SELECT path, COUNT(*) AS n_entities,
        |  ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS share
        |FROM p, t GROUP BY path, t.tot ORDER BY path""".stripMargin,

    // same two quantile passes as Stats.madOutliers; DuckDB median ==
    // quantile_cont(0.5) == Spark percentile(·, 0.5)
    "q121_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, median(value) AS med FROM events GROUP BY event_type),
        |d AS (
        |  SELECT e.event_type, m.med, abs(e.value - m.med) AS adev
        |  FROM events e JOIN med m ON e.event_type = m.event_type),
        |mad AS (SELECT event_type, median(adev) AS mad FROM d GROUP BY event_type)
        |SELECT d.event_type,
        |  COUNT(*) AS n,
        |  ROUND(ANY_VALUE(d.med), 6) AS median,
        |  ROUND(ANY_VALUE(x.mad), 6) AS mad,
        |  CAST(SUM(CASE WHEN (x.mad > 0 AND d.adev / (1.4826 * x.mad) > 3.0)
        |                  OR (x.mad = 0 AND d.adev > 0) THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM d JOIN mad x ON d.event_type = x.event_type
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,

    "q19_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, max(value) AS click_value FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, p.ts, c.ts AS asof_ts, c.click_value AS asof_click_value
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin,

    "q20_hourly_agg" ->
      s"""SELECT date_trunc('hour', ts) AS hour, event_type,
         |  COUNT(*) AS n, ${sqlDsum("value")} AS total_value
         |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    // Gaps-and-islands twin of the native session_window operator.
    // Break at >= 1800s (strict window containment — see the query
    // comment); µs-exact arithmetic via epoch_us mirrors Spark's
    // microsecond TimestampType; session_end = last event + gap.
    "q158_session_window" ->
      s"""WITH flags AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |      OR (epoch_us(ts) - epoch_us(lag(ts) OVER w)) >= 1800000000
         |    THEN 1 ELSE 0 END AS new_sess
         |  FROM events WHERE ts IS NOT NULL
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         |sess AS (
         |  SELECT user_id, ts, value,
         |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
         |      ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM flags)
         |SELECT user_id,
         |  MIN(ts) AS session_start,
         |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
         |  COUNT(*) AS n_events, ${sqlDsum("value")} AS total_value
         |FROM sess GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin,

    "q108_funnel" ->
      """WITH s0 AS (SELECT user_id, MIN(ts) AS t FROM events
        |  WHERE event_type = 'signup' AND ts IS NOT NULL GROUP BY 1),
        |s1 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
        |  JOIN s0 ON e.user_id = s0.user_id
        |  WHERE e.event_type = 'view' AND e.ts > s0.t GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1),
        |c AS (
        |  SELECT 0 AS stage_idx, 'signup' AS stage,
        |    (SELECT COUNT(*) FROM s0) AS n_users
        |  UNION ALL SELECT 1, 'view', (SELECT COUNT(*) FROM s1)
        |  UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
        |  UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3))
        |SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage,
        |  CAST(n_users AS BIGINT) AS n_users,
        |  ROUND(CASE WHEN (SELECT COUNT(*) FROM s0) > 0
        |    THEN CAST(n_users AS DOUBLE) / (SELECT COUNT(*) FROM s0)
        |    ELSE 0.0 END, 6) AS pct_of_first
        |FROM c ORDER BY stage_idx""".stripMargin,

    "q109_retention" ->
      """WITH nn AS (SELECT user_id, ts FROM events WHERE ts IS NOT NULL),
        |fd AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        |  FROM nn GROUP BY 1),
        |ad AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM nn),
        |cs AS (SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS n_cohort
        |  FROM fd GROUP BY 1),
        |act AS (
        |  SELECT fd.cohort_day,
        |    CAST(date_diff('day', fd.cohort_day, ad.day) AS BIGINT) AS day_offset,
        |    CAST(COUNT(*) AS BIGINT) AS n_active
        |  FROM ad JOIN fd ON ad.user_id = fd.user_id
        |  WHERE date_diff('day', fd.cohort_day, ad.day) <= 14
        |  GROUP BY 1, 2)
        |SELECT act.cohort_day, act.day_offset, act.n_active, cs.n_cohort,
        |  ROUND(CAST(act.n_active AS DOUBLE) / cs.n_cohort, 6) AS retention
        |FROM act JOIN cs ON act.cohort_day = cs.cohort_day
        |ORDER BY act.cohort_day, act.day_offset""".stripMargin,

    "q93_gap_fill" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |spans AS (
        |  SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM daily
        |  GROUP BY 1),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM spans)
        |SELECT s.event_type, s.day,
        |  COALESCE(d.n, 0) AS n,
        |  (d.n IS NULL) AS is_filled
        |FROM spine s LEFT JOIN daily d
        |  ON s.event_type IS NOT DISTINCT FROM d.event_type
        |  AND s.day IS NOT DISTINCT FROM d.day
        |ORDER BY s.event_type, s.day""".stripMargin,

    "q91_event_sequences" ->
      """WITH ranked AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk,
        |    COUNT(*) OVER (PARTITION BY user_id) AS tot
        |  FROM events)
        |SELECT user_id, CAST(MAX(tot) AS BIGINT) AS n_events,
        |  string_agg(event_type, '|' ORDER BY ts, event_id) AS seq
        |FROM ranked WHERE rk <= 20
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q115_sft_transcripts" ->
      """WITH turns AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type IN ('click', 'view') THEN 'user'
        |         ELSE 'assistant' END AS role,
        |    event_type || ' ' || props AS txt
        |  FROM events),
        |m AS (
        |  SELECT user_id, role, txt,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i,
        |    CASE WHEN lag(role) OVER (PARTITION BY user_id ORDER BY ts, event_id) = role
        |         THEN 1 ELSE 0 END AS brk,
        |    SUM(len(regexp_extract_all(txt, '\S+')))
        |      OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS suffix
        |  FROM turns)
        |SELECT user_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_turns,
        |  CAST(SUM(CASE WHEN suffix <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_turns_kept,
        |  CAST(COALESCE(MAX(CASE WHEN suffix <= 30 THEN suffix END), 0) AS BIGINT) AS n_tokens_kept,
        |  SUM(brk) = 0 AS is_alternating,
        |  COALESCE(string_agg(CASE WHEN suffix <= 30 THEN role || ': ' || txt END,
        |    chr(10) ORDER BY i), '') AS transcript
        |FROM m GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q118_bradley_terry" -> q118Oracle,

    "q21_sessionize" ->
      """WITH flags AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR (CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT)) > 1800
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flags)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q22_volume_anomaly" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |win AS (SELECT day, n,
        |  CAST(SUM(n) OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS prev_sum,
        |  CAST(COUNT(n) OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS prev_cnt
        |FROM daily)
        |SELECT day, n,
        |  CASE WHEN prev_cnt > 0 THEN CAST(prev_sum AS DOUBLE)/CAST(prev_cnt AS DOUBLE) END AS avg_prev,
        |  CASE WHEN prev_cnt > 0 AND CAST(prev_sum AS DOUBLE)/CAST(prev_cnt AS DOUBLE) <> 0
        |    THEN (CAST(n AS DOUBLE) - CAST(prev_sum AS DOUBLE)/CAST(prev_cnt AS DOUBLE))
        |         / (CAST(prev_sum AS DOUBLE)/CAST(prev_cnt AS DOUBLE)) END AS pct_change,
        |  COALESCE(abs(CASE WHEN prev_cnt > 0 AND CAST(prev_sum AS DOUBLE)/CAST(prev_cnt AS DOUBLE) <> 0
        |    THEN (CAST(n AS DOUBLE) - CAST(prev_sum AS DOUBLE)/CAST(prev_cnt AS DOUBLE))
        |         / (CAST(prev_sum AS DOUBLE)/CAST(prev_cnt AS DOUBLE)) END) > 0.5, FALSE) AS is_anomaly
        |FROM win ORDER BY day""".stripMargin,

    "q23_freshness" ->
      """SELECT event_type, MAX(ts) AS last_ts, COUNT(*) AS n_rows
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q47_stream_hourly" ->
      s"""SELECT date_trunc('hour', ts) AS hour, event_type,
         |  COUNT(*) AS n, ${sqlDsum("value")} AS total_value
         |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    // q181: the replay feeds events plus byte-identical re-sends of the
    // user_id%3==0 slice through dropDuplicatesWithinWatermark keyed on
    // event_id with an un-evictable watermark — the deduped stream must
    // equal exactly the distinct events (event_id is unique in the
    // table, so that is the table itself)
    "q181_stream_dedup" ->
      """SELECT event_id, ts, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,

    "q53_parse_props" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
