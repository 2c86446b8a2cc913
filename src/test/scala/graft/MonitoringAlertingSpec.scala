package graft

import org.apache.spark.sql.functions._

import graft.alerting._
import graft.monitoring._

class MonitoringAlertingSpec extends SparkSpec {
  import spark.implicits._

  test("PipelineMonitor tracks stage duration and counts") {
    var now = 1000L
    val mon = new PipelineMonitor(spark, "p", clock = () => now)
    mon.startStage("ingest")
    now = 4000L
    val m = mon.endStage("ingest", recordsRead = 10, recordsWritten = 8,
      recordsFailed = 2)
    assert(m.durationSeconds == 3.0)
    assert(m.recordsRead == 10 && m.recordsWritten == 8 && m.recordsFailed == 2)
    assert(mon.metrics.length == 1)
  }

  test("volume anomaly flags a spike day") {
    // 7 steady days then a 3x spike
    val rows = (1 to 7).flatMap(d =>
      (1 to 100).map(i => (s"2024-01-0$d 00:00:00", i))) ++
      (1 to 300).map(i => ("2024-01-08 00:00:00", i))
    val df = rows.toDF("ts", "i").select(col("ts").cast("timestamp").as("ts"))
    assert(Monitoring.checkVolumeAnomaly(df, "ts", threshold = 0.5))
    val last = Monitoring.volumeAnomalyDF(df, "ts").orderBy(desc("day")).head()
    assert(last.getAs[Boolean]("is_anomaly"))
    assert(math.abs(last.getAs[Double]("pct_change") - 2.0) < 1e-9)
  }

  test("steady volume is not anomalous") {
    val rows = (1 to 8).flatMap(d => (1 to 100).map(i => s"2024-01-0$d 00:00:00"))
    val df = rows.toDF("ts").select(col("ts").cast("timestamp").as("ts"))
    assert(!Monitoring.checkVolumeAnomaly(df, "ts"))
  }

  test("total outage: asOf gap check flags zero-volume days") {
    val rows = (1 to 8).flatMap(d => (1 to 100).map(_ => s"2024-01-0$d 00:00:00"))
    val df = rows.toDF("ts").select(col("ts").cast("timestamp").as("ts"))
    val dayMs = 86400000L
    val jan8 = java.time.Instant.parse("2024-01-08T12:00:00Z").toEpochMilli
    // data current through the as-of day (or yesterday): no outage
    assert(!Monitoring.checkVolumeAnomaly(df, "ts", asOfMs = Some(jan8)))
    assert(!Monitoring.checkVolumeAnomaly(df, "ts",
      asOfMs = Some(jan8 + dayMs)))
    // newest data two+ days old: a full zero-volume day passed — flagged,
    // even though the newest PRESENT day looks perfectly normal
    assert(Monitoring.checkVolumeAnomaly(df, "ts",
      asOfMs = Some(jan8 + 2 * dayMs)))
    // without asOf the pure-window form stays blind to it (documented)
    assert(!Monitoring.checkVolumeAnomaly(df, "ts"))
  }

  test("outage check survives an all-null ts column (no NPE)") {
    val df = Seq[Option[java.sql.Timestamp]](None, None).toDF("ts")
    // null timestamps are filtered: empty frame, nothing to gap-check —
    // isFresh's territory
    assert(!Monitoring.checkVolumeAnomaly(df, "ts",
      asOfMs = Some(System.currentTimeMillis())))
  }

  test("null timestamps do not poison the volume baseline") {
    // 3 steady days of 100 rows plus a pile of null-ts rows: the nulls
    // would fold into a day=NULL pseudo-row that sorts FIRST and lands in
    // every early day's trailing window (avg_prev 5000 -> phantom -98%
    // "anomaly"); filtered, the volume is perfectly steady
    val good = (1 to 3).flatMap(d =>
      (1 to 100).map(_ => Some(s"2024-01-0$d 00:00:00")))
    val bad = (1 to 5000).map(_ => Option.empty[String])
    val df = (good ++ bad).toDF("raw")
      .select(col("raw").cast("timestamp").as("ts"))
    val out = Monitoring.volumeAnomalyDF(df, "ts").orderBy("day").collect()
    assert(out.length == 3) // no day=NULL row
    assert(out.forall(!_.getAs[Boolean]("is_anomaly")))
  }

  test("freshness verdict against SLA") {
    val now = System.currentTimeMillis()
    val fresh = Seq(new java.sql.Timestamp(now - 3600 * 1000)).toDF("ts")
    val stale = Seq(new java.sql.Timestamp(now - 100L * 3600 * 1000)).toDF("ts")
    assert(Monitoring.isFresh(fresh, "ts", maxAgeHours = 4, nowMs = now))
    assert(!Monitoring.isFresh(stale, "ts", maxAgeHours = 4, nowMs = now))
  }

  test("metrics table DDL + monitor append + existence probe") {
    assert(!graft.io.Writers.tableExists(spark, "graft_metrics"))
    Monitoring.createMetricsTable(spark, "graft_metrics")
    assert(graft.io.Writers.tableExists(spark, "graft_metrics"))
    val mon = new PipelineMonitor(spark, "p", metricsTable = Some("graft_metrics"))
    mon.startStage("s1")
    mon.endStage("s1", recordsRead = 5)
    val rows = spark.table("graft_metrics").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("stage_name") == "s1")
    assert(rows.head.getAs[Long]("records_read") == 5L)
    spark.sql("DROP TABLE graft_metrics")
  }

  test("alert severity routing: P1 pages, P3 does not") {
    val poster = new RecordingPoster
    val mgr = new AlertManager(Some("http://slack"), Some("http://pd"),
      dryRun = false, poster = poster)
    val p3 = mgr.send(Alert("t", "m", AlertSeverity.P3, "pipe"))
    assert(p3 == Seq("slack"))
    val p1 = mgr.send(Alert("t", "m", AlertSeverity.P1, "pipe"))
    assert(p1 == Seq("slack", "pagerduty"))
    assert(poster.sent.length == 3)
    assert(mgr.history.length == 2)
  }

  test("a throwing Slack transport does not swallow the P1 page") {
    // the trait only promises a boolean for HTTP-level failure — real
    // transports throw on connect timeout/DNS; each channel is isolated
    val poster = new HttpPoster {
      val sent = scala.collection.mutable.ArrayBuffer.empty[String]
      def post(url: String, jsonBody: String): Boolean =
        if (url.contains("slack")) throw new RuntimeException("timeout")
        else { sent += url; true }
    }
    val mgr = new AlertManager(Some("http://slack"), Some("http://pd"),
      dryRun = false, poster = poster)
    val p1 = mgr.send(Alert("t", "m", AlertSeverity.P1, "pipe"))
    assert(p1 == Seq("pagerduty")) // slack failed but the page went out
    assert(poster.sent == Seq("http://pd"))
  }

  test("dry-run sends nothing") {
    val poster = new RecordingPoster
    val mgr = new AlertManager(Some("http://slack"), Some("http://pd"),
      dryRun = true, poster = poster)
    assert(mgr.send(Alert("t", "m", AlertSeverity.P1, "p")) == Seq("dry-run"))
    assert(poster.sent.isEmpty)
  }

  test("payloads are valid JSON-ish and escape quotes") {
    val mgr = new AlertManager()
    val p = mgr.slackPayload(Alert("a \"quoted\" title", "msg\nline2",
      AlertSeverity.P2, "pipe", Map("k" -> "v")))
    assert(p.contains("\\\"quoted\\\""))
    assert(!p.contains("\n"))
  }

  test("payloads escape C0 control chars (ANSI codes in exception text)") {
    val mgr = new AlertManager()
    val p = mgr.pagerDutyPayload(Alert("t",
      "\u001b[31mFAILED\u001b[0m\u0001 at stage x",
      AlertSeverity.P1, "pipe"))
    // no raw control byte may survive into the JSON body
    assert(!p.exists(c => c < 0x20))
    assert(p.contains("\\u001b[31m"))
    assert(p.contains("\\u0001"))
  }

  test("pipeline failure wrapper: P1, pages, truncates error to 500 chars") {
    val poster = new RecordingPoster
    val mgr = new AlertManager(Some("http://slack"), Some("http://pd"),
      dryRun = false, poster = poster)
    val channels = Alerts.pipelineFailureAlert(mgr, "silver_txns",
      errorMessage = "x" * 800, retryCount = 3)
    assert(channels == Seq("slack", "pagerduty"))
    val a = mgr.history.last
    assert(a.severity == AlertSeverity.P1)
    assert(a.title == "silver_txns Pipeline Failed")
    assert(a.message.contains("after 3 retries"))
    assert(a.message.length < 600) // 500-char error cap
    assert(a.details("Retry Count") == "3")
  }

  test("dq failure wrapper: fail rate context, zero-total safe") {
    val mgr = new AlertManager() // dry-run
    Alerts.dqFailureAlert(mgr, "bronze_load", "transactions", "not_null_id",
      failedRecords = 25, totalRecords = 1000)
    val a = mgr.history.last
    assert(a.severity == AlertSeverity.P2)
    assert(a.details("Fail Rate") == "2.50%")
    Alerts.dqFailureAlert(mgr, "p", "t", "c", 0, 0)
    assert(mgr.history.last.details("Fail Rate") == "0.00%")
  }

  test("freshness wrapper: age vs SLA context, synthesized pipeline name") {
    val mgr = new AlertManager()
    Alerts.freshnessAlert(mgr, "silver_txns", hoursOld = 26.37, slaHours = 24)
    val a = mgr.history.last
    assert(a.severity == AlertSeverity.P2)
    assert(a.pipelineName == "freshness_check_silver_txns")
    assert(a.message.contains("26.4 hours old"))
    assert(a.details("SLA") == "24 hours")
  }

  test("rollingActiveUsers: dau, trailing distinct, stickiness") {
    def at(d: String, u: Long) =
      (java.sql.Timestamp.valueOf(s"2024-01-$d 12:00:00"), u)
    // u1 active day 1 and 5; u2 day 5; u3 day 20 (outside any window)
    val df = Seq(at("01", 1L), at("01", 1L), at("05", 1L), at("05", 2L),
      at("20", 3L)).toDF("ts", "user_id")
    val out = graft.monitoring.Monitoring
      .rollingActiveUsers(df, "ts", "user_id")
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("dau"), r.getAs[Long]("rolling_active"),
          r.getAs[Double]("stickiness"))).toMap
    assert(out.size == 3)
    assert(out("2024-01-01") == ((1L, 1L, 1.0)))
    // day 5 window [day-1 .. day 5]: users {1, 2}; dau 2
    assert(out("2024-01-05") == ((2L, 2L, 1.0)))
    assert(out("2024-01-20") == ((1L, 1L, 1.0)))
    // widen: with a spread fixture the rolling set exceeds the day's
    val df2 = Seq(at("01", 1L), at("03", 2L), at("05", 3L))
      .toDF("ts", "user_id")
    val o2 = graft.monitoring.Monitoring
      .rollingActiveUsers(df2, "ts", "user_id")
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("dau"), r.getAs[Long]("rolling_active"),
          r.getAs[Double]("stickiness"))).toMap
    assert(o2("2024-01-05") == ((1L, 3L, 0.333333)))
  }

  test("rollingActiveUsersApprox matches the exact form on a small " +
    "domain (HLL sparse mode) and never explodes the raw events") {
    def at(d: String, u: Long) =
      (java.sql.Timestamp.valueOf(s"2024-01-$d 12:00:00"), u)
    val df = Seq(at("01", 1L), at("01", 1L), at("03", 2L), at("05", 3L),
      at("05", 1L), at("20", 4L)).toDF("ts", "user_id")
    def rows(o: org.apache.spark.sql.DataFrame) =
      o.collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("dau"), r.getAs[Long]("rolling_active"))).toMap
    val exact = rows(graft.monitoring.Monitoring
      .rollingActiveUsers(df, "ts", "user_id"))
    val approx = rows(graft.monitoring.Monitoring
      .rollingActiveUsersApprox(df, "ts", "user_id"))
    // DataSketches HLL is exact below its sparse threshold, so the two
    // forms agree bit-for-bit on a small entity domain
    assert(approx == exact, s"approx $approx vs exact $exact")
  }

  test("seasonalNaiveBacktest: calendar-lag forecast survives gap days") {
    // counts: day1=10, day8=20, day15=40; day9 missing entirely — a
    // 7-ROW lag would misalign day15's forecast; the calendar join
    // must still pick day8
    def at(d: String, n: Int) = (1 to n).map(_ =>
      java.sql.Timestamp.valueOf(s"2024-01-$d 12:00:00"))
    val df = (at("01", 10) ++ at("08", 20) ++ at("15", 40))
      .map(Tuple1(_)).toDF("ts")
    val out = graft.monitoring.Monitoring
      .seasonalNaiveBacktest(df, "ts")
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (Option(r.getAs[Any]("forecast")), Option(r.getAs[Any]("ape")),
          r.getAs[Double]("mape"))).toMap
    assert(out("2024-01-01")._1.isEmpty) // no prior week
    assert(out("2024-01-08")._1 == Some(10L))
    assert(out("2024-01-08")._2 == Some(0.5))  // |20-10|/20
    assert(out("2024-01-15")._1 == Some(20L))
    assert(out("2024-01-15")._2 == Some(0.5))  // |40-20|/40
    assert(out.values.forall(_._3 == 0.5))     // MAPE over the two
  }

  test("seasonalNaiveBacktest: a null-key group keeps its mape " +
    "(null-safe join-back)") {
    // the forecast join was already <=> on group keys; the mape join
    // must be too, or the null group's rows read mape = null despite a
    // computed value
    def at(d: String, n: Int) = (1 to n).map(_ =>
      java.sql.Timestamp.valueOf(s"2024-01-$d 12:00:00"))
    val df = (at("01", 10).map(t => (Option.empty[String], t)) ++
      at("08", 20).map(t => (Option.empty[String], t)) ++
      at("01", 5).map(t => (Option("k"), t)) ++
      at("08", 10).map(t => (Option("k"), t)))
      .toDF("g", "ts")
    val out = graft.monitoring.Monitoring
      .seasonalNaiveBacktest(df, "ts", groupCols = Seq("g"))
      .collect()
    val nullRows = out.filter(_.isNullAt(0))
    assert(nullRows.length == 2)
    // |20-10|/20 = 0.5 over the one forecastable day
    assert(nullRows.forall(_.getAs[Double]("mape") == 0.5))
  }

  test("seasonalAnomalyDF flags only the day that breaks its weekday rhythm") {
    // 7 Mondays at 20 events, the last at 100 (the spike); one Tuesday
    // cohort of a single day — ratio exactly 1, never anomalous
    val mondays = Seq("2024-01-01", "2024-01-08", "2024-01-15",
      "2024-01-22", "2024-01-29", "2024-02-05")
    val rows =
      mondays.flatMap(d => (1 to 20).map(i =>
        java.sql.Timestamp.valueOf(s"$d 10:00:${i % 60 / 10}${i % 10}"))) ++
        (1 to 100).map(i =>
          java.sql.Timestamp.valueOf(s"2024-02-12 11:0${i % 10}:00")) ++
        (1 to 5).map(i =>
          java.sql.Timestamp.valueOf(s"2024-01-02 09:00:0$i"))
    val df = rows.map(Tuple1(_)).toDF("ts")
    val out = graft.monitoring.Monitoring.seasonalAnomalyDF(df, "ts")
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("n"), r.getAs[Boolean]("is_anomaly"))).toMap
    assert(out.size == 8)
    assert(out("2024-02-12") == ((100L, true)))  // 100/31.43 ≈ 3.2 > 2
    assert(out("2024-01-01") == ((20L, false))) // 20/31.43 ≈ 0.64
    assert(out("2024-01-02") == ((5L, false)))  // singleton cohort, ratio 1
    assert(out.count(_._2._2) == 1)
  }
}
