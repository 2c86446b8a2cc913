package graft.alerting

import scala.collection.mutable

/** Alerting (reference `src/utils/alerting.py`): severity-routed alerts with
  * Slack/PagerDuty-shaped JSON payloads, a dry-run default, and a pluggable
  * HTTP transport so tests never touch the network (the reference mocks
  * requests.post the same way, tests/unit/test_alerting.py:24-197).
  *
  * Pure driver-side code — no Spark. Payloads are built with a minimal JSON
  * emitter (no external deps in this offline environment).
  */
object AlertSeverity extends Enumeration {
  /** P1 pages; P2 high; P3 medium; P4 informational. */
  val P1, P2, P3, P4 = Value
}

final case class Alert(
    title: String,
    message: String,
    severity: AlertSeverity.Value,
    pipelineName: String,
    details: Map[String, String] = Map.empty)

/** Transport seam: production posts HTTP; tests capture. */
trait HttpPoster {
  /** Returns true on 2xx-equivalent success. */
  def post(url: String, jsonBody: String): Boolean
}

/** Records every send; always "succeeds". Default transport in this
  * zero-egress environment and in tests. */
final class RecordingPoster extends HttpPoster {
  val sent = mutable.ArrayBuffer.empty[(String, String)]
  def post(url: String, jsonBody: String): Boolean = { sent += ((url, jsonBody)); true }
}

final class AlertManager(
    slackWebhookUrl: Option[String] = None,
    pagerDutyUrl: Option[String] = None,
    dryRun: Boolean = true,
    poster: HttpPoster = new RecordingPoster) {

  val history = mutable.ArrayBuffer.empty[Alert]

  /** Severity routing mirrors the reference: every alert goes to Slack;
    * only P1 pages PagerDuty (reference alerting.py severity gate). Returns
    * the channels actually notified. Channels are isolated from each
    * other: a THROWING transport (connect timeout, DNS — the trait only
    * promises a boolean for HTTP-level failure) counts as not-notified
    * and must not abort the remaining channels, or a flaky Slack webhook
    * would swallow the P1 page exactly when it matters most. */
  def send(alert: Alert): Seq[String] = {
    history += alert
    if (dryRun) return Seq("dry-run")
    val channels = mutable.ArrayBuffer.empty[String]
    // NonFatal only: swallowing an OutOfMemoryError would keep running a
    // corrupted VM, and an InterruptedException must re-assert the
    // interrupt so a cancelled driver thread actually stops — the goal
    // (a flaky webhook must not abort the P1 page) needs neither
    def attempt(name: String, url: String, payload: String): Unit =
      try { if (poster.post(url, payload)) channels += name }
      catch {
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          System.err.println(s"[alerting] $name post interrupted: " +
            s"${e.getMessage}")
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[alerting] $name post failed: ${e.getMessage}")
      }
    slackWebhookUrl.foreach(attempt("slack", _, slackPayload(alert)))
    if (alert.severity == AlertSeverity.P1)
      pagerDutyUrl.foreach(attempt("pagerduty", _, pagerDutyPayload(alert)))
    channels.toSeq
  }

  def slackPayload(a: Alert): String = {
    val detailLines = a.details.toSeq.sortBy(_._1)
      .map { case (k, v) => s"*${esc(k)}*: ${esc(v)}" }.mkString("\\n")
    s"""{"text":"[${a.severity}] ${esc(a.title)}","blocks":[{"type":"section","text":{"type":"mrkdwn","text":"*${esc(a.title)}*\\n${esc(a.message)}\\npipeline: ${esc(a.pipelineName)}\\n$detailLines"}}]}"""
  }

  def pagerDutyPayload(a: Alert): String =
    s"""{"event_action":"trigger","payload":{"summary":"${esc(a.title)}: ${esc(a.message)}","severity":"critical","source":"${esc(a.pipelineName)}"}}"""

  // full JSON escaping incl. the C0 control range (shared impl — see
  // graft.util.Fmt.jsonEscape for why control bytes matter here)
  private def esc(s: String): String = graft.util.Fmt.jsonEscape(s)
}

/** Convenience wrappers mirroring the reference's standard alert shapes
  * (`src/utils/alerting.py:355-478`): pipeline failure (P1, pages),
  * DQ-check failure (P2 default, fail-rate context), freshness SLA breach
  * (P2, age vs SLA context). Each returns the channels notified. */
object Alerts {

  // locale-stable decimal formatting (shared impl — graft.util.Fmt)
  private def fmt(pattern: String, v: Double): String =
    graft.util.Fmt.fmt(pattern, v)

  /** Pipeline failure: P1 — the only severity that pages. Error text is
    * truncated to 500 chars like the reference. */
  def pipelineFailureAlert(mgr: AlertManager, pipelineName: String,
      errorMessage: String, retryCount: Int = 0): Seq[String] =
    mgr.send(Alert(
      title = s"$pipelineName Pipeline Failed",
      message = s"Pipeline failed after $retryCount retries. " +
        s"Error: ${errorMessage.take(500)}",
      severity = AlertSeverity.P1,
      pipelineName = pipelineName,
      details = Map("Retry Count" -> retryCount.toString)))

  /** DQ-check failure with failed/total context and a percentage fail rate
    * (0 when totalRecords is 0, as in the reference). */
  def dqFailureAlert(mgr: AlertManager, pipelineName: String,
      tableName: String, checkName: String, failedRecords: Long,
      totalRecords: Long,
      severity: AlertSeverity.Value = AlertSeverity.P2): Seq[String] = {
    val failRate =
      if (totalRecords > 0) failedRecords.toDouble / totalRecords * 100 else 0.0
    val ratePct = fmt("%.2f%%", failRate)
    mgr.send(Alert(
      title = s"Data Quality Check Failed: $checkName",
      message = s"DQ check `$checkName` failed on table `$tableName`. " +
        s"Failed records: $failedRecords ($ratePct) of $totalRecords.",
      severity = severity,
      pipelineName = pipelineName,
      details = Map(
        "Table" -> tableName,
        "Check" -> checkName,
        "Fail Rate" -> ratePct)))
  }

  /** Freshness SLA breach: table age vs SLA hours, P2, synthesized
    * `freshness_check_<table>` pipeline name like the reference. */
  def freshnessAlert(mgr: AlertManager, tableName: String, hoursOld: Double,
      slaHours: Int): Seq[String] =
    mgr.send(Alert(
      title = s"Data Freshness SLA Breach: $tableName",
      message = s"Table `$tableName` data is ${fmt("%.1f", hoursOld)} hours old. " +
        s"SLA: $slaHours hours. Check upstream pipelines.",
      severity = AlertSeverity.P2,
      pipelineName = s"freshness_check_$tableName",
      details = Map(
        "Table" -> tableName,
        "Current Age" -> s"${fmt("%.1f", hoursOld)} hours",
        "SLA" -> s"$slaHours hours")))
}
