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
    * the channels actually notified. */
  def send(alert: Alert): Seq[String] = {
    history += alert
    if (dryRun) return Seq("dry-run")
    val channels = mutable.ArrayBuffer.empty[String]
    slackWebhookUrl.foreach { url =>
      if (poster.post(url, slackPayload(alert))) channels += "slack"
    }
    if (alert.severity == AlertSeverity.P1) pagerDutyUrl.foreach { url =>
      if (poster.post(url, pagerDutyPayload(alert))) channels += "pagerduty"
    }
    channels.toSeq
  }

  def slackPayload(a: Alert): String = {
    val detailLines = a.details.toSeq.sortBy(_._1)
      .map { case (k, v) => s"*${esc(k)}*: ${esc(v)}" }.mkString("\\n")
    s"""{"text":"[${a.severity}] ${esc(a.title)}","blocks":[{"type":"section","text":{"type":"mrkdwn","text":"*${esc(a.title)}*\\n${esc(a.message)}\\npipeline: ${esc(a.pipelineName)}\\n$detailLines"}}]}"""
  }

  def pagerDutyPayload(a: Alert): String =
    s"""{"event_action":"trigger","payload":{"summary":"${esc(a.title)}: ${esc(a.message)}","severity":"critical","source":"${esc(a.pipelineName)}"}}"""

  private def esc(s: String): String = s
    .replace("\\", "\\\\").replace("\"", "\\\"")
    .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
}
