package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.config.{Enums, EnvConfig, Thresholds}
import graft.dq.{DataQualityChecker, DQReport}
import graft.io.Writers
import graft.monitoring.PipelineMonitor
import graft.ops.{SilverPipeline, Transforms}

/** EP1 — the reference's canonical batch composition (SURVEY §3):
  * bronze read → ingestion metadata → DQ checks → valid/invalid split →
  * silver cast → partitioned writes (silver + quarantine) → stage metrics.
  *
  * Execution shape vs the reference: the reference runs k+2 jobs for k DQ
  * checks plus separate counts (§4 hazard 1); here the whole pipeline is
  * TWO jobs — one aggregate for the DQ report, one pass that writes both
  * splits (narrow ops after the scan; quarantine is a second filter over
  * the same cached flagged frame).
  */
object Pipeline {

  final case class IngestionResult(
      report: DQReport,
      validCount: Long,
      quarantinedCount: Long)

  /** Standard DQ contract for bronze transactions (thresholds from
    * config: completeness 0.95, uniqueness 1.0, amount bounds). */
  def transactionChecks(df: DataFrame): DataQualityChecker =
    DataQualityChecker(df, "transactions")
      .checkCompleteness(Seq("transaction_id", "customer_id", "merchant_id",
        "amount", "status"), Thresholds.dqCompletenessThreshold)
      .checkUniqueness(Seq("transaction_id"), Thresholds.dqUniquenessThreshold)
      .checkCustom("amount_in_bounds",
        col("amount").cast("double").between(
          Thresholds.minTransactionAmount, Thresholds.maxTransactionAmount),
        column = "amount")
      .checkValidity("status", Enums.transactionStatuses)
      .checkValidity("transaction_type", Enums.transactionTypes)

  /** Run bronze→silver ingestion for transactions. Writes silver
    * partitioned by transaction_date (partition pruning on the gold side)
    * and quarantine with failure reasons. */
  def ingestTransactions(
      spark: SparkSession,
      bronze: DataFrame,
      env: EnvConfig,
      monitor: Option[PipelineMonitor] = None): IngestionResult = {
    monitor.foreach(_.startStage("ingest_transactions"))

    // cache the metadata-stamped bronze once: the DQ aggregate, the silver
    // write and the quarantine write all read it — without this the source
    // is re-scanned (and all flag predicates recomputed) per consumer
    val withMeta = Transforms.addIngestionMetadata(bronze).persist()
    try {
      val checker = transactionChecks(withMeta)
      val report = checker.run()
      val (valid, invalid) = checker.validInvalidSplit()

      val silver = Transforms.addProcessingMetadata(
        SilverPipeline.transactionsToSilver(valid.drop("_source_file",
          "_ingestion_timestamp")))
      Writers.writeParquet(silver, s"${env.silverPath}/transactions",
        partitionBy = Seq("transaction_date"))
      Writers.writeParquet(invalid, s"${env.quarantinePath}/transactions")

      // counts from the cached frames (identical to what was written —
      // the pipeline is deterministic), not from re-reading the output
      val quarantined = invalid.count()
      val validCount = report.results.headOption.map(_.totalCount)
        .getOrElse(withMeta.count()) - quarantined
      monitor.foreach(_.endStage("ingest_transactions",
        status = if (report.passed) "SUCCESS" else "SUCCESS_WITH_WARNINGS",
        recordsRead = report.results.headOption.map(_.totalCount).getOrElse(0L),
        recordsWritten = validCount, recordsFailed = quarantined))
      IngestionResult(report, validCount, quarantined)
    } finally withMeta.unpersist()
  }

  /** Post-load maintenance, gated by the env's ENABLE_OPTIMIZATION flag
    * (reference dev.py:61/prod.py:64): compaction + clustering rewrite +
    * retired-version GC. */
  def runMaintenance(spark: SparkSession, env: EnvConfig, tablePath: String,
      clusterCols: Seq[String], targetFiles: Int = 8): Boolean = {
    if (!env.enableOptimization) return false
    graft.io.Maintenance.clusterBy(spark, tablePath, clusterCols, targetFiles)
    graft.io.Maintenance.vacuum(tablePath)
    true
  }

  /** DQ report → alert bridge (the reference wires DQ failures into
    * alerting.py's severity routing): worst failing severity maps to the
    * paging tier; no failures → no alert. */
  def alertFromReport(report: DQReport,
      pipelineName: String): Option[graft.alerting.Alert] = {
    import graft.alerting.{Alert, AlertSeverity}
    val failed = report.failedChecks
    if (failed.isEmpty) return None
    val worst = failed.map(_.severity).distinct
    val sev =
      if (worst.contains("Critical")) AlertSeverity.P1
      else if (worst.contains("High")) AlertSeverity.P2
      else if (worst.contains("Medium")) AlertSeverity.P3
      else AlertSeverity.P4
    Some(Alert(
      title = s"DQ failures on ${report.tableName}",
      message = failed.map(c =>
        f"${c.checkName}: ${c.failedCount} failed (rate ${c.passRate}%.4f < ${c.threshold})")
        .mkString("; "),
      severity = sev,
      pipelineName = pipelineName,
      details = failed.map(c => c.checkName -> c.failedCount.toString).toMap))
  }
}
