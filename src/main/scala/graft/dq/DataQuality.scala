package graft.dq

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality framework (SURVEY §2.4 P4–P6, §2.6 A1–A4; reference
  * `src/utils/data_quality.py`).
  *
  * Same fluent surface as the reference — completeness / uniqueness / range /
  * validity / freshness / referential / custom checks, thresholds, a report,
  * and a valid/invalid split with per-row failure reasons — but a different
  * execution design: the reference runs one Spark job per check (k checks =
  * k+2 full scans, data_quality.py:515-547); here all row-level checks
  * evaluate in ONE aggregate pass (`sum(when(violation,1))` per check +
  * `count_distinct` for uniqueness + `max` for freshness), so a 100 TB table
  * is scanned once regardless of how many checks are registered. Referential
  * checks are the only extra jobs (they need an anti-join against the
  * dimension).
  */
object CheckType extends Enumeration {
  val Completeness, Uniqueness, Range, Validity, Freshness, Referential,
      Custom = Value
}

object Severity extends Enumeration {
  val Critical, High, Medium, Low = Value
}

/** One executed check. `passRate` = (total-failed)/total as double. */
final case class DQCheckResult(
    checkName: String,
    checkType: String,
    column: String,
    passed: Boolean,
    totalCount: Long,
    failedCount: Long,
    passRate: Double,
    threshold: Double,
    severity: String,
    details: String)

final case class DQReport(
    tableName: String,
    results: Seq[DQCheckResult]) {
  def passed: Boolean = results.forall(_.passed)
  def failedChecks: Seq[DQCheckResult] = results.filterNot(_.passed)

  /** Report as a DataFrame (deterministic columns only — no wall-clock). */
  def toDF(spark: SparkSession): DataFrame = {
    val rows = results.map(r => Row(tableName, r.checkName, r.checkType,
      r.column, r.passed, r.totalCount, r.failedCount, r.passRate,
      r.threshold, r.severity, r.details))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), DQReport.schema)
  }
}

object DQReport {
  val schema: StructType = StructType(Seq(
    StructField("table_name", StringType, nullable = false),
    StructField("check_name", StringType, nullable = false),
    StructField("check_type", StringType, nullable = false),
    StructField("column_name", StringType, nullable = false),
    StructField("passed", BooleanType, nullable = false),
    StructField("total_count", LongType, nullable = false),
    StructField("failed_count", LongType, nullable = false),
    StructField("pass_rate", DoubleType, nullable = false),
    StructField("threshold", DoubleType, nullable = false),
    StructField("severity", StringType, nullable = false),
    StructField("details", StringType, nullable = true)))
}

/** Internal registered check. `violation` is the per-row failure predicate
  * for row-level checks; aggregate-level checks (uniqueness, freshness,
  * referential) carry their own plumbing. */
private final case class RegisteredCheck(
    name: String,
    checkType: CheckType.Value,
    column: String,
    threshold: Double,
    severity: Severity.Value,
    violation: Option[Column],
    failureReason: Option[String],
    details: String)

/** Fluent checker over one DataFrame (reference data_quality.py:205-634). */
final class DataQualityChecker(df: DataFrame, tableName: String) {

  private var checks = Vector.empty[RegisteredCheck]
  // (name, columns, threshold, severity, approx rsd — None = exact)
  private var uniquenessChecks =
    Vector.empty[(String, Seq[String], Double, Severity.Value, Option[Double])]
  private var freshnessChecks = Vector.empty[(String, String, Double, Severity.Value)]
  private var referentialChecks = Vector.empty[(String, DataFrame, Seq[String], Double, Severity.Value)]

  private def numericTypes: Set[DataType] =
    Set(DoubleType, FloatType, IntegerType, LongType, ShortType, ByteType)

  /** Null-or-empty predicate, type-gated: `isnan` only on float/double
    * (the reference's `isnan(cast(string))` hazard, SURVEY §4.4). */
  private def nullOrEmpty(c: String): Column = {
    val base = col(c).isNull ||
      (col(c).cast(StringType).isNotNull && trim(col(c).cast(StringType)) === "")
    // case-INSENSITIVE type lookup (exact match first), matching Spark's
    // default column resolution: a case-mismatched name still resolves
    // col(c), but an exact-only schema lookup would silently skip the
    // isnan gate and count NaN rows as complete
    val dt = df.schema.find(_.name == c)
      .orElse(df.schema.find(_.name.equalsIgnoreCase(c)))
      .map(_.dataType)
    dt match {
      case Some(DoubleType) | Some(FloatType) => base || isnan(col(c))
      case _ => base
    }
  }

  /** Non-null/non-empty rate per column ≥ threshold
    * (reference data_quality.py:246-318; default 0.95 from base.py:57). */
  def checkCompleteness(columns: Seq[String], threshold: Double = 0.95,
      severity: Severity.Value = Severity.High): this.type = {
    columns.foreach { c =>
      checks :+= RegisteredCheck(s"completeness_$c", CheckType.Completeness,
        c, threshold, severity, Some(nullOrEmpty(c)),
        Some(s"NULL_OR_EMPTY_${c.toUpperCase(java.util.Locale.ROOT)}"),
        s"non-null rate of $c")
    }
    this
  }

  /** Distinct (key-combo) rate = distinct/total ≥ threshold (reference
    * data_quality.py:321-437; default 1.0 = fully unique).
    *
    * Cost note for 100 TB: each EXACT uniqueness check is a distinct
    * `count_distinct` column set, and several of them in the one-pass
    * aggregate plan an `Expand` — the scan is still single, but shuffle
    * volume multiplies by the number of distinct-aggregate groups, and an
    * exact distinct over a near-unique key shuffles essentially every
    * key tuple. Exactness is the right default for a PK audit; for
    * threshold-style checks (< 1.0) on huge tables prefer
    * [[checkUniquenessApprox]], which rides the same single pass as a
    * mergeable HLL partial — no Expand, no full-key shuffle. */
  def checkUniqueness(columns: Seq[String], threshold: Double = 1.0,
      severity: Severity.Value = Severity.Critical): this.type = {
    uniquenessChecks :+= ((s"uniqueness_${columns.mkString("_")}", columns,
      threshold, severity, None))
    this
  }

  /** [[checkUniqueness]] with `approx_count_distinct` (HLL++): the scale
    * form for threshold-based uniqueness on huge tables — a mergeable
    * sketch partial per task instead of an Expand + full-key shuffle.
    * `rsd` is the estimator's relative standard deviation (Spark's
    * default 0.05 = 5%; tighten it — at memory cost — when the threshold
    * sits within a few σ of the expected distinct rate). Not for exact
    * PK audits (threshold 1.0 with an estimator can both false-pass and
    * false-fail). Named `uniqueness_approx_…` so it coexists with the
    * exact check on the same columns without colliding report keys. */
  def checkUniquenessApprox(columns: Seq[String], threshold: Double,
      severity: Severity.Value = Severity.Critical,
      rsd: Double = 0.05): this.type = {
    require(rsd > 0 && rsd < 1, s"rsd must be in (0,1), got $rsd")
    uniquenessChecks :+= ((s"uniqueness_approx_${columns.mkString("_")}",
      columns, threshold, severity, Some(rsd)))
    this
  }

  /** Value-in-[min,max] rate ≥ threshold (reference data_quality.py:383-437).
    * Nulls do not fail range (completeness owns nulls). */
  def checkRange(column: String, minValue: Double, maxValue: Double,
      threshold: Double = 1.0,
      severity: Severity.Value = Severity.High): this.type = {
    val viol = col(column).isNotNull &&
      (col(column) < minValue || col(column) > maxValue)
    checks :+= RegisteredCheck(s"range_$column", CheckType.Range, column,
      threshold, severity, Some(viol),
      Some(s"OUT_OF_RANGE_${column.toUpperCase(java.util.Locale.ROOT)}"),
      s"$column in [$minValue, $maxValue]")
    this
  }

  /** Value-in-enum rate ≥ threshold (reference data_quality.py:340-380).
    * Nulls do not fail validity. */
  def checkValidity(column: String, allowedValues: Seq[String],
      threshold: Double = 1.0,
      severity: Severity.Value = Severity.High): this.type = {
    val viol = col(column).isNotNull && !col(column).isin(allowedValues: _*)
    checks :+= RegisteredCheck(s"validity_$column", CheckType.Validity,
      column, threshold, severity, Some(viol),
      Some(s"INVALID_VALUE_${column.toUpperCase(java.util.Locale.ROOT)}"),
      s"$column in {${allowedValues.mkString(",")}}")
    this
  }

  /** max(tsColumn) within maxAgeHours of now (reference monitoring-style
    * freshness, declared DQ default 24 h, base.py:59). */
  def checkFreshness(tsColumn: String, maxAgeHours: Double = 24.0,
      severity: Severity.Value = Severity.Medium): this.type = {
    freshnessChecks :+= ((s"freshness_$tsColumn", tsColumn, maxAgeHours,
      severity))
    this
  }

  /** Foreign-key integrity: rows of `df` whose `keys` have no match in
    * `dimension` fail (the reference's declared-but-unimplemented
    * DQCheckType.REFERENTIAL, data_quality.py:82 — implemented here as a
    * left-anti join; SURVEY §2.5 J4). */
  def checkReferential(name: String, dimension: DataFrame,
      keys: Seq[String], threshold: Double = 1.0,
      severity: Severity.Value = Severity.Critical): this.type = {
    referentialChecks :+= ((name, dimension, keys, threshold, severity))
    this
  }

  /** Arbitrary boolean Column; rows where `condition` is FALSE **or
    * NULL** fail (reference data_quality.py:440-486 — its extensibility
    * story; no UDFs needed, any Column algebra works). Deliberately
    * STRICTER than range/validity (whose nulls belong to completeness):
    * a custom predicate is arbitrary caller algebra, so an indeterminate
    * verdict is treated as a violation rather than silently passed —
    * callers that want null-tolerance state it in the condition
    * (`c.isNull || cond`). */
  def checkCustom(name: String, condition: Column, column: String = "",
      threshold: Double = 1.0,
      severity: Severity.Value = Severity.Medium): this.type = {
    checks :+= RegisteredCheck(name, CheckType.Custom, column, threshold,
      severity, Some(!coalesce(condition, lit(false))),
      Some(s"CUSTOM_${name.toUpperCase(java.util.Locale.ROOT)}"), s"custom: $name")
    this
  }

  /** Execute all checks. Row-level + uniqueness + freshness run in ONE
    * aggregate job; each referential check adds one anti-join job. */
  def run(nowMs: Long = System.currentTimeMillis()): DQReport = {
    val aggs = Seq(count(lit(1)).cast(LongType).as("__total")) ++
      checks.zipWithIndex.map { case (c, i) =>
        sum(when(c.violation.get, 1L).otherwise(0L)).as(s"__viol_$i")
      } ++
      uniquenessChecks.zipWithIndex.map { case ((_, cols, _, _, rsd), i) =>
        // struct wrap: bare count_distinct DROPS any tuple containing a
        // null, so rows with a null key would all count as duplicates
        // (and a composite key with one all-null column would report 0
        // distinct). A struct is non-null even when its fields are null,
        // so null key tuples participate like any other value.
        val key = struct(cols.map(col): _*)
        rsd.fold(count_distinct(key))(r => approx_count_distinct(key, r))
          .as(s"__uniq_$i")
      } ++
      freshnessChecks.zipWithIndex.map { case ((n, ts, _, _), i) =>
        // the age math divides by seconds — an epoch-MILLIS bigint column
        // would make every check pass forever (hugely negative age), and
        // a DATE breaks the cast. Demand a real timestamp; callers with
        // numeric epochs cast explicitly, stating their unit.
        val dt = df.schema(ts).dataType
        require(dt.isInstanceOf[org.apache.spark.sql.types.TimestampType],
          s"freshness check '$n' needs a TIMESTAMP column, got " +
            s"${dt.catalogString} — cast epoch numerics explicitly " +
            "(e.g. timestamp_seconds)")
        max(col(ts).cast(LongType)).as(s"__fresh_$i")
      }
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    val total = row.getAs[Long]("__total")

    def rate(failed: Long): Double =
      if (total == 0L) 1.0 else (total - failed).toDouble / total.toDouble

    val rowLevel = checks.zipWithIndex.map { case (c, i) =>
      val failed = Option(row.getAs[Long](s"__viol_$i")).getOrElse(0L)
      DQCheckResult(c.name, c.checkType.toString, c.column,
        rate(failed) >= c.threshold, total, failed, rate(failed),
        c.threshold, c.severity.toString, c.details)
    }
    val uniq = uniquenessChecks.zipWithIndex.map {
      case ((n, cols, th, sev, rsd), i) =>
        val distinct = Option(row.getAs[Long](s"__uniq_$i")).getOrElse(0L)
        // an estimator can overshoot the true distinct count — clamp so
        // the failure count never goes negative
        val failed = math.max(0L, total - distinct)
        DQCheckResult(n, CheckType.Uniqueness.toString, cols.mkString(","),
          rate(failed) >= th, total, failed, rate(failed), th, sev.toString,
          s"distinct=$distinct" +
            rsd.fold("")(r => s" (approx, rsd=$r)"))
    }
    val fresh = freshnessChecks.zipWithIndex.map { case ((n, ts, maxH, sev), i) =>
      val maxTs = Option(row.get(row.fieldIndex(s"__fresh_$i")))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      val ageHours = (nowMs / 1000.0 - maxTs) / 3600.0
      val ok = maxTs > 0 && ageHours <= maxH
      DQCheckResult(n, CheckType.Freshness.toString, ts, ok, total,
        if (ok) 0L else total, if (ok) 1.0 else 0.0, 1.0, sev.toString,
        f"age_hours=$ageHours%.2f max=$maxH")
    }
    val ref = referentialChecks.map { case (n, dim, keys, th, sev) =>
      // SQL FK semantics: a null key is exempt from the referential
      // constraint (completeness owns nulls — the same rule range and
      // validity apply via isNotNull). Without the filter, a left-anti
      // join can never match a null key and every optional-FK row
      // double-fails both completeness and referential.
      val failed = df
        .filter(keys.map(col(_).isNotNull).reduce(_ && _))
        .join(dim.select(keys.map(col): _*).distinct(),
          keys, "left_anti").count()
      DQCheckResult(n, CheckType.Referential.toString, keys.mkString(","),
        rate(failed) >= th, total, failed, rate(failed), th, sev.toString,
        s"fk=${keys.mkString(",")} (null keys exempt)")
    }
    DQReport(tableName, rowLevel ++ uniq ++ fresh ++ ref)
  }

  /** Valid/invalid split with per-row failure reasons (reference
    * data_quality.py:570-634 = P5): one flag column per row-level check
    * (`when(viol, reason)`), `array_compact` into `_validation_failures`;
    * valid = empty array (audit columns dropped), invalid = non-empty +
    * `_quarantine_timestamp`. Lazy — caller triggers; narrow ops only. */
  def validInvalidSplit(): (DataFrame, DataFrame) = {
    val rowChecks = checks.filter(_.violation.isDefined)
    if (rowChecks.isEmpty) return (df, df.limit(0)
      .withColumn("_validation_failures", array().cast("array<string>"))
      .withColumn("_quarantine_timestamp", current_timestamp()))
    val flags = rowChecks.map(c =>
      when(c.violation.get, lit(c.failureReason.get))
        .otherwise(lit(null).cast(StringType)))
    val flagged = df.withColumn("_validation_failures",
      array_compact(array(flags: _*)))
    val valid = flagged.filter(size(col("_validation_failures")) === 0)
      .drop("_validation_failures")
    val invalid = flagged.filter(size(col("_validation_failures")) > 0)
      .withColumn("_quarantine_timestamp", current_timestamp())
    (valid, invalid)
  }
}

object DataQualityChecker {
  def apply(df: DataFrame, tableName: String): DataQualityChecker =
    new DataQualityChecker(df, tableName)

  /** One-call sanity check (the reference's quick-check convenience,
    * SURVEY §7.2): key completeness + uniqueness at the standard
    * thresholds, one aggregate pass. */
  def quickCheck(df: DataFrame, tableName: String,
      keyColumns: Seq[String]): DQReport =
    apply(df, tableName)
      .checkCompleteness(keyColumns, threshold = 0.95)
      .checkUniqueness(keyColumns, threshold = 1.0)
      .run()
}
