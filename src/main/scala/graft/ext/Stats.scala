package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Grouped statistical analysis operators: closed-form OLS regression,
  * robust (median/MAD) outlier detection, and chi-square independence —
  * the feature-screening half of a curation pipeline (does signal X
  * predict signal Y; which rows are anomalous under a robust location
  * estimate; are two categorical labelings associated or independent).
  *
  * All three are pure declarative aggregates (no UDF, no collect): one
  * or two keyed shuffles each, map-side combine everywhere, and exact
  * arithmetic where cross-engine parity demands it (decimal-cast sums
  * for fixed-point inputs, double ops on identical operands otherwise —
  * the repo's Q.scala oracle-parity rules).
  */
object Stats {

  /** Per-group simple linear regression (closed form) of `yCol` on
    * `xCol`: slope, intercept, r², n.
    *
    * Sums (Σx, Σy, Σxy, Σx², Σy²) accumulate in DECIMAL cast from the
    * fixed-point input columns — exact and independent of partial-agg
    * order — then the regression algebra runs in double on those exact
    * operands:
    *   slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
    *   intercept = (Σy − slope·Σx) / n
    *   r² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))
    * Groups with zero x-variance emit null slope/intercept/r² (vertical
    * line); groups with zero y-variance emit r² = null too (the
    * quotient is 0/0 — no association to measure).
    *
    * `decimals` is the exact accumulation type; inputs must fit it
    * (default DECIMAL(18,2) — the monetary convention). Scale: ONE
    * shuffle on the group keys; everything else rides the scan.
    * Mirrors SQL REGR_SLOPE/REGR_INTERCEPT/REGR_R2 semantics. */
  def groupedOls(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String, decimals: DecimalType = DecimalType(18, 2),
      roundTo: Int = 6): DataFrame = {
    val x = col(xCol).cast(decimals)
    val y = col(yCol).cast(decimals)
    val agg = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(x).cast(DoubleType).as("__sx"),
      sum(y).cast(DoubleType).as("__sy"),
      sum(x * y).cast(DoubleType).as("__sxy"),
      sum(x * x).cast(DoubleType).as("__sxx"),
      sum(y * y).cast(DoubleType).as("__syy"))
    val nD = col("n").cast(DoubleType)
    val covN = nD * col("__sxy") - col("__sx") * col("__sy")
    val varXN = nD * col("__sxx") - col("__sx") * col("__sx")
    val varYN = nD * col("__syy") - col("__sy") * col("__sy")
    val slope = when(varXN =!= 0.0, covN / varXN)
    agg.select(groupCols.map(col) ++ Seq(
      col("n"),
      round(slope, roundTo).as("slope"),
      round(when(varXN =!= 0.0,
        (col("__sy") - slope * col("__sx")) / nD), roundTo).as("intercept"),
      round(when(varXN =!= 0.0 && varYN =!= 0.0,
        covN * covN / (varXN * varYN)), roundTo).as("r2")): _*)
  }

  /** Per-group robust outlier profile on `valueCol`: exact median, MAD
    * (median absolute deviation), and the count of rows whose robust
    * z-score |v − median| / (1.4826·MAD) exceeds `nSigmas`. The robust
    * pair (median, MAD) survives up to 50% contamination — mean/stddev
    * anomaly rules are themselves dragged by the outliers they hunt.
    *
    * Two quantile passes (median, then median of absolute deviations) —
    * two shuffles on the group keys, with the per-group medians joined
    * back as a broadcast (group cardinality is small by construction;
    * pass the data twice rather than sorting it once globally). Groups
    * with MAD = 0 (over half the values identical) count any deviation
    * from the median as an outlier — the standard convention. */
  def madOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      nSigmas: Double = 3.0, roundTo: Int = 6): DataFrame = {
    val gcols = groupCols.map(col)
    val med = df.groupBy(gcols: _*)
      .agg(percentile(col(valueCol), lit(0.5)).as("__med"))
    val withMed = df.join(broadcast(med), groupCols)
      .withColumn("__adev", abs(col(valueCol) - col("__med")))
    val mad = withMed.groupBy(gcols: _*)
      .agg(percentile(col("__adev"), lit(0.5)).as("__mad"))
    withMed.join(broadcast(mad), groupCols)
      .groupBy(gcols: _*)
      .agg(
        count(lit(1)).as("n"),
        round(first(col("__med")), roundTo).as("median"),
        round(first(col("__mad")), roundTo).as("mad"),
        sum(when(
          (col("__mad") > 0.0 &&
            col("__adev") / (lit(1.4826) * col("__mad")) > nSigmas) ||
            (col("__mad") === 0.0 && col("__adev") > 0.0), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Chi-square test of independence between two categorical columns:
    * one row with the statistic, degrees of freedom, and the table
    * shape. Uses the observed-cells identity
    *   χ² = n·(Σ_observed o²/(rowTot·colTot)) − n
    * so only the |observed cells| ≤ distinct(a)·distinct(b) frame is
    * ever materialized — unobserved cells' (0−e)²/e = e contributions
    * are folded in algebraically, never enumerated.
    *
    * Scale: one shuffle to count cells; margins re-aggregate from the
    * CELL frame (not the input) and join back broadcast — the input is
    * scanned exactly once. The final Σ is a double sum of ≤ cells
    * like-magnitude terms; `roundTo` sits far above the partial-agg
    * order noise (the repo q94 convention). */
  def chiSquareIndependence(df: DataFrame, aCol: String, bCol: String,
      roundTo: Int = 6): DataFrame = {
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__o"))
      .persist()
    val rowTot = cells.groupBy(col("__a"))
      .agg(sum(col("__o")).as("__ra"))
    val colTot = cells.groupBy(col("__b"))
      .agg(sum(col("__o")).as("__cb"))
    val out = cells
      .join(broadcast(rowTot), Seq("__a"))
      .join(broadcast(colTot), Seq("__b"))
      .agg(
        sum(col("__o")).as("__n"),
        countDistinct(col("__a")).as("__ka"),
        countDistinct(col("__b")).as("__kb"),
        sum(col("__o").cast(DoubleType) * col("__o").cast(DoubleType) /
          (col("__ra").cast(DoubleType) * col("__cb").cast(DoubleType)))
          .as("__s"))
      .select(
        col("__n").as("n"),
        col("__ka").as("n_rows"),
        col("__kb").as("n_cols"),
        ((col("__ka") - 1L) * (col("__kb") - 1L)).as("dof"),
        round(col("__n").cast(DoubleType) * col("__s") -
          col("__n").cast(DoubleType), roundTo).as("chi2"))
    out.persist().count() // materialize before releasing the cell cache
    cells.unpersist(blocking = false)
    out
  }

  /** Benford's-law deviation screen (the classic fabricated-amounts
    * test): per group, the observed leading-significant-digit
    * distribution of |valueCol| against Benford's p(d) = log₁₀(1+1/d),
    * with the group's χ² goodness-of-fit repeated on each digit row —
    * naturally-grown monetary amounts follow Benford closely; invented
    * ones (structuring, padding) don't. Rows with null/zero values
    * carry no leading digit and are excluded.
    *
    * Output: (groupCols*, digit 1-9, n_d, p_obs, p_exp, chi2) — digits
    * with zero observations still appear (their (0−np)²/np term is part
    * of χ², and their absence IS signal), via a group × 1-9 frame the
    * observed counts left-join into.
    *
    * Scale: leading-digit extraction is pure arithmetic riding the
    * scan (floor(v/10^floor(log₁₀ v)) — no string formatting); one
    * shuffle to count (group, digit) cells; the digit scaffold and χ²
    * join back broadcast (9 × |groups| rows). */
  def benfordDeviation(df: DataFrame, groupCols: Seq[String],
      valueCol: String, roundTo: Int = 6): DataFrame = {
    val gcols = groupCols.map(col)
    val v = abs(col(valueCol).cast(DoubleType))
    val digit = floor(v / pow(lit(10.0), floor(log10(v)))).cast("int")
    // persisted: the cell counts feed the group totals, the scaffold
    // join and (via `full`) the χ² aggregate — uncached, the raw scan +
    // digit extraction would re-run per branch. Cells are 9 × |groups|
    // at most; the result materialization below releases the cache.
    val cells = df.filter(col(valueCol).isNotNull && v > 0.0)
      .groupBy(gcols :+ digit.as("digit"): _*)
      .agg(count(lit(1)).as("n_d"))
      .persist()
    cells.count()
    // group × digit scaffold so zero-observation digits surface
    val groups = cells.groupBy(gcols: _*).agg(sum(col("n_d")).as("n"))
    val scaffold = groups.crossJoin(broadcast(
      df.sparkSession.range(1, 10).select(col("id").cast("int").as("digit"))))
    val pExp = log10(lit(1.0) + lit(1.0) / col("digit").cast(DoubleType))
    val full = scaffold
      .join(cells, groupCols :+ "digit", "left")
      .na.fill(0L, Seq("n_d"))
      .withColumn("__pexp", pExp)
    val chi2 = full.groupBy(gcols: _*)
      .agg(sum(
        (col("n_d").cast(DoubleType) - col("n").cast(DoubleType) * col("__pexp")) *
          (col("n_d").cast(DoubleType) - col("n").cast(DoubleType) * col("__pexp")) /
          (col("n").cast(DoubleType) * col("__pexp"))).as("__chi2"))
    val out = full.join(broadcast(chi2), groupCols)
      .select(gcols ++ Seq(col("digit"), col("n_d"),
        round(col("n_d").cast(DoubleType) / col("n").cast(DoubleType),
          roundTo).as("p_obs"),
        round(col("__pexp"), roundTo).as("p_exp"),
        round(col("__chi2"), roundTo).as("chi2")): _*)
      .persist()
    out.count()
    cells.unpersist(blocking = false)
    out
  }
}
