package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Privacy audits for training-data governance: before a corpus with
  * person-level attributes ships to a training run, measure how
  * re-identifiable its quasi-identifier combinations are (k-anonymity,
  * Sweeney 2002) and whether small groups leak their sensitive attribute
  * by homogeneity (l-diversity, Machanavajjhala et al. 2007). Both are
  * single keyed aggregates over the quasi-identifier tuple — the audit
  * costs one shuffle at any scale, and the remediation loop
  * (generalize → re-audit) reuses the same pass with coarser columns
  * ([[generalizeNumeric]]).
  */
object Privacy {

  /** Per-equivalence-class k-anonymity audit: group by the
    * quasi-identifier columns, count carriers, flag classes smaller than
    * `k` (each such class pins an individual to ≤ k-1 candidates).
    * Returns one row per class: (quasi*, n, k_anonymous). NULL
    * quasi-identifier values form their own class (SQL GROUP BY
    * semantics — a null birth-date is itself a linkable signal). */
  def kAnonymity(df: DataFrame, quasi: Seq[String], k: Long): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("k_anonymous", col("n") >= k)
  }

  /** Corpus-level k-anonymity summary: class count, violating-class
    * count, rows at risk (rows in classes < k), and the dataset's
    * realized k (the smallest class). One aggregate over the
    * [[kAnonymity]] classes. */
  def kAnonymitySummary(df: DataFrame, quasi: Seq[String],
      k: Long): DataFrame =
    kAnonymity(df, quasi, k).agg(
      count(lit(1)).as("n_classes"),
      sum(when(!col("k_anonymous"), 1L).otherwise(0L)).as("n_violating"),
      sum(when(!col("k_anonymous"), col("n")).otherwise(0L))
        .as("rows_at_risk"),
      min(col("n")).as("realized_k"))

  /** Distinct-l-diversity audit: within each quasi-identifier class,
    * count DISTINCT values of the sensitive column — a class can be
    * k-anonymous yet still leak (all 50 carriers share one diagnosis).
    * Returns (quasi*, n, l_distinct, l_diverse). */
  def lDiversity(df: DataFrame, quasi: Seq[String], sensitive: String,
      l: Long): DataFrame = {
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitive)).as("l_distinct"))
      .withColumn("l_diverse", col("l_distinct") >= l)
  }

  /** Combined k-anonymity + distinct-l-diversity audit in ONE aggregate:
    * (quasi*, n, k_anonymous, l_distinct, l_diverse). Prefer this over
    * joining [[kAnonymity]] and [[lDiversity]] outputs on the quasi
    * columns: `groupBy` keeps NULL quasi values as their own class (as
    * documented), but a re-join on those columns uses null-UNSAFE
    * equality and silently drops every class containing a NULL — and the
    * single groupBy is one shuffle instead of two plus a join anyway. */
  def audit(df: DataFrame, quasi: Seq[String], sensitive: String,
      k: Long, l: Long): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitive)).as("l_distinct"))
      .withColumn("k_anonymous", col("n") >= k)
      .withColumn("l_diverse", col("l_distinct") >= l)
      .select(quasi.map(col) ++
        Seq(col("n"), col("k_anonymous"), col("l_distinct"),
          col("l_diverse")): _*)
  }

  /** Generalization helper for the remediation loop: coarsen a numeric
    * column into `width`-sized bands (floor semantics, so negatives band
    * consistently). Re-run the audit on the banded column; widen until
    * the realized k clears the bar. */
  def generalizeNumeric(c: Column, width: Long): Column = {
    require(width > 0, s"width must be positive, got $width")
    floor(c.cast(DoubleType) / width).cast(LongType) * width
  }
}
