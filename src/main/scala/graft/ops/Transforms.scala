package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-level transforms (SURVEY §2.4 P1–P3, §2.7 WF1–WF2).
  *
  * All transforms are narrow (no shuffle) except the two window operators,
  * which shuffle exactly once on their partition keys. Everything stays
  * inside whole-stage codegen — pure Column algebra, no UDFs.
  */
object Transforms {

  /** Bronze ingestion metadata (reference `src/utils/spark_utils.py:352-372`):
    * source file and ingestion timestamp audit columns. */
  def addIngestionMetadata(df: DataFrame): DataFrame = df
    .withColumn("_source_file", input_file_name())
    .withColumn("_ingestion_timestamp", current_timestamp())

  /** Silver/gold processing timestamp (reference spark_utils.py:375-390). */
  def addProcessingMetadata(df: DataFrame): DataFrame =
    df.withColumn("_processing_timestamp", current_timestamp())

  /** String standardisation (reference spark_utils.py:398-439): for each
    * listed column that exists (missing names are skipped, matching the
    * reference), optionally trim, then apply case folding
    * ("upper" | "lower" | anything else = leave case). Single projection
    * node — one `select`, not N `withColumn`s. */
  def standardizeStrings(
      df: DataFrame,
      columns: Seq[String],
      caseMode: String = "upper",
      trimWhitespace: Boolean = true): DataFrame = {
    val targets = columns.filter(df.columns.contains).toSet
    val projected = df.columns.map { c =>
      if (!targets.contains(c)) col(c)
      else {
        val trimmed = if (trimWhitespace) trim(col(c)) else col(c)
        val cased = caseMode.toLowerCase match {
          case "upper" => upper(trimmed)
          case "lower" => lower(trimmed)
          case _       => trimmed
        }
        cased.as(c)
      }
    }
    df.select(projected.toIndexedSeq: _*)
  }

  /** Keyed dedup keeping first/latest by `orderBy` (reference
    * spark_utils.py:442-483 = WF1): `row_number` over
    * partitionBy(keys).orderBy(order) and keep rank 1.
    *
    * `tieBreakers` guards against the reference's latent bug (SURVEY §7.4):
    * `row_number` on equal order-keys is nondeterministic; callers should
    * pass the PK so results are stable run-to-run.
    *
    * Scale: one hash shuffle on `keys`; no global ordering anywhere. */
  def deduplicateByKey(
      df: DataFrame,
      keys: Seq[String],
      orderByColumn: String,
      ascending: Boolean = false,
      tieBreakers: Seq[String] = Nil): DataFrame = {
    val ord0 = if (ascending) col(orderByColumn).asc else col(orderByColumn).desc
    val ties = tieBreakers.map(c => if (ascending) col(c).asc else col(c).desc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord0 +: ties: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Surrogate key via a global `row_number` over the natural key ordering
    * (reference spark_utils.py:486-511 = WF2). Faithful to the reference —
    * and to its hazard: a window with no partitionBy collapses to ONE
    * partition. Fine for dimension tables (≤ millions of rows); for facts
    * use [[addSurrogateKeyScalable]]. */
  def addSurrogateKey(
      df: DataFrame,
      keyColumnName: String,
      naturalKeys: Seq[String]): DataFrame = {
    val w = Window.orderBy(naturalKeys.map(col): _*)
    df.withColumn(keyColumnName, row_number().over(w).cast("long"))
  }

  /** Scale-safe surrogate keys: two-phase — per-partition ranks plus an
    * exclusive running offset of partition sizes (computed from a tiny
    * per-partition count aggregate, broadcast back). Produces the same
    * dense 1..N keys ordered by the natural keys, without a single-partition
    * window. The extra cost over the global window is one range shuffle
    * (for global order) + one tiny aggregate. */
  def addSurrogateKeyScalable(
      df: DataFrame,
      keyColumnName: String,
      naturalKeys: Seq[String]): DataFrame = {
    // snapshot the range-partitioned frame: the offsets aggregate and
    // the main join both consume it, and correctness REQUIRES both to
    // see the same sampled range boundaries — under exchange-reuse both
    // branches share one exchange anyway, but with reuse disabled (or an
    // AQE recompute) an unmaterialized subtree could re-sample different
    // boundaries, silently duplicating/skipping key values. The eager
    // snapshot makes boundary agreement unconditional, registers no
    // CacheManager entry, and its blocks GC-release with the frame
    // (util.Caches contract; the old persist() here was never released).
    val ordered = graft.util.Caches.snapshot(
      df.repartitionByRange(naturalKeys.map(col): _*)
        .sortWithinPartitions(naturalKeys.map(col): _*)
        .withColumn("__pid", spark_partition_id()))
    val localRank = row_number().over(
      Window.partitionBy(col("__pid")).orderBy(naturalKeys.map(col): _*))
    val withLocal = ordered.withColumn("__lrn", localRank)
    val offsets = withLocal.groupBy("__pid").count()
      .withColumn("__offset",
        coalesce(
          sum(col("count")).over(
            Window.orderBy(col("__pid"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__offset"))
    withLocal.join(broadcast(offsets), "__pid")
      .withColumn(keyColumnName, (col("__offset") + col("__lrn")).cast("long"))
      .drop("__pid", "__lrn", "__offset")
  }

  /** Pipe-delimited string → array column (bronze `fraud_indicators` →
    * silver array<string>; reference generator.py:540 / silver.py:49).
    * Empty string → empty array (split would give [""]) . */
  def parseDelimitedArray(c: Column, delimiter: String = "\\|"): Column =
    when(c.isNull || c === "", array().cast("array<string>"))
      .otherwise(split(c, delimiter))
}
