package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Embedding quantization for training/serving storage: symmetric
  * per-vector int8 — the standard 4× shrink for embedding tables (float32
  * → int8 + one float scale per vector). Pure Column algebra over the
  * vector array: narrow, shuffle-free, combines with column pruning; at
  * 100 TB of embeddings this is a map-only rewrite pass.
  */
object Quantize {

  /** Non-finite elements are excluded from the scale and quantize to 0:
    * one NaN/±Inf element must not zero (non-ANSI) or crash (ANSI — NaN
    * sorts greatest, so it would win array_max and poison every division;
    * round(NaN).cast(long) then throws) the whole vector. */
  private def finite(x: Column): Column =
    !isnan(x) && x =!= lit(Double.PositiveInfinity) &&
      x =!= lit(Double.NegativeInfinity)

  private def maxAbs(vec: Column): Column =
    array_max(transform(
      filter(vec, x => finite(x.cast(DoubleType))),
      x => abs(x.cast(DoubleType))))

  /** (idCol, vecCol) → (idCol, scale, qvec): qvec_i = round(v_i·127/max|v|)
    * ∈ [−127, 127], scale = max|v|/127 (dequant: v̂_i = qvec_i·scale).
    * Zero/empty/all-non-finite vectors quantize to zeros with scale 0.
    * Rounding is half-away-from-zero in every engine (exact at the
    * extremes: the max element is ±127 exactly). */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    // let-bind max|v| ONCE for BOTH outputs (lambda capture would
    // re-reduce the array per element; a separate scale column would
    // re-reduce it per row — the struct carries scale and codes out of
    // a single reduction)
    val both = element_at(transform(array(coalesce(maxAbs(v), lit(0.0))),
      m => struct(
        (m / lit(127.0)).as("scale"),
        transform(v, x =>
          when(m > 0 && finite(x.cast(DoubleType)),
            round(x.cast(DoubleType) * lit(127.0) / m, 0).cast("long"))
            .otherwise(lit(0L))).as("qvec"))), 1)
    df.select(col(idCol), both.getField("scale").as("scale"),
      both.getField("qvec").as("qvec"))
  }

  /** Mean absolute dequantization error per vector — the quality audit
    * paired with [[int8]] (high error flags vectors whose distribution
    * defeats symmetric quantization). Single projection over the input —
    * scale, codes and the error fold all ride one map-only pass (no
    * self-join back to the source, which at embedding-table scale would
    * pay a full shuffle and double-count duplicate ids). Non-finite
    * elements contribute 0 error, matching their quantize-to-0 rule. */
  def int8Error(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    // same single-reduction shape as [[int8]]
    val both = element_at(transform(array(coalesce(maxAbs(v), lit(0.0))),
      m => struct(
        (m / lit(127.0)).as("scale"),
        when(size(v) > 0 && m > 0,
          aggregate(
            filter(v, x => finite(x.cast(DoubleType))),
            lit(0.0), (acc, x) => acc + abs(
              x.cast(DoubleType) -
                round(x.cast(DoubleType) * lit(127.0) / m, 0) *
                  (m / lit(127.0)))) /
            size(v))
          .otherwise(lit(0.0)).as("mean_abs_err"))), 1)
    df.select(col(idCol), both.getField("scale").as("scale"),
      both.getField("mean_abs_err").as("mean_abs_err"))
  }
}
