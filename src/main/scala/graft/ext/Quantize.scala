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

  private def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast(DoubleType))))

  /** (idCol, vecCol) → (idCol, scale, qvec): qvec_i = round(v_i·127/max|v|)
    * ∈ [−127, 127], scale = max|v|/127 (dequant: v̂_i = qvec_i·scale).
    * Zero/empty vectors quantize to zeros with scale 0. Rounding is
    * half-away-from-zero in every engine (exact at the extremes: the max
    * element is ±127 exactly). */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    // let-bind max|v| (lambda capture would re-reduce the array per element)
    val q = element_at(transform(array(maxAbs(v)), m =>
      transform(v, x =>
        when(m > 0,
          round(x.cast(DoubleType) * lit(127.0) / m, 0).cast("long"))
          .otherwise(lit(0L)))), 1)
    df.select(col(idCol),
      (coalesce(maxAbs(v), lit(0.0)) / lit(127.0)).as("scale"),
      q.as("qvec"))
  }

  /** Mean absolute dequantization error per vector — the quality audit
    * paired with [[int8]] (high error flags vectors whose distribution
    * defeats symmetric quantization). */
  def int8Error(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val quantized = int8(df, idCol, vecCol)
      .join(df.select(col(idCol), col(vecCol)), Seq(idCol))
    val err = element_at(transform(array(col("scale")), s =>
      when(size(col(vecCol)) > 0,
        aggregate(
          zip_with(col(vecCol), col("qvec"), (x, qv) =>
            abs(x.cast(DoubleType) - qv.cast(DoubleType) * s)),
          lit(0.0), (acc, e) => acc + e) / size(col(vecCol)))
        .otherwise(lit(0.0))), 1)
    quantized.select(col(idCol), col("scale"), err.as("mean_abs_err"))
  }
}
