package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Multi-dimensional data layout (Z-ordering) — the data-skipping
  * complement to partitioning: sorting by an interleaved-bit key keeps
  * rows that are close in EVERY clustering column inside the same files,
  * so parquet row-group min/max stats prune scans for predicates on ANY
  * of the columns, not just the leading sort key. (A linear sort by `a`
  * gives perfect pruning on `a` and none on `b`; Z-order gives ~√ pruning
  * on each.) Same idea as Delta/Iceberg OPTIMIZE ZORDER BY, expressed as
  * plain Column algebra + a range-partitioned write.
  *
  * Key construction: each column min-max-quantizes to `bits` integer
  * buckets (one broadcast stats row — exact BIGINT arithmetic for
  * integer columns, so the key is cross-engine-reproducible), then the
  * bucket bits interleave: bit i of column j lands at position
  * i·ncols + j. Everything is long shifts/masks — codegen'd, no UDF,
  * rides the scan. */
object Layout {

  /** Append an interleaved Z-order key column (`keyCol`) built from
    * `cols` (numeric; each quantized to `bits` bits by min-max range).
    * ncols·bits must fit a long (≤ 63). One stats aggregate, broadcast
    * back — the corpus itself never shuffles for KEY COMPUTATION (the
    * write sorts, which is the point). */
  def zorderKey(df: DataFrame, cols: Seq[String], bits: Int = 8,
      keyCol: String = "zkey"): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    require(cols.size * bits <= 63, s"${cols.size} cols × $bits bits > 63")
    val buckets = 1L << bits
    // fractional columns must quantize on their REAL values: the old
    // cast-to-BIGINT truncation collapsed a [0,1) double score column to
    // one bucket (min=max=0) — zero pruning on that dimension, and an
    // all-fractional key degenerated to a constant that funneled the
    // whole frame into one range partition. Integral columns keep the
    // exact DECIMAL path below (bit-reproducible across engines).
    val isFractional: Map[String, Boolean] = {
      val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
      cols.map(c => c -> (types.get(c) match {
        case Some(org.apache.spark.sql.types.DoubleType) |
             Some(org.apache.spark.sql.types.FloatType) => true
        case Some(_: org.apache.spark.sql.types.DecimalType) => true
        case _ => false
      })).toMap
    }
    val statCols = cols.flatMap { c =>
      if (isFractional(c))
        Seq(min(col(c).cast(DoubleType)).as(s"__min_$c"),
          max(col(c).cast(DoubleType)).as(s"__max_$c"))
      else
        Seq(min(col(c).cast(LongType)).as(s"__min_$c"),
          max(col(c).cast(LongType)).as(s"__max_$c"))
    }
    val stats = df.agg(statCols.head, statCols.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    // exact integer quantization: ((x − min) · 2^bits) div (range + 1)
    // — `div` (not `/`, which is DOUBLE division in Spark SQL) keeps the
    // whole computation exact, so any engine reproduces the bucket
    // bit-exactly. The arithmetic runs in DECIMAL(38,0), not BIGINT: a
    // clustering column spanning the full long range (hash-distributed
    // ids, ±2^63) overflows max−min+1 and (x−min)·2^bits in 64-bit
    // arithmetic, yielding garbage buckets with no error. The decimal
    // bound span·2^bits < 10^38 holds for every realistic layout
    // (span ≤ 2^64 needs bits ≤ 62; multi-column keys sit far below).
    require(BigInt(2).pow(64) * BigInt(buckets) < BigInt(10).pow(38),
      s"bits=$bits too wide for exact DECIMAL(38,0) quantization")
    def bucket(c: String): Column =
      if (isFractional(c)) {
        // double min-max quantization (bucket boundaries are ~1-ulp
        // engine-specific — harmless for a LAYOUT key: pruning reads
        // the ORIGINAL columns' file stats, a boundary row just lands
        // in the neighboring cluster)
        val span = col(s"__max_$c") - col(s"__min_$c")
        // null value → null bucket (like the integral path, whose
        // DECIMAL expr nulls the whole key): without the guard,
        // `least` IGNORES the null from floor() and returns
        // buckets-1, silently clustering null rows with max-value
        // rows and loosening file stats on this dimension
        when(col(c).isNull, lit(null).cast(LongType))
          .when(span > 0,
            least(floor((col(c).cast(DoubleType) - col(s"__min_$c")) /
              span * buckets), lit(buckets - 1)))
          .otherwise(lit(0L)).cast(LongType)
      } else expr(
        s"((CAST(CAST(`$c` AS BIGINT) AS DECIMAL(38,0)) - " +
          s"CAST(`__min_$c` AS DECIMAL(38,0))) * ${buckets}L) div " +
          s"(CAST(`__max_$c` AS DECIMAL(38,0)) - " +
          s"CAST(`__min_$c` AS DECIMAL(38,0)) + 1L)")
    val key = cols.zipWithIndex.map { case (c, j) =>
      val q = bucket(c)
      (0 until bits).map { i =>
        shiftleft(shiftright(q, i).bitwiseAND(lit(1L)),
          i * cols.size + j)
      }.reduce[Column](_ + _)
    }.reduce[Column](_ + _)
    joined.withColumn(keyCol, key.cast(LongType))
      .drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }

  /** Z-order-cluster a frame into `numFiles` output partitions: range
    * partition on the interleaved key, sort within each partition (a
    * global sort shape — scales like ORDER BY, no single-partition
    * stage). Write the result with `.write.parquet(...)` and every file
    * holds a compact Z-curve segment: min/max stats on the ORIGINAL
    * columns are tight in every dimension. */
  def zorderCluster(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 8): DataFrame = {
    val keyed = zorderKey(df, cols, bits, "__zkey")
    keyed.repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
  }
}
