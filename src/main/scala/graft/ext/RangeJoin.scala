package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range joins re-expressed as equi-joins on a grid key.
  *
  * Spark turns a bare `p >= lo AND p < hi` join condition into a
  * BroadcastNestedLoopJoin (or a cartesian product when neither side is
  * broadcast-able) — O(|points| × |intervals|) comparisons and a
  * single-threaded build side at cluster scale. The standard scale shape
  * (used by every production range-join implementation, e.g. the interval
  * join in stream processors) is to overlay a fixed-width grid: each
  * interval is exploded to the cells it covers, each point maps to exactly
  * ONE cell, and the join becomes a plain shuffled hash join on
  * (keys…, cell) followed by the exact predicate as a cheap filter.
  *
  * Cost model: |points| + Σ ceil(span/binWidth) exploded interval rows —
  * choose `binWidth` near the median interval span so most intervals
  * explode to 1–2 cells. Skewed cells behave like any other skewed join
  * key (AQE skew split applies). No row ever compares against an interval
  * outside its own cell.
  */
object RangeJoin {

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.types.{ByteType, DataType, DecimalType, IntegerType, LongType, ShortType}

  /** `floor(x / w)` as a grid-cell id, EXACT for integral and decimal
    * columns: `floor(x/w) = (x − pmod(x, w)) / w`, where the numerator is
    * an exact multiple of `w`, so the decimal division has no fractional
    * part to round — all integer arithmetic, no double rounding past 2^53
    * (e.g. epoch nanos; a bare `floor(x / w)` is DOUBLE division in Spark
    * and silently merges adjacent cells there). Float/double columns keep
    * the double floor — their values carry double precision to begin
    * with. */
  private def cellOf(x: Column, binWidth: Long, dt: DataType): Column =
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        val xd = x.cast(DecimalType(38, 0))
        ((xd - pmod(xd, lit(binWidth))) / lit(binWidth)).cast(LongType)
      case d: DecimalType =>
        // widen precision, keep scale — the cast is exact, and the
        // division's numerator is an exact multiple of binWidth
        val xd = x.cast(DecimalType(38, d.scale))
        ((xd - pmod(xd, lit(binWidth))) / lit(binWidth)).cast(LongType)
      case _ => floor(x / binWidth).cast(LongType)
    }

  /** Last grid cell covered by an EXCLUSIVE upper bound: `floor(hi/w)`,
    * minus one when `hi` sits exactly on a cell boundary (an interval
    * ending there does not cover that cell). */
  private def lastCell(hi: Column, binWidth: Long, dt: DataType): Column =
    cellOf(hi, binWidth, dt) -
      when(pmod(hi, lit(binWidth)) === 0, 1).otherwise(0)

  /** Hard cap on the cells ONE interval may explode to (operational
    * knob). An open-ended sentinel bound (`hi = Long.MaxValue`, the
    * common "still valid" encoding) or a merely dirty row at a fine
    * binWidth would sequence billions of elements — erroring past
    * Spark's array cap, or ballooning gigabytes from one input row below
    * it — and kill the whole job obscurely. Fail loudly at the offending
    * row instead; genuinely huge spans pick a coarser binWidth. 2^21
    * cells ≈ 24 days at 1-second bins, 2 MB of exploded rows per
    * interval. */
  @volatile var MaxCellsPerInterval: Long = 1L << 21

  /** `sequence(lo, hi)` with the [[MaxCellsPerInterval]] guard. */
  private def cellSeq(loCell: Column, hiCell: Column): Column = {
    val span = hiCell - loCell + lit(1L)
    when(span > MaxCellsPerInterval,
      raise_error(concat(
        lit("RangeJoin: an interval spans "), span.cast("string"),
        lit(s" grid cells (cap $MaxCellsPerInterval) — an open-ended " +
          "sentinel or dirty bound? Use a coarser binWidth, cap the " +
          "interval, or raise RangeJoin.MaxCellsPerInterval"))))
      .otherwise(sequence(loCell, hiCell))
  }

  /** Decimal scale for exact types, None for floating ones. */
  private def scaleOf(dt: DataType): Option[Int] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some(0)
    case d: DecimalType => Some(d.scale)
    case _ => None
  }

  /** Exact (integral/decimal) and floating columns compute grid cells in
    * different arithmetic that can disagree past 2^53 — a mixed set of
    * key columns would silently lose matches at the cell join, so it is
    * rejected loudly: cast one side first. */
  private def requireConsistentArithmetic(dts: Seq[DataType],
      what: String): Unit =
    require(dts.map(scaleOf(_).isDefined).distinct.size == 1,
      s"$what mix exact and floating numeric types " +
        s"(${dts.map(_.catalogString).mkString(", ")}): their grid cells " +
        "can disagree past 2^53 and silently drop matches — cast one " +
        "side first")

  /** Join each point to every interval containing it: `lo <= p < hi`
    * (half-open, the calendar/window convention). Both inputs may be
    * arbitrarily large — the join is a hash equi-join on (`keys`…, cell).
    *
    * `pointCol`, `loCol`, `hiCol` must be numeric (cast timestamps to
    * epoch seconds/micros first); empty intervals (`hi <= lo`) match
    * nothing; rows with null bounds/points drop (inner-join semantics).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String, binWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    requireConsistentArithmetic(
      Seq(points.schema(pointCol).dataType, intervals.schema(loCol).dataType,
        intervals.schema(hiCol).dataType), "pointInInterval columns")
    val cells = intervals
      .filter(col(hiCol) > col(loCol))
      .withColumn("__cell",
        explode(cellSeq(
          cellOf(col(loCol), binWidth, intervals.schema(loCol).dataType),
          lastCell(col(hiCol), binWidth, intervals.schema(hiCol).dataType))))
    val pts = points
      .withColumn("__cell",
        cellOf(col(pointCol), binWidth, points.schema(pointCol).dataType))
    pts.join(cells, keys :+ "__cell")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__cell")
  }

  /** Join overlapping interval pairs: `[aLo, aHi)` meets `[bLo, bHi)`.
    * Both sides explode to covered cells; a pair meets in every shared
    * cell, so to avoid a dedup shuffle each pair is emitted ONLY from its
    * canonical cell — the one containing `max(aLo, bLo)` (the leftmost
    * cell where both are present). Plan: hash join on (`keys`…, cell) +
    * two scalar filters; no dropDuplicates, no cross join. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      aLo: String, aHi: String, bLo: String, bHi: String, binWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def cellsOf(df: DataFrame, lo: String, hi: String): DataFrame = df
      .filter(col(hi) > col(lo))
      .withColumn("__cell",
        explode(cellSeq(cellOf(col(lo), binWidth, df.schema(lo).dataType),
          lastCell(col(hi), binWidth, df.schema(hi).dataType))))
    // canonical-cell arithmetic must agree with BOTH sides' exploded
    // cells — mixed exact/floating bound sets are rejected up front
    requireConsistentArithmetic(
      Seq(left.schema(aLo).dataType, left.schema(aHi).dataType,
        right.schema(bLo).dataType, right.schema(bHi).dataType),
      "intervalOverlap bounds")
    val canonDt =
      (scaleOf(left.schema(aLo).dataType), scaleOf(right.schema(bLo).dataType))
        match {
        case (Some(sa), Some(sb)) => DecimalType(38, math.max(sa, sb))
        case _ => org.apache.spark.sql.types.DoubleType
      }
    cellsOf(left, aLo, aHi).join(cellsOf(right, bLo, bHi), keys :+ "__cell")
      .filter(col(aLo) < col(bHi) && col(bLo) < col(aHi))
      .filter(col("__cell") ===
        cellOf(greatest(col(aLo), col(bLo)), binWidth, canonDt))
      .drop("__cell")
  }
}
