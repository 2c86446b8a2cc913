package graft.functions

import java.math.BigInteger
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, Decimal, DecimalType, LongType}

/** Exact second-moment sums over k fixed-point columns in ONE imperative
  * aggregate: n, Σxᵢ, and the full upper-triangle Σxᵢxⱼ (i ≤ j) — the
  * sufficient statistics of a covariance/correlation matrix — computed
  * entirely in 128-bit integer arithmetic over UNSCALED decimal values
  * ("cents").
  *
  * Why: Spark's `sum(decimalA * decimalB)` is exact and order-free, but
  * a k-column moment pass needs k(k+1)/2 such sums, each a BigDecimal
  * multiply + add per row (the product's precision exceeds Decimal's
  * compact-long range, so every row allocates). This aggregate does the
  * identical math as long multiplies: per row, k(k+1)/2 calls to
  * `Math.multiplyHigh` + carry adds into a flat long[] buffer — no
  * allocation, no BigDecimal — and converts to decimal ONCE at eval.
  * Same values bit-for-bit (integer arithmetic is integer arithmetic),
  * ~an order of magnitude cheaper per row (q135: the decimal-exact
  * correlation pass drops from ~5.6 s to ~1.5 s at sf0.1).
  *
  * Inputs are the LONG unscaled values of `DecimalType(p ≤ 18, inScale)`
  * columns (`UnscaledValue(cast(col, decimals))`). A row with ANY null
  * child is skipped whole — listwise completeness, the matrix
  * convention, enforced here as well as upstream.
  *
  * Output: `array<decimal(38, 2·inScale)>` of length 1 + k + k(k+1)/2,
  * laid out [n, Σx₁ … Σxₖ, Σx₁x₁, Σx₁x₂ … Σx₁xₖ, Σx₂x₂ … Σxₖxₖ] — all
  * rescaled to the common 2·inScale so one array type carries them
  * (values are exact: n and Σxᵢ just gain trailing zeros).
  *
  * Overflow contract: each Σxᵢxⱼ must fit a signed 128-bit integer —
  * |Σ| < 1.7e38 at scale 2·inScale, the same magnitude Decimal(38)
  * itself caps at. Money-scaled inputs (≤ 10¹² unscaled) need > 10¹⁴
  * rows to approach it. Accumulation wraps silently past that (the
  * Decimal conversion at eval would throw on overflow when the total
  * exceeds precision 38, which catches any plausible breach).
  */
case class DecimalMomentsAgg(
    children: Seq[Expression],
    inScale: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val k = children.size
  require(k >= 1, "need at least one column")
  require(inScale >= 0 && inScale <= 9, s"inScale out of range: $inScale")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "decimal_moments inputs must all be BIGINT unscaled decimal values, got " +
        children.map(_.dataType.sql).mkString(", "))

  // buffer layout: [n, (hi,lo) × k sums, (hi,lo) × k(k+1)/2 products]
  private val nPairs = k * (k + 1) / 2
  private val bufLen = 1 + 2 * k + 2 * nPairs

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  /** 128-bit add of (hi, lo) into buf[off], buf[off+1]; carry via
    * unsigned low-word compare. */
  @inline private def add128(buf: Array[Long], off: Int, hi: Long, lo: Long): Unit = {
    val newLo = buf(off + 1) + lo
    val carry = if (java.lang.Long.compareUnsigned(newLo, lo) < 0) 1L else 0L
    buf(off) += hi + carry
    buf(off + 1) = newLo
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val vals = new Array[Long](k)
    var i = 0
    while (i < k) {
      val v = children(i).eval(input)
      if (v == null) return buf // listwise: skip the whole row
      vals(i) = v.asInstanceOf[Long]
      i += 1
    }
    buf(0) += 1L
    i = 0
    while (i < k) {
      val v = vals(i)
      add128(buf, 1 + 2 * i, v >> 63, v) // sign-extended 64→128
      i += 1
    }
    var off = 1 + 2 * k
    i = 0
    while (i < k) {
      var j = i
      while (j < k) {
        val a = vals(i); val b = vals(j)
        add128(buf, off, Math.multiplyHigh(a, b), a * b)
        off += 2
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    b1(0) += b2(0)
    var off = 1
    while (off < bufLen) {
      add128(b1, off, b2(off), b2(off + 1))
      off += 2
    }
    b1
  }

  private val outScale = 2 * inScale
  // 10^inScale / 10^outScale as BigIntegers for the eval-time rescale
  private def pow10(e: Int) = BigInteger.TEN.pow(e)

  override def eval(buf: Array[Long]): Any = {
    def big128(off: Int): BigInteger = {
      val bb = ByteBuffer.allocate(16)
      bb.putLong(buf(off)); bb.putLong(buf(off + 1))
      new BigInteger(bb.array())
    }
    def dec(unscaled: BigInteger): Decimal =
      Decimal(new java.math.BigDecimal(unscaled, outScale), 38, outScale)
    val out = new Array[Any](1 + k + nPairs)
    out(0) = dec(BigInteger.valueOf(buf(0)).multiply(pow10(outScale)))
    var i = 0
    while (i < k) {
      out(1 + i) = dec(big128(1 + 2 * i).multiply(pow10(inScale)))
      i += 1
    }
    var p = 0
    while (p < nPairs) {
      out(1 + k + p) = dec(big128(1 + 2 * k + 2 * p))
      p += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bufLen * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bufLen)(bb.getLong())
  }

  override def dataType: DataType =
    ArrayType(DecimalType(38, outScale), containsNull = false)
  override def nullable: Boolean = false
  override def nullIntolerant: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): DecimalMomentsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DecimalMomentsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): DecimalMomentsAgg = copy(children = cs)
}

object DecimalMomentsAgg {
  /** Aggregate Column over k decimal columns: exact [n, sums…,
    * pair-products…] as `array<decimal(38, 2·inScale)>`. Callers pass
    * the columns directly; each is CAST to `DecimalType(18, inScale)`
    * here before the unscaled extraction — without that cast a column
    * of a different scale (or a double) would extract unscaled longs at
    * the WRONG magnitude and every sum/product would be silently off by
    * powers of ten. */
  def moments(cols: Seq[Column], inScale: Int): Column = {
    // UnscaledValue extracts a LONG — only decimals up to precision 18
    // fit one. A wider requested type silently re-cast here would either
    // throw NUMERIC_VALUE_OUT_OF_RANGE mid-scan (ANSI) or null-and-skip
    // whole rows (non-ANSI), computing correlations over a silently
    // truncated population; callers needing wider values use the double
    // fast path instead. Enforced by the caller (correlationMatrix).
    Bridge.column(DecimalMomentsAgg(
      cols.map(c => org.apache.spark.sql.catalyst.expressions.UnscaledValue(
        Bridge.expression(c.cast(
          org.apache.spark.sql.types.DecimalType(18, inScale))))),
      inScale).toAggregateExpression())
  }
}
