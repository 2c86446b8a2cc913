package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash as ONE imperative Catalyst aggregate (SURVEY §2.11).
  *
  * Input: a 64-bit token hash per row. Buffer: 64 bit-counters + a row
  * count (65 longs, mergeable — so partial aggregation works map-side
  * exactly like any built-in agg). Output: the simhash signature, bit j
  * set iff more inputs had bit j set than clear.
  *
  * Replaces a 64-column `sum(when(...))` aggregate: one tight JVM loop per
  * row instead of 64 separately-evaluated agg expressions, and a 520-byte
  * buffer instead of 65 SQL agg slots.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  /** Registered as a SQL function — without this, a non-BIGINT input
    * passes analysis and dies per-row with ClassCastException at
    * execution instead of a plan-time type error. */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash_agg input must be BIGINT (a 64-bit token hash), " +
        s"got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](65)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) { buf(j) += (h >>> j) & 1L; j += 1 }
      buf(64) += 1L
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 65) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val n = buf(64)
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (buf(j) * 2 > n) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(65 * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(65)(bb.getLong())
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): SimHashAgg =
    copy(child = c)
}

object SimHashAgg {
  /** Aggregate Column: simhash of a long-hash column. */
  def simhash(tokenHash: Column): Column =
    Bridge.column(
      SimHashAgg(Bridge.expression(tokenHash)).toAggregateExpression())
}
