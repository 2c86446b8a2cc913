package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch (Misra & Gries 1982) as a mergeable
  * imperative Catalyst aggregate — the bounded-memory candidate pass for
  * exact heavy hitters over an UNBOUNDED key domain (a 100 TB web corpus
  * has ~1e9+ distinct junk tokens; a groupBy over all of them shuffles
  * the whole vocabulary, this sketch shuffles `capacity` entries per
  * partial buffer).
  *
  * Buffer: at most `capacity` (item, residual-count) pairs. Update is the
  * classic rule — increment a tracked item, insert while there is room,
  * otherwise decrement ALL counters and drop zeros (amortized O(1): each
  * decrement pays for one unmatched insert). Merge adds counts, then
  * restores the size bound by subtracting the (capacity+1)-th largest
  * residual from every counter and dropping non-positives — the
  * mergeable-summaries rule (Agarwal et al., PODS'12), which preserves
  * the global guarantee: ANY item with true frequency > n/(capacity+1)
  * over the n total inputs survives to the output.
  *
  * Residual counts are merge-ORDER-dependent (only the candidate-set
  * guarantee is deterministic), so eval returns the candidate ITEMS
  * alone, sorted — callers needing frequencies run an exact second pass
  * over this bounded set ([[graft.ext.HeavyHitters]]). */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < capacity => buf.update(item, 1L)
        case None =>
          // decrement-all: every tracked counter pays one; zeros drop
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace { (_, c) => c - 1 }
          buf.foreach { case (k, c) => if (c <= 0) dead += k }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (k, c) =>
      b1.update(k, b1.getOrElse(k, 0L) + c)
    }
    if (b1.size > capacity) {
      // subtract the (capacity+1)-th largest residual, drop non-positive
      val cut = b1.values.toArray.sortBy(-_).apply(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      b1.mapValuesInPlace { (_, c) => c - cut }
      b1.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keys.toArray.sorted.map(UTF8String.fromString(_): AnyRef))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray.map { case (k, c) =>
      (k.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(
      4 + entries.map(e => 4 + e._1.length + 8).sum)
    bb.putInt(entries.length)
    entries.foreach { case (bytes, c) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.update(new String(arr, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MisraGriesAgg =
    copy(child = c)
}

object MisraGriesAgg {
  /** Aggregate Column: sorted candidate items (array<string>) covering
    * every item with frequency > n/(capacity+1). */
  def candidates(item: Column, capacity: Int): Column =
    Bridge.column(
      MisraGriesAgg(Bridge.expression(item), capacity).toAggregateExpression())
}
