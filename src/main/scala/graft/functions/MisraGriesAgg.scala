package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch (Misra & Gries 1982), WEIGHTED, as
  * a mergeable imperative Catalyst aggregate — the bounded-memory
  * candidate pass for exact heavy hitters over an UNBOUNDED key domain
  * (a 100 TB web corpus has ~1e9+ distinct junk tokens; a groupBy over
  * all of them shuffles the whole vocabulary, this sketch shuffles
  * `capacity` entries per partial buffer).
  *
  * Buffer: at most `capacity` (item, residual-weight) pairs. Update adds
  * the row's weight to its item; when the table overflows, the
  * (capacity+1)-th largest residual is subtracted from every counter and
  * non-positives drop — the mergeable-summaries rule (Agarwal et al.,
  * PODS'12), applied identically on merge. The guarantee: ANY item whose
  * true total weight exceeds W/(capacity+1) — W the total weight seen —
  * survives to the output. Unit weights give the classic frequent-items
  * bound; weights let the same sketch answer "top domains by bytes" or
  * screen a pre-aggregated (token, count) store.
  *
  * Residual weights are merge-ORDER-dependent (only the candidate-set
  * guarantee is deterministic), so eval returns the candidate ITEMS
  * alone, sorted — callers needing exact totals run a second pass over
  * this bounded set ([[graft.ext.HeavyHitters]]). Null items and
  * non-positive weights contribute nothing. */
case class MisraGriesAgg(
    left: Expression,
    right: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with BinaryLike[Expression] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"misra_gries_agg item must be STRING, got ${left.dataType.sql}")
    else right.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"misra_gries_agg weight must be INT/BIGINT, got ${other.sql}")
    }
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** Restore the size bound: subtract the (capacity+1)-th largest
    * residual from every counter, drop non-positives. On the per-row
    * update path the buffer is exactly capacity+1 entries, where the
    * (capacity+1)-th largest IS the minimum — O(k), no sort; the sort
    * runs only on merge, where size can exceed capacity+1.
    *
    * Amortization bound: on a junk-heavy stream where most tokens are
    * NEW (distinct ≫ capacity), nearly every update overflows and pays
    * this O(capacity) pass — O(n·capacity) worst case, vs the textbook
    * shared-offset/lazy-heap O(1) amortized trim. The trade is
    * deliberate: the map stays a plain String→Long hash (cheap serde,
    * simple merge), and capacities here are sized by minFreqRatio
    * (1e-4–1e-3 ⇒ 1k–10k entries) where the pass is tens of
    * microseconds; for capacity ≳ 100k on a high-novelty stream,
    * switch to the shared-offset construction before raising the
    * cap. */
  private def trim(buf: mutable.HashMap[String, Long]): Unit =
    if (buf.size > capacity) {
      val cut =
        if (buf.size == capacity + 1) buf.values.min
        else buf.values.toArray.sortBy(-_).apply(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace { (_, c) => c - cut }
      buf.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(buf.remove)
    }

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = left.eval(input)
    if (v != null) {
      val w = right.eval(input) match {
        case null => 0L
        case x: Long => x
        case x: Int => x.toLong
      }
      if (w > 0) {
        val item = v.asInstanceOf[UTF8String].toString
        buf.update(item, buf.getOrElse(item, 0L) + w)
        trim(buf)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (k, c) =>
      b1.update(k, b1.getOrElse(k, 0L) + c)
    }
    trim(b1)
    b1
  }

  /** Sort in UTF8String BINARY order, not Java String (UTF-16) order —
    * they disagree on supplementary characters (an emoji sorts before
    * U+FFFD in UTF-16 code units but after it in UTF-8 bytes), and the
    * sorted-output contract must match SQL-side orderings and
    * cross-engine oracles. */
  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keys.toArray.map(UTF8String.fromString)
        .sortWith(_.compareTo(_) < 0).map(x => x: AnyRef))

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
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MisraGriesAgg =
    copy(left = newLeft, right = newRight)
}

object MisraGriesAgg {
  /** Aggregate Column: sorted candidate items (array<string>) covering
    * every item with frequency > n/(capacity+1). */
  def candidates(item: Column, capacity: Int): Column =
    Bridge.column(MisraGriesAgg(Bridge.expression(item),
      Literal(1L, LongType), capacity).toAggregateExpression())

  /** Weighted form: every item whose total weight exceeds
    * W/(capacity+1) is guaranteed among the candidates. */
  def weightedCandidates(item: Column, weight: Column,
      capacity: Int): Column =
    Bridge.column(MisraGriesAgg(Bridge.expression(item),
      Bridge.expression(weight), capacity).toAggregateExpression())
}
