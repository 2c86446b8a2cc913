package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** KLL quantile sketch (Karnin, Lang & Liberty, FOCS'16 — the Apache
  * DataSketches implementation Spark already ships for its HLL
  * functions) as a mergeable imperative Catalyst aggregate: the
  * percentile analogue of a mergeable sum. `percentile_approx` answers a
  * one-shot query but its state is not a storable column; this aggregate
  * RETURNS the serialized sketch, so per-day / per-partition states can
  * be persisted in a metrics table and folded later — percentile
  * rollups over 100 TB cost one pass over each day's partition plus a
  * merge of kilobyte-sized states, never a rescan.
  *
  * Guarantees (from the sketch, not re-derived here): normalized rank
  * error ~1.65% at the default k=200, single-digit KB serialized size,
  * merge never loses the bound. Merge results are ORDER-dependent at the
  * bit level (compactor randomness is seeded per sketch) — callers get
  * rank-error determinism, not byte determinism, so states belong in
  * ScalaTest-tolerance checks, not cross-engine hash gates.
  *
  * `mergeMode=false`: input is a DOUBLE value column, update feeds the
  * sketch. `mergeMode=true`: input is a BINARY serialized-sketch column,
  * update merges each sketch — the re-aggregation path for stored
  * states. Nulls contribute nothing either way. */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mergeMode: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (mergeMode && child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"kll_merge_agg input must be BINARY, got ${child.dataType.sql}")
    else if (!mergeMode && child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"kll_sketch_agg input must be DOUBLE, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      if (mergeMode) buf.merge(KllDoublesSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
      else buf.update(v.asInstanceOf[Double])
    }
    buf
  }

  override def merge(b1: KllDoublesSketch,
      b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2)
    b1
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
}

/** Scalar reader over a serialized KLL sketch: the quantile values at
  * the given probabilities (inclusive rank criterion — the DataSketches
  * default). Finalize-stage only (CodegenFallback — never in a per-row
  * hot path); empty sketches yield null. */
case class KllQuantiles(child: Expression, probabilities: Seq[Double])
  extends UnaryExpression with CodegenFallback {

  require(probabilities.nonEmpty &&
    probabilities.forall(p => p >= 0.0 && p <= 1.0),
    s"probabilities must be in [0, 1], got $probabilities")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"kll_quantiles input must be BINARY, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any = {
    val sketch = KllDoublesSketch.heapify(
      Memory.wrap(input.asInstanceOf[Array[Byte]]))
    if (sketch.isEmpty) null
    else new GenericArrayData(
      probabilities.map(p =>
        java.lang.Double.valueOf(sketch.getQuantile(p)): AnyRef).toArray)
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override protected def withNewChildInternal(c: Expression): KllQuantiles =
    copy(child = c)
}

object KllSketchAgg {
  /** Aggregate raw DOUBLE values into one serialized KLL sketch. */
  def sketch(value: Column, k: Int = 200): Column =
    Bridge.column(KllSketchAgg(Bridge.expression(value), k,
      mergeMode = false).toAggregateExpression())

  /** Merge a column of serialized sketches into one. */
  def mergeSketches(sketches: Column, k: Int = 200): Column =
    Bridge.column(KllSketchAgg(Bridge.expression(sketches), k,
      mergeMode = true).toAggregateExpression())

  /** Quantile values at `probabilities` from a serialized sketch. */
  def quantiles(sketch: Column, probabilities: Seq[Double]): Column =
    Bridge.column(KllQuantiles(Bridge.expression(sketch), probabilities))
}
