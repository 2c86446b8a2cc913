package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.sources.BaseRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE file that lives inside Spark's package namespace, because a
  * v1 streaming [[org.apache.spark.sql.execution.streaming.Source]] must
  * hand `MicroBatchExecution` a DataFrame whose leaf relation carries
  * `isStreaming = true` (the engine asserts it — "DataFrame returned by
  * getBatch … did not have isStreaming=true"), and the constructors that
  * set that flag (`LogicalRelation(_, isStreaming)`, `Dataset.ofRows`)
  * are `private[sql]`. Delta Lake's `DeltaSource` bridges the same gap
  * the same way — by compiling against these internals
  * (`DeltaLog.createDataFrame(…, isStreaming = true)`); the reference
  * inherits that from the Delta runtime
  * (`/root/reference/src/utils/spark_utils.py:285-344` context).
  *
  * Nothing else belongs here: keep this to the two factory methods so
  * the internal surface area stays auditable.
  */
object GraftStreamingShim {

  /** `relation` as a streaming leaf — the body of every non-empty
    * micro-batch a log-backed file source serves. */
  def streamingRelation(spark: SparkSession, relation: BaseRelation): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession],
      LogicalRelation(relation, isStreaming = true))

  /** A zero-row streaming batch of `schema` — what an idle or
    * fully-skipped version range serves (a plain `emptyDataFrame` would
    * trip the isStreaming assertion). */
  def emptyStreaming(spark: SparkSession, schema: StructType): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession],
      LocalRelation(DataTypeUtils.toAttributes(schema), Nil, isStreaming = true))
}
