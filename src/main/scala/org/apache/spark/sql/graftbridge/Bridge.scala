package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Column ↔ catalyst Expression bridge `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Custom native
  * expressions (graft.functions.VecDot etc.) still need it, so this tiny
  * forwarder lives under the `org.apache.spark.sql` package — the standard
  * pattern for Spark-native extension libraries on Spark 4.x. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Rewrap a DataFrame's physical rows in a fresh `LogicalRDD` with
    * DEFAULT statistics, dropping the origin plan's propagated stats.
    * Needed by iterative self-referencing loops (PageRank,
    * connected components, Bradley–Terry): `Dataset.localCheckpoint`
    * truncates the plan but PRESERVES origin stats, and a loop that
    * joins its own output twice per round then SQUARES the
    * `sizeInBytes` estimate each iteration — the BigInt's digit count
    * doubles per round and Catalyst planning time turns exponential
    * (BigInteger.multiply dominates profiles from ~20 rounds).
    * `internalCreateDataFrame` is `private[sql]`; zero row conversion
    * (the InternalRow RDD is reused as-is). */
  def statsFreeCopy(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    ds.sparkSession.internalCreateDataFrame(ds.queryExecution.toRdd, ds.schema)
  }

  /** Release the RDD blocks behind a [[statsFreeCopy]]/snapshot frame:
    * `Dataset.unpersist` only consults the CacheManager, which snapshot
    * frames never enter — their storage is localCheckpoint RDD blocks.
    * Walks the plan's `LogicalRDD` leaves and unpersists every persisted
    * RDD in their (checkpoint-truncated, so tiny) lineage. A no-op on
    * frames with no RDD-backed storage. */
  def releaseSnapshot(df: org.apache.spark.sql.DataFrame): Unit = {
    def walk(r: org.apache.spark.rdd.RDD[_],
        seen: java.util.IdentityHashMap[org.apache.spark.rdd.RDD[_], AnyRef])
        : Unit =
      if (seen.put(r, this) == null) {
        if (r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
          r.unpersist(blocking = false)
        r.dependencies.foreach(d => walk(d.rdd, seen))
      }
    val seen =
      new java.util.IdentityHashMap[org.apache.spark.rdd.RDD[_], AnyRef]()
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }.foreach(walk(_, seen))
  }

  /** Number of plans registered in the session's `CacheManager`
    * (`private[sql]`) — the cache-lifecycle contract's test probe:
    * library operators must leave this at zero (util.Caches.snapshot
    * results are RDD-block-backed only; a forgotten `persist()` shows
    * up here as an unreleasable entry). */
  def cachedPlanCount(spark: org.apache.spark.sql.SparkSession): Int = {
    val cm = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager
    if (cm.isEmpty) 0 else 1 // isEmpty is the only public-ish probe
  }

  /** The ANALYZED logical plan of a DataFrame (`queryExecution` is on the
    * classic Dataset only) — what a table-valued-function builder must
    * return: TVFs expand to a PLAN, and the analyzed form re-traverses
    * cleanly inside the enclosing query's resolution. */
  def analyzedPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed

  /** Block until the listener bus has delivered every queued event
    * (`waitUntilEmpty` is `private[spark]`) — the probe job-count
    * assertions need: listener events are async, so a count read
    * immediately after an action races the bus. */
  def waitListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** `Observation.getOrEmpty` is `private[sql]` on Spark 4.x: non-blocking
    * metric read (≤100 ms wait, empty map if the action never posted its
    * SQL-execution-end event) — the safe form for convergence checks that
    * must not hang if an eager action stops reporting. */
  def observedOrEmpty(obs: org.apache.spark.sql.Observation): Map[String, Any] =
    obs.getOrEmpty
}
