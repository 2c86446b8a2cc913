package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Operator cache-lifecycle contract.
  *
  * Library operators that must materialize eagerly (iterative fan-out,
  * self-joined intermediates, convergence loops) return frames built with
  * [[snapshot]] instead of `persist()`: an eager local checkpoint whose
  * storage blocks are tracked at the RDD level only. The difference
  * matters in long-lived sessions:
  *
  *  - a `persist()`ed result registers its plan in the session
  *    `CacheManager`, which holds a STRONG reference — the blocks live
  *    until someone calls `unpersist()` on exactly that frame. Twenty
  *    operators × a 150-query session saturated the storage pool and
  *    turned every later shuffle into an eviction fight (BENCH_r07:
  *    2.4× phantom regression);
  *  - a [[snapshot]] result holds its blocks only through the returned
  *    frame's RDD reference: when the caller drops the frame, the
  *    `ContextCleaner` unpersists the blocks on the next driver GC. No
  *    session-global registry entry, no manual release required — and
  *    [[clearAll]] can still force-drop everything between benchmark
  *    runs.
  *
  * The snapshot is also lineage-cut with DEFAULT stats
  * ([[Iterate.checkpointCut]]): downstream joins see no inflated
  * propagated estimates, and AQE's runtime sizes still convert small
  * results to broadcast joins.
  */
object Caches {

  /** Eagerly materialize an operator RESULT frame: one action runs the
    * plan, the returned frame is lineage-cut, registers nothing in the
    * session `CacheManager`, and its blocks are released by the
    * `ContextCleaner` once the caller drops the frame. */
  def snapshot(df: DataFrame): DataFrame = Iterate.checkpointCut(df)

  /** Release a [[snapshot]] frame's RDD blocks — the handle a
    * CONTINUOUS consumer (streaming sink, driver loop) needs:
    * `Dataset.unpersist` is a no-op on snapshot frames (their storage is
    * localCheckpoint blocks, not CacheManager entries), and without an
    * explicit release a long-running stream pins one block set per
    * micro-batch until GC + ContextCleaner get around to it. Batch
    * queries need not bother — the bench/driver drain ([[clearAll]])
    * sweeps everything between queries. */
  def release(df: DataFrame): Unit =
    org.apache.spark.sql.graftbridge.Bridge.releaseSnapshot(df)

  /** Drop every cached plan and every persisted/checkpointed RDD block in
    * the session — harness hygiene between measured queries (a benchmark
    * sweep must not let query N's residue tax query N+1's shuffles). */
  def clearAll(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
