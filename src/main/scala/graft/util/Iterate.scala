package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftbridge.Bridge

/** Helpers for iterative DataFrame loops (power iteration, pointer
  * jumping, MM updates). */
object Iterate {

  /** Eager lineage cut for self-referencing loops: materialize `df`
    * once (local checkpoint — the per-round minimum for an iterative
    * algorithm) and return a frame whose plan is a bare `LogicalRDD`
    * with DEFAULT stats.
    *
    * Plain `localCheckpoint(true)` is NOT enough: it truncates the
    * plan but keeps the origin plan's propagated statistics, and a
    * loop that joins its own output twice per round (PageRank's
    * contributions + dangling mass, Bradley–Terry's s_a + s_b, CC's
    * augmented edges + neighbor join) squares the `sizeInBytes`
    * BigInt every round — its digit count doubles per iteration and
    * Catalyst planning cost turns exponential: measured on a 3-item
    * Bradley–Terry loop, per-round time is flat ~0.2 s through round
    * 18, then 1.6 s / 3.5 s / 8.5 s / 23 s as the estimate passes
    * 10^7 bits. With the stats reset the same loop is flat ~0.2 s
    * through round 30+.
    *
    * The default-stats frame is never auto-broadcast — exactly right
    * for loop state, which is joined by key on the cluster; explicit
    * `broadcast()` hints (e.g. PageRank's dangling-mass single row)
    * are unaffected. */
  def checkpointCut(df: DataFrame): DataFrame =
    Bridge.statsFreeCopy(df.localCheckpoint(eager = true))
}
