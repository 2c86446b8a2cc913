package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY §2.5 J5 / prompt: "salting for
  * skew"). AQE's skew-join handles most cases at runtime; explicit salting
  * remains the tool when one key dominates so heavily that even split
  * partitions of it overwhelm a task, or when AQE is unavailable
  * (streaming joins, deterministic plan requirements).
  *
  * Shape: the skewed (large) side gets a deterministic per-row salt in
  * [0, saltFactor); the small side is replicated saltFactor times; the join
  * key becomes (keys..., salt), spreading each hot key over saltFactor
  * tasks. Replication multiplies the small side's shuffle volume by
  * saltFactor — pick the smaller input as `right`.
  */
object SkewJoin {

  private val supportedJoinTypes =
    Set("inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi")

  def saltedJoin(
      skewed: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // right/full outer would emit one null-padded copy of each unmatched
    // small-side row PER SALT REPLICA — only join types whose unmatched
    // rows live on the (un-replicated) skewed side preserve plain-join
    // semantics
    require(supportedJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/left_semi joins, got $joinType")
    // per-row salt: hash of the whole row PLUS a per-row ordinal —
    // row-content alone would give identical rows identical salts, and
    // duplicate-heavy hot keys (50M copies of one event row) would all
    // land in a single salt bucket, recreating the straggler this
    // function exists to break. monotonically_increasing_id is stable
    // within a task attempt; salt placement does not affect join
    // RESULTS, only distribution, so retry-nondeterminism is harmless.
    val allCols = skewed.columns.map(col).toIndexedSeq
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(allCols :+ monotonically_increasing_id(): _*),
        lit(saltFactor.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
