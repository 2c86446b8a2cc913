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
    // per-row salt: a DETERMINISTIC content hash, never
    // monotonically_increasing_id. Salt placement doesn't change which
    // small-side row a skewed row matches — but a NONDETERMINISTIC salt
    // is not retry-safe: when the skewed frame is itself a shuffle
    // output (nondeterministic intra-partition row order), a partial
    // map-stage retry re-salts rows after some reducers already fetched
    // the first attempt's buckets, emitting a row twice or zero times
    // (the SPARK-23207 class of corruption; Spark's full-stage rollback
    // covers round-robin repartition, not arbitrary nondeterministic
    // keys). Content-hashing gives identical rows identical salts —
    // BIT-IDENTICAL duplicate floods collapse to one bucket; pre-
    // aggregate such feeds (count per row-value) before joining, which
    // is the right shape for them anyway. Map-typed columns are
    // unhashable and excluded.
    require(!skewed.columns.contains("__salt") &&
      !small.columns.contains("__salt"),
      "saltedJoin: input already carries a __salt column — rename it " +
        "(the internal salt would silently overwrite it)")
    val hashable = skewed.schema.fields
      .filterNot(_.dataType.catalogString.contains("map<"))
      .map(f => col(f.name)).toIndexedSeq
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(hashable: _*), lit(saltFactor.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
