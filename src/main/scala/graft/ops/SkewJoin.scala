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
    // BIT-IDENTICAL duplicate floods collapse to one bucket — use
    // [[saltedJoinPreAgg]] for such feeds (it collapses the flood
    // map-side before the join), and [[saltSkewHistogram]] to DETECT
    // the condition instead of discovering it as a straggler task.
    // Map-typed columns are unhashable and excluded.
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

  /** Duplicate-flood variant: BIT-IDENTICAL rows all content-hash to one
    * salt bucket, which silently reinstates the single-task straggler
    * [[saltedJoin]] exists to break. This path collapses identical rows
    * to (row, multiplicity) FIRST — a map-side-combining aggregation
    * that crushes the flood before it ever reaches the join — salts the
    * now-unique rows, joins, and re-expands each output row by its
    * multiplicity. Exact multiset semantics for the supported join
    * types: identical skewed rows match identical small-side rows, so
    * expansion after the join reproduces the plain join's output.
    * Requires every skewed column hashable (no map types — groupBy
    * would reject them). */
  def saltedJoinPreAgg(
      skewed: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(!skewed.schema.fields.exists(
      _.dataType.catalogString.contains("map<")),
      "saltedJoinPreAgg needs all skewed columns groupable (no map types)")
    require(!skewed.columns.contains("__dup") &&
      !small.columns.contains("__dup"),
      "saltedJoinPreAgg: input already carries a __dup column — rename it")
    val counted = skewed
      .groupBy(skewed.columns.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("__dup"))
    val joined = saltedJoin(counted, small, keys, saltFactor, joinType)
    joined
      .withColumn("__i", explode(sequence(lit(1L), col("__dup"))))
      .drop("__dup", "__i")
  }

  /** Salt-distribution diagnostic: for the `sampleFraction`-sampled hot
    * keys (those with ≥ `minRows` sampled rows), how many DISTINCT salt
    * buckets do their rows actually land in? A hot key whose
    * `distinct_salts` is near 1 is a duplicate flood — content-hash
    * salting cannot spread it (see [[saltedJoin]]'s salt note); route
    * it through [[saltedJoinPreAgg]]. Runs one sampled aggregation —
    * call it when tuning, not on every join. */
  def saltSkewHistogram(
      skewed: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      sampleFraction: Double = 0.001,
      minRows: Long = 100L): DataFrame = {
    val hashable = skewed.schema.fields
      .filterNot(_.dataType.catalogString.contains("map<"))
      .map(f => col(f.name)).toIndexedSeq
    skewed.sample(withReplacement = false, sampleFraction, seed = 42L)
      .withColumn("__salt",
        pmod(xxhash64(hashable: _*), lit(saltFactor.toLong)))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("sampled_rows"),
        countDistinct(col("__salt")).as("distinct_salts"))
      .where(col("sampled_rows") >= minRows)
      .orderBy(col("sampled_rows").desc)
  }
}
