package graft.ext

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preference-data operators for RLHF / evaluation pipelines: turning a
  * log of pairwise outcomes ("a beat b") into per-item strength scores
  * via the Bradley–Terry model — the standard way chat-model
  * leaderboards and preference-reward datasets rank items from noisy
  * pairwise human judgments.
  */
object Preference {

  /** Bradley–Terry strengths from a pairwise-outcome log via `iters`
    * rounds of the classic MM (minorization–maximization) update
    * (Hunter 2004, doi:10.1214/aos/1079120141):
    *
    *   s_i ← W_i / Σ_j n_ij / (s_i + s_j),  normalized to Σ s = 1 once
    *   at the end (the map is homogeneous of degree 1, so per-round
    *   normalization changes nothing but costs a job per round)
    *
    * where W_i is item i's total wins and n_ij the number of
    * comparisons between i and j. Input: one row per decided
    * comparison (winnerCol, loserCol); ties must be dropped upstream
    * (the BT model has no tie outcome). Output: (item, wins, n_comp,
    * strength) over every item appearing in any comparison, strength
    * rounded to `roundTo` and summing to ~1.
    *
    * Items that never win keep strength 0 (the MM fixpoint for a
    * zero-win item) — the MLE diverges to −∞ for such items, and 0 is
    * the conventional boundary answer; regularize upstream (add a
    * pseudo-win per item) if a finite score is needed.
    *
    * Scale shape — [[Graph.pageRank]]'s exactly: the comparison log
    * aggregates ONCE to a symmetric per-pair count table (shuffle on
    * the pair key, map-side combine — the log itself is never touched
    * again) and a per-item win table; each MM round is then one join of
    * the pair table against current strengths (keyed shuffle on item) —
    * no driver collect and no normalizer job in the loop, lineage +
    * compounding stats cut per round by
    * [[graft.util.Iterate.checkpointCut]].
    * Cost per round is O(pairs), pairs ≤ items², typically ≪ log size.
    * Runs EXACTLY `iters` rounds (deterministic, oracle-reproducible —
    * the q94 contract). */
  /** Pair-count tables at or below this size run the MM loop on the
    * driver (one collect, zero per-round Spark jobs) instead of 10
    * rounds of keyed joins. The gate bounds driver memory the same way
    * [[Dedup]]'s connected-components union-find gate does: 100k pairs
    * ≈ a few MB collected, while the distributed loop at that size is
    * ~5 s of pure job-scheduling overhead (measured: 10 rounds over an
    * 8-item event-type table cost 5.5 s distributed, <1 s local). Real
    * leaderboards (items = models/documents, pairs ≤ items²) almost
    * always fit; a corpus-scale item set exceeds the gate and takes the
    * distributed loop unchanged. */
  val MaxLocalPairs = 100000

  def bradleyTerry(comparisons: DataFrame, winnerCol: String,
      loserCol: String, iters: Int = 10, roundTo: Int = 6,
      maxLocalPairs: Int = MaxLocalPairs): DataFrame = {
    require(iters > 0, "iters must be > 0")
    val comps = comparisons
      .select(col(winnerCol).as("__w"), col(loserCol).as("__l"))
      .filter(col("__w").isNotNull && col("__l").isNotNull &&
        col("__w") =!= col("__l"))
    // symmetric pair counts: every comparison appears under both
    // orientations so the denominator sum groups once on "__a"
    val pairs = comps
      .select(col("__w").as("__a"), col("__l").as("__b"))
      .unionByName(comps.select(col("__l").as("__a"), col("__w").as("__b")))
      .groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).cast("double").as("__n"))
      .persist()
    val wins = comps.groupBy(col("__w").as("item"))
      .agg(count(lit(1)).as("wins"))
    val items = pairs.select(col("__a").as("item"))
      .distinct()
      .join(wins, Seq("item"), "left")
      .select(col("item"), coalesce(col("wins"), lit(0L)).as("wins"))
      .persist()
    val nItems = items.count() // materializes both persisted tables
    require(nItems > 0, "no decided comparisons")

    // size-gated driver fast path: the MM loop over a collected pair
    // table (sorted — deterministic double summation order). Arithmetic
    // mirrors the distributed loop op-for-op (IEEE double division,
    // W/Σ, final Σs normalization, HALF_UP round via BigDecimal.valueOf
    // — Spark's own double-round semantics), so both paths agree to the
    // last ulp except for float-summation order, which sits far inside
    // the round(6) grid for MM fixpoint values.
    if (pairs.count() <= maxLocalPairs) {
      val spark = comparisons.sparkSession
      val itemRows = items.orderBy(col("item")).collect()
      val itemIdx: Map[Any, Int] =
        itemRows.iterator.map(_.get(0)).zipWithIndex.toMap
      val winsArr = itemRows.map(_.getLong(1))
      val pairRows = pairs.orderBy(col("__a"), col("__b")).collect()
      val pa = pairRows.map(r => itemIdx(r.get(0)))
      val pb = pairRows.map(r => itemIdx(r.get(1)))
      val pn = pairRows.map(_.getDouble(2))
      val n = itemRows.length
      var sLoc = Array.fill(n)(1.0 / n)
      for (_ <- 1 to iters) {
        val denom = new Array[Double](n)
        var k = 0
        while (k < pa.length) {
          denom(pa(k)) += pn(k) / (sLoc(pa(k)) + sLoc(pb(k)))
          k += 1
        }
        val next = new Array[Double](n)
        var i = 0
        while (i < n) {
          next(i) = winsArr(i).toDouble / denom(i)
          i += 1
        }
        sLoc = next
      }
      val z = sLoc.sum
      val nComp = new Array[Double](n)
      var k = 0
      while (k < pa.length) { nComp(pa(k)) += pn(k); k += 1 }
      val outRows = itemRows.indices.map { i =>
        val strength = java.math.BigDecimal.valueOf(sLoc(i) / z)
          .setScale(roundTo, java.math.RoundingMode.HALF_UP).doubleValue()
        org.apache.spark.sql.Row(
          itemRows(i).get(0), winsArr(i), nComp(i).toLong, strength)
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        items.schema("item"),
        org.apache.spark.sql.types.StructField("wins",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_comp",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("strength",
          org.apache.spark.sql.types.DoubleType, nullable = false)))
      val out = spark.createDataFrame(
        new java.util.ArrayList(outRows.asJava), schema)
      pairs.unpersist(); items.unpersist()
      return out
    }

    var s = graft.util.Iterate.checkpointCut(items.select(col("item"),
      lit(1.0 / nItems).as("__s")))
    // the MM map is homogeneous of degree 1 (scaling every strength by c
    // scales every update by c), so per-round normalization is pure
    // overhead — one extra aggregate + broadcast job per round. Iterate
    // UNNORMALIZED and divide by Σs once at the end: half the jobs per
    // round, and magnitudes stay O(1) (the update roughly conserves Σs —
    // Σ raw = Σ_i W_i/D_i with D_i built from strengths of the same
    // scale), so no overflow risk at any realistic iteration count.
    for (_ <- 1 to iters) {
      val denom = pairs
        .join(s.select(col("item").as("__a"), col("__s").as("__sa")),
          Seq("__a"))
        .join(s.select(col("item").as("__b"), col("__s").as("__sb")),
          Seq("__b"))
        .groupBy(col("__a").as("item"))
        .agg(sum(col("__n") / (col("__sa") + col("__sb"))).as("__d"))
      s = graft.util.Iterate.checkpointCut(items.join(denom, Seq("item"))
        .select(col("item"),
          (col("wins").cast("double") / col("__d")).as("__s")))
    }
    val z = s.agg(sum(col("__s")).as("__z"))
    val out = items
      .join(s, Seq("item"))
      .join(pairs.groupBy(col("__a").as("item"))
        .agg(sum(col("__n")).cast("long").as("n_comp")), Seq("item"))
      .crossJoin(broadcast(z))
      .select(col("item"), col("wins"), col("n_comp"),
        round(col("__s") / col("__z"), roundTo).as("strength"))
    // materialize while pairs/items are still cached, then release them
    val snap = graft.util.Caches.snapshot(out)
    pairs.unpersist(); items.unpersist()
    snap
  }
}
