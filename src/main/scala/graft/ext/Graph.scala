package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph operators for web-corpus curation. PageRank is the
  * classic link-quality signal (harmonic/centrality variants follow the
  * same shape): pages linked by high-rank pages rank high, and the rank
  * feeds document quality weighting the same way the classifier score
  * does.
  */
object Graph {

  /** PageRank over a directed edge list (src, dst), `iters` power
    * iterations at `damping`. Returns (id, rank) over ALL vertices
    * (sources ∪ destinations); ranks sum to 1.
    *
    * Scale shape: each iteration is ONE keyed shuffle (contributions
    * grouped by destination) plus a broadcast of the single-row
    * dangling-mass aggregate — dangling pages (no out-links) spread
    * their mass evenly instead of leaking it, so the distribution stays
    * normalized without any driver-side collect in the loop. Lineage
    * AND compounding size stats truncate per iteration via
    * [[graft.util.Iterate.checkpointCut]] (the same
    * plan-doubling fix as [[Dedup.connectedComponents]]); cost is one
    * materialization per iteration, which IS the power-iteration
    * minimum. Degrees and vertices are computed once and persisted
    * across iterations. Runs EXACTLY `iters` rounds — the
    * fixed-iteration contract the cross-engine oracle reproduces; for
    * convergence-gated early stop use [[pageRankConverged]]. */
  def pageRank(edges: DataFrame, iters: Int = 10,
      damping: Double = 0.85): DataFrame =
    pageRankConverged(edges, iters, damping, tol = 0.0)._1

  /** [[pageRank]] with an optional convergence gate: when `tol > 0`,
    * stop as soon as an iteration moves no vertex by more than `tol`
    * (max-norm of the rank delta — an observed per-iteration metric,
    * the same early-exit trick as [[Dedup.connectedComponents]]).
    * Returns (ranks, iterations actually run). The delta check is one
    * extra aggregate per iteration over the two already-materialized
    * rank snapshots, and is skipped entirely at `tol = 0`, which runs
    * exactly `maxIters` rounds (deterministic, oracle-reproducible). */
  def pageRankConverged(edges: DataFrame, maxIters: Int = 10,
      damping: Double = 0.85, tol: Double = 0.0): (DataFrame, Int) = {
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .persist()
    val verts = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct().persist()
    val n = verts.count() // also materializes the persisted frames
    require(n > 0, "empty graph")
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
      .persist()
    outDeg.count()

    var ranks = graft.util.Iterate.checkpointCut(
      verts.withColumn("rank", lit(1.0 / n)))
    var used = 0
    var converged = false
    while (used < maxIters && !converged) {
      val contribs = e
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(outDeg, Seq("src"))
        .select(col("dst").as("id"), (col("rank") / col("__deg")).as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__in"))
      // dangling mass = rank held by vertices with no out-edges — a
      // single-row aggregate broadcast into the update (no collect)
      val dangling = ranks
        .join(outDeg.withColumnRenamed("src", "id"), Seq("id"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dm"))
      val next = graft.util.Iterate.checkpointCut(verts
        .join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("__in"), lit(0.0)) + col("__dm") / n))
            .as("rank")))
      used += 1
      if (tol > 0) {
        // both sides are materialized checkpoints — the delta join scans
        // 2n cached rows, no recompute
        converged = next.join(
            ranks.select(col("id"), col("rank").as("__prev")), Seq("id"))
          .agg(max(abs(col("rank") - col("__prev"))).as("__d"))
          .head().getDouble(0) <= tol
      }
      ranks = next
    }
    e.unpersist(); verts.unpersist(); outDeg.unpersist()
    (ranks, used)
  }

  /** In/out degree table — the cheap link-spam screen (pages with
    * pathological in-degree are boilerplate hubs; zero out-degree with
    * high in-degree is a sink). One shuffle per direction on the
    * vertex id. */
  def degrees(edges: DataFrame): DataFrame = {
    val out = edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("out_degree"))
    val in = edges.groupBy(col("dst").as("id"))
      .agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
  }
}
