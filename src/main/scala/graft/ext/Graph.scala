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
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
      .persist()
    // danglinghood is STATIC (out-degrees never change): stamp it on the
    // vertex set once and carry it through every rank snapshot, instead
    // of re-deriving it per iteration with an anti-join against outDeg
    // (r18 opt — one n-row join removed per iteration)
    val verts = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
      .join(outDeg.select(col("src").as("id"), lit(true).as("__hasout")),
        Seq("id"), "left")
      .select(col("id"), col("__hasout").isNull.as("__dang"))
      .persist()
    val n = verts.count() // also materializes the persisted frames
    require(n > 0, "empty graph")
    outDeg.count()

    var ranks = graft.util.Iterate.checkpointCut(
      verts.withColumn("rank", lit(1.0 / n)))
    // dangling mass of the CURRENT snapshot, maintained as a driver
    // scalar: each iteration's value is observed on the very checkpoint
    // action that materializes the snapshot (the connectedComponents
    // convergence trick) — no per-iteration aggregate job, no broadcast
    // subtree in the update plan. The initial mass is exact arithmetic:
    // every vertex holds 1/n.
    var dm = verts.filter(col("__dang")).count() * (1.0 / n)
    var used = 0
    var converged = false
    while (used < maxIters && !converged) {
      val contribs = e
        .join(ranks.select(col("id").as("src"), col("rank")), Seq("src"))
        .join(outDeg, Seq("src"))
        .select(col("dst").as("id"), (col("rank") / col("__deg")).as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__in"))
      val obs = org.apache.spark.sql.Observation(s"pr_dm_$used")
      val next = graft.util.Iterate.checkpointCut(verts
        .join(contribs, Seq("id"), "left")
        .select(col("id"), col("__dang"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("__in"), lit(0.0)) + lit(dm) / n))
            .as("rank"))
        .observe(obs, sum(when(col("__dang"), col("rank"))
          .otherwise(lit(0.0))).as("dm")))
      // getOrEmpty, not get (the CC rationale): the eager checkpoint has
      // already run the observed plan; if that action ever stops posting
      // metrics, fall back to one explicit aggregate over the cached
      // snapshot rather than hanging.
      dm = org.apache.spark.sql.graftbridge.Bridge.observedOrEmpty(obs)
        .get("dm") match {
          case Some(v: java.lang.Double) => v.doubleValue()
          case Some(v: java.lang.Number) => v.doubleValue()
          // anything else (null, absent, or a non-numeric surprise from
          // a metrics-plumbing change) takes the safe explicit-aggregate
          // path — a glitch there must degrade to one extra job, never
          // fail the whole pageRank with a NumberFormatException
          case _ =>
            next.filter(col("__dang"))
              .agg(coalesce(sum(col("rank")), lit(0.0)))
              .head().getDouble(0)
        }
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
    (ranks.select(col("id"), col("rank")), used)
  }

  /** Synchronous label propagation (Raghavan et al. 2007) over an
    * UNDIRECTED view of the edge list: every vertex starts labeled with
    * its own id, and each round simultaneously adopts the most frequent
    * label among its neighbors (ties → smallest label — the
    * deterministic variant; classic LPA breaks ties randomly and is
    * unreproducible). Runs EXACTLY `iters` rounds — the fixed-iteration
    * contract the cross-engine oracle unrolls; communities are the
    * label groups. The cheap community detector for near-dup/link
    * graphs where [[Dedup.connectedComponents]] is too coarse (CC merges
    * everything reachable; LPA splits weakly-bridged clusters).
    *
    * Vertex ids must be numeric (labels ride the same column, and the
    * argmax uses numeric negation for the tie order). Self-loops are
    * dropped (a self-vote frustrates propagation); parallel edges vote
    * with their multiplicity — pre-`distinct` the edge list if each
    * neighbor should vote once.
    *
    * Scale shape: per round, ONE shuffle to count (vertex, label) votes
    * + a keyed argmax via `max(struct(count, −label))` — no window, no
    * global sort, no collect. Lineage truncates per round
    * ([[graft.util.Iterate.checkpointCut]], the same plan-doubling fix
    * as PageRank/CC). Synchronous updates can oscillate on bipartite
    * structures — fixed `iters` bounds that by construction. */
  def labelPropagation(edges: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    val und = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
    val e2 = und.unionByName(
      und.select(col("dst").as("src"), col("src").as("dst"))).persist()
    // every endpoint appears as a src in the doubled list, so src alone
    // covers the vertex set
    val verts = e2.select(col("src").as("id")).distinct().persist()
    verts.count()
    var labels = graft.util.Iterate.checkpointCut(
      verts.select(col("id"), col("id").cast("long").as("label")))
    var i = 0
    while (i < iters) {
      val votes = e2
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"), col("label"))
        .agg(count(lit(1)).as("__c"))
      val best = votes.groupBy(col("id"))
        .agg(max(struct(col("__c"), (-col("label")).as("__nl"))).as("__b"))
        .select(col("id"), (-col("__b.__nl")).as("__new"))
      labels = graft.util.Iterate.checkpointCut(
        labels.join(best, Seq("id"), "left")
          .select(col("id"),
            coalesce(col("__new"), col("label")).as("label")))
      i += 1
    }
    e2.unpersist(); verts.unpersist()
    labels
  }

  /** Per-vertex triangle counts + local clustering coefficient over
    * the UNDIRECTED simple graph (self-loops dropped, parallel edges
    * collapsed): coeff(v) = 2·T(v)/(deg(v)·(deg(v)−1)) — how much of
    * v's neighborhood is itself connected. High-coefficient dense
    * pockets are communities/boilerplate rings; a high-degree
    * zero-coefficient vertex is a hub/spam signature that degree
    * screens alone can't separate from a genuine community member.
    *
    * Enumeration: canonical edges (u < v) joined twice with the
    * a < b < c ordering — every triangle materializes exactly once.
    * Shuffles: two edge-keyed hash joins + one per-vertex count; no
    * cross join. Cost is Σ_v deg(v)² in the worst case — on a
    * hub-heavy graph, screen pathological degrees first ([[degrees]]),
    * the same pre-thinning discipline as [[Dedup]]'s bucket caps.
    * Output: (id, degree, n_triangles, clustering_coeff) over ALL
    * vertices (triangle-free ones read 0 / 0.0; degree-1 vertices get
    * null coeff — no pair of neighbors to close). */
  def triangleStats(edges: DataFrame, roundTo: Int = 6): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
    val canon = und.select(
      least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .persist()
    canon.count()
    // a < b < c: (a,b) ⋈ (b,c) closes with (a,c)
    val tri = canon
      .join(canon.select(col("a").as("b"), col("b").as("c")), Seq("b"))
      .join(canon.select(col("a"), col("b").as("c")), Seq("a", "c"),
        "left_semi")
      .select(col("a"), col("b"), col("c"))
    val perVertex = tri.select(explode(array(col("a"), col("b"), col("c")))
        .as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
    val deg = canon.select(col("a").as("id"))
      .unionByName(canon.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
    val out = deg.join(perVertex, Seq("id"), "left")
      .na.fill(0L, Seq("n_triangles"))
      .select(col("id"), col("degree"), col("n_triangles"),
        round(when(col("degree") >= 2L,
          lit(2.0) * col("n_triangles").cast("double") /
            (col("degree").cast("double") *
              (col("degree").cast("double") - lit(1.0)))), roundTo)
          .as("clustering_coeff"))
    val snap = graft.util.Caches.snapshot(out)
    canon.unpersist(blocking = false)
    snap
  }

  /** In/out degree table — the cheap link-spam screen (pages with
    * pathological in-degree are boilerplate hubs; zero out-degree with
    * high in-degree is a sink). One shuffle per direction on the
    * vertex id. */
  def degrees(edges: DataFrame): DataFrame = {
    // null endpoints drop like every other Graph operator — a null key
    // never matches in the full_outer join, so unfiltered input emitted
    // TWO phantom id=null rows (one per side) instead of none
    val e = edges.filter(col("src").isNotNull && col("dst").isNotNull)
    val out = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("out_degree"))
    val in = e.groupBy(col("dst").as("id"))
      .agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
  }
}
