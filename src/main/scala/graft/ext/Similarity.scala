package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Embedding similarity search (north-star; SURVEY §2.11): brute-force
  * cosine top-k as the exact baseline, and a random-hyperplane LSH bucketed
  * variant as the scale path (candidates restricted to same-bucket pairs —
  * the IVF/LSH family used in web-scale ANN).
  *
  * All vector math is higher-order-function Column algebra
  * (`zip_with`/`aggregate`) over `array<float>` cast to double — no UDFs,
  * deterministic sequential accumulation (left-to-right fold), which keeps
  * results bit-identical across partitionings and matches a sequential
  * oracle.
  */
object Similarity {

  /** Dot product in double: a native codegen'd Catalyst expression
    * (graft.functions.VecDot — primitive loop, no per-element lambda
    * interpretation/boxing). Accumulates left-to-right exactly like the
    * `aggregate(zip_with(...))` fold it replaces, so results are
    * bit-identical to the sequential oracle. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vec_dot(a, b)

  /** L2 norm in double. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** A vector is SCORABLE iff its (cached) norm is a finite positive
    * double. Spark's comparison semantics make `NaN > 0` TRUE and sort
    * NaN as the GREATEST double, so an unguarded NaN norm — one NaN
    * element anywhere in the vector — slips through a bare `> 0` guard,
    * scores sim = NaN, hijacks rank 1 of every descending top-k AND
    * passes every `sim >= minCos` dedup filter (mass wrong neighbors,
    * mass wrongful deletion at corpus scale). Null/empty/zero vectors
    * carry no direction; an infinite norm cannot rank meaningfully
    * either. One predicate excludes them all, evaluated on the
    * once-per-row norm. */
  private[ext] def scorable(n: Column): Column =
    n.isNotNull && !isnan(n) && n > 0 && n < Double.PositiveInfinity

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(scorable(na) && scorable(nb), d / (na * nb)).otherwise(lit(0.0))
  }

  /** Exact brute-force top-k: each query row against every candidate row.
    * The query side is broadcast (queries << corpus is the standard ANN
    * shape), so the corpus — the 100 TB side — never shuffles; per-partition
    * ranking then a final top-k per query via window. Norms are computed
    * once per row BEFORE the join (one higher-order-function pass per pair
    * instead of three). Similarities are rounded to `roundDigits` before
    * ranking so rank order is robust to last-ulp noise; ties break on
    * candidate id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      roundDigits: Int = 4): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"), norm(col(vecCol)).as("__qn"))
      .filter(scorable(col("__qn"))))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"), norm(col(vecCol)).as("__cn"))
      .filter(scorable(col("__cn")))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(
        when(col("__qn") > 0 && col("__cn") > 0,
          dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
          .otherwise(lit(0.0)),
        roundDigits))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** Deterministic pseudo-random unit hyperplanes (seeded), as literal
    * arrays baked into the plan — no driver-side randomness at execution. */
  private def planes(numPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Random-hyperplane LSH bucket id: bit i = sign(v · plane_i). */
  def lshBucket(vec: Column, numPlanes: Int, dim: Int, seed: Long = 42L): Column = {
    // bucket bits live in one LONG: past 64 planes shiftleft wraps
    // mod 64, colliding plane bits — buckets conflate and the
    // multi-probe "probe values are pairwise distinct" invariant breaks
    // (duplicate candidate pairs silently evict real top-k neighbors)
    require(numPlanes >= 1 && numPlanes <= 64,
      s"numPlanes must be in [1, 64], got $numPlanes")
    // generate the matrix once — regenerating per bit is O(numPlanes²·dim)
    // RNG draws at plan-build time
    val ps = planes(numPlanes, dim, seed)
    (0 until numPlanes).map { i =>
      val p = typedlit(ps(i))
      when(dot(vec, p) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** Approximate top-k: candidates limited to the query's LSH bucket (plus
    * Hamming-1 neighboring buckets via multi-probe when `multiProbe`), then
    * exact cosine rank within candidates. Trades recall for a candidate
    * set ~corpus/2^numPlanes per bucket; the join is a hash join on the
    * bucket key — no cross join at any scale.
    *
    * `broadcastQueries` only when the query side is genuinely small (the
    * point-lookup ANN shape): it keeps the corpus un-shuffled. For the
    * all-pairs shape (queries == corpus, e.g. embedding near-dup), leave it
    * false — broadcasting the full corpus ×(numPlanes+1) probe copies is
    * exactly the 100 TB scale-killer; a shuffle hash join on the bucket key
    * costs one co-partition of each side instead. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      numPlanes: Int = 8, dim: Int = 64, seed: Long = 42L,
      multiProbe: Boolean = true, roundDigits: Int = 4,
      broadcastQueries: Boolean = true,
      bucketOf: Column => Column = null): DataFrame = {
    // bucketOf overrides the hash family: pass v => signCells(v, numPlanes)
    // for the axis-aligned sign-bit LSH (projections onto the first
    // numPlanes basis vectors — a degenerate-but-valid hyperplane choice
    // that is SQL-expressible, so the whole probe/score/rank path can be
    // oracle-checked end to end; the seeded random-plane default remains
    // the production family). Multi-probe bit flips apply to either.
    val bucket =
      if (bucketOf != null) bucketOf(col(vecCol))
      else lshBucket(col(vecCol), numPlanes, dim, seed)
    // unscorable vectors (null/NaN — see [[scorable]]) would all hash
    // to bucket 0 (every sign test falls to the otherwise arm), pile up
    // there as skew AND outrank negative-cosine true neighbors at 0.0
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"), norm(col(vecCol)).as("__cn"), bucket.as("bucket"))
      .filter(scorable(col("__cn")))
    val qBase = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"), norm(col(vecCol)).as("__qn"), bucket.as("qbucket"))
      .filter(scorable(col("__qn")))
    // multi-probe: also search the numPlanes buckets at Hamming distance 1
    val q0 = qBase.withColumn("bucket", col("qbucket"))
    val q = if (!multiProbe) q0 else q0.unionByName(
      qBase.select(col("query_id"), col("__qv"), col("__qn"), col("qbucket"),
        explode(array((0 until numPlanes).map(i =>
          col("qbucket").bitwiseXOR(shiftleft(lit(1L), i))): _*)).as("bucket")))
    val qSide = if (broadcastQueries) broadcast(q.drop("qbucket"))
                else q.drop("qbucket")
    // no pair dedup needed: a corpus row lives in exactly ONE bucket and
    // a query's probe values (qbucket + single-bit XORs) are pairwise
    // distinct, so each (query, neighbor) pair joins at most once — a
    // dropDuplicates here would add a full shuffle of the scored set
    val scored = qSide.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(
        when(col("__qn") > 0 && col("__cn") > 0,
          dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
          .otherwise(lit(0.0)),
        roundDigits))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** Sign-bit coarse cells: bit i set when dimension i+1 is ≥ 0. A
    * trivial fully-deterministic quantizer — SQL-expressible, so the
    * [[clusterDupes]] oracle can reproduce the cells exactly; production
    * paths pass k-means cells instead ([[semDedup]]). Dimensions past the
    * vector's length contribute 0 (guarded — ANSI `element_at` would
    * error, not null, on short vectors). */
  def signCells(vec: Column, bits: Int): Column =
    (0 until bits).map(i =>
      when(size(vec) > i && element_at(vec, i + 1) >= 0, lit(1L << i))
        .otherwise(lit(0L)))
      .reduce(_ + _)

  /** SemDeDup-style semantic duplicates (Abbas et al. 2023,
    * arXiv:2303.09540): embeddings are partitioned into coarse cells and
    * every within-cell pair is scored with exact cosine; a doc is a
    * duplicate when some SMALLER-id doc in its cell has cosine ≥ `minCos`
    * (keep-min-id — deterministic regardless of partitioning; the paper's
    * keep-farthest-from-centroid rule is a one-line swap of the keep
    * side). Output: one row per dropped doc — (idCol, `dup_of` = smallest
    * matching id, `max_sim` = strongest smaller-id match).
    *
    * Scale: the corpus shuffles ONCE on the cell id; the quadratic
    * pairwise work is confined within cells — the paper's own design
    * (cell count grows with the corpus so cluster sizes stay bounded).
    * Norms are computed once per row before the self-join. Cross-cell
    * near-dups are missed by construction (the SemDeDup recall tradeoff). */
  def clusterDupes(corpus: DataFrame, idCol: String, vecCol: String,
      cell: Column, minCos: Double, roundDigits: Int = 4): DataFrame = {
    val base = corpus.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"), cell.as("__cell"))
      .withColumn("__n", norm(col("__v")))
      // a NaN-norm row would pass `sim >= minCos` for every cellmate
      // (NaN comparisons are TRUE under these guards' polarity) and
      // wrongfully delete them — unscorable vectors cannot be dup
      // evidence in either direction
      .filter(scorable(col("__n")))
    val a = base.select(col("__cell"), col("__id").as("__a"),
      col("__v").as("__va"), col("__n").as("__na"))
    val b = base.select(col("__cell"), col("__id").as("__b"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    a.join(b, Seq("__cell"))
      .filter(col("__a") < col("__b"))
      .withColumn("sim", round(
        when(col("__na") > 0 && col("__nb") > 0,
          dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
          .otherwise(lit(0.0)), roundDigits))
      .filter(col("sim") >= minCos)
      .groupBy(col("__b").as(idCol))
      .agg(min(col("__a")).as("dup_of"), max(col("sim")).as("max_sim"))
  }

  /** Survivors after [[clusterDupes]]: anti join on the dropped sliver
    * (duplicate-sized, broadcast-able in the common case). */
  def clusterDedup(corpus: DataFrame, idCol: String, vecCol: String,
      cell: Column, minCos: Double, roundDigits: Int = 4): DataFrame =
    corpus.join(
      clusterDupes(corpus, idCol, vecCol, cell, minCos, roundDigits)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** SemDeDup proper: cells from the IVF spherical k-means coarse
    * quantizer ([[Ivf.train]] — deterministic init, centroids driver-sized
    * by construction), dedup within them. Choose `k` ≈ corpus size /
    * target cluster size so per-cell pairwise cost stays bounded. */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
      minCos: Double, k: Int = 64, iters: Int = 3): DataFrame = {
    val m = Ivf.train(corpus, idCol, vecCol, k, iters)
    clusterDedup(corpus, idCol, vecCol,
      Ivf.cellId(col(vecCol).cast("array<double>"), m), minCos)
  }

  /** Incremental SemDeDup — the embedding analogue of
    * [[Dedup.incrementalNearDupMatches]]: match a DELTA against the kept
    * corpus without ever re-pairing kept×kept. A delta vector is a
    * duplicate when cosine ≥ `minCos` to ANY kept vector in its cell, or
    * to a smaller-id delta vector in its cell (in-batch dedup, keep-min-
    * id). Output: one row per dropped delta vector —
    * (idCol, dup_of = smallest matching id, max_sim, matched_kept).
    *
    * Per-call cost tracks |delta| × cell density: the kept side streams
    * through ONE hash join on the cell id (shuffled on its cells exactly
    * once per call — persist the kept projection with cells precomputed
    * across increments to amortize even that). The quantizer must be the
    * FIXED one the kept corpus was indexed with (retraining centroids
    * would silently re-cell the world). */
  def semDedupIncrement(kept: DataFrame, delta: DataFrame,
      idCol: String, vecCol: String, cell: Column, minCos: Double,
      roundDigits: Int = 4): DataFrame = {
    def prep(df: DataFrame) = df
      .select(col(idCol).as("__id"),
        col(vecCol).cast("array<double>").as("__v"), cell.as("__cell"))
      .withColumn("__n", norm(col("__v")))
      .filter(scorable(col("__n"))) // see [[scorable]]: NaN ≥ minCos
    val d = prep(delta)
    val candidates = prep(kept)
      .select(col("__cell"), col("__id").as("__a"), col("__v").as("__va"),
        col("__n").as("__na"))
      .withColumn("__kept", lit(true))
      .unionByName(d
        .select(col("__cell"), col("__id").as("__a"), col("__v").as("__va"),
          col("__n").as("__na"))
        .withColumn("__kept", lit(false)))
    candidates
      .join(d.select(col("__cell"), col("__id").as("__b"),
        col("__v").as("__vb"), col("__n").as("__nb")), Seq("__cell"))
      // kept beats any delta id; delta-vs-delta keeps the smaller id
      .filter(col("__kept") || col("__a") < col("__b"))
      .withColumn("sim", round(
        when(col("__na") > 0 && col("__nb") > 0,
          dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
          .otherwise(lit(0.0)), roundDigits))
      .filter(col("sim") >= minCos)
      .groupBy(col("__b").as(idCol))
      .agg(min(col("__a")).as("dup_of"), max(col("sim")).as("max_sim"),
        max(col("__kept")).as("matched_kept"))
  }

  /** Embedding-space drift between two vector corpora — the
    * representation-level release gate that pairs with
    * [[Diff.tokenDistributionDrift]] (token drift sees surface change;
    * centroid drift sees semantic change even under paraphrase, and a
    * norm shift flags an embedding-model version mix-up before any
    * ANN index is rebuilt against it).
    *
    * Output (one row): n_a, n_b, dim, avg_norm_a, avg_norm_b,
    * centroid_cosine (cosine of the two mean vectors; 0 if either
    * centroid is zero), centroid_l2 (euclidean distance between them).
    *
    * Scale: per-dim sums via posexplode + groupBy(pos) — the shuffled
    * frame is dim-sized after map-side combine, never corpus-sized;
    * row norms ride the scan ([[norm]] is the codegen'd VecDot);
    * corpus sizes and the final combine are single-row broadcast
    * cross-joins. Null/empty vectors are excluded from both the
    * centroid and the norm averages. */
  def embeddingDrift(a: DataFrame, b: DataFrame, vecCol: String,
      roundTo: Int = 6): DataFrame = {
    def side(df: DataFrame, tag: String): (DataFrame, DataFrame) = {
      // non-finite elements poison every per-dim sum and the norm
      // average (one NaN → every output metric NaN → the release gate
      // silently always-passes or always-fails). Finite-only here —
      // unlike the scoring paths' [[scorable]], ZERO vectors stay in:
      // they are legitimate mass that pulls the centroid
      val n0 = norm(col(vecCol))
      val rows = df.filter(col(vecCol).isNotNull &&
        size(col(vecCol)) > 0 && !isnan(n0) &&
        n0 < Double.PositiveInfinity)
      val meta = rows.agg(count(lit(1)).as(s"n_$tag"),
        max(size(col(vecCol))).cast(LongType).as(s"__dim_$tag"),
        avg(norm(col(vecCol))).as(s"__an_$tag"))
      val dims = rows
        .select(posexplode(col(vecCol)).as(Seq("pos", "__v")))
        .groupBy(col("pos"))
        .agg(sum(col("__v").cast(DoubleType)).as(s"__s_$tag"))
      (meta, dims)
    }
    // snapshot the 1-row metas: each is consumed twice (broadcast into
    // the per-dim means AND the final combine), and exchange reuse is
    // not guaranteed to dedupe the two broadcast subplans under AQE —
    // unsnapshotted, each corpus paid an extra full scan per call
    val (ma0, da) = side(a, "a")
    val (mb0, db) = side(b, "b")
    val ma = graft.util.Caches.snapshot(ma0)
    val mb = graft.util.Caches.snapshot(mb0)
    // per-dim means need the corpus sizes: broadcast the 1-row metas
    val dims = da.join(db, Seq("pos"), "full_outer")
      .na.fill(0.0, Seq("__s_a", "__s_b"))
      .crossJoin(broadcast(ma)).crossJoin(broadcast(mb))
      .select(
        (col("__s_a") / col("n_a").cast(DoubleType)).as("__ma"),
        (col("__s_b") / col("n_b").cast(DoubleType)).as("__mb"))
      .agg(sum(col("__ma") * col("__mb")).as("__ab"),
        sum(col("__ma") * col("__ma")).as("__aa"),
        sum(col("__mb") * col("__mb")).as("__bb"),
        // direct Σ(ma−mb)² — the expanded aa−2ab+bb form cancels to a
        // tiny NEGATIVE under FP when the centroids nearly coincide and
        // sqrt would NaN
        sum((col("__ma") - col("__mb")) * (col("__ma") - col("__mb")))
          .as("__d2"))
    ma.crossJoin(mb).crossJoin(broadcast(dims))
      .select(
        col("n_a"), col("n_b"),
        greatest(col("__dim_a"), col("__dim_b")).as("dim"),
        round(col("__an_a"), roundTo).as("avg_norm_a"),
        round(col("__an_b"), roundTo).as("avg_norm_b"),
        round(when(col("__aa") > 0.0 && col("__bb") > 0.0,
          col("__ab") / (sqrt(col("__aa")) * sqrt(col("__bb"))))
          .otherwise(lit(0.0)), roundTo).as("centroid_cosine"),
        round(sqrt(col("__d2")), roundTo).as("centroid_l2"))
  }
}
