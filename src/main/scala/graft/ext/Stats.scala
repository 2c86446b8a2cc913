package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Grouped statistical analysis operators: closed-form OLS regression,
  * robust (median/MAD) outlier detection, and chi-square independence —
  * the feature-screening half of a curation pipeline (does signal X
  * predict signal Y; which rows are anomalous under a robust location
  * estimate; are two categorical labelings associated or independent).
  *
  * All three are pure declarative aggregates (no UDF, no collect): one
  * or two keyed shuffles each, map-side combine everywhere, and exact
  * arithmetic where cross-engine parity demands it (decimal-cast sums
  * for fixed-point inputs, double ops on identical operands otherwise —
  * the repo's Q.scala oracle-parity rules).
  */
object Stats {

  /** Null-safe group join-back — see [[graft.util.Joins.nullSafeEqui]]
    * (one shared definition; empty groupCols degrade to the one-row
    * cross join, the global-profile shape). */
  private def nsJoin(l: DataFrame, r: DataFrame, keys: Seq[String],
      how: String = "inner", bcastRight: Boolean = true): DataFrame =
    graft.util.Joins.nullSafeEqui(l, r, keys, how, bcastRight)

  /** Per-group simple linear regression (closed form) of `yCol` on
    * `xCol`: slope, intercept, r², n.
    *
    * Sums (Σx, Σy, Σxy, Σx², Σy²) accumulate in DECIMAL cast from the
    * fixed-point input columns — exact and independent of partial-agg
    * order — then the regression algebra runs in double on those exact
    * operands:
    *   slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
    *   intercept = (Σy − slope·Σx) / n
    *   r² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))
    * Groups with zero x-variance emit null slope/intercept/r² (vertical
    * line); groups with zero y-variance emit r² = null too (the
    * quotient is 0/0 — no association to measure).
    *
    * `decimals` is the exact accumulation type; inputs must fit it
    * (default DECIMAL(18,2) — the monetary convention). Scale: ONE
    * shuffle on the group keys; everything else rides the scan.
    * Mirrors SQL REGR_SLOPE/REGR_INTERCEPT/REGR_R2 semantics. */
  def groupedOls(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String, decimals: DecimalType = DecimalType(18, 2),
      roundTo: Int = 6): DataFrame = {
    val x = col(xCol).cast(decimals)
    val y = col(yCol).cast(decimals)
    // complete pairs only: a null x or y row must drop from n too, or
    // the count disagrees with the sums it normalizes
    val agg = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(x).cast(DoubleType).as("__sx"),
      sum(y).cast(DoubleType).as("__sy"),
      sum(x * y).cast(DoubleType).as("__sxy"),
      sum(x * x).cast(DoubleType).as("__sxx"),
      sum(y * y).cast(DoubleType).as("__syy"))
    val nD = col("n").cast(DoubleType)
    val covN = nD * col("__sxy") - col("__sx") * col("__sy")
    val varXN = nD * col("__sxx") - col("__sx") * col("__sx")
    val varYN = nD * col("__syy") - col("__sy") * col("__sy")
    val slope = when(varXN =!= 0.0, covN / varXN)
    agg.select(groupCols.map(col) ++ Seq(
      col("n"),
      round(slope, roundTo).as("slope"),
      round(when(varXN =!= 0.0,
        (col("__sy") - slope * col("__sx")) / nD), roundTo).as("intercept"),
      round(when(varXN =!= 0.0 && varYN =!= 0.0,
        covN * covN / (varXN * varYN)), roundTo).as("r2")): _*)
  }

  /** Per-group robust outlier profile on `valueCol`: exact median, MAD
    * (median absolute deviation), and the count of rows whose robust
    * z-score |v − median| / (1.4826·MAD) exceeds `nSigmas`. The robust
    * pair (median, MAD) survives up to 50% contamination — mean/stddev
    * anomaly rules are themselves dragged by the outliers they hunt.
    *
    * Two quantile passes (median, then median of absolute deviations) —
    * two shuffles on the group keys, with the per-group medians joined
    * back as a broadcast (group cardinality is small by construction;
    * pass the data twice rather than sorting it once globally). Groups
    * with MAD = 0 (over half the values identical) count any deviation
    * from the median as an outlier — the standard convention. */
  def madOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      nSigmas: Double = 3.0, roundTo: Int = 6): DataFrame = {
    val gcols = groupCols.map(col)
    // nsJoin throughout: a null-key group's median/MAD exist (groupBy
    // kept the group) — a name-based equi-join would never match them
    // back and the group would VANISH from the profile
    val med = df.groupBy(gcols: _*)
      .agg(percentile(col(valueCol), lit(0.5)).as("__med"))
    val withMed = nsJoin(df, med, groupCols)
      .withColumn("__adev", abs(col(valueCol) - col("__med")))
    val mad = withMed.groupBy(gcols: _*)
      .agg(percentile(col("__adev"), lit(0.5)).as("__mad"))
    nsJoin(withMed, mad, groupCols)
      .groupBy(gcols: _*)
      .agg(
        count(lit(1)).as("n"),
        round(first(col("__med")), roundTo).as("median"),
        round(first(col("__mad")), roundTo).as("mad"),
        sum(when(
          (col("__mad") > 0.0 &&
            col("__adev") / (lit(1.4826) * col("__mad")) > nSigmas) ||
            (col("__mad") === 0.0 && col("__adev") > 0.0), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Robust per-group feature scaling: each row's value becomes its
    * robust z-score (v − median)/(1.4826·MAD) — the normalization that
    * [[madOutliers]] thresholds, exposed per row for feature pipelines
    * (outlier-resistant, unlike mean/stddev scaling which the outliers
    * themselves drag). Groups with MAD = 0 (over half the values
    * identical) yield null scores — there is no scale to divide by.
    * Same shape as madOutliers: two quantile passes, medians broadcast
    * back, the scaling itself rides the row scan.
    * Output: input columns + robust_z. */
  def robustScale(df: DataFrame, groupCols: Seq[String], valueCol: String,
      roundTo: Int = 6): DataFrame = {
    val gcols = groupCols.map(col)
    // nsJoin: null-key groups keep their rows (see madOutliers)
    val med = df.groupBy(gcols: _*)
      .agg(percentile(col(valueCol), lit(0.5)).as("__med"))
    val withMed = nsJoin(df, med, groupCols)
    val mad = withMed
      .withColumn("__adev", abs(col(valueCol) - col("__med")))
      .groupBy(gcols: _*)
      .agg(percentile(col("__adev"), lit(0.5)).as("__mad"))
    nsJoin(withMed, mad, groupCols)
      .withColumn("robust_z", round(
        when(col("__mad") > 0.0,
          (col(valueCol) - col("__med")) / (lit(1.4826) * col("__mad"))),
        roundTo))
      .drop("__med", "__mad")
  }

  /** Chi-square test of independence between two categorical columns:
    * one row with the statistic, degrees of freedom, and the table
    * shape. Uses the observed-cells identity
    *   χ² = n·(Σ_observed o²/(rowTot·colTot)) − n
    * so only the |observed cells| ≤ distinct(a)·distinct(b) frame is
    * ever materialized — unobserved cells' (0−e)²/e = e contributions
    * are folded in algebraically, never enumerated.
    *
    * Scale: one shuffle to count cells; margins re-aggregate from the
    * CELL frame (not the input) and join back broadcast — the input is
    * scanned exactly once. The final Σ is a double sum of ≤ cells
    * like-magnitude terms; `roundTo` sits far above the partial-agg
    * order noise (the repo q94 convention). */
  def chiSquareIndependence(df: DataFrame, aCol: String, bCol: String,
      roundTo: Int = 6): DataFrame = {
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__o"))
      .persist()
    val rowTot = cells.groupBy(col("__a"))
      .agg(sum(col("__o")).as("__ra"))
    val colTot = cells.groupBy(col("__b"))
      .agg(sum(col("__o")).as("__cb"))
    val out = cells
      .join(broadcast(rowTot), Seq("__a"))
      .join(broadcast(colTot), Seq("__b"))
      .agg(
        sum(col("__o")).as("__n"),
        countDistinct(col("__a")).as("__ka"),
        countDistinct(col("__b")).as("__kb"),
        sum(col("__o").cast(DoubleType) * col("__o").cast(DoubleType) /
          (col("__ra").cast(DoubleType) * col("__cb").cast(DoubleType)))
          .as("__s"))
      .select(
        col("__n").as("n"),
        col("__ka").as("n_rows"),
        col("__kb").as("n_cols"),
        ((col("__ka") - 1L) * (col("__kb") - 1L)).as("dof"),
        round(col("__n").cast(DoubleType) * col("__s") -
          col("__n").cast(DoubleType), roundTo).as("chi2"))
    // eager snapshot before releasing the cell cache (Caches contract)
    val snap = graft.util.Caches.snapshot(out)
    cells.unpersist(blocking = false)
    snap
  }

  /** Pairwise Pearson correlation matrix over `cols` in ONE aggregate
    * pass: a single row of moment sums (count, Σxᵢ, Σxᵢxⱼ — decimal,
    * exact, order-free) melts to one output row per unordered pair
    * with r = (nΣxy − ΣxΣy)/(√(nΣx² − (Σx)²)·√(nΣy² − (Σy)²)).
    * Listwise-complete: rows with a null in ANY profiled column are
    * excluded, so every pair shares the same n (the standard matrix
    * convention; run column pairs separately for pairwise-complete).
    * Zero-variance columns yield null r against everything. k columns
    * cost k(k+1)/2 sum expressions inside one scan — profile a bounded
    * column set. Output: (col_a, col_b, n, corr), a < b.
    *
    * `decimals = null` selects the double-precision fast path: moment
    * sums accumulate as raw doubles instead of exact decimals. Decimal
    * accumulation is the default because it is order-free — bit-
    * identical across partial-agg orders and across engines (the
    * oracle-parity requirement) — but each decimal multiply/add is
    * ~an order of magnitude costlier than a double fma. Profiling
    * use-cases that only read r to a few digits should pass null: the
    * result differs from exact only by partial-sum rounding noise far
    * below `roundTo` for well-conditioned data (it IS run-to-run
    * deterministic under a fixed partitioning, but not guaranteed
    * stable across partitionings — don't hash-compare it). */
  def correlationMatrix(df: DataFrame, cols: Seq[String],
      decimals: DecimalType = DecimalType(18, 2),
      roundTo: Int = 6): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val complete = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
    val k = cols.size
    val one =
      if (decimals == null) {
        // double fast path: raw double moment sums (see scaladoc)
        val sums =
          Seq(count(lit(1)).as("__n")) ++
            cols.map(c => sum(col(c).cast(DoubleType)).as(s"__s_$c")) ++
            (for { i <- cols.indices; j <- i until k } yield {
              val (a, b) = (cols(i), cols(j))
              sum(col(a).cast(DoubleType) * col(b).cast(DoubleType))
                .as(s"__p_${a}_$b")
            })
        complete.agg(sums.head, sums.tail: _*)
      } else {
        // exact path: one imperative 128-bit integer moment aggregate
        // over unscaled decimal values — bit-identical to the
        // sum(decimal·decimal) formulation (same integer arithmetic)
        // at a fraction of the per-row cost (no BigDecimal in the loop)
        // the unscaled-long moment buffer holds ≤ 18 digits: a wider
        // exact type cannot ride it (mid-scan overflow or silent row
        // drops) — fail loudly; wider domains take the double path
        require(decimals.precision <= 18,
          s"correlationMatrix exact path supports DECIMAL precision <= " +
            s"18, got $decimals — pass decimals = null for the double " +
            "fast path on wider domains")
        val m = graft.functions.DecimalMomentsAgg.moments(
          cols.map(c => col(c).cast(decimals)), decimals.scale)
        val named =
          Seq(element_at(col("__m"), 1).cast("long").as("__n")) ++
            cols.zipWithIndex.map { case (c, i) =>
              element_at(col("__m"), 2 + i).cast(DoubleType).as(s"__s_$c")
            } ++
            (for { i <- cols.indices; j <- i until k } yield {
              val (a, b) = (cols(i), cols(j))
              val p = i * k - i * (i - 1) / 2 + (j - i) // upper-tri offset
              element_at(col("__m"), 2 + k + p).cast(DoubleType)
                .as(s"__p_${a}_$b")
            })
        complete.agg(m.as("__m")).select(named: _*)
      }
    val nD = col("__n").cast(DoubleType)
    def varN(c: String): Column =
      nD * col(s"__p_${c}_$c") - col(s"__s_$c") * col(s"__s_$c")
    val entries = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield {
      val (a, b) = (cols(i), cols(j))
      val covN = nD * col(s"__p_${a}_$b") - col(s"__s_$a") * col(s"__s_$b")
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col("__n").as("n"),
        round(when(varN(a) > 0.0 && varN(b) > 0.0,
          covN / (sqrt(varN(a)) * sqrt(varN(b)))), roundTo).as("corr"))
    }
    one.select(explode(array(entries: _*)).as("e")).select("e.*")
  }

  /** Population stability index between a reference and a current
    * numeric population — the model-ops drift gate for numeric
    * features, completing the drift family ([[Diff.tokenDistributionDrift]]
    * tokens, [[Similarity.embeddingDrift]] vectors, this one scalars).
    * Bins are the reference's exact decile cuts (so "no drift" always
    * reads ~0.1 per reference bin regardless of the distribution's
    * shape); PSI = Σ (p_cur − p_ref)·ln(p_cur/p_ref), with shares
    * floored at `floorShare` so empty bins contribute a large-but-
    * finite penalty (the standard convention; PSI > 0.25 ⇒ drifted).
    *
    * Output: one row per bin (bin 1..`bins`, n_ref, n_cur, p_ref,
    * p_cur, contrib) with the total `psi` repeated on each row.
    *
    * Scale bound: the reference cuts use Spark's EXACT `percentile`,
    * whose single-group aggregation state is O(distinct values) — fine
    * for bounded-domain features (scores, amounts at fixed scale), but
    * a continuous double over a 100 TB reference concentrates billions
    * of (value, count) entries in one final-merge buffer. There, draw
    * the cuts from a mergeable KLL sketch instead
    * ([[graft.functions.KllSketchAgg]] — bounded bytes at ~1% rank
    * error; bin SHARES stay exact either way, only cut placement is
    * approximate) and pass them through a pre-cut binning variant.
    *
    * Scale: the cut points are ONE bounded driver collect (bins−1
    * doubles — the IVF-centroid pattern); binning is a literal
    * comparison chain riding both scans; shares are one keyed
    * aggregate per side. Null values are excluded. */
  def populationStability(ref: DataFrame, cur: DataFrame, valueCol: String,
      bins: Int = 10, floorShare: Double = 1e-6,
      roundTo: Int = 6): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val probs = (1 until bins).map(_.toDouble / bins)
    val cutsRow = ref
      .filter(col(valueCol).isNotNull)
      .agg(percentile(col(valueCol).cast(DoubleType),
        typedlit(probs)).as("c"))
      .head()
    // loud empties: an empty/all-null side has no distribution — the
    // raw failure was a bare NPE on the null percentile result (ref) or
    // an ANSI 0/0 in the share division (cur), neither of which names
    // the real problem to the on-call reader
    require(!cutsRow.isNullAt(0),
      s"populationStability: reference side has no non-null '$valueCol' " +
        "rows — no distribution to draw bin cuts from")
    val cuts: Seq[Double] = cutsRow.getSeq[Double](0)
    def binOf: Column = cuts.foldLeft(lit(1)) { (acc, c) =>
      acc + when(col(valueCol).cast(DoubleType) > c, 1).otherwise(0)
    }
    def shares(df: DataFrame, tag: String): DataFrame =
      df.filter(col(valueCol).isNotNull)
        .groupBy(binOf.as("bin")).agg(count(lit(1)).as(s"n_$tag"))
    val spark = ref.sparkSession
    val scaffold = spark.range(1, bins + 1)
      .select(col("id").cast("int").as("bin"))
    val joined = scaffold
      .join(shares(ref, "ref"), Seq("bin"), "left")
      .join(shares(cur, "cur"), Seq("bin"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .persist()
    joined.count()
    val tot = joined.agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"))
    val withShares = joined.crossJoin(broadcast(tot))
      // an EMPTY current side (today's partition has zero rows — the
      // exact condition a drift monitor exists to catch) would make the
      // share an ANSI 0/0 crash; floor every bin's share instead, which
      // reports the MAXIMUM drift the floor allows — loud in the metric,
      // not in a stack trace. Same guard on ref for symmetry (already
      // require()d non-empty above, belt and braces).
      .withColumn("__pr", greatest(
        when(col("__tr") > 0,
          col("n_ref").cast(DoubleType) / col("__tr").cast(DoubleType)),
        lit(floorShare)))
      .withColumn("__pc", greatest(
        when(col("__tc") > 0,
          col("n_cur").cast(DoubleType) / col("__tc").cast(DoubleType)),
        lit(floorShare)))
      .withColumn("__contrib",
        (col("__pc") - col("__pr")) * log(col("__pc") / col("__pr")))
    val psi = withShares.agg(sum(col("__contrib")).as("__psi"))
    val out = withShares.crossJoin(broadcast(psi))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(col("__pr"), roundTo).as("p_ref"),
        round(col("__pc"), roundTo).as("p_cur"),
        round(col("__contrib"), roundTo).as("contrib"),
        round(col("__psi"), roundTo).as("psi"))
    val snap = graft.util.Caches.snapshot(out)
    joined.unpersist(blocking = false)
    snap
  }

  /** Welch's two-sample t-test between `groupA` and `groupB` of
    * `groupCol` on `valueCol`: difference in means over the unpooled
    * standard error, with Welch–Satterthwaite degrees of freedom — the
    * A/B-experiment primitive that doesn't assume equal variances.
    * Sums and sums-of-squares accumulate in DECIMAL (exact, order-free)
    * from the fixed-point input; the t/df algebra runs in double on
    * those exact operands. Output (one row): n_a, n_b, mean_a, mean_b,
    * var_a, var_b (sample variances), t_stat, df. Groups with fewer
    * than 2 rows or zero variance in both yield null t/df. One shuffle
    * on the group key. */
  def welchTTest(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String,
      decimals: DecimalType = DecimalType(18, 2),
      roundTo: Int = 6): DataFrame = {
    val v = col(valueCol).cast(decimals)
    val agg = df.filter(col(groupCol).isin(groupA, groupB) &&
        col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(v).cast(DoubleType).as("s"),
        sum(v * v).cast(DoubleType).as("ss"))
      .withColumn("m", col("s") / col("n").cast(DoubleType))
      .withColumn("var", when(col("n") > 1L,
        (col("n").cast(DoubleType) * col("ss") - col("s") * col("s")) /
          (col("n").cast(DoubleType) *
            (col("n").cast(DoubleType) - lit(1.0)))))
    val a = agg.filter(col(groupCol) === groupA)
      .select(col("n").as("n_a"), col("m").as("__ma"),
        col("var").as("__va"))
    val b = agg.filter(col(groupCol) === groupB)
      .select(col("n").as("n_b"), col("m").as("__mb"),
        col("var").as("__vb"))
    val sa = col("__va") / col("n_a").cast(DoubleType)
    val sb = col("__vb") / col("n_b").cast(DoubleType)
    val se2 = sa + sb
    a.crossJoin(b).select(
      col("n_a"), col("n_b"),
      round(col("__ma"), roundTo).as("mean_a"),
      round(col("__mb"), roundTo).as("mean_b"),
      round(col("__va"), roundTo).as("var_a"),
      round(col("__vb"), roundTo).as("var_b"),
      round(when(se2 > 0.0,
        (col("__ma") - col("__mb")) / sqrt(se2)), roundTo).as("t_stat"),
      round(when(se2 > 0.0,
        se2 * se2 / (sa * sa / (col("n_a").cast(DoubleType) - lit(1.0)) +
          sb * sb / (col("n_b").cast(DoubleType) - lit(1.0)))), roundTo)
        .as("df"))
  }

  /** Per-group concentration profile of a non-negative measure: Gini
    * coefficient (rank formula over the group's sorted values), HHI
    * (Herfindahl — Σ shareᵢ², the antitrust/market-concentration
    * index) and Shannon entropy of the share distribution — "is this
    * segment's revenue three customers or three thousand", "is this
    * corpus one source in a trench coat".
    *
    * All three come from ONE window pass (the rank — ties commute, the
    * rank·value sum is tie-order invariant) + ONE keyed aggregate:
    * entropy uses the identity −Σ(v/S)ln(v/S) = ln S − (Σ v·ln v)/S so
    * no per-row share (and no second pass over the group) is needed.
    * Value and rank·value sums accumulate in DECIMAL (exact); the
    * index algebra runs in double. Rows with null/negative values are
    * excluded; all-zero groups yield null indices (no mass to
    * concentrate). Output: keys*, n, total, gini, hhi, entropy. */
  def concentration(df: DataFrame, groupCols: Seq[String],
      valueCol: String, decimals: DecimalType = DecimalType(18, 2),
      roundTo: Int = 6): DataFrame = {
    val gcols = groupCols.map(col)
    val vd = col(valueCol).cast(decimals)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*).orderBy(col(valueCol).cast(DoubleType))
    val ranked = df
      .filter(col(valueCol).isNotNull && col(valueCol) >= 0)
      .withColumn("__i", row_number().over(w))
    val agg = ranked.groupBy(gcols: _*).agg(
      count(lit(1)).as("n"),
      sum(vd).cast(DoubleType).as("__s"),
      sum(col("__i") * vd).cast(DoubleType).as("__siv"),
      sum(vd * vd).cast(DoubleType).as("__sv2"),
      sum(when(col(valueCol) > 0,
        col(valueCol).cast(DoubleType) *
          log(col(valueCol).cast(DoubleType))).otherwise(0.0))
        .as("__svlv"))
    val nD = col("n").cast(DoubleType)
    agg.select(gcols ++ Seq(
      col("n"),
      col("__s").as("total"),
      round(when(col("__s") > 0.0,
        lit(2.0) * col("__siv") / (nD * col("__s")) -
          (nD + lit(1.0)) / nD), roundTo).as("gini"),
      round(when(col("__s") > 0.0,
        col("__sv2") / (col("__s") * col("__s"))), roundTo).as("hhi"),
      round(when(col("__s") > 0.0,
        log(col("__s")) - col("__svlv") / col("__s")), roundTo)
        .as("entropy")): _*)
  }

  /** Weight-of-evidence binning + information value — the
    * credit-scoring feature transform: equal-frequency bins of
    * `valueCol` (the population's own exact quantile cuts, the
    * [[populationStability]] machinery), and per bin the
    * Laplace-smoothed log-odds of the boolean `labelCol`:
    *   woe_i = ln(ps_i / ns_i),  iv = Σ (ps_i − ns_i)·woe_i
    * with ps_i = (pos_i + ½)/(posTot + ½·bins) (and ns likewise) — the
    * smoothing makes empty/pure bins finite and deterministic. IV reads
    * on the usual scale: < 0.02 useless, > 0.3 strong.
    *
    * Output: one row per bin (bin, n, n_pos, n_neg, woe, iv_contrib)
    * with the total `iv` repeated. Null values/labels are excluded.
    * Same scale shape as PSI: one bounded cut collect, binning rides
    * the scan, one cell aggregate. */
  def weightOfEvidence(df: DataFrame, valueCol: String, labelCol: String,
      bins: Int = 10, roundTo: Int = 6): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val eligible = df.filter(col(valueCol).isNotNull &&
      col(labelCol).isNotNull)
    val probs = (1 until bins).map(_.toDouble / bins)
    val cutsRow = eligible
      .agg(percentile(col(valueCol).cast(DoubleType),
        typedlit(probs)).as("c"))
      .head()
    // loud empty (the populationStability discipline): an input with no
    // complete (value, label) pair has no distribution to cut — the raw
    // failure was a bare NPE on the null percentile row
    require(!cutsRow.isNullAt(0),
      s"weightOfEvidence: no rows with non-null '$valueCol' AND " +
        s"'$labelCol' — no distribution to draw bin cuts from")
    val cuts: Seq[Double] = cutsRow.getSeq[Double](0)
    val binOf = cuts.foldLeft(lit(1)) { (acc, c) =>
      acc + when(col(valueCol).cast(DoubleType) > c, 1).otherwise(0)
    }
    val cells = eligible
      .groupBy(binOf.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L))
          .as("n_pos"))
      .withColumn("n_neg", col("n") - col("n_pos"))
    val scaffold = df.sparkSession.range(1, bins + 1)
      .select(col("id").cast("int").as("bin"))
    val full = scaffold.join(cells, Seq("bin"), "left")
      .na.fill(0L, Seq("n", "n_pos", "n_neg"))
      .persist()
    full.count()
    val tot = full.agg(sum(col("n_pos")).as("__tp"),
      sum(col("n_neg")).as("__tn"))
    val ps = (col("n_pos").cast(DoubleType) + lit(0.5)) /
      (col("__tp").cast(DoubleType) + lit(0.5 * bins))
    val ns = (col("n_neg").cast(DoubleType) + lit(0.5)) /
      (col("__tn").cast(DoubleType) + lit(0.5 * bins))
    val withWoe = full.crossJoin(broadcast(tot))
      .withColumn("__woe", log(ps / ns))
      .withColumn("__ivc", (ps - ns) * log(ps / ns))
    val iv = withWoe.agg(sum(col("__ivc")).as("__iv"))
    val out = withWoe.crossJoin(broadcast(iv))
      .select(col("bin"), col("n"), col("n_pos"), col("n_neg"),
        round(col("__woe"), roundTo).as("woe"),
        round(col("__ivc"), roundTo).as("iv_contrib"),
        round(col("__iv"), roundTo).as("iv"))
    val snap = graft.util.Caches.snapshot(out)
    full.unpersist(blocking = false)
    snap
  }

  /** Recency-weighted (exponentially decayed) per-key aggregate — the
    * behavioral-feature staple ("how active is this user, counting
    * yesterday more than last month"): each row contributes
    * value · 0.5^((asOf − ts)/halfLife), summed per key. `asOfEpochSec`
    * is an explicit parameter, NOT wall clock — the score is a pure
    * function of its inputs (reproducible backfills; pass the batch's
    * watermark). Rows after `asOf` are excluded (their weight would
    * exceed 1 — a leak from the future). One shuffle on the keys.
    * Output: keys*, n, decayed_sum, last_ts. */
  def decayedSum(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String, halfLifeDays: Double, asOfEpochSec: Long,
      roundTo: Int = 6): DataFrame = {
    require(halfLifeDays > 0, "halfLifeDays must be > 0")
    val age = lit(asOfEpochSec).cast(DoubleType) -
      col(tsCol).cast("long").cast(DoubleType)
    val w = pow(lit(0.5), age / lit(halfLifeDays * 86400.0))
    df.filter(col(tsCol).isNotNull &&
        col(tsCol).cast("long") <= asOfEpochSec &&
        col(valueCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        round(sum(col(valueCol).cast(DoubleType) * w), roundTo)
          .as("decayed_sum"),
        max(col(tsCol)).as("last_ts"))
  }

  /** Benford's-law deviation screen (the classic fabricated-amounts
    * test): per group, the observed leading-significant-digit
    * distribution of |valueCol| against Benford's p(d) = log₁₀(1+1/d),
    * with the group's χ² goodness-of-fit repeated on each digit row —
    * naturally-grown monetary amounts follow Benford closely; invented
    * ones (structuring, padding) don't. Rows with null/zero values
    * carry no leading digit and are excluded.
    *
    * Output: (groupCols*, digit 1-9, n_d, p_obs, p_exp, chi2) — digits
    * with zero observations still appear (their (0−np)²/np term is part
    * of χ², and their absence IS signal), via a group × 1-9 frame the
    * observed counts left-join into.
    *
    * Scale: leading-digit extraction is pure arithmetic riding the
    * scan (floor(v/10^floor(log₁₀ v)) — no string formatting); one
    * shuffle to count (group, digit) cells; the digit scaffold and χ²
    * join back broadcast (9 × |groups| rows). */
  def benfordDeviation(df: DataFrame, groupCols: Seq[String],
      valueCol: String, roundTo: Int = 6): DataFrame = {
    val gcols = groupCols.map(col)
    val v = abs(col(valueCol).cast(DoubleType))
    val digit = floor(v / pow(lit(10.0), floor(log10(v)))).cast("int")
    // persisted: the cell counts feed the group totals, the scaffold
    // join and (via `full`) the χ² aggregate — uncached, the raw scan +
    // digit extraction would re-run per branch. Cells are 9 × |groups|
    // at most; the result materialization below releases the cache.
    // NaN passes `v > 0.0` (NaN compares greater) and ±Infinity passes
    // it outright; both make the digit arithmetic NaN — an ANSI
    // int-cast crash for one bad value, or silent digit-0 cells that
    // inflate n and skew every χ² without ANSI. Finite-only.
    val cells = df.filter(col(valueCol).isNotNull && v > 0.0 &&
        !isnan(v) && v < Double.PositiveInfinity)
      .groupBy(gcols :+ digit.as("digit"): _*)
      .agg(count(lit(1)).as("n_d"))
      .persist()
    cells.count()
    // group × digit scaffold so zero-observation digits surface
    val groups = cells.groupBy(gcols: _*).agg(sum(col("n_d")).as("n"))
    val scaffold = groups.crossJoin(broadcast(
      df.sparkSession.range(1, 10).select(col("id").cast("int").as("digit"))))
    val pExp = log10(lit(1.0) + lit(1.0) / col("digit").cast(DoubleType))
    // nsJoin: the null-key group's scaffold rows must match its observed
    // cells back (digit is non-null on both sides; the group keys are
    // the null-safe part) — a name join would zero-fill every digit of
    // a REAL null-key group and null its χ²
    val full = nsJoin(scaffold, cells, groupCols :+ "digit",
        how = "left", bcastRight = false)
      .na.fill(0L, Seq("n_d"))
      .withColumn("__pexp", pExp)
    val chi2 = full.groupBy(gcols: _*)
      .agg(sum(
        (col("n_d").cast(DoubleType) - col("n").cast(DoubleType) * col("__pexp")) *
          (col("n_d").cast(DoubleType) - col("n").cast(DoubleType) * col("__pexp")) /
          (col("n").cast(DoubleType) * col("__pexp"))).as("__chi2"))
    val out = nsJoin(full, chi2, groupCols)
      .select(gcols ++ Seq(col("digit"), col("n_d"),
        round(col("n_d").cast(DoubleType) / col("n").cast(DoubleType),
          roundTo).as("p_obs"),
        round(col("__pexp"), roundTo).as("p_exp"),
        round(col("__chi2"), roundTo).as("chi2")): _*)
    val snap = graft.util.Caches.snapshot(out)
    cells.unpersist(blocking = false)
    snap
  }
}
