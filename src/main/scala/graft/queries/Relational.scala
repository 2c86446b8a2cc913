package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.io.Upsert
import graft.ops.Transforms
import graft.dq.{DataQualityChecker, Severity}
import Q._

/** Core relational operator coverage (SURVEY §2.4–§2.8): scan+filter+project
  * with pushdown, aggregation, broadcast dim joins, window dedup, surrogate
  * keys, top-k, set ops, semi/anti joins, MERGE, rollup, DQ report & split.
  */
object Relational {

  type QFn = (SparkSession, String) => DataFrame

  val queries: Map[String, QFn] = Map(
    // Per-group closed-form OLS (price on quantity per return flag):
    // decimal-exact sums, double algebra on identical operands — slope/
    // intercept/r² all hash-checked vs the oracle's REGR_* closed form.
    "q120_grouped_ols" -> ((s, dir) => {
      graft.ext.Stats.groupedOls(t(s, dir, "lineitem"),
          Seq("l_returnflag"), "l_quantity", "l_extendedprice")
        .orderBy(col("l_returnflag"))
    }),

    // Chi-square independence of lang × source over documents: one
    // cell-count shuffle, margins from the cell frame, unobserved cells
    // folded in algebraically (χ² = n·Σo²/(ra·cb) − n).
    "q122_chi_square" -> ((s, dir) => {
      graft.ext.Stats.chiSquareIndependence(t(s, dir, "documents"),
        "lang", "source")
    }),

    // Benford's-law screen on order totals per priority class: leading
    // significant digit via pure arithmetic (no string formatting),
    // zero-observation digits scaffolded in, per-group χ² GOF repeated
    // on each digit row. The fraud-analytics classic — hash-checked.
    "q127_benford" -> ((s, dir) => {
      graft.ext.Stats.benfordDeviation(t(s, dir, "orders"),
          Seq("o_orderpriority"), "o_totalprice")
        .orderBy(col("o_orderpriority"), col("digit"))
    }),

    // FD discovery over nation's columns: n_nationkey → n_name holds
    // exactly (key → attribute), n_regionkey → n_name is far from an FD
    // — every pair's group/violation counts and g3 strength
    // hash-checked.
    "q129_fd_profile" -> ((s, dir) => {
      graft.ext.Profile.functionalDependencies(t(s, dir, "nation"),
          Seq("n_nationkey", "n_name", "n_regionkey"))
        .orderBy(col("determinant"), col("dependent"))
    }),

    // Pairwise Pearson matrix over the four lineitem measures in ONE
    // aggregate pass (decimal-exact moments melted to pair rows).
    // Every coefficient hash-checked.
    "q135_correlation_matrix" -> ((s, dir) => {
      graft.ext.Stats.correlationMatrix(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy(col("col_a"), col("col_b"))
    }),

    // Revenue concentration per priority class: Gini + HHI + share
    // entropy from one window pass + one aggregate. Hash-checked.
    "q141_concentration" -> ((s, dir) => {
      graft.ext.Stats.concentration(t(s, dir, "orders"),
          Seq("o_orderpriority"), "o_totalprice")
        .orderBy(col("o_orderpriority"))
    }),

    // Q1-style pricing summary: one shuffle on the two low-cardinality group
    // keys; exact decimal money math (Q.dsum).
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          revenueSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1)).cast(DoubleType)).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Q6-style selective filter: predicates + 3-column projection reach the
    // parquet scan (PushedFilters/ReadSchema) — the pushdown showcase.
    "q02_filter_pushdown" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(
          sum(dmul(col("l_extendedprice"), col("l_discount")))
            .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // Q3-style shipping priority: two shuffle joins pruned by selective
    // filters; top-10 via TakeOrderedAndProject (no full sort).
    "q03_top_orders" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Dimension snowflake: fact shuffles once; nation/region are broadcast.
    "q04_dim_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_acctbal"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // WF1 keyed dedup keep-latest, PK tie-breaker for determinism.
    "q05_dedup_latest" -> ((s, dir) => {
      Transforms.deduplicateByKey(
        t(s, dir, "orders"), Seq("o_custkey"), "o_orderdate",
        ascending = false, tieBreakers = Seq("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate"))
        .orderBy(col("o_custkey"))
    }),

    // WF2 surrogate key — reference-faithful global window (dimension-sized).
    "q06_surrogate_key" -> ((s, dir) => {
      Transforms.addSurrogateKey(t(s, dir, "nation"), "nation_sk", Seq("n_name"))
        .select(col("n_nationkey"), col("n_name"), col("nation_sk"))
        .orderBy(col("nation_sk"))
    }),

    // WF2 at scale: two-phase partition-offset surrogate keys (same output).
    "q06b_surrogate_scalable" -> ((s, dir) => {
      Transforms.addSurrogateKeyScalable(
        t(s, dir, "customer"), "customer_sk", Seq("c_custkey"))
        .select(col("c_custkey"), col("customer_sk"))
        .orderBy(col("customer_sk"))
    }),

    // O1 top-k: group + TakeOrderedAndProject.
    "q07_daily_topk" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy(col("n_events").desc, col("day").desc)
        .limit(7)
    }),

    // Exact content dedup: group on md5, deterministic survivor.
    "q08_exact_dedup" -> ((s, dir) => {
      graft.ext.Dedup.exactDedup(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("text_hash"))
    }),

    // A4 distinct counts (exact; HLL variant is q09b, rows-only).
    "q09_distinct_stats" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"))
    }),

    // A4 at 100 TB: HLL sketches — no exact-distinct shuffle. The sketch
    // ESTIMATES are engine-specific, so the hashed payload is the exact
    // distincts plus the sketch's error contract: flags computed
    // Spark-side against the exact counts, oracle expects TRUE — a
    // broken/degraded sketch flips them red. The bound is 2×rsd (10%),
    // the same 2σ convention as q172: rsd is a STANDARD error, not a
    // hard bound, and pinning 1σ gates on where this dataset's hash
    // draws happen to land (measured: sf0.001 l_orderkey estimates at
    // 6.4% error — a correct sketch, red under a 1σ pin).
    "q09b_approx_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
          approx_count_distinct(col("l_partkey")).as("ap"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_orderkey")).as("ao"),
          countDistinct(col("l_orderkey")).as("exact_orders"))
        .select(col("exact_parts"), col("exact_orders"),
          (abs(col("ap") - col("exact_parts")).cast("double") /
            col("exact_parts") <= 0.10).as("parts_within_rsd"),
          (abs(col("ao") - col("exact_orders")).cast("double") /
            col("exact_orders") <= 0.10).as("orders_within_rsd"))
    }),

    // Approx-uniqueness DQ at 100 TB: HLL++ sketch partials instead of
    // the exact check's Expand + full-key shuffle. The ESTIMATE is
    // engine-specific, so the hashed payload is (a) the pass/fail
    // decisions at thresholds sitting ≥2σ from the estimate, (b) the
    // exact twin's rate, and (c) a Spark-side flag that the estimate
    // lands within 2×rsd of the exact rate — the oracle recomputes the
    // exact side and expects every flag TRUE. Note the struct-wrapped
    // distinct counts a NULL key tuple as a value (the exact check
    // does too), so the oracle adds the null-tuple term for o_custkey.
    "q172_approx_uniqueness" -> ((s, dir) => {
      val rep = DataQualityChecker(t(s, dir, "orders"), "orders")
        .checkUniqueness(Seq("o_orderkey"), threshold = 1.0)
        .checkUniqueness(Seq("o_custkey"), threshold = 0.01)
        .checkUniquenessApprox(Seq("o_orderkey"), threshold = 0.9)
        .checkUniquenessApprox(Seq("o_custkey"), threshold = 0.01)
        .run().toDF(s)
      val ex = rep.filter(!col("check_name").contains("approx"))
        .select(col("column_name"), col("passed").as("exact_passed"),
          col("pass_rate").as("exact_rate"))
      val ap = rep.filter(col("check_name").contains("approx"))
        .select(col("check_name"), col("column_name"), col("passed"),
          col("threshold"), col("severity"),
          col("pass_rate").as("approx_rate"))
      ap.join(ex, Seq("column_name"))
        .select(col("check_name"), col("column_name"), col("passed"),
          col("threshold"), col("severity"), col("exact_passed"),
          round(col("exact_rate"), 6).as("exact_rate"),
          (abs(col("approx_rate") - col("exact_rate")) <=
            col("exact_rate") * 0.10 + lit(1e-9)).as("within_2rsd"))
        .orderBy(col("check_name"))
    }),

    // The DQ centerpiece: 5 checks over orders in ONE aggregate pass.
    "q10_dq_report" -> ((s, dir) => {
      DataQualityChecker(t(s, dir, "orders"), "orders")
        .checkCompleteness(Seq("o_custkey"), threshold = 0.95)
        .checkRange("o_totalprice", 1.0, 1000000.0, threshold = 1.0)
        .checkValidity("o_orderstatus", Seq("O", "F", "P"), threshold = 1.0)
        .checkUniqueness(Seq("o_orderkey"), threshold = 1.0)
        .checkCustom("positive_price", col("o_totalprice") > 0,
          column = "o_totalprice", severity = Severity.Medium)
        .run().toDF(s)
        .orderBy(col("check_name"))
    }),

    // P5 valid/invalid split — quarantine rows with failure reasons.
    "q11_quarantine" -> ((s, dir) => {
      val (_, invalid) = DataQualityChecker(t(s, dir, "lineitem"), "lineitem")
        .checkRange("l_quantity", 1.0, 30.0)
        .checkCustom("moderate_price", col("l_extendedprice") < 90000)
        .validInvalidSplit()
      invalid.select(col("l_orderkey"), col("l_linenumber"),
        array_join(col("_validation_failures"), ";").as("failures"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // P3 string standardisation as a single projection.
    "q12_standardize" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      val up = Transforms.standardizeStrings(c, Seq("c_name"), "upper")
      Transforms.standardizeStrings(up, Seq("c_mktsegment"), "lower")
        .orderBy(col("c_custkey"))
    }),

    // M1 MERGE emulation: full-outer join, source wins on match.
    "q13_merge_upsert" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      val target = o.filter(col("o_orderkey") % 3 =!= 0)
      val source = o.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        .withColumn("o_orderstatus", lit("U"))
      Upsert.merge(target, source, Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),

    // J4 referential-integrity anti join.
    "q14_anti_join" -> ((s, dir) => {
      val bigParts = t(s, dir, "part").filter(col("p_size") > 25)
        .select(col("p_partkey").as("l_partkey"))
      t(s, dir, "lineitem")
        .join(bigParts, Seq("l_partkey"), "left_anti")
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("l_partkey"))
    }),

    // J4 semi join (EXISTS).
    "q15_semi_join" -> ((s, dir) => {
      val building = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("o_custkey"))
      t(s, dir, "orders")
        .join(building, Seq("o_custkey"), "left_semi")
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),

    // Set ops: ((a INTERSECT b) UNION c) EXCEPT d, all distinct variants.
    "q16_set_ops" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val a = c.filter(col("c_nationkey") < 10).select(col("c_custkey"))
      val b = c.filter(col("c_acctbal") > 0).select(col("c_custkey"))
      val u = c.filter(col("c_nationkey") === 20).select(col("c_custkey"))
      val e = c.filter(col("c_acctbal") < -500).select(col("c_custkey"))
      a.intersect(b).union(u).distinct().except(e)
        .orderBy(col("c_custkey"))
    }),

    // Grouping-set rollup over orders.
    "q17_rollup" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy(col("status"), col("priority"))
    }),

    // Full cube over lineitem flags.
    "q49_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy(col("rf"), col("ls"))
    }),

    // Exact interpolated percentiles per group (rounded to 6 digits so the
    // two engines' interpolation arithmetic can't diverge at the last ulp).
    // At 100 TB use approx_percentile (q50b) — exact percentile sorts each
    // group.
    "q50_percentiles" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("round(percentile(l_extendedprice, 0.25), 6)").as("p25"),
          expr("round(percentile(l_extendedprice, 0.5), 6)").as("p50"),
          expr("round(percentile(l_extendedprice, 0.75), 6)").as("p75"),
          expr("round(percentile(l_extendedprice, 0.95), 6)").as("p95"))
        .orderBy(col("l_returnflag"))
    }),

    // Sketch-based percentiles — the 100 TB path. The sketch VALUES are
    // engine-specific, so the hashed payload is the sketch's rank-error
    // contract instead: approx_percentile(accuracy=1000) guarantees the
    // returned value's true rank is within n/1000 of the target rank.
    // The true rank is recomputed against the data (one broadcast join —
    // the sketch side is 12 rows); the oracle expects every bound to hold.
    "q50b_approx_percentiles" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val approx = li.groupBy(col("l_returnflag"))
        .agg(expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95), 1000)")
            .as("pcts"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag").as("rf"), col("n"),
          posexplode(col("pcts")).as(Seq("pos", "value")))
        .select(col("rf"), col("n"),
          element_at(typedlit(Seq(0.25, 0.5, 0.75, 0.95)), col("pos") + 1)
            .as("quantile"),
          col("value"))
      li.select(col("l_returnflag"), col("l_extendedprice"))
        .join(broadcast(approx), col("l_returnflag") === col("rf"))
        .groupBy(col("l_returnflag"), col("quantile"), col("n"))
        .agg(sum(when(col("l_extendedprice") <= col("value"), 1L)
          .otherwise(0L)).as("rank_le"))
        .select(col("l_returnflag"), col("quantile"),
          (abs(col("rank_le") - col("quantile") * col("n")) <=
            col("n").cast("double") / 1000.0 + 1.0).as("within_bound"))
        .orderBy(col("l_returnflag"), col("quantile"))
    }),

    // Pivot (explicit value list → deterministic column set; nulls
    // coalesced to 0 to match conditional-aggregation semantics).
    "q56_pivot" -> ((s, dir) => {
      val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
        "5-LOW")
      val pivoted = t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority", priorities)
        .agg(count(lit(1)))
      pivoted.select(col("o_orderstatus") +:
        priorities.map(p => coalesce(col(s"`$p`"), lit(0L)).as(p)): _*)
        .orderBy(col("o_orderstatus"))
    }),

    // Salted equi-join for skew: results identical to the plain join.
    // Fuzzy watchlist screen (AML sanctions-matching shape): a planted
    // watchlist of perturbed customer names (one char deleted → edit
    // distance 1 from the source) matched against all customers under
    // Levenshtein ≤ 1 via rare-q-gram prefix filtering + exact verify.
    // Blocking is recall-complete, so the brute-force oracle reproduces
    // the output bit-for-bit.
    "q107_fuzzy_match" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val watch = cust.filter(col("c_custkey") % 37 === 0)
        .select((col("c_custkey") + 9000000L).as("watch_id"),
          expr("concat(substr(c_name, 1, 11), substr(c_name, 13))")
            .as("w_name"))
      graft.ext.FuzzyJoin.fuzzyMatch(watch, cust,
          "watch_id", "w_name", "c_custkey", "c_name", maxDist = 1)
        .select(col("watch_id"), col("c_custkey"), col("w_name"),
          col("c_name"), col("dist"))
        .orderBy(col("watch_id"), col("c_custkey"))
    }),

    "q51_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val parts = t(s, dir, "part").select(col("p_partkey").as("l_partkey"),
        col("p_brand"))
      graft.ops.SkewJoin.saltedJoin(li, parts, Seq("l_partkey"), saltFactor = 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total"))
        .orderBy(col("p_brand"))
    }),

    // Z-order clustering key (Delta/Iceberg OPTIMIZE ZORDER BY shape):
    // 8-bit min-max quantization per column, bit-interleaved — exact
    // BIGINT arithmetic end-to-end, so the key itself is
    // DuckDB-hash-checked.
    "q88_zorder_key" -> ((s, dir) => {
      graft.ext.Layout.zorderKey(
          t(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_linenumber"),
              col("l_partkey"), col("l_suppkey")),
          Seq("l_partkey", "l_suppkey"), bits = 8)
        .select(col("l_orderkey"), col("l_linenumber").cast("long")
          .as("l_linenumber"), col("zkey"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }))

  /** One FD pair's oracle block — the same cells → per-determinant →
    * g3 aggregation `Profile.functionalDependencies` runs. */
  private def fdBlock(det: String, dep: String): String =
    s"""SELECT '$det' AS determinant, '$dep' AS dependent,
       |  CAST(COUNT(*) AS BIGINT) AS n_groups,
       |  CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
       |  SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS fd_holds,
       |  ROUND(CAST(SUM(maxc) AS DOUBLE) / CAST(SUM(tot) AS DOUBLE), 6) AS strength
       |FROM (
       |  SELECT det, COUNT(*) AS nd, SUM(c) AS tot, MAX(c) AS maxc FROM (
       |    SELECT $det AS det, $dep AS dep, COUNT(*) AS c
       |    FROM nation GROUP BY 1, 2) GROUP BY det)""".stripMargin

  private val q129Oracle: String = {
    val cols = Seq("n_nationkey", "n_name", "n_regionkey")
    val blocks = (for { a <- cols; b <- cols if a != b } yield fdBlock(a, b))
      .mkString("\nUNION ALL\n")
    s"""SELECT * FROM (
       |$blocks
       |) ORDER BY determinant, dependent""".stripMargin
  }

  private val q135Oracle: String = {
    val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def d(c: String) = s"CAST($c AS DECIMAL(18,2))"
    val moments =
      cs.map(c => s"CAST(SUM(${d(c)}) AS DOUBLE) AS s_$c") ++
        (for { i <- cs.indices; j <- i until cs.size } yield
          s"CAST(SUM(${d(cs(i))} * ${d(cs(j))}) AS DOUBLE) AS p_${cs(i)}_${cs(j)}")
    def varN(c: String) = s"(CAST(n AS DOUBLE) * p_${c}_$c - s_$c * s_$c)"
    val rows = for { i <- cs.indices; j <- (i + 1) until cs.size } yield {
      val (a, b) = (cs(i), cs(j))
      s"""SELECT '$a' AS col_a, '$b' AS col_b, CAST(n AS BIGINT) AS n,
         |  ROUND(CASE WHEN ${varN(a)} > 0 AND ${varN(b)} > 0
         |    THEN (CAST(n AS DOUBLE) * p_${a}_$b - s_$a * s_$b)
         |         / (sqrt(${varN(a)}) * sqrt(${varN(b)})) END, 6) AS corr
         |FROM m""".stripMargin
    }
    s"""WITH m AS (
       |  SELECT COUNT(*) AS n,
       |    ${moments.mkString(",\n    ")}
       |  FROM lineitem
       |  WHERE ${cs.map(c => s"$c IS NOT NULL").mkString(" AND ")})
       |SELECT * FROM (
       |${rows.mkString("\nUNION ALL\n")}
       |) ORDER BY col_a, col_b""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q129_fd_profile" -> q129Oracle,

    // same rank formula / entropy identity on decimal-exact sums
    "q141_concentration" ->
      """WITH r AS (
        |  SELECT o_orderpriority, CAST(o_totalprice AS DECIMAL(18,2)) AS vd,
        |    CAST(o_totalprice AS DOUBLE) AS v,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(o_totalprice AS DOUBLE)) AS i
        |  FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice >= 0),
        |a AS (
        |  SELECT o_orderpriority, COUNT(*) AS n,
        |    CAST(SUM(vd) AS DOUBLE) AS s,
        |    CAST(SUM(i * vd) AS DOUBLE) AS siv,
        |    CAST(SUM(vd * vd) AS DOUBLE) AS sv2,
        |    SUM(CASE WHEN v > 0 THEN v * ln(v) ELSE 0.0 END) AS svlv
        |  FROM r GROUP BY o_orderpriority)
        |SELECT o_orderpriority, n, s AS total,
        |  ROUND(CASE WHEN s > 0 THEN 2.0 * siv / (CAST(n AS DOUBLE) * s)
        |    - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) END, 6) AS gini,
        |  ROUND(CASE WHEN s > 0 THEN sv2 / (s * s) END, 6) AS hhi,
        |  ROUND(CASE WHEN s > 0 THEN ln(s) - svlv / s END, 6) AS entropy
        |FROM a ORDER BY o_orderpriority""".stripMargin,

    "q135_correlation_matrix" -> q135Oracle,

    // identical two-step arithmetic as Stats.groupedOls: exact decimal
    // sums cast to double, then the same closed-form expression tree
    "q120_grouped_ols" ->
      """WITH a AS (
        |  SELECT l_returnflag,
        |    COUNT(*) AS n,
        |    CAST(COUNT(*) AS DOUBLE) AS nd,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |  GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  ROUND(CASE WHEN nd * sxx - sx * sx <> 0
        |    THEN (nd * sxy - sx * sy) / (nd * sxx - sx * sx) END, 6) AS slope,
        |  ROUND(CASE WHEN nd * sxx - sx * sx <> 0
        |    THEN (sy - (nd * sxy - sx * sy) / (nd * sxx - sx * sx) * sx) / nd END, 6) AS intercept,
        |  ROUND(CASE WHEN nd * sxx - sx * sx <> 0 AND nd * syy - sy * sy <> 0
        |    THEN (nd * sxy - sx * sy) * (nd * sxy - sx * sy)
        |         / ((nd * sxx - sx * sx) * (nd * syy - sy * sy)) END, 6) AS r2
        |FROM a ORDER BY l_returnflag""".stripMargin,

    // same digit arithmetic (floor(v/10^floor(log10 v))) and χ² algebra
    "q127_benford" ->
      """WITH cells AS (
        |  SELECT o_orderpriority, CAST(floor(abs(o_totalprice)
        |      / power(10, floor(log10(abs(o_totalprice))))) AS INT) AS digit,
        |    COUNT(*) AS n_d
        |  FROM orders
        |  WHERE o_totalprice IS NOT NULL AND abs(o_totalprice) > 0
        |  GROUP BY 1, 2),
        |g AS (SELECT o_orderpriority, CAST(SUM(n_d) AS BIGINT) AS n
        |      FROM cells GROUP BY o_orderpriority),
        |d AS (SELECT CAST(i AS INT) AS digit FROM range(1, 10) t(i)),
        |f AS (
        |  SELECT g.o_orderpriority, d.digit,
        |    CAST(COALESCE(c.n_d, 0) AS BIGINT) AS n_d, g.n,
        |    log10(1.0 + 1.0 / CAST(d.digit AS DOUBLE)) AS pexp
        |  FROM g CROSS JOIN d
        |  LEFT JOIN cells c
        |    ON c.o_orderpriority = g.o_orderpriority AND c.digit = d.digit),
        |chi AS (
        |  SELECT o_orderpriority,
        |    SUM((CAST(n_d AS DOUBLE) - CAST(n AS DOUBLE) * pexp)
        |      * (CAST(n_d AS DOUBLE) - CAST(n AS DOUBLE) * pexp)
        |      / (CAST(n AS DOUBLE) * pexp)) AS chi2
        |  FROM f GROUP BY o_orderpriority)
        |SELECT f.o_orderpriority, f.digit, f.n_d,
        |  ROUND(CAST(f.n_d AS DOUBLE) / CAST(f.n AS DOUBLE), 6) AS p_obs,
        |  ROUND(f.pexp, 6) AS p_exp,
        |  ROUND(chi.chi2, 6) AS chi2
        |FROM f JOIN chi ON f.o_orderpriority = chi.o_orderpriority
        |ORDER BY f.o_orderpriority, f.digit""".stripMargin,

    // observed-cells identity: χ² = n·Σo²/(ra·cb) − n
    "q122_chi_square" ->
      """WITH c AS (
        |  SELECT lang AS a, source AS b, COUNT(*) AS o FROM documents
        |  WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT a, SUM(o) AS ra FROM c GROUP BY a),
        |cl AS (SELECT b, SUM(o) AS cb FROM c GROUP BY b)
        |SELECT CAST(SUM(c.o) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT c.a) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT c.b) AS BIGINT) AS n_cols,
        |  CAST((COUNT(DISTINCT c.a) - 1) * (COUNT(DISTINCT c.b) - 1) AS BIGINT) AS dof,
        |  ROUND(CAST(SUM(c.o) AS DOUBLE) * SUM(CAST(c.o AS DOUBLE) * CAST(c.o AS DOUBLE)
        |          / (CAST(r.ra AS DOUBLE) * CAST(cl.cb AS DOUBLE)))
        |        - CAST(SUM(c.o) AS DOUBLE), 6) AS chi2
        |FROM c JOIN r ON c.a = r.a JOIN cl ON c.b = cl.b""".stripMargin,

    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  ${sqlRevenueSum("l_extendedprice", "l_discount")} AS sum_disc_price,
         |  ${sqlDsum("l_quantity")} / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_pushdown" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "q03_top_orders" ->
      s"""SELECT l.l_orderkey, o.o_orderdate,
         |  ${sqlRevenueSum("l.l_extendedprice", "l.l_discount")} AS revenue
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |WHERE c.c_mktsegment = 'BUILDING'
         |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l.l_shipdate > TIMESTAMP '1997-01-01'
         |GROUP BY l.l_orderkey, o.o_orderdate
         |ORDER BY revenue DESC, l.l_orderkey LIMIT 10""".stripMargin,

    "q04_dim_join" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_cust,
         |  ${sqlDsum("c_acctbal")} AS total_acctbal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q05_dedup_latest" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
        |ORDER BY o_custkey""".stripMargin,

    "q06_surrogate_key" ->
      """SELECT n_nationkey, n_name,
        |  CAST(row_number() OVER (ORDER BY n_name) AS BIGINT) AS nation_sk
        |FROM nation ORDER BY nation_sk""".stripMargin,

    "q06b_surrogate_scalable" ->
      """SELECT c_custkey,
        |  CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT) AS customer_sk
        |FROM customer ORDER BY customer_sk""".stripMargin,

    "q07_daily_topk" ->
      """SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
        |FROM events GROUP BY 1
        |ORDER BY n_events DESC, day DESC LIMIT 7""".stripMargin,

    "q08_exact_dedup" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin,

    "q09_distinct_stats" ->
      """SELECT COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(*) AS n_rows FROM lineitem""".stripMargin,

    // exact distincts hashed; the within-rsd flags are computed Spark-side
    // against those exact counts (sketch error contract), expected TRUE
    "q09b_approx_distinct" ->
      """SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
        |  COUNT(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS parts_within_rsd, TRUE AS orders_within_rsd
        |FROM lineitem""".stripMargin,

    // the exact side recomputed (with the struct-distinct null-tuple
    // term), every contract flag pinned TRUE
    "q172_approx_uniqueness" ->
      """WITH m AS (
        |  SELECT COUNT(*) AS total,
        |    COUNT(DISTINCT o_orderkey) +
        |      MAX(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS d_ok,
        |    COUNT(DISTINCT o_custkey) +
        |      MAX(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS d_ck
        |  FROM orders)
        |SELECT * FROM (
        |  SELECT 'uniqueness_approx_o_custkey' AS check_name,
        |    'o_custkey' AS column_name, TRUE AS passed,
        |    CAST(0.01 AS DOUBLE) AS threshold, 'Critical' AS severity,
        |    TRUE AS exact_passed,
        |    ROUND(CAST(d_ck AS DOUBLE) / CAST(total AS DOUBLE), 6)
        |      AS exact_rate,
        |    TRUE AS within_2rsd FROM m
        |  UNION ALL
        |  SELECT 'uniqueness_approx_o_orderkey', 'o_orderkey', TRUE,
        |    CAST(0.9 AS DOUBLE), 'Critical', TRUE,
        |    ROUND(CAST(d_ok AS DOUBLE) / CAST(total AS DOUBLE), 6), TRUE
        |  FROM m)
        |ORDER BY check_name""".stripMargin,

    "q10_dq_report" ->
      """WITH m AS (
        |  SELECT COUNT(*) AS total,
        |    CAST(SUM(CASE WHEN o_custkey IS NULL OR trim(CAST(o_custkey AS VARCHAR)) = '' THEN 1 ELSE 0 END) AS BIGINT) AS f_comp,
        |    CAST(SUM(CASE WHEN o_totalprice IS NOT NULL AND (o_totalprice < 1.0 OR o_totalprice > 1000000.0) THEN 1 ELSE 0 END) AS BIGINT) AS f_range,
        |    CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS f_val,
        |    CAST(SUM(CASE WHEN NOT COALESCE(o_totalprice > 0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS f_cust,
        |    COUNT(DISTINCT o_orderkey) AS n_uniq
        |  FROM orders)
        |SELECT * FROM (
        |  SELECT 'orders' AS table_name, 'completeness_o_custkey' AS check_name, 'Completeness' AS check_type,
        |    'o_custkey' AS column_name, CAST(total - f_comp AS DOUBLE)/CAST(total AS DOUBLE) >= 0.95 AS passed,
        |    total AS total_count, f_comp AS failed_count,
        |    CAST(total - f_comp AS DOUBLE)/CAST(total AS DOUBLE) AS pass_rate,
        |    CAST(0.95 AS DOUBLE) AS threshold, 'High' AS severity, 'non-null rate of o_custkey' AS details FROM m
        |  UNION ALL
        |  SELECT 'orders', 'range_o_totalprice', 'Range', 'o_totalprice',
        |    CAST(total - f_range AS DOUBLE)/CAST(total AS DOUBLE) >= 1.0,
        |    total, f_range, CAST(total - f_range AS DOUBLE)/CAST(total AS DOUBLE),
        |    CAST(1.0 AS DOUBLE), 'High', 'o_totalprice in [1.0, 1000000.0]' FROM m
        |  UNION ALL
        |  SELECT 'orders', 'validity_o_orderstatus', 'Validity', 'o_orderstatus',
        |    CAST(total - f_val AS DOUBLE)/CAST(total AS DOUBLE) >= 1.0,
        |    total, f_val, CAST(total - f_val AS DOUBLE)/CAST(total AS DOUBLE),
        |    CAST(1.0 AS DOUBLE), 'High', 'o_orderstatus in {O,F,P}' FROM m
        |  UNION ALL
        |  SELECT 'orders', 'uniqueness_o_orderkey', 'Uniqueness', 'o_orderkey',
        |    CAST(total - (total - n_uniq) AS DOUBLE)/CAST(total AS DOUBLE) >= 1.0,
        |    total, total - n_uniq, CAST(total - (total - n_uniq) AS DOUBLE)/CAST(total AS DOUBLE),
        |    CAST(1.0 AS DOUBLE), 'Critical', 'distinct=' || CAST(n_uniq AS VARCHAR) FROM m
        |  UNION ALL
        |  SELECT 'orders', 'positive_price', 'Custom', 'o_totalprice',
        |    CAST(total - f_cust AS DOUBLE)/CAST(total AS DOUBLE) >= 1.0,
        |    total, f_cust, CAST(total - f_cust AS DOUBLE)/CAST(total AS DOUBLE),
        |    CAST(1.0 AS DOUBLE), 'Medium', 'custom: positive_price' FROM m
        |) ORDER BY check_name""".stripMargin,

    "q11_quarantine" ->
      """SELECT l_orderkey, l_linenumber,
        |  concat_ws(';',
        |    CASE WHEN l_quantity IS NOT NULL AND (l_quantity < 1.0 OR l_quantity > 30.0) THEN 'OUT_OF_RANGE_L_QUANTITY' END,
        |    CASE WHEN NOT COALESCE(l_extendedprice < 90000, FALSE) THEN 'CUSTOM_MODERATE_PRICE' END) AS failures
        |FROM lineitem
        |WHERE (l_quantity IS NOT NULL AND (l_quantity < 1.0 OR l_quantity > 30.0))
        |   OR NOT COALESCE(l_extendedprice < 90000, FALSE)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q12_standardize" ->
      """SELECT c_custkey, upper(trim(c_name)) AS c_name,
        |  lower(trim(c_mktsegment)) AS c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q13_merge_upsert" ->
      """WITH target AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 3 <> 0),
        |source AS (
        |  SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice, 'U' AS o_orderstatus
        |  FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
        |  CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
        |  CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus
        |FROM target t FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    "q14_anti_join" ->
      """SELECT l_partkey, COUNT(*) AS n FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey AND p.p_size > 25)
        |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin,

    "q15_semi_join" ->
      """SELECT o_orderstatus, COUNT(*) AS n FROM orders o
        |WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q16_set_ops" ->
      """(SELECT c_custkey FROM customer WHERE c_nationkey < 10
        | INTERSECT
        | SELECT c_custkey FROM customer WHERE c_acctbal > 0)
        |UNION
        |SELECT c_custkey FROM customer WHERE c_nationkey = 20
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_acctbal < -500
        |ORDER BY c_custkey""".stripMargin,

    "q17_rollup" ->
      s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
         |  COALESCE(o_orderpriority, 'ALL') AS priority,
         |  COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total
         |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         |ORDER BY status, priority""".stripMargin,

    "q49_cube" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
         |  COALESCE(l_linestatus, 'ALL') AS ls,
         |  COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY rf, ls""".stripMargin,

    "q50_percentiles" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
        |  ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
        |  ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
        |  ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // one row per (group, quantile); the rank-error bound is verified
    // Spark-side against the raw data, expected TRUE for every cell
    "q50b_approx_percentiles" ->
      """SELECT l_returnflag, q AS quantile, TRUE AS within_bound
        |FROM (SELECT DISTINCT l_returnflag FROM lineitem)
        |CROSS JOIN (SELECT CAST(x AS DOUBLE) AS q
        |  FROM (VALUES (0.25), (0.5), (0.75), (0.95)) v(x))
        |ORDER BY l_returnflag, quantile""".stripMargin,

    "q51_salted_join" ->
      s"""SELECT p.p_brand, COUNT(*) AS n, ${sqlDsum("l.l_extendedprice")} AS total
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin,

    "q107_fuzzy_match" ->
      """WITH w AS (
        |  SELECT c_custkey + 9000000 AS watch_id,
        |    substr(c_name, 1, 11) || substr(c_name, 13) AS w_name
        |  FROM customer WHERE c_custkey % 37 = 0)
        |SELECT w.watch_id, c.c_custkey, w.w_name, c.c_name,
        |  CAST(levenshtein(lower(w.w_name), lower(c.c_name)) AS BIGINT) AS dist
        |FROM w CROSS JOIN customer c
        |WHERE levenshtein(lower(w.w_name), lower(c.c_name)) <= 1
        |ORDER BY watch_id, c_custkey""".stripMargin,

    "q56_pivot" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS "1-URGENT",
        |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS "2-HIGH",
        |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS "3-MEDIUM",
        |  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS "4-NOT SPECIFIED",
        |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS "5-LOW"
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q88_zorder_key" -> {
      // interleave term list generated to mirror Layout.zorderKey exactly:
      // bit i of column j lands at position i·2 + j (qp = col 0, qs = col 1)
      val terms = (0 until 8).flatMap(i => Seq(
        s"((qp >> $i) & 1) * ${1L << (2 * i)}",
        s"((qs >> $i) & 1) * ${1L << (2 * i + 1)}")).mkString(" + ")
      s"""WITH s AS (
         |  SELECT MIN(l_partkey) AS mnp, MAX(l_partkey) AS mxp,
         |         MIN(l_suppkey) AS mns, MAX(l_suppkey) AS mxs
         |  FROM lineitem),
         |q AS (
         |  SELECT l_orderkey, l_linenumber,
         |    ((l_partkey - mnp) * 256) // (mxp - mnp + 1) AS qp,
         |    ((l_suppkey - mns) * 256) // (mxs - mns + 1) AS qs
         |  FROM lineitem CROSS JOIN s)
         |SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         |  CAST($terms AS BIGINT) AS zkey
         |FROM q ORDER BY l_orderkey, l_linenumber""".stripMargin
    })
}
