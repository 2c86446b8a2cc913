package graft

import org.apache.spark.sql.functions._
import graft.ext.Stats

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("groupedOls recovers a planted exact line") {
    // y = 3x + 2 exactly: slope/intercept exact, r² = 1
    val df = (1 to 20).map(i => ("g", i.toDouble, 3.0 * i + 2.0))
      .toDF("g", "x", "y")
    val r = Stats.groupedOls(df, Seq("g"), "x", "y").collect().head
    assert(r.getAs[Long]("n") == 20L)
    assert(r.getAs[Double]("slope") == 3.0)
    assert(r.getAs[Double]("intercept") == 2.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("groupedOls hand-computed slope and degenerate groups") {
    // points (1,1),(2,3),(3,2): slope = 0.5, r2 = 0.25
    val df = Seq(("a", 1.0, 1.0), ("a", 2.0, 3.0), ("a", 3.0, 2.0),
      ("v", 2.0, 1.0), ("v", 2.0, 5.0), // zero x-variance: vertical line
      ("h", 1.0, 4.0), ("h", 2.0, 4.0)) // zero y-variance: r2 undefined
      .toDF("g", "x", "y")
    val rows = Stats.groupedOls(df, Seq("g"), "x", "y")
      .orderBy("g").collect()
    val a = rows(0)
    assert(a.getAs[Double]("slope") == 0.5)
    assert(a.getAs[Double]("r2") == 0.25)
    val h = rows(1)
    assert(h.getAs[Double]("slope") == 0.0) // flat line fits exactly
    assert(h.isNullAt(h.fieldIndex("r2")))
    val v = rows(2)
    assert(v.isNullAt(v.fieldIndex("slope")))
    assert(v.isNullAt(v.fieldIndex("intercept")))
  }

  test("groupedOls drops incomplete pairs from n and the moments") {
    val df = Seq(("g", Option(1.0), Option(3.0)),
      ("g", Option(2.0), Option(5.0)),
      ("g", Option(9.0), Option.empty[Double]),  // incomplete: excluded
      ("g", Option.empty[Double], Option(7.0)))  // incomplete: excluded
      .toDF("g", "x", "y")
    val r = Stats.groupedOls(df, Seq("g"), "x", "y").collect().head
    assert(r.getAs[Long]("n") == 2L)
    assert(r.getAs[Double]("slope") == 2.0) // exact line through 2 points
    assert(r.getAs[Double]("intercept") == 1.0)
  }

  test("madOutliers flags the planted spike and respects MAD=0 rule") {
    val base = (1 to 11).map(i => ("a", i.toDouble)) :+ ("a", 1000.0)
    val const = (1 to 5).map(_ => ("c", 7.0)) :+ ("c", 7.5)
    val df = (base ++ const).toDF("g", "v")
    val rows = Stats.madOutliers(df, Seq("g"), "v").orderBy("g").collect()
    val a = rows(0)
    // median of 1..11,1000 = 6.5; MAD = median(|v-6.5|) = 3.0; the spike's
    // robust z = 993.5/(1.4826*3) ≈ 223 — the only value past 3 sigmas
    assert(a.getAs[Double]("median") == 6.5)
    assert(a.getAs[Double]("mad") == 3.0)
    assert(a.getAs[Long]("n_outliers") == 1L)
    val c = rows(1)
    // over half identical → MAD 0 → any deviation counts
    assert(c.getAs[Double]("mad") == 0.0)
    assert(c.getAs[Long]("n_outliers") == 1L)
  }

  test("correlationMatrix: perfect, inverse, and zero-variance columns") {
    // y = 2x (r = 1), z = -x (r = -1 with x), c constant (null r)
    val df = (1 to 10).map(i =>
      (i.toDouble, 2.0 * i, -i.toDouble, 5.0)).toDF("x", "y", "z", "c")
    val m = graft.ext.Stats.correlationMatrix(df, Seq("x", "y", "z", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(m.size == 6)
    assert(m(("x", "y")) == Some(1.0))
    assert(m(("x", "z")) == Some(-1.0))
    assert(m(("y", "z")) == Some(-1.0))
    assert(m(("x", "c")) == None)
    // listwise: a null row drops from every pair's n
    val withNull = ((1 to 10).map(i =>
      (i.toDouble, 2.0 * i, -i.toDouble, Option(5.0))) :+
      ((11.0, 22.0, -11.0, Option.empty[Double])))
      .toDF("x", "y", "z", "c")
    val n = graft.ext.Stats.correlationMatrix(withNull,
      Seq("x", "y", "z", "c")).collect().head.getAs[Long]("n")
    assert(n == 10L)
  }

  test("DecimalMomentsAgg equals sum(decimal·decimal) exactly across " +
    "partitions, skipping null rows listwise") {
    import org.apache.spark.sql.types.DecimalType
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(5000) { i =>
      val nullRow = i % 97 == 0
      (if (nullRow) None else Some(rnd.nextInt(2000000) / 100.0 - 5000.0),
        Some(rnd.nextInt(900000) / 100.0),
        Some(rnd.nextDouble() * 42.0))
    }
    val df = rows.toDF("a", "b", "c").repartition(7)
      .filter(col("a").isNotNull) // listwise upstream, as correlationMatrix does
    val dt = DecimalType(18, 2)
    val m = df.select(graft.functions.DecimalMomentsAgg.moments(
      Seq(col("a").cast(dt), col("b").cast(dt), col("c").cast(dt)), 2)
      .as("m")).collect().head.getSeq[java.math.BigDecimal](0)
    val ref = df.agg(
      count(lit(1)), sum(col("a").cast(dt)), sum(col("b").cast(dt)),
      sum(col("c").cast(dt)),
      sum(col("a").cast(dt) * col("a").cast(dt)),
      sum(col("a").cast(dt) * col("b").cast(dt)),
      sum(col("a").cast(dt) * col("c").cast(dt)),
      sum(col("b").cast(dt) * col("b").cast(dt)),
      sum(col("b").cast(dt) * col("c").cast(dt)),
      sum(col("c").cast(dt) * col("c").cast(dt))).collect().head
    assert(m.size == 10)
    assert(m.head.longValueExact() == ref.getLong(0))
    (1 until 10).foreach { i =>
      val exp = ref.getDecimal(i)
      assert(m(i).compareTo(exp) == 0,
        s"slot $i: got ${m(i)}, want $exp")
    }
  }

  test("correlationMatrix double fast path (decimals = null) matches exact") {
    // decimals = null accumulates raw double sums — partial-agg noise
    // lands far below roundTo for well-conditioned data, so at 6 digits
    // the fast path should agree with the exact decimal default here
    val df = (1 to 200).map { i =>
      (i * 0.25, 100.0 - i * 0.5, (i % 7).toDouble, i * i * 0.01)
    }.toDF("a", "b", "c", "d")
    def asMap(m: org.apache.spark.sql.DataFrame) =
      m.collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val exact = asMap(graft.ext.Stats.correlationMatrix(
      df, Seq("a", "b", "c", "d"), graft.queries.Q.money))
    val fast = asMap(graft.ext.Stats.correlationMatrix(
      df, Seq("a", "b", "c", "d"), decimals = null))
    assert(exact.keySet == fast.keySet)
    exact.foreach { case (k, ev) =>
      (ev, fast(k)) match {
        case (Some(e), Some(f)) => assert(math.abs(e - f) <= 1e-6, s"$k: $e vs $f")
        case (a, b) => assert(a == b, s"$k: $a vs $b")
      }
    }
    // the known anchors hold in fast mode too
    assert(fast(("a", "b")) == Some(-1.0))
  }

  test("populationStability: identical populations score 0, shifted drift") {
    val ref = (1 to 1000).map(i => Tuple1(i.toDouble)).toDF("v")
    val same = Stats.populationStability(ref, ref, "v").collect()
    assert(same.length == 10)
    assert(same.forall(_.getAs[Double]("psi") == 0.0))
    assert(same.forall(_.getAs[Double]("contrib") == 0.0))
    // decile bins of the reference each hold ~10% of the reference
    assert(same.forall(r => math.abs(r.getAs[Double]("p_ref") - 0.1) < 0.02))
    // shift by +900: most current mass lands in the top bins
    val cur = (1 to 1000).map(i => Tuple1(i.toDouble + 900.0)).toDF("v")
    val drift = Stats.populationStability(ref, cur, "v").collect()
    assert(drift.head.getAs[Double]("psi") > 0.25)
  }

  test("welchTTest matches the hand-computed closed form") {
    val df = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(2.0, 4.0, 6.0).map(("b", _))).toDF("g", "v")
    val r = Stats.welchTTest(df, "g", "v", "a", "b").collect().head
    assert(r.getAs[Long]("n_a") == 3L)
    assert(r.getAs[Double]("mean_a") == 2.0)
    assert(r.getAs[Double]("mean_b") == 4.0)
    assert(r.getAs[Double]("var_a") == 1.0)
    assert(r.getAs[Double]("var_b") == 4.0)
    // t = -2/sqrt(1/3 + 4/3); df = (5/3)^2 / ((1/9)/2 + (16/9)/2) = 50/17
    assert(r.getAs[Double]("t_stat") == -1.549193)
    assert(r.getAs[Double]("df") == 2.941176)
  }

  test("weightOfEvidence: hand-computed smoothed log-odds and IV") {
    // two bins at the median of 1..10; label = v >= 4
    // bin1 (v<=5.5): 2 pos / 3 neg; bin2: 5 pos / 0 neg; tp=7 tn=3
    // ps1=2.5/8, ns1=3.5/4 -> woe1=ln(0.357143); ps2=5.5/8, ns2=0.5/4
    val df = (1 to 10).map(i => (i.toDouble, i >= 4)).toDF("v", "y")
    val rows = Stats.weightOfEvidence(df, "v", "y", bins = 2)
      .orderBy("bin").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n_pos") == 2L)
    assert(rows(0).getAs[Double]("woe") == -1.029619)
    assert(rows(1).getAs[Double]("woe") == 1.704748)
    assert(rows(0).getAs[Double]("iv_contrib") == 0.579161)
    assert(rows(1).getAs[Double]("iv_contrib") == 0.958921)
    assert(rows(0).getAs[Double]("iv") == 1.538082)
  }

  test("decayedSum: half-life weighting, future rows excluded") {
    val asOf = 1000000L
    def ts(e: Long) = new java.sql.Timestamp(e * 1000L)
    val df = Seq(
      (1L, ts(asOf), 10.0),          // age 0 -> weight 1
      (1L, ts(asOf - 86400), 10.0),  // one half-life -> weight 0.5
      (1L, ts(asOf + 5), 99.0),      // future: excluded
      (2L, ts(asOf - 172800), 8.0))  // two half-lives -> weight 0.25
      .toDF("user_id", "ts", "v")
    val out = Stats.decayedSum(df, Seq("user_id"), "ts", "v",
        halfLifeDays = 1.0, asOfEpochSec = asOf)
      .orderBy("user_id").collect()
    assert(out(0).getAs[Long]("n") == 2L)
    assert(out(0).getAs[Double]("decayed_sum") == 15.0)
    assert(out(1).getAs[Double]("decayed_sum") == 2.0)
    assert(out(0).getAs[java.sql.Timestamp]("last_ts") == ts(asOf))
  }

  test("benfordDeviation: digit extraction, scaffold, and deviation ordering") {
    // benford-ish group: digit counts ~ proportional to log10(1+1/d)
    val benfordish = Seq.fill(30)(1.0) ++ Seq.fill(18)(2.0) ++
      Seq.fill(12)(3.0) ++ Seq.fill(10)(4.0) ++ Seq.fill(8)(5.0) ++
      Seq.fill(7)(6.0) ++ Seq.fill(6)(7.0) ++ Seq.fill(5)(8.0) ++
      Seq.fill(4)(9.0)
    // fabricated group: every amount starts with 5 (round-number fraud)
    val flat = Seq.fill(100)(500.0) ++ Seq.fill(100)(5999.99)
    val df = (benfordish.map(("ok", _)) ++ flat.map(("bad", _)))
      .toDF("g", "v")
    val rows = Stats.benfordDeviation(df, Seq("g"), "v").collect()
    assert(rows.length == 18) // 9 digits x 2 groups, zero digits included
    val bad = rows.filter(_.getString(0) == "bad")
    assert(bad.filter(_.getAs[Int]("digit") == 5).head.getAs[Long]("n_d") == 200L)
    assert(bad.filter(_.getAs[Int]("digit") == 1).head.getAs[Long]("n_d") == 0L)
    val okChi = rows.filter(_.getString(0) == "ok").head.getAs[Double]("chi2")
    val badChi = bad.head.getAs[Double]("chi2")
    assert(badChi > okChi * 10, s"bad=$badChi ok=$okChi")
    // p_exp is the Benford mass and sums to ~1 over the digits
    val pSum = rows.filter(_.getString(0) == "ok")
      .map(_.getAs[Double]("p_exp")).sum
    assert(math.abs(pSum - 1.0) < 1e-4)
    // digit of 0.0234 is 2 (sub-1 magnitudes work through the log path)
    val small = Seq(("s", 0.0234)).toDF("g", "v")
    val d = Stats.benfordDeviation(small, Seq("g"), "v")
      .filter(col("n_d") > 0).collect().head
    assert(d.getAs[Int]("digit") == 2)
  }

  test("robustScale: spike scores high, MAD=0 group yields null") {
    val df = ((1 to 11).map(i => ("a", i.toDouble)) :+ ("a", 1000.0))
      .++(Seq(("c", 7.0), ("c", 7.0), ("c", 7.5)))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "g", "v")
    val out = Stats.robustScale(df, Seq("g"), "v").collect()
    val spike = out.find(r => r.getAs[Double]("v") == 1000.0).get
    assert(spike.getAs[Double]("robust_z") > 200.0)
    // c: median 7, MAD 0 -> null scores for the whole group
    assert(out.filter(_.getAs[String]("g") == "c")
      .forall(r => r.isNullAt(r.fieldIndex("robust_z"))))
    // near-median values score near zero
    val six = out.find(r => r.getAs[String]("g") == "a" &&
      r.getAs[Double]("v") == 6.0).get
    assert(math.abs(six.getAs[Double]("robust_z")) < 0.2)
  }

  test("associationRules: hand-computed support/confidence/lift, basket cap") {
    val df = Seq((1L, "A"), (1L, "B"), (1L, "C"), (1L, "A"), // dup presence
      (2L, "A"), (2L, "B"), (3L, "A"), (4L, "B"), (4L, "C"))
      .toDF("u", "i")
    val rules = graft.ext.Associations.pairRules(df, "u", "i",
        minSupport = 0.3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))).toMap
    // (A,C) support 0.25 < 0.3 -> filtered; n=4 baskets
    assert(rules.keySet == Set(("A", "B"), ("B", "C")))
    assert(rules(("A", "B")) == ((2L, 0.5, 0.666667, 0.666667, 0.888889)))
    assert(rules(("B", "C")) == ((2L, 0.5, 0.666667, 1.0, 1.333333)))
    // basket cap drops the whole oversized entity, totals follow
    val capped = graft.ext.Associations.pairRules(df, "u", "i",
      minSupport = 0.1, maxBasket = 2).collect()
    // u1 (3 items) dropped -> pairs only from u2/u4; n = 3 survivors
    assert(capped.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("A", "B"), ("B", "C")))
    assert(capped.find(r => r.getString(0) == "A").get
      .getAs[Long]("n_co") == 1L)
  }

  test("entryPaths: first-depth journeys with shares") {
    val df = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "C"), (1L, 4L, "D"),
      (2L, 1L, "A"),
      (3L, 1L, "A"), (3L, 2L, "B")).toDF("u", "seq", "s")
    val out = graft.ext.Sequences.entryPaths(df, "u", Seq("seq"), "s",
        depth = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(out == Map(
      "A>B>C" -> ((1L, 0.333333)),
      "A" -> ((1L, 0.333333)),
      "A>B" -> ((1L, 0.333333))))
  }

  test("concentration: uniform vs single-payer closed forms") {
    val df = (Seq.fill(4)(("a", 1.0)) ++
      Seq(("b", 0.0), ("b", 0.0), ("b", 0.0), ("b", 10.0)))
      .toDF("g", "v")
    val rows = Stats.concentration(df, Seq("g"), "v")
      .orderBy("g").collect()
    val a = rows(0)
    assert(a.getAs[Double]("gini") == 0.0)      // perfectly equal
    assert(a.getAs[Double]("hhi") == 0.25)      // 1/n
    assert(a.getAs[Double]("entropy") == 1.386294) // ln 4
    val b = rows(1)
    assert(b.getAs[Double]("gini") == 0.75)     // (n-1)/n: one payer
    assert(b.getAs[Double]("hhi") == 1.0)
    assert(b.getAs[Double]("entropy") == 0.0)
  }

  test("interpolateLinear fills between neighbors, never extrapolates") {
    def ts(s: Int) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    val df = Seq(
      (1L, 1L, ts(-10), Option.empty[Double]), // before first known
      (1L, 2L, ts(0), Option(10.0)),
      (1L, 3L, ts(10), Option.empty[Double]),  // interp -> 20
      (1L, 4L, ts(20), Option(30.0)),
      (1L, 5L, ts(30), Option.empty[Double]))  // after last known
      .toDF("user_id", "event_id", "ts", "value")
    val out = graft.ext.GapFill.interpolateLinear(df, Seq("user_id"),
        "ts", "event_id", "value")
      .orderBy("event_id").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("value_filled")))
    assert(!out(0).getAs[Boolean]("is_interpolated"))
    assert(out(1).getAs[Double]("value_filled") == 10.0)
    assert(out(2).getAs[Double]("value_filled") == 20.0)
    assert(out(2).getAs[Boolean]("is_interpolated"))
    assert(out(4).isNullAt(out(4).fieldIndex("value_filled")))
  }

  test("timeWeightedAverage: step integral vs naive mean") {
    def ts(s: Int) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    // value 10 held 91s (t=0 → first burst quote at t=91), then a
    // 10-quote burst of 100s spanning 9 one-second holds: naive mean
    // ≈ 91.8, TWA = (10·91 + 100·9)/100 = 18.1
    val rows = Seq((1L, 0, 10.0)) ++
      (1 to 10).map(i => (1L, 90 + i, 100.0)) :+
      ((2L, 0, 5.0)) // single obs: no interval, null TWA
    val df = rows.map { case (u, s, v) => (u, ts(s), s.toLong, v) }
      .toDF("user_id", "ts", "event_id", "v")
    val out = graft.ext.Features.timeWeightedAverage(df, Seq("user_id"),
        "ts", "event_id", "v")
      .orderBy("user_id").collect()
    assert(out(0).getAs[Long]("n_obs") == 11L)
    assert(out(0).getAs[Double]("time_weighted_avg") == 18.1)
    assert(out(1).isNullAt(out(1).fieldIndex("time_weighted_avg")))
  }

  test("velocityFeatures: hand-computed lag/rolling/range features") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    // user A: events at 0s, 10s, 3600s, 7300s with values 1,2,3,4
    val df = Seq(
      (1L, 101L, ts(0), 1.0), (1L, 102L, ts(10), 2.0),
      (1L, 103L, ts(3600), 3.0), (1L, 104L, ts(7300), 4.0))
      .toDF("user_id", "event_id", "ts", "value")
    val out = graft.ext.Features.velocityFeatures(df, "user_id", "ts",
        "event_id", "value")
      .orderBy("event_id").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("prev_value")))
    assert(out(1).getAs[Double]("prev_value") == 1.0)
    // trailing-3-row means: 1, 1.5, 2, 3
    assert(out.map(_.getAs[Double]("avg_rows")).toSeq ==
      Seq(1.0, 1.5, 2.0, 3.0))
    // 1h range (inclusive both ends): t=3600 still sees t=0 and t=10;
    // t=7300 sees only itself
    assert(out.map(_.getAs[Long]("n_range")).toSeq == Seq(1L, 2L, 3L, 1L))
    assert(out.map(_.getAs[Double]("sum_range")).toSeq ==
      Seq(1.0, 3.0, 6.0, 4.0))
  }

  test("velocityFeatures: one exchange feeds all four features") {
    val df = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val plan = graft.ext.Features.velocityFeatures(df, "user_id", "ts",
      "event_id", "value").queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n$plan")
  }

  test("skewReport surfaces heavy keys, nulls, and distinct counts") {
    val df = (Seq.fill(6)("hot") ++ Seq("a", "b") ++
      Seq(null.asInstanceOf[String], null.asInstanceOf[String]))
      .map(Tuple1(_)).toDF("k")
    val rows = graft.ext.Profile.skewReport(df, Seq("k"), topN = 2)
      .orderBy("rnk").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("value") == "hot")
    assert(rows(0).getAs[Double]("share") == 0.6)
    // null is a value and ranks by its count (2, tied with nothing)
    assert(rows(1).isNullAt(rows(1).fieldIndex("value")))
    assert(rows(0).getAs[Long]("n_distinct") == 4L)
    assert(rows(0).getAs[Long]("n_rows") == 10L)
  }

  test("functionalDependencies: exact FD, broken FD, g3 strength") {
    // a -> b holds; b -> a broken once (b=1 maps to a in {x,y});
    // strength of b -> a: keep majority per b-group = 3 of 4 rows
    val df = Seq(("x", 1), ("x", 1), ("y", 1), ("z", 2)).toDF("a", "b")
    val rows = graft.ext.Profile.functionalDependencies(df, Seq("a", "b"))
      .orderBy("determinant").collect()
    val ab = rows(0)
    assert(ab.getAs[Boolean]("fd_holds"))
    assert(ab.getAs[Double]("strength") == 1.0)
    assert(ab.getAs[Long]("n_groups") == 3L)
    val ba = rows(1)
    assert(!ba.getAs[Boolean]("fd_holds"))
    assert(ba.getAs[Long]("n_violating") == 1L)
    assert(ba.getAs[Double]("strength") == 0.75)
  }

  test("null-key groups survive madOutliers / robustScale / benfordDeviation " +
    "(null-safe join-back — the audit-pass-8 lens)") {
    // a null group key is a REAL group (dirty data routes there); the
    // per-group median/MAD/χ² joins must match its rows back instead of
    // silently dropping the whole group (null = null never equi-joins)
    val df = Seq(
      (Option("a"), 1.0), (Option("a"), 2.0), (Option("a"), 3.0),
      (Option.empty[String], 10.0), (Option.empty[String], 12.0),
      (Option.empty[String], 14.0))
      .toDF("k", "v")
    val mo = Stats.madOutliers(df, Seq("k"), "v").collect()
    assert(mo.length == 2, s"expected 2 groups, got ${mo.length}")
    val nullRow = mo.find(_.isNullAt(0)).get
    assert(nullRow.getAs[Long]("n") == 3L &&
      nullRow.getAs[Double]("median") == 12.0)
    val rs = Stats.robustScale(df, Seq("k"), "v").collect()
    assert(rs.length == 6, s"expected all 6 rows, got ${rs.length}")
    assert(rs.count(_.isNullAt(0)) == 3)
    val bd = Stats.benfordDeviation(
      df.withColumn("v", col("v") * 10), Seq("k"), "v").collect()
    // 9 digit rows per group, null group included, with its real counts
    assert(bd.length == 18)
    val nullD1 = bd.find(r => r.isNullAt(0) && r.getAs[Int]("digit") == 1).get
    assert(nullD1.getAs[Long]("n_d") == 3L) // 100, 120, 140 all lead with 1
    assert(!nullD1.isNullAt(nullD1.fieldIndex("chi2")))
  }

  test("groupCols = Nil yields the global profile (degenerate cross join)") {
    // the shared nullSafeEqui helper must keep the empty-keys shape the
    // pre-helper code had (a one-row cross join against the global
    // aggregate), not crash on an empty join condition
    val df = Seq(1.0, 2.0, 3.0, 100.0).toDF("v")
    val mo = Stats.madOutliers(df, Nil, "v").collect()
    assert(mo.length == 1 && mo.head.getAs[Long]("n") == 4L &&
      mo.head.getAs[Long]("n_outliers") == 1L)
    assert(Stats.robustScale(df, Nil, "v").count() == 4L)
    val bd = Stats.benfordDeviation(df, Nil, "v").collect()
    assert(bd.length == 9 &&
      bd.map(_.getAs[Long]("n_d")).sum == 4L)
  }

  test("weightOfEvidence fails loudly on an input with no complete pairs") {
    val empty = Seq((Option.empty[java.lang.Double], Option.empty[Boolean]))
      .toDF("v", "l")
    val e = intercept[IllegalArgumentException] {
      Stats.weightOfEvidence(empty, "v", "l")
    }
    assert(e.getMessage.contains("no distribution"))
  }

  test("chiSquareIndependence: independent table scores 0, dependent scores n") {
    // perfectly independent 2x2: chi2 = 0
    val ind = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val r1 = Stats.chiSquareIndependence(ind, "a", "b").collect().head
    assert(r1.getAs[Double]("chi2") == 0.0)
    assert(r1.getAs[Long]("dof") == 1L)
    // perfect association: chi2 = n
    val dep = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"))
      .toDF("a", "b")
    val r2 = Stats.chiSquareIndependence(dep, "a", "b").collect().head
    assert(r2.getAs[Double]("chi2") == 4.0)
    assert(r2.getAs[Long]("n") == 4L)
  }
}
