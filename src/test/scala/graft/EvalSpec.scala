package graft

import org.apache.spark.sql.functions._

import graft.ext.{Eval, Preference, Sequences, TextStats}

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double) = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ---------- retrievalMetrics ----------

  test("retrievalMetrics matches hand-computed recall/MRR/nDCG") {
    val results = Seq(
      (1L, 20L, 1), (1L, 50L, 2), (1L, 10L, 3), (1L, 99L, 4))
      .toDF("query_id", "doc_id", "rnk")
    val qrels = Seq(
      (1L, 10L, 3), (1L, 20L, 2), (1L, 30L, 1))
      .toDF("query_id", "doc_id", "rel")
    val row = Eval.retrievalMetrics(results, qrels, "query_id", "doc_id",
      "rnk", "rel", k = 3).collect().head
    assert(row.getAs[Long]("n_rel") == 3)
    assert(row.getAs[Long]("n_hits") == 2) // docs 20 (r1) and 10 (r3)
    assert(row.getAs[Double]("recall_at_k") == r6(2.0 / 3.0))
    assert(row.getAs[Double]("mrr_at_k") == 1.0) // rank-1 hit
    val dcg = (math.pow(2, 2) - 1) / (math.log(2) / math.log(2)) +
      (math.pow(2, 3) - 1) / (math.log(4) / math.log(2))
    val idcg = (math.pow(2, 3) - 1) / 1.0 +
      (math.pow(2, 2) - 1) / (math.log(3) / math.log(2)) +
      (math.pow(2, 1) - 1) / (math.log(4) / math.log(2))
    assert(row.getAs[Double]("ndcg_at_k") == r6(dcg / idcg))
  }

  test("retrievalMetrics: judged query with zero hits scores zeros") {
    val results = Seq((7L, 5L, 1)).toDF("query_id", "doc_id", "rnk")
    val qrels = Seq((7L, 6L, 1), (8L, 6L, 2))
      .toDF("query_id", "doc_id", "rel")
    val out = Eval.retrievalMetrics(results, qrels, "query_id", "doc_id",
      "rnk", "rel", k = 10).orderBy("query_id").collect()
    // query 7 judged (doc 6) but retrieved only doc 5; query 8 never
    // retrieved at all — both present, both zero
    assert(out.length == 2)
    for (r <- out) {
      assert(r.getAs[Long]("n_hits") == 0)
      assert(r.getAs[Double]("recall_at_k") == 0.0)
      assert(r.getAs[Double]("mrr_at_k") == 0.0)
      assert(r.getAs[Double]("ndcg_at_k") == 0.0)
    }
  }

  test("retrievalMetrics ignores hits past the cutoff") {
    val results = Seq((1L, 10L, 11)).toDF("query_id", "doc_id", "rnk")
    val qrels = Seq((1L, 10L, 1)).toDF("query_id", "doc_id", "rel")
    val row = Eval.retrievalMetrics(results, qrels, "query_id", "doc_id",
      "rnk", "rel", k = 10).collect().head
    assert(row.getAs[Long]("n_hits") == 0)
    assert(row.getAs[Double]("ndcg_at_k") == 0.0)
  }

  test("retrievalMetrics: perfect ranking scores nDCG = 1") {
    val qrels = Seq((1L, 1L, 3), (1L, 2L, 2), (1L, 3L, 1))
      .toDF("query_id", "doc_id", "rel")
    val results = Seq((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3))
      .toDF("query_id", "doc_id", "rnk")
    val row = Eval.retrievalMetrics(results, qrels, "query_id", "doc_id",
      "rnk", "rel", k = 3).collect().head
    assert(row.getAs[Double]("ndcg_at_k") == 1.0)
    assert(row.getAs[Double]("recall_at_k") == 1.0)
  }

  // ---------- cohenKappa ----------

  test("cohenKappa matches the textbook 2x2 example") {
    // confusion table [[20, 5], [10, 15]]: po = 0.7, pe = 0.5, κ = 0.4
    val rows =
      Seq.fill(20)(("g", "x", "x")) ++ Seq.fill(5)(("g", "x", "y")) ++
        Seq.fill(10)(("g", "y", "x")) ++ Seq.fill(15)(("g", "y", "y"))
    val df = rows.toDF("grp", "a", "b")
    val row = Eval.cohenKappa(df, Seq("grp"), "a", "b").collect().head
    assert(row.getAs[Long]("n") == 50)
    assert(row.getAs[Double]("po") == 0.7)
    assert(row.getAs[Double]("pe") == 0.5)
    assert(row.getAs[Double]("kappa") == r6(0.4))
  }

  test("cohenKappa: perfect constant agreement yields null kappa, " +
      "null labels counted as excluded") {
    val df = (Seq.fill(3)(("g1", "x", "x")) :+ (("g1", null, "x")))
      .toDF("grp", "a", "b")
    val row = Eval.cohenKappa(df, Seq("grp"), "a", "b").collect().head
    assert(row.getAs[Long]("n") == 3)
    assert(row.getAs[Long]("n_excluded") == 1)
    assert(row.getAs[Double]("po") == 1.0)
    assert(row.getAs[Double]("pe") == 1.0) // both labelers constant
    assert(row.isNullAt(row.fieldIndex("kappa")))
  }

  test("cohenKappa: independent labelers give kappa near 0, " +
      "disjoint categories give pe = 0") {
    // disjoint label sets: never agree, pe = 0 → κ = (0-0)/(1-0) = 0
    val df = Seq(("g", "x", "p"), ("g", "y", "q"), ("g", "x", "q"))
      .toDF("grp", "a", "b")
    val row = Eval.cohenKappa(df, Seq("grp"), "a", "b").collect().head
    assert(row.getAs[Double]("po") == 0.0)
    assert(row.getAs[Double]("pe") == 0.0)
    assert(row.getAs[Double]("kappa") == 0.0)
  }

  // ---------- bradleyTerry ----------

  test("bradleyTerry recovers the closed-form two-item strength") {
    // A beats B 3:1 → BT fixpoint s_A/(s_A+s_B) = 3/4; normalized
    // strengths (0.75, 0.25), and MM converges there in one step for
    // two items
    val comps = (Seq.fill(3)(("A", "B")) :+ (("B", "A")))
      .toDF("winner", "loser")
    val out = Preference.bradleyTerry(comps, "winner", "loser", iters = 10)
      .orderBy("item").collect()
    assert(out.map(_.getAs[String]("item")).toSeq == Seq("A", "B"))
    assert(math.abs(out(0).getAs[Double]("strength") - 0.75) < 1e-6)
    assert(math.abs(out(1).getAs[Double]("strength") - 0.25) < 1e-6)
    assert(out(0).getAs[Long]("wins") == 3)
    assert(out(0).getAs[Long]("n_comp") == 4)
  }

  test("bradleyTerry: strengths sum to 1 and order follows dominance") {
    // transitive round-robin: A beats B 4:1, B beats C 4:1, A beats C 4:1
    val comps = (
      Seq.fill(4)(("A", "B")) ++ Seq.fill(1)(("B", "A")) ++
        Seq.fill(4)(("B", "C")) ++ Seq.fill(1)(("C", "B")) ++
        Seq.fill(4)(("A", "C")) ++ Seq.fill(1)(("C", "A")))
      .toDF("winner", "loser")
    val out = Preference.bradleyTerry(comps, "winner", "loser", iters = 30)
      .orderBy("item").collect()
    val s = out.map(r => r.getAs[String]("item") ->
      r.getAs[Double]("strength")).toMap
    assert(math.abs(s.values.sum - 1.0) < 1e-6)
    assert(s("A") > s("B") && s("B") > s("C"))
  }

  test("bradleyTerry: driver fast path matches the distributed loop") {
    // 12 items, seeded random outcomes — run both paths (maxLocalPairs
    // = -1 forces the distributed loop) and demand identical rounded
    // output; also covers a zero-win item pair (L0 never wins)
    val rnd = new scala.util.Random(7)
    val comps = (Seq.tabulate(300) { _ =>
      val a = "I" + rnd.nextInt(11)
      val b = "I" + ((rnd.nextInt(10) + 1 + rnd.nextInt(11)) % 11)
      if (a == b) ("I1", "I2") else (a, b)
    } ++ Seq(("I3", "L0"), ("I4", "L0"))).toDF("winner", "loser")
    val local = Preference.bradleyTerry(comps, "winner", "loser",
      iters = 10).orderBy("item").collect()
    val dist = Preference.bradleyTerry(comps, "winner", "loser",
      iters = 10, maxLocalPairs = -1).orderBy("item").collect()
    assert(local.length == dist.length && local.length >= 12)
    local.zip(dist).foreach { case (l, d) =>
      assert(l.getAs[String]("item") == d.getAs[String]("item"))
      assert(l.getAs[Long]("wins") == d.getAs[Long]("wins"))
      assert(l.getAs[Long]("n_comp") == d.getAs[Long]("n_comp"))
      assert(l.getAs[Double]("strength") == d.getAs[Double]("strength"),
        s"strength mismatch for ${l.getAs[String]("item")}")
    }
  }

  test("bradleyTerry: zero-win item lands at strength 0") {
    val comps = Seq(("A", "B"), ("A", "B"), ("C", "B"))
      .toDF("winner", "loser")
    val out = Preference.bradleyTerry(comps, "winner", "loser", iters = 5)
      .orderBy("item").collect()
    val b = out.find(_.getAs[String]("item") == "B").get
    assert(b.getAs[Long]("wins") == 0)
    assert(b.getAs[Double]("strength") == 0.0)
  }

  // ---------- assembleTranscripts ----------

  test("assembleTranscripts keeps whole most-recent turns within budget") {
    val turns = Seq(
      (1L, 1L, "user", "one two three"),      // 3 tokens — dropped
      (1L, 2L, "assistant", "four five"),     // 2 tokens — kept
      (1L, 3L, "user", "six"))                // 1 token  — kept
      .toDF("conv", "turn_id", "role", "txt")
    val row = Sequences.assembleTranscripts(turns, "conv", Seq("turn_id"),
      "role", "txt", tokenBudget = 3L).collect().head
    assert(row.getAs[Long]("n_turns") == 3)
    assert(row.getAs[Long]("n_turns_kept") == 2)
    assert(row.getAs[Long]("n_tokens_kept") == 3)
    assert(row.getAs[Boolean]("is_alternating"))
    assert(row.getAs[String]("transcript") ==
      "assistant: four five\nuser: six")
  }

  test("assembleTranscripts flags broken alternation on the FULL " +
      "conversation and empties oversized-final-turn transcripts") {
    val turns = Seq(
      (1L, 1L, "user", "a"), (1L, 2L, "user", "b"), // broken here
      (1L, 3L, "assistant", "c"),
      (2L, 1L, "user", "one two three four five")) // 5 tokens > budget
      .toDF("conv", "turn_id", "role", "txt")
    val out = Sequences.assembleTranscripts(turns, "conv", Seq("turn_id"),
      "role", "txt", tokenBudget = 4L).orderBy("conv").collect()
    assert(!out(0).getAs[Boolean]("is_alternating"))
    assert(out(1).getAs[Long]("n_turns_kept") == 0)
    assert(out(1).getAs[Long]("n_tokens_kept") == 0)
    assert(out(1).getAs[String]("transcript") == "")
  }

  // ---------- codeSignals ----------

  test("codeSignals separates code from prose and handles null text") {
    val docs = Seq(
      (1L, "def f(x):\n  return x; y = [1];\n  if (x) { g(); }"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextStats.codeSignals(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Boolean]("is_code"))
    assert(out(0).getAs[Double]("code_score") > 0.5)
    assert(!out(1).getAs[Boolean]("is_code"))
    assert(out(1).getAs[Double]("sym_ratio") == 0.0)
    assert(out(2).getAs[Double]("code_score") == 0.0)
    assert(!out(2).getAs[Boolean]("is_code"))
  }

  test("binaryAuc: separation, hand pairs, ties, degenerate input") {
    import spark.implicits._
    def auc(rows: Seq[(Double, Boolean)]): Option[Double] = {
      val r = graft.ext.Eval.binaryAuc(rows.toDF("s", "y"), "s", "y")
        .collect().head
      if (r.isNullAt(2)) None else Some(r.getDouble(2))
    }
    // perfect separation
    assert(auc(Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true)))
      == Some(1.0))
    // hand-counted pairwise wins: pos {1,3} vs neg {2,4} -> 1/4
    assert(auc(Seq((1.0, true), (3.0, true), (2.0, false), (4.0, false)))
      == Some(0.25))
    // full tie: every pos-neg pair is half a win
    assert(auc(Seq((2.0, true), (2.0, false))) == Some(0.5))
    // inverted scorer
    assert(auc(Seq((4.0, false), (3.0, false), (1.0, true), (2.0, true)))
      == Some(0.0))
    // single class: undefined
    assert(auc(Seq((1.0, true), (2.0, true))) == None)
  }

  test("binaryAuc two-phase prefix equals the driver recompute on a " +
    "many-partition continuous-score frame; NaN scores are excluded") {
    import spark.implicits._
    // 2000 distinct continuous scores spread over many range partitions
    val rows = (1 to 2000).map { i =>
      (math.sin(i * 0.7) * 100 + i * 0.001, i % 3 == 0)
    }
    val withNaN = rows :+ ((Double.NaN, true))
    val got = graft.ext.Eval.binaryAuc(
      spark.createDataFrame(withNaN).toDF("s", "y")
        .repartition(16), "s", "y").collect().head
    // driver-side Mann-Whitney over the finite rows only
    val pos = rows.filter(_._2).map(_._1).sorted
    val neg = rows.filter(!_._2).map(_._1).sorted
    val u = pos.map(p => neg.count(_ < p) + neg.count(_ == p) / 2.0).sum
    val expected = u / (pos.size.toDouble * neg.size.toDouble)
    assert(got.getAs[Long]("n_pos") == pos.size, "NaN row not excluded")
    assert(math.abs(got.getAs[Double]("auc") -
      math.rint(expected * 1e6) / 1e6) < 1e-9)
  }
}
