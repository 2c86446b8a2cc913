package graft

import org.apache.spark.sql.functions._

import graft.ext.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank matches the closed form on a 3-cycle and conserves mass") {
    // a→b→c→a: perfect symmetry — every rank must be exactly 1/3
    val cycle = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val r = Graph.pageRank(cycle, iters = 20)
      .as[(String, Double)].collect().toMap
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-9, r))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("pageRank ranks a hub above spokes and handles dangling sinks") {
    // spokes 1..4 all link to hub 0; hub links nowhere (dangling)
    val star = (1 to 4).map(i => (i.toLong, 0L)).toDF("src", "dst")
    val r = Graph.pageRank(star, iters = 30)
      .as[(Long, Double)].collect().toMap
    assert(r(0L) > r(1L) * 2, r)       // hub dominates
    assert((1 to 4).forall(i => math.abs(r(i.toLong) - r(1L)) < 1e-12))
    assert(math.abs(r.values.sum - 1.0) < 1e-9) // dangling mass recycled
  }

  test("pageRank is stable under repartitioning") {
    val edges = spark.range(500).select(col("id").as("src"),
      ((col("id") * 7 + 3) % 200).as("dst"))
    val a = Graph.pageRank(edges, iters = 5)
      .as[(Long, Double)].collect().toMap
    val b = Graph.pageRank(edges.repartition(7), iters = 5)
      .as[(Long, Double)].collect().toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12, k) }
  }

  test("pageRankConverged early-stops with ranks identical to the full run") {
    // 3-cycle: uniform is stationary from iteration 0, so the very first
    // delta is FP noise and the tol gate fires immediately
    val cycle = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val (full, fullIters) = Graph.pageRankConverged(cycle, maxIters = 20)
    val (fast, fastIters) =
      Graph.pageRankConverged(cycle, maxIters = 20, tol = 1e-12)
    assert(fullIters == 20, fullIters) // tol=0 runs exactly maxIters
    assert(fastIters == 1, fastIters)  // gate fires on the first delta
    val fm = full.as[(String, Double)].collect().toMap
    val qm = fast.as[(String, Double)].collect().toMap
    assert(fm.keySet == qm.keySet)
    fm.foreach { case (k, v) => assert(math.abs(v - qm(k)) < 1e-12, k) }
  }

  test("degrees counts both directions with zero defaults") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val d = Graph.degrees(edges)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(d == Map(1L -> ((2L, 0L)), 2L -> ((1L, 1L)), 3L -> ((0L, 2L))))
  }

  test("triangleStats: K4 closed form, triangle-free path, dirty edges") {
    // K4: every vertex in 3 triangles, coefficient exactly 1
    val k4 = (for { a <- 1 to 4; b <- (a + 1) to 4 } yield (a.toLong, b.toLong))
      .toDF("src", "dst")
    val r4 = Graph.triangleStats(k4)
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r4.size == 4)
    assert(r4.values.forall(_ == ((3L, 3L, Some(1.0)))))
    // path 1-2-3-4 + noise: self-loop, duplicate + reversed edges must
    // collapse; no triangles anywhere; endpoints (deg 1) null coeff
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 2L), (2L, 1L),
      (1L, 2L)).toDF("src", "dst")
    val rp = Graph.triangleStats(path)
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(rp(1L) == ((1L, 0L, None)))
    assert(rp(2L) == ((2L, 0L, Some(0.0))))
    assert(rp(3L) == ((2L, 0L, Some(0.0))))
  }

  test("labelPropagation splits two triangles across a bridge") {
    // CC would merge everything reachable; LPA keeps the two dense
    // triangles as separate communities despite the 3–10 bridge.
    // Hand-traced sync rounds with min-tiebreak: after 4 rounds
    // {1,2,3} → label 1 and {10,11,12} → label 3, and round 5 is a
    // fixpoint (asserting both catches oscillation bugs).
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)).toDF("src", "dst")
    Seq(4, 5).foreach { iters =>
      val l = Graph.labelPropagation(edges, iters = iters)
        .as[(Long, Long)].collect().toMap
      assert(l == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
        10L -> 3L, 11L -> 3L, 12L -> 3L), s"iters=$iters")
    }
  }

  test("labelPropagation drops self-loops and is repartition-stable") {
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val a = Graph.labelPropagation(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    val b = Graph.labelPropagation(edges.repartition(7), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    // a triangle converges to the minimum id as the shared label
    assert(a.values.toSet == Set(1L))
  }
}
