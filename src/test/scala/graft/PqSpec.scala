package graft

import org.apache.spark.sql.functions._

import graft.ext.Pq

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")

  test("codes are M nibbles in range and training is deterministic") {
    val m1 = Pq.train(emb, "vec_id", "embedding", dim = 64, m = 8, k = 16,
      iters = 2)
    val m2 = Pq.train(emb, "vec_id", "embedding", dim = 64, m = 8, k = 16,
      iters = 2)
    assert(m1 == m2, "same corpus + params must yield identical codebooks")
    assert(m1.m == 8 && m1.k == 16 && m1.subDim == 8)
    val codes = Pq.encode(emb, "vec_id", "embedding", m1)
    val bad = codes.filter(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c >= 16)).count()
    assert(bad == 0)
  }

  test("reconstruction beats the zero-information baseline by a wide margin") {
    val model = Pq.train(emb, "vec_id", "embedding", dim = 64, m = 8,
      k = 16, iters = 3)
    val v = col("embedding").cast("array<double>")
    // baseline: reconstruct every vector as the global mean — the best
    // constant predictor; PQ must capture per-vector structure beyond it
    val stats = emb
      .select(posexplode(v).as(Seq("pos", "x")))
      .groupBy("pos").agg(avg(col("x")).as("mu"))
      .agg(avg(col("mu") * col("mu")).as("mu2")).as[Double].head()
    val meanEnergy = emb
      .select(explode(v).as("x")).agg(avg(col("x") * col("x")))
      .as[Double].head()
    val baselineMse = meanEnergy - stats // E[x²] − E[x̄²] per coordinate
    val pqMse = Pq.reconstructionError(emb, "vec_id", "embedding", model)
      .agg(avg(col("mse"))).as[Double].head()
    assert(pqMse < baselineMse * 0.8,
      s"PQ mse $pqMse vs baseline $baselineMse")
  }

  test("ADC top-k recalls exact L2 neighbours on clustered vectors") {
    // clustered corpus — the shape real embeddings have (uniform gaussian
    // noise is the known-pathological case for ANY quantized ANN: all
    // pairwise distances concentrate and 8 nibbles can't rank them).
    // 100 deterministic centers × 30 members, noise ≪ center separation.
    val clustered = spark.range(3000).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), j =>
        sin((col("id") % 100) * lit(31.0) + j * lit(7.0)) +
          lit(0.1) * sin(col("id") * lit(13.0) + j * lit(17.0)))
        .as("embedding"))
    val model = Pq.train(clustered, "vec_id", "embedding", dim = 64, m = 8,
      k = 16, iters = 3)
    val encoded = Pq.encode(clustered, "vec_id", "embedding", model)
    val queries = clustered.filter(col("vec_id") < 5)
    // production contract: ADC shortlist (50) + exact rerank to 10 —
    // raw ADC alone can't order inside a Voronoi cell (ties by design)
    val approx = Pq.topKRerank(encoded, clustered, queries, model,
        "vec_id", "embedding", k = 10, shortlist = 50)
      .select(col("query_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    // exact L2 top-10 on the driver
    val all = clustered.select(col("vec_id"),
      col("embedding").cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val exact = all.filter(_._1 < 5).map { case (qid, qv) =>
      val top = all.filter(_._1 != qid)
        .map { case (nid, nv) =>
          var d = 0.0; var i = 0
          while (i < qv.length) { val t = qv(i) - nv(i); d += t * t; i += 1 }
          (nid, d)
        }
        .sortBy { case (nid, d) => (d, nid) }.take(10).map(_._1).toSet
      qid -> top
    }.toMap

    val recall = exact.map { case (qid, ex) =>
      approx.getOrElse(qid, Set.empty).intersect(ex).size.toDouble / ex.size
    }.sum / exact.size
    assert(recall >= 0.7, s"mean recall@10 $recall")
  }

  test("IVF-PQ recalls exact neighbours while probing a cell subset") {
    val clustered = spark.range(3000).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), j =>
        sin((col("id") % 100) * lit(31.0) + j * lit(7.0)) +
          lit(0.1) * sin(col("id") * lit(13.0) + j * lit(17.0)))
        .as("embedding"))
    val (index, encoded) = graft.ext.IvfPq.build(clustered, "vec_id",
      "embedding", dim = 64, kCells = 16, m = 8, kCodes = 16, iters = 2)
    val queries = clustered.filter(col("vec_id") < 5)
    val approx = graft.ext.IvfPq.topK(encoded, clustered, queries, index,
        "vec_id", "embedding", k = 10, nprobe = 4, shortlist = 50)
      .select(col("query_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    val all = clustered.select(col("vec_id"),
      col("embedding").cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val exact = all.filter(_._1 < 5).map { case (qid, qv) =>
      val top = all.filter(_._1 != qid)
        .map { case (nid, nv) =>
          var d = 0.0; var i = 0
          while (i < qv.length) { val t = qv(i) - nv(i); d += t * t; i += 1 }
          (nid, d)
        }
        .sortBy { case (nid, d) => (d, nid) }.take(10).map(_._1).toSet
      qid -> top
    }.toMap
    val recall = exact.map { case (qid, ex) =>
      approx.getOrElse(qid, Set.empty).intersect(ex).size.toDouble / ex.size
    }.sum / exact.size
    assert(recall >= 0.7, s"IVF-PQ mean recall@10 $recall")

    // broadcastQueries=false is a pure JOIN-STRATEGY switch: identical
    // rows to the default broadcast path (the all-pairs-shape contract)
    val queries2 = clustered.filter(col("vec_id") < 5)
    val shuffled = graft.ext.IvfPq.topK(encoded, clustered, queries2, index,
        "vec_id", "embedding", k = 10, nprobe = 4, shortlist = 50,
        broadcastQueries = false)
      .select("query_id", "neighbor_id", "dist", "rnk")
      .as[(Long, Long, Double, Long)].collect().toSet
    val bcast = graft.ext.IvfPq.topK(encoded, clustered, queries2, index,
        "vec_id", "embedding", k = 10, nprobe = 4, shortlist = 50)
      .select("query_id", "neighbor_id", "dist", "rnk")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(shuffled == bcast)
    encoded.unpersist()
  }

  test("IVF-PQ: wrong-dimension vectors cannot hijack the shortlist") {
    val clustered = spark.range(500).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)), j =>
        sin((col("id") % 20) * lit(31.0) + j * lit(7.0))).as("embedding"))
    // one corpus row with a truncated (wrong-dim) vector: its codes are
    // null; under NULLS FIRST ascending it would previously take rank 1
    // in EVERY query's shortlist
    val bad = spark.range(1).select(lit(99999L).as("vec_id"),
      transform(sequence(lit(0), lit(3)), j => lit(0.0)).as("embedding"))
    val corpus = clustered.unionByName(bad)
    val (index, encoded) = graft.ext.IvfPq.build(corpus, "vec_id",
      "embedding", dim = 16, kCells = 4, m = 4, kCodes = 8, iters = 1)
    val queries = clustered.filter(col("vec_id") < 3)
    val got = graft.ext.IvfPq.topK(encoded, corpus, queries, index,
        "vec_id", "embedding", k = 5, nprobe = 2)
      .collect()
    assert(got.nonEmpty)
    assert(!got.exists(_.getAs[Long]("neighbor_id") == 99999L))
    encoded.unpersist()
  }

  test("Pq.topK: null-codes corpus rows and wrong-dimension queries " +
    "cannot hijack or distort rankings") {
    val clustered = spark.range(300).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)), j =>
        sin((col("id") % 10) * lit(31.0) + j * lit(7.0))).as("embedding"))
    val badCorpus = spark.range(1).select(lit(77777L).as("vec_id"),
      transform(sequence(lit(0), lit(3)), j => lit(0.0)).as("embedding"))
    val model = Pq.train(clustered, "vec_id", "embedding", dim = 16,
      m = 4, k = 8, iters = 1)
    // the wrong-dim corpus row encodes to NULL codes; its NULL adist
    // sorts NULLS FIRST ascending and previously took rank 1 everywhere
    val encoded = Pq.encode(clustered.unionByName(badCorpus),
      "vec_id", "embedding", model)
    val q = clustered.filter(col("vec_id") < 3)
    val got = Pq.topK(encoded, q, model, "vec_id", "embedding", k = 5)
      .collect()
    assert(got.nonEmpty)
    assert(!got.exists(_.getAs[Long]("neighbor_id") == 77777L))
    // a wrong-dim QUERY would build its ADC table from truncated slices
    // and score finite-but-wrong distances — it must be excluded, not
    // silently mis-ranked
    val badQ = Pq.topK(encoded, badCorpus, model, "vec_id", "embedding",
      k = 5).collect()
    assert(badQ.isEmpty)
  }

  test("unrolled and data-driven encode plans produce identical codes") {
    val model = Pq.train(emb, "vec_id", "embedding", dim = 64, m = 8,
      k = 16, iters = 2)
    val v = col("embedding")
    val both = emb.limit(200).select(col("vec_id"),
      Pq.encodeUnrolled(v, model).as("a"),
      Pq.encodeDataDriven(v, model).as("b"))
    assert(both.filter(col("a") =!= col("b")).count() == 0)
    // the dispatch threshold routes a K=64 book through the lambda plan
    assert(8 * 64 > Pq.unrollLimit)
  }

  test("decode concatenates the selected centroids") {
    val model = Pq.train(emb, "vec_id", "embedding", dim = 64, m = 8,
      k = 16, iters = 1)
    val row = emb.limit(1)
      .select(Pq.decodeColumn(
        Pq.encodeColumn(col("embedding"), model), model).as("rec"))
      .collect().head.getSeq[Double](0)
    assert(row.length == 64)
  }
}
