package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, StringType}

/** Scale smoke: run the heavy operators on synthetic volumes 20–40× the
  * sf0.1 bench (2M transactions, 100k documents, 200k embeddings) and
  * print wall-clock per stage. Not part of the driver gate — this is the
  * evidence run that the shuffle-bounded designs hold as data grows
  * (`sbt "runMain graft.ScaleSmoke"`).
  */
object ScaleSmoke {

  private val vocab = Seq("the", "fast", "key", "order", "sort", "table",
    "scan", "merge", "part", "window", "small", "hash", "join", "stream",
    "customer", "data", "group", "query", "row", "slow", "filter", "line",
    "batch", "value", "spark", "index", "cache", "disk", "node", "shard",
    "plan", "cost", "stats", "page", "block", "tuple", "field", "type",
    "null", "count")

  /** n synthetic docs, 50–250 words each, from counter-based hashing. */
  def syntheticDocs(spark: SparkSession, n: Long): DataFrame =
    syntheticDocs(spark, 0L, n)

  /** Id-ranged variant: text derives from the id alone, so
    * `syntheticDocs(s, lo, hi)` equals `syntheticDocs(s, hi)` filtered to
    * `[lo, hi)` — WITHOUT generating the `[0, lo)` prefix (generating a
    * corpus-sized frame to slice off a delta would bill O(corpus) work
    * to an O(delta) measurement). */
  def syntheticDocs(spark: SparkSession, lo: Long, hi: Long): DataFrame = {
    val nWords = (pmod(xxhash64(col("id"), lit("nw")), lit(200)) + 50)
      .cast(IntegerType)
    val words = typedlit(vocab)
    spark.range(lo, hi).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), nWords - 1),
        i => element_at(words,
          pmod(xxhash64(col("id"), i), lit(vocab.size)).cast(IntegerType) + 1)))
        .as("text"))
  }

  /** n synthetic 64-dim embeddings (hash-gaussian-ish via sums of uniforms). */
  def syntheticEmbeddings(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        ((pmod(xxhash64(col("id"), i), lit(2000)).cast(DoubleType) / 1000.0) - 1.0)
          .cast(FloatType)).as("embedding"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale] $label%-50s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    // 2M fintech transactions end-to-end
    val bronze = generator.DataGenerator
      .transactions(spark, 2000000, nCustomers = 100000, nMerchants = 5000)
    val silver = ops.SilverPipeline.transactionsToSilver(bronze)
      .persist()
    time("2M bronze→silver materialize") { silver.count() }
    time("2M gold daily metrics") {
      gold.FintechGold.aggDailyMetrics(silver).count() }
    time("2M AML structuring window") {
      gold.FintechGold.amlStructuring(silver).count() }
    time("2M customer-360") {
      gold.FintechGold.aggCustomer360(silver,
        ops.SilverPipeline.customersToSilver(
          generator.DataGenerator.customers(spark, 100000),
          asOf = lit("2024-06-01").cast("date"))).count() }
    // the two-phase rank on a LOW-cardinality group — the shape a raw
    // Window.partitionBy would collapse to #groups straggler tasks
    time("2M two-phase rank within 4 status groups") {
      ops.Transforms.rankWithinGroupScalable(silver, "amt_rank",
        Seq("status"),
        Seq(col("amount_usd").desc, col("transaction_id"))).count() }
    // device_id is near-event-cardinality — the domain where the exact
    // explode form degrades and the sketch form is the 100 TB answer
    time("2M rolling active devices (per-day HLL union)") {
      monitoring.Monitoring.rollingActiveUsersApprox(
        silver, "transaction_timestamp", "device_id").count() }
    silver.unpersist()

    // 100k docs near-dup + text analysis
    val docs = syntheticDocs(spark, 100000).persist()
    time("100k docs materialize") { docs.count() }
    time("100k docs text stats + quality") {
      ext.TextStats.stats(docs, "doc_id", "text").count() }
    time("100k docs minhash LSH near-dup") {
      ext.Dedup.minHashLsh(docs, "doc_id", "text", 3, 8, 4, 0.5).count() }
    time("100k docs simhash pairs") {
      ext.Dedup.simHashPairs(docs, "doc_id", "text", 3).count() }
    docs.unpersist()

    // 200k embeddings ANN
    val emb = syntheticEmbeddings(spark, 200000).persist()
    time("200k embeddings materialize") { emb.count() }
    val queries = emb.filter(col("vec_id") < 100)
    time("200k brute-force top-5 (100 queries)") {
      ext.Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5).count() }
    time("200k LSH top-5 (100 queries)") {
      ext.Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5,
        numPlanes = 10, dim = 64).count() }
    // SemDeDup: 100k vectors in 128 k-means cells → ~780 per cell, so the
    // within-cell pairwise stage does ~40M dot products total — the
    // bounded-by-cell-size shape that must hold as k grows with the corpus
    time("100k embeddings SemDeDup (128 k-means cells)") {
      ext.Similarity.semDedup(emb.filter(col("vec_id") < 100000),
        "vec_id", "embedding", minCos = 0.99, k = 128, iters = 2).count() }
    emb.unpersist()

    // 2M-row deterministic sampling (map-only — should track scan speed)
    val big = spark.range(2000000).select(col("id"),
      element_at(typedlit(Seq("web", "books", "code")),
        pmod(col("id"), lit(3)).cast(IntegerType) + 1).as("source"))
    time("2M hashSplit train/val/test") {
      ext.Sampling.hashSplit(big, "id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .groupBy("split").count().count() }
    time("2M stratified mixture sample") {
      ext.Sampling.stratifiedSample(big, "source", "id",
        Map("books" -> 1.0, "web" -> 0.1), defaultRate = 0.5).count() }
    time("2M-doc sequence packing (two-phase cumsum)") {
      ext.Packing.packByBudgetScalable(
        big.select(col("id"),
          (pmod(xxhash64(col("id"), lit("tk")), lit(900)) + 100).as("n_tokens")),
        "id", "n_tokens", 4096)
        .groupBy("pack_id").count().count() }

    // budget-constrained quality selection at 2M docs: fixed driver
    // choreography (one group histogram + one boundary-group cumsum +
    // one filtered output scan) regardless of volume — the corpus itself
    // never shuffles
    time("2M-doc budget selection (40% token budget)") {
      val scored = big.select(col("id"),
        (pmod(xxhash64(col("id"), lit("q")), lit(1000)).cast(DoubleType) /
          1000.0).as("score"),
        (pmod(xxhash64(col("id"), lit("tk")), lit(900)) + 100).as("toks"))
      val total = scored.agg(sum(col("toks"))).head().getLong(0)
      ext.Sampling.selectByTokenBudget(scored, "id", "score", "toks",
        total * 2 / 5).count() }

    // 2M docs through the retrieval/LM/decontamination operators
    val corpus = syntheticDocs(spark, 2000000).persist()
    time("2M docs materialize") { corpus.count() }
    time("2M docs chunk (32/24 sliding windows)") {
      ext.Retrieval.chunk(corpus, "doc_id", "text", 32, 24).count() }
    time("2M docs bm25 (4-term query)") {
      ext.Retrieval.bm25(corpus, "doc_id", "text",
        Seq("join", "spark", "window", "merge")).count() }
    time("2M docs vocabulary") {
      ext.TextModel.vocabulary(corpus, "doc_id", "text").count() }
    // heavy hitters vs vocabulary: a per-doc junk token makes the domain
    // 2M+ distinct terms — vocabulary must shuffle all of them, the MG
    // screen shuffles only its bounded candidate set
    time("2M docs exact heavy hitters (2M+ distinct, MG screen)") {
      ext.HeavyHitters.frequentTokens(
        corpus.select(concat(col("text"), lit(" u"), col("doc_id"))
          .as("text")),
        "text", minFreqRatio = 0.01).count() }
    // DSIR: two bucket-LM aggregates (map-side combine onto 64 keys) +
    // one narrow scoring/top-k pass — three scans total, no corpus join
    time("2M docs DSIR importance resample (top 100k vs 20k target)") {
      ext.Dsir.resample(corpus,
        corpus.filter(col("doc_id") % 100 === 0), "doc_id", "text",
        k = 100000).count() }
    time("2M docs unigram LM scoring") {
      ext.TextModel.unigramNll(corpus, "doc_id", "text").count() }
    time("2M docs interpolated bigram LM scoring") {
      ext.TextModel.bigramNll(corpus, "doc_id", "text").count() }
    time("2M docs decontaminate vs 2k bench") {
      ext.Decontam.contaminated(corpus,
        corpus.filter(col("doc_id") % 1000 === 0), "doc_id", "text",
        n = 13).count() }
    time("2M docs BLOOM-screened decontaminate vs 2k bench") {
      ext.Decontam.contaminatedScreened(corpus,
        corpus.filter(col("doc_id") % 1000 === 0), "doc_id", "text",
        n = 13).count() }
    time("500k docs exact-substring dedup (8-token spans)") {
      ext.TextPipeline.dedupSpans(corpus.filter(col("doc_id") < 500000),
        "doc_id", "text", n = 8).count() }
    time("2M docs deterministic shuffle") {
      ext.Sampling.shuffled(corpus, "doc_id", seed = 1).count() }
    // incremental dedup: build the kept index ONCE (the corpus-wide
    // one-off; at 100 TB it lives in the lakehouse and is appended), then
    // match a 20k-doc delta — 10k novel docs + 10k perturbed copies of
    // kept docs — whose cost must track the DELTA, not the corpus
    val idx0 = ext.Dedup.buildNearDupIndex(corpus, "doc_id", "text")
    val idx = idx0.copy(sets = idx0.sets.persist(),
      banded = idx0.banded.persist())
    time("2M-doc near-dup index build (one-off)") {
      idx.sets.count() + idx.banded.count() }
    val delta = syntheticDocs(spark, 2010000)
      .filter(col("doc_id") >= 2000000L) // genuinely novel synthetic text
      .unionByName(corpus.filter(col("doc_id") < 10000)
        .select((col("doc_id") + 4000000L).as("doc_id"),
          concat(col("text"), lit(" zq")).as("text")))
    time("20k-delta incremental match vs 2M index") {
      ext.Dedup.incrementalNearDupMatches(delta, idx, "doc_id", "text",
        minJaccard = 0.8, maxBucketSize = 1000).count() }
    idx.sets.unpersist(); idx.banded.unpersist()
    corpus.unpersist()

    // 1.2M-edge pair graph: far above the 200k default driver gate (and
    // above the 1M opt-in exercised below) → exercises the distributed
    // min-label path. maxDriverEdges = 0 skips the gate's probe collect so
    // the timing measures ONLY the distributed path.
    val bigPairs = spark.range(1200000).select(
      (col("id") + 1000000L).as("a"),
      // ~100k chains of ~12 nodes each
      when(col("id") % 12 === 0, col("id") + 1000000L)
        .otherwise(col("id") + 999999L).as("b"))
    time("1.2M-edge distributed connected components") {
      ext.Dedup.connectedComponents(bigPairs, maxDriverEdges = 0).count() }
    time("0.9M-edge driver union-find connected components") {
      // gate raised explicitly: the 200k default would route this
      // distributed; a big driver can opt in to larger graphs
      ext.Dedup.connectedComponents(
        bigPairs.filter(col("a") < 1900000L),
        maxDriverEdges = 1000000).count() }

    // round-5 operators: grid range join, profile, URL hygiene, BPE, SCD2
    val pts5m = spark.range(5000000).select(col("id").as("p_id"),
      pmod(xxhash64(col("id"), lit("v")), lit(10000000L)).as("v"))
    val iv200k = spark.range(200000).select(col("id").as("i_id"),
      pmod(xxhash64(col("id"), lit("lo")), lit(10000000L)).as("lo"))
      .withColumn("hi", col("lo") +
        pmod(xxhash64(col("i_id"), lit("w")), lit(100L)) + 1)
    time("5M points × 200k intervals grid range join") {
      ext.RangeJoin.pointInInterval(pts5m, iv200k, "v", "lo", "hi",
        binWidth = 64).count() }
    val wide = spark.range(2000000).select(col("id"),
      element_at(typedlit(Seq("web", "books", "code")),
        pmod(col("id"), lit(3)).cast(IntegerType) + 1).as("source"),
      (pmod(xxhash64(col("id")), lit(100000L)).cast(DoubleType) / 100.0)
        .as("v"))
    time("2M-row HLL column profile (single pass, no Expand)") {
      ext.Profile.summarize(wide, Seq("id", "source", "v"),
        exactDistinct = false).count() }
    time("2M URL normalize + registrable domain") {
      wide.select(
        ext.Web.normalizeUrl(concat(lit("https://www."), col("source"),
          lit(".example.com/p/"), col("id"),
          lit("?utm_source=x&b=2&a=1#f"))).as("u"),
        ext.Web.registeredDomain(col("source"))).count() }
    val corpus2 = syntheticDocs(spark, 2000000).persist()
    corpus2.count()
    val merges = ext.Bpe.train(corpus2.limit(200000), "text",
      numMerges = 50, maxWords = 100000)
    time("2M docs BPE encode (50 merges)") {
      corpus2.select(explode(ext.Bpe.encode(col("text"), merges))).count() }
    corpus2.unpersist()
    val changes = spark.range(2000000).select(
      pmod(col("id"), lit(200000L)).as("cust"), col("id").as("ts"),
      pmod(xxhash64(col("id")), lit(5L)).as("tier"))
    time("2M-change SCD2 build (200k keys)") {
      ops.Scd2.build(changes, "cust", "ts").count() }

    // round-6 operators: PQ, quality classifier, mixture, Z-order, dHash
    val emb6 = syntheticEmbeddings(spark, 200000).persist()
    emb6.count()
    val pqModel = ext.Pq.train(emb6, "vec_id", "embedding", dim = 64,
      m = 8, k = 16, iters = 2)
    val pqCodes = ext.Pq.encode(emb6, "vec_id", "embedding", pqModel)
      .persist()
    time("200k embeddings PQ encode (8×16 codebooks)") { pqCodes.count() }
    time("200k PQ ADC+rerank top-5 (100 queries)") {
      ext.Pq.topKRerank(pqCodes, emb6, emb6.filter(col("vec_id") < 100),
        pqModel, "vec_id", "embedding", k = 5, shortlist = 50).count() }
    pqCodes.unpersist(); emb6.unpersist()

    val docs6 = syntheticDocs(spark, 500000).persist()
    docs6.count()
    val qcModel = ext.QualityClassifier.distill(
      docs6.limit(50000), "text",
      ext.TextStats.qualityScore(col("text")), threshold = 0.8,
      dim = 64, maxIter = 20)
    time("500k docs quality-classifier scoring (Column fold)") {
      docs6.select(ext.QualityClassifier.scoreColumn(col("text"), qcModel))
        .count() }
    docs6.unpersist()

    val mix = spark.range(2000000).select(col("id"),
      element_at(typedlit(Seq("web", "books", "code", "wiki")),
        pmod(col("id"), lit(4)).cast(IntegerType) + 1).as("source"),
      (pmod(xxhash64(col("id"), lit("tk")), lit(900)) + 100).as("n_tokens"))
    time("2M-doc temperature mixture sample (α=0.5)") {
      ext.Sampling.mixtureSample(mix, "source", "id", "n_tokens",
        alpha = 0.5, targetTokens = 2000000000L).count() }
    time("2M-row Z-order cluster (2 dims, 64 files)") {
      ext.Layout.zorderCluster(
        mix.select(col("id"), col("n_tokens")), Seq("id", "n_tokens"),
        numFiles = 64).count() }

    time("100k synthetic-PNG render + dHash + Hamming pairs") {
      ext.Multimodal.imageNearDupPairs(
        ext.Multimodal.syntheticImageAssets(
          spark.range(100000).select(col("id").as("doc_id")),
          groups = 5000),
        maxHamming = 3).count() }

    // IVF-PQ end-to-end: residual-coded index + cell-confined search
    val emb7 = syntheticEmbeddings(spark, 200000).persist()
    emb7.count()
    var ivfpqIdx: ext.IvfPq.Index = null
    var ivfpqEnc: DataFrame = null
    time("200k IVF-PQ index build (coarse+residual codebooks)") {
      val built = ext.IvfPq.build(emb7, "vec_id", "embedding",
        dim = 64, kCells = 16, m = 8, kCodes = 16, iters = 2)
      ivfpqIdx = built._1; ivfpqEnc = built._2
      ivfpqEnc.count() }
    time("200k IVF-PQ top-5 (100 queries, nprobe 4)") {
      ext.IvfPq.topK(ivfpqEnc, emb7, emb7.filter(col("vec_id") < 100),
        ivfpqIdx, "vec_id", "embedding", k = 5, nprobe = 4,
        shortlist = 50).count() }
    ivfpqEnc.unpersist(); emb7.unpersist()

    // 2M-edge PageRank: each iteration = one keyed shuffle + broadcast
    // dangling aggregate; cost must be linear in edges × iters
    val links = spark.range(2000000).select(
      pmod(col("id"), lit(500000L)).as("src"),
      pmod(xxhash64(col("id"), lit("dst")), lit(500000L)).as("dst"))
    time("2M-edge PageRank (5 iterations, 500k vertices)") {
      ext.Graph.pageRank(links, iters = 5).count() }

    // same edge volume through label propagation: per round one
    // vote-count shuffle + keyed argmax — also linear in edges × iters
    time("2M-edge label propagation (5 rounds, 500k vertices)") {
      ext.Graph.labelPropagation(links, iters = 5).count() }

    // winnowing pair matcher: fingerprint explode is ~2/(w+1) of corpus
    // grams, the df screen caps per-key join fan-out at maxDf² — pair
    // time must track corpus size, not corpus²
    time("500k docs winnowing near-dup pairs (df-screened)") {
      ext.Dedup.winnowPairs(syntheticDocs(spark, 500000), "doc_id",
        "text", maxDf = 20, minShared = 2, exact = false).count() }

    // triangle enumeration cost is Σ deg² — on this 2M-edge graph the
    // canonical-edge joins stay keyed-hash, no cross join
    time("2M-edge triangle counts + clustering coefficients") {
      ext.Graph.triangleStats(links).count() }

    // association rules over 2M (user, item) rows, 200k baskets of ≤10
    // items — pair fan-out bounded by the basket cap
    time("2M-row association rules (200k baskets, 40 items)") {
      val rows = spark.range(2000000).select(
        pmod(col("id"), lit(200000L)).as("user"),
        pmod(xxhash64(col("id"), lit("it")), lit(40L)).as("item"))
      ext.Associations.pairRules(rows, "user", "item",
        minSupport = 0.001, maxBasket = 20).count() }

    // rolling velocity features: one shuffle on the entity, all four
    // features on one sort — linear in events
    time("2M events velocity features (lag/rolling/range)") {
      val ev = spark.range(2000000).select(
        pmod(col("id"), lit(200000L)).as("user_id"),
        col("id").as("event_id"),
        timestamp_seconds(lit(1700000000L) +
          pmod(xxhash64(col("id"), lit("t")), lit(86400L * 30))).as("ts"),
        (pmod(xxhash64(col("id"), lit("v")), lit(10000L)).cast(DoubleType)
          / 100.0).as("value"))
      ext.Features.velocityFeatures(ev, "user_id", "ts", "event_id",
        "value").count() }

    // mergeable aggregate states at volume: the per-day-fold shapes.
    // distinct IVM state is one keyed aggregate + one keyed merge (cost
    // tracks the delta); HLL/KLL states are bounded bytes per key and
    // fold associatively — the 100 TB rollup primitives
    locally {
      val rows = spark.range(2000000).select(
        pmod(col("id"), lit(1000L)).cast(StringType).as("g"),
        pmod(xxhash64(col("id"), lit("u")), lit(100000L)).as("u"),
        (pmod(col("id") * 7, lit(10000)).cast(DoubleType) / 100.0).as("v"))
      val half1 = rows.filter(col("id") % 2 === 0)
      val half2 = rows.filter(col("id") % 2 === 1)
      time("2M-row distinct IVM: state + 1M-row insert-feed fold") {
        val st = ops.IncrementalAgg.distinctState(half1, Seq("g"), "u")
        val feed = half2.withColumn("_change_type", lit("insert"))
        ops.IncrementalAgg.finalizeDistinct(
          ops.IncrementalAgg.applyChangeFeedDistinct(
            st, feed, Seq("g"), "u"), Seq("g")).count() }
      time("2M-row HLL distinct states (1000 keys, 2-way merge)") {
        ops.IncrementalAgg.finalizeHll(
          ops.IncrementalAgg.mergeHllStates(
            Seq(ops.IncrementalAgg.hllState(half1, Seq("g"), "u"),
              ops.IncrementalAgg.hllState(half2, Seq("g"), "u")),
            Seq("g")), Seq("g")).count() }
      time("2M-row KLL quantile states (1000 keys, 2-way merge)") {
        ops.IncrementalAgg.finalizeQuantiles(
          ops.IncrementalAgg.mergeQuantileStates(
            Seq(ops.IncrementalAgg.quantileState(half1, Seq("g"), "v"),
              ops.IncrementalAgg.quantileState(half2, Seq("g"), "v")),
            Seq("g")), Seq("g")).count() }
    }

    // q96 flagship composition at 2 volumes: with computeStats=false the
    // driver choreography is FIXED — the Spark job count must not grow
    // with data, only per-job work does. Job ids are counted per run via
    // a job group (public statusTracker API).
    def q96At(n: Long, tag: String): (Double, Int) = {
      val d = syntheticDocs(spark, n).withColumn("source",
        element_at(typedlit(Seq("web", "books", "code")),
          pmod(col("doc_id"), lit(3)).cast(IntegerType) + 1))
      val sc = spark.sparkContext
      sc.setJobGroup(tag, tag, interruptOnCancel = false)
      val t0 = System.nanoTime()
      val r = ext.TextPipeline.prepareTrainingData(d, "doc_id", "text",
        sourceCol = "source",
        benchmark = Some(d.filter(col("doc_id") % 97 === 0)),
        computeStats = false)
      val secs = (System.nanoTime() - t0) / 1e9
      sc.clearJobGroup()
      Thread.sleep(500) // let the async listener bus drain job-start events
      r.data.unpersist()
      (secs, sc.statusTracker.getJobIdsForGroup(tag).length)
    }
    locally {
      val (t1, j1) = q96At(100000, "q96-100k")
      val (t2, j2) = q96At(400000, "q96-400k")
      println(f"[scale] q96 training-data composition 100k docs $t1%8.2f s  ($j1 jobs)")
      println(f"[scale] q96 training-data composition 400k docs $t2%8.2f s  ($j2 jobs)")
      // a few extra jobs are legitimate — connectedComponents inside the
      // near-dup stage runs O(log diameter) pointer-jumping rounds, so a
      // bigger dup graph can add a round or two (measured 64 -> 66 at
      // 100k -> 400k). A LEAK (per-row or per-partition driver action)
      // would grow the count far faster than log.
      if (j2 > j1 + 6)
        println(s"[scale] WARNING: q96 job count grew with data ($j1 -> $j2) — beyond log-round growth; a data-dependent action leaked in")
    }

    // Versioned table + CDC at volume: a 2M-row source in 64 range-
    // clustered files, a 100-commit log (checkpointed every 10), and an
    // incremental mirror cycle whose cost must track the DELTA, not the
    // table. The three invariants checked: (a) snapshot resolution stays
    // flat as the log grows (checkpoint replay, not full-log replay);
    // (b) a range-confined MERGE + mirror cycle reads/writes a sliver of
    // the 64 files (manifest-diff change feed + file-granular
    // applyChanges); (c) incremental maintainSumState beats the full
    // recompute it is algebraically equal to.
    locally {
      val vtRoot = java.nio.file.Files.createTempDirectory("graft-scale-vt")
      try {
        val src = vtRoot.resolve("src").toString
        val dst = vtRoot.resolve("dst").toString
        val state = vtRoot.resolve("state").toString
        val ckM = vtRoot.resolve("ckm").toString
        val ckS = vtRoot.resolve("cks").toString
        val base = spark.range(2000000).select(col("id"),
          pmod(col("id"), lit(1000)).as("grp"),
          (pmod(col("id") * 7, lit(10000)).cast(DoubleType) / 100.0).as("amt"))
        time("2M versioned bootstrap (64 range-clustered files)") {
          // optimizeWrite=false: the bootstrap's partitioning IS the
          // point — a rebalance would collapse the 64 range-clustered
          // files and every delta-locality measurement below would
          // silently measure a full-table rewrite instead
          io.VersionedTable.append(spark,
            base.repartitionByRange(64, col("id"))
              .sortWithinPartitions(col("id")), src,
            optimizeWrite = false)
          io.VersionedTable.snapshot(spark, src).count() }
        time("100 small append commits (log grows to 101)") {
          (1 to 100).foreach { i =>
            io.VersionedTable.append(spark,
              spark.range(2000000L + i * 10, 2000000L + i * 10 + 10)
                .select(col("id"), pmod(col("id"), lit(1000)).as("grp"),
                  lit(0.5).as("amt")).coalesce(1), src) }
          io.VersionedTable.latestVersion(src).get }
        time("snapshot count after 101 commits (checkpointed replay)") {
          io.VersionedTable.snapshot(spark, src).count() }
        // the v1 streaming source over the same 101-commit log: the
        // snapshot batch must deliver all 2M+1k rows once, and the
        // per-commit offset walk (getOffset = a dir listing + manifest
        // reads) must not dominate — this is the tail a 100 TB ingest
        // consumer actually runs
        time("stream 101-commit log: snapshot + tail into memory sink") {
          val q = spark.readStream.format("graft-versioned").load(src)
            .groupBy(col("grp")).agg(count(lit(1)).as("n"))
            .writeStream.format("memory").queryName("smoke_vstream")
            .outputMode("complete")
            .option("checkpointLocation",
              vtRoot.resolve("ckstream").toString)
            .start()
          try {
            q.processAllAvailable()
            spark.table("smoke_vstream")
              .agg(sum(col("n"))).collect()(0).getLong(0)
          } finally {
            q.stop()
            spark.catalog.dropTempView("smoke_vstream")
          }
        }
        // PACED initial snapshot (the r13 compound-offset mechanism) at
        // the same 2M-row volume: maxFilesPerTrigger=8 over the ~64-file
        // snapshot must admit the bootstrap in MANY micro-batches (the
        // 100 TB stall/OOM guard the option exists for), deliver exactly
        // the same row set once, and cost no more than a small constant
        // over the unpaced drain (per-batch planning + offset commits).
        time("stream 101-commit log PACED (maxFilesPerTrigger=8)") {
          val q = spark.readStream.format("graft-versioned")
            .option("maxFilesPerTrigger", "8").load(src)
            .groupBy(col("grp")).agg(count(lit(1)).as("n"))
            .writeStream.format("memory").queryName("smoke_vstream_paced")
            .outputMode("complete")
            .option("checkpointLocation",
              vtRoot.resolve("ckstream-paced").toString)
            .start()
          try {
            q.processAllAvailable()
            val batches = q.recentProgress.count(_.numInputRows > 0)
            val total = spark.table("smoke_vstream_paced")
              .agg(sum(col("n"))).collect()(0).getLong(0)
            require(batches > 1,
              s"paced snapshot arrived in $batches batch(es) — " +
                "maxFilesPerTrigger did not slice the bootstrap")
            require(total == 2001000L,
              s"paced drain delivered $total rows, expected 2001000")
            println(s"[scale] paced snapshot drained in $batches " +
              "non-empty micro-batches (unpaced: 1-2)")
            total
          } finally {
            q.stop()
            spark.catalog.dropTempView("smoke_vstream_paced")
          }
        }
        time("CDC bootstrap mirror (2M rows)") {
          io.ChangeConsumer.mirror(spark, src, dst, Seq("id"), ckM)
          io.VersionedTable.snapshot(spark, dst).count() }
        io.ChangeConsumer.maintainSumState(spark, src, state,
          Seq("id"), Seq("grp"), "amt", ckS)
        // range-confined delta: update ids [0, 20000) — lives in ~1 of
        // the 64 clustered files
        io.VersionedTable.merge(spark,
          base.filter(col("id") < 20000)
            .withColumn("amt", col("amt") + 1.0), src, Seq("id"))
        val dstFilesBefore = io.VersionedTable
          .snapshot(spark, dst).inputFiles.length
        time("CDC incremental mirror (1% range delta)") {
          io.ChangeConsumer.mirror(spark, src, dst, Seq("id"), ckM)
          io.VersionedTable.snapshot(spark, dst).count() }
        val hist = io.VersionedTable.history(spark, dst)
          .orderBy(col("version").desc).limit(1).collect().head
        println(f"[scale] incremental mirror rewrote ${hist.getLong(4)}%d" +
          f" of $dstFilesBefore%d dst files (+${hist.getLong(3)}%d new)")
        if (hist.getLong(4) > dstFilesBefore / 4)
          println("[scale] WARNING: range-delta mirror rewrote >25% of " +
            "dst files — file-granular applyChanges regressed")
        time("CDC incremental maintainSumState (1% delta fold)") {
          io.ChangeConsumer.maintainSumState(spark, src, state,
            Seq("id"), Seq("grp"), "amt", ckS)
          io.VersionedTable.snapshot(spark, state).count() }
        // apples-to-apples baseline: the recompute ALSO pays a state-
        // table commit (the fold's fixed overhead is the commit, its
        // variable cost is O(delta); the recompute's variable cost is
        // O(table) — crossover favors the fold as the table grows)
        time("full sumState recompute + commit (the path the fold replaces)") {
          io.VersionedTable.overwrite(spark,
            graft.ops.IncrementalAgg.sumState(
              io.VersionedTable.snapshot(spark, src), Seq("grp"), "amt"),
            vtRoot.resolve("state-full").toString)
          io.VersionedTable.snapshot(spark,
            vtRoot.resolve("state-full").toString).count() }
        // WRITE-TIME CDF at 2M rows: enable capture, land range-confined
        // merges, and measure (a) the capture overhead on the write,
        // (b) the keyless envelope read, (c) the streaming MV bootstrap
        // and its incremental refresh — (a)-(c) must track the DELTA
        // (and the MV bootstrap the snapshot), never re-pay the table
        io.VersionedTable.setProperties(src,
          Map(io.VersionedTable.CdfProp -> "true"))
        val vBeforeCdf = io.VersionedTable.latestVersion(src).get
        time("merge 1% delta WITH change capture (envelope sidecars)") {
          io.VersionedTable.merge(spark,
            base.filter(col("id") >= 40000 && col("id") < 60000)
              .withColumn("amt", col("amt") + 2.0), src, Seq("id"))
          io.VersionedTable.latestVersion(src).get }
        time("tableChanges over the merge (keyless sidecar scan)") {
          io.VersionedTable.tableChanges(spark, src, vBeforeCdf,
            io.VersionedTable.latestVersion(src).get).count() }
        val mvState = vtRoot.resolve("mv").toString
        val ckMv = vtRoot.resolve("ckmv").toString
        time("streaming MV bootstrap (2M snapshot as inserts)") {
          val q = streaming.Streams.materializedViewSink(spark, src,
            mvState, Seq("grp"), "amt", ckMv)
          try q.processAllAvailable() finally q.stop()
          io.VersionedTable.snapshot(spark, mvState).count() }
        io.VersionedTable.merge(spark,
          base.filter(col("id") >= 60000 && col("id") < 80000)
            .withColumn("amt", col("amt") + 3.0), src, Seq("id"))
        time("streaming MV incremental refresh (1% delta, retractions)") {
          val q = streaming.Streams.materializedViewSink(spark, src,
            mvState, Seq("grp"), "amt", ckMv)
          try q.processAllAvailable() finally q.stop()
          io.VersionedTable.snapshot(spark, mvState).count() }
        // true Z-ORDER rewrite of the whole 2M-row table (interleaved
        // (id, grp) key): one stats pass + one range shuffle + sort —
        // the OPTIMIZE ZORDER cost shape, last so it cannot disturb the
        // CDC delta-locality measurements above
        time("true Z-ORDER compact 2M rows (2 dims, 16 files)") {
          io.VersionedTable.compact(spark, src, targetFiles = 16,
            clusterBy = Seq("id", "grp"), statsFor = Seq("id", "grp"),
            zorder = true)
          io.VersionedTable.snapshot(spark, src).count() }
      } finally {
        graft.util.Fs.deleteRecursively(vtRoot)
      }
    }

    // FOOTER-STATS COMMIT AT VOLUME (r14 next-round #6): FooterStatsSpec
    // proves footer ≡ scan parity at toy volume; this stage proves the
    // SCALE claim — a 2M-row stats-tracked append (bigint key + the
    // fintech DECIMAL money column) computes its per-file bounds from
    // parquet footers with ZERO extra Spark jobs after the write itself
    // (listener-counted vs an identical stats-less append), and the
    // recorded bounds genuinely prune a range probe on both columns.
    locally {
      val vtRoot = java.nio.file.Files.createTempDirectory("graft-scale-fs")
      try {
        // amount rides id so BOTH columns are range-clustered across the
        // 64 files — the decimal bounds must prune, not just exist
        val data = spark.range(2000000).select(col("id"),
          (col("id").cast(org.apache.spark.sql.types.DecimalType(18, 2))
            / 100).as("amount"))
          .repartitionByRange(64, col("id")).sortWithinPartitions(col("id"))
        val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            jobs.incrementAndGet(); ()
          }
        }
        spark.sparkContext.addSparkListener(listener)
        // listener events are async — settle the bus (outside the timed
        // windows) before each counter read
        def settledJobs(): Int = {
          org.apache.spark.sql.graftbridge.Bridge.waitListenerBus(spark)
          jobs.get()
        }
        try {
          val plain = vtRoot.resolve("plain").toString
          val stats = vtRoot.resolve("stats").toString
          // throwaway warm-up append BEFORE any counter read: lazy-init
          // work (first-write codec path, output-committer classload)
          // must not land inside the BASELINE count, where it would both
          // inflate jobsPlain and let a real one-extra-job regression in
          // the stats path slide under the <= bound (review catch, r16)
          io.VersionedTable.append(spark,
            spark.range(64).toDF("id"), vtRoot.resolve("warm").toString,
            optimizeWrite = false)
          jobs.set(0)
          time("2M append baseline (no stats)") {
            io.VersionedTable.append(spark, data, plain,
              optimizeWrite = false)
            0L
          }
          val jobsPlain = settledJobs()
          jobs.set(0)
          var statsSec = 0.0
          locally {
            val t0 = System.nanoTime()
            io.VersionedTable.append(spark, data, stats,
              statsFor = Seq("id", "amount"), optimizeWrite = false)
            statsSec = (System.nanoTime() - t0) / 1e9
            println(f"[scale] 2M append WITH footer stats (id+decimal)" +
              f"          $statsSec%8.2f s  (64 files)")
          }
          val jobsStats = settledJobs()
          // upper bound, not equality: an incidental listener-visible job
          // that fires during only the BASELINE append (GC-triggered
          // cleaner work, a lazily-initialized codec path on the first
          // write) must not fail the run — the claim under test is only
          // that the footer pass launches NO EXTRA work
          require(jobsStats <= jobsPlain,
            s"stats-tracked append ran $jobsStats jobs vs $jobsPlain " +
              "baseline — the footer pass launched Spark work " +
              "(the double-read write path is back)")
          println(s"[scale] footer stats pass: 0 extra Spark jobs " +
            s"($jobsStats <= $jobsPlain baseline) — stats cost is " +
            "O(files) driver metadata, independent of data volume")
          // the footer-sourced bounds must PRUNE: a 1-file-wide id probe
          // and a matching decimal-amount probe each read ≪ 64 files
          val idProbe = io.VersionedTable.snapshotWhere(spark, stats,
            "id", lo = Some(100000L), hi = Some(110000L))
          require(idProbe.count() == 10001L)
          require(idProbe.inputFiles.length <= 2,
            s"id probe read ${idProbe.inputFiles.length} of 64 files")
          val amtProbe = io.VersionedTable.snapshotWhere(spark, stats,
            "amount", lo = Some(new java.math.BigDecimal("1000.00")),
            hi = Some(new java.math.BigDecimal("1100.00")))
          require(amtProbe.count() == 10001L)
          require(amtProbe.inputFiles.length <= 2,
            s"decimal probe read ${amtProbe.inputFiles.length} of 64 files")
          println(s"[scale] footer-sourced bounds prune: id probe " +
            s"${idProbe.inputFiles.length}/64 files, decimal probe " +
            s"${amtProbe.inputFiles.length}/64 files")
        } finally spark.sparkContext.removeSparkListener(listener)
      } finally {
        graft.util.Fs.deleteRecursively(vtRoot)
      }
    }

    // INCREMENTAL NEAR-DUP DELTA SCALING (VERDICT r15 #6): the 100 TB
    // claim for incrementalNearDupMatches is that each increment costs
    // O(delta) — the kept corpus is touched only through the persisted
    // index streaming MAP-SIDE through broadcast-pruned joins, never
    // through a corpus-sized shuffle. Proven by listener accounting
    // against a 20×-bench kept corpus (100k docs): per-increment SHUFFLE
    // WRITE must be a small fraction of the one-time index build's (a
    // re-dedup would re-shuffle the corpus every increment), and the
    // per-increment job count must be steady across increments.
    locally {
      val kept = syntheticDocs(spark, 100000).persist()
      kept.count()
      val idx0 = ext.Dedup.buildNearDupIndex(kept, "doc_id", "text")
      val idx = idx0.copy(sets = idx0.sets.persist(),
        banded = idx0.banded.persist())
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0L)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val m = sc.stageInfo.taskMetrics
          if (m != null)
            shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      // a 2k delta: 1k docs the index has never seen (ids past the kept
      // range → fresh hash-derived text) + 1k re-labeled copies of kept
      // docs (guaranteed ≥0.8 matches) — both match paths exercised
      def delta(gen: Int): DataFrame = {
        val lo = 100000L + 1000L * (gen - 1)
        val fresh = syntheticDocs(spark, lo, lo + 1000L)
        val dups = kept.filter(col("doc_id") < 1000)
          .withColumn("doc_id", col("doc_id") + 10000000L * gen)
        fresh.unionByName(dups)
      }
      try {
        def settled[T](v: => T): T = {
          org.apache.spark.sql.graftbridge.Bridge.waitListenerBus(spark)
          v
        }
        jobs.set(0); shuffleWrite.set(0L)
        time("100k-doc near-dup index build (one-time)") {
          idx.sets.count() + idx.banded.count() }
        val buildShuffle = settled(shuffleWrite.get())
        def increment(gen: Int): (Int, Long) = {
          jobs.set(0); shuffleWrite.set(0L)
          time(s"2k-delta near-dup increment #$gen vs 100k index") {
            ext.Dedup.incrementalNearDupMatches(delta(gen), idx,
              "doc_id", "text", minJaccard = 0.8,
              maxBucketSize = 1000).count() }
          settled((jobs.get(), shuffleWrite.get()))
        }
        val (j1, s1) = increment(1)
        val (j2, s2) = increment(2)
        // steady state: identical-shaped increments must not grow their
        // job count (±1 tolerates an incidental lazily-initialized job —
        // the ADVICE r15 lesson from the footer-stats stage)
        require(math.abs(j2 - j1) <= 1,
          s"per-increment job count drifted: $j1 then $j2")
        // the scale law: an increment's shuffle is DELTA-sized. The index
        // build shuffled the whole 100k corpus' shingle/MinHash pipeline;
        // a 2% delta whose shuffle is >20% of that is re-shuffling kept
        // data somewhere (the regression this stage exists to catch).
        require(s1 * 5 < buildShuffle && s2 * 5 < buildShuffle,
          s"increment shuffle ($s1, $s2 bytes) not delta-bounded vs " +
            s"index build ($buildShuffle bytes)")
        println(f"[scale] near-dup increments: $j1%d/$j2%d jobs, " +
          f"${s1 / 1024}%d/${s2 / 1024}%d KiB shuffle vs " +
          f"${buildShuffle / 1024}%d KiB one-time build " +
          "(per-increment cost tracks the delta, not the corpus)")
      } finally {
        spark.sparkContext.removeSparkListener(listener)
        idx.sets.unpersist(); idx.banded.unpersist(); kept.unpersist()
        ()
      }
    }

    // 5M-event sequence assembly: cap-before-collect must bound state
    val evs = spark.range(5000000).select(
      pmod(col("id"), lit(200000L)).as("user_id"),
      col("id").as("ts"), col("id").as("event_id"),
      element_at(typedlit(Seq("view", "click", "buy")),
        pmod(col("id"), lit(3)).cast(IntegerType) + 1).as("event_type"))
    time("5M events → 200k capped user sequences (last 20)") {
      ext.Sequences.userSequences(evs, "user_id", Seq("ts", "event_id"),
        col("event_type"), maxLen = 20).count() }

    spark.stop()
  }
}
