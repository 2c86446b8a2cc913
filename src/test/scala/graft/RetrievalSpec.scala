package graft

import org.apache.spark.sql.functions._

import graft.ext.{Decontam, Retrieval, Sampling}

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // ---------- BM25 ----------

  test("bm25 matches a hand-computed Okapi score on a tiny corpus") {
    val docs = Seq(
      (1L, "spark spark spark runs fast"),
      (2L, "ducks swim in the pond"),
      (3L, "spark and flink stream data")).toDF("doc_id", "text")
    val out = Retrieval.bm25(docs, "doc_id", "text", Seq("spark"),
        roundTo = 6)
      .orderBy("doc_id").collect()
    // N=3, df=2, dl = 5 for all, avgdl = 5 → length norm term = k1
    val idf = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
    def s(tf: Double) = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * 1.0))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getAs[Double]("score") == r6(s(3.0)))
    assert(out(1).getAs[Double]("score") == r6(s(0.0)))
    assert(out(2).getAs[Double]("score") == r6(s(1.0)))
    assert(out(0).getAs[Double]("score") > out(2).getAs[Double]("score"))
  }

  test("bm25TopK keeps only positive scores, ordered, limited") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha alpha beta"), (3L, "gamma delta"),
      (4L, "alpha")).toDF("doc_id", "text")
    val top = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("alpha"), k = 2)
      .collect()
    assert(top.length == 2)
    // doc 4: tf=1 but dl=1 (short doc boost) outranks doc 1 (tf=1, dl=2);
    // doc 2 has tf=2 — the ranking must be by score desc
    assert(top(0).getAs[Double]("score") >= top(1).getAs[Double]("score"))
    assert(!top.map(_.getAs[Long]("doc_id")).contains(3L))
  }

  test("bm25 scores null-text docs 0, not NULL") {
    val docs = Seq[(Long, Option[String])](
      (1L, Some("alpha beta")), (2L, None), (3L, Some("")))
      .toDF("doc_id", "text")
    val got = Retrieval.bm25(docs, "doc_id", "text", Seq("alpha"))
      .orderBy("doc_id").collect()
    assert(got.length == 3) // "score of every document" includes null text
    assert(got(0).getAs[Double]("score") > 0)
    assert(!got(1).isNullAt(1) && got(1).getAs[Double]("score") == 0.0)
    assert(!got(2).isNullAt(1) && got(2).getAs[Double]("score") == 0.0)
  }

  // ---------- chunking ----------

  test("chunk produces overlapping windows with a short tail") {
    val docs = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (2L, "  "))
      .toDF("doc_id", "text")
    val out = Retrieval.chunk(docs, "doc_id", "text",
        chunkSize = 4, stride = 3)
      .orderBy("doc_id", "chunk_id").collect()
    // starts 0,3,6,9 → 4 chunks; blank doc 2 yields none
    assert(out.length == 4)
    assert(out.forall(_.getAs[Long]("doc_id") == 1L))
    assert(out.map(_.getAs[String]("chunk_text")).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"))
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq == Seq(4L, 4L, 4L, 1L))
    assert(out.map(_.getAs[Long]("chunk_id")).toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("chunk with stride == chunkSize partitions tokens exactly") {
    val docs = Seq((1L, (1 to 9).map("w" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val out = Retrieval.chunk(docs, "doc_id", "text", 3, 3)
      .orderBy("chunk_id").collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[String]("chunk_text")).mkString(" ") ==
      (1 to 9).map("w" + _).mkString(" "))
  }

  // ---------- decontamination ----------

  test("contaminated flags exactly the docs sharing an n-gram with bench") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated content about databases here"),
      (3L, "another text with quick brown fox inside it")).toDF("doc_id", "text")
    val bench = Seq((100L, "quick brown fox")).toDF("doc_id", "text")
    val hit = Decontam.contaminated(corpus, bench, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    // docs 1 and 3 contain the trigram "quick brown fox"; doc 2 is clean
    assert(hit.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 3L))
    assert(hit.forall(_.getAs[Long]("n_hit_grams") == 1L))
    assert(hit.forall(_.getAs[Long]("first_bench_id")== 100L))

    val clean = Decontam.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSeq
    assert(clean == Seq(2L))
  }

  test("contaminationRate is hits/total-grams, 0.0 for clean docs") {
    val corpus = Seq(
      (1L, "a b c d"), // 3-grams: "a b c", "b c d"
      (2L, "x y z w")).toDF("doc_id", "text")
    val bench = Seq((9L, "a b c")).toDF("doc_id", "text")
    val out = Decontam.contaminationRate(corpus, bench, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Double]("contamination") == 0.5)
    assert(out(0).getAs[Long]("n_grams") == 2L)
    assert(out(1).getAs[Double]("contamination") == 0.0)
    assert(out(1).getAs[Long]("n_hit_grams") == 0L)
  }

  test("contaminated plan broadcasts the bench side, not the corpus") {
    val corpus = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val bench = Seq((9L, "a b c")).toDF("doc_id", "text")
    val plan = Decontam.contaminated(corpus, bench, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  test("bloom screen never misses a contaminated doc; exact pass agrees") {
    val corpus = (1L to 200L).map(i => (i, s"filler u$i v$i w$i x$i y$i"))
      .toDF("doc_id", "text")
      .unionByName(Seq(
        (501L, "the quick brown fox jumps today"),
        (502L, "an unrelated clean document entirely")).toDF("doc_id", "text"))
    val bench = Seq((9L, "quick brown fox")).toDF("doc_id", "text")
    val bloom = Decontam.gramBloom(bench, "text", n = 3)
    // screen: doc 501 MUST be flagged (no false negatives by construction)
    val screened = Decontam.bloomScreen(corpus, bloom, "doc_id", "text", 3)
      .filter(col("n_flagged_grams") > 0)
      .select("doc_id").as[Long].collect().toSet
    assert(screened.contains(501L))
    // screened composite == plain exact contamination, bit for bit
    val exact = Decontam.contaminated(corpus, bench, "doc_id", "text", 3)
      .orderBy("doc_id").collect().toSeq
    val viaBloom = Decontam
      .contaminatedScreened(corpus, bench, "doc_id", "text", 3)
      .orderBy("doc_id").collect().toSeq
    assert(viaBloom == exact)
    assert(exact.map(_.getAs[Long]("doc_id")) == Seq(501L))
  }

  test("bloom screen is a narrow map: no join, no shuffle") {
    val corpus = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val bench = Seq((9L, "a b c")).toDF("doc_id", "text")
    val bloom = Decontam.gramBloom(bench, "text", 3)
    val plan = Decontam.bloomScreen(corpus, bloom, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"bloom screen must stay narrow:\n$plan")
  }

  // ---------- vocabulary + unigram LM ----------

  test("vocabulary counts occurrences and containing docs; minCount floors") {
    val docs = Seq(
      (1L, "a b a"), (2L, "a c"), (3L, "   "), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val v = graft.ext.TextModel.vocabulary(docs, "doc_id", "text")
      .orderBy("term").collect()
    assert(v.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("a", 3L, 2L), ("b", 1L, 1L), ("c", 1L, 1L)))
    val floored = graft.ext.TextModel.vocabulary(docs, "doc_id", "text",
      minCount = 2).collect()
    assert(floored.map(_.getString(0)).toSeq == Seq("a"))
  }

  test("topVocabulary ranks by frequency then term") {
    val docs = Seq((1L, "b b b a a c")).toDF("doc_id", "text")
    val top = graft.ext.TextModel.topVocabulary(docs, "doc_id", "text", 2)
      .orderBy("rank").collect()
    assert(top.map(r => (r.getAs[String]("term"), r.getAs[Long]("rank")))
      .toSeq == Seq(("b", 1L), ("a", 2L)))
  }

  test("unigramNll matches hand-computed micro-nat sums") {
    // corpus: 4 tokens total — "a" ×3 (p=3/4), "b" ×1 (p=1/4)
    val docs = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val out = graft.ext.TextModel.unigramNll(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val mA = math.round(-math.log(3.0 / 4.0) * 1e6)
    val mB = math.round(-math.log(1.0 / 4.0) * 1e6)
    assert(out(0).getAs[Long]("nll_micros") == 3 * mA)
    assert(out(1).getAs[Long]("nll_micros") == mB)
    assert(out(0).getAs[Long]("n_tokens") == 3L)
    // rarer tokens → higher per-token NLL
    assert(out(1).getAs[Double]("avg_nll") > out(0).getAs[Double]("avg_nll"))
  }

  test("unigramNll with smoothing scores OOV terms finitely") {
    val ref = Seq((1L, "a a b")).toDF("doc_id", "text")
    val docs = Seq((9L, "a z")).toDF("doc_id", "text")
    val out = graft.ext.TextModel.unigramNll(docs, "doc_id", "text",
        alpha = 1.0, reference = Some(ref))
      .collect().head
    // T=3, V=2: p(a)=(2+1)/(3+2)=0.6, p(z)=(0+1)/(3+2)=0.2
    val exp = math.round(-math.log(0.6) * 1e6) +
      math.round(-math.log(0.2) * 1e6)
    assert(out.getAs[Long]("nll_micros") == exp)
  }

  test("bigramNll matches hand-computed interpolated scores") {
    val docs = Seq((1L, "a b a"), (2L, "b a")).toDF("doc_id", "text")
    val out = graft.ext.TextModel.bigramNll(docs, "doc_id", "text",
        lambda = 0.5, alpha = 1.0)
      .orderBy("doc_id").collect()
    def m(p: Double) = math.round(-math.log(p) * 1e6)
    // corpus: T=5 tokens, V=2; bigrams (a,b):1 (b,a):2; contexts a:1 b:2
    val pab = 0.5 * 1.0 + 0.5 * (3.0 / 7.0) // ml 1/1; uni(b) (2+1)/(5+2)
    val pba = 0.5 * 1.0 + 0.5 * (4.0 / 7.0)
    assert(out(0).getAs[Long]("n_bigrams") == 2L)
    assert(out(0).getAs[Long]("nll_micros") == m(pab) + m(pba))
    assert(out(1).getAs[Long]("n_bigrams") == 1L)
    assert(out(1).getAs[Long]("nll_micros") == m(pba))
    // one-token docs have no bigram to score — no row
    val single = Seq((3L, "a")).toDF("doc_id", "text")
    assert(graft.ext.TextModel.bigramNll(single, "doc_id", "text")
      .count() == 0)
  }

  test("bigramNll: unseen context falls to the unigram floor, finite") {
    val ref = Seq((10L, "a b a")).toDF("doc_id", "text")
    val q = Seq((1L, "z a")).toDF("doc_id", "text")
    val out = graft.ext.TextModel.bigramNll(q, "doc_id", "text",
        lambda = 0.5, alpha = 1.0, reference = Some(ref))
      .collect().head
    // ref: T=3, V=2, uni(a)=(2+1)/(3+2); context z unseen → ml term 0
    val p = 0.5 * 0.0 + 0.5 * 0.6
    assert(out.getAs[Long]("nll_micros") ==
      math.round(-math.log(p) * 1e6))
  }

  // ---------- incremental near-dup ----------

  test("incremental dedup matches new docs against kept and smaller new ids") {
    val base = "the quick brown fox jumps over the lazy dog while " +
      "spark shuffles partitions across the cluster nodes today"
    val kept = Seq(
      (1L, base),
      (2L, "totally different kept content about bm25 scoring and idf weights"))
      .toDF("doc_id", "text")
    val novel = "completely novel text describing vector quantization " +
      "and token budget packing for pretraining corpora at scale"
    val fresh = Seq(
      (10L, base + " zz"),     // near-dup of kept 1 → dropped
      (11L, novel),            // survives
      (12L, novel + " qq"))    // near-dup of smaller new 11 → dropped
      .toDF("doc_id", "text")
    val matches = graft.ext.Dedup.incrementalNearDupMatches(
      fresh, kept, "doc_id", "text", minJaccard = 0.8)
      .orderBy("new_id").collect()
    assert(matches.map(r => (r.getAs[Long]("new_id"),
      r.getAs[Long]("matched_id"), r.getAs[Boolean]("matched_kept")))
      .toSeq == Seq((10L, 1L, true), (12L, 11L, false)))
    val survivors = graft.ext.Dedup.incrementalNearDup(
      fresh, kept, "doc_id", "text", minJaccard = 0.8)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(survivors == Seq(11L))
  }

  test("wordHashGrams ignores edge whitespace (\\S+ tokenizer parity)") {
    // tokens are the \S+ runs of the lowercased text — leading/trailing
    // whitespace of ANY kind (not just the spaces SQL trim strips) must
    // not mint phantom "" tokens, so a doc ending in \n grams identically
    // to its trimmed twin, matching wordShingles and the DuckDB
    // regexp_extract_all oracles
    val df = Seq((1L, "alpha beta\n"), (2L, "alpha beta"), (3L, " \t\n"))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        size(graft.ext.Shingles.wordHashGrams(col("text"), 1)).as("n1"),
        graft.ext.Shingles.wordHashGrams(col("text"), 3).as("g3"))
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("n1") == 2) // alpha, beta — no phantom ""
    assert(out(1).getAs[Int]("n1") == 2)
    assert(out(0).getAs[scala.collection.Seq[Long]]("g3").toSeq ==
      out(1).getAs[scala.collection.Seq[Long]]("g3").toSeq)
    assert(out(2).getAs[Int]("n1") == 0) // blank doc: ZERO grams, no phantom
  }

  test("incremental matches re-cap ACCUMULATED hot kept buckets") {
    val base = "the quick brown fox jumps over the lazy dog while " +
      "spark shuffles partitions across the cluster nodes today"
    val kept1 = Seq((1L, base)).toDF("doc_id", "text")
    val idx0 = graft.ext.Dedup.buildNearDupIndex(kept1, "doc_id", "text",
      3, 8, 4, maxBucketSize = 5)
    // simulate a streaming store grown batch-by-batch: replicate doc 1's
    // band entries (and shingle set) under 9 more ids — each delta was
    // individually under the cap, the accumulated bucket is 10 > 5
    val ids = (2L to 10L).toDF("nid")
    val moreBanded = ids
      .crossJoin(idx0.banded.select("band", "band_hash"))
      .select(col("band"), col("band_hash"), col("nid").as("id"))
    val moreSets = ids
      .crossJoin(idx0.sets.filter(col("id") === 1L).select("shset"))
      .select(col("nid").as("id"), col("shset"))
    val idx = idx0.copy(sets = idx0.sets.unionByName(moreSets),
      banded = idx0.banded.unionByName(moreBanded))
    val newDocs = Seq((100L, base)).toDF("doc_id", "text")
    // over-cap buckets drop entirely (the batch boundBuckets rule applied
    // to the accumulated store) — without the re-cap every delta rep
    // would pair with the bucket's whole population forever
    val m = graft.ext.Dedup.incrementalNearDupMatches(newDocs, idx,
      "doc_id", "text", minJaccard = 0.5, maxBucketSize = 5)
    assert(m.count() == 0)
    m.unpersist()
    // with the cap above the accumulated size, all 10 kept copies match
    val m2 = graft.ext.Dedup.incrementalNearDupMatches(newDocs, idx,
      "doc_id", "text", minJaccard = 0.5, maxBucketSize = 100)
    assert(m2.select("matched_id").distinct().count() == 10)
    m2.unpersist()
  }

  test("incremental dedup survives a duplicate-heavy delta (bucket cap)") {
    val base = "the quick brown fox jumps over the lazy dog while " +
      "spark shuffles partitions across the cluster nodes today"
    val kept = Seq((1L, base)).toDF("doc_id", "text")
    // 30 identical copies with maxBucketSize = 5: banding members
    // individually overflows every new-side bucket and the cap silently
    // drops ALL copies; signature-rep banding must still match every one
    val fresh = (100L to 129L).map(i => (i, base + " zz"))
      .toDF("doc_id", "text")
    val matches = graft.ext.Dedup.incrementalNearDupMatches(
      fresh, kept, "doc_id", "text", minJaccard = 0.8, maxBucketSize = 5)
    assert(matches.select("new_id").distinct().count() == 30)
    val survivors = graft.ext.Dedup.incrementalNearDup(
      fresh, kept, "doc_id", "text", minJaccard = 0.8, maxBucketSize = 5)
    assert(survivors.count() == 0)
  }

  // ---------- int8 quantization ----------

  test("int8 quantization: exact codes, scale, bounded dequant error") {
    val vecs = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = graft.ext.Quantize.int8(vecs, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    // max|v| = 1 → codes round(v*127): 127, -63.5→-64 (away from zero), 31.75→32, 0
    assert(q(0).getAs[scala.collection.Seq[Long]]("qvec").toSeq ==
      Seq(127L, -64L, 32L, 0L))
    assert(math.abs(q(0).getAs[Double]("scale") - 1.0 / 127.0) < 1e-15)
    // zero vector: zero codes, zero scale
    assert(q(1).getAs[scala.collection.Seq[Long]]("qvec").toSeq == Seq(0L, 0L))
    assert(q(1).getAs[Double]("scale") == 0.0)
    val err = graft.ext.Quantize.int8Error(vecs, "vec_id", "embedding")
      .filter(col("vec_id") === 1L).collect().head
    // dequant error per element is at most scale/2
    assert(err.getAs[Double]("mean_abs_err") <= 0.5 / 127.0 + 1e-12)
  }

  // ---------- line-level corpus dedup ----------

  test("dedupLines drops corpus-wide repeated lines, keeps order") {
    val docs = Seq(
      (1L, "unique alpha\ncookie banner\nunique beta"),
      (2L, "cookie banner\nown content"),
      (3L, "cookie banner")).toDF("doc_id", "text")
    val out = graft.ext.TextPipeline.dedupLines(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // "cookie banner" occurs 3× corpus-wide → dropped everywhere; doc 3
    // loses its only line and disappears
    assert(out.length == 2)
    assert(out(0).getAs[String]("dedup_text") == "unique alpha\nunique beta")
    assert(out(0).getAs[Long]("n_lines_kept") == 2L)
    assert(out(0).getAs[Long]("n_lines_dropped") == 1L)
    assert(out(1).getAs[String]("dedup_text") == "own content")
    assert(out(1).getAs[Long]("n_lines_dropped") == 1L)
  }

  test("dedupLines maxOccurrences threshold keeps lines at or under it") {
    val docs = Seq(
      (1L, "twice\nonce-a"), (2L, "twice\nonce-b")).toDF("doc_id", "text")
    val keep2 = graft.ext.TextPipeline.dedupLines(docs, "doc_id", "text",
        maxOccurrences = 2)
      .orderBy("doc_id").collect()
    assert(keep2.forall(_.getAs[Long]("n_lines_dropped") == 0L))
    assert(keep2(0).getAs[String]("dedup_text") == "twice\nonce-a")
  }

  // ---------- deterministic shuffle ----------

  test("dedupSpans masks non-first occurrences of duplicated spans") {
    // span "a b c d" (n=4) appears in docs 1, 2 and twice in doc 1's tail
    val docs = Seq(
      (1L, "a b c d x y z a b c d"),
      (2L, "p q a b c d r s"),
      (3L, "totally novel content here")).toDF("doc_id", "text")
    val out = graft.ext.TextPipeline.dedupSpans(docs, "doc_id", "text", n = 4)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_kept", "text_clean")
      .as[(Long, Long, Long, String)].collect().toSeq
    // doc 1: first occurrence (pos 1) survives; the second copy at pos 8
    //        masks tokens 8-11
    assert(out(0) == ((1L, 11L, 7L, "a b c d x y z")))
    // doc 2: its copy (pos 3) masks tokens 3-6; p q r s survive
    assert(out(1) == ((2L, 8L, 4L, "p q r s")))
    // doc 3: untouched
    assert(out(2) == ((3L, 4L, 4L, "totally novel content here")))
  }

  test("dedupSpans chains overlapping duplicated spans; short dups empty") {
    // doc 20 repeats doc 10's whole text shifted: every 3-window of
    // "a b c d e" in doc 20 duplicates doc 10 -> all of doc 20's span
    // tokens mask; doc 30 is an exact short dup (< n tokens -> single
    // whole-doc gram) so it empties entirely
    val docs = Seq(
      (10L, "a b c d e"),
      (20L, "z a b c d e"),
      (30L, "hi yo"),
      (31L, "hi yo")).toDF("doc_id", "text")
    val out = graft.ext.TextPipeline.dedupSpans(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_kept", "text_clean")
      .as[(Long, Long, String)].collect().toSeq
    assert(out(0) == ((10L, 5L, "a b c d e")))
    assert(out(1) == ((20L, 1L, "z")))
    assert(out(2) == ((30L, 2L, "hi yo")))
    assert(out(3) == ((31L, 0L, "")))
  }

  test("dedupSpans keep-first is corpus-wide deterministic (min id, pos)") {
    // the same span planted in many docs: only the smallest doc_id keeps it
    val span = "one two three four five six seven eight"
    val docs = (1L to 20L).map(i => (i, s"prefix$i $span suffix$i"))
      .toDF("doc_id", "text")
    val out = graft.ext.TextPipeline.dedupSpans(docs, "doc_id", "text", n = 8)
      .filter(col("n_kept") === col("n_tokens"))
      .select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(1L))
  }

  test("dedupSpans property: fixpoint on random corpora with planted dups") {
    // 40 seeded pseudo-random docs over a 200-word vocab + 8 planted
    // copies of a shared span: after one pass, re-running on the cleaned
    // text (emptied docs dropped, as a pipeline would) changes nothing
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 200).map(i => s"w$i")
    val span = (0 until 6).map(i => s"dup$i").mkString(" ")
    val docs = (1L to 40L).map { i =>
      val body = Seq.fill(12 + rnd.nextInt(20))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i, if (i % 5 == 0) s"$body $span" else body)
    }.toDF("doc_id", "text")
    val p1 = graft.ext.TextPipeline.dedupSpans(docs, "doc_id", "text", n = 4)
      .filter(col("n_kept") > 0).persist()
    val p2 = graft.ext.TextPipeline.dedupSpans(
      p1.select(col("doc_id"), col("text_clean").as("text")),
      "doc_id", "text", n = 4)
    val changed = p2.filter(col("n_kept") =!= col("n_tokens")).count()
    assert(changed == 0, s"$changed docs changed on the second pass")
    val t1 = p1.select("doc_id", "text_clean").as[(Long, String)]
      .collect().toMap
    val t2 = p2.select("doc_id", "text_clean").as[(Long, String)]
      .collect().toMap
    assert(t1 == t2)
    p1.unpersist()
  }

  test("dedupSpans property: adversarial chaining converges, not 1-pass") {
    // masking can CREATE duplicated spans: docs 3/4 have distinct
    // middles (each duplicated elsewhere) and collapse to the same
    // "a b" — a brand-new dup the FIRST pass cannot see. A single pass
    // is therefore not a guaranteed global fixpoint (same as Lee et
    // al.'s ExactSubstr); iterating reaches one.
    def pass(df: org.apache.spark.sql.DataFrame) =
      graft.ext.TextPipeline.dedupSpans(df, "doc_id", "text", n = 2)
        .filter(col("n_kept") > 0)
        .select(col("doc_id"), col("text_clean").as("text"))
    val docs = Seq(
      (1L, "c d"), (2L, "e f"),
      (3L, "a c d b"), (4L, "a e f b")).toDF("doc_id", "text")
    val p1 = pass(docs).persist()
    val m1 = p1.as[(Long, String)].collect().toMap
    assert(m1(3L) == "a b" && m1(4L) == "a b", m1) // new dup created
    val p2 = pass(p1).persist()
    val m2 = p2.as[(Long, String)].collect().toMap
    assert(m2 == Map(1L -> "c d", 2L -> "e f", 3L -> "a b"), m2)
    val m3 = pass(p2).as[(Long, String)].collect().toMap
    assert(m3 == m2) // fixpoint reached
    p1.unpersist(); p2.unpersist()
  }

  test("dedupSpans property: non-BMP tokens round-trip and mask exactly") {
    // emoji / CJK-extension tokens are surrogate PAIRS in UTF-16 — the
    // q74 bug class: any per-char (not per-code-point) processing
    // corrupts them. Clean docs must pass through byte-identical;
    // duplicated spans containing non-BMP tokens must mask by content.
    val span = "😀😀 𠜎𠜱 🚀 道 x5"
    val docs = Seq(
      (1L, s"alpha $span omega"),
      (2L, s"beta $span gamma"),       // same 5-token span -> masked here
      (3L, "😈 unique 𡃁 content 🎉 here")).toDF("doc_id", "text")
    val out = graft.ext.TextPipeline.dedupSpans(docs, "doc_id", "text", n = 5)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_kept", "text_clean")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out(0) == ((1L, 7L, 7L, s"alpha $span omega")))
    assert(out(1) == ((2L, 7L, 2L, "beta gamma")))
    assert(out(2) == ((3L, 6L, 6L, "😈 unique 𡃁 content 🎉 here")))
  }

  test("DSIR resampling prefers docs that look like the target domain") {
    val raw = spark.range(200).select(col("id").as("doc_id"),
      when(col("id") % 2 === 0,
        lit("alpha beta gamma delta alpha beta"))
        .otherwise(lit("omega sigma theta lambda omega sigma")).as("text"))
    val target = spark.range(50).select((col("id") * 2).as("doc_id"),
      lit("alpha beta gamma delta").as("text"))
    val picked = graft.ext.Dsir.resample(raw, target, "doc_id", "text",
      k = 50).select("doc_id").as[Long].collect()
    assert(picked.length == 50)
    // weight ratio between families is e^~9 per doc — Gumbel noise
    // cannot realistically flip the family preference
    val evenShare = picked.count(_ % 2 == 0).toDouble / picked.length
    assert(evenShare >= 0.9, s"target-family share $evenShare")
    // hash-derived noise: bit-identical selection under repartitioning
    val again = graft.ext.Dsir.resample(raw.repartition(7), target,
      "doc_id", "text", k = 50).select("doc_id").as[Long].collect()
    assert(picked.toSeq == again.toSeq)
  }

  test("perplexityBuckets tiers docs by LM score with ordered thresholds") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = graft.ext.TextModel
      .perplexityBuckets(docs, "doc_id", "text").persist()
    val n = docs.filter(col("text").isNotNull && trim(col("text")) =!= "")
      .count()
    assert(out.count() == n) // buckets partition the scored corpus
    val byBucket = out.groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("avg_nll").as("lo"),
        max("avg_nll").as("hi"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    // tiers are ordered: every head doc scores <= every middle doc, etc.
    assert(byBucket("head")._3 <= byBucket("middle")._2)
    assert(byBucket("middle")._3 <= byBucket("tail")._2)
    // percentile split: no tier bigger than ~half the corpus (exact
    // thirds only when avg_nll values are distinct; ties may lump)
    assert(byBucket.values.forall(_._1 <= n / 2 + 1))
    out.unpersist()
  }

  test("hashEmbedding histograms tokens into hashed buckets, no shuffle") {
    // deterministic stand-in hash: bucket = token length % dim
    val df = Seq((1L, "a bb a"), (2L, "ccc ccc"), (3L, "a bb a"))
      .toDF("doc_id", "text")
    val emb = df.select(col("doc_id"),
      graft.ext.TextModel.hashEmbedding(col("text"), dim = 4,
        hash = c => length(c).cast("long")).as("v"))
    val got = emb.orderBy("doc_id").as[(Long, Seq[Double])].collect()
    assert(got(0)._2 == Seq(0.0, 2.0, 1.0, 0.0)) // "a"(len1)x2, "bb"(len2)
    assert(got(1)._2 == Seq(0.0, 0.0, 0.0, 2.0)) // "ccc"(len3)x2
    assert(got(0)._2 == got(2)._2)               // deterministic
    val plan = emb.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"must stay narrow:\n$plan")
    // composition: identical docs cluster-dedup at cos 1.0, keep-min-id
    val dupes = graft.ext.Similarity.clusterDupes(emb, "doc_id", "v",
        array_position(col("v"), array_max(col("v"))), minCos = 0.999)
      .collect()
    assert(dupes.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((3L, 1L)))
  }

  test("rrfFuse combines ranks without score calibration") {
    // lexical list: doc 1 first, doc 2 second; dense list: doc 2 first,
    // doc 3 second — doc 2 appears in both and must win the fusion even
    // though neither list ranks it first (the RRF selling point)
    val lex = Seq((1L, 9.5), (2L, 4.0)).toDF("doc_id", "score")
    val dense = Seq((2L, 0.99), (3L, 0.50)).toDF("doc_id", "score")
    val fused = graft.ext.Retrieval.rrfFuse(Seq(lex, dense), "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    val exp2 = BigDecimal(1.0 / 62 + 1.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(fused(2L)._1 == exp2 && fused(2L)._2 == 2L)
    assert(fused(1L)._1 == BigDecimal(1.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(fused(1L)._2 == 1L && fused(3L)._2 == 1L)
    assert(fused(2L)._1 > fused(1L)._1 && fused(1L)._1 > fused(3L)._1)
  }

  // ---------- TF-IDF keywords / PMI collocations ----------

  test("keywords ranks hand-computed tfidf with rounded-score tiebreak") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "apple cherry cherry")).toDF("doc_id", "text")
    val out = graft.ext.TextModel.keywords(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rnk")
      .as[(Long, String, Long, Long, Double, Long)].collect().toSeq
    // df = 2 for every term, N = 3 → idf = ln(4/3) + 1 for all
    def s(tf: Long) = BigDecimal(tf * (math.log(4.0 / 3.0) + 1.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq(
      (1L, "apple", 2L, 2L, s(2), 1L), (1L, "banana", 1L, 2L, s(1), 2L),
      (2L, "banana", 1L, 2L, s(1), 1L), (2L, "cherry", 1L, 2L, s(1), 2L),
      (3L, "cherry", 2L, 2L, s(2), 1L), (3L, "apple", 1L, 2L, s(1), 2L)))
  }

  test("pmiCollocations matches hand-computed PMI; minCount floors") {
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    // pairs: (a,b)x2, (b,a)x1; B=3; counts a=2 b=2; T=4
    val all = graft.ext.TextModel.pmiCollocations(docs, "doc_id", "text",
        minCount = 1)
      .orderBy("term_a", "term_b")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(all == Seq(
      ("a", "b", 2L, 2L, 2L, r4(math.log(2.0 * 4 * 4 / (3.0 * 2 * 2)))),
      ("b", "a", 1L, 2L, 2L, r4(math.log(1.0 * 4 * 4 / (3.0 * 2 * 2))))))
    val floored = graft.ext.TextModel.pmiCollocations(docs, "doc_id",
      "text", minCount = 2).collect()
    assert(floored.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "b")))
    // the integer sufficient statistics (the hash-gate surface) carry
    // the totals the float view folds into the score
    val counts = graft.ext.TextModel.pmiCollocationCounts(docs, "doc_id",
        "text", minCount = 1)
      .orderBy("term_a", "term_b")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(counts == Seq(
      ("a", "b", 2L, 2L, 2L, 4L, 3L),
      ("b", "a", 1L, 2L, 2L, 4L, 3L)))
  }

  // ---------- hard-negative mining ----------

  test("hardNegatives excludes same-label items and self, ranks by cosine") {
    // axis-aligned vectors: query (1,0,0) label 0. Candidates:
    //   2: (0.9,0.1,0) label 1  -> closest different-label = rank 1
    //   3: (0.5,0.5,0) label 1  -> rank 2
    //   4: (0.99,0,0) label 0   -> same label: EXCLUDED despite max sim
    //   5: (0,1,0)   null label -> different from 0: included, rank 3
    val emb = Seq(
      (1L, Seq(1.0, 0.0, 0.0), Option(0)),
      (2L, Seq(0.9, 0.1, 0.0), Option(1)),
      (3L, Seq(0.5, 0.5, 0.0), Option(1)),
      (4L, Seq(0.99, 0.0, 0.0), Option(0)),
      (5L, Seq(0.0, 1.0, 0.0), Option.empty[Int]))
      .toDF("vec_id", "v", "label")
    val out = Retrieval.hardNegatives(emb, emb.filter(col("vec_id") === 1),
        "vec_id", "v", "label", k = 5)
      .orderBy("rnk").collect()
    assert(out.map(_.getAs[Long]("neg_id")).toSeq == Seq(2L, 3L, 5L))
    assert(out.map(_.getAs[Long]("rnk")).toSeq == Seq(1L, 2L, 3L))
    assert(out(0).getAs[Double]("sim") > out(1).getAs[Double]("sim"))
  }

  test("hardNegatives: a null-label query treats labelled items as negatives") {
    val emb = Seq(
      (1L, Seq(1.0, 0.0), Option.empty[Int]),
      (2L, Seq(1.0, 0.1), Option(7)),
      (3L, Seq(1.0, 0.0), Option.empty[Int])) // null <=> null: same, excluded
      .toDF("vec_id", "v", "label")
    val out = Retrieval.hardNegatives(emb, emb.filter(col("vec_id") === 1),
        "vec_id", "v", "label", k = 5).collect()
    assert(out.map(_.getAs[Long]("neg_id")).toSeq == Seq(2L))
  }

  test("hardNegatives caps at k per query") {
    val emb = (1L to 20L).map(i =>
      (i, Seq(1.0, i / 100.0), (i % 2).toInt)).toDF("vec_id", "v", "label")
    val out = Retrieval.hardNegatives(emb, emb.filter(col("vec_id") <= 2),
      "vec_id", "v", "label", k = 3)
    val counts = out.groupBy("query_id").count().as[(Long, Long)]
      .collect().toMap
    assert(counts == Map(1L -> 3L, 2L -> 3L))
  }

  // ---------- semantic decontamination ----------

  test("semanticScreen flags near-copies of bench vectors, keeps clean docs") {
    val bench = Seq((100L, Seq(1.0, 0.0, 0.0))).toDF("vec_id", "v")
    val corpus = Seq(
      (1L, Seq(2.0, 0.001, 0.0)),  // scaled near-copy: contaminated
      (2L, Seq(0.0, 1.0, 0.0)),    // orthogonal: clean
      (3L, Seq(0.0, 0.0, 0.0)))    // zero vector: sim 0.0, clean
      .toDF("vec_id", "v")
    val out = Decontam.semanticScreen(corpus, bench, "vec_id", "v",
        minCos = 0.95)
      .orderBy("vec_id").collect()
    assert(out.length == 3) // every corpus doc present
    assert(out(0).getAs[Boolean]("contaminated"))
    assert(out(0).getAs[Double]("max_sim") >= 0.99)
    assert(!out(1).getAs[Boolean]("contaminated"))
    assert(out(2).getAs[Double]("max_sim") == 0.0)
    val kept = Decontam.semanticDecontaminate(corpus, bench, "vec_id", "v",
      minCos = 0.95).select("vec_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 3L))
  }

  test("semanticScreen with an empty benchmark keeps everything at sim 0") {
    val bench = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "v")
    val corpus = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("vec_id", "v")
    val out = Decontam.semanticScreen(corpus, bench, "vec_id", "v", 0.9)
      .collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Double]("max_sim") == 0.0))
    assert(out.forall(!_.getAs[Boolean]("contaminated")))
  }

  // ---------- cross-source overlap ----------

  test("sourceOverlap counts shared hashes with containment ratio") {
    val docs = Seq(
      (1L, "aaa", "s1"), (2L, "bbb", "s1"), (3L, "ccc", "s1"),
      (4L, "aaa", "s2"), (5L, "bbb", "s2"),      // s1∩s2 = {aaa,bbb}
      (6L, "aaa", "s3"),                         // s3∩s1 = s3∩s2 = {aaa}
      (7L, "aaa", "s2"))                         // within-source copy: no double count
      .toDF("doc_id", "text", "source")
    val out = graft.ext.Dedup.sourceOverlap(docs, "text", "source")
      .orderBy("source_a", "source_b")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("s1", "s2", 2L, 3L, 2L, 1.0),
      ("s1", "s3", 1L, 3L, 1L, 1.0),
      ("s2", "s3", 1L, 2L, 1L, 1.0)))
  }

  test("sourceOverlap omits disjoint pairs and never emits self-pairs") {
    val docs = Seq(
      (1L, "x", "a"), (2L, "y", "b"), (3L, "x", "c"), (4L, "x", "a"))
      .toDF("doc_id", "text", "source")
    val out = graft.ext.Dedup.sourceOverlap(docs, "text", "source").collect()
    assert(out.length == 1) // only (a, c); b is disjoint
    val r = out.head
    assert(r.getAs[String]("source_a") == "a" &&
      r.getAs[String]("source_b") == "c")
    assert(r.getAs[Long]("n_shared") == 1L)
  }

  test("shuffled is a stable seeded permutation; seeds differ") {
    val docs = spark.range(100).toDF("doc_id")
    def order(seed: Long): Seq[Long] =
      Sampling.shuffled(docs, "doc_id", seed)
        .select("doc_id").as[Long].collect().toSeq
    val a1 = order(1); val a2 = order(1); val b = order(2)
    assert(a1 == a2)                  // reproducible across runs
    assert(a1.sorted == b.sorted)     // same row set
    assert(a1 != b)                   // different epoch permutation
    assert(a1 != a1.sorted)           // actually shuffled
  }
}
