package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Benchmark decontamination for training corpora: flag every corpus
  * document that shares at least one word n-gram with an evaluation /
  * benchmark set (the standard GPT-3/PaLM-style 13-gram overlap check —
  * training on eval data silently inflates benchmark scores, so
  * contaminated docs are dropped or audited before training).
  *
  * Scale design: the benchmark side is tiny relative to the corpus (MBs of
  * eval sets vs TBs of training text), so its distinct gram set is
  * BROADCAST — the corpus is never shuffled for the match itself; each
  * corpus partition streams once through shingle → hash → broadcast hash
  * join. The only shuffle is the final per-doc aggregation of hits, keyed
  * by doc id (and only over the matched sliver, not the whole corpus).
  * Set `broadcastBench = false` for unusually large benchmark suites; the
  * join then degrades gracefully to a shuffle hash join on the gram hash.
  */
object Decontam {

  /** Corpus docs sharing ≥1 word `n`-gram with `bench`.
    *
    * Output: one row per CONTAMINATED corpus doc —
    * (idCol, n_hit_grams = distinct overlapping grams,
    * n_bench_docs = distinct benchmark docs hit,
    * first_bench_id = smallest such benchmark id).
    * Clean docs are absent; anti-join callers use [[decontaminate]].
    *
    * Grams are distinct-per-doc 64-bit combined-word-hash keys
    * ([[Shingles.wordHashGrams]]): each word is hashed once and windows
    * mix word hashes with long arithmetic — 13-gram STRINGS are never
    * materialized (measured 6× on 2M docs × 13-grams). */
  def contaminated(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 13,
      broadcastBench: Boolean = true): DataFrame = {
    def grams(df: DataFrame, outId: String): DataFrame =
      df.select(col(idCol).as(outId),
        explode(Shingles.wordHashGrams(col(textCol), n)).as("__gram"))
    val cg = grams(corpus, "__cid")
    val bgRaw = grams(bench, "__bid")
    val bg = if (broadcastBench) broadcast(bgRaw) else bgRaw
    cg.join(bg, "__gram")
      .groupBy(col("__cid").as(idCol))
      .agg(
        countDistinct(col("__gram")).as("n_hit_grams"),
        countDistinct(col("__bid")).as("n_bench_docs"),
        min(col("__bid")).as("first_bench_id"))
  }

  /** The clean corpus: drops every contaminated doc via a broadcast-able
    * LEFT ANTI join on the contaminated id set (itself a sliver of the
    * corpus by construction). */
  def decontaminate(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 13,
      // false for eval suites whose exploded gram set is too big to
      // broadcast (contaminated's flag, plumbed through the dropper
      // entry point too — degrades to a shuffle hash join)
      broadcastBench: Boolean = true): DataFrame = {
    val bad = contaminated(corpus, bench, idCol, textCol, n, broadcastBench)
      .select(col(idCol))
    // NULL-SAFE anti join: a dirty shard's null-id docs can carry
    // benchmark text too, and a plain anti join never matches null = null
    // — the flagged rows would silently SURVIVE decontamination, the
    // exact leak this operator exists to prevent
    graft.io.VersionedTable.keyJoin(corpus, bad, Seq(idCol), "left_anti")
  }

  /** Serialized Bloom filter over the benchmark's distinct gram hashes,
    * built with Spark's own sketch (`org.apache.spark.util.sketch` — the
    * same filter the engine's runtime row-level filtering broadcasts).
    * ~1.2 bytes/gram at 0.1% fpp: a 100M-gram eval suite compresses to a
    * ~170 MB constant instead of a join-able row set. Build it once,
    * store the bytes, reuse across corpus shards and runs. */
  def gramBloom(bench: DataFrame, textCol: String,
      n: Int = 13, fpp: Double = 0.001): Array[Byte] = {
    val bg = bench
      .select(explode(Shingles.wordHashGrams(col(textCol), n)).as("__gram"))
      .distinct().persist()
    try {
      val items = math.max(bg.count(), 1L)
      val bf = bg.stat.bloomFilter("__gram", items, fpp)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    } finally { bg.unpersist(blocking = false); () }
  }

  /** Bloom probe as a native codegen-able predicate (catalyst
    * `BloomFilterMightContain` over a binary literal): the filter
    * deserializes once per task, each probe is a couple of hash mixes —
    * no per-row deserialization, no UDF. */
  def mightContainGram(bloom: Array[Byte], gram: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          bloom, org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.graftbridge.Bridge.expression(gram)))

  /** Zero-shuffle contamination screen: per-doc count of distinct gram
    * hashes the benchmark bloom might contain — a pure narrow map, NO
    * join and NO shuffle at any corpus size. ~fpp false positives per
    * gram, never false negatives. The cheap first pass when the corpus
    * is 100 TB and the answer for almost every doc is "clean". */
  def bloomScreen(corpus: DataFrame, bloom: Array[Byte],
      idCol: String, textCol: String, n: Int = 13): DataFrame =
    // wordHashGrams output is already sorted-deduped (GramMixHashes) — a
    // further array_distinct would be pure per-row tax on the 100 TB pass
    // coalesce: GramMixHashes null-propagates, and size(null) is the
    // legacy -1 sentinel (or null under ANSI) — a null-text doc must
    // report 0 flagged grams, not leak -1 into analyst-facing counts
    corpus.select(col(idCol),
      size(filter(Shingles.wordHashGrams(
          coalesce(col(textCol), lit("")), n),
        g => mightContainGram(bloom, g))).as("n_flagged_grams"))

  /** Exact contamination with the bloom as a pre-screen: output is
    * IDENTICAL to [[contaminated]] (blooms have no false negatives, and
    * the exact gram join then discards the false positives), but the
    * corpus-side explode + join runs only on the flagged sliver — true
    * hits plus ~fpp of the clean mass — instead of every doc. The shape
    * that survives a 100 TB corpus against a large eval suite. */
  def contaminatedScreened(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 13,
      fpp: Double = 0.001, broadcastBench: Boolean = true): DataFrame = {
    val bloom = gramBloom(bench, textCol, n, fpp)
    val flagged = corpus.filter(
      exists(Shingles.wordHashGrams(col(textCol), n),
        g => mightContainGram(bloom, g)))
    // plumb broadcastBench: the bloom path exists for LARGE eval suites,
    // exactly when broadcasting the bench gram rows into the exact join
    // may be infeasible — false degrades it to a shuffle hash join
    contaminated(flagged, bench, idCol, textCol, n, broadcastBench)
  }

  /** Per-doc contamination RATE rather than a boolean: fraction of the
    * doc's distinct n-grams that appear in the benchmark — the graded
    * signal used to set drop-vs-audit thresholds. Every corpus doc is
    * returned (rate 0.0 when clean) via a left join against the hit
    * counts. */
  def contaminationRate(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 13,
      broadcastBench: Boolean = true): DataFrame = {
    val totals = corpus.select(col(idCol),
      // coalesce: null text must report 0 grams, not size(null) = -1
      size(Shingles.wordHashGrams(coalesce(col(textCol), lit("")), n))
        .cast(LongType).as("n_grams"))
    // NULL-SAFE left join (same contract as decontaminate's anti join):
    // a null-id doc's hit row never matches a plain column join, so the
    // graded rate would report the doc perfectly CLEAN — the exact
    // inversion of the leak this module exists to catch
    val hits = contaminated(corpus, bench, idCol, textCol, n,
        broadcastBench)
      .select(col(idCol).as("__hit_id"), col("n_hit_grams"))
    totals.join(hits, totals(idCol) <=> hits("__hit_id"), "left")
      .drop("__hit_id")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"),
        when(col("n_grams") > 0,
          coalesce(col("n_hit_grams"), lit(0L)).cast("double") /
            col("n_grams").cast("double"))
          .otherwise(lit(0.0)).as("contamination"))
  }

  /** Semantic (embedding-space) decontamination: for every corpus vector,
    * the maximum cosine similarity against ANY benchmark vector, plus a
    * contaminated verdict at `minCos`. Catches the paraphrased / reworded
    * eval leakage that exact n-gram overlap misses (the reason modern
    * decontamination runs both checks).
    *
    * Output: one row per corpus doc — (idCol, max_sim, contaminated).
    * Every corpus doc is returned (max_sim 0.0 when the benchmark is
    * empty); droppers use [[semanticDecontaminate]].
    *
    * Scale design: mirrors [[contaminated]] — the benchmark embedding set
    * is tiny vs the corpus, so it is BROADCAST and the corpus-side pass is
    * narrow (a BroadcastNestedLoopJoin fan-out evaluated per partition).
    * The per-doc `max` reduces map-side BEFORE the only shuffle, which
    * therefore carries one (id, double) row per corpus doc — not the
    * fan-out. Norms are computed once per row before the join; pair
    * similarity is one codegen'd VecDot. Cosines are rounded to
    * `roundDigits` BEFORE the max so the result is order-independent and
    * cross-engine reproducible. */
  def semanticScreen(corpus: DataFrame, bench: DataFrame,
      idCol: String, vecCol: String, minCos: Double,
      roundDigits: Int = 4): DataFrame = {
    // Similarity.scorable, not a bare > 0: one NaN element in ONE
    // benchmark vector would make every corpus doc's max_sim NaN (NaN
    // passes > 0 and aggregates as the greatest double), NaN >= minCos
    // is TRUE — and semanticDecontaminate would delete the ENTIRE corpus
    val b = broadcast(bench.select(col(vecCol).as("__bv"),
      Similarity.norm(col(vecCol)).as("__bn"))
      .filter(Similarity.scorable(col("__bn"))))
    val c = corpus.select(col(idCol), col(vecCol).as("__cv"),
      Similarity.norm(col(vecCol)).as("__cn"))
    // LEFT join on a literal-true condition: an empty benchmark must keep
    // every corpus doc (max_sim 0.0), not silently return zero rows
    c.join(b, lit(true), "left")
      .withColumn("__sim", round(
        when(Similarity.scorable(col("__cn")) &&
            Similarity.scorable(col("__bn")),
          Similarity.dot(col("__cv"), col("__bv")) /
            (col("__cn") * col("__bn")))
          .otherwise(lit(0.0)), roundDigits))
      .groupBy(col(idCol))
      .agg(max(col("__sim")).as("max_sim"))
      .select(col(idCol), col("max_sim"),
        (col("max_sim") >= lit(minCos)).as("contaminated"))
  }

  /** Anti-join droppers' view of [[semanticScreen]]: the corpus minus
    * every doc whose max benchmark cosine reaches `minCos`. */
  def semanticDecontaminate(corpus: DataFrame, bench: DataFrame,
      idCol: String, vecCol: String, minCos: Double): DataFrame =
    // null-safe for the same reason as [[decontaminate]]
    graft.io.VersionedTable.keyJoin(corpus,
      semanticScreen(corpus, bench, idCol, vecCol, minCos)
        .filter(col("contaminated")).select(col(idCol)),
      Seq(idCol), "left_anti")
}
