package graft.ext

import org.apache.spark.sql.DataFrame
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
      idCol: String, textCol: String, n: Int = 13): DataFrame = {
    val bad = contaminated(corpus, bench, idCol, textCol, n)
      .select(col(idCol))
    corpus.join(bad, Seq(idCol), "left_anti")
  }

  /** Per-doc contamination RATE rather than a boolean: fraction of the
    * doc's distinct n-grams that appear in the benchmark — the graded
    * signal used to set drop-vs-audit thresholds. Every corpus doc is
    * returned (rate 0.0 when clean) via a left join against the hit
    * counts. */
  def contaminationRate(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 13): DataFrame = {
    val totals = corpus.select(col(idCol),
      size(Shingles.wordHashGrams(col(textCol), n))
        .cast(LongType).as("n_grams"))
    val hits = contaminated(corpus, bench, idCol, textCol, n)
      .select(col(idCol), col("n_hit_grams"))
    totals.join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"),
        when(col("n_grams") > 0,
          coalesce(col("n_hit_grams"), lit(0L)).cast("double") /
            col("n_grams").cast("double"))
          .otherwise(lit(0.0)).as("contamination"))
  }
}
