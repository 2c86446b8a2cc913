package graft.ext

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer prep: learn a merge table from the corpus
  * word-frequency profile, then encode documents with the learned merges
  * (the [[graft.functions.BpeEncode]] native expression).
  *
  * Scale shape (how GPT-2-class tokenizers are actually trained): the
  * corpus — arbitrarily large — reduces to a (word, count) frequency
  * table with ONE shuffle; training then runs on the top-`maxWords` rows
  * of that table, which is vocabulary-sized (Heaps' law: ~millions of
  * distinct words for a 100 TB corpus, and the frequency-ranked head that
  * decides merges is far smaller), collected to the driver exactly like
  * the k-means centroid and small-graph union-find gates elsewhere in
  * this library. Nothing corpus-sized ever leaves the executors; the cap
  * is explicit and deterministic (count desc, word asc).
  */
object Bpe {

  /** Learn `numMerges` merges from the corpus. Greedy BPE on the word
    * frequency table: each round merges the adjacent symbol pair with the
    * highest corpus frequency (ties broken lexicographically — fully
    * deterministic, and identical to the naive full-recount loop this
    * replaced: same selection order, same in-word left-to-right merge
    * application as [[graft.functions.BpeEncode]]'s inference loop).
    *
    * Driver cost is INCREMENTAL, not quadratic: pair counts maintain
    * themselves from only the words the last merge touched (pair→word
    * index), with a lazy-deletion max-heap over (count, pair) — every
    * count change pushes its new value, stale entries discard on pop.
    * A GPT-2-class run (50k merges over a 100k-word head) is O(total
    * touched symbols + pushes·log), not O(numMerges × corpus-symbols).
    *
    * Lowercasing is [[graft.functions.RootLower]] (Locale.ROOT), NOT
    * Spark's `lower()` — the JVM-default-locale path of `lower()` would
    * learn merges over an alphabet the ROOT-lowering [[encode]] never
    * produces on tr/az-locale deployments. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 100000): Seq[(String, String)] = {
    require(numMerges >= 0 && maxWords > 0)
    val lowered = org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.RootLower(
        org.apache.spark.sql.graftbridge.Bridge.expression(col(textCol))))
    val freq = docs
      .select(explode(regexp_extract_all(lowered, lit("\\S+"), lit(0))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // words as mutable symbol arrays (whole code points — see
    // BpeEncode.codePointSymbols), weighted by corpus frequency
    val words = freq.map { case (w, n) =>
      (graft.functions.BpeEncode.codePointSymbols(w), n)
    }
    // the maxBy this replaced: greatest count, ties to the LEXICALLY
    // SMALLEST (a, b) (reversed string orderings under a max)
    val ord = Ordering.Tuple3(Ordering.Long,
      Ordering.String.reverse, Ordering.String.reverse)
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.BitSet]
    val pq = mutable.PriorityQueue.empty[(Long, String, String)](
      ord.on(e => (e._1, e._2, e._3)))
    def bump(p: (String, String), delta: Long, wi: Int): Unit = {
      val n = pairCounts.getOrElse(p, 0L) + delta
      if (n <= 0L) { pairCounts.remove(p); () }
      else {
        pairCounts(p) = n
        if (wi >= 0) pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += wi
        // push the NEW value (lazy deletion: stale entries — including
        // ones for counts that have since DECREASED — discard on pop)
        pq.enqueue((n, p._1, p._2))
      }
    }
    words.iterator.zipWithIndex.foreach { case ((syms, n), wi) =>
      var i = 0
      while (i < syms.length - 1) {
        bump((syms(i), syms(i + 1)), n, wi)
        i += 1
      }
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    while (merges.size < numMerges && pq.nonEmpty) {
      val (cnt, a, b) = pq.dequeue()
      val pair = (a, b)
      if (pairCounts.getOrElse(pair, 0L) == cnt) { // fresh entry = true max
        merges += pair
        val mergedSym = a + b
        // touch only the words indexed under this pair (the index is
        // additive-lazy: a word that no longer contains the pair just
        // scans to nothing)
        pairWords.remove(pair).foreach(_.foreach { wi =>
          val (syms, n) = words(wi)
          var j = 0
          while (j < syms.length - 1) {
            if (syms(j) == a && syms(j + 1) == b) {
              if (j > 0) bump((syms(j - 1), a), -n, -1)
              if (j + 2 < syms.length) bump((b, syms(j + 2)), -n, -1)
              bump(pair, -n, -1)
              syms(j) = mergedSym
              syms.remove(j + 1)
              if (j > 0) bump((syms(j - 1), mergedSym), n, wi)
              if (j + 1 < syms.length) bump((mergedSym, syms(j + 1)), n, wi)
              // do not advance: matches the naive loop (and BpeEncode) —
              // the merged symbol is re-examined against the next one
            } else j += 1
          }
        })
        pairCounts.remove(pair)
      }
    }
    merges.toSeq
  }

  /** Encode a text column with a learned merge table; returns
    * `array<string>` of BPE tokens. */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.BpeEncode(
        org.apache.spark.sql.graftbridge.Bridge.expression(text), merges))
}
