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
    * deterministic). */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 100000): Seq[(String, String)] = {
    require(numMerges >= 0 && maxWords > 0)
    val freq = docs
      .select(explode(regexp_extract_all(lower(col(textCol)), lit("\\S+"), lit(0))).as("w"))
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
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < numMerges) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) round = numMerges
      else {
        val (bestPair, _) = pairCounts.maxBy { case ((a, b), n) =>
          (n, a, b)
        }(Ordering.Tuple3(Ordering.Long, Ordering.String.reverse,
          Ordering.String.reverse))
        merges += bestPair
        val merged = bestPair._1 + bestPair._2
        words.foreach { case (syms, _) =>
          var j = 0
          while (j < syms.length - 1) {
            if (syms(j) == bestPair._1 && syms(j + 1) == bestPair._2) {
              syms(j) = merged
              syms.remove(j + 1)
            } else j += 1
          }
        }
        round += 1
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
