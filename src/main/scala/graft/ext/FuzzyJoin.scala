package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fuzzy string matching join — the entity-resolution / sanctions-screening
  * shape (match a small watchlist of names against a large customer corpus
  * under an edit-distance bound, e.g. AML name screening).
  *
  * Algorithm: q-gram prefix filtering (Chaudhuri et al., ICDE'06) with an
  * EXACT recall guarantee, then exact Levenshtein verification:
  *
  *   - strings are padded with q−1 sentinel chars on each side (the
  *     classic q-gram trick), so a string of length L has L+q−1 grams and
  *     one edit changes at most `q` of them; a pair within `maxDist`
  *     therefore still shares every left-side gram except at most
  *     `q·maxDist`;
  *   - blocking on each left string's `q·maxDist + 1` RAREST grams
  *     (rarity = document frequency in the right corpus, ties by gram for
  *     determinism) can never miss a true match — at least one blocking
  *     gram survives the edits and appears in the right string's grams.
  *     Rare grams keep the candidate set small even when all names share
  *     a low-entropy prefix ("Customer#…"), which would make naive gram
  *     blocking degenerate to all-pairs;
  *   - left strings too short to own q·maxDist + 1 grams (length ≤
  *     q·maxDist − q + 1, e.g. single chars at q=3, d=1) fall back to a
  *     LENGTH-WINDOW equi-join: a dist-≤d pair differs in length by at
  *     most d, and such strings are a tiny sliver on both sides.
  *
  * The final output is EXACTLY the pairs within `maxDist` (case-
  * insensitive) — blocking choices are invisible in the result, so a
  * brute-force oracle reproduces it bit-for-bit.
  *
  * Scale design: the left side is the small watchlist; everything keyed
  * off it stays broadcast-sized. Corpus-side work is one padded-gram
  * explode feeding (a) a df aggregate pre-screened by a broadcast
  * semi-join to the watchlist's own grams (so the count shuffle carries
  * at most |watchlist grams| keys, never the corpus vocabulary) and
  * (b) the broadcast candidate probe. The quadratic verify runs only on
  * the deduped candidate sliver.
  */
object FuzzyJoin {

  /** Distinct q-grams of `lower(s)` padded with q−1 sentinels per side.
    * The sentinels (U+0001/U+0002) sort below printable text and cannot
    * collide with it. */
  def qgrams(s: Column, q: Int): Column = {
    val lo = concat(lit("\u0001" * (q - 1)), lower(s), lit("\u0002" * (q - 1)))
    // padded length ≥ 2(q−1)+1 ≥ q for any non-empty s: sequence is safe
    array_distinct(transform(
      sequence(lit(1), length(lo) - (q - 1)),
      i => lo.substr(i, lit(q))))
  }

  /** All (left, right) name pairs with Levenshtein distance ≤ `maxDist`
    * (case-insensitive). Output: (leftIdCol, leftNameCol, rightIdCol,
    * rightNameCol, dist). Null or empty names never match. */
  def fuzzyMatch(left: DataFrame, right: DataFrame,
      leftIdCol: String, leftNameCol: String,
      rightIdCol: String, rightNameCol: String,
      maxDist: Int, q: Int = 3): DataFrame = {
    require(maxDist >= 0 && q >= 2, "maxDist >= 0 and q >= 2")
    val keep = q * maxDist + 1
    val l = left.filter(col(leftNameCol).isNotNull &&
      length(col(leftNameCol)) > 0)
    val r = right.filter(col(rightNameCol).isNotNull &&
      length(col(rightNameCol)) > 0)
    val rg = r.select(col(rightIdCol), col(rightNameCol),
      explode(qgrams(col(rightNameCol), q)).as("__gram"))
    // left rows with enough grams to guarantee a surviving blocking gram:
    // padded gram count is length + q − 1, need > q·maxDist
    val guaranteed = col(leftNameCol).isNotNull &&
      (length(col(leftNameCol)) + (q - 1)) > q * maxDist
    val lg = l.filter(guaranteed).select(col(leftIdCol), col(leftNameCol),
      explode(qgrams(col(leftNameCol), q)).as("__gram"))
    // corpus gram document frequency — the rarity signal. Rarity is only
    // ever consulted for the WATCHLIST's own grams, so screen the corpus
    // gram stream down to them with a broadcast semi-join BEFORE the df
    // aggregate: the count shuffle then carries at most |watchlist grams|
    // keys instead of the corpus's whole gram vocabulary. (The ranking is
    // unchanged — kept grams get identical df values — and the recall
    // guarantee never depended on WHICH q·maxDist+1 grams are kept.)
    val lgrams = lg.select(col("__gram")).distinct()
    val gramDf = rg.join(broadcast(lgrams), Seq("__gram"), "left_semi")
      .groupBy(col("__gram"))
      .agg(count(lit(1)).as("__df"))
    // annotate watchlist grams with corpus df (absent → 0: a gram the
    // corpus has never seen is maximally rare), keep the q·maxDist+1
    // rarest per left row
    val rare = lg.join(broadcast(gramDf), Seq("__gram"), "left")
      .withColumn("__df", coalesce(col("__df"), lit(0L)))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(leftIdCol))
          .orderBy(col("__df").asc, col("__gram").asc)))
      .filter(col("__rk") <= keep)
      .select(col(leftIdCol), col(leftNameCol), col("__gram"))
    // candidate pairs: corpus grams probed by the broadcast rare-gram set
    val gramCands = broadcast(rare).join(rg, Seq("__gram"))
      .select(col(leftIdCol), col(leftNameCol),
        col(rightIdCol), col(rightNameCol))
    // ultra-short left rows: equi-join on each length within ±maxDist (a
    // dist-≤d pair differs in length by ≤ d); both sides are slivers
    val shortCands = l.filter(!guaranteed)
      .select(col(leftIdCol), col(leftNameCol),
        explode(sequence(
          greatest(length(col(leftNameCol)) - maxDist, lit(1)),
          length(col(leftNameCol)) + maxDist)).as("__len"))
    val lenCands = broadcast(shortCands)
      .join(r.withColumn("__len", length(col(rightNameCol))), Seq("__len"))
      .select(col(leftIdCol), col(leftNameCol),
        col(rightIdCol), col(rightNameCol))
    gramCands.unionByName(lenCands)
      .distinct()
      .withColumn("dist",
        levenshtein(lower(col(leftNameCol)), lower(col(rightNameCol)))
          .cast(LongType))
      .filter(col("dist") <= maxDist)
  }
}
