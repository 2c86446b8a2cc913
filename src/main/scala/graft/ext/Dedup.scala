package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Shared shingling helpers. */
object Shingles {
  /** Word n-grams as space-joined strings; docs shorter than n words yield
    * a single shingle of the whole text. Pure higher-order-function Column
    * algebra — no UDF, stays in codegen. */
  def wordShingles(text: Column, n: Int): Column = {
    val tokens = split(lower(trim(text)), "\\s+")
    when(size(tokens) <= n, array(concat_ws(" ", tokens)))
      .otherwise(transform(
        sequence(lit(0), size(tokens) - n),
        i => concat_ws(" ", slice(tokens, i + 1, lit(n)))))
  }

  /** Exact Jaccard over two string arrays (as sets). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    val union = size(array_union(a, b)).cast(DoubleType)
    when(union > 0, inter / union).otherwise(lit(0.0))
  }
}

/** Deduplication operators for LLM-scale corpora (north-star; SURVEY §2.11):
  * exact hash dedup, MinHash+LSH near-dup, SimHash near-dup, and exact
  * n-gram Jaccard verification.
  *
  * Scale design: every method is shuffle-bounded by (band/bucket key) —
  * never an all-pairs cross join. Candidate generation is a self-join on
  * LSH bucket keys, so the quadratic blow-up is confined to within-bucket
  * groups (tunable via bands/rows). This is the standard web-scale dedup
  * shape (e.g. the GPT-3/C4 dedup pipelines from public papers).
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the minimum id (deterministic
    * survivor). One shuffle on the hash. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * min of xxhash64(seed # shingle) over the doc's shingle set. Returns
    * (id, shingles, sig: array<long>). */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 32): DataFrame = {
    val sh = Shingles.wordShingles(col(textCol), shingleSize)
    val sig = array((0 until numHashes).map { seed =>
      array_min(transform(col("shingles"), s =>
        xxhash64(concat(lit(s"$seed#"), s))))
    }: _*)
    docs.select(col(idCol), sh.as("shingles")).withColumn("sig", sig)
  }

  /** MinHash + LSH banding near-dup candidates, verified with exact
    * Jaccard. `numHashes = bands * rowsPerBand`. Returns candidate pairs
    * (a < b) with estimated and exact Jaccard, filtered at `minJaccard`.
    *
    * Shuffles: one to explode/group by (band, bandHash); the self-join on
    * the band key is a hash join on a high-cardinality key — no global
    * cross join anywhere. */
  def minHashLsh(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      minJaccard: Double = 0.5): DataFrame = {
    val numHashes = bands * rowsPerBand
    val signed = minHashSignatures(docs, idCol, textCol, shingleSize, numHashes)
      .select(col(idCol).as("id"), col("shingles"), col("sig"))

    val banded = signed.select(col("id"), col("shingles"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b)))
        .as(Seq("band", "band_hash")))

    val l = banded.select(col("band"), col("band_hash"),
      col("id").as("a"), col("shingles").as("sh_a"))
    val r = banded.select(col("band"), col("band_hash"),
      col("id").as("b"), col("shingles").as("sh_b"))
    val cand = l.join(r, Seq("band", "band_hash"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("a", "b")

    cand
      .withColumn("jaccard", Shingles.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** 64-bit SimHash per doc from token hashes: bit j of the signature is
    * the sign of sum over tokens of ±1 (weighted by token count) at bit j.
    * Implemented as explode → 64 conditional sums → bit reassembly; one
    * shuffle on the doc id. */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokens = docs.select(col(idCol),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$j")
    }
    val agg = tokens.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { j =>
      when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    agg.select(col(idCol), sig.as("simhash"))
  }

  /** SimHash near-dup pairs within `maxHamming`, candidates via 4×16-bit
    * band blocking (any pair within Hamming distance 3 shares at least one
    * exact 16-bit band — pigeonhole), verified with bit_count(xor). */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = simHash(docs, idCol, textCol)
      .select(col(idCol).as("id"), col("simhash"))
    val banded = sigs.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("band", "band_val")))
    val l = banded.select(col("band"), col("band_val"),
      col("id").as("a"), col("simhash").as("sig_a"))
    val r = banded.select(col("band"), col("band_val"),
      col("id").as("b"), col("simhash").as("sig_b"))
    l.join(r, Seq("band", "band_val"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast(LongType)
          .as("hamming"))
      .dropDuplicates("a", "b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard for all pairs within a blocking key (e.g. source
    * or length bucket) — the brute verification tier; candidates should
    * come from LSH at scale. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, shingleSize: Int = 3): DataFrame = {
    val sh = docs.select(col(blockCol).as("blk"), col(idCol).as("id"),
      Shingles.wordShingles(col(textCol), shingleSize).as("sh"))
    val l = sh.select(col("blk"), col("id").as("a"), col("sh").as("sh_a"))
    val r = sh.select(col("blk"), col("id").as("b"), col("sh").as("sh_b"))
    l.join(r, Seq("blk"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        Shingles.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
  }
}
