package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.MisraGriesAgg

/** Exact corpus-wide frequent tokens WITHOUT shuffling the vocabulary —
  * the two-pass heavy-hitters design for unbounded key domains:
  *
  *   pass 1: one [[MisraGriesAgg]] sketch over the token stream (narrow
  *           explode, partial aggregation, a single `capacity`-bounded
  *           buffer per partition merged on one reducer — NO token-keyed
  *           shuffle). Guarantee: every token with frequency
  *           > n/(capacity+1) is among the candidates.
  *   pass 2: exact counts for ONLY the candidate set (an `isin` filter
  *           compiles to a broadcast-free InSet probe riding the scan;
  *           the groupBy shuffles at most `capacity` distinct keys).
  *
  * Contrast with [[TextModel.vocabulary]], which is the right call when
  * you WANT the full vocabulary as a distributed frame; this is the
  * right call when you want the heavy tail cut before the shuffle — at
  * web scale the vocabulary is ~1e9 junk-heavy terms while the answer
  * is a few hundred rows.
  *
  * Output is EXACT (token, freq) for every token with
  * freq ≥ ceil(minFreqRatio·n), ordered by (freq desc, token) — fully
  * deterministic (the sketch's merge-order wobble affects only which
  * EXTRA candidates reach pass 2, and pass 2's exact threshold filters
  * those identically). `capacity` defaults to 2/minFreqRatio — twice
  * the 1/minFreqRatio the guarantee needs.
  *
  * Sizing honesty: the buffer is `capacity` (string, long) entries per
  * partial aggregate, so the design targets ratios down to ~1e-5
  * (200k-entry buffers). For far rarer thresholds the candidate set
  * stops being driver-sized and the right tool is
  * [[TextModel.vocabulary]]'s distributed frame again — the sketch's
  * win is exactly the regime where the answer is small. */
object HeavyHitters {

  /** `sketchGroups > 1` shards the candidate pass by token hash: every
    * occurrence of a token lands in exactly ONE group, so a token heavy
    * in the whole stream (freq > n/(capacity+1)) is at least as heavy
    * relative to its own group's substream and the per-group guarantee
    * still covers it. Use when ratio is small AND the cluster is large:
    * the single-reducer final merge of the ungrouped pass receives one
    * `capacity`-entry partial per map partition, which at 10k partitions
    * × a 200k-entry capacity is a many-GB single-task merge — sharding
    * splits that across `sketchGroups` reducers at the cost of a
    * `sketchGroups × capacity` candidate bound. */
  def frequentTokens(docs: DataFrame, textCol: String,
      minFreqRatio: Double, capacity: Int = 0,
      sketchGroups: Int = 1): DataFrame =
    frequentWeighted(
      docs
        .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
        .select(explode(regexp_extract_all(lower(col(textCol)), lit("\\S+"), lit(0)))
          .as("token"))
        .withColumn("__w", lit(1L)),
      "token", "__w", minFreqRatio, capacity, sketchGroups)
      .withColumnRenamed("weight", "freq")

  /** Sanitized (item, __w) projection shared by the exact and sketched
    * forms: null items and non-positive weights contribute nothing; a
    * fractional weight column is rejected (the counts are longs — 0.5
    * would silently truncate to 0; scale to integer units instead). */
  private def weightedBase(items: DataFrame, itemCol: String,
      weightCol: String): DataFrame = {
    items.schema(weightCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case d: org.apache.spark.sql.types.DecimalType if d.scale == 0 => ()
      case other => throw new IllegalArgumentException(
        s"weight column `$weightCol` must be integral (got $other): " +
          "scale fractional weights to integer units first")
    }
    items
      .filter(col(itemCol).isNotNull && col(weightCol) > 0)
      .select(col(itemCol).cast("string").as("item"),
        col(weightCol).cast("long").as("__w"))
  }

  /** Exact totals ≥ threshold, (weight desc, item) order — the ONE copy
    * of the output contract both the sketched and exact forms share. */
  private def screen(base: DataFrame, threshold: Long,
      itemCol: String): DataFrame =
    base.groupBy(col("item"))
      .agg(sum(col("__w")).as("weight"))
      .filter(col("weight") >= threshold)
      .orderBy(col("weight").desc, col("item"))
      .withColumnRenamed("item", itemCol)

  /** Exact heavy hitters by FULL aggregation — for inputs whose distinct
    * item domain is already bounded: a pre-aggregated (item, weight)
    * store ([[graft.streaming.Streams.tokenCountSink]]'s read side), a
    * per-source mass table. No sketch pass and no driver-sized candidate
    * array — two store-sized scans (total + groupBy). Same threshold and
    * ordering contract as [[frequentWeighted]]; prefer the sketched form
    * when the domain is unbounded (raw token streams). */
  def frequentExact(items: DataFrame, itemCol: String, weightCol: String,
      minWeightRatio: Double): DataFrame = {
    require(minWeightRatio > 0 && minWeightRatio <= 1,
      s"minWeightRatio must be in (0, 1], got $minWeightRatio")
    val base = weightedBase(items, itemCol, weightCol)
    val w = base.agg(coalesce(sum(col("__w")), lit(0L))).head().getLong(0)
    screen(base, math.max(1L, math.ceil(minWeightRatio * w).toLong), itemCol)
  }

  /** The general form over ANY (item, weight) frame — top domains by
    * bytes, sources by token mass. Exact (item, weight = Σ) for every
    * item with weight ≥ ceil(minWeightRatio · W); null items and
    * non-positive weights contribute nothing. */
  def frequentWeighted(items: DataFrame, itemCol: String, weightCol: String,
      minWeightRatio: Double, capacity: Int = 0,
      sketchGroups: Int = 1): DataFrame = {
    require(minWeightRatio > 0 && minWeightRatio <= 1,
      s"minWeightRatio must be in (0, 1], got $minWeightRatio")
    require(sketchGroups >= 1, s"sketchGroups must be >= 1, got $sketchGroups")
    val cap =
      if (capacity > 0) capacity
      else math.max(16, math.ceil(2.0 / minWeightRatio).toInt)
    require(cap + 1 > 1.0 / minWeightRatio,
      s"capacity $cap cannot guarantee ratio $minWeightRatio " +
        s"(need capacity+1 > ${1.0 / minWeightRatio})")
    val base = weightedBase(items, itemCol, weightCol)
    // candidates + total weight in ONE pass over the stream
    val (cands, w) =
      if (sketchGroups == 1) {
        val r = base.agg(
          MisraGriesAgg.weightedCandidates(col("item"), col("__w"), cap)
            .as("cands"),
          // coalesce: sum over an empty frame is NULL, and getLong would
          // NPE before the empty-candidates early return below
          coalesce(sum(col("__w")), lit(0L)).as("w")).head()
        (r.getSeq[String](0), r.getLong(1))
      } else {
        val rows = base
          .groupBy(pmod(xxhash64(col("item")), lit(sketchGroups.toLong))
            .as("__g"))
          .agg(MisraGriesAgg.weightedCandidates(col("item"), col("__w"), cap)
            .as("cands"),
            sum(col("__w")).as("w"))
          .collect()
        (rows.flatMap(_.getSeq[String](1)).toSeq,
          rows.map(_.getLong(2)).sum)
      }
    val threshold = math.max(1L, math.ceil(minWeightRatio * w).toLong)
    if (cands.isEmpty)
      return base.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(
          s"$itemCol STRING, weight BIGINT"))
    // small candidate sets ride the scan as an InSet predicate; large
    // ones would bloat the plan (every candidate is a literal in the
    // expression tree), so they probe via a broadcast semi-join instead
    // — same result, plan size independent of the candidate count
    val screened =
      if (cands.size <= 1000) base.filter(col("item").isin(cands: _*))
      else {
        import base.sparkSession.implicits._
        base.join(broadcast(cands.toDF("item")), Seq("item"), "left_semi")
      }
    screen(screened, threshold, itemCol)
  }
}
