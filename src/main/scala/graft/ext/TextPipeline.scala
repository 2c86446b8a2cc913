package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus curation — the LLM-training-data composition tying the text
  * operators together (the `ext` analogue of `graft.Pipeline`'s EP1):
  *
  *   normalize → per-doc quality signals → rule filter (quality score,
  *   repetition, length, language) → exact dedup → near-dup dedup →
  *   curated corpus + per-stage survivor counts.
  *
  * All filter signals evaluate in ONE projection pass over the text; the
  * dedup stages are the shuffle-bounded operators from [[Dedup]]. This is
  * the C4/Gopher-style cleaning recipe expressed as a reusable call.
  */
object TextPipeline {

  final case class CurationStats(
      input: Long,
      afterRuleFilter: Long,
      afterExactDedup: Long,
      afterNearDedup: Long)

  final case class CurationResult(curated: DataFrame, stats: CurationStats)

  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Double = 0.7,
      maxRepetition: Double = 0.5,
      minChars: Int = 50,
      allowedLangs: Seq[String] = Nil,
      nearDupJaccard: Double = 0.8,
      computeStats: Boolean = true): CurationResult = {
    val t = col(textCol)
    val langOk: Column =
      if (allowedLangs.isEmpty) lit(true)
      else TextStats.langId(t).isin(allowedLangs: _*)
    // per-stage counts are extra actions; callers that only want the
    // curated frame skip them (-1 sentinel)
    def maybeCount(df: DataFrame): Long = if (computeStats) df.count() else -1L

    val input = maybeCount(docs)
    val filtered = docs
      .withColumn("__norm", TextStats.normalizeText(t))
      .filter(length(col("__norm")) >= minChars &&
        TextStats.qualityScore(t) >= minQuality &&
        TextStats.repetitionRatio(t) <= maxRepetition &&
        langOk)
      .persist()
    // the materializing counts double as (free) stage stats
    val afterFilter = filtered.count()

    // exact dedup: survivors are min-id per content hash
    val keep = Dedup.exactDedup(filtered, idCol, "__norm")
      .select(col("keep_id").as(idCol))
    val exact = filtered.join(keep, Seq(idCol), "left_semi").persist()
    val afterExact = exact.count()
    filtered.unpersist()

    val near = Dedup.dedupNearDuplicates(exact, idCol, textCol,
      minJaccard = nearDupJaccard).drop("__norm").persist()
    // ALWAYS materialize `near` while `exact` is still cached: its plan
    // anti-joins against exact, and unpersisting first would make the
    // caller's first action recompute the whole filter+dedup chain over
    // the corpus. The count is over the (small) survivor set; only the
    // REPORTING of it is optional.
    val afterNear0 = near.count()
    exact.unpersist()
    val afterNear = if (computeStats) afterNear0 else -1L

    CurationResult(near,
      CurationStats(input, afterFilter, afterExact, afterNear))
  }
}
