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

  /** Line-level corpus deduplication (the C4/RefinedWeb boilerplate
    * remover): any line occurring more than `maxOccurrences` times ACROSS
    * THE WHOLE CORPUS (navigation chrome, cookie banners, license
    * headers) is dropped from every document; surviving lines are
    * reassembled in original order. Docs that lose every line disappear.
    *
    * Output: (idCol, dedup_text, n_lines_kept, n_lines_dropped).
    *
    * Scale: lines explode narrowly; occurrence counting is one shuffle on
    * the 8-byte line hash with map-side combine; the drop is a left-anti
    * join against the (small — only lines that repeat corpus-wide)
    * over-threshold hash set; reassembly is one shuffle on doc id with
    * `array_sort(struct(pos, line))` making the collect order
    * deterministic under any partitioning. */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n", maxOccurrences: Long = 1): DataFrame = {
    require(maxOccurrences >= 1, "maxOccurrences must be >= 1")
    val lines = docs
      .select(col(idCol), posexplode(
        split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("__pos", "__line")))
      .withColumn("__lh", xxhash64(col("__line")))
    val over = lines.groupBy(col("__lh")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxOccurrences)
      .select(col("__lh"))
    lines.join(over, Seq("__lh"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        concat_ws(sep, transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          x => x.getField("__line"))).as("dedup_text"),
        count(lit(1)).as("n_lines_kept"))
      .join(
        docs.select(col(idCol),
          size(split(col(textCol), java.util.regex.Pattern.quote(sep)))
            .cast("long").as("__total")),
        Seq(idCol))
      .withColumn("n_lines_dropped", col("__total") - col("n_lines_kept"))
      .drop("__total")
  }
}
