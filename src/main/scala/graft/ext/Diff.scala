package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus version diffing — the data-ops primitive behind dataset
  * release notes, incremental re-processing ("run the pipeline only on
  * added∪changed") and regression triage. One null-safe full-outer join
  * on the id: at 100 TB this is a single co-partitioned shuffle, and
  * both sides prune to (id + compared columns) before it.
  */
object Diff {

  /** Row status of `newDf` relative to `oldDf`: `added` (id only in
    * new), `removed` (id only in old), `changed` (id in both, any
    * compared column differs), `unchanged`. Comparison is exact
    * null-safe struct equality — no hashing, so no collision risk; pass
    * a content-hash column in `compareCols` instead when the payload is
    * too wide to shuffle twice. Output: (idCol, status).
    *
    * Precondition: `idCol` is UNIQUE within each version — a duplicated
    * id (null included: the join is null-safe, so all null-id rows share
    * one key) pairs many-to-many like any duplicated join key and makes
    * the statuses meaningless, the same contract [[graft.io.Upsert]]
    * documents for its merge keys. */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "at least one compare column")
    // the id join itself is null-safe (<=>), honoring the scaladoc: a
    // null-id row present in both versions pairs up as unchanged/changed
    // instead of surfacing as a phantom added+removed pair. Presence is
    // tracked with marker literals — with null-safe ids, the id column's
    // own nullness can no longer distinguish "absent side" from "null id"
    val o = oldDf.select(col(idCol).as("__oid"),
      struct(compareCols.map(col): _*).as("__old"), lit(true).as("__ino"))
    val n = newDf.select(col(idCol).as("__nid"),
      struct(compareCols.map(col): _*).as("__new"), lit(true).as("__inn"))
    o.join(n, col("__oid") <=> col("__nid"), "full_outer")
      .select(
        when(col("__inn").isNotNull, col("__nid")).otherwise(col("__oid"))
          .as(idCol),
        when(col("__ino").isNull, lit("added"))
          .when(col("__inn").isNull, lit("removed"))
          .when(col("__old") <=> col("__new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Diff summary: one row per status with counts — the release-note
    * aggregate (map-side combine on four statuses). */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      compareCols: Seq[String]): DataFrame =
    corpusDiff(oldDf, newDf, idCol, compareCols)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
}
