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
    * too wide to shuffle twice. Output: (idCol, status). */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "at least one compare column")
    val o = oldDf.select(col(idCol),
      struct(compareCols.map(col): _*).as("__old"))
    val n = newDf.select(col(idCol),
      struct(compareCols.map(col): _*).as("__new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__old").isNull, lit("added"))
          .when(col("__new").isNull, lit("removed"))
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
