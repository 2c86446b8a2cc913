package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing dimensions: turn a change log into versioned
  * rows with `[effective_from, effective_to)` validity, and resolve facts
  * against the version in force at the fact timestamp.
  *
  * Scale shape: `build` is ONE shuffle on the dimension key (a `lead`
  * window — the change log for one key sorts within its partition;
  * dimension change logs are key-heavy, version-shallow, so no partition
  * outgrows memory). `lookup` is a plain hash equi-join on the key
  * followed by the validity filter: each fact meets only its own key's
  * versions (a handful), never a time-range blow-up — the right plan when
  * versions-per-key is small. For version-deep keys, fall back to
  * [[graft.ext.RangeJoin.pointInInterval]] with the key in `keys`.
  */
object Scd2 {

  /** One row per change, stamped with its validity window. `changes` must
    * be unique per (`keyCol`, `tsCol`) — pre-aggregate collisions (e.g.
    * keep the highest-priority change per instant) or the overlapping
    * versions would be ambiguous. `effective_to` is null for the current
    * version (open-ended), giving half-open `[from, to)` windows that
    * tile each key's timeline with no gaps or overlaps. */
  def build(changes: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    changes
      // a null-ts change evidences no point in time (the AsOfJoin rule):
      // unfiltered it sorts NULLS FIRST and becomes the key's "oldest"
      // version with effective_from = null — a version `lookup`'s
      // validity predicate can never match, yet flagged is_current when
      // it is the only row. Drop it.
      .filter(col(tsCol).isNotNull)
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
  }

  /** Resolve each fact to the dimension version valid at its timestamp
    * (left join: facts before a key's first version, or with no key
    * match, keep null dimension columns). `dim` is the output of
    * [[build]]; its payload columns are prefixed with `dimPrefix` to
    * avoid collisions with fact columns. */
  def lookup(facts: DataFrame, dim: DataFrame, keyCol: String,
      factTsCol: String, dimPrefix: String = "dim_"): DataFrame = {
    val payload = dim.columns.filterNot(c =>
      c == keyCol || c == "effective_from" || c == "effective_to" ||
        c == "is_current")
    // prefix the VALIDITY columns too: facts carrying their own
    // effective_from/effective_to/is_current (a fact derived from another
    // SCD output) would otherwise hit ambiguous-reference errors in the
    // join condition — or silently lose their columns to the final drop
    val renamed = payload.foldLeft(dim) { (d, c) =>
      d.withColumnRenamed(c, dimPrefix + c)
    }
      .withColumnRenamed(keyCol, "__scd_key")
      .withColumnRenamed("effective_from", "__scd_from")
      .withColumnRenamed("effective_to", "__scd_to")
      .withColumnRenamed("is_current", "__scd_current")
    facts.join(renamed,
      facts(keyCol) === col("__scd_key") &&
        col(factTsCol) >= col("__scd_from") &&
        (col("__scd_to").isNull ||
          col(factTsCol) < col("__scd_to")),
      "left")
      .drop("__scd_key", "__scd_from", "__scd_to", "__scd_current")
  }
}
