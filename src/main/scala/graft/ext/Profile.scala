package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** One-pass column profiling: per-column row counts, null counts, distinct
  * cardinality, numeric min/max, string min/max and mean length — the
  * "what did I just ingest" summary every curation pipeline runs before
  * spending cluster time on it.
  *
  * Plan shape: ONE aggregate over the input (no per-column scans), then a
  * literal melt (`explode` of a struct array over the single aggregate
  * row) into one output row per column — no driver collect.
  *
  * Scale note: `exactDistinct = true` plans Spark's multi-distinct
  * Expand — the input is replicated (#distinct-aggs + 1)× before the
  * partial aggregate. Exact mode is for oracle-checked correctness and
  * modest column lists; at 100 TB profile with `exactDistinct = false`
  * (HyperLogLog++), which keeps the whole profile a single
  * partial-agg/final-agg pass with no expansion.
  */
object Profile {

  def summarize(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val schema = df.schema
    def isNum(c: String): Boolean =
      schema(c).dataType.isInstanceOf[NumericType]
    def isStr(c: String): Boolean = schema(c).dataType == StringType

    val aggs: Seq[Column] = count(lit(1)).as("__total") +: cols.flatMap {
      c =>
        val d =
          if (exactDistinct) countDistinct(col(c))
          else approx_count_distinct(col(c))
        Seq(count(col(c)).as(s"$c@n"), d.as(s"$c@d")) ++
          (if (isNum(c))
            Seq(min(col(c)).cast("double").as(s"$c@mn"),
              max(col(c)).cast("double").as(s"$c@mx"))
          else Nil) ++
          (if (isStr(c))
            Seq(min(col(c)).as(s"$c@smn"), max(col(c)).as(s"$c@smx"),
              sum(length(col(c))).cast("double").as(s"$c@sl"))
          else Nil)
    }

    val one = df.agg(aggs.head, aggs.tail: _*)
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    val entries = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__total").as("n_rows"),
        col(s"`$c@n`").as("n_nonnull"),
        col(s"`$c@d`").cast("long").as("n_distinct"),
        (if (isNum(c)) col(s"`$c@mn`") else nullD).as("min_num"),
        (if (isNum(c)) col(s"`$c@mx`") else nullD).as("max_num"),
        (if (isStr(c)) col(s"`$c@smn`") else nullS).as("min_str"),
        (if (isStr(c)) col(s"`$c@smx`") else nullS).as("max_str"),
        (if (isStr(c))
          // explicit sum/count division (not avg) for bit-exact parity
          // with the SQL oracle's CAST(SUM)/CAST(COUNT)
          when(col(s"`$c@n`") > 0,
            col(s"`$c@sl`") / col(s"`$c@n`").cast("double"))
        else nullD).as("avg_len"))
    }
    one.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** Functional-dependency discovery over every ordered column pair in
    * `cols`: does `determinant → dependent` hold, and how nearly — the
    * schema-inference / DQ-rule-mining profiler ("source determines
    * lang" becomes a checkable constraint; a 0.98 strength surfaces the
    * rows violating an almost-FD).
    *
    * Per pair: `n_groups` (distinct determinant values, nulls are a
    * value), `n_violating` (determinant values mapping to >1 dependent),
    * `fd_holds` (no violations), and `strength` — the g₃ measure: the
    * fraction of rows that survive if each determinant group keeps only
    * its majority dependent value (1.0 ⟺ exact FD).
    *
    * Scale: one (det, dep) cell-count shuffle per pair — the shuffled
    * frames are cell-sized (map-side combine), and the k·(k−1) pair
    * fan-out is over COLUMNS, not rows; profile a bounded column set,
    * not a 1000-column table. */
  /** Key-skew diagnostics over candidate join/group columns — the
    * "should this key be broadcast, salted, or AQE-skew-split" report.
    * For each column: its heaviest `topN` values with count, share of
    * rows, and rank, plus the column's distinct count and row total on
    * every row. A 0.4-share key is a salting candidate; a 50-distinct
    * column is a broadcast-dim signal; both are visible at a glance.
    *
    * All columns profile through ONE shuffle: values melt to
    * (column, value-as-string) pairs first (map-side combine collapses
    * them to cell counts), then per-column totals and the top-N window
    * run on the cell-sized frame. Null is a value (it skews joins like
    * any other); rank order is (count desc, value asc NULLS FIRST) —
    * pinned because engines disagree on default null order. */
  def skewReport(df: DataFrame, cols: Seq[String], topN: Int = 5,
      roundTo: Int = 6): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    require(topN > 0, "topN must be > 0")
    val melted = df.select(explode(map(
      cols.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*))
      .as(Seq("column_name", "value")))
    // persisted: the cell counts feed both the per-column totals and the
    // top-N window — uncached, the melt + count shuffle would run twice.
    // Released once the (topN × |cols|)-row result materializes.
    val counts = melted.groupBy(col("column_name"), col("value"))
      .agg(count(lit(1)).as("n"))
      .persist()
    counts.count()
    val totals = counts.groupBy(col("column_name"))
      .agg(sum(col("n")).as("n_rows"), count(lit(1)).as("n_distinct"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("column_name"))
      .orderBy(col("n").desc, col("value").asc_nulls_first)
    val out = counts.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topN)
      .join(broadcast(totals), Seq("column_name"))
      .select(col("column_name"), col("value"), col("n"),
        round(col("n").cast("double") / col("n_rows").cast("double"),
          roundTo).as("share"),
        col("rnk"), col("n_distinct"), col("n_rows"))
    val snap = graft.util.Caches.snapshot(out)
    counts.unpersist(blocking = false)
    snap
  }

  def functionalDependencies(df: DataFrame, cols: Seq[String],
      roundTo: Int = 6): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val pairs = for {
      det <- cols; dep <- cols if det != dep
    } yield {
      val cells = df.groupBy(col(det).as("__det"), col(dep).as("__dep"))
        .agg(count(lit(1)).as("__c"))
      val perDet = cells.groupBy(col("__det"))
        .agg(count(lit(1)).as("__nd"), sum(col("__c")).as("__tot"),
          max(col("__c")).as("__maxc"))
      perDet.agg(
        lit(det).as("determinant"),
        lit(dep).as("dependent"),
        count(lit(1)).as("n_groups"),
        sum(when(col("__nd") > 1L, 1L).otherwise(0L)).as("n_violating"),
        (sum(when(col("__nd") > 1L, 1L).otherwise(0L)) === 0L)
          .as("fd_holds"),
        round(sum(col("__maxc")).cast("double") /
          sum(col("__tot")).cast("double"), roundTo).as("strength"))
    }
    pairs.reduce(_ unionByName _)
  }
}
