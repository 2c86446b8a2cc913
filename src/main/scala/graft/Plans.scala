package graft
/** Dev tool: dump formatted physical plans for plan-quality review.
  *
  * `runMain graft.Plans [sfDir] [query...]` prints each query's
  * `.explain("formatted")` between `========== <name> ==========`
  * markers. Uses the same [[GraftSession]] configuration as
  * Verify/Bench so the dumped plans are the plans the engine actually
  * runs (AQE + coalescing flags, graft extensions, 8 local threads —
  * plan SHAPE is thread-count-independent).
  *
  * Compositions that materialize eagerly (snapshot/persist+count
  * internals) show the final frame's plan; their interior shape is
  * covered by the `graft.bench.stages` breakdown lines instead. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q02_filter_pushdown", "q03_top_orders", "q04_dim_join", "q13_merge_upsert")
    val spark = GraftSession.local("graft-plans", 8)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
