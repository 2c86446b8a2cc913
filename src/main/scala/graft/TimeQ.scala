package graft

/** Dev-only single-query timer: `runMain graft.TimeQ q96_training_data ...`
  * times each named SparkEntry query on SPARK_GRAFT_SF_DIR (default sf0.1)
  * in a fresh warmed session — clean numbers without the full Bench
  * sweep's session pressure. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // dev tool: always show per-stage breakdowns (the -D route dies at
    // sbt's fork boundary); set SPARK_GRAFT_SUBLINEAR=true to time the
    // ANN queries at Bench's sub-linear operating point
    System.setProperty("graft.bench.stages", "true")
    if (sys.env.get("SPARK_GRAFT_SUBLINEAR").exists(_ == "true"))
      System.setProperty("graft.ann.sublinear", "true")
    val spark = GraftSession.local("graft-timeq",
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32))
    // dev experiments: SPARK_GRAFT_TIMEQ_CONF="k=v,k=v" applied to the
    // session (runtime-settable SQL confs only) before the timed runs
    sys.env.get("SPARK_GRAFT_TIMEQ_CONF").foreach(_.split(',')
      .filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    spark.range(1000000).selectExpr("sum(id)").collect()
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[timeq] $name ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    spark.stop()
  }
}
