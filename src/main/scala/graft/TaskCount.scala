package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler._

/** Dev-only scheduling-overhead profiler: `runMain graft.TaskCount q29...`
  * times each named SparkEntry query like [[TimeQ]] but also reports how
  * many jobs / stages / tasks it launched and the aggregate task run time
  * — the numbers that separate "the work got slower" from "we paid
  * per-task scheduling overhead on near-empty tasks" (guide §1.1/§2.2).
  * Honors SPARK_GRAFT_CPUS / SPARK_GRAFT_SUBLINEAR / SPARK_GRAFT_TIMEQ_CONF
  * exactly like TimeQ. */
object TaskCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    System.setProperty("graft.bench.stages", "false")
    if (sys.env.get("SPARK_GRAFT_SUBLINEAR").exists(_ == "true"))
      System.setProperty("graft.ann.sublinear", "true")
    val spark = GraftSession.local("graft-taskcount",
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32))
    sys.env.get("SPARK_GRAFT_TIMEQ_CONF").foreach(_.split(',')
      .filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskNanos = new AtomicLong
    val deserNanos = new AtomicLong
    val gcMillis = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskNanos.addAndGet(m.executorRunTime * 1000000L)
          deserNanos.addAndGet(m.executorDeserializeTime * 1000000L)
          gcMillis.addAndGet(m.jvmGCTime)
        }
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    spark.range(1000000).selectExpr("sum(id)").collect()
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      // settle listener events from the previous query (the bus is
      // private[spark]; a short quiesce is enough for a dev profiler)
      Thread.sleep(500)
      jobs.set(0); stages.set(0); tasks.set(0)
      taskNanos.set(0); deserNanos.set(0); gcMillis.set(0)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"[taskcount] $name wall=$wall%.2f s jobs=${jobs.get}%d " +
        f"stages=${stages.get}%d tasks=${tasks.get}%d " +
        f"taskTime=${taskNanos.get / 1e9}%.2f s " +
        f"deser=${deserNanos.get / 1e9}%.2f s " +
        f"gc=${gcMillis.get / 1e3}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
