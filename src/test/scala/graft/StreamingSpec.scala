package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Streams

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
  }

  private lazy val eventsDir: String = {
    // stream source dir containing only the events table (batch-written)
    val dir = Files.createTempDirectory("events-stream").toString
    Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming hourly agg matches the batch query") {
    val stream = Streams.hourlyAgg(Streams.eventsStream(spark, eventsDir))
    runToMemory(stream, "hourly", mode = "complete")
    val got = spark.table("hourly")
      .select(col("hour"), col("event_type"), col("n"))
      .orderBy("hour", "event_type")
      .as[(Timestamp, String, Long)].collect()
    val want = Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("hour", "event_type")
      .as[(Timestamp, String, Long)].collect()
    assert(got.toSeq == want.toSeq)
  }

  test("streaming dedup drops duplicate keys within watermark") {
    val dir = Files.createTempDirectory("dup-stream").toString
    val base = Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value").limit(100)
    base.union(base).write.mode("overwrite").parquet(dir)
    val stream = Streams.dedupByKey(Streams.eventsStream(spark, dir),
      Seq("event_id"), watermark = "1 hour")
    runToMemory(stream, "deduped")
    assert(spark.table("deduped").count() == 100)
  }

  test("streaming parquet sink with checkpoint resumes without duplicates") {
    val out = Files.createTempDirectory("sink").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    def run(): Unit = {
      val q = Streams.eventsStream(spark, eventsDir)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    run()
    val n = Tables.load(spark, sfDir, "events").count()
    assert(spark.read.parquet(out).count() == n)
    // re-run against the same checkpoint: no new data → no duplicates
    run()
    assert(spark.read.parquet(out).count() == n)
  }

  test("stateful sessionize emits gap-separated sessions") {
    val dir = Files.createTempDirectory("sess-stream").toString
    def ev(id: Long, user: Long, minute: Long) =
      Streams.Event(id, Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00"), user, "click", 1.0)
    // user 1: events at 0,10 min (session A), then 120,125 (session B)
    // user 2: single event (session C); plus a far-future row to advance
    // the watermark past all gaps so sessions A/B/C all time out and emit.
    val rows = Seq(ev(1, 1, 0), ev(2, 1, 10), ev(3, 1, 120), ev(4, 1, 125),
      ev(5, 2, 30), ev(6, 99, 2000))
    rows.toDS().toDF().write.mode("overwrite").parquet(dir)
    val stream = Streams.sessionize(
      Streams.eventsStream(spark, dir).as[Streams.Event], gapSeconds = 1800,
      watermark = "0 seconds")
    runToMemory(stream.toDF(), "sessions")
    val got = spark.table("sessions")
      .filter(col("user_id").isin(1L, 2L))
      .orderBy("user_id", "session_start")
      .as[(Long, Timestamp, Timestamp, Long)].collect()
    assert(got.length == 3)
    assert(got(0)._4 == 2) // user1 session A: 2 events
    assert(got(1)._4 == 2) // user1 session B: 2 events
    assert(got(2)._4 == 1) // user2: 1 event
  }
}
