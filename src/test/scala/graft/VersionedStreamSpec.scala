package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.io.{VersionedTable => VT}

/** The v1 streaming source over the versioned-table commit log
  * (io/VersionedStreamSource.scala): snapshot-then-tail, change-commit
  * refusal/skip, optimize transparency, rate limiting, checkpoint
  * restart without replay. */
class VersionedStreamSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def withDirs[T](body: (String, String) => T): T = {
    val dir = Files.createTempDirectory("graft-vstream")
    try body(dir.resolve("t").toString, dir.resolve("ck").toString)
    finally {
      val walk = Files.walk(dir)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  private def df(pairs: (Int, String)*) = pairs.toDF("id", "v")

  private def start(table: String, ck: String, name: String,
      options: Map[String, String] = Map.empty) =
    spark.readStream.format("graft-versioned").options(options).load(table)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation", ck).start()

  private def freshName(): String = { n += 1; s"vstream_$n" }

  private def sinkRows(name: String): Seq[(Int, String)] =
    spark.table(name).orderBy("id").as[(Int, String)].collect().toSeq

  test("a pure-insert MERGE (no hits) streams as appends; commit() " +
    "seeds the pacing cursor for restarts") {
    withDirs { (t, ck) =>
      VT.append(spark, df(1 -> "a"), t)                       // v0
      val name = freshName()
      val q = start(t, ck, name)
      try {
        q.processAllAvailable()
        // a MERGE whose keys are all NEW rewrites nothing — its commit
        // is a blind add and must stream, not kill the tail
        VT.merge(spark, df(2 -> "b", 3 -> "c"), t, Seq("id")) // v1
        q.processAllAvailable()
        assert(sinkRows(name) == Seq(1 -> "a", 2 -> "b", 3 -> "c"))
      } finally { q.stop(); spark.catalog.dropTempView(name) }
      // restart-pacing: the engine re-seeds a restored source through
      // commit(offset); getOffset must then PACE the backlog from
      // there instead of taking the initial-snapshot (unpaced) branch
      (0 until 4).foreach(i => VT.append(spark, df((10 + i) -> "x"), t))
      val src = new graft.io.VersionedStreamSource(spark, t,
        startExclusive = None, skipChangeCommits = false,
        maxFilesPerTrigger = Some(1), readChangeFeed = false,
        schema = VT.snapshot(spark, t).schema)
      src.commit(org.apache.spark.sql.execution.streaming.runtime
        .LongOffset(1L)) // the restored checkpoint offset
      val next = src.getOffset.get.json.trim.toLong
      assert(next < VT.latestVersion(t).get,
        s"backlog served unpaced: offset $next")
      assert(next == 2L) // one 1-file commit admitted past v1
    }
  }

  test("initial snapshot then tail of appends") {
    withDirs { (t, ck) =>
      VT.append(spark, df(1 -> "a", 2 -> "b"), t)
      VT.append(spark, df(3 -> "c"), t)
      val name = freshName()
      val q = start(t, ck, name)
      try {
        q.processAllAvailable()
        assert(sinkRows(name) == Seq(1 -> "a", 2 -> "b", 3 -> "c"))
        VT.append(spark, df(4 -> "d"), t)
        VT.append(spark, df(5 -> "e"), t)
        q.processAllAvailable()
        assert(sinkRows(name) ==
          Seq(1 -> "a", 2 -> "b", 3 -> "c", 4 -> "d", 5 -> "e"))
      } finally { q.stop(); spark.catalog.dropTempView(name) }
    }
  }

  test("checkpoint restart resumes past the committed offset, no replay") {
    withDirs { (t, ck) =>
      // the memory sink refuses recovery, so restart goes through the
      // (recoverable) file sink — which also proves the offsets written
      // to a real checkpoint round-trip through SerializedOffset
      val out = s"$ck.out"
      def run(): Unit = {
        val q = spark.readStream.format("graft-versioned").load(t)
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ck).start()
        try q.processAllAvailable() finally q.stop()
      }
      VT.append(spark, df(1 -> "a"), t)
      run()
      assert(spark.read.parquet(out).orderBy("id")
        .as[(Int, String)].collect().toSeq == Seq(1 -> "a"))
      // appended while the query is down
      VT.append(spark, df(2 -> "b"), t)
      run()
      // exactly once across the restart: the committed snapshot batch is
      // not replayed, the down-time append is picked up
      assert(spark.read.parquet(out).orderBy("id")
        .as[(Int, String)].collect().toSeq == Seq(1 -> "a", 2 -> "b"))
    }
  }

  test("data-changing commit fails the stream with a pointed error") {
    withDirs { (t, ck) =>
      VT.append(spark, df(1 -> "a", 2 -> "b"), t)
      val name = freshName()
      val q = start(t, ck, name)
      try {
        q.processAllAvailable()
        VT.deleteWhere(spark, t, col("id") === 1)
        val ex = intercept[StreamingQueryException] { q.processAllAvailable() }
        val msg = Option(ex.cause).fold(ex.getMessage)(_.getMessage)
        assert(msg.contains("skipChangeCommits"))
      } finally { q.stop(); spark.catalog.dropTempView(name) }
    }
  }

  test("skipChangeCommits tails straight through deletes and merges") {
    withDirs { (t, ck) =>
      VT.append(spark, df(1 -> "a", 2 -> "b"), t)
      val name = freshName()
      val q = start(t, ck, name, Map("skipChangeCommits" -> "true"))
      try {
        q.processAllAvailable()
        VT.deleteWhere(spark, t, col("id") === 1) // skipped wholesale
        VT.append(spark, df(3 -> "c"), t) // still served
        q.processAllAvailable()
        assert(sinkRows(name) == Seq(1 -> "a", 2 -> "b", 3 -> "c"))
      } finally { q.stop(); spark.catalog.dropTempView(name) }
    }
  }

  test("optimize rewrites are invisible to the tail (dataChange=false)") {
    withDirs { (t, ck) =>
      VT.append(spark, df(1 -> "a"), t)
      val name = freshName()
      val q = start(t, ck, name)
      try {
        q.processAllAvailable()
        VT.append(spark, df(2 -> "b"), t)
        VT.compact(spark, t, targetFiles = 1)
        VT.append(spark, df(3 -> "c"), t)
        q.processAllAvailable()
        // compaction moved rows 1-2 into a fresh file; serving it would
        // duplicate them
        assert(sinkRows(name) == Seq(1 -> "a", 2 -> "b", 3 -> "c"))
      } finally { q.stop(); spark.catalog.dropTempView(name) }
    }
  }

  test("startingVersion replays the log as appends, no snapshot batch") {
    withDirs { (t, ck) =>
      VT.append(spark, df(1 -> "a"), t) // v0
      VT.append(spark, df(2 -> "b"), t) // v1
      VT.append(spark, df(3 -> "c"), t) // v2
      val name = freshName()
      val q = start(t, ck, name, Map("startingVersion" -> "1"))
      try {
        q.processAllAvailable()
        assert(sinkRows(name) == Seq(2 -> "b", 3 -> "c"))
      } finally { q.stop(); spark.catalog.dropTempView(name) }
    }
  }

  test("startingVersion=latest serves only commits after query start") {
    withDirs { (t, ck) =>
      VT.append(spark, df(1 -> "a"), t)
      val name = freshName()
      val q = start(t, ck, name, Map("startingVersion" -> "latest"))
      try {
        q.processAllAvailable()
        assert(sinkRows(name).isEmpty)
        VT.append(spark, df(2 -> "b"), t)
        q.processAllAvailable()
        assert(sinkRows(name) == Seq(2 -> "b"))
      } finally { q.stop(); spark.catalog.dropTempView(name) }
    }
  }

  test("maxFilesPerTrigger paces the tail one version per batch") {
    withDirs { (t, ck) =>
      // three single-file commits
      Seq(1 -> "a", 2 -> "b", 3 -> "c").foreach { p =>
        VT.append(spark, df(p).repartition(1), t)
      }
      val name = freshName()
      val q = start(t, ck, name,
        Map("startingVersion" -> "0", "maxFilesPerTrigger" -> "1"))
      try {
        q.processAllAvailable()
        assert(sinkRows(name) == Seq(1 -> "a", 2 -> "b", 3 -> "c"))
        // each version admitted alone: >= 3 non-empty batches ran
        assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
      } finally { q.stop(); spark.catalog.dropTempView(name) }
    }
  }

  test("initial snapshot subtracts active deletion vectors") {
    withDirs { (t, ck) =>
      VT.append(spark, df(1 -> "a", 2 -> "b", 3 -> "c"), t)
      VT.deleteWhereDeferred(spark, t, col("id") === 2)
      val name = freshName()
      val q = start(t, ck, name)
      try {
        q.processAllAvailable()
        assert(sinkRows(name) == Seq(1 -> "a", 3 -> "c"))
      } finally { q.stop(); spark.catalog.dropTempView(name) }
    }
  }

  test("streaming agg end-to-end equals the batch answer") {
    withDirs { (t, ck) =>
      VT.append(spark,
        Seq((1, "x", 10L), (2, "y", 5L), (3, "x", 7L)).toDF("id", "k", "n"),
        t)
      val name = freshName()
      val q = spark.readStream.format("graft-versioned").load(t)
        .groupBy($"k").agg(sum($"n").as("total"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ck).start()
      try {
        q.processAllAvailable()
        VT.append(spark, Seq((4, "y", 3L)).toDF("id", "k", "n"), t)
        q.processAllAvailable()
        val got = spark.table(name).orderBy("k")
          .as[(String, Long)].collect().toSeq
        assert(got == Seq("x" -> 17L, "y" -> 8L))
      } finally { q.stop(); spark.catalog.dropTempView(name) }
    }
  }

  test("Trigger.AvailableNow drains the whole backlog in paced batches, " +
    "then stops on its own") {
    withDirs { (t, ck) =>
      // four single-file commits; maxFilesPerTrigger=1 admits ONE per
      // batch — the single-batch fallback the old source fell into
      // would stop after v0 and leave three commits undrained
      Seq(1 -> "a", 2 -> "b", 3 -> "c", 4 -> "d").foreach { p =>
        VT.append(spark, df(p).repartition(1), t)
      }
      val name = freshName()
      val q = spark.readStream.format("graft-versioned")
        .option("startingVersion", "0").option("maxFilesPerTrigger", "1")
        .load(t)
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try {
        assert(q.awaitTermination(120000),
          "AvailableNow query did not self-terminate")
        assert(sinkRows(name) ==
          Seq(1 -> "a", 2 -> "b", 3 -> "c", 4 -> "d"))
        // pacing held across the drain: one version per non-empty batch
        assert(q.recentProgress.count(_.numInputRows > 0) >= 4)
      } finally { q.stop(); spark.catalog.dropTempView(name) }
    }
  }

  test("an explicit allAvailable read limit overrides the constructor " +
    "pacing: Trigger.Once drains the whole backlog in its one batch") {
    withDirs { (t, ck) =>
      import org.apache.spark.sql.connector.read.streaming.ReadLimit
      Seq(1 -> "a", 2 -> "b", 3 -> "c", 4 -> "d").foreach { p =>
        VT.append(spark, df(p).repartition(1), t)
      } // v0..v3, one file each
      // unit level: the engine's maxFiles limit paces, but an explicit
      // ReadAllAvailable (SingleBatchExecutor's "read limit will be
      // ignored" contract) must admit everything
      val src = new graft.io.VersionedStreamSource(spark, t,
        startExclusive = Some(0L), skipChangeCommits = false,
        maxFilesPerTrigger = Some(1), readChangeFeed = false,
        schema = VT.snapshot(spark, t).schema)
      val paced = src.latestOffset(null, ReadLimit.maxFiles(1))
      assert(paced.json.trim.toLong == 1L)
      val drained = src.latestOffset(paced, ReadLimit.allAvailable())
      assert(drained.json.trim.toLong == 3L,
        "allAvailable was re-capped by the constructor pacing")
      // end to end: Trigger.Once + maxFilesPerTrigger must still process
      // every commit before the query self-terminates
      val name = freshName()
      val q = spark.readStream.format("graft-versioned")
        .option("startingVersion", "0").option("maxFilesPerTrigger", "1")
        .load(t)
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .start()
      try {
        assert(q.awaitTermination(120000),
          "Trigger.Once query did not terminate")
        assert(sinkRows(name) ==
          Seq(1 -> "a", 2 -> "b", 3 -> "c", 4 -> "d"),
          "Trigger.Once left commits undrained")
      } finally { q.stop(); spark.catalog.dropTempView(name) }
    }
  }

  test("AvailableNow pins its drain target at prepare time; a commit " +
    "landing after the pin waits for the next run") {
    withDirs { (t, _) =>
      import org.apache.spark.sql.connector.read.streaming.ReadLimit
      VT.append(spark, df(1 -> "a"), t) // v0
      val src = new graft.io.VersionedStreamSource(spark, t,
        startExclusive = Some(-1L), skipChangeCommits = false,
        maxFilesPerTrigger = None, readChangeFeed = false,
        schema = VT.snapshot(spark, t).schema)
      src.prepareForTriggerAvailableNow() // pin = v0
      VT.append(spark, df(2 -> "b"), t) // v1 lands after the pin
      val end = src.latestOffset(null, ReadLimit.allAvailable())
      assert(end.json.trim.toLong == 0L, "post-pin commit was admitted")
      // re-poll returns the unchanged cursor → the engine sees no new
      // data and ends the run; v1 is the NEXT run's first batch
      val again = src.latestOffset(end, ReadLimit.allAvailable())
      assert(again.json.trim.toLong == 0L)
    }
  }

  test("an AvailableNow run picks up exactly the commits the previous " +
    "run left behind") {
    withDirs { (t, ck) =>
      val out = s"$ck.out"
      def run(): Unit = {
        val q = spark.readStream.format("graft-versioned").load(t)
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ck)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try assert(q.awaitTermination(120000)) finally q.stop()
      }
      VT.append(spark, df(1 -> "a"), t)
      run()
      assert(spark.read.parquet(out).orderBy("id")
        .as[(Int, String)].collect().toSeq == Seq(1 -> "a"))
      VT.append(spark, df(2 -> "b"), t) // lands between runs
      run()
      assert(spark.read.parquet(out).orderBy("id")
        .as[(Int, String)].collect().toSeq == Seq(1 -> "a", 2 -> "b"))
    }
  }

  test("a schema-evolving commit fails the stream with a restart hint") {
    withDirs { (t, ck) =>
      VT.append(spark, df(1 -> "a"), t)
      val name = freshName()
      val q = start(t, ck, name)
      try {
        q.processAllAvailable()
        VT.append(spark, Seq((2, "b", 9L)).toDF("id", "v", "extra"), t,
          mergeSchema = true)
        val ex = intercept[StreamingQueryException] {
          q.processAllAvailable()
        }
        val msg = Option(ex.cause).fold(ex.getMessage)(_.getMessage)
        assert(msg.contains("Restart the query"), msg)
        assert(msg.contains("extra"), msg)
      } finally { q.stop(); spark.catalog.dropTempView(name) }
    }
  }

  test("failOnSchemaChange=false serves evolved commits through the " +
    "bound schema (documented opt-out)") {
    withDirs { (t, ck) =>
      VT.append(spark, df(1 -> "a"), t)
      val name = freshName()
      val q = start(t, ck, name, Map("failOnSchemaChange" -> "false"))
      try {
        q.processAllAvailable()
        VT.append(spark, Seq((2, "b", 9L)).toDF("id", "v", "extra"), t,
          mergeSchema = true)
        q.processAllAvailable()
        // the evolved column is dropped — exactly the silent window the
        // default closes; the opt-out accepts it knowingly
        assert(sinkRows(name) == Seq(1 -> "a", 2 -> "b"))
      } finally { q.stop(); spark.catalog.dropTempView(name) }
    }
  }

  test("schema binds from the log; table must pre-exist") {
    withDirs { (t, _) =>
      val ex = intercept[Exception] {
        spark.readStream.format("graft-versioned").load(t)
      }
      assert(ex.getMessage.contains("no versioned table"))
    }
  }

  test("schema evolving between bind and the FIRST batch fails the " +
    "stream (the snapshot is a loss window too, not just the tail)") {
    withDirs { (t, ck) =>
      VT.append(spark, df(1 -> "a"), t)
      // bind the schema NOW ({id, v})...
      val bound = spark.readStream.format("graft-versioned").load(t)
      // ...then evolve the table before the query ever plans a batch
      VT.append(spark, Seq((2, "b", 9L)).toDF("id", "v", "extra"), t,
        mergeSchema = true)
      val q = bound.writeStream.format("memory")
        .queryName(freshName()).outputMode("append")
        .option("checkpointLocation", ck).start()
      val ex = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] {
        try q.processAllAvailable() finally q.stop()
      }
      assert(ex.getMessage.contains("evolved between schema bind") ||
        Option(ex.getCause).exists(
          _.getMessage.contains("evolved between schema bind")),
        ex.getMessage)
    }
  }

  test("maxFilesPerTrigger paces the INITIAL SNAPSHOT (Delta parity), " +
    "deletion vectors subtracted from every slice") {
    withDirs { (t, ck) =>
      // six 1-file commits -> a 6-file snapshot; one DV'd row
      (0 until 6).foreach(i =>
        VT.append(spark, df((i + 1) -> s"v$i").coalesce(1), t,
          optimizeWrite = false))
      VT.deleteWhereDeferred(spark, t, col("id") === 4)
      val name = freshName()
      val q = start(t, ck, name, Map("maxFilesPerTrigger" -> "2"))
      try {
        q.processAllAvailable()
        // exactness: every snapshot row exactly once, the DV'd row gone
        assert(sinkRows(name).map(_._1) == Seq(1, 2, 3, 5, 6))
        // pacing: 6 files at 2/batch = 3 data batches, not one
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        assert(dataBatches >= 3,
          s"snapshot arrived in $dataBatches batches — cap ignored")
        // the tail still paces as before
        VT.append(spark, df(7 -> "g"), t)
        q.processAllAvailable()
        assert(sinkRows(name).map(_._1) == Seq(1, 2, 3, 5, 6, 7))
      } finally { q.stop(); spark.catalog.dropTempView(name) }
    }
  }

  test("mid-snapshot offsets resume the slice across a restart and " +
    "complete under an uncapped Trigger.Once resume") {
    withDirs { (t, _) =>
      (0 until 6).foreach(i =>
        VT.append(spark, df((i + 1) -> s"v$i").coalesce(1), t,
          optimizeWrite = false))
      val v = VT.latestVersion(t).get
      val schema = VT.snapshot(spark, t).schema
      def src(cap: Option[Int]) = new graft.io.VersionedStreamSource(
        spark, t, startExclusive = None, skipChangeCommits = false,
        maxFilesPerTrigger = cap, readChangeFeed = false, schema = schema)
      // fresh start under the cap: a partial-snapshot offset
      val s1 = src(Some(2))
      val o1 = s1.getOffset.get
      assert(o1.json == s"""{"v":$v,"i":2}""", o1.json)
      // restart: the engine re-seeds through commit(restored offset);
      // the next step must CONTINUE the slice, not restart or jump
      val s2 = src(Some(2))
      s2.commit(graft.io.VersionedStreamSource.PartialSnapshotOffset(v, 2))
      val o2 = s2.getOffset.get
      assert(o2.json == s"""{"v":$v,"i":4}""", o2.json)
      // a slice batch plans exactly its two files
      val slice = s2.getBatch(Some(
        graft.io.VersionedStreamSource.PartialSnapshotOffset(v, 2)), o2)
      assert(slice.queryExecution.logical.collectLeaves().flatMap {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case fs: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation => fs.location.inputFiles.toSeq
            case _ => Nil
          }
        case _ => Nil
      }.length == 2)
      // an uncapped resume (Trigger.Once's explicit allAvailable) jumps
      // straight to completion — rest of the snapshot + any tail
      VT.append(spark, df(7 -> "g"), t)
      val s3 = src(Some(2))
      s3.commit(graft.io.VersionedStreamSource.PartialSnapshotOffset(v, 4))
      val o3 = s3.latestOffset(
        graft.io.VersionedStreamSource.PartialSnapshotOffset(v, 4),
        org.apache.spark.sql.connector.read.streaming.ReadLimit
          .allAvailable())
      assert(o3.json.trim == (v + 1).toString, o3.json)
    }
  }
}
