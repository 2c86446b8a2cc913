package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.apache.spark.sql.functions._

import graft.io.{Upsert, VersionedTable => VT}

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def withTable[T](body: String => T): T = {
    val dir = Files.createTempDirectory("graft-vt")
    try body(dir.resolve("t").toString)
    finally {
      val walk = Files.walk(dir)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  private def df(pairs: (Int, String)*) = pairs.toDF("id", "v")

  test("append/snapshot: versions accumulate, time travel reads each") {
    withTable { t =>
      VT.append(spark, df(1 -> "a", 2 -> "b"), t)
      VT.append(spark, df(3 -> "c"), t)
      assert(VT.latestVersion(t).contains(1L))
      assert(VT.snapshot(spark, t, Some(0)).count() == 2)
      assert(VT.snapshot(spark, t).count() == 3)
      assert(VT.snapshot(spark, t).orderBy("id").as[(Int, String)]
        .collect().toSeq == Seq(1 -> "a", 2 -> "b", 3 -> "c"))
    }
  }

  test("overwrite replaces; old versions stay readable") {
    withTable { t =>
      VT.append(spark, df(1 -> "a", 2 -> "b"), t)
      VT.overwrite(spark, df(9 -> "z"), t)
      assert(VT.snapshot(spark, t).as[(Int, String)].collect().toSeq ==
        Seq(9 -> "z"))
      assert(VT.snapshot(spark, t, Some(0)).count() == 2)
    }
  }

  test("merge upserts through the log") {
    withTable { t =>
      VT.append(spark, df(1 -> "a", 2 -> "b"), t)
      VT.merge(spark, df(2 -> "B", 3 -> "c"), t, Seq("id"))
      assert(VT.snapshot(spark, t).orderBy("id").as[(Int, String)]
        .collect().toSeq == Seq(1 -> "a", 2 -> "B", 3 -> "c"))
    }
  }

  test("restore rolls forward to an old state; history records it") {
    withTable { t =>
      VT.append(spark, df(1 -> "a"), t)          // v0
      VT.append(spark, df(2 -> "b"), t)          // v1
      VT.overwrite(spark, df(9 -> "z"), t)       // v2
      VT.restore(spark, t, 1)                    // v3 == state at v1
      assert(VT.snapshot(spark, t).orderBy("id").as[(Int, String)]
        .collect().toSeq == Seq(1 -> "a", 2 -> "b"))
      val h = VT.history(spark, t).orderBy("version")
        .select("op").as[String].collect().toSeq
      assert(h == Seq("append", "append", "overwrite", "restore"))
    }
  }

  test("deleteWhere rewrites only files containing matches") {
    withTable { t =>
      VT.append(spark, df(1 -> "a", 2 -> "b"), t)  // file A
      VT.append(spark, df(3 -> "c", 4 -> "d"), t)  // file B
      val c = VT.deleteWhere(spark, t, col("id") === 3)
      // only file B is rewritten: one removed, >=1 added
      assert(c.remove.size >= 1 && c.remove.size <= 2)
      assert(VT.snapshot(spark, t).orderBy("id").as[(Int, String)]
        .collect().toSeq == Seq(1 -> "a", 2 -> "b", 4 -> "d"))
      // file A survived untouched (its rows via old version still present)
      assert(VT.snapshot(spark, t, Some(0)).count() == 2)
    }
  }

  test("deleteWhere with no matches commits a no-op") {
    withTable { t =>
      VT.append(spark, df(1 -> "a"), t)
      val c = VT.deleteWhere(spark, t, col("id") === 99)
      assert(c.add.isEmpty && c.remove.isEmpty)
      assert(VT.snapshot(spark, t).count() == 1)
    }
  }

  test("concurrent appends both land (optimistic slot retry)") {
    withTable { t =>
      VT.append(spark, df(0 -> "seed"), t)
      val threads = (1 to 4).map { i =>
        new Thread(() => {
          VT.append(spark, Seq((i, s"w$i")).toDF("id", "v"), t)
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(VT.snapshot(spark, t).count() == 5)
      assert(VT.latestVersion(t).contains(4L))
    }
  }

  test("stale overwrite raises ConcurrentWriteException, loses nothing") {
    withTable { t =>
      VT.append(spark, df(1 -> "a"), t)                   // v0
      VT.append(spark, df(2 -> "b"), t)                   // v1 (interloper)
      intercept[Upsert.ConcurrentWriteException] {
        VT.overwrite(spark, df(9 -> "z"), t, expectVersion = Some(0))
      }
      assert(VT.snapshot(spark, t).count() == 2)
    }
  }

  test("checkpoint bounds replay; snapshots cross the checkpoint correctly") {
    withTable { t =>
      (0 until 13).foreach(i => VT.append(spark, df(i -> s"r$i"), t))
      assert(VT.snapshot(spark, t).count() == 13)
      assert(VT.snapshot(spark, t, Some(11)).count() == 12)
      // checkpoint file exists at v10
      assert(Files.exists(java.nio.file.Paths.get(
        t, "_graft_log", f"${10L}%020d.checkpoint")))
    }
  }

  test("vacuum GCs retired files but never the live snapshot") {
    withTable { t =>
      VT.append(spark, df(1 -> "a"), t)
      VT.overwrite(spark, df(2 -> "b"), t)
      // retention 0 → v0's file is GC-able immediately
      val removed = VT.vacuum(t, retainMs = 0,
        nowMs = System.currentTimeMillis() + 1000)
      assert(removed >= 1)
      assert(VT.snapshot(spark, t).as[(Int, String)].collect().toSeq ==
        Seq(2 -> "b"))
      intercept[IllegalStateException] { VT.restore(spark, t, 0) }
    }
  }

  test("compact merges files, history preserved") {
    withTable { t =>
      VT.append(spark, df(1 -> "a"), t)
      VT.append(spark, df(2 -> "b"), t)
      VT.append(spark, df(3 -> "c"), t)
      VT.compact(spark, t, targetFiles = 1)
      assert(VT.snapshot(spark, t).count() == 3)
      assert(VT.snapshot(spark, t, Some(1)).count() == 2)
      val dataFiles = Files.list(java.nio.file.Paths.get(t))
      val live = try {
        import scala.jdk.CollectionConverters._
        dataFiles.iterator().asScala.count(
          _.getFileName.toString.endsWith(".parquet"))
      } finally dataFiles.close()
      assert(live >= 4) // 3 originals + 1 compacted, none vacuumed yet
    }
  }

  test("change feed classifies insert/update/delete between versions") {
    withTable { t =>
      VT.append(spark, df(1 -> "a", 2 -> "b", 3 -> "c"), t)        // v0
      VT.merge(spark, df(2 -> "B", 4 -> "d"), t, Seq("id"))        // v1
      VT.deleteWhere(spark, t, col("id") === 1)                    // v2
      val cdf = VT.changeFeed(spark, t, 0, 2, Seq("id"))
        .orderBy("id").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
      assert(cdf == Seq((1, "a", "delete"), (2, "B", "update_postimage"),
        (4, "d", "insert")))
    }
  }

  test("snapshotAsOf picks the newest commit at or before the timestamp") {
    withTable { t =>
      val c0 = VT.append(spark, df(1 -> "a"), t)
      Thread.sleep(5)
      VT.append(spark, df(2 -> "b"), t)
      assert(VT.snapshotAsOf(spark, t, c0.ts).count() == 1)
      assert(VT.snapshotAsOf(spark, t, System.currentTimeMillis())
        .count() == 2)
    }
  }

  test("empty snapshot after delete-all keeps the schema") {
    withTable { t =>
      VT.append(spark, df(1 -> "a"), t)
      VT.overwrite(spark, df(1 -> "a").filter(lit(false)), t)
      val snap = VT.snapshot(spark, t)
      assert(snap.count() == 0)
      assert(snap.columns.toSeq == Seq("id", "v"))
    }
  }
}
