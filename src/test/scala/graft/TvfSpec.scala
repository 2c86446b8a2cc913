package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.apache.spark.sql.functions._

import graft.io.{VersionedTable => VT}

/** SQL table-valued-function surface over versioned tables: each TVF must
  * expand to the SAME plan the Scala API builds (one read path, two front
  * doors), compose inside larger SQL, and reject non-literal args. */
class TvfSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  private def withTable[T](body: String => T): T = {
    val dir = Files.createTempDirectory("graft-tvf")
    try body(dir.resolve("t").toString)
    finally {
      val walk = Files.walk(dir)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  private def df(pairs: (Int, String)*) = pairs.toDF("id", "v")

  test("graft_snapshot reads latest and time-travels by version") {
    withTable { t =>
      VT.append(spark, df(1 -> "a", 2 -> "b"), t)
      VT.append(spark, df(3 -> "c"), t)
      assert(spark.sql(s"SELECT * FROM graft_snapshot('$t')").count() == 3)
      assert(spark.sql(s"SELECT * FROM graft_snapshot('$t', 0)")
        .count() == 2)
      // composes inside real SQL: aggregation + filter over the TVF
      val agg = spark.sql(
        s"SELECT count(*) AS n FROM graft_snapshot('$t') WHERE id > 1")
        .head().getLong(0)
      assert(agg == 2)
    }
  }

  test("graft_snapshot_at resolves the newest version at or before ts") {
    withTable { t =>
      VT.append(spark, df(1 -> "a"), t)
      val ts0 = VT.history(spark, t)
        .filter(col("version") === 0).head().getAs[Long]("ts")
      Thread.sleep(5)
      VT.append(spark, df(2 -> "b"), t)
      assert(spark.sql(
        s"SELECT * FROM graft_snapshot_at('$t', ${ts0}L)").count() == 1)
    }
  }

  test("graft_history exposes the commit log as a table") {
    withTable { t =>
      VT.append(spark, df(1 -> "a"), t)
      VT.overwrite(spark, df(2 -> "b"), t)
      val ops = spark.sql(
        s"SELECT op FROM graft_history('$t') ORDER BY version")
        .as[String].collect().toSeq
      assert(ops == Seq("append", "overwrite"))
    }
  }

  test("graft_changes emits the keyed change feed (with preimages)") {
    withTable { t =>
      VT.append(spark, df(1 -> "a", 2 -> "b"), t)             // v0
      VT.merge(spark, df(2 -> "B", 3 -> "c"), t, Seq("id"))   // v1
      val changes = spark.sql(
        s"""SELECT id, v, _change_type
           |FROM graft_changes('$t', 0, 1, 'id', true)
           |ORDER BY id, _change_type""".stripMargin)
        .as[(Int, String, String)].collect().toSeq
      assert(changes == Seq(
        (2, "B", "update_postimage"), (2, "b", "update_preimage"),
        (3, "c", "insert")))
      // SQL result ≡ Scala API result
      val api = VT.changeFeed(spark, t, 0, 1, Seq("id"),
        includePreimage = true)
        .select(col("id"), col("v"), col("_change_type"))
        .orderBy(col("id"), col("_change_type"))
        .as[(Int, String, String)].collect().toSeq
      assert(changes == api)
    }
  }

  test("graft_table_changes serves the write-time (keyless) change feed") {
    withTable { t =>
      VT.append(spark, df(1 -> "a", 2 -> "b"), t)             // v0
      VT.setProperties(t, Map(VT.CdfProp -> "true"))          // v1
      VT.merge(spark, df(2 -> "B", 3 -> "c"), t, Seq("id"))   // v2
      val changes = spark.sql(
        s"""SELECT id, v, _change_type, _commit_version
           |FROM graft_table_changes('$t', 1, 2)
           |ORDER BY id, _change_type""".stripMargin)
        .as[(Int, String, String, Long)].collect().toSeq
      assert(changes == Seq(
        (2, "B", "update_postimage", 2L), (2, "b", "update_preimage", 2L),
        (3, "c", "insert", 2L)))
    }
  }

  test("TVF args must be literals; bad arity raises") {
    withTable { t =>
      VT.append(spark, df(1 -> "a"), t)
      intercept[Exception] {
        spark.sql(s"SELECT * FROM graft_snapshot('$t', 0, 9)").collect()
      }
      intercept[Exception] {
        spark.sql("SELECT * FROM graft_changes('x', 0, 1)").collect()
      }
    }
  }

  test("TVF snapshot keeps the manifest FileIndex (planner skipping)") {
    withTable { t =>
      (0 until 3).foreach { i =>
        VT.append(spark,
          Seq((i * 10, s"v$i")).toDF("id", "v"), t, statsFor = Seq("id"))
      }
      val q = spark.sql(
        s"SELECT * FROM graft_snapshot('$t') WHERE id = 20")
      q.collect()
      val scans = q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }
      assert(scans.sum == 1, s"expected 1 scanned file, got ${scans.sum}")
    }
  }
}
