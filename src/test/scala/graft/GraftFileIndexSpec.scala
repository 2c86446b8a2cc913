package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.io.{VersionedTable => VT}

/** Catalyst-integrated data skipping: ANY pushed-down filter over a
  * versioned-table snapshot must prune files against the log's per-file
  * min/max stats at planning time — no `snapshotWhere` cooperation — and
  * pruning must never change results (conservative on unknowns). */
class GraftFileIndexSpec extends SparkSpec {
  import spark.implicits._

  private def withTable[T](body: String => T): T = {
    val dir = Files.createTempDirectory("graft-fi")
    try body(dir.resolve("t").toString)
    finally {
      val walk = Files.walk(dir)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  /** All file scans in an executed plan, descending through AQE wrappers
    * (AdaptiveSparkPlanExec and QueryStageExec are leaves to `collect`). */
  private def allScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[FileSourceScanExec] =
    p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
    }.flatten

  /** Files the DATA scan read (scans that project `col`; the DV-sidecar
    * scan projects file_name/row_index and is excluded on purpose). */
  private def filesScanned(df: DataFrame, col: String): Long = {
    df.collect()
    allScans(df.queryExecution.executedPlan)
      .filter(_.schema.fieldNames.contains(col))
      .map(_.metrics("numFiles").value).sum
  }

  /** Four one-file appends with disjoint id ranges [0,99], [100,199], ... */
  private def fourFiles(t: String): Unit =
    (0 until 4).foreach { i =>
      VT.append(spark,
        spark.range(i * 100, i * 100 + 100)
          .select(col("id").cast("int").as("id"),
            concat(lit("k"), col("id")).as("v")),
        t, statsFor = Seq("id", "v"))
    }

  test("pushed-down filters prune files at planning time") {
    withTable { t =>
      fourFiles(t)
      val snap = VT.snapshot(spark, t)
      assert(filesScanned(snap, "id") == 4) // no filter: all files
      val eq = snap.filter(col("id") === 250)
      assert(eq.count() == 1 && filesScanned(eq, "id") == 1)
      val range = snap.filter(col("id") >= 150 && col("id") < 210)
      assert(range.count() == 60 && filesScanned(range, "id") == 2)
      val in = snap.filter(col("id").isin(5, 305))
      assert(in.count() == 2 && filesScanned(in, "id") == 2)
      val none = snap.filter(col("id") > 1000)
      assert(none.count() == 0 && filesScanned(none, "id") == 0)
      // literal-on-the-left comparisons prune the same way
      val flip = snap.filter(lit(150) <= col("id") && lit(210) > col("id"))
      assert(flip.count() == 60 && filesScanned(flip, "id") == 2)
    }
  }

  test("string stats prune equality and prefix predicates") {
    withTable { t =>
      // two files: v in [k0..k99] and [k100..k199] — lexical ranges overlap
      // (k15 < k2), so use disjoint alpha prefixes instead
      VT.append(spark, Seq(("a1", 1), ("b2", 2)).toDF("v", "n"), t,
        statsFor = Seq("v"))
      VT.append(spark, Seq(("m1", 3), ("p2", 4)).toDF("v", "n"), t,
        statsFor = Seq("v"))
      val snap = VT.snapshot(spark, t)
      val eq = snap.filter(col("v") === "b2")
      assert(eq.count() == 1 && filesScanned(eq, "v") == 1)
      val pre = snap.filter(col("v").startsWith("m"))
      assert(pre.count() == 1 && filesScanned(pre, "v") == 1)
      val preMiss = snap.filter(col("v").startsWith("z"))
      assert(preMiss.count() == 0 && filesScanned(preMiss, "v") == 0)
    }
  }

  test("date stats prune through the literal Cast rendering") {
    withTable { t =>
      VT.append(spark, Seq("2024-01-05", "2024-01-20").toDF("d")
        .select(to_date(col("d")).as("d")), t, statsFor = Seq("d"))
      VT.append(spark, Seq("2024-03-05", "2024-03-20").toDF("d")
        .select(to_date(col("d")).as("d")), t, statsFor = Seq("d"))
      val snap = VT.snapshot(spark, t)
      val hit = snap.filter(col("d") >= lit(java.sql.Date.valueOf("2024-03-01")))
      assert(hit.count() == 2 && filesScanned(hit, "d") == 1)
    }
  }

  test("decimal stats (footer-written money bounds) prune pushed-down filters") {
    withTable { t =>
      // two files with disjoint amount ranges; the bounds come from the
      // FOOTER pass (DECIMAL is footer-answerable as of r15 — the
      // fintech money type must prune without the write path re-reading
      // its own bytes), and the planner-side evaluator must compare the
      // scale-rendered strings numerically ("100.00" < "19.99" lexically)
      VT.append(spark, Seq("10.00", "19.99").toDF("x")
        .select(col("x").cast("decimal(18,2)").as("amt")), t,
        statsFor = Seq("amt"))
      VT.append(spark, Seq("100.00", "250.50").toDF("x")
        .select(col("x").cast("decimal(18,2)").as("amt")), t,
        statsFor = Seq("amt"))
      val snap = VT.snapshot(spark, t)
      val hit = snap.filter(col("amt") >= lit(new java.math.BigDecimal("50.00")))
      assert(hit.count() == 2 && filesScanned(hit, "amt") == 1)
      val eq = snap.filter(col("amt") === lit(new java.math.BigDecimal("19.99")))
      assert(eq.count() == 1 && filesScanned(eq, "amt") == 1)
      val none = snap.filter(col("amt") > lit(new java.math.BigDecimal("9999")))
      assert(none.count() == 0 && filesScanned(none, "amt") == 0)
    }
  }

  test("timestamp stats prune zone-independently across writer/reader " +
    "session timezones") {
    withTable { t =>
      val tzKey = "spark.sql.session.timeZone"
      val saved = spark.conf.get(tzKey)
      def at(s: String) = java.time.Instant.parse(s)
      try {
        // writer session: US Pacific
        spark.conf.set(tzKey, "America/Los_Angeles")
        VT.append(spark,
          Seq(at("2024-01-05T10:00:00Z"), at("2024-01-05T11:00:00Z"))
            .toDF("ts"), t, statsFor = Seq("ts"))
        VT.append(spark,
          Seq(at("2024-06-05T10:00:00Z"), at("2024-06-05T11:00:00Z"))
            .toDF("ts"), t, statsFor = Seq("ts"))
        // reader session: Japan — stats are UTC micros, so renderings
        // cannot straddle the two zones
        spark.conf.set(tzKey, "Asia/Tokyo")
        val snap = VT.snapshot(spark, t)
        val late = snap.filter(col("ts") >= lit(at("2024-06-01T00:00:00Z")))
        assert(late.count() == 2, "zone-skewed stats mis-pruned rows")
        assert(filesScanned(late, "ts") == 1)
        val early = snap.filter(col("ts") < lit(at("2024-02-01T00:00:00Z")))
        assert(early.count() == 2 && filesScanned(early, "ts") == 1)
        val eq = snap.filter(col("ts") === lit(at("2024-01-05T10:00:00Z")))
        assert(eq.count() == 1 && filesScanned(eq, "ts") == 1)
        // the manual range API prunes through the same canonical form
        val manual = VT.snapshotWhere(spark, t, "ts",
          lo = Some(at("2024-06-01T00:00:00Z")), hi = None)
        assert(manual.count() == 2)
      } finally spark.conf.set(tzKey, saved)
    }
  }

  test("conservative: stats-less files, unknown shapes, IsNull never prune") {
    withTable { t =>
      VT.append(spark, Seq((1, "a")).toDF("id", "v"), t) // NO statsFor
      VT.append(spark, Seq((100, "b")).toDF("id", "v"), t,
        statsFor = Seq("id"))
      val snap = VT.snapshot(spark, t)
      // stats-less file is kept even though the filter excludes its rows
      val f = snap.filter(col("id") > 50)
      assert(f.count() == 1 && filesScanned(f, "id") == 2)
      // unknown expression shape (arithmetic on the column): all kept
      val u = snap.filter(col("id") % 2 === 0)
      assert(u.count() == 1 && filesScanned(u, "id") == 2)
      // IsNull can be satisfied by rows min/max never saw: all kept
      val n = snap.filter(col("v").isNull)
      assert(n.count() == 0 && filesScanned(n, "id") == 2)
    }
  }

  test("pruning composes with deletion vectors and time travel") {
    withTable { t =>
      fourFiles(t)
      VT.deleteWhereDeferred(spark, t, col("id") === 250)
      val f = VT.snapshot(spark, t).filter(col("id").between(200, 299))
      // DV anti-join subtracts the deleted row; data scan still pruned
      assert(f.count() == 99 && filesScanned(f, "id") == 1)
      // the pre-delete version still sees the row, equally pruned
      val v3 = VT.snapshot(spark, t, Some(3)).filter(col("id") === 250)
      assert(v3.count() == 1 && filesScanned(v3, "id") == 1)
    }
  }

  test("row/null counts prune IsNull, IsNotNull, and all-null files") {
    withTable { t =>
      // file A: v fully populated; file B: v ALL null (so B has no v
      // min/max entry — only its null count makes it prunable)
      VT.append(spark, Seq((1, Some("a")), (2, Some("b"))).toDF("id", "v"),
        t, statsFor = Seq("id", "v"))
      VT.append(spark,
        Seq((3, None: Option[String]), (4, None: Option[String]))
          .toDF("id", "v"),
        t, statsFor = Seq("id", "v"))
      val snap = VT.snapshot(spark, t)
      val isNull = snap.filter(col("v").isNull)   // A pruned: zero nulls
      assert(isNull.count() == 2 && filesScanned(isNull, "v") == 1)
      val isNot = snap.filter(col("v").isNotNull) // B pruned: all null
      assert(isNot.count() == 2 && filesScanned(isNot, "v") == 1)
      val eq = snap.filter(col("v") === "a")      // B pruned despite no min/max
      assert(eq.count() == 1 && filesScanned(eq, "v") == 1)
      val gt = snap.filter(col("id") > 2 && col("v") <= "z") // null-rejecting <= prunes B
      assert(gt.count() == 0 && filesScanned(gt, "v") == 0)
    }
  }

  test("pruned results equal unpruned results (conservativeness oracle)") {
    withTable { t =>
      fourFiles(t)
      val snap = VT.snapshot(spark, t)
      val all = snap.collect().toSeq
      for (pred <- Seq(col("id") <= 37, col("id") === 399,
          col("id") > 150 && col("id") < 152, col("v") === "k123",
          col("id").isin(0, 100, 200, 300), !(col("id") < 350))) {
        val got = snap.filter(pred).collect().toSeq
        // same predicate over the already-materialized rows: what a scan
        // with zero skipping would have produced
        val brute = spark.createDataFrame(
          spark.sparkContext.parallelize(all), snap.schema)
          .filter(pred).collect().toSeq
        assert(got.sortBy(_.getInt(0)) == brute.sortBy(_.getInt(0)),
          s"pruned read diverged for $pred")
      }
    }
  }

  test("string pruning compares in UTF-8 byte order (code points), " +
      "not UTF-16 — supplementary-plane values are never mis-pruned") {
    withTable { t =>
      // file 1: ASCII values; file 2: emoji (U+1F600, supplementary).
      // In UTF-16 order "" > "😀…" (surrogate units sort below
      // E000); in the UTF-8 order Spark's min/max used, "" < "😀…".
      // A UTF-16 comparator would prune file 2 for `>= ""` and
      // silently DROP its rows.
      VT.append(spark, Seq(("alpha", 1), ("beta", 2)).toDF("v", "n"), t,
        statsFor = Seq("v"))
      VT.append(spark, Seq(("😀x", 3), ("😀y", 4))
        .toDF("v", "n"), t, statsFor = Seq("v"))
      val snap = VT.snapshot(spark, t)
      val f = snap.filter(col("v") >= "")
      assert(f.count() == 2, "supplementary-plane rows were mis-pruned")
      assert(filesScanned(f, "v") == 1) // ASCII file pruned, emoji kept
      // and the same guarantee through the explicit manifest API
      assert(VT.snapshotWhere(spark, t, "v",
        lo = Some(""), hi = None).count() == 2)
    }
  }

  test("Infinity/NaN double stats keep the file instead of failing " +
      "the read") {
    withTable { t =>
      VT.append(spark, Seq((1, 1.5), (2, 2.5)).toDF("id", "x"), t,
        statsFor = Seq("x"))
      VT.append(spark,
        Seq((3, Double.PositiveInfinity), (4, Double.NaN)).toDF("id", "x"),
        t, statsFor = Seq("x")) // stats render "Infinity"/"NaN"
      val snap = VT.snapshot(spark, t)
      val f = snap.filter(col("x") > 2.0) // must not throw at planning
      assert(f.count() == 3) // 2.5, Infinity, NaN (NaN > everything)
      // the parseable file still prunes normally
      val low = snap.filter(col("x") < 1.0)
      assert(low.count() == 0 && filesScanned(low, "x") <= 1)
    }
  }

  test("mixed-schema snapshot reads union columns without footer merge") {
    withTable { t =>
      VT.append(spark, Seq((1, "a", 9)).toDF("id", "v", "extra"), t,
        statsFor = Seq("id"))
      VT.append(spark, Seq((100, "b")).toDF("id", "v"), t,
        statsFor = Seq("id"))
      val snap = VT.snapshot(spark, t)
      assert(snap.columns.toSet == Set("id", "v", "extra"))
      assert(snap.orderBy("id").as[(Int, String, Option[Int])]
        .collect().toSeq == Seq((1, "a", Some(9)), (100, "b", None)))
      // stats pruning works across the schema boundary too
      val f = snap.filter(col("id") < 50)
      assert(f.count() == 1 && filesScanned(f, "id") == 1)
    }
  }
}
