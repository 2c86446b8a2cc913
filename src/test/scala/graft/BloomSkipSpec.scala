package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.io.{VersionedTable => VT}

/** Per-file Bloom point-lookup skipping: equality/IN probes on a column
  * the files are NOT clustered on (min/max ranges all overlap — range
  * stats can never prune) must skip via the per-(file, column) Bloom
  * sidecars, with zero false negatives (results always exact). */
class BloomSkipSpec extends SparkSpec {
  import spark.implicits._

  private def withTable[T](body: String => T): T = {
    val dir = Files.createTempDirectory("graft-bloom")
    try body(dir.resolve("t").toString)
    finally {
      val walk = Files.walk(dir)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  private def allScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[FileSourceScanExec] =
    p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
    }.flatten

  private def filesScanned(df: DataFrame, col: String): Long = {
    df.collect()
    allScans(df.queryExecution.executedPlan)
      .filter(_.schema.fieldNames.contains(col))
      .map(_.metrics("numFiles").value).sum
  }

  /** Four files clustered on `id` but probed on `tag`: every file's tag
    * RANGE spans the whole alphabet (min/max useless), while each tag
    * VALUE lives in exactly one file — the Bloom operating point. Tags
    * are `t<file>_<i>` plus sentinels `a0`/`z9` in every file pinning
    * the min/max wide open. */
  private def fourFiles(t: String, bloom: Boolean,
      cap: Option[Long] = None): Unit =
    (0 until 4).foreach { i =>
      val rows = (0 until 50).map(j => (i * 100 + j, s"t${i}_$j")) ++
        Seq((i * 100 + 98, "a0"), (i * 100 + 99, "z9"))
      VT.append(spark, rows.toDF("id", "tag"), t,
        statsFor = Seq("id", "tag"),
        bloomFor = if (bloom) Seq("tag") else Nil, bloomFpp = 0.001,
        bloomMaxBytes = cap)
    }

  test("equality probe on an unclustered column skips via Bloom") {
    withTable { t =>
      fourFiles(t, bloom = true)
      val snap = VT.snapshot(spark, t)
      // range stats alone CANNOT prune this (sentinels pin every file's
      // [a0, z9]); the bloom answers definitively
      val hit = snap.filter(col("tag") === "t2_7")
      assert(hit.count() == 1 && filesScanned(hit, "tag") == 1)
      val miss = snap.filter(col("tag") === "t9_99")
      assert(miss.count() == 0 && filesScanned(miss, "tag") == 0)
      val in = snap.filter(col("tag").isin("t0_1", "t3_4"))
      assert(in.count() == 2 && filesScanned(in, "tag") == 2)
    }
  }

  test("without bloomFor the same probe scans every file") {
    withTable { t =>
      fourFiles(t, bloom = false)
      val snap = VT.snapshot(spark, t)
      val hit = snap.filter(col("tag") === "t2_7")
      assert(hit.count() == 1 && filesScanned(hit, "tag") == 4)
    }
  }

  test("bloom entries die with their files; compact rebuilds the index") {
    withTable { t =>
      fourFiles(t, bloom = true)
      // MERGE rewrites the hit file — its bloom entry goes stale-harmless
      // (keyed by the dead file's name, never consulted again); results
      // stay exact, the rewritten file just can't skip until re-indexed
      VT.merge(spark, Seq((207, "t2_7x")).toDF("id", "tag"), t, Seq("id"))
      val snap = VT.snapshot(spark, t)
      assert(snap.filter(col("tag") === "t2_7x").count() == 1)
      assert(snap.filter(col("tag") === "t2_7").count() == 0)
      // OPTIMIZE with bloomFor: full-replacement commit RESETS the
      // sidecar list and indexes the fresh files
      VT.compact(spark, t, targetFiles = 4, clusterBy = Seq("id"),
        statsFor = Seq("id"), bloomFor = Seq("tag"), bloomFpp = 0.001)
      val snap2 = VT.snapshot(spark, t)
      val hit = snap2.filter(col("tag") === "t1_3")
      assert(hit.count() == 1 && filesScanned(hit, "tag") == 1)
      val miss = snap2.filter(col("tag") === "t2_7") // merged away
      assert(miss.count() == 0 && filesScanned(miss, "tag") == 0)
    }
  }

  test("restore brings the target version's bloom index back") {
    withTable { t =>
      fourFiles(t, bloom = true)                                  // v0..v3
      VT.overwrite(spark, Seq((1, "zz")).toDF("id", "tag"), t)    // v4
      VT.restore(spark, t, 3L)                                    // v5
      val snap = VT.snapshot(spark, t)
      val hit = snap.filter(col("tag") === "t0_5")
      assert(hit.count() == 1 && filesScanned(hit, "tag") == 1)
    }
  }

  test("time travel consults the version's own bloom state") {
    withTable { t =>
      fourFiles(t, bloom = true)
      // at v1 only two files exist; the probe for a v3-only value scans 0
      val v1 = VT.snapshot(spark, t, Some(1)).filter(col("tag") === "t3_4")
      assert(v1.count() == 0 && filesScanned(v1, "tag") == 0)
    }
  }

  test("stats and bloom tracking are STICKY: un-annotated writes keep " +
      "indexing, MERGE re-indexes its rewritten files") {
    withTable { t =>
      VT.append(spark, Seq((1, "aa"), (2, "bb")).toDF("id", "tag"), t,
        statsFor = Seq("id"), bloomFor = Seq("tag"), bloomFpp = 0.001)
      // plain append, NO statsFor/bloomFor — inherits both
      VT.append(spark, Seq((100, "mm"), (101, "nn")).toDF("id", "tag"), t)
      val snap = VT.snapshot(spark, t)
      val range = snap.filter(col("id") < 50) // needs stats on file 2
      assert(range.count() == 2 && filesScanned(range, "id") == 1)
      val probe = snap.filter(col("tag") === "mm") // needs bloom on file 2
      assert(probe.count() == 1 && filesScanned(probe, "tag") == 1)
      // MERGE rewrites file 1 — the fresh file is re-indexed immediately
      VT.merge(spark, Seq((1, "zz")).toDF("id", "tag"), t, Seq("id"))
      val snap2 = VT.snapshot(spark, t)
      val merged = snap2.filter(col("tag") === "zz")
      assert(merged.count() == 1 && filesScanned(merged, "tag") == 1)
      val gone = snap2.filter(col("tag") === "aa")
      assert(gone.count() == 0 && filesScanned(gone, "tag") == 0)
      // file-granular DELETE: survivors keep their index too
      VT.deleteWhere(spark, t, col("id") === 101)
      val snap3 = VT.snapshot(spark, t)
      val kept = snap3.filter(col("tag") === "mm")
      assert(kept.count() == 1 && filesScanned(kept, "tag") == 1)
    }
  }

  test("filters are sized per file size class, not for the batch's " +
    "largest file") {
    withTable { t =>
      // ONE commit mixing a 4096-row file with a 4-row file. Explicit
      // RDD slices pin the two partitions — DataFrame-level tricks
      // (union of repartition(1)s) get collapsed by the optimizer
      val slices: Seq[Seq[(Int, String)]] = Seq(
        (0 until 4096).map(i => (i, s"b$i")),
        (0 until 4).map(i => (10000 + i, s"s$i")))
      val mixed = spark.sparkContext.parallelize(slices, 2)
        .flatMap(identity).toDF("id", "tag")
      val c = VT.append(spark, mixed, t, optimizeWrite = false,
        bloomFor = Seq("tag"), bloomFpp = 0.01)
      assert(c.add.size == 2, s"fixture wrote ${c.add} — need two files")
      val sc = {
        val l = Files.list(java.nio.file.Paths.get(t))
        try l.iterator().asScala.map(_.getFileName.toString)
          .find(_.endsWith("-bloom.json")).get
        finally l.close()
      }
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(Files.readAllBytes(java.nio.file.Paths.get(t, sc)))
      val sizes = node.get("entries").elements().asScala
        .map(_.get("bloom").asText().length).toSeq.sorted
      assert(sizes.size == 2)
      // pow-4 classes: a 4-row file's filter must be far smaller than a
      // 4096-row file's (the old batch-max sizing made them EQUAL)
      assert(sizes.head * 8 < sizes.last,
        s"filters not class-sized: $sizes")
      // and both still answer probes exactly
      val snap = VT.snapshot(spark, t)
      val hit = snap.filter(col("tag") === "s2")
      assert(hit.count() == 1 && filesScanned(hit, "tag") == 1)
    }
  }

  test("the sidecar byte cap drops filters loudly, never correctness") {
    withTable { t =>
      // per-call cap (the global stays untouched — mutating it here raced
      // any concurrently committing suite): nothing fits under 8 bytes
      fourFiles(t, bloom = true, cap = Some(8L))
      val sidecars = {
        val l = Files.list(java.nio.file.Paths.get(t))
        try l.iterator().asScala.count(
          _.getFileName.toString.endsWith("-bloom.json"))
        finally l.close()
      }
      assert(sidecars == 0, "capped commit still wrote a sidecar")
      // no filters → conservative keep: every file scans, results exact
      val snap = VT.snapshot(spark, t)
      val hit = snap.filter(col("tag") === "t2_7")
      assert(hit.count() == 1 && filesScanned(hit, "tag") == 4)
    }
  }

  test("explicitly indexing a reserved '__'-prefixed column is rejected") {
    withTable { t =>
      val df = Seq((1, "a")).toDF("id", "__nulls_id")
      val e1 = intercept[IllegalArgumentException] {
        VT.append(spark, df, t, statsFor = Seq("__nulls_id"))
      }
      assert(e1.getMessage.contains("reserved"))
      val e2 = intercept[IllegalArgumentException] {
        VT.append(spark, df, t, bloomFor = Seq("__rows"))
      }
      assert(e2.getMessage.contains("reserved"))
      // the column itself is storable — it just cannot be indexed, so it
      // can never shadow another column's count keys
      VT.append(spark, df, t, statsFor = Seq("id"))
      assert(VT.snapshot(spark, t).columns.contains("__nulls_id"))
    }
  }

  test("vacuum GCs bloom sidecars with their retired files") {
    withTable { t =>
      fourFiles(t, bloom = true)
      VT.overwrite(spark, Seq((1, "zz")).toDF("id", "tag"), t)
      def sidecars = {
        val l = Files.list(java.nio.file.Paths.get(t))
        try l.iterator().asScala.count(
          _.getFileName.toString.endsWith("-bloom.json"))
        finally l.close()
      }
      // 4 append sidecars + 1 from the overwrite (sticky inheritance:
      // the overwrite re-indexed its own fresh file)
      assert(sidecars == 5)
      assert(VT.vacuum(t, retainMs = 0L) > 0)
      // only the live version's sidecar survives
      assert(sidecars == 1)
      assert(VT.snapshot(spark, t).count() == 1)
      val probe = VT.snapshot(spark, t).filter(col("tag") === "zz")
      assert(probe.count() == 1 && filesScanned(probe, "tag") == 1)
    }
  }
}
