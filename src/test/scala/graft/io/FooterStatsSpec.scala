package graft.io

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** FooterStats ≡ scanStats parity: the footer-read bounds must be
  * byte-identical to the scan pass's CAST-rendered bounds for every
  * supported type, because filesInRange/GraftFileIndex compare reader-side
  * renderings against whatever the writer recorded. Unsupported shapes
  * must ROUTE to the scan fallback, never silently diverge. */
class FooterStatsSpec extends graft.SparkSpec {
  import spark.implicits._

  private def writeScratch(df: org.apache.spark.sql.DataFrame)
      : (String, Seq[String]) = {
    val dir = Files.createTempDirectory("footerstats")
    val sub = dir.resolve("t")
    df.write.parquet(sub.toString)
    val l = Files.list(sub)
    val names =
      try l.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted
      finally l.close()
    (sub.toString, names)
  }
  /** The INT64-micros write shape (GraftSession keeps the session at the
    * INT96 default for oracle-dtype reasons; the micros path must still
    * hold parity for writers that use it). */
  private def withMicros[T](body: => T): T = {
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try body finally spark.conf.set(key, prev)
  }

  test("footer bounds are byte-identical to scan bounds on every supported type") {
    val df = Seq(
      (1L, 7, 1.0e7, 0.5f, "alpha", true, "2023-05-01", "2023-05-01 10:30:00"),
      (-5L, 0, 1.0e-10, -3.25f, "", false, "1999-12-31", "1970-01-01 00:00:00"),
      (42L, -9, -0.0, 8.5f, "Ωmega", true, "2024-02-29", "2031-06-15 23:59:59")
    ).toDF("l", "i", "d", "f", "s", "b", "dt0", "ts0")
      .withColumn("dt", col("dt0").cast("date"))
      .withColumn("ts", col("ts0").cast("timestamp"))
      .drop("dt0", "ts0")
      // a null per column keeps the null-count path honest
      .unionByName(Seq((Option.empty[Long], Option.empty[Int],
        Option.empty[Double], Option.empty[Float], Option.empty[String],
        Option.empty[Boolean]))
        .toDF("l", "i", "d", "f", "s", "b")
        .withColumn("dt", lit(null).cast("date"))
        .withColumn("ts", lit(null).cast("timestamp")))
      .coalesce(1)
    val (table, files) = withMicros { writeScratch(df) }
    val cols = Seq("l", "i", "d", "f", "s", "b", "dt", "ts")
    val (footer, fallback) = FooterStats.tryCompute(table, files, cols).get
    // INT64-micros write: NOTHING may fall back — every requested column
    // must be footer-answerable
    assert(fallback.isEmpty, s"unexpected fallback columns: $fallback")
    val scanned = VersionedTable.scanStats(spark, table, files, cols)
    assert(files.nonEmpty)
    files.foreach { f =>
      val fm = footer(f)
      val sm = scanned(f)
      // identical keys (rows, per-column bounds, per-column null counts)
      assert(fm.keySet == sm.keySet, s"stat keys differ for $f:\n" +
        s"footer ${fm.keySet.toSeq.sorted}\nscan   ${sm.keySet.toSeq.sorted}")
      fm.foreach { case (k, v) =>
        assert(v == sm(k), s"stat '$k' differs: footer $v vs scan ${sm(k)}")
      }
    }
  }

  test("INT96 timestamps route to the scan fallback (legacy writer)") {
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try {
      val df = Seq("2023-05-01 10:30:00").toDF("ts0")
        .select(col("ts0").cast("timestamp").as("ts"), lit(1L).as("l"))
        .coalesce(1)
      val (table, files) = writeScratch(df)
      val (footer, fallback) =
        FooterStats.tryCompute(table, files, Seq("ts", "l")).get
      assert(fallback == Seq("ts"))
      assert(footer(files.head).contains("l"))
      // composed path still yields the full scan's answer for ts
      val composed =
        VersionedTable.computeStats(spark, table, files, Seq("ts", "l"))
      val scanned =
        VersionedTable.scanStats(spark, table, files, Seq("ts", "l"))
      files.foreach { f =>
        scanned(f).foreach { case (k, v) =>
          assert(composed(f)(k) == v, s"composed stat '$k' differs")
        }
      }
    } finally
      spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
  }

  test("NaN pages omit float/double bounds instead of guessing (conservative keep)") {
    val df = Seq(1.5, Double.NaN, -2.0).toDF("d").coalesce(1)
    val (table, files) = writeScratch(df)
    val (footer, _) = FooterStats.tryCompute(table, files, Seq("d")).get
    val fm = footer(files.head)
    assert(!fm.contains("d"),
      s"NaN-bearing column must carry NO footer bounds, got ${fm.get("d")}")
    assert(fm.contains(VersionedTable.RowsKey))
  }

  test("decimal columns route to the scan fallback") {
    val df = Seq("12.34", "99.99").toDF("x")
      .select(col("x").cast("decimal(12,2)").as("dec"),
        lit(1L).as("l"))
      .coalesce(1)
    val (table, files) = writeScratch(df)
    val (footer, fallback) =
      FooterStats.tryCompute(table, files, Seq("dec", "l")).get
    assert(fallback == Seq("dec"))
    assert(footer(files.head).contains("l"))
    // and the composed computeStats (footer + scan fallback) equals the
    // pure scan for both columns
    val composed =
      VersionedTable.computeStats(spark, table, files, Seq("dec", "l"))
    val scanned = VersionedTable.scanStats(spark, table, files, Seq("dec", "l"))
    files.foreach { f =>
      scanned(f).foreach { case (k, v) =>
        assert(composed(f)(k) == v, s"composed stat '$k' differs")
      }
    }
  }

  test("multi-file commit: per-file bounds stay per-file") {
    val df = spark.range(100).select(col("id").as("l"))
      .repartitionByRange(4, col("l"))
    val (table, files) = writeScratch(df)
    assert(files.size == 4)
    val (footer, _) = FooterStats.tryCompute(table, files, Seq("l")).get
    val scanned = VersionedTable.scanStats(spark, table, files, Seq("l"))
    files.foreach(f => assert(footer(f) == scanned(f)))
    // bounds genuinely differ across files (range-clustered)
    assert(footer.values.map(_("l")).toSet.size == 4)
  }
}
