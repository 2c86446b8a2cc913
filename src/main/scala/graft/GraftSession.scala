package graft

import org.apache.spark.sql.SparkSession

/** Tuned session factory — the one place the engine's recommended Spark
  * configuration lives (Verify, Bench, tests and library users all build
  * through it).
  *
  *  - shuffle partitions: [[local]] pins them to the thread count (the
  *    Spark default of 200 is wrong for local runs). [[builder]] leaves
  *    them at the cluster/submit default unless the caller passes a value
  *    — AQE only coalesces partition counts DOWNWARD (plus skew splits),
  *    so defaulting to the driver JVM's core count would cap every
  *    cluster shuffle at a fraction of executor parallelism;
  *  - AQE on (runtime join re-selection, skew splitting, partition
  *    coalescing);
  *  - ObjectHashAggregate fallback raised so the engine's imperative
  *    aggregates (MinHashAgg/SimHashAgg) keep hash aggregation on real
  *    group counts;
  *  - UTC session time zone (oracle/temporal determinism);
  *  - nanosAsLong for parquet TIMESTAMP(NANOS) inputs (converted to µs by
  *    `Tables.load`);
  *  - graft SQL functions registered via extensions (`vec_dot`).
  */
object GraftSession {

  def builder(appName: String = "graft",
      master: Option[String] = None,
      shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val b0 = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      // Coalesce small shuffle partitions to the advisory byte size
      // instead of preserving one partition per core: with
      // parallelismFirst at its true default, AQE keeps
      // default-parallelism partitions however tiny they are, so every
      // reduce stage of a small shuffle pays per-task scheduling for
      // near-empty tasks — and at cluster scale the same flag is what
      // keeps partitions in the 64 MB+ range the shuffle machinery
      // prefers (Spark's own tuning guide recommends false). Measured
      // (r18 opt, local[32] sf0.1, min-of-3 warm): q58 6.2→5.0 s,
      // q96 9.0→7.4 s, q70 6.4→5.4 s with the cached-plan flag below.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      // Let AQE re-partition CACHED plans too: the dedup/curation
      // pipelines persist intermediates at every fan-out, and with this
      // flag at its false default every stage under a persist keeps the
      // full session shuffle-partition count — the coalescing above
      // never reaches the hottest (cached) subtrees. Values are
      // partitioning-independent by design (the oracle hash gates prove
      // it per query).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
    val b = shufflePartitions.fold(b0)(n =>
      b0.config("spark.sql.shuffle.partitions", n.toString))
      .config("spark.sql.session.timeZone", "UTC")
      // outputTimestampType stays at the INT96 default DELIBERATELY:
      // TIMESTAMP_MICROS would let FooterStats answer timestamp bounds
      // from footers (INT96 carries no usable stats), but it annotates
      // the written type as UTC-adjusted — pandas/DuckDB then read the
      // engine's parquet as tz-aware datetime64[us, UTC] while plain SQL
      // timestamps stay naive, and every timestamp-bearing gate fails
      // the driver's dtype compare (measured r14: q20/q44/q47).
      // Timestamp stats take the scan fallback instead; all other types
      // ride the footer path.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // driver testdata stores naive TIMESTAMP(MICROS); read it as a UTC
      // instant (TimestampType), not TIMESTAMP_NTZ — NTZ breaks epoch
      // casts under ANSI and diverges from the DuckDB oracle's view
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
    master.fold(b)(b.master)
  }

  /** Local session with `cpus` threads (the Verify/Bench shape). */
  def local(appName: String, cpus: Int): SparkSession = {
    val s = builder(appName, Some(s"local[$cpus]"), Some(cpus)).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
