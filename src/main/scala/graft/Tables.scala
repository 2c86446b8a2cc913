package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided test tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `sfDir`. At cluster scale the
  * same call reads a partitioned directory — `spark.read.parquet` is
  * agnostic. Filters/projections applied downstream are pushed into the
  * parquet scan by Catalyst (verify via `.explain`: PushedFilters/ReadSchema).
  *
  * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
  * has no timestamp type for — it is read as nanosecond longs
  * (`nanosAsLong`) and converted to micros TimestampType with integer
  * division (never double division: nano epochs exceed 2^53). The test
  * data carries no sub-microsecond precision, so this is lossless and
  * matches what DuckDB/pyarrow see.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // session-global by necessity: nanosAsLong is a SQLConf, not a
    // per-read option, and must be set before the reader resolves the
    // schema (GraftSession sets it at build; this covers foreign sessions)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // naive TIMESTAMP(MICROS) inputs (current driver format) must read as
    // UTC-instant TimestampType, not TIMESTAMP_NTZ: ANSI forbids NTZ →
    // BIGINT epoch casts and the DuckDB oracle sees the same wall-clock
    // values either way under the UTC session
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    // the ns→µs rewrite applies ONLY to the table known to carry
    // TIMESTAMP(NANOS) (events — read as LongType under nanosAsLong):
    // keying on column name/type alone would silently divide a future
    // table's genuine epoch-micros/seconds BIGINT ts by 1000 and
    // reinterpret it, corrupting every temporal read with no error
    val df = raw.schema.find(_.name == "ts") match {
      case Some(f) if f.dataType == LongType && name == "events" =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
    // The driver's test files are single-row-group parquet, so a scan
    // yields ONE task no matter what maxPartitionBytes says. For the
    // CPU-dense per-row tables (text shingling, vector math) that would
    // serialize all work onto one core — spread them across the cluster at
    // load. Relational tables stay as scanned: their per-row work is
    // cheap, their aggregates/joins parallelize at the shuffle anyway, and
    // an unconditional repartition costs more than it buys. GATED on the
    // scan actually being under-split (the Multimodal.spread contract,
    // r19): at real scale inputs arrive multi-row-group with ≥cores scan
    // partitions, and an unconditional repartition(defaultParallelism)
    // there is a full shuffle of the table that also CAPS scan
    // parallelism at the driver JVM's core count. The partition probe is
    // safe here — `df` is scan-rooted with row-local transforms only.
    val target = spark.sparkContext.defaultParallelism
    if (cpuDense(name) && df.rdd.getNumPartitions < target)
      df.repartition(target)
    else df
  }

  private val cpuDense = Set("documents", "embeddings")
}
