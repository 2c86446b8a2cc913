package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File/table sources (SURVEY §2.1, S1–S4).
  *
  * Mirrors the reference read surface (reference `src/utils/spark_utils.py:60-195`):
  * CSV and JSON with PERMISSIVE parsing plus a `_corrupt_record` channel, an
  * explicit-schema-first policy (inference is a fallback), and a path-XOR-name
  * table reader. Spark-first: readers only *declare* the scan; Catalyst pushes
  * filters and prunes columns into the format reader at execution.
  */
object Readers {

  val CorruptRecordColumn = "_corrupt_record"

  /** CSV scan (reference spark_utils.py:60-112). Explicit schema if given,
    * else inference (dev-only convenience: a second pass over the files).
    * PERMISSIVE + corrupt-record column so malformed rows land in-band and
    * can be routed to quarantine instead of killing the job.
    */
  def readCsv(
      spark: SparkSession,
      path: String,
      schema: Option[StructType] = None,
      header: Boolean = true,
      delimiter: String = ",",
      options: Map[String, String] = Map.empty): DataFrame = {
    // The corrupt-record column must exist in the schema for PERMISSIVE
    // capture; add it when an explicit schema was passed without it.
    val reader = spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptRecordColumn)
      .options(options)
    schema match {
      case Some(s) => reader.schema(withCorruptField(s)).csv(path)
      case None =>
        // PERMISSIVE only captures into _corrupt_record when the column
        // exists in the schema, and inference never adds it — so infer
        // first, then re-read with the corrupt field appended (inference
        // already cost a pass; the contract that malformed rows land
        // in-band must hold on this path too)
        val inferred = spark.read
          .option("header", header.toString)
          .option("delimiter", delimiter)
          .option("inferSchema", "true")
          .options(options)
          .csv(path).schema
        reader.schema(withCorruptField(inferred)).csv(path)
    }
  }

  /** JSON scan (reference spark_utils.py:115-157): JSON-lines by default,
    * `multiline=true` for pretty-printed arrays; same PERMISSIVE channel.
    */
  def readJson(
      spark: SparkSession,
      path: String,
      schema: Option[StructType] = None,
      multiline: Boolean = false,
      options: Map[String, String] = Map.empty): DataFrame = {
    val reader = spark.read
      .option("multiLine", multiline.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptRecordColumn)
      .options(options)
    schema match {
      case Some(s) => reader.schema(withCorruptField(s)).json(path)
      case None =>
        // same as readCsv: inferred schemas lack the corrupt column, so
        // re-read with it appended to keep the quarantine contract.
        // (JSON inference ALREADY surfaces _corrupt_record when it meets
        // malformed rows — withCorruptField is a no-op then.)
        val inferred = spark.read
          .option("multiLine", multiline.toString)
          .options(options)
          .json(path).schema
        reader.schema(withCorruptField(inferred)).json(path)
    }
  }

  /** ORC scan — same pushdown/pruning properties as parquet (predicates
    * and projections reach the reader; min/max stripe statistics prune). */
  def readOrc(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val reader = spark.read
    schema.fold(reader)(reader.schema).orc(path)
  }

  /** Raw text-corpus source: one row per line (`wholetext=true` for one
    * row per file — the document-ingestion shape for LLM pipelines). */
  def readText(spark: SparkSession, path: String,
      wholeFile: Boolean = false): DataFrame =
    spark.read.option("wholetext", wholeFile.toString).text(path)

  /** Table scan by path XOR metastore name (reference spark_utils.py:160-195).
    * Exactly one of `path`/`tableName` must be provided.
    */
  def readTable(
      spark: SparkSession,
      path: Option[String] = None,
      tableName: Option[String] = None): DataFrame =
    (path, tableName) match {
      case (Some(p), None) => spark.read.parquet(p)
      case (None, Some(t)) => spark.table(t)
      case _ =>
        throw new IllegalArgumentException(
          "exactly one of path or tableName must be provided")
    }

  private def withCorruptField(s: StructType): StructType =
    if (s.fieldNames.contains(CorruptRecordColumn)) s
    else s.add(CorruptRecordColumn, org.apache.spark.sql.types.StringType,
      nullable = true)
}
