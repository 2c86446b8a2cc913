package graft.io

import java.nio.file.Paths

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.column.statistics.Statistics
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.types._

/** Per-file min/max/null/row statistics read from parquet FOOTERS —
  * O(files) metadata reads instead of re-scanning every just-written byte.
  *
  * The scan-based stats pass ([[VersionedTable]]'s `computeStats`) re-reads
  * each committed file in full: at local bench scale that is one extra
  * Spark job per commit; at 100 TB it DOUBLES the write path's I/O (a 1 TB
  * append re-reads its 1 TB for min/max). The parquet writer already
  * computed exactly these statistics per column chunk and stored them in
  * the footer; reading them back costs one footer parse per file
  * (kilobytes), no executors, no job.
  *
  * Parity contract: the rendered bounds must be byte-identical to what the
  * scan path renders (`CAST(v AS STRING)` for most types, UTC micros for
  * TIMESTAMP), because [[VersionedTable.filesInRange]]/[[GraftFileIndex]]
  * compare reader-side renderings against them. FooterStatsSpec asserts
  * footer ≡ scan on every supported type. Columns whose type (or physical
  * encoding) cannot guarantee that parity fall back to the scan pass:
  *  - DECIMAL (scale-dependent binary encodings),
  *  - TIMESTAMP written as INT96 (parquet writes no INT96 stats),
  *  - TIMESTAMP_NTZ (the scan renders a zone-less cast, not micros),
  *  - anything nested / non-primitive.
  * Per-file edge cases degrade to OMISSION, which every consumer treats as
  * "cannot exclude" (conservative keep): a chunk with absent statistics, a
  * floating column whose pages saw NaN (parquet omits min/max), an unset
  * null count.
  */
private[io] object FooterStats {

  /** Bounded parallelism for driver-side footer reads: a commit of
    * thousands of files must not serialize thousands of ~ms metadata
    * opens (10k files ≈ tens of seconds single-threaded), and must not
    * spawn unbounded threads either. Shared fixed pool, daemon threads. */
  private lazy val pool = java.util.concurrent.Executors.newFixedThreadPool(
    16,
    (r: Runnable) => {
      val t = new Thread(r, "graft-footer-stats")
      t.setDaemon(true)
      t
    })

  /** Map `files` through `f` on the footer pool, preserving order;
    * rethrows the first failure. */
  private def parMap[T](files: Seq[String])(f: String => T): Seq[T] = {
    import scala.jdk.CollectionConverters._
    val tasks: java.util.List[java.util.concurrent.Callable[T]] =
      files.map(file => new java.util.concurrent.Callable[T] {
        override def call(): T = f(file)
      }).asJava
    pool.invokeAll(tasks).asScala.toSeq.map(_.get())
  }

  /** Spark types whose footer statistics render byte-identically to the
    * scan path's `CAST(v AS STRING)` (TIMESTAMP handled separately —
    * micros — and only when physically INT64). */
  private val castParityTypes: Set[DataType] = Set(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    StringType, BooleanType, DateType)

  /** Read stats for `statsFor` columns of `files` under `table` from
    * footers. Returns None when NOTHING could be read (corrupt footer, no
    * Spark schema metadata) — the caller then runs the scan pass for all
    * columns. Otherwise returns (per-file stats, columns that need the
    * scan fallback). */
  def tryCompute(table: String, files: Seq[String], statsFor: Seq[String])
      : Option[(Map[String, Map[String, (String, String)]], Seq[String])] =
    try {
      val conf = new Configuration()
      val perFile = parMap(files) { f =>
        val p = Paths.get(table, f)
        val reader = ParquetFileReader.open(
          HadoopInputFile.fromPath(new HPath(p.toUri), conf))
        try {
          val footer = reader.getFooter
          val meta = footer.getFileMetaData
          val sparkJson = meta.getKeyValueMetaData
            .get("org.apache.spark.sql.parquet.row.metadata")
          // no Spark schema metadata: signal "fall back" via exception
          // (parMap rethrows; tryCompute's NonFatal catch returns None)
          if (sparkJson == null)
            throw new IllegalStateException(s"no spark schema in $f")
          val sparkSchema =
            DataType.fromJson(sparkJson).asInstanceOf[StructType]
          val blocks = footer.getBlocks.asScala.toSeq
          val rows = blocks.map(_.getRowCount).sum
          (f, sparkSchema, blocks, rows)
        } finally reader.close()
      }
      // the supported/fallback split must be IDENTICAL for every file of
      // the commit (one writer, one schema) — derive it from the first
      // file's schema; a file disagreeing on a column's type falls back
      val schema0 = perFile.headOption.map(_._2).getOrElse(return None)
      def supported(c: String): Boolean =
        schema0.find(_.name == c).map(_.dataType).exists {
          case TimestampType => true // INT96 detected per file below
          case dt => castParityTypes.contains(dt)
        }
      val (footerCols, scanCols) = statsFor.partition(supported)
      // INT96 timestamps carry no parquet stats: detect once on the first
      // file and route those columns to the scan pass instead of silently
      // losing their skipping power
      val int96Cols = footerCols.filter { c =>
        schema0.find(_.name == c).map(_.dataType).contains(TimestampType) &&
          perFile.exists { case (_, _, blocks, _) =>
            blocks.headOption.exists(_.getColumns.asScala.exists(ch =>
              ch.getPath.toDotString == c &&
                ch.getPrimitiveType.getPrimitiveTypeName ==
                  org.apache.parquet.schema.PrimitiveType
                    .PrimitiveTypeName.INT96))
          }
      }
      val cols = footerCols.filterNot(int96Cols.contains)
      val stats = perFile.map { case (f, schema, blocks, rows) =>
        val entries = scala.collection.mutable.Map[String, (String, String)](
          VersionedTable.RowsKey -> (rows.toString, rows.toString))
        cols.foreach { c =>
          schema.find(_.name == c).foreach { field =>
            val chunks = blocks.flatMap(
              _.getColumns.asScala.find(_.getPath.toDotString == c))
            // every block must expose this column with usable statistics;
            // a single silent gap means the footer cannot answer for the
            // whole file — omit (conservative keep), never guess
            val statsList = chunks.map(_.getStatistics)
            if (chunks.size == blocks.size && statsList.forall(s =>
                s != null && !s.isEmpty)) {
              val nulls = statsList.map(_.getNumNulls)
              if (nulls.forall(_ >= 0L)) {
                val n = nulls.sum
                entries += VersionedTable.nullsKey(c) ->
                  (n.toString, n.toString)
              }
              val valued = statsList.filter(_.hasNonNullValue)
              // NaN pages make parquet omit min/max (hasNonNullValue
              // false even with values present) — detectable as "no
              // bounds but fewer nulls than rows": omit the bounds
              val bounds = valued.flatMap(s => renderBounds(field, s))
              if (bounds.size == valued.size && bounds.nonEmpty) {
                val lo = bounds.map(_._1).reduce(minRendered(field, _, _))
                val hi = bounds.map(_._2).reduce(maxRendered(field, _, _))
                entries += c -> (lo, hi)
              }
            }
          }
        }
        f -> entries.toMap
      }.toMap
      Some((stats, scanCols ++ int96Cols))
    } catch { case NonFatal(_) => None }

  /** Exact per-file row counts from footer block metadata — the cheap
    * half of the bloom builder's two passes (its pass 1 was a full
    * groupBy-file count job over just-written bytes). None on any read
    * trouble → caller falls back to the scan count. */
  def rowCounts(table: String, files: Seq[String])
      : Option[Map[String, Long]] =
    try {
      val conf = new Configuration()
      Some(parMap(files) { f =>
        val p = Paths.get(table, f)
        val reader = ParquetFileReader.open(
          HadoopInputFile.fromPath(new HPath(p.toUri), conf))
        try f -> reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        finally reader.close()
      }.toMap)
    } catch { case NonFatal(_) => None }

  /** Render one chunk's (min, max) exactly as the scan path's
    * CAST(v AS STRING) (micros for TIMESTAMP). None = unsupported shape,
    * omit the column for this file. */
  private def renderBounds(field: StructField,
      s: Statistics[_]): Option[(String, String)] =
    try {
      def r(v: AnyRef): Option[String] = (field.dataType, v) match {
        case (ByteType | ShortType | IntegerType, x: java.lang.Integer) =>
          Some(x.toString)
        case (LongType, x: java.lang.Long) => Some(x.toString)
        case (TimestampType, x: java.lang.Long) => Some(x.toString)
        case (FloatType, x: java.lang.Float) =>
          if (x.isNaN) None else Some(x.toString)
        case (DoubleType, x: java.lang.Double) =>
          if (x.isNaN) None else Some(x.toString)
        case (BooleanType, x: java.lang.Boolean) => Some(x.toString)
        case (StringType, x: org.apache.parquet.io.api.Binary) =>
          // accept a string bound ONLY when its bytes round-trip UTF-8
          // exactly: a writer with statistics truncation enabled stores
          // an INCREMENTED max whose bytes may not be valid UTF-8, and a
          // lossy decode (U+FFFD substitution) is not order-faithful —
          // pruning against it could drop matching files. (This engine's
          // writer does not truncate — probed: 108-byte bounds round-trip
          // exactly — so this guard only fires on foreign writers.)
          val bytes = x.getBytes
          val decoded = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
          if (java.util.Arrays.equals(
              decoded.getBytes(java.nio.charset.StandardCharsets.UTF_8), bytes))
            Some(decoded)
          else None
        case (DateType, x: java.lang.Integer) =>
          Some(java.time.LocalDate.ofEpochDay(x.longValue).toString)
        case _ => None
      }
      for {
        lo <- r(s.genericGetMin.asInstanceOf[AnyRef])
        hi <- r(s.genericGetMax.asInstanceOf[AnyRef])
      } yield (lo, hi)
    } catch { case NonFatal(_) => None }

  /** Merge two rendered bounds of the SAME column in its type's order
    * (numeric value order; UTF8 binary order for strings; ISO dates and
    * micros order lexically/numerically the same way they order as
    * values). */
  private def cmpRendered(field: StructField, a: String, b: String): Int =
    field.dataType match {
      case ByteType | ShortType | IntegerType | LongType | TimestampType =>
        java.lang.Long.compare(a.toLong, b.toLong)
      case FloatType | DoubleType =>
        java.lang.Double.compare(a.toDouble, b.toDouble)
      case BooleanType => a.compareTo(b) // "false" < "true" lexically
      case DateType =>
        // parse back rather than lexical: signed-year renderings
        // ("-0044-…", "+10000-…") break lexical order
        java.lang.Long.compare(java.time.LocalDate.parse(a).toEpochDay,
          java.time.LocalDate.parse(b).toEpochDay)
      case _ =>
        org.apache.spark.unsafe.types.UTF8String.fromString(a)
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
    }
  private def minRendered(f: StructField, a: String, b: String): String =
    if (cmpRendered(f, a, b) <= 0) a else b
  private def maxRendered(f: StructField, a: String, b: String): String =
    if (cmpRendered(f, a, b) >= 0) a else b
}
