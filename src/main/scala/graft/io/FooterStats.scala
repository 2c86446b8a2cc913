package graft.io

import java.nio.file.Paths

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.column.statistics.Statistics
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
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
  * footer ≡ scan on every supported type. Each candidate column's chunks
  * are validated against the PHYSICAL parquet shape the parity proof
  * covers (see [[physicalOk]]) — a foreign writer storing, say,
  * TIMESTAMP_MILLIS where this engine expects micros, or a re-scaled
  * decimal, routes that column to the scan pass instead of silently
  * recording bounds in the wrong unit (which reader-side pruning would
  * then trust, dropping files that DO contain matching rows). Columns
  * whose type can never guarantee parity also fall back to the scan pass:
  *  - TIMESTAMP written as INT96 (parquet writes no INT96 stats),
  *  - TIMESTAMP_NTZ (the scan renders a zone-less cast, not micros),
  *  - anything nested / non-primitive.
  * DECIMAL — the fintech money type, the hottest stats column in this
  * domain — IS footer-answerable: the chunk stats carry the unscaled
  * value (INT32/INT64/binary two's-complement per the declared physical
  * type) and `new java.math.BigDecimal(unscaled, scale).toPlainString`
  * renders exactly what `CAST(dec AS STRING)` produces (Spark 4 casts
  * decimals in PLAIN notation at the declared scale — spec-probed on the
  * tiny-value corner where java toString would go scientific). Per-file
  * edge cases degrade to OMISSION, which every
  * consumer treats as "cannot exclude" (conservative keep): a chunk with
  * absent statistics, a floating column whose pages saw NaN (parquet
  * omits min/max), an unset null count. A file whose FOOTER cannot be
  * read at all degrades alone — it is returned for the scan pass while
  * the rest of the commit keeps its footer answers (one corrupt or
  * foreign file must not force a full re-read of a large commit).
  */
private[io] object FooterStats {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

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
    val tasks: java.util.List[java.util.concurrent.Callable[T]] =
      files.map(file => new java.util.concurrent.Callable[T] {
        override def call(): T = f(file)
      }).asJava
    pool.invokeAll(tasks).asScala.toSeq.map(_.get())
  }

  /** Spark types whose footer statistics render byte-identically to the
    * scan path's `CAST(v AS STRING)` (TIMESTAMP and DECIMAL handled
    * separately — micros / scale-aware — and only when [[physicalOk]]
    * accepts the chunk's physical shape). */
  private val castParityTypes: Set[DataType] = Set(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    StringType, BooleanType, DateType)

  private def footerCandidate(dt: DataType): Boolean = dt match {
    case TimestampType => true
    case _: DecimalType => true
    case other => castParityTypes.contains(other)
  }

  /** Is this column chunk's PHYSICAL shape the one the parity proof
    * covers for the Spark type? The footer value boxes are raw physical
    * values — only the annotation says what they MEAN. A TIMESTAMP INT64
    * chunk annotated MILLIS holds millis that would be recorded as micros
    * (1000× off); a decimal annotated at another scale re-scales every
    * bound. Anything not provably parity-safe routes to the scan pass. */
  private def physicalOk(dt: DataType, pt: PrimitiveType): Boolean = {
    val ann = pt.getLogicalTypeAnnotation
    dt match {
      case TimestampType => ann match {
        case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          pt.getPrimitiveTypeName == PrimitiveTypeName.INT64 &&
            ts.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS &&
            ts.isAdjustedToUTC
        case _ => false // INT96, unannotated INT64, NTZ-shaped, …
      }
      case d: DecimalType => ann match {
        case dec: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
          dec.getScale == d.scale &&
            (pt.getPrimitiveTypeName match {
              case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 |
                  PrimitiveTypeName.BINARY |
                  PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY => true
              case _ => false
            })
        case _ => false
      }
      case ByteType | ShortType | IntegerType =>
        pt.getPrimitiveTypeName == PrimitiveTypeName.INT32 && (ann match {
          case null => true
          case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation => i.isSigned
          case _ => false // DATE/DECIMAL/… masquerading as a plain int
        })
      case LongType =>
        pt.getPrimitiveTypeName == PrimitiveTypeName.INT64 && (ann match {
          case null => true
          case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation => i.isSigned
          case _ => false
        })
      case FloatType => pt.getPrimitiveTypeName == PrimitiveTypeName.FLOAT
      case DoubleType => pt.getPrimitiveTypeName == PrimitiveTypeName.DOUBLE
      case BooleanType =>
        pt.getPrimitiveTypeName == PrimitiveTypeName.BOOLEAN
      case StringType =>
        pt.getPrimitiveTypeName == PrimitiveTypeName.BINARY && (ann match {
          case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation => true
          case _ => false
        })
      case DateType =>
        pt.getPrimitiveTypeName == PrimitiveTypeName.INT32 && (ann match {
          case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation => true
          case _ => false
        })
      case _ => false
    }
  }

  /** Read stats for `statsFor` columns of `files` under `table` from
    * footers. Returns None only when NO file yields a usable footer
    * (every read failed or lacked Spark schema metadata — each such
    * file degrades alone via the per-file catch, so a single bad file
    * lands in the scan-files list, not here) — the caller then runs the
    * scan pass for all columns and all files. Otherwise returns
    * (per-file stats, columns needing the scan fallback for ALL files,
    * files needing the scan fallback for ALL columns). The per-FILE
    * degrade keeps one corrupt/foreign footer from silently re-scanning
    * an entire large commit (the wholesale-None failure mode). */
  def tryCompute(table: String, files: Seq[String], statsFor: Seq[String])
      : Option[(Map[String, Map[String, (String, String)]],
        Seq[String], Seq[String])] =
    try {
      val conf = new Configuration()
      val perFile = parMap(files) { f =>
        try {
          val p = Paths.get(table, f)
          val reader = ParquetFileReader.open(
            HadoopInputFile.fromPath(new HPath(p.toUri), conf))
          try {
            val footer = reader.getFooter
            val meta = footer.getFileMetaData
            val sparkJson = meta.getKeyValueMetaData
              .get("org.apache.spark.sql.parquet.row.metadata")
            // no Spark schema metadata: this file cannot prove parity —
            // degrade it alone to the scan pass
            if (sparkJson == null)
              throw new IllegalStateException(s"no spark schema in $f")
            val sparkSchema =
              DataType.fromJson(sparkJson).asInstanceOf[StructType]
            val blocks = footer.getBlocks.asScala.toSeq
            val rows = blocks.map(_.getRowCount).sum
            Right((f, sparkSchema, blocks, rows))
          } finally reader.close()
        } catch {
          case NonFatal(e) =>
            log.warn(s"footer stats unreadable for $table/$f " +
              s"(falling back to the scan pass for this file): $e")
            Left(f)
        }
      }
      val good = perFile.collect { case Right(v) => v }
      val badFiles = perFile.collect { case Left(f) => f }
      // the supported/fallback COLUMN split must be identical for every
      // file of the commit (one writer, one schema) — derive it from the
      // first readable file's schema
      val schema0 = good.headOption.map(_._2).getOrElse(return None)
      def sparkType(c: String): Option[DataType] =
        schema0.find(_.name == c).map(_.dataType)
      // statsFor names TOP-LEVEL columns; match chunks on single-element
      // column paths, never on the dot-rendered path — a top-level column
      // literally named "a.b" (dots are legal Spark field names, cf.
      // GapFill's backtick quoting) renders identically to a NESTED path
      // a.b from some other struct column, and toDotString matching would
      // validate it against the wrong chunk's stats
      def chunkIsCol(
          ch: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData,
          c: String): Boolean = {
        val p = ch.getPath.toArray
        p.length == 1 && p(0) == c
      }
      val (candidates, scanCols0) =
        statsFor.partition(c => sparkType(c).exists(footerCandidate))
      // physical-shape validation over EVERY chunk of every readable
      // file (in-memory footer metadata — no extra I/O): a column whose
      // stored encoding the parity proof does not cover routes to the
      // scan pass, so its skipping power is preserved instead of its
      // bounds being silently recorded in the wrong unit/scale
      val physBad = candidates.filter { c =>
        val dt = sparkType(c).get
        good.exists { case (_, _, blocks, _) =>
          blocks.exists(_.getColumns.asScala.exists(ch =>
            chunkIsCol(ch, c) && !physicalOk(dt, ch.getPrimitiveType)))
        }
      }
      val cols = candidates.filterNot(physBad.contains)
      val stats = good.map { case (f, schema, blocks, rows) =>
        val entries = scala.collection.mutable.Map[String, (String, String)](
          VersionedTable.RowsKey -> (rows.toString, rows.toString))
        cols.foreach { c =>
          schema.find(_.name == c).foreach { field =>
            val chunks = blocks.flatMap(
              _.getColumns.asScala.find(chunkIsCol(_, c)))
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
      Some((stats, scanCols0 ++ physBad, badFiles))
    } catch { case NonFatal(_) => None }

  /** Exact per-file row counts from footer block metadata — the cheap
    * half of the bloom builder's two passes (its pass 1 was a full
    * groupBy-file count job over just-written bytes). None on any read
    * trouble → caller falls back to the scan count (the bloom sizing
    * consumer needs EVERY file's count, so a partial answer is no
    * answer; the fallback is logged so the regression is visible). */
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
    } catch {
      case NonFatal(e) =>
        log.warn(s"footer row counts unreadable for $table " +
          s"(falling back to the scan count): $e")
        None
    }

  /** Render one chunk's (min, max) exactly as the scan path's
    * CAST(v AS STRING) (micros for TIMESTAMP; scale-aware plain/
    * scientific BigDecimal rendering for DECIMAL). None = unsupported
    * shape, omit the column for this file. */
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
        case (d: DecimalType, x) =>
          // unscaled value per physical encoding (physicalOk pinned the
          // annotation's scale to the Spark type's); toPlainString is
          // what Spark 4's decimal→string cast renders — spec-probed:
          // unscaled -3 at scale 8 casts to "-0.00000003", NOT the
          // java-toString scientific "-3E-8"
          val unscaled: Option[java.math.BigInteger] = x match {
            case i: java.lang.Integer =>
              Some(java.math.BigInteger.valueOf(i.longValue))
            case l: java.lang.Long =>
              Some(java.math.BigInteger.valueOf(l.longValue))
            case b: org.apache.parquet.io.api.Binary =>
              // big-endian two's complement (parquet DECIMAL binary form)
              val bytes = b.getBytes
              if (bytes.isEmpty) None
              else Some(new java.math.BigInteger(bytes))
            case _ => None
          }
          unscaled.map(u =>
            new java.math.BigDecimal(u, d.scale).toPlainString)
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
      case _: DecimalType =>
        new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
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
