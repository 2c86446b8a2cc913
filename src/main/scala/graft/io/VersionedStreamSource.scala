package graft.io

import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}

import graft.io.{VersionedTable => VT}

/** Structured Streaming over a [[VersionedTable]] commit log — the
  * "stream FROM the table" contract Delta calls a streaming source
  * (reference gets it from `spark.readStream.format("delta")`,
  * `/root/reference/src/utils/spark_utils.py:285-344` context);
  * [[VersionedTable.versionedSink]] is the write half,
  * [[ChangeConsumer]] the driver-loop CDC half.
  *
  * ```
  * spark.readStream.format("graft-versioned").load(tableDir)
  *   .groupBy(...).agg(...)
  *   .writeStream.option("checkpointLocation", ck).start()
  * ```
  *
  * Semantics (Delta's, deliberately):
  *  - **Offsets are commit versions.** Batch (a, b] serves exactly the
  *    data files added by versions a+1..b — deterministic replay from
  *    the immutable log, so checkpoint restart is exactly-once with any
  *    idempotent/transactional sink. The initial batch (no
  *    `startingVersion`) is the FULL snapshot at the version current
  *    when the query first plans, deletion vectors subtracted; the tail
  *    then picks up from there.
  *  - **Append commits only.** `optimize` rewrites (compact / Z-ORDER)
  *    move rows between files without changing them — skipped silently,
  *    like Delta's `dataChange = false` actions. Commits that change
  *    existing rows (MERGE, DELETE, RESTORE, overwrite, DV deletes)
  *    fail the stream by default — serving their adds would double-count
  *    and their removes cannot be expressed as appends; opt into
  *    `skipChangeCommits=true` to skip them wholesale (downstream then
  *    sees inserts-only, Delta's option of the same name).
  *  - **Frozen schema.** The source schema is the table's scan schema at
  *    query bind; files from before a column read nulls, columns added
  *    after bind surface on restart. (Delta restarts the stream on
  *    schema change; here the running query just keeps its bound
  *    schema.)
  *
  * Options: `startingVersion` (long — serve from that version as
  * appends, no initial snapshot; or `latest` — only commits after query
  * start), `skipChangeCommits` (bool), `maxFilesPerTrigger` (int — admit
  * versions per batch until their cumulative add-file count would exceed
  * the cap; at least one version per batch, so a single huge commit
  * still fits).
  *
  * Scale shape: `getOffset` is a directory listing + O(new commits)
  * manifest reads, zero data I/O; each batch plans its files through
  * [[GraftFileIndex]], so pushed-down filters still prune per-file
  * min/max stats INSIDE every micro-batch — a filtered stream over a
  * 100 TB table reads only matching files of each new commit. The one
  * retention caveat (also Delta's): [[VersionedTable.vacuum]] ages out
  * files a long-stalled checkpoint may still need; resume within the
  * retention window.
  */
final class VersionedStreamSource(
    spark: SparkSession,
    table: String,
    startExclusive: Option[Long],
    skipChangeCommits: Boolean,
    maxFilesPerTrigger: Option[Int],
    override val schema: StructType) extends Source {

  /** Highest version handed out so far. Purely an admission cursor —
    * correctness lives in the engine's offset log (restart re-seeds this
    * through the `getBatch` replay of any uncommitted range). */
  @volatile private var lastEnd: Option[Long] = None

  private def off(o: Offset): Long = o.json.trim.toLong

  /** The data files version `c` APPENDS, Nil for commits a tailing
    * reader ignores, or throw for data-changing commits (unless
    * `skipChangeCommits`). */
  private def addsOf(c: VT.Commit): Seq[String] = {
    val pureAdd = c.remove.isEmpty && c.dvAdd.isEmpty && c.dvRemove.isEmpty
    c.op match {
      case _ if c.add.isEmpty && pureAdd => Nil // metadata-only commit
      case "optimize" => Nil // rewrite without data change
      case "append" if pureAdd => c.add
      case "apply_changes" if pureAdd => c.add // CDC apply, inserts only
      case _ if skipChangeCommits => Nil
      case op => throw new IllegalStateException(
        s"streaming read of $table hit version ${c.version} ('$op'), " +
          "which changed existing rows — a tail of appends cannot " +
          "express that. Restart from a fresh checkpoint to reprocess " +
          "the table, or set skipChangeCommits=true to skip " +
          "data-changing commits")
    }
  }

  /** Rate-limited end version for a batch starting after
    * `fromExclusive`: admit whole versions until the NEXT one would push
    * the cumulative add-file count past the cap (never splitting a
    * commit, always admitting at least one). Admission must not throw on
    * a change commit — it is admitted and [[getBatch]] raises the
    * user-facing error. */
  private def admit(fromExclusive: Long, latest: Long): Long =
    maxFilesPerTrigger match {
      case None => latest
      case Some(cap) =>
        var end = fromExclusive
        var n = 0
        val it = VT.commitsIn(table, fromExclusive, latest).iterator
        var open = true
        while (it.hasNext && open) {
          val c = it.next()
          val k = scala.util.Try(addsOf(c).size).getOrElse(0)
          if (end > fromExclusive && n + k > cap) open = false
          else { end = c.version; n += k }
        }
        end
    }

  override def getOffset: Option[Offset] = {
    val latest = VT.latestVersion(table).getOrElse(return None)
    lastEnd.orElse(startExclusive) match {
      case None =>
        // initial snapshot: one batch for the whole current state (the
        // cap applies to the tail only, as in Delta)
        lastEnd = Some(latest)
        Some(LongOffset(latest))
      case Some(f) if f >= latest => lastEnd.map(LongOffset(_))
      case Some(f) =>
        val end = admit(f, latest)
        lastEnd = Some(end)
        Some(LongOffset(end))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = off(end)
    lastEnd = Some(lastEnd.fold(endV)(math.max(_, endV)))
    start.map(off).orElse(startExclusive) match {
      case None =>
        val (files, stats, _, dv) = VT.snapshotParts(table, endV)
        VT.streamingScan(spark, table, files, stats, schema, dv)
      case Some(f) =>
        val commits = VT.commitsIn(table, f, endV)
        val adds = commits.flatMap(addsOf)
        // per-file stats come from the ADDING commit, not the end state:
        // a later (skipped) compaction may have already retired these
        // files from the live state, but their bytes are still on disk
        // until vacuum and their manifest stats still prune
        val stats = commits.foldLeft(Map.empty: VT.FileStats)(_ ++ _.stats)
        VT.streamingScan(spark, table, adds, stats, schema, Nil)
    }
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"VersionedStreamSource[$table]"
}

/** `format("graft-versioned")` registration (see
  * `META-INF/services/org.apache.spark.sql.sources.DataSourceRegister`).
  * The path option / `.load(path)` names the table directory. */
final class VersionedStreamSourceProvider
    extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-versioned"

  private def tablePath(params: Map[String, String]): String =
    params.getOrElse("path", throw new IllegalArgumentException(
      "graft-versioned source needs the table directory: " +
        ".load(<dir>) or .option(\"path\", <dir>)"))

  private def logSchema(params: Map[String, String]): StructType = {
    val t = tablePath(params)
    val v = VT.latestVersion(t).getOrElse(
      throw new IllegalArgumentException(
        s"no versioned table at $t — the stream's schema comes from " +
          "the commit log, so the table must exist before readStream " +
          "binds"))
    VT.snapshotParts(t, v)._3
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty, "graft-versioned derives its schema from " +
      "the table log; a user-specified schema is not supported")
    (shortName(), logSchema(parameters))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val t = tablePath(parameters)
    val startExclusive: Option[Long] =
      parameters.get("startingVersion").map {
        case "latest" => VT.latestVersion(t).getOrElse(-1L)
        // serve changes FROM version s (inclusive), Delta semantics
        case s => s.toLong - 1
      }
    new VersionedStreamSource(sqlContext.sparkSession, t, startExclusive,
      parameters.get("skipChangeCommits").exists(_.toBoolean),
      parameters.get("maxFilesPerTrigger").map(_.toInt),
      schema.getOrElse(logSchema(parameters)))
  }
}
