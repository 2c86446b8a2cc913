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
    // readChangeFeed=true (Delta's option of the same name): serve
    // CHANGE ENVELOPES instead of rows — appends as `insert` rows,
    // MERGE/DELETE/CDC-apply commits from their write-time change-data
    // sidecars ([[VersionedTable.CdfProp]] must have been set when they
    // were written), each stamped with `_change_type` /
    // `_commit_version` / `_commit_timestamp`. The initial snapshot
    // arrives as inserts at its version. Updates and deletes thus
    // BECOME streamable — the append-only refusal below applies to the
    // plain-row mode only.
    readChangeFeed: Boolean,
    override val schema: StructType) extends Source {

  /** Data-column schema (the bound schema minus the three envelope
    * metadata columns in change-feed mode). */
  private val dataSchema: StructType =
    if (!readChangeFeed) schema
    else StructType(schema.fields.filterNot(f =>
      VersionedStreamSource.MetaCols.contains(f.name)))

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
      // ANY blind add-only commit serves as appends — including a
      // pure-insert MERGE (no hits) and a CDC apply of inserts: what
      // matters is the ACTIONS (no removes, no DV change), not the op
      // name. RESTORE is the exception: its adds are files a tailing
      // reader already served — re-serving them double-counts.
      case op if pureAdd && op != "restore" => c.add
      case _ if skipChangeCommits => Nil
      case op => throw new IllegalStateException(
        s"streaming read of $table hit version ${c.version} ('$op'), " +
          "which changed existing rows — a tail of appends cannot " +
          "express that. Restart from a fresh checkpoint to reprocess " +
          "the table, or set skipChangeCommits=true to skip " +
          "data-changing commits")
    }
  }

  /** Files commit `c` contributes to a batch in the ACTIVE mode —
    * change-data sidecars + synthesized-insert adds in change-feed mode,
    * plain adds otherwise. */
  private def servedFiles(c: VT.Commit): Int =
    if (readChangeFeed)
      scala.util.Try(VT.changeFilesOf(table, c).fold(0)(_._1.size))
        .getOrElse(0)
    else scala.util.Try(addsOf(c).size).getOrElse(0)

  /** Rate-limited end version for a batch starting after
    * `fromExclusive`: admit whole versions until the NEXT one would push
    * the cumulative served-file count past the cap (never splitting a
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
          val k = servedFiles(c)
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

  /** `_change_type` / `_commit_version` / `_commit_timestamp` stamps on
    * a change-feed batch slice. `insertType` tags sidecar-less adds. */
  private def stamped(df: DataFrame, insertType: Boolean, version: Long,
      ts: Long): DataFrame = {
    val typed =
      if (insertType)
        df.withColumn("_change_type",
          org.apache.spark.sql.functions.lit("insert"))
      else df
    typed
      .withColumn("_commit_version",
        org.apache.spark.sql.functions.lit(version))
      .withColumn("_commit_timestamp",
        org.apache.spark.sql.functions.timestamp_millis(
          org.apache.spark.sql.functions.lit(ts)))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = off(end)
    lastEnd = Some(lastEnd.fold(endV)(math.max(_, endV)))
    start.map(off).orElse(startExclusive) match {
      case None =>
        val (files, stats, _, dv) = VT.snapshotParts(table, endV)
        val base = VT.streamingScan(spark, table, files, stats,
          dataSchema, dv)
        if (!readChangeFeed) base
        // change-feed bootstrap: the whole current state as inserts,
        // attributed to the snapshot version (Delta's CDF-stream shape)
        else stamped(base, insertType = true, endV,
          VT.commitsIn(table, endV - 1, endV).headOption
            .fold(0L)(_.ts))
      case Some(f) =>
        val commits = VT.commitsIn(table, f, endV)
        if (!readChangeFeed) {
          val adds = commits.flatMap(addsOf)
          // per-file stats come from the ADDING commit, not the end
          // state: a later (skipped) compaction may have already retired
          // these files from the live state, but their bytes are still
          // on disk until vacuum and their manifest stats still prune
          val stats = commits.foldLeft(Map.empty: VT.FileStats)(_ ++ _.stats)
          VT.streamingScan(spark, table, adds, stats, schema, Nil)
        } else {
          // change-feed tail: one envelope slice per commit (versions
          // stamp differently, so slices don't merge into one scan);
          // sidecar files carry `_change_type` themselves, adds get it
          // synthesized. A data-changing commit with no sidecar throws
          // (skipChangeCommits swallows it, as in plain-row mode).
          val cdfSchema = StructType(dataSchema.fields :+
            org.apache.spark.sql.types.StructField("_change_type",
              org.apache.spark.sql.types.StringType))
          val parts = commits.flatMap { c =>
            val cf =
              if (skipChangeCommits)
                scala.util.Try(VT.changeFilesOf(table, c))
                  .getOrElse(None)
              else VT.changeFilesOf(table, c)
            cf.collect { case (files, synth) if files.nonEmpty =>
              val base = VT.streamingScan(spark, table, files, c.stats,
                if (synth) dataSchema else cdfSchema, Nil)
              stamped(base, insertType = synth, c.version, c.ts)
            }
          }
          parts.reduceOption(_.unionByName(_)).getOrElse(
            org.apache.spark.sql.graftshim.GraftStreamingShim
              .emptyStreaming(spark, schema))
        }
    }
  }

  /** Seed the admission cursor from the engine: on a checkpoint
    * restart whose last batch already committed, `MicroBatchExecution`
    * calls `commit(restoredOffset)` before the first `getOffset` — and
    * without this seed the first getOffset would take the
    * initial-snapshot branch and hand the ENTIRE accumulated backlog to
    * one batch, bypassing `maxFilesPerTrigger` exactly when its pacing
    * matters most. (When the last batch was uncommitted, the getBatch
    * replay seeds the cursor instead.) */
  override def commit(end: Offset): Unit = {
    val v = off(end)
    lastEnd = Some(lastEnd.fold(v)(math.max(_, v)))
  }

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

  private def cdf(params: Map[String, String]): Boolean =
    params.get("readChangeFeed").exists(_.toBoolean)

  private def logSchema(params: Map[String, String]): StructType = {
    val t = tablePath(params)
    val v = VT.latestVersion(t).getOrElse(
      throw new IllegalArgumentException(
        s"no versioned table at $t — the stream's schema comes from " +
          "the commit log, so the table must exist before readStream " +
          "binds"))
    val data = VT.snapshotParts(t, v)._3
    if (!cdf(params)) data
    else StructType(data.fields ++ VersionedStreamSource.MetaFields)
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
      cdf(parameters),
      schema.getOrElse(logSchema(parameters)))
  }
}

object VersionedStreamSource {
  /** Envelope metadata columns of change-feed mode (Delta CDF's). */
  val MetaCols: Set[String] =
    Set("_change_type", "_commit_version", "_commit_timestamp")

  private[io] val MetaFields: Seq[org.apache.spark.sql.types.StructField] =
    Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_commit_timestamp",
        org.apache.spark.sql.types.TimestampType))
}
