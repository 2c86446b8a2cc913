package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{VersionedTable => VT}

/** Read-side CDC consumption of a [[VersionedTable]] — the "stream from
  * the table" half of the log contract ([[VersionedTable.versionedSink]]
  * is the write half; the reference gets both from Delta's
  * `readChangeFeed` / `txnAppId` machinery,
  * `/root/reference/src/utils/spark_utils.py:285-344` context).
  *
  * A consumer owns a CURSOR — the last source version it fully
  * processed — persisted in its checkpoint dir. Each [[processChanges]]
  * cycle reads the cursor, diffs cursor→latest through
  * [[VersionedTable.changeFeed]] (or takes the bootstrap snapshot on
  * first contact), hands the change frame to the caller, and advances
  * the cursor ATOMICALLY only after the handler returns. Crash anywhere
  * ⇒ the next cycle replays the same version range: the handler runs
  * AT-LEAST-ONCE, and becomes exactly-once end-to-end when its effect
  * is guarded by the destination's (`txnApp`, `txnId`) contract — which
  * is precisely what [[mirror]] and [[maintainSumState]] do, keying the
  * destination commit on the source version range just processed.
  *
  * Scale shape: a cycle's cost is one manifest-diff change feed (keyed
  * shuffle of the two snapshots — no log replay of intermediate
  * versions) plus the handler; the cursor file is O(bytes). Polling
  * this in a loop gives incremental micro-batch semantics without a
  * long-lived streaming query — the Trigger.AvailableNow idiom for
  * log-structured sources.
  */
object ChangeConsumer {

  private def cursorFile(checkpointDir: String) =
    Paths.get(checkpointDir, "cursor")

  // the IN-FLIGHT range's end version, pinned BEFORE the handler runs:
  // a crash between the handler's destination commit and the cursor
  // advance must replay the EXACT same (from, to] range — recomputing
  // `to` from the (possibly advanced) log would extend the range, the
  // destination's (txnApp, txnId = to) guard would no longer match, and
  // the handler would double-apply the already-committed prefix
  private def pendingFile(checkpointDir: String) =
    Paths.get(checkpointDir, "pending")

  private def pending(checkpointDir: String): Option[Long] = {
    val p = pendingFile(checkpointDir)
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .trim.toLong)
    else None
  }

  private def pin(checkpointDir: String, v: Long): Unit = {
    Files.createDirectories(Paths.get(checkpointDir))
    // tmp name unique PER WRITER: two consumers racing the same
    // checkpoint legally pin the same version, and a shared tmp name
    // would let one racer move the other's file out from under it
    val tmp = Paths.get(checkpointDir,
      s".pending-tmp-$v-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pendingFile(checkpointDir),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Last fully-processed source version, if any cycle ever completed. */
  def cursor(checkpointDir: String): Option[Long] = {
    val p = cursorFile(checkpointDir)
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .trim.toLong)
    else None
  }

  /** Atomic cursor advance: write-temp + ATOMIC_MOVE, the same publish
    * discipline as the commit log — a crash mid-advance leaves the OLD
    * cursor intact (replay), never a torn file. */
  private def advance(checkpointDir: String, v: Long): Unit = {
    Files.createDirectories(Paths.get(checkpointDir))
    // per-writer tmp name, same rationale as [[pin]]: racing consumers
    // advancing to the same version must not steal each other's tmp
    val tmp = Paths.get(checkpointDir,
      s".cursor-tmp-$v-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, cursorFile(checkpointDir),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** One consumption cycle. Returns the processed (fromVersion, to)
    * range — `fromVersion = None` on the bootstrap cycle, where the
    * handler receives the full `to`-snapshot shaped as a change feed
    * (every row `_change_type = 'insert'`) — or None when the consumer
    * is already caught up (no handler call, no cursor write).
    *
    * The handler runs at-least-once per range (see object doc); make
    * its effect idempotent or txn-guard it on the destination. */
  def processChanges(spark: SparkSession, table: String, keys: Seq[String],
      checkpointDir: String, includePreimage: Boolean = true)(
      fn: (DataFrame, Option[Long], Long) => Unit): Option[(Option[Long], Long)] = {
    val from = cursor(checkpointDir)
    // a crashed cycle left its pinned end version: REPLAY that exact
    // range (the destination's txn guard then dedupes), never a fresh
    // (and possibly longer) one — see [[pendingFile]]
    val to = pending(checkpointDir).filterNot(p => from.contains(p))
      .getOrElse(VT.latestVersion(table).getOrElse(return None))
    if (from.contains(to)) return None
    from.foreach { f =>
      require(f <= to, s"cursor $f is beyond $table's latest version $to " +
        "(checkpoint from a different table?)")
    }
    pin(checkpointDir, to)
    val feed = from match {
      case Some(f) =>
        VT.changeFeed(spark, table, f, to, keys, includePreimage)
      case None =>
        VT.snapshot(spark, table, Some(to))
          .withColumn("_change_type", lit("insert"))
    }
    fn(feed, from, to)
    advance(checkpointDir, to)
    Some((from, to))
  }

  /** Continuous consumption: poll the source log and run
    * [[processChanges]] cycles until `maxCycles` ranges have been
    * processed or `idleStop` consecutive polls find nothing new (0 =
    * never stop on idle — the daemon form; pair with a finite
    * `maxCycles` in tests). Returns the number of cycles processed.
    * This is deliberately a plain driver loop, not a streaming query:
    * the commit log is its own reliable cursor-addressable source, so
    * micro-batch semantics need no executor-side state — the
    * Trigger.AvailableNow idiom generalized to a poll interval. */
  def follow(spark: SparkSession, table: String, keys: Seq[String],
      checkpointDir: String, pollMs: Long = 1000L, maxCycles: Int = 1,
      idleStop: Int = 1, includePreimage: Boolean = true)(
      fn: (DataFrame, Option[Long], Long) => Unit): Int = {
    require(maxCycles > 0, "maxCycles must be positive")
    var cycles = 0
    var idle = 0
    while (cycles < maxCycles && (idleStop == 0 || idle < idleStop)) {
      processChanges(spark, table, keys, checkpointDir,
        includePreimage)(fn) match {
        case Some(_) => cycles += 1; idle = 0
        case None =>
          idle += 1
          if (cycles < maxCycles && (idleStop == 0 || idle < idleStop))
            Thread.sleep(pollMs)
      }
    }
    cycles
  }

  /** Keep `dst` a row-level replica of `src` (same keys ⇒ same rows),
    * one [[VersionedTable.applyChanges]] commit per cycle — file-
    * granular on the destination, exactly-once under replay (the dst
    * commit is keyed on the processed source version). Returns the dst
    * commit, or None when already caught up. */
  def mirror(spark: SparkSession, src: String, dst: String,
      keys: Seq[String], checkpointDir: String,
      statsFor: Seq[String] = Nil): Option[VT.Commit] = {
    var out: Option[VT.Commit] = None
    processChanges(spark, src, keys, checkpointDir) { (feed, _, to) =>
      // always record key stats on what we write: they are what lets the
      // NEXT cycle's applyChanges prune its hit-file scan by manifest
      out = Some(VT.applyChanges(spark, feed, dst, keys,
        txnApp = s"mirror:$dst", txnId = to,
        statsFor = (statsFor ++ keys).distinct))
    }
    out
  }

  /** Maintain a grouped sum/count state table
    * ([[graft.ops.IncrementalAgg.sumState]] shape) over `src` — the
    * incremental-materialized-view loop: bootstrap aggregates the full
    * snapshot ONCE; every later cycle folds only the change feed into
    * the existing state (updates retract preimages, deletes retract
    * rows), an O(changes) refresh regardless of table size. The state
    * overwrite is txn-keyed on the processed source version, so a
    * crashed-and-replayed cycle never double-folds a delta. Exact
    * decimal algebra ⇒ the maintained state is bit-identical to a full
    * recompute (the q131/q153 invariant, asserted in
    * VersionedTableSpec). */
  def maintainSumState(spark: SparkSession, src: String, stateTable: String,
      rowKeys: Seq[String], groupKeys: Seq[String], valueCol: String,
      checkpointDir: String): Option[VT.Commit] = {
    var out: Option[VT.Commit] = None
    processChanges(spark, src, rowKeys, checkpointDir) { (feed, from, to) =>
      val newState = from match {
        case None =>
          graft.ops.IncrementalAgg.sumState(
            feed.drop("_change_type"), groupKeys, valueCol)
        case Some(_) =>
          graft.ops.IncrementalAgg.applyChangeFeed(
            VT.snapshot(spark, stateTable), feed, groupKeys, valueCol)
      }
      out = Some(VT.overwrite(spark, newState, stateTable,
        txn = Some((s"maintain:$stateTable", to))))
    }
    out
  }

  /** Adapt an EXTERNAL CDC stream (the Debezium/DMS envelope shape:
    * `{"op": "c"|"r"|"u"|"d", "before": {...}, "after": {...}}` as a
    * JSON string column) into this engine's change-feed schema, so
    * third-party database changes flow into the same IVM machinery the
    * native log feeds ([[graft.ops.IncrementalAgg.applyChangeFeed]],
    * [[VersionedTable.applyChanges]]): creates/reads emit the after
    * image as `insert`, updates emit `update_preimage` + postimage,
    * deletes emit the before image as `delete`. One narrow pass — parse,
    * per-row channel array, explode — no shuffle.
    *
    * Permissive: malformed JSON and unknown ops contribute nothing
    * (PERMISSIVE from_json yields an all-null struct, so the channel
    * array is empty). No valid envelope lacks an op — audit rejects
    * separately with
    * `df.where(from_json(col(c), envelopeSchema(s)).getField("op").isNull)`. */
  def fromCdcEnvelope(df: DataFrame, envelopeCol: String,
      rowSchema: org.apache.spark.sql.types.StructType): DataFrame = {
    import org.apache.spark.sql.Column
    val parsed = df.select(
      from_json(col(envelopeCol), envelopeSchema(rowSchema)).as("__e"))
    def entry(row: Column, tpe: String): Column =
      struct(row.as("row"), lit(tpe).as("t"))
    val channels =
      when(col("__e.op").isin("c", "r"),
        array(entry(col("__e.after"), "insert")))
      .when(col("__e.op") === "u",
        array(entry(col("__e.before"), "update_preimage"),
          entry(col("__e.after"), "update_postimage")))
      .when(col("__e.op") === "d",
        array(entry(col("__e.before"), "delete")))
      .otherwise(array())
    parsed.select(explode(channels).as("__x"))
      .select(col("__x.row.*"), col("__x.t").as("_change_type"))
  }

  /** The envelope struct [[fromCdcEnvelope]] parses — exposed so callers
    * can screen corrupt records with the same schema. */
  def envelopeSchema(rowSchema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("op",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("before", rowSchema),
      org.apache.spark.sql.types.StructField("after", rowSchema),
      org.apache.spark.sql.types.StructField("ts_ms",
        org.apache.spark.sql.types.LongType)))
}
