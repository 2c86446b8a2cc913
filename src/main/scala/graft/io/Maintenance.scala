package graft.io

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Table maintenance (SURVEY §4): the Delta OPTIMIZE / ZORDER / VACUUM
  * surface (reference `src/utils/spark_utils.py:519-588`) re-expressed for
  * plain parquet.
  *
  *  - compact: small-file compaction — read, coalesce to a target file
  *    count, rewrite. At 100 TB this is what keeps scan task counts sane
  *    after many small streaming/batch appends.
  *  - clusterBy (Z-ORDER approximation): range-repartition on the clustering
  *    keys + sort within partitions, so parquet row-group min/max footers
  *    become selective and data-skipping prunes on those columns.
  *  - vacuum: GC of `.retired-*` / `.staging-*` directories left by
  *    Upsert's atomic swap (the Delta time-travel retention analogue;
  *    reference default 168 h, spark_utils.py:562).
  */
object Maintenance {

  /** OPTIMIZE-style compaction: rewrite `path` into `targetFiles` files.
    * Partition-LAYOUT-PRESERVING: see [[readPreservingLayout]] — a naive
    * read+rewrite would flatten `col=value` directories into data columns
    * with partition-type inference applied, silently corrupting string
    * partition keys ("007" → int 7) and destroying the pruning layout. */
  def compact(spark: SparkSession, path: String, targetFiles: Int,
      staleLockMs: Long = 60L * 60 * 1000): Unit =
    // the SAME writer lock as upsertParquet: maintenance is a writer.
    // Unlocked, a compact that read the table before a concurrent
    // upsert's swap and swapped AFTER it would silently replace the
    // merged table with compacted PRE-merge data — a lost update on the
    // scheduled-maintenance-vs-ingest race every deployment runs.
    Upsert.withWriterLock(path, staleLockMs) {
      recoverOrphanedSwap(path)
      val staging = s"$path.staging-compact"
      val (df, parts) = readPreservingLayout(spark, path)
      val w = df.coalesce(targetFiles).write.mode("overwrite")
      (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(staging)
      swap(path, staging)
    }

  /** ZORDER-approximation: cluster rows so min/max stats prune on `cols`.
    * A true Z-curve interleaves bits of all columns; lexicographic
    * range-partition + local sort gives the same pruning on the leading
    * column and good pruning on followers, with zero custom code.
    * Partition-layout-preserving like [[compact]]. */
  def clusterBy(spark: SparkSession, path: String, cols: Seq[String],
      targetFiles: Int, staleLockMs: Long = 60L * 60 * 1000): Unit =
    // same lost-update race as [[compact]] — serialize under the lock
    Upsert.withWriterLock(path, staleLockMs) {
      recoverOrphanedSwap(path)
      val staging = s"$path.staging-cluster"
      val (df, parts) = readPreservingLayout(spark, path)
      val w = df
        .repartitionByRange(targetFiles, cols.map(col): _*)
        .sortWithinPartitions(cols.map(col): _*)
        .write.mode("overwrite")
      (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(staging)
      swap(path, staging)
    }

  /** Read a parquet table so a rewrite round-trips its partition layout
    * EXACTLY: partition columns are discovered from the `col=value`
    * directory chain and read with type inference OFF, so their values
    * stay the literal directory strings. Writing back with the same
    * `partitionBy` re-emits identical directory names — partition values
    * never pass through a lossy type round-trip ("007" → 7 → "7"), and
    * since partition columns live in directory names, not data files, the
    * on-disk schema is unchanged. Returns (frame, partition columns). */
  private[io] def readPreservingLayout(
      spark: SparkSession, path: String): (org.apache.spark.sql.DataFrame, Seq[String]) = {
    val parts = partitionColumnsOf(path)
    if (parts.isEmpty) (spark.read.parquet(path), Nil)
    else (readInferenceOff(spark, path), parts)
  }

  /** Read parquet with partition-type inference OFF: partition values
    * come back as the literal directory strings instead of inferred
    * types ("007" stays "007", never int 7). The one shared copy of the
    * conf save/set/restore dance — the DataFrame resolves its partition
    * schema eagerly, so restoring the conf immediately is safe. Used by
    * [[readPreservingLayout]] and [[Upsert.upsertParquet]]. */
  private[io] def readInferenceOff(spark: SparkSession,
      path: String): org.apache.spark.sql.DataFrame = {
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val prev = spark.conf.get(inferKey)
    try { spark.conf.set(inferKey, "false"); spark.read.parquet(path) }
    finally spark.conf.set(inferKey, prev)
  }

  /** Partition columns of a parquet directory, from the first
    * `name=value` directory chain (Hive layout). */
  private[graft] def partitionColumnsOf(path: String): Seq[String] = {
    def firstPartDir(p: Path): Option[Path] = {
      val l = Files.list(p)
      try {
        val it = l.iterator()
        var found: Option[Path] = None
        while (it.hasNext && found.isEmpty) {
          val c = it.next()
          val n = c.getFileName.toString
          if (Files.isDirectory(c) && n.contains("=") && !n.startsWith("."))
            found = Some(c)
        }
        found
      } finally l.close()
    }
    val cols = scala.collection.mutable.ArrayBuffer.empty[String]
    var cur = Paths.get(path)
    var next = firstPartDir(cur)
    while (next.isDefined) {
      cols += next.get.getFileName.toString.split("=", 2)(0)
      cur = next.get
      next = firstPartDir(cur)
    }
    cols.toSeq
  }

  /** Delete retired/staging siblings of `path` older than `retainMs`
    * (default 7 days, mirroring the reference's 168 h). Returns the number
    * of directories removed. NEVER deletes a retired version while `path`
    * itself is missing — that retired dir is the crash-recovery source
    * [[recoverOrphanedSwap]] restores from. */
  def vacuum(path: String, retainMs: Long = 168L * 3600 * 1000,
      nowMs: Long = System.currentTimeMillis()): Int = {
    val dir = Paths.get(path).toAbsolutePath
    val parent = dir.getParent
    if (parent == null || !Files.exists(parent)) return 0
    val pathAlive = Files.exists(dir)
    val prefixRetired = dir.getFileName.toString + ".retired-"
    val prefixStaging = dir.getFileName.toString + ".staging-"
    var removed = 0
    val listing = Files.list(parent)
    try {
      val it = listing.iterator()
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        val retireTs =
          if (n.startsWith(prefixRetired))
            scala.util.Try(n.stripPrefix(prefixRetired).toLong).toOption
          else None
        val stale = (retireTs.exists(ts => nowMs - ts > retainMs) &&
          pathAlive) ||
          (n.startsWith(prefixStaging) &&
            Files.getLastModifiedTime(p).toMillis < nowMs - retainMs)
        if (stale) { deleteRecursively(p); removed += 1 }
      }
    } finally listing.close() // directory streams hold an fd until closed
    removed
  }

  /** Crash recovery for the two-move swap: a kill between "retire the
    * live dir" and "promote staging" leaves `path` ABSENT with the full
    * pre-swap table sitting in the newest `.retired-*` sibling. Restore
    * it (the interrupted operation simply never happened; its orphaned
    * staging dir is garbage vacuum collects). Returns true when a
    * restore was performed. Call before any read-modify-write of the
    * table — [[graft.io.Upsert.upsertParquet]], [[compact]],
    * [[clusterBy]] all do. */
  def recoverOrphanedSwap(path: String): Boolean = {
    val dir = Paths.get(path).toAbsolutePath
    if (Files.exists(dir)) return false
    val parent = dir.getParent
    if (parent == null || !Files.exists(parent)) return false
    val prefix = dir.getFileName.toString + ".retired-"
    val listing = Files.list(parent)
    val newest =
      try {
        val it = listing.iterator()
        var best: Option[(Long, Path)] = None
        while (it.hasNext) {
          val p = it.next()
          val n = p.getFileName.toString
          if (n.startsWith(prefix))
            scala.util.Try(n.stripPrefix(prefix).toLong).toOption
              .foreach(ts => if (best.forall(_._1 < ts)) best = Some(ts -> p))
        }
        best
      } finally listing.close()
    newest.exists { case (_, p) =>
      Files.move(p, dir, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      true
    }
  }

  /** Two-move commit: retire the live dir, promote staging. NOT atomic
    * across the two renames — the crash window between them is healed by
    * [[recoverOrphanedSwap]] on the next table operation. */
  private[io] def swap(path: String, staging: String): Unit = {
    val dir = Paths.get(path)
    val retired = Paths.get(s"$path.retired-${System.currentTimeMillis()}")
    Files.move(dir, retired, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(staging), dir, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def deleteRecursively(p: Path): Unit = {
    val walk = Files.walk(p)
    try walk.sorted(Comparator.reverseOrder[Path]())
      .forEach(f => Files.delete(f))
    finally walk.close()
  }
}
