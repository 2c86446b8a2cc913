package graft.io

import java.nio.file.{Files, Path}
import java.util.UUID

/** Durable [[ObjectStore]] over a plain directory — the second reference
  * backend after [[InMemoryObjectStore]], and a deployable option in its
  * own right for shared-filesystem clusters (NFS/EFS/Lustre/local) that
  * want multi-writer [[VersionedTable]] arbitration through the
  * object-store code path without any cloud SDK. It also closes the gap
  * the in-memory store cannot: state survives the process, so a SECOND
  * process (or a re-opened store) observes exactly what the first one
  * committed — the cross-process story the arbiter exists for.
  *
  * Layout: one subdirectory per key (URL-encoded, SHA-256-folded when too
  * long for a path component); every write is an immutable version file
  * named by its sequence number, exposed atomically via hard link
  * (write-to-tmp, then `Files.createLink` — the same O_EXCL primitive
  * [[CommitArbiter.PosixLink]] builds on, here packaged behind the
  * 3-method store trait). The etag IS the sequence number:
  *
  *  - `putIfAbsent`  = link at seq 0 — `FileAlreadyExistsException` is
  *    the 412 (lost race), never an error;
  *  - `putIfMatch(s)` = link at seq s+1 — if ANY writer already advanced
  *    past s the link target exists and the CAS correctly fails; two
  *    racers CAS-ing from the same etag contend on the same link and
  *    exactly one wins;
  *  - `get` = read the highest sequence present (version files are
  *    immutable once linked, so the read is never torn).
  *
  * Linearizable per key wherever hard-link creation is atomic (POSIX
  * local filesystems, NFS). No fault injection here — this backend's
  * faults are real I/O errors, and the arbiter's taxonomy is proven
  * against the injectable in-memory store; unexpected I/O errors
  * propagate untouched (the "configuration error" class of the trait's
  * scaladoc).
  */
final class FileObjectStore(root: Path) extends ObjectStore {
  import ObjectStore._

  Files.createDirectories(root)

  /** One directory per key. URL-encoding keeps arbitrary keys (absolute
    * slot paths, pointer names) inside a single path component; keys
    * whose encoding would overflow common 255-byte component limits fold
    * to their SHA-256 instead (collision-safe, just no longer
    * eyeball-readable in `ls`). */
  private def keyDir(key: String): Path = {
    val enc = java.net.URLEncoder.encode(key, "UTF-8")
    val name =
      if (enc.length <= 200) enc
      else {
        val d = java.security.MessageDigest.getInstance("SHA-256")
        "sha256-" + d.digest(key.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
      }
    root.resolve(name)
  }

  /** Highest committed sequence in a key dir, or None. Tmp files are
    * non-numeric and skipped; listing is a point-in-time snapshot, which
    * is exactly the linearization the contract needs. */
  private def currentSeq(d: Path): Option[Long] = {
    if (!Files.isDirectory(d)) return None
    val s = Files.list(d)
    try {
      val it = s.iterator()
      var max = -1L
      while (it.hasNext) {
        val n = it.next().getFileName.toString
        try { val v = n.toLong; if (v > max) max = v }
        catch { case _: NumberFormatException => () }
      }
      if (max < 0) None else Some(max)
    } finally s.close()
  }

  /** Write-tmp + hard-link at `seq`: the version file appears complete
    * or not at all, and exactly one linker wins. */
  private def tryLink(d: Path, seq: Long, bytes: Array[Byte]): PutOutcome = {
    Files.createDirectories(d)
    val tmp = d.resolve(s".tmp-${UUID.randomUUID()}")
    try {
      Files.write(tmp, bytes)
      try {
        Files.createLink(d.resolve(seq.toString), tmp)
        Created(seq.toString)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => PreconditionFailed
      }
    } finally { Files.deleteIfExists(tmp); () }
  }

  override def putIfAbsent(key: String, bytes: Array[Byte]): PutOutcome = {
    val d = keyDir(key)
    // fast path only — the link below is the real arbitration
    if (currentSeq(d).isDefined) PreconditionFailed
    else tryLink(d, 0L, bytes)
  }

  override def putIfMatch(key: String, bytes: Array[Byte],
      etag: String): PutOutcome = {
    val d = keyDir(key)
    val want = try etag.toLong catch {
      // etags originate from this store and are always numeric; a
      // foreign tag can never match the current version
      case _: NumberFormatException => return PreconditionFailed
    }
    currentSeq(d) match {
      case Some(cur) if cur == want =>
        val out = tryLink(d, want + 1, bytes)
        // bound the version history: a long-lived pointer object CAS-ed
        // millions of times (a latest-version hint updated per commit)
        // would otherwise grow its key dir without limit and every
        // currentSeq listing with it. Keep a trailing window of 8
        // superseded versions — wide enough that a reader that listed
        // max=s can still open s unless NINE further CAS-es landed
        // inside its list-to-read window (and get() re-lists if that
        // ever happens) — and delete older ones by LISTING the dir, not
        // by walking down until the first miss: a walk-down strands
        // everything below a gap (a pruner killed mid-walk, or history
        // accumulated before pruning existed) forever. The listing is
        // the same O(dir) cost currentSeq already paid this call, and
        // racing pruners just both succeed at idempotent deletes.
        out match {
          case Created(_) =>
            val cut = want + 1 - 9
            if (cut >= 0) {
              val s = Files.list(d)
              try {
                val it = s.iterator()
                while (it.hasNext) {
                  val p = it.next()
                  val keep = try p.getFileName.toString.toLong > cut
                  catch { case _: NumberFormatException => true }
                  if (!keep) Files.deleteIfExists(p)
                }
              } finally s.close()
            }
          case _ => ()
        }
        out
      case _ => PreconditionFailed // absent key, stale or future etag
    }
  }

  override def get(key: String): Option[Blob] = {
    val d = keyDir(key)
    // retry on a pruned-underfoot version: between our listing and the
    // read, 9+ CAS-es must land for the listed max to be deleted —
    // re-list and read the fresher current. Bounded at 3 attempts, then
    // surface the documented TRANSIENT class (it is one: the very next
    // read succeeds unless the writer keeps outrunning every
    // list-to-read window) — never a raw NIO exception the arbiter's
    // taxonomy doesn't know (review catch, r18: getWithRetry handles
    // TransientStoreException; a naked NoSuchFileException would crash
    // ambiguous adjudication instead of retrying).
    def read(): Option[Blob] = currentSeq(d).map { seq =>
      Blob(Files.readAllBytes(d.resolve(seq.toString)), seq.toString)
    }
    var left = 3
    while (true) {
      try return read() catch {
        case e: java.nio.file.NoSuchFileException =>
          left -= 1
          if (left <= 0) throw new TransientStoreException(
            s"version pruned underfoot 3x on $key (${e.getMessage})")
      }
    }
    None // unreachable
  }
}
