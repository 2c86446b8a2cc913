package graft.io

import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.UUID

/** Pluggable arbitration of [[VersionedTable]] commit-log slots — the one
  * place the table's multi-writer guarantee touches the filesystem's
  * consistency model.
  *
  * A versioned table's correctness rests on exactly one writer winning
  * each numbered log slot (`_graft_log/<v>.json`): whoever publishes
  * version v first owns it; every racer must observe a loss and re-derive.
  * HOW "first claim wins" is decided is a property of the storage system,
  * not of the table logic, so it lives behind this trait:
  *
  *  - POSIX filesystems (local disk, NFS with proper link semantics) give
  *    atomic create-exclusive via hard-link / `O_EXCL` — the default
  *    [[CommitArbiter.PosixLink]] below.
  *  - Object stores (S3, GCS, ABFS) have NO atomic create-if-absent
  *    rename: a blind PUT silently overwrites a racing writer's commit and
  *    corrupts the log. This is exactly why Delta Lake requires a LogStore
  *    / commit-coordinator service on S3. Deploying [[VersionedTable]]
  *    against an object store requires an arbiter backed by an external
  *    arbitration primitive — a DynamoDB/ZooKeeper/DB conditional put, or
  *    S3's newer `If-None-Match` conditional write — implementing this
  *    trait. None ships here (zero extra dependencies by design); the
  *    default arbiter is correct for everything a single-cluster POSIX
  *    deployment mounts.
  *
  * Install a custom arbiter process-wide with
  * `VersionedTable.commitArbiter = myArbiter` before the first commit.
  */
trait CommitArbiter {

  /** Atomically publish `json` as the content of commit slot `target`
    * (inside log directory `dir`, which exists). Returns true iff THIS
    * call won the slot; false iff another writer already owns it. On a
    * true return, any concurrent or later reader of `target` must see the
    * complete `json` (no torn/empty reads) — or, if the backend cannot
    * avoid a brief empty window (the no-hardlink fallback), readers heal
    * by retrying briefly and treating persistently empty slots as
    * uncommitted. Must never throw for the ordinary lost-race case. */
  def tryClaim(dir: Path, target: Path, json: String): Boolean
}

object CommitArbiter {

  /** The POSIX default: write the full content to a temp file, then
    * hard-link it into the version slot — an atomic create-exclusive with
    * the content already in place, so no reader ever sees a torn commit.
    * Falls back to create-exclusive + move where the filesystem has no
    * hard links; the window where the slot exists but is empty is healed
    * on the read side (empty/torn commit files are retried briefly, then
    * ignored as uncommitted). NOT safe on S3/GCS-style object stores —
    * see the trait scaladoc. */
  object PosixLink extends CommitArbiter {
    def tryClaim(dir: Path, target: Path, json: String): Boolean = {
      val tmp = dir.resolve(s".tmp-${UUID.randomUUID()}.json.tmp")
      Files.writeString(tmp, json)
      try {
        try { Files.createLink(target, tmp); true }
        catch {
          case _: UnsupportedOperationException =>
            Files.createFile(target)
            Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING)
            true
        }
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      } finally Files.deleteIfExists(tmp)
    }
  }
}
