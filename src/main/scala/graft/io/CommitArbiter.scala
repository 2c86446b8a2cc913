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
  *    against an object store means installing [[ObjectStoreArbiter]]
  *    over the store's conditional-put primitive (S3 `If-None-Match: *`,
  *    GCS `ifGenerationMatch=0`, a DynamoDB/ZooKeeper conditional write)
  *    — implement the 3-method [[ObjectStore]] trait with the SDK of
  *    choice; the arbiter's claim/retry/ambiguity logic and its contract
  *    suite come for free (no store SDK ships here — zero extra
  *    dependencies by design; [[InMemoryObjectStore]] proves the contract
  *    offline). The default arbiter is correct for everything a
  *    single-cluster POSIX deployment mounts.
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

  /** The object-store contract stand-in: arbitration decided by ONE atomic
    * conditional put against a process-wide claim registry — never by
    * filesystem create-exclusive, which S3/GCS-style stores lack. This is
    * the exact shape a real backend implements against the store's own
    * primitive (S3 `If-None-Match: *`, GCS `ifGenerationMatch=0`, a
    * DynamoDB/ZooKeeper conditional write): the condition check and the
    * claim are one atomic step; the winner then materializes the object
    * all-at-once (tmp + atomic move emulates a PUT becoming visible only
    * when complete, so readers never see a torn commit).
    *
    * A slot whose object already exists from OUTSIDE this registry's
    * lifetime (an earlier process, a different arbiter) loses — matching
    * the store's precondition, which tests object existence, not the
    * caller's memory.
    *
    * This arbiter exists to PROVE the trait's contract is satisfiable by
    * a conditional-put primitive alone: `CommitArbiterContractSpec` runs
    * the same slot-race and multi-writer table suite against PosixLink
    * and this arbiter. It is a single-process model (the registry is
    * in-memory and never shrinks — recreating a table at a previously
    * claimed path in the same JVM loses its v0 slot), so it is a test
    * harness and a reference shape, not a deployable backend. */
  object ConditionalPut extends CommitArbiter {
    private val slots =
      new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
    def tryClaim(dir: Path, target: Path, json: String): Boolean = {
      val key = target.toAbsolutePath.normalize.toString
      var won = false
      // per-key atomic claim WITH the object materialized inside it: a
      // real store's conditional PUT is one step — the condition check,
      // the claim, and the object's visibility are indivisible, so a
      // loser must never observe its loss before the winner's object is
      // readable (otherwise a lost-race retry re-reads the log, still
      // sees no winner, recomputes the SAME slot and spins). The
      // mapped value is unused; presence of the key IS the claim.
      slots.computeIfAbsent(key, { _ =>
        // precondition also fails against an object that predates the
        // registry (an earlier process / another arbiter): the slot is
        // owned, just not by us — record the claim, report the loss
        if (!Files.exists(target)) {
          val tmp = dir.resolve(s".tmp-${UUID.randomUUID()}.json.tmp")
          try {
            Files.writeString(tmp, json)
            Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
            won = true
          } finally if (!won) Files.deleteIfExists(tmp)
        }
        won
      })
      won
    }
  }
}
