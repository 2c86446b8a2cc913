package graft.io

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.UUID

/** [[CommitArbiter]] backed by an [[ObjectStore]]'s conditional put — the
  * deployable shape for S3/GCS/ABFS multi-writer tables (carried
  * VERDICT r12–r15; the in-memory [[InMemoryObjectStore]] proves the
  * contract offline, a real backend swaps in its SDK behind the same
  * three-method trait).
  *
  * Decision procedure per slot claim:
  *  1. a target that already exists LOCALLY predates this store's
  *     lifetime (an earlier process, a different arbiter) → loss, exactly
  *     the store precondition's semantics (it tests object existence, not
  *     the caller's memory);
  *  2. `putIfAbsent` — [[ObjectStore.Created]] wins,
  *     [[ObjectStore.PreconditionFailed]] loses (never retried: 412 IS
  *     the answer);
  *  3. [[ObjectStore.TransientStoreException]] → bounded exponential
  *     backoff and retry — the request never landed, so a retry is safe
  *     for a conditional put;
  *  4. [[ObjectStore.AmbiguousOutcomeException]] → the PUT may have
  *     landed; blind retry is wrong in BOTH directions (a landed first
  *     attempt makes its own retry read 412 = "you lost" on a slot you
  *     won; assuming loss abandons a slot you may own). Adjudicate by
  *     reading the object back: our exact bytes → we won; different
  *     bytes → someone else won; absent → the put never landed, retry.
  *     Sound because commit JSON is writer-unique by construction:
  *     [[VersionedTable]] stamps every commit with a per-writer UUID
  *     `nonce` (data commits are additionally unique via UUID-named part
  *     files, but metadata-only commits — setProperties, empty deferred
  *     deletes — need the nonce: two writers racing the same version with
  *     identical op/props in the same `ts` millisecond would otherwise be
  *     byte-identical and BOTH adjudicate as winners). Byte-equality then
  *     identifies the author — the same idempotency trick Delta's
  *     S3 LogStore and the Iceberg commit path rely on. Callers supplying
  *     their own JSON must preserve that writer-uniqueness invariant.
  *
  * Exhausted transient retries THROW (a store outage is not a lost race —
  * the commit must fail loudly, not silently lose a slot); the trait's
  * "never throw" clause covers only ordinary race losses.
  *
  * Local mirror: [[VersionedTable]] reads the log through the filesystem,
  * so the winner materializes the slot file (tmp + atomic move — readers
  * never see a torn commit), and a LOSER heals the winner's content into
  * the local mirror if the file is still absent (in a real deployment
  * every reader goes through `store.get`; the mirror is that read path
  * for the local-filesystem harness). Heal never replaces an existing
  * file, so a pre-existing older-process slot is never clobbered.
  */
final class ObjectStoreArbiter(
    store: ObjectStore,
    maxTransientRetries: Int = 8,
    backoffMs: Long = 10L) extends CommitArbiter {
  import ObjectStore._

  override def tryClaim(dir: Path, target: Path, json: String): Boolean = {
    val key = target.toAbsolutePath.normalize.toString
    val bytes = json.getBytes(UTF_8)
    if (Files.exists(target)) return false // predates the store (law 5)
    var transientLeft = maxTransientRetries
    var sleep = backoffMs
    def retryAfter(e: RuntimeException): Unit = {
      transientLeft -= 1
      if (transientLeft < 0) throw e
      if (sleep > 0) Thread.sleep(sleep)
      sleep = math.min(sleep * 2, 1000L)
    }
    // GETs ride the SAME transient-retry budget as the puts (a 503 can
    // hit the read-back just as easily as the write). Exhaustion here
    // rethrows: during ambiguous adjudication a dead store means the
    // claim's fate is genuinely unknown — failing LOUD is the only
    // honest answer (the caller must not blind-retry the commit; see
    // the class scaladoc's step 4).
    def getWithRetry(k: String): Option[Blob] = {
      while (true) {
        try return store.get(k)
        catch { case e: TransientStoreException => retryAfter(e) }
      }
      None // unreachable
    }
    var decided: Option[Boolean] = None
    while (decided.isEmpty) {
      try {
        decided = Some(store.putIfAbsent(key, bytes) match {
          case Created(_) => true
          case PreconditionFailed => false
        })
      } catch {
        case e: TransientStoreException => retryAfter(e)
        case e: AmbiguousOutcomeException =>
          getWithRetry(key) match {
            case Some(blob) =>
              decided = Some(java.util.Arrays.equals(blob.bytes, bytes))
            case None =>
              // the put never landed; ambiguous degrades to transient
              retryAfter(e)
          }
      }
    }
    if (decided.contains(true)) materialize(dir, target, bytes)
    else if (!Files.exists(target))
      // heal the winner's content into the local mirror (no-op if the
      // file already exists — never clobber an older-process slot).
      // BEST-EFFORT: the loss is already decided by the store's 412, and
      // the trait forbids throwing on an ordinary race loss — a failed
      // heal only delays the local mirror (the next claim attempt or a
      // store-side reader converges it), so store errors are swallowed.
      try getWithRetry(key).foreach(b => materialize(dir, target, b.bytes))
      catch { case scala.util.control.NonFatal(_) => () }
    decided.contains(true)
  }

  /** tmp + atomic move: the slot file appears complete or not at all.
    * Concurrent materializations here always carry the SAME content (the
    * winner plus healing losers, all holding the store's winning blob),
    * so whichever lands last is a byte-identical replace on POSIX rename
    * semantics, and platforms that refuse the move instead throw
    * FileAlreadyExistsException — swallowed as already-done. */
  private def materialize(dir: Path, target: Path,
      bytes: Array[Byte]): Unit = {
    val tmp = dir.resolve(s".tmp-${UUID.randomUUID()}.json.tmp")
    try {
      Files.write(tmp, bytes)
      try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    } finally { Files.deleteIfExists(tmp); () }
  }
}
