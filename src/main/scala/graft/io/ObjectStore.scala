package graft.io

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** The minimal object-store surface a [[VersionedTable]] multi-writer
  * deployment needs — the S3/GCS/ABFS plug point the [[CommitArbiter]]
  * scaladoc promises.
  *
  * Real backends map 1:1 onto store primitives that ship today:
  *  - `putIfAbsent`  = S3 `PutObject` + `If-None-Match: *` (GA since 2024),
  *    GCS `insert` + `ifGenerationMatch=0`, ABFS create-path with
  *    `If-None-Match: *`;
  *  - `putIfMatch`   = S3 `If-Match: <etag>`, GCS `ifGenerationMatch=<gen>`
  *    — the compare-and-swap a MUTABLE pointer object (a
  *    `_last_checkpoint`-style latest-version hint) updates through;
  *  - `get`          = GET returning content + the version tag.
  *
  * Failure taxonomy (what an SDK surfaces, normalized to three classes the
  * arbiter can reason about):
  *  - [[ObjectStore.PreconditionFailed]] (HTTP 412): NOT an error — the
  *    condition did its job; for put-if-absent it means "you lost the
  *    race", never retry;
  *  - [[ObjectStore.TransientStoreException]] (429/503/SlowDown, connect
  *    timeouts BEFORE the request was sent): the request did not land —
  *    retry with backoff;
  *  - [[ObjectStore.AmbiguousOutcomeException]] (500, response timeout
  *    AFTER the bytes went out): the PUT may or may not have landed —
  *    blind retry of a CONDITIONAL put is wrong in both directions (a
  *    landed first attempt makes the retry read as a lost race; treating
  *    the timeout as a loss abandons a slot you may own). The only sound
  *    move is to read the object back and adjudicate by content — see
  *    [[ObjectStoreArbiter]].
  * Anything else (403, 400, bucket-not-found) is a configuration error and
  * propagates untouched.
  */
trait ObjectStore {

  /** Create `key` with `bytes` iff it does not exist. */
  def putIfAbsent(key: String, bytes: Array[Byte]): ObjectStore.PutOutcome

  /** Replace `key` iff its current version tag is exactly `etag` —
    * compare-and-swap for mutable pointer objects. */
  def putIfMatch(key: String, bytes: Array[Byte],
      etag: String): ObjectStore.PutOutcome

  /** Content + current version tag, or None if the key does not exist. */
  def get(key: String): Option[ObjectStore.Blob]
}

object ObjectStore {

  final case class Blob(bytes: Array[Byte], etag: String)

  sealed trait PutOutcome
  /** The put landed; `etag` is the new version tag. */
  final case class Created(etag: String) extends PutOutcome
  /** The condition failed: put-if-absent → the key already exists
    * (lost race); put-if-match → the tag moved (stale CAS). */
  case object PreconditionFailed extends PutOutcome

  /** Retryable: the request did not reach the store (429/503/connect
    * timeout). */
  final class TransientStoreException(msg: String)
    extends RuntimeException(msg)

  /** The request MAY have landed (500 / response timeout after send):
    * resolve by reading back, never by blind retry. */
  final class AmbiguousOutcomeException(msg: String)
    extends RuntimeException(msg)
}

/** In-memory [[ObjectStore]] with programmable fault injection — the
  * offline model that proves the arbiter's retry taxonomy without a
  * network. Linearizable per key (ConcurrentHashMap compute), monotonic
  * etags. Faults are enqueued per operation kind and consumed
  * first-in-first-out by the next matching call:
  *  - [[InMemoryObjectStore.TransientBefore]] — throw transient, put NOT
  *    applied;
  *  - [[InMemoryObjectStore.AmbiguousLanded]] — apply the put, THEN throw
  *    ambiguous (the landed-500 case);
  *  - [[InMemoryObjectStore.AmbiguousLost]] — put not applied, throw
  *    ambiguous (the lost-500 case).
  */
final class InMemoryObjectStore extends ObjectStore {
  import InMemoryObjectStore._
  import ObjectStore._

  private val objects = new ConcurrentHashMap[String, Blob]()
  private val etagSeq = new AtomicLong(0L)
  private val putFaults =
    new java.util.concurrent.ConcurrentLinkedQueue[Fault]()
  private val getFaults =
    new java.util.concurrent.ConcurrentLinkedQueue[Fault]()
  private val putCalls = new AtomicLong(0L)

  /** Enqueue faults for upcoming conditional puts (either kind). */
  def injectPutFaults(fs: Fault*): Unit = fs.foreach(putFaults.add)

  /** Enqueue TRANSIENT faults for upcoming gets — a 503 hits the
    * read-back just as easily as the write (only TransientBefore is
    * meaningful for a read: it either returns or it doesn't). */
  def injectGetFaults(fs: Fault*): Unit = fs.foreach(getFaults.add)

  /** How many conditional-put calls reached the store (retry visibility
    * for the spec). */
  def conditionalPuts: Long = putCalls.get()

  private def nextTag(): String = s"etag-${etagSeq.incrementAndGet()}"

  /** Run `attempt` through the fault queue: no fault → the real put; a
    * fault decides whether the put lands before the exception flies. */
  private def faulted(key: String, attempt: () => PutOutcome): PutOutcome =
    putFaults.poll() match {
      case null => attempt()
      case TransientBefore =>
        throw new TransientStoreException(s"503 SlowDown on $key")
      case AmbiguousLanded =>
        attempt()
        throw new AmbiguousOutcomeException(s"500 after landing on $key")
      case AmbiguousLost =>
        throw new AmbiguousOutcomeException(s"500 without landing on $key")
    }

  override def putIfAbsent(key: String, bytes: Array[Byte]): PutOutcome = {
    putCalls.incrementAndGet()
    faulted(key, () => {
      var out: PutOutcome = PreconditionFailed
      objects.compute(key, (_, cur) =>
        if (cur != null) cur
        else {
          val b = Blob(bytes.clone(), nextTag())
          out = Created(b.etag); b
        })
      out
    })
  }

  override def putIfMatch(key: String, bytes: Array[Byte],
      etag: String): PutOutcome = {
    putCalls.incrementAndGet()
    faulted(key, () => {
      var out: PutOutcome = PreconditionFailed
      objects.compute(key, (_, cur) =>
        if (cur == null || cur.etag != etag) cur
        else {
          val b = Blob(bytes.clone(), nextTag())
          out = Created(b.etag); b
        })
      out
    })
  }

  override def get(key: String): Option[Blob] = {
    getFaults.poll() match {
      case null => ()
      case _ => throw new TransientStoreException(s"503 SlowDown on GET $key")
    }
    Option(objects.get(key)).map(b => Blob(b.bytes.clone(), b.etag))
  }
}

object InMemoryObjectStore {
  sealed trait Fault
  case object TransientBefore extends Fault
  case object AmbiguousLanded extends Fault
  case object AmbiguousLost extends Fault
}
