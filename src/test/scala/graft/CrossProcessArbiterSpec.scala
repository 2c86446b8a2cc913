package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** TWO REAL JVMs race the same commit slots through
  * `ObjectStoreArbiter(FileObjectStore)` — the cross-process contention
  * the in-memory store (and any single-JVM thread race) structurally
  * cannot express, and exactly the deployment the durable backend
  * exists for: independent writers on a shared filesystem with no cloud
  * SDK and no coordination beyond the store.
  *
  * The children handshake ("ready" on stdout, then busy-wait for a go
  * file the parent creates only once BOTH are ready) so the races
  * genuinely overlap instead of resolving in JVM-startup order. The
  * child main (graft.ArbiterRace, test scope) needs no SparkSession —
  * slot arbitration is pure NIO — so the whole test runs in seconds.
  *
  * Works because Test/fork := true hands this JVM the full test
  * classpath in java.class.path. Child stderr is inherited, so a child
  * crash leaves its stack trace in the test log; a child that dies
  * before "ready" FAILS the test (that is a code regression in exactly
  * the components this spec guards), while an environment that cannot
  * launch a JVM at all cancels it. */
class CrossProcessArbiterSpec extends AnyFunSuite {

  test("two JVMs racing 64 slots on one FileObjectStore: every slot has " +
    "exactly one winner across processes and the slot file holds that " +
    "winner's bytes (loser healed, never clobbered)") {
    TestDirs.withTempDir("graft-xproc") { d =>
      val store = d.resolve("store")
      val slots = d.resolve("slots")
      val go = d.resolve("go")
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val cp = System.getProperty("java.class.path")
      val nSlots = 64
      def launch(id: String): (Process, java.io.BufferedReader) = {
        val pb = new ProcessBuilder(javaBin, "-cp", cp, "graft.ArbiterRace",
          store.toString, slots.toString, id, nSlots.toString, go.toString)
        // a child crash must be diagnosable from the test log
        pb.redirectError(ProcessBuilder.Redirect.INHERIT)
        val p = try pb.start() catch {
          case e: java.io.IOException =>
            cancel(s"cannot launch a child JVM here: $e")
        }
        (p, new java.io.BufferedReader(
          new java.io.InputStreamReader(p.getInputStream)))
      }
      val (pa, ra) = launch("A")
      val (pb2, rb) = launch("B")
      try {
        // bounded pre-ready wait: a wedged child fails the test at the
        // deadline instead of hanging the suite in readLine(); a child
        // that DIED pre-ready is a startup regression in the arbiter
        // stack and fails with its exit code (stderr is in the log)
        def awaitReady(r: java.io.BufferedReader, p: Process,
            id: String): Unit =
          TestDirs.readLineWithin(r, p, 30000) match {
            case Some("ready") => ()
            case other =>
              fail(s"child $id did not reach 'ready' (got $other; " +
                s"alive=${p.isAlive}" +
                (if (!p.isAlive) s", exit=${p.exitValue()}" else "") + ")")
          }
        awaitReady(ra, pa, "A"); awaitReady(rb, pb2, "B")
        Files.createFile(go)
        assert(pa.waitFor(60, java.util.concurrent.TimeUnit.SECONDS) &&
          pb2.waitFor(60, java.util.concurrent.TimeUnit.SECONDS),
          "child JVMs did not finish the race in 60 s")
        assert(pa.exitValue() == 0 && pb2.exitValue() == 0)
        def wins(r: java.io.BufferedReader): Set[Int] = {
          var out = Set.empty[Int]
          var line = r.readLine()
          while (line != null) {
            if (line.startsWith("won ")) out += line.drop(4).trim.toInt
            line = r.readLine()
          }
          out
        }
        val (wa, wb) = (wins(ra), wins(rb))
        // exactly-one-winner, across PROCESSES: disjoint and complete —
        // these are the SOUNDNESS assertions and stay hard
        assert((wa & wb).isEmpty, s"slots won by BOTH writers: ${wa & wb}")
        assert(wa ++ wb == (0 until nSlots).toSet,
          s"unclaimed slots: ${(0 until nSlots).toSet -- wa -- wb}")
        // every slot file holds its winner's exact bytes (winner wrote it
        // or the loser healed it from the store; either way content must
        // be the winner's) — still a soundness assertion, so it runs
        // BEFORE the overlap claim below can cancel the test
        (0 until nSlots).foreach { s =>
          val expectOwner = if (wa.contains(s)) "A" else "B"
          assert(Files.readString(slots.resolve(s"$s.json")) ==
            s"$expectOwner:$s", s"slot $s content mismatch")
        }
        // overlap is a SCHEDULING property, not a soundness one: on an
        // oversubscribed host one child's threads can be descheduled for
        // the few ms the other needs to take all 64 slots — arbitration
        // was still correct, so cancel (don't fail) the overlap claim
        assume(wa.nonEmpty && wb.nonEmpty,
          s"degenerate race (A=${wa.size} B=${wb.size}) — host skew, " +
            "no cross-process overlap to assert this run")
      } finally {
        pa.destroyForcibly(); pb2.destroyForcibly(); ()
      }
    }
  }
}
