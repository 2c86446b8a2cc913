package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

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
  * child main (graft.ArbiterRace) needs no SparkSession — slot
  * arbitration is pure NIO — so the whole test runs in seconds.
  *
  * Works because Test/fork := true hands this JVM the full test
  * classpath in java.class.path; the spec skips (with a message) if a
  * child JVM cannot be launched at all, rather than failing on an
  * environment quirk. */
class CrossProcessArbiterSpec extends AnyFunSuite {

  private def withDir[T](body: Path => T): T = {
    val dir = Files.createTempDirectory("graft-xproc")
    try body(dir)
    finally {
      val walk = Files.walk(dir)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  test("two JVMs racing 64 slots on one FileObjectStore: every slot has " +
    "exactly one winner across processes and the slot file holds that " +
    "winner's bytes (loser healed, never clobbered)") {
    withDir { d =>
      val store = d.resolve("store")
      val slots = d.resolve("slots")
      val go = d.resolve("go")
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val cp = System.getProperty("java.class.path")
      val nSlots = 64
      def launch(id: String): (Process, java.io.BufferedReader) = {
        val pb = new ProcessBuilder(javaBin, "-cp", cp, "graft.ArbiterRace",
          store.toString, slots.toString, id, nSlots.toString, go.toString)
        pb.redirectErrorStream(false)
        val p = pb.start()
        (p, new java.io.BufferedReader(
          new java.io.InputStreamReader(p.getInputStream)))
      }
      val (pa, ra) = launch("A")
      val (pb2, rb) = launch("B")
      try {
        // wait for both children's "ready", then fire the shared gate
        def awaitReady(r: java.io.BufferedReader, p: Process): Boolean = {
          val line = r.readLine() // blocks until the child prints
          p.isAlive && line == "ready"
        }
        assume(awaitReady(ra, pa) && awaitReady(rb, pb2),
          "child JVMs did not come up — cannot exercise the cross-process race")
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
        // exactly-one-winner, across PROCESSES: disjoint and complete
        assert((wa & wb).isEmpty, s"slots won by BOTH writers: ${wa & wb}")
        assert(wa ++ wb == (0 until nSlots).toSet,
          s"unclaimed slots: ${(0 until nSlots).toSet -- wa -- wb}")
        // both writers actually won something — a race where one JVM took
        // every slot would mean the gate handshake failed to overlap them
        // (would not be UNSOUND, but it would gut the test's point)
        assert(wa.nonEmpty && wb.nonEmpty,
          s"degenerate race: A=${wa.size} B=${wb.size} — no overlap")
        // every slot file holds its winner's exact bytes (winner wrote it
        // or the loser healed it from the store; either way content must
        // be the winner's)
        (0 until nSlots).foreach { s =>
          val expectOwner = if (wa.contains(s)) "A" else "B"
          assert(Files.readString(slots.resolve(s"$s.json")) ==
            s"$expectOwner:$s", s"slot $s content mismatch")
        }
      } finally {
        pa.destroyForcibly(); pb2.destroyForcibly(); ()
      }
    }
  }
}
