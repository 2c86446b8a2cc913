package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Test-scope helpers shared by the arbiter / cross-process specs (one
  * definition instead of a copy per spec — review catch, r18). */
object TestDirs {

  /** Temp dir with recursive best-effort cleanup. */
  def withTempDir[T](prefix: String)(body: Path => T): T = {
    val dir = Files.createTempDirectory(prefix)
    try body(dir)
    finally {
      val walk = Files.walk(dir)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  /** Read one line from a child process's stdout WITHOUT an unbounded
    * block: polls readiness so a wedged child (stalled JVM boot, lost
    * handshake) fails the test at the deadline instead of hanging the
    * whole suite in readLine(); returns None when the process dies or
    * the deadline passes first (draining any final flushed line). The
    * children print complete lines, so ready() ⇒ readLine() does not
    * block in practice. */
  def readLineWithin(r: java.io.BufferedReader, p: Process,
      deadlineMs: Long): Option[String] = {
    val end = System.currentTimeMillis() + deadlineMs
    while (System.currentTimeMillis() < end) {
      if (r.ready()) return Option(r.readLine())
      if (!p.isAlive)
        return if (r.ready()) Option(r.readLine()) else None
      Thread.sleep(10)
    }
    None
  }
}
