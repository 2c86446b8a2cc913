package graft

import java.nio.file.Files

import graft.io.{VersionedTable => VT}

/** Two REAL Spark JVMs append concurrently to ONE versioned table,
  * arbitrated by `ObjectStoreArbiter(FileObjectStore)` — the full
  * multi-writer commit path (optimistic slot retry, loser rebase, log
  * re-read) across process boundaries, where no in-memory state can
  * leak between writers. This is the deployment the durable store
  * backend exists for: independent writers on a shared filesystem.
  * The in-JVM thread races in CommitArbiterContractSpec prove the same
  * laws cheaply on every build; this spec proves nothing in that suite
  * silently depended on writers sharing a process.
  *
  * The parent (this JVM, which already has a session via SparkSpec)
  * verifies the final table state by READING the shared log — reads
  * don't arbitrate, so the default arbiter is fine — and asserts the
  * dense version chain plus exact row content.
  */
class CrossProcessTableSpec extends SparkSpec {

  /** The child needs the parent's --add-opens set (Spark 4 on JDK 17)
    * — forward them from this JVM's own launch arguments instead of
    * duplicating build.sbt's list. */
  private def addOpens: Seq[String] = {
    import scala.jdk.CollectionConverters._
    val in = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toSeq
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < in.size) {
      val a = in(i)
      if (a == "--add-opens" && i + 1 < in.size) {
        out += a += in(i + 1); i += 2
      } else if (a.startsWith("--add-opens=")) { out += a; i += 1 }
      else i += 1
    }
    out.result()
  }

  test("two Spark JVMs appending 6 commits each to one table through " +
    "the file-backed arbiter: dense version chain 0..11, all 12 rows " +
    "present, no commit lost or duplicated") {
    TestDirs.withTempDir("graft-xproc-tbl") { d =>
      val store = d.resolve("store")
      val table = d.resolve("t").toString
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val cp = System.getProperty("java.class.path")
      def launch(id: String): (Process, java.io.BufferedReader) = {
        val cmd = Seq(javaBin) ++ addOpens ++ Seq(
          "-Xmx2g", "-Dspark.ui.enabled=false",
          "-Dspark.sql.session.timeZone=UTC",
          "-cp", cp, "graft.TableRaceChild",
          store.toString, table, id, "6")
        val pb = new ProcessBuilder(cmd: _*)
        // a child crash must be diagnosable from the failure message
        pb.redirectErrorStream(false)
        pb.redirectError(ProcessBuilder.Redirect.INHERIT)
        val p = pb.start()
        (p, new java.io.BufferedReader(
          new java.io.InputStreamReader(p.getInputStream)))
      }
      val (pa, ra) = launch("A")
      val (pb2, rb) = launch("B")
      try {
        // bounded pre-ready wait (a stalled child Spark boot must fail
        // the test at the deadline, not hang the suite in readLine);
        // stray pre-ready output lines are skipped
        def awaitReady(r: java.io.BufferedReader, p: Process,
            id: String): Unit = {
          val end = System.currentTimeMillis() + 120000
          var line = TestDirs.readLineWithin(r, p,
            end - System.currentTimeMillis())
          while (line.exists(_ != "ready") && p.isAlive &&
              System.currentTimeMillis() < end)
            line = TestDirs.readLineWithin(r, p,
              end - System.currentTimeMillis())
          if (!line.contains("ready"))
            fail(s"child $id did not reach 'ready' (last=$line, " +
              s"alive=${p.isAlive}" +
              (if (!p.isAlive) s", exit=${p.exitValue()}" else "") + ")")
        }
        awaitReady(ra, pa, "A"); awaitReady(rb, pb2, "B")
        Files.createFile(java.nio.file.Paths.get(table + ".go"))
        assert(pa.waitFor(180, java.util.concurrent.TimeUnit.SECONDS) &&
          pb2.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
          "child JVMs did not finish in 180 s")
        assert(pa.exitValue() == 0, "writer A failed")
        assert(pb2.exitValue() == 0, "writer B failed")
        def doneVersion(r: java.io.BufferedReader): Long = {
          var v = -1L
          var line = r.readLine()
          while (line != null) {
            if (line.startsWith("done ")) v = line.drop(5).trim.toLong
            line = r.readLine()
          }
          v
        }
        val (va, vb) = (doneVersion(ra), doneVersion(rb))
        // 12 appends total -> versions 0..11; the LAST writer to finish
        // saw the final version, the other saw at least its own last
        // commit
        assert(math.max(va, vb) == 11L, s"final versions: A=$va B=$vb")
        // parent-side read of the shared log: dense chain, every row
        assert(VT.latestVersion(table).contains(11L))
        val ids = VT.snapshot(spark, table)
          .select("id").collect().map(_.getLong(0)).sorted.toSeq
        assert(ids.size == 12, s"expected 12 rows, got ${ids.size}")
        assert(ids.distinct.size == 12, "duplicated rows — a commit replayed")
        // each writer's 6 unique ids all present
        val aBase = "A".hashCode.abs % 1000 * 100000
        val bBase = "B".hashCode.abs % 1000 * 100000
        assert((0 until 6).forall(i => ids.contains(aBase + i)), "A rows lost")
        assert((0 until 6).forall(i => ids.contains(bBase + i)), "B rows lost")
      } finally {
        pa.destroyForcibly(); pb2.destroyForcibly(); ()
      }
    }
  }
}
