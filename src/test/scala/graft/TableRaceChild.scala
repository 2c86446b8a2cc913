package graft

import java.nio.file.Paths

/** Dev-only cross-process TABLE writer (r18): one independent JVM's
  * worth of appends to a shared [[graft.io.VersionedTable]], arbitrated
  * through `ObjectStoreArbiter(FileObjectStore(storeRoot))` — the child
  * half of CrossProcessTableSpec, which races two of these against each
  * other on one table. Unlike ArbiterRace this boots a real (tiny)
  * SparkSession, because the thing under test is the FULL commit path:
  * optimistic slot retry, loser rebase, log re-read — across process
  * boundaries where no in-memory state can leak.
  *
  * Args: storeRoot table writerId appendCount
  * Protocol: print "ready" once the session is up, busy-wait for
  * `<table>.go`, append `appendCount` single-row commits (id =
  * writerId-unique), print "done <finalVersion>".
  */
object TableRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(storeRoot, table, writerId, countS) = args
    graft.io.VersionedTable.commitArbiter = new graft.io.ObjectStoreArbiter(
      new graft.io.FileObjectStore(Paths.get(storeRoot)))
    val spark = GraftSession.local(s"graft-table-race-$writerId", 2)
    spark.sparkContext.setLogLevel("ERROR")
    try {
      println("ready")
      Console.flush()
      val go = Paths.get(table + ".go")
      while (!java.nio.file.Files.exists(go)) Thread.sleep(2)
      val base = writerId.hashCode.abs % 1000 * 100000
      (0 until countS.toInt).foreach { i =>
        graft.io.VersionedTable.append(spark,
          spark.range(base + i, base + i + 1).toDF("id"), table)
      }
      println("done " +
        graft.io.VersionedTable.latestVersion(table).getOrElse(-1L))
    } finally spark.stop()
  }
}
