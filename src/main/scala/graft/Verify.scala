package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd+ args: only dump the named queries (dev spot-checks);
    // the driver always calls with exactly (sfDir, outDir)
    val (sfDir, outDir, only) = args match {
      case Array(s, o, rest @ _*) => (s, o, rest.toSet)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // GRAFT_ARBITER=objectstore installs the object-store commit arbiter
    // process-wide for the WHOLE dump (VERDICT r16 #5): every versioned
    // gate then claims its commit slots through conditional-put +
    // ambiguous-outcome adjudication instead of POSIX hard links, proving
    // no code path outside the contract suite silently assumes the POSIX
    // arbiter. The in-memory store is the offline stand-in for an SDK.
    if (sys.env.get("GRAFT_ARBITER").contains("objectstore")) {
      graft.io.VersionedTable.commitArbiter =
        new graft.io.ObjectStoreArbiter(new graft.io.InMemoryObjectStore)
      System.err.println("[verify] ObjectStoreArbiter installed " +
        "process-wide (GRAFT_ARBITER=objectstore)")
    }
    // the durable variant: same arbiter, hard-link-versioned directory
    // store — every versioned gate's commits then arbitrate through
    // PERSISTENT store objects (r18; see io.FileObjectStore)
    if (sys.env.get("GRAFT_ARBITER").contains("fileobjectstore")) {
      val root = Files.createTempDirectory("graft-verify-fos")
      graft.io.VersionedTable.commitArbiter =
        new graft.io.ObjectStoreArbiter(new graft.io.FileObjectStore(root))
      System.err.println("[verify] ObjectStoreArbiter(FileObjectStore) " +
        s"installed process-wide at $root (GRAFT_ARBITER=fileobjectstore)")
    }
    val spark = GraftSession.local("graft-verify", cpus.toInt)
    new java.io.File(outDir).mkdirs()
    val absOut = Paths.get(outDir).toAbsolutePath.toString
    // Dump the generated silver inputs so the DuckDB oracle can recompute
    // the fintech queries from the exact same bytes (generator is seeded +
    // partition-independent, so this equals what the queries consume).
    // Sibling dir, not inside outDir: the driver enumerates outDir subdirs
    // as query outputs, so an in-tree dump pollutes the correctness roster.
    graft.queries.FintechQueries.oracleTables(spark).foreach {
      case (name, df) =>
        try df.write.mode("overwrite").parquet(s"${absOut}_inputs/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] oracle table $name failed: ${e.getMessage}")
        }
    }
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // same harness hygiene as Bench: don't let one query's snapshot
      // blocks ride along for the remaining ~150 dumps
      graft.util.Caches.clearAll(spark)
    }
    // full JSON escaping (graft.util.Fmt) — a tab or CR in builder-
    // authored SQL would otherwise make the driver's json.load fail and
    // silently zero the round's correctness
    def q(s: String): String = graft.util.Fmt.jsonString(s)
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace(graft.queries.FintechQueries.OutPlaceholder, absOut))}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
