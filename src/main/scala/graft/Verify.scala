package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // full JSON escaping (graft.util.Fmt) — a tab or CR in builder-
    // authored SQL would otherwise make the driver's json.load fail and
    // silently zero the round's correctness
    def q(s: String): String = graft.util.Fmt.jsonString(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace(graft.queries.FintechQueries.OutPlaceholder, absOut))}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
