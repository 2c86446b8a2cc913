package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: dump formatted physical plans for INTERNAL operator frames —
  * the heavy compositions materialize eagerly (snapshot/persist+count),
  * so their returned frames' plans are stub scans and the load-bearing
  * plan shapes live one level down. `runMain graft.PlansOp [sfDir]`
  * prints each named operator frame's `.explain("formatted")` between
  * the same `========== <name> ==========` markers [[Plans]] uses. */
object PlansOp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-plans-op", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    val ops: Seq[(String, () => DataFrame)] = Seq(
      // the per-doc MinHash signature pipeline feeding every near-dup
      // operator (minHashLsh / buildNearDupIndex / incremental matches)
      "op_minhash_signatures" -> (() =>
        graft.ext.Dedup.minHashSignatures(docs, "doc_id", "text", 3, 32)),
      // the per-doc SimHash signature pipeline feeding simHashPairs
      "op_simhash_signatures" -> (() =>
        graft.ext.Dedup.simHash(docs, "doc_id", "text")))
    ops.foreach { case (n, fn) =>
      println(s"========== $n ==========")
      println(fn().queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
