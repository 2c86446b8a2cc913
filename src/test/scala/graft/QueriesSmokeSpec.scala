package graft

/** Every SparkEntry query runs at sf0.001 and returns rows (the driver's
  * rows-only contract for non-oracled queries; oracle hash-parity is
  * checked by the driver at sf0.01 and locally via
  * scripts/check_oracle.py). */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has distinct name and runs with rows > 0") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val n = fn(spark, sfDir).count()
          if (n > 0) None else Some(s"$name: 0 rows")
        } catch {
          case e: Exception => Some(s"$name: ${e.getMessage.take(200)}")
        }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("oracleSql keys are a subset of queries") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }
}
