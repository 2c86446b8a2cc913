package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** [[GenData]] — the reference's generate_data.py CLI re-expressed
  * (VERDICT r15 #2): defaults match BASELINE.md's generator defaults
  * table, the tiny-set output round-trips through the q178 fixture path
  * (Readers.readCsv with an explicit schema), and `--seed` actually
  * changes the data while equal seeds reproduce it byte-for-byte. */
class GenDataSpec extends SparkSpec {

  test("defaults match the reference CLI/BASELINE.md table " +
    "(generate_data.py:28-45)") {
    val c = GenData.parse(Nil)
    assert(c.outputDir == "data/raw")
    assert(c.seed == 42)
    assert(c.customers == 10000L)
    assert(c.merchants == 500L)
    assert(c.transactions == 100000L)
    assert(c.rateDays == 90)
    assert(c.partitions == 1)
  }

  test("arg parsing: every flag lands; unknown flags and bad numbers " +
    "fail loudly") {
    val c = GenData.parse(Seq("--output-dir", "/tmp/x", "--seed", "7",
      "--customers", "50", "--merchants", "10", "--transactions", "200",
      "--rate-days", "14", "--partitions", "3"))
    assert(c == GenData.Config("/tmp/x", 7, 50L, 10L, 200L, 14, 3))
    intercept[IllegalArgumentException](GenData.parse(Seq("--bogus")))
    intercept[IllegalArgumentException](GenData.parse(Seq("--seed", "x")))
    // --help wins over everything else (argparse precedence): it is a
    // distinct HelpRequested (exit 0), fires even when another arg is
    // malformed, and is never consumed as a flag's value
    intercept[GenData.HelpRequested](GenData.parse(Seq("--help")))
    intercept[GenData.HelpRequested](
      GenData.parse(Seq("--seed", "abc", "--help")))
    intercept[GenData.HelpRequested](
      GenData.parse(Seq("--output-dir", "--help")))
    // a KNOWN flag with a missing value names the real problem
    val e = intercept[IllegalArgumentException](
      GenData.parse(Seq("--customers", "50", "--seed")))
    assert(e.getMessage.contains("--seed expects a value"), e.getMessage)
  }

  test("tiny generated set round-trips through the q178 CSV fixture path " +
    "with the reference's file names and row counts") {
    val dir = Files.createTempDirectory("graft-gendata")
    try {
      val c = GenData.Config(outputDir = dir.toString, customers = 50L,
        merchants = 10L, transactions = 200L, rateDays = 14)
      val counts = GenData.run(spark, c)
      assert(counts == Map("customers" -> 50L, "merchants" -> 10L,
        "transactions" -> 200L,
        "exchange_rates" -> 14L * config.Enums.currencies.size))
      // single-file parity with the reference: a FILE named <name>.csv
      Seq("customers", "merchants", "transactions", "exchange_rates")
        .foreach { n =>
          assert(Files.isRegularFile(dir.resolve(s"$n.csv")),
            s"$n.csv is not a single file")
        }
      // q178 fixture path: Readers.readCsv with an explicit schema — the
      // written strings must parse back to typed values that aggregate
      // sanely (amounts inside the generator's [0.01, 50000] cap)
      val schema = StructType.fromDDL(
        "transaction_id STRING, customer_id STRING, merchant_id STRING, " +
          "amount DECIMAL(12,2)")
      val back = io.Readers.readCsv(spark,
        dir.resolve("transactions.csv").toString, Some(schema))
      assert(back.count() == 200L)
      val row = back.agg(min(col("amount")), max(col("amount")),
        countDistinct(col("transaction_id"))).head()
      assert(row.getDecimal(0).doubleValue >= 0.01)
      assert(row.getDecimal(1).doubleValue <= 50000.0)
      assert(row.getLong(2) == 200L)
      // DictWriter parity: empty strings render bare (`,,` — the
      // unflagged rows' empty fraud_indicators), never Spark's `""`
      val raw = new String(Files.readAllBytes(
        dir.resolve("transactions.csv")),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(raw.contains(",,"), "expected bare empty fields")
      assert(!raw.contains("\"\""), "found quoted empty fields")
    } finally util.Fs.deleteRecursively(dir)
  }

  test("seed changes the data; equal seeds reproduce it") {
    val d42a = generator.DataGenerator.transactions(spark, 500, 50, 10)
      .collect().toSeq
    val d42b = generator.DataGenerator
      .transactions(spark, 500, 50, 10, seed = 42).collect().toSeq
    val d7 = generator.DataGenerator
      .transactions(spark, 500, 50, 10, seed = 7).collect().toSeq
    assert(d42a == d42b, "default seed must equal explicit 42 (oracle " +
      "gates hash this data)")
    assert(d42a != d7, "a different seed must change the data")
  }

  test("--partitions > 1 writes a directory of EXACTLY that many parts " +
    "(repartitions UP past the source parallelism) that " +
    "spark.read.csv(dir) consumes") {
    val dir = Files.createTempDirectory("graft-gendata-p")
    try {
      val c = GenData.Config(outputDir = dir.toString, customers = 40L,
        merchants = 8L, transactions = 100L, rateDays = 7, partitions = 8)
      GenData.run(spark, c)
      val t = dir.resolve("transactions.csv")
      assert(Files.isDirectory(t), "partitions>1 must keep the directory")
      // the scale lever must actually fan out: coalesce would cap at the
      // source's partition count, writing fewer files than requested
      val listing = Files.list(t)
      val nParts =
        try listing.iterator().asScala
          .count(_.getFileName.toString.startsWith("part-"))
        finally listing.close()
      assert(nParts == 8, s"expected 8 part files, got $nParts")
      val back = spark.read.option("header", "true").csv(t.toString)
      assert(back.count() == 100L)
    } finally util.Fs.deleteRecursively(dir)
  }

  test("an empty dataset still honors the single-FILE contract") {
    val dir = Files.createTempDirectory("graft-gendata-e")
    try {
      val c = GenData.Config(outputDir = dir.toString, customers = 0L,
        merchants = 1L, transactions = 1L, rateDays = 1)
      val counts = GenData.run(spark, c)
      assert(counts("customers") == 0L)
      val f = dir.resolve("customers.csv")
      assert(Files.isRegularFile(f),
        "an empty dataset must not degrade to a directory")
      // the header line survives (DictWriter parity): reading back with
      // header=true yields an empty frame WITH the customer columns, not
      // a zero-column frame that breaks schema-dependent consumers
      val back = spark.read.option("header", "true").csv(f.toString)
      assert(back.count() == 0L)
      assert(back.columns.contains("customer_id"), back.columns.toSeq)
    } finally util.Fs.deleteRecursively(dir)
  }
}
