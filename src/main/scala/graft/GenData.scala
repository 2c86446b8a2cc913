package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Synthetic-fintech-data CLI — the reference's one user-facing entry point
  * (`/root/reference/scripts/generate_data.py`: argparse over output-dir /
  * seed / customers / merchants / transactions, seeded CSV output named
  * `customers.csv` / `merchants.csv` / `transactions.csv` /
  * `exchange_rates.csv`), re-expressed over [[generator.DataGenerator]]'s
  * hash-derived columns.
  *
  * Same defaults as the reference (BASELINE.md defaults table: 10,000
  * customers / 500 merchants / 100,000 transactions / 90 days × 9
  * currencies = 810 rates, seed 42). One deliberate scale lever the
  * reference's single-process row loop cannot offer: `--partitions N`
  * writes each dataset as a DIRECTORY of N part files (`customers.csv/`)
  * instead of one file, so a billion-row generation never funnels through
  * a single writer task; the default (1) matches the reference's
  * one-file-per-dataset contract exactly.
  *
  * Usage:
  * {{{
  * sbt "runMain graft.GenData --output-dir data/raw --seed 42 \
  *   --customers 10000 --merchants 500 --transactions 100000"
  * }}}
  */
object GenData {

  final case class Config(
      outputDir: String = "data/raw",
      seed: Int = generator.DataGenerator.Seed,
      customers: Long = 10000L,
      merchants: Long = 500L,
      transactions: Long = 100000L,
      rateDays: Int = 90,
      partitions: Int = 1)

  private val usage =
    """usage: graft.GenData [--output-dir DIR] [--seed N] [--customers N]
      |                     [--merchants N] [--transactions N] [--rate-days N]
      |                     [--partitions N]
      |Generate synthetic fintech data (defaults: data/raw, seed=42,
      |10000 customers, 500 merchants, 100000 transactions, 90 rate days,
      |1 output partition = one CSV file per dataset).""".stripMargin

  /** Pure argparse (exposed for the spec): unknown flags and non-numeric
    * values fail loudly with the usage string, like argparse does. */
  def parse(args: Seq[String]): Config = {
    def num[T](flag: String, v: String, f: String => T): T =
      try f(v) catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"$flag expects a number, got '$v'\n$usage")
      }
    @annotation.tailrec
    def loop(rest: List[String], c: Config): Config = rest match {
      case Nil => c
      case "--output-dir" :: v :: t => loop(t, c.copy(outputDir = v))
      case "--seed" :: v :: t =>
        loop(t, c.copy(seed = num("--seed", v, _.toInt)))
      case "--customers" :: v :: t =>
        loop(t, c.copy(customers = num("--customers", v, _.toLong)))
      case "--merchants" :: v :: t =>
        loop(t, c.copy(merchants = num("--merchants", v, _.toLong)))
      case "--transactions" :: v :: t =>
        loop(t, c.copy(transactions = num("--transactions", v, _.toLong)))
      case "--rate-days" :: v :: t =>
        loop(t, c.copy(rateDays = num("--rate-days", v, _.toInt)))
      case "--partitions" :: v :: t =>
        loop(t, c.copy(partitions =
          math.max(1, num("--partitions", v, _.toInt))))
      case ("--help" | "-h") :: _ =>
        throw new IllegalArgumentException(usage)
      case other :: _ =>
        throw new IllegalArgumentException(s"unknown arg '$other'\n$usage")
    }
    loop(args.toList, Config())
  }

  /** Write `df` as `<outDir>/<name>.csv` — a single file when
    * `partitions == 1` (the reference's contract), a directory of part
    * files otherwise (the scale path). Returns the row count. */
  private def writeCsv(df: DataFrame, outDir: Path, name: String,
      partitions: Int): Long = {
    val target = outDir.resolve(s"$name.csv")
    util.Fs.deleteRecursively(target)
    val tmp = outDir.resolve(s".$name.csv.tmp")
    util.Fs.deleteRecursively(tmp)
    df.coalesce(partitions).write.option("header", "true")
      .csv(tmp.toString)
    val listing = Files.list(tmp)
    val parts =
      try listing.iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-"))
        .toSeq.sortBy(_.toString)
      finally listing.close()
    if (partitions == 1 && parts.size == 1) {
      Files.move(parts.head, target)
      util.Fs.deleteRecursively(tmp)
    } else {
      // directory-of-parts: keep Spark's layout (with _SUCCESS) under the
      // dataset name so any downstream spark.read.csv(dir) just works
      Files.move(tmp, target)
    }
    df.count()
  }

  def run(spark: SparkSession, c: Config): Map[String, Long] = {
    val out = Paths.get(c.outputDir)
    Files.createDirectories(out)
    val g = generator.DataGenerator
    val written = Seq(
      "customers" -> writeCsv(
        g.customers(spark, c.customers, c.seed), out, "customers",
        c.partitions),
      "merchants" -> writeCsv(
        g.merchants(spark, c.merchants, c.seed), out, "merchants",
        c.partitions),
      "transactions" -> writeCsv(
        g.transactions(spark, c.transactions, c.customers, c.merchants,
          days = c.rateDays, seed = c.seed), out, "transactions",
        c.partitions),
      "exchange_rates" -> writeCsv(
        g.exchangeRates(spark, c.rateDays, c.seed), out, "exchange_rates",
        c.partitions))
    written.foreach { case (name, n) =>
      println(f"  $name%-15s $n%,d records -> ${c.outputDir}/$name.csv")
    }
    written.toMap
  }

  def main(args: Array[String]): Unit = {
    val c = try parse(args.toIndexedSeq) catch {
      case e: IllegalArgumentException =>
        // --help prints usage and exits 0, argparse-style; a genuine
        // arg error exits 2
        val isHelp = args.contains("--help") || args.contains("-h")
        (if (isHelp) System.out else System.err).println(e.getMessage)
        sys.exit(if (isHelp) 0 else 2)
    }
    val spark = GraftSession.local("graft-gendata",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    spark.sparkContext.setLogLevel("WARN")
    try {
      println(s"Generating synthetic fintech data (seed=${c.seed}) " +
        s"into ${c.outputDir}/")
      run(spark, c)
      println("done")
    } finally spark.stop()
  }
}
