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

  /** Thrown for --help/-h: usage on stdout, exit 0 — distinct from a
    * genuine argument error (usage on stderr, exit 2). */
  final class HelpRequested(msg: String) extends IllegalArgumentException(msg)

  /** Pure argparse (exposed for the spec): unknown flags and non-numeric
    * values fail loudly with the usage string, like argparse does.
    * --help anywhere wins over other args (argparse precedence) — it must
    * never be silently consumed as another flag's VALUE. */
  def parse(args: Seq[String]): Config = {
    if (args.exists(a => a == "--help" || a == "-h"))
      throw new HelpRequested(usage)
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
      // a KNOWN flag as the last token: say "expects a value", not
      // "unknown arg" (argparse: "expected one argument")
      case flag :: Nil if valueFlags.contains(flag) =>
        throw new IllegalArgumentException(
          s"$flag expects a value\n$usage")
      case other :: _ =>
        throw new IllegalArgumentException(s"unknown arg '$other'\n$usage")
    }
    loop(args.toList, Config())
  }

  private val valueFlags = Set("--output-dir", "--seed", "--customers",
    "--merchants", "--transactions", "--rate-days", "--partitions")

  /** Write `df` as `<outDir>/<name>.csv` — a single file when
    * `partitions == 1` (the reference's contract), a directory of
    * `partitions` part files otherwise (the scale path). `repartition`,
    * not `coalesce`: coalesce can only REDUCE the source's partition
    * count (the generators inherit default parallelism), so `--partitions
    * 64` on a 4-core driver session would silently write 4 files — the
    * one shuffle buys the promised write-side fan-out. */
  private def writeCsv(df: DataFrame, outDir: Path, name: String,
      partitions: Int): Unit = {
    val target = outDir.resolve(s"$name.csv")
    util.Fs.deleteRecursively(target)
    val tmp = outDir.resolve(s".$name.csv.tmp")
    util.Fs.deleteRecursively(tmp)
    val shaped =
      if (partitions == 1) df.coalesce(1) else df.repartition(partitions)
    // emptyValue="": render empty strings bare (`,,`) like the
    // reference's csv.DictWriter, not Spark's default quoted `""`
    shaped.write.option("header", "true").option("emptyValue", "")
      .csv(tmp.toString)
    val listing = Files.list(tmp)
    val parts =
      try listing.iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-"))
        .toSeq.sortBy(_.toString)
      finally listing.close()
    // coalesce(1) guarantees a single part file today; if Spark ever emits
    // more, the single-FILE reference contract would silently degrade to a
    // directory — fail loudly instead (ADVICE r16)
    if (partitions == 1) require(parts.size <= 1,
      s"$name: coalesce(1) emitted ${parts.size} part files — " +
        "single-file contract broken")
    if (partitions == 1) {
      parts.headOption match {
        case Some(p) => Files.move(p, target)
        // zero part files (an empty dataset): the single-FILE contract
        // still holds, WITH the header line — the reference's DictWriter
        // always writes one, and a header-less empty CSV reads back as a
        // zero-COLUMN frame that breaks schema-dependent consumers
        case None =>
          Files.write(target,
            (df.columns.mkString(",") + "\n")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          ()
      }
      util.Fs.deleteRecursively(tmp)
    } else {
      // directory-of-parts: keep Spark's layout (with _SUCCESS) under the
      // dataset name so any downstream spark.read.csv(dir) just works
      Files.move(tmp, target)
    }
    ()
  }

  def run(spark: SparkSession, c: Config): Map[String, Long] = {
    val out = Paths.get(c.outputDir)
    Files.createDirectories(out)
    val g = generator.DataGenerator
    writeCsv(g.customers(spark, c.customers, c.seed), out, "customers",
      c.partitions)
    writeCsv(g.merchants(spark, c.merchants, c.seed), out, "merchants",
      c.partitions)
    writeCsv(g.transactions(spark, c.transactions, c.customers, c.merchants,
      days = c.rateDays, seed = c.seed), out, "transactions", c.partitions)
    writeCsv(g.exchangeRates(spark, c.rateDays, c.seed), out,
      "exchange_rates", c.partitions)
    // counts are fixed by construction (pure projections over range(n)) —
    // recounting would re-run the whole generation pipeline a second time
    // per dataset, doubling the work at the CLI's billion-row scale
    val written = Seq(
      "customers" -> math.max(c.customers, 0L),
      "merchants" -> math.max(c.merchants, 0L),
      "transactions" -> math.max(c.transactions, 0L),
      "exchange_rates" ->
        math.max(c.rateDays.toLong, 0L) * config.Enums.currencies.size)
    written.foreach { case (name, n) =>
      println(f"  $name%-15s $n%,d records -> ${c.outputDir}/$name.csv")
    }
    written.toMap
  }

  def main(args: Array[String]): Unit = {
    val c = try parse(args.toIndexedSeq) catch {
      // --help prints usage to stdout and exits 0, argparse-style;
      // a genuine arg error goes to stderr and exits 2
      case e: HelpRequested =>
        println(e.getMessage); sys.exit(0)
      case e: IllegalArgumentException =>
        System.err.println(e.getMessage); sys.exit(2)
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
