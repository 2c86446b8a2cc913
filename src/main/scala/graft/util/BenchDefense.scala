package graft.util

/** Pure decision core of Bench's contamination defense (VERDICT r16 #1).
  *
  * The defense protects the artifact of record from transient host
  * contention: any successful query measuring >2x its trailing-median
  * history gets bounded re-runs, survivors are flagged `suspect`, and the
  * history pool carries a suspect's MEDIAN forward instead of its
  * contaminated sample. Every decision in that loop lives here as a
  * side-effect-free function — Bench supplies only the I/O (running
  * queries, reading/writing history files) — so the policy is testable
  * deterministically (BenchDefenseSpec) instead of being provable only by
  * observing live sweeps, whose failure mode is a silently corrupted
  * artifact.
  *
  * Policy invariants the spec pins:
  *  - cap saturation leaves overflow candidates in the sweep with their
  *    measured (possibly contaminated) values, and they STILL flag suspect;
  *  - a suspect's measured value never enters the median pool, but the key
  *    never ages out either (median-carry) — a persistent regression is
  *    re-flagged every sweep until a code diff owns it;
  *  - the bench_full.json seed path drops suspect entries — their `sec` is
  *    by design the still-contaminated measurement, and seeding medians
  *    from it would rebaseline the defense on the very contamination it
  *    flagged;
  *  - a failed re-run keeps the original timing (never a partial sample).
  */
object BenchDefense {

  /** One sweep measurement: query name, seconds, success. */
  final case class Entry(name: String, sec: Double, ok: Boolean)

  /** LOWER middle on even counts: with {contaminated, honest} samples the
    * lower one is the honest baseline, and a low median means MORE re-run
    * candidates — conservative in the right direction (the cost of a
    * false positive is one bounded re-run). */
  def median(xs: Seq[Double]): Double = {
    require(xs.nonEmpty, "median of empty sample set")
    val s = xs.sorted
    s((s.size - 1) / 2)
  }

  /** Per-query trailing medians from the history pool (empty sample lists
    * dropped — a median-less query can be neither flagged nor re-run). */
  def medians(history: Map[String, Seq[Double]]): Map[String, Double] =
    history.collect { case (n, xs) if xs.nonEmpty => n -> median(xs) }

  /** Whether an entry is RE-RUN-eligible: successful, not a fixture
    * (fixture builds memoize — a re-run times the memo hit, not the work),
    * above the 1 s scheduler-jitter floor, and >2x its trailing median. */
  def eligible(e: Entry, meds: Map[String, Double]): Boolean =
    e.ok && !e.name.startsWith("fx") && e.sec > 1.0 &&
      meds.get(e.name).exists(m => e.sec > 2 * m)

  /** Whether an entry's final value is elevated enough to FLAG — same
    * predicate as [[eligible]] but WITHOUT the fixture exclusion:
    * fixtures can't honestly re-run, but a hot sweep's fixture value must
    * still read as "may be a host lie" in the artifact and must
    * median-carry in history rather than poison the pool (r17: fx1 swung
    * 6.9→14.3 s on identical code across one session's sweeps, and the
    * old fx-excluded suspect set let the 14.3 enter the trailing-median
    * baseline unguarded). */
  def elevated(e: Entry, meds: Map[String, Double]): Boolean =
    e.ok && e.sec > 1.0 && meds.get(e.name).exists(m => e.sec > 2 * m)

  /** Re-run candidates ordered by OVERSHOOT RATIO descending (when the cap
    * saturates, a 5x phantom on a 2 s query matters more than a 2.1x on a
    * 6 s one — the worst lies get corrected first), split at `cap` into
    * (re-run, overflow). Overflow entries keep their measured values and
    * are flagged suspect downstream. */
  def candidates(timed: Seq[Entry], meds: Map[String, Double],
      cap: Int): (Seq[Entry], Seq[Entry]) = {
    val all = timed.filter(eligible(_, meds))
      .sortBy(e => -(e.sec / meds(e.name)))
    (all.take(cap), all.drop(cap))
  }

  /** Bounded re-run protocol for one candidate, pure given the sampler's
    * outputs (tests pass scripted samplers; Bench passes the effectful
    * query runner). One re-run, min-of-2; if the min is STILL >2x the
    * trailing median the contention is sustained, not transient — one more
    * sample at a third moment, min-of-3. Returns None when the FIRST
    * re-run fails (the caller keeps the original timing — a crash mid
    * re-run must never replace a complete measurement); a failed SECOND
    * sample keeps the min-of-2. */
  def settle(t1: Double, med: Option[Double],
      sample: () => Option[Double]): Option[Double] =
    sample().map { t2 =>
      val m1 = math.min(t1, t2)
      if (med.exists(m => m1 > 2 * m))
        sample().map(t3 => math.min(m1, t3)).getOrElse(m1)
      else m1
    }

  /** SUSPECT = any successful entry whose FINAL recorded value is still
    * >2x its trailing clean-sweep median — covers re-run survivors, cap
    * overflow, failed re-runs, AND fixtures (which are never re-run but
    * flag and median-carry like everything else; see [[elevated]]). */
  def suspects(sweep: Seq[Entry], meds: Map[String, Double]): Set[String] =
    sweep.filter(elevated(_, meds)).map(_.name).toSet

  /** The value an entry contributes to the NEXT sweep's history pool: a
    * suspect's measured value stays out (a still-contaminated sample would
    * inflate the very baseline the next sweep defends against), but the
    * key must not VANISH either — with a bounded history window,
    * consecutive suspect sweeps would age the query out of the median pool
    * entirely, and a median-less query can be neither flagged nor re-run:
    * a persistent regression would silently become the new unflagged
    * baseline. Suspects carry their trailing MEDIAN forward instead — the
    * clean level stays alive and the query stays flaggable every sweep
    * until a code diff owns it. Failed entries contribute nothing. */
  def historyValues(sweep: Seq[Entry], sus: Set[String],
      meds: Map[String, Double]): Seq[(String, Double)] =
    sweep.collect {
      case Entry(n, t, true) =>
        n -> (if (sus.contains(n)) meds(n) else t)
    }

  /** Seed the history pool from a previous round's bench_full.json entries
    * (name, sec, ok, suspect) when bench_history.jsonl is absent: failed
    * entries are dropped, and so are SUSPECT entries — their `sec` is by
    * design the still-contaminated measured value (the honest median lives
    * only in the history file, absent on this path), and seeding medians
    * from it would rebaseline the defense on the contamination it
    * flagged. */
  def seedPool(
      entries: Seq[(String, Double, Boolean, Boolean)]): Map[String, Double] =
    entries.collect {
      case (n, sec, true, false) => n -> sec
    }.toMap

  // ------------------------------------------------- history parsing

  /** Parse bench_history.jsonl lines into the trailing-median sample
    * pool: same-(sf, ann) lines only — sublinear and full-coverage ANN
    * timings differ by design, and cross-SF samples are not comparable —
    * clipped to the last `window` matching lines, malformed lines
    * skipped (a corrupt history line must degrade the defense, never
    * crash the bench). Pure given the line strings; Bench supplies the
    * file read. */
  def historyPool(lines: Seq[String], sfBase: String, ann: String,
      window: Int = 5): Map[String, Seq[Double]] = {
    import scala.jdk.CollectionConverters._
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    // ONE Try per line covering parse AND field extraction: the contract
    // is per-line tolerance — a bad line (truncated JSON, a pathological
    // "sf" value) must drop ALONE, never collapse the rest of the pool
    // (review catch, r17: an escaping exception here would skip the
    // remaining valid lines AND the seed fallback, silently running the
    // whole defense median-less)
    val samples: Seq[Map[String, Double]] = lines
      .filter(_.trim.nonEmpty)
      .flatMap { l =>
        scala.util.Try {
          val n = om.readTree(l)
          if (!sameRun(n, sfBase, ann)) None
          else Some(
            // fields() not properties(): properties() is Jackson 2.15+
            // and its absence on an older shaded Jackson is a
            // NoSuchMethodError — an Error, not NonFatal — that would
            // crash the whole bench instead of degrading this
            // best-effort block to empty history
            n.path("queries").fields().asScala
              .map(e => e.getKey -> e.getValue.asDouble).toMap)
        }.toOption.flatten
      }
    samples.takeRight(window).flatten.groupBy(_._1)
      .view.mapValues(_.map(_._2).toSeq).toMap
  }

  /** Seed pool from a previous round's bench_full.json document when no
    * history lines exist: None when the artifact is for a different
    * (sf, ann) run or unparseable — the defense then starts cold, which
    * only costs re-runs, never correctness. Suspect/failed entries are
    * dropped by [[seedPool]]. */
  def seedFromFull(json: String, sfBase: String,
      ann: String): Option[Map[String, Double]] = {
    import scala.jdk.CollectionConverters._
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    scala.util.Try(om.readTree(json)).toOption
      .filter(n => sameRun(n, sfBase, ann))
      .map { n =>
        seedPool(n.path("queries").elements().asScala.map { e =>
          (e.path("name").asText, e.path("sec").asDouble,
            e.path("ok").asBoolean(false),
            e.path("suspect").asBoolean(false))
        }.toSeq)
      }
  }

  private def sameRun(n: com.fasterxml.jackson.databind.JsonNode,
      sfBase: String, ann: String): Boolean = {
    val sf = n.path("sf").asText
    // getFileName is NULL for root paths ("/") — Option-wrap so a
    // pathological sf value reads as not-same-run instead of an NPE
    sf.nonEmpty &&
      Option(java.nio.file.Paths.get(sf).getFileName)
        .map(_.toString).contains(sfBase) &&
      n.path("ann").asText("") == ann
  }

  // ---------------------------------------------------- machine line

  /** Driver machine key: queries drop the redundant "q" prefix and
    * anything after the first underscore ("q151_x" -> "151"); fixture keys
    * keep theirs ("fx1"). */
  def machineKey(name: String): String = {
    val s = name.takeWhile(_ != '_')
    if (s.startsWith("q")) s.drop(1) else s
  }

  /** Adaptive per-value precision: >=1 s at 0.1 s resolution, <1 s at
    * 0.01 s, trailing zeros trimmed. Full 3-decimal values live in the
    * breakdown lines and bench_full.json. */
  def fAdaptive(v: Double): String =
    trim(Fmt.fmt(if (v >= 1) "%.1f" else "%.2f", v))

  /** Coarse 0.1 s resolution for every value — the first degrade step. */
  def fCoarse(v: Double): String = trim(Fmt.fmt("%.1f", v))

  /** Integer-second resolution — the second degrade step (r17): at 189
    * keys the coarse line held only ~57 chars of headroom against a sweep
    * whose values all print 3 chars at 0.1 s resolution (r16's real line:
    * 1843 chars), so one more realistic sweep shape away from total-only.
    * Whole seconds keep every key present (a missing key reads as a
    * failure) at ~1.5 fewer chars each — coarse-but-keyed beats
    * total-only. NO trim here: trim exists to strip a decimal tail
    * ("9.90" → "9.9") and stops at the '.', but a %.0f string has no
    * point, so trimming would strip SIGNIFICANT zeros (10 → "1",
    * 100 → "1") — a 10x under-report in the artifact (review catch,
    * r17). */
  def fInt(v: Double): String = Fmt.fmt("%.0f", v)

  private def trim(s: String): String = {
    val t = s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
    if (t.isEmpty) "0" else t
  }

  /** The one JSON line the driver parses, plus how far the precision
    * ladder degraded to fit the tail window: 0 = adaptive precision,
    * 1 = coarse 0.1 s everywhere, 2 = integer seconds everywhere,
    * 3 = total-only (per-query entries dropped). The driver records only
    * the LAST ~2000 chars of output and sbt appends its own ~75-char
    * trailer, so a line longer than `limit` gets its HEAD clipped
    * (rounds 5-13: parsed=null) — coarse beats clipped, keyed beats
    * keyless, and a short line that always parses whole beats a precise
    * line recorded headless. Fixture keys sort LAST so any future overflow
    * clips the header first, never the fx choreography numbers. */
  final case class MachineLine(line: String, degraded: Int)

  def machineLine(results: Map[String, Double], failed: Seq[String],
      rrCount: Int, susCount: Int, sfBase: String,
      limit: Int = 1900): MachineLine = {
    val (fxRes, qRes) = results.toSeq.sortBy(_._1)
      .partition(_._1.startsWith("fx"))
    val total = results.values.sum
    val failedJson =
      if (failed.isEmpty) ""
      else failed.map(n => Fmt.jsonString(machineKey(n)))
        .mkString(""","failed":[""", ",", "]")
    // "sus" is ALWAYS present (r17 verdict #7): omitting it at zero saved
    // ~8 chars but made "no suspects" indistinguishable from "field not
    // emitted by this version" in the driver's trend view; the integer
    // rung bought the headroom back
    val susJson = s""","sus":$susCount"""
    def mkLine(entries: String) =
      s"""{"metric":"total","value":${Fmt.fmt("%.1f", total)},"unit":"sec","queries":$entries$failedJson,"rr":$rrCount$susJson,"sf":${Fmt.jsonString(sfBase)}}"""
    def mkEntries(f: Double => String) = (qRes ++ fxRes)
      .map { case (k, v) => "\"" + machineKey(k) + "\":" + f(v) }
      .mkString("{", ",", "}")
    val ladder = Seq[Double => String](fAdaptive, fCoarse, fInt)
      .map(f => mkLine(mkEntries(f)))
    ladder.indexWhere(_.length <= limit) match {
      case -1 => MachineLine(mkLine("{}"), 3)
      case i => MachineLine(ladder(i), i)
    }
  }

  // ------------------------------------------------------- tail emission

  /** The bench tail's COMPLETE stdout emission, in order: notices first
    * (cap-hit, suspect, degrade — bytes before the machine line clip
    * harmlessly, the tail window drops the HEAD of the capture), then the
    * per-query breakdown, then the ann line, then the machine line LAST.
    *
    * Why a function for four concatenations: BENCH_r17.json was
    * `parsed: null` because the degrade notice — then a
    * `System.err.println` adjacent to the stdout machine line —
    * interleaved AFTER the line in the driver's merged capture and pushed
    * its head out of the ~2000-char tail window. stdout/stderr ordering
    * through sbt is nondeterministic at flush granularity, so any
    * stderr write near the end is a coin flip; BenchDefenseSpec pinned the
    * ladder lengths perfectly and still could not see it. Same-stream
    * emission assembled in ONE place makes "machine line last, nothing
    * after" a structural property the spec pins (tailEmission order)
    * instead of a convention the next edit can silently break. Bench
    * prints exactly these lines, in this order, after `spark.stop()`, and
    * returns. */
  def tailEmission(notices: Seq[String], breakdown: Seq[String],
      annLine: String, machineLine: String): Seq[String] =
    notices ++ breakdown ++ Seq(annLine, machineLine)
}
