package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.BenchDefense
import graft.util.BenchDefense.Entry

/** Deterministic spec for the contamination defense's decision core
  * (VERDICT r16 #1): the policy was previously ~80 lines inside Bench's
  * main, proven only by observing live sweeps — a regression there
  * silently corrupts the artifact of record. Every case here is a pure
  * function call; no Spark session, no clock, no files. */
class BenchDefenseSpec extends AnyFunSuite {
  private val D = BenchDefense

  // ------------------------------------------------------------- medians

  test("median takes the LOWER middle on even counts (conservative: " +
    "with {contaminated, honest} samples the honest one wins)") {
    assert(D.median(Seq(3.0)) == 3.0)
    assert(D.median(Seq(1.0, 9.0)) == 1.0) // lower, not mean
    assert(D.median(Seq(9.0, 1.0, 5.0)) == 5.0)
    assert(D.median(Seq(4.0, 1.0, 9.0, 5.0)) == 4.0) // lower of {4,5}
  }

  test("medians drops empty sample lists (a median-less query can be " +
    "neither flagged nor re-run)") {
    val m = D.medians(Map("a" -> Seq(2.0, 4.0), "b" -> Nil))
    assert(m == Map("a" -> 2.0))
  }

  // ---------------------------------------------------------- candidates

  test("candidates: failed, fixture, sub-second, and <=2x entries are " +
    "all ineligible") {
    val meds = Map("q1_a" -> 2.0, "q2_b" -> 2.0, "fx1" -> 2.0,
      "q3_c" -> 0.3, "q4_d" -> 2.0)
    val timed = Seq(
      Entry("q1_a", 5.0, ok = false), // failed
      Entry("fx1", 9.0, ok = true), // fixture: re-run times the memo hit
      Entry("q3_c", 0.9, ok = true), // sub-second: scheduler jitter
      Entry("q2_b", 4.0, ok = true), // exactly 2x is NOT >2x
      Entry("q4_d", 4.01, ok = true), // the only real candidate
      Entry("q9_nohist", 50.0, ok = true)) // no median -> not flaggable
    val (rerun, overflow) = D.candidates(timed, meds, cap = 12)
    assert(rerun.map(_.name) == Seq("q4_d"))
    assert(overflow.isEmpty)
  }

  test("candidates order by overshoot RATIO descending, not absolute " +
    "time, and split at the cap with overflow preserved") {
    val meds = Map("q1_a" -> 3.0, "q2_b" -> 1.0, "q3_c" -> 2.0)
    val timed = Seq(
      Entry("q1_a", 7.0, ok = true), // 2.33x (biggest absolute)
      Entry("q2_b", 5.0, ok = true), // 5x    (worst lie)
      Entry("q3_c", 6.0, ok = true)) // 3x
    val (rerun, overflow) = D.candidates(timed, meds, cap = 2)
    assert(rerun.map(_.name) == Seq("q2_b", "q3_c"))
    assert(overflow.map(_.name) == Seq("q1_a"))
  }

  test("cap saturation: overflow entries keep their measured values and " +
    "STILL flag suspect (saturation is visible, never silent)") {
    val meds = (1 to 15).map(i => f"q$i%02d_x" -> 1.0).toMap
    val timed = (1 to 15).map(i => Entry(f"q$i%02d_x", 3.0 + i, ok = true))
    val (rerun, overflow) = D.candidates(timed, meds, cap = 12)
    assert(rerun.size == 12 && overflow.size == 3)
    // suppose every re-run settled back to its clean level but the
    // overflow entries were never touched
    val settled = timed.map { e =>
      if (rerun.exists(_.name == e.name)) e.copy(sec = 1.0) else e
    }
    val sus = D.suspects(settled, meds)
    assert(sus == overflow.map(_.name).toSet)
  }

  // --------------------------------------------------------------- settle

  /** Scripted sampler: returns the queued samples in order. */
  private def sampler(samples: Option[Double]*): (() => Option[Double], () => Int) = {
    val q = scala.collection.mutable.Queue(samples: _*)
    var calls = 0
    (() => { calls += 1; q.dequeue() }, () => calls)
  }

  test("settle: transient contention — one re-run below 2x median stops " +
    "at min-of-2 (no second sample burned)") {
    val (s, calls) = sampler(Some(1.5), Some(0.1))
    assert(D.settle(9.0, Some(1.0), s).contains(1.5))
    assert(calls() == 1)
  }

  test("settle: sustained contention — min-of-2 still >2x median " +
    "triggers exactly one more sample; result is min-of-3") {
    val (s, calls) = sampler(Some(8.0), Some(1.2))
    assert(D.settle(9.0, Some(1.0), s).contains(1.2))
    assert(calls() == 2)
  }

  test("settle: a failed FIRST re-run keeps the original timing " +
    "(returns None; the caller records t1, never a partial sample)") {
    val (s, calls) = sampler(None)
    assert(D.settle(9.0, Some(1.0), s).isEmpty)
    assert(calls() == 1)
  }

  test("settle: a failed SECOND sample keeps the min-of-2") {
    val (s, _) = sampler(Some(7.0), None)
    assert(D.settle(9.0, Some(1.0), s).contains(7.0))
  }

  test("settle: no trailing median means no second stage (nothing to " +
    "compare against) — min-of-2 only") {
    val (s, calls) = sampler(Some(8.5))
    assert(D.settle(9.0, None, s).contains(8.5))
    assert(calls() == 1)
  }

  test("settle never returns a value above the original measurement " +
    "(a slower re-run can only confirm, not worsen)") {
    val (s, _) = sampler(Some(20.0), Some(30.0))
    assert(D.settle(9.0, Some(1.0), s).contains(9.0))
  }

  // ------------------------------------------------------------- suspects

  test("suspects covers re-run survivors, cap overflow, and failed " +
    "re-runs alike (any FINAL value still >2x median)") {
    val meds = Map("q1_a" -> 1.0, "q2_b" -> 1.0, "q3_c" -> 1.0)
    val sweep = Seq(
      Entry("q1_a", 5.0, ok = true), // survivor: re-ran, still high
      Entry("q2_b", 1.1, ok = true), // defended back to clean
      Entry("q3_c", 9.0, ok = false)) // failed: goes to `failed`, not sus
    assert(D.suspects(sweep, meds) == Set("q1_a"))
  }

  test("fixtures are never re-run candidates (memoized builds — a re-run " +
    "times the memo hit) but DO flag suspect and median-carry: a hot " +
    "sweep's fixture value must not poison the trailing-median pool") {
    val meds = Map("fx1" -> 6.9)
    val timed = Seq(Entry("fx1", 14.3, ok = true)) // the r17 observed swing
    assert(D.candidates(timed, meds, cap = 12)._1.isEmpty)
    assert(D.candidates(timed, meds, cap = 12)._2.isEmpty)
    val sus = D.suspects(timed, meds)
    assert(sus == Set("fx1"))
    assert(D.historyValues(timed, sus, meds).toMap == Map("fx1" -> 6.9))
  }

  // --------------------------------------------------- history median-carry

  test("historyValues: suspects carry their trailing MEDIAN forward, " +
    "clean entries their measurement, failed entries nothing") {
    val meds = Map("q1_a" -> 2.0, "q2_b" -> 3.0)
    val sweep = Seq(
      Entry("q1_a", 9.0, ok = true), // suspect
      Entry("q2_b", 3.2, ok = true), // clean
      Entry("q3_c", 4.0, ok = false)) // failed
    val hv = D.historyValues(sweep, Set("q1_a"), meds).toMap
    assert(hv == Map("q1_a" -> 2.0, "q2_b" -> 3.2))
  }

  test("a persistent regression never ages out of the median pool and " +
    "is re-flagged EVERY sweep until a diff owns it (median-carry " +
    "across a bounded 5-line history window)") {
    // clean history: the query ran at 2.0 s for five sweeps
    var window: Seq[Map[String, Double]] =
      Seq.fill(5)(Map("q1_x" -> 2.0))
    // then the code (or host) regresses it to 10.0 s for eight sweeps —
    // three more than the window holds
    for (_ <- 1 to 8) {
      val hist = window.flatten.groupBy(_._1)
        .view.mapValues(_.map(_._2).toSeq).toMap
      val meds = D.medians(hist)
      val sweep = Seq(Entry("q1_x", 10.0, ok = true))
      val sus = D.suspects(sweep, meds)
      assert(sus.contains("q1_x"), "regression must stay flagged")
      val hv = D.historyValues(sweep, sus, meds).toMap
      assert(hv("q1_x") == 2.0,
        "history must carry the clean median, not the regressed sample")
      window = (window :+ hv).takeRight(5)
    }
  }

  test("WITHOUT median-carry the same regression would silently " +
    "rebaseline after the window fills (the failure mode the policy " +
    "exists to prevent)") {
    var window: Seq[Map[String, Double]] = Seq.fill(5)(Map("q1_x" -> 2.0))
    var flaggedLast = true
    for (_ <- 1 to 8) {
      val hist = window.flatten.groupBy(_._1)
        .view.mapValues(_.map(_._2).toSeq).toMap
      val meds = D.medians(hist)
      val sweep = Seq(Entry("q1_x", 10.0, ok = true))
      flaggedLast = D.suspects(sweep, meds).contains("q1_x")
      // naive policy: record the measured value regardless
      window = (window :+ Map("q1_x" -> 10.0)).takeRight(5)
    }
    assert(!flaggedLast, "control: naive recording stops flagging — " +
      "this documents WHY historyValues median-carries")
  }

  // ------------------------------------------------------------- seed pool

  test("seedPool drops failed AND suspect entries — a suspect's sec is " +
    "the still-contaminated measurement; seeding from it would " +
    "rebaseline the defense on the contamination it flagged") {
    val seeded = D.seedPool(Seq(
      ("q1_a", 2.0, true, false), // clean -> seeds
      ("q2_b", 9.0, true, true), // suspect -> dropped
      ("q3_c", 4.0, false, false))) // failed -> dropped
    assert(seeded == Map("q1_a" -> 2.0))
  }

  // ------------------------------------------------------- history parsing

  test("historyPool: same-(sf, ann) lines only, last-5 window, malformed " +
    "lines skipped — a corrupt history degrades the defense, never " +
    "crashes the bench") {
    def line(sf: String, ann: String, v: Double) =
      s"""{"sf":"$sf","ann":"$ann","queries":{"q1_a":$v}}"""
    val lines = Seq(
      line("/x/sf0.1", "sublinear", 1.0), // oldest matching (clipped by window)
      "{not json",                        // malformed: skipped
      line("/", "sublinear", 77.0),       // root sf: getFileName is null —
                                          // must drop ALONE, not NPE the pool
      line("sf0.01", "sublinear", 99.0),  // other SF: excluded
      line("sf0.1", "full", 88.0),        // other ANN config: excluded
      line("sf0.1", "sublinear", 2.0),
      line("sf0.1", "sublinear", 3.0),
      line("/y/sf0.1", "sublinear", 4.0), // sf matched on BASENAME
      line("sf0.1", "sublinear", 5.0),
      line("sf0.1", "sublinear", 6.0))
    val pool = D.historyPool(lines, "sf0.1", "sublinear", window = 5)
    // six matching lines; the window keeps the LAST five (1.0 aged out)
    assert(pool == Map("q1_a" -> Seq(2.0, 3.0, 4.0, 5.0, 6.0)))
  }

  test("seedFromFull: parses the bench_full.json shape, rejects a " +
    "different (sf, ann) artifact, and drops failed + suspect entries") {
    val doc =
      """{"metric":"total","value":9.9,"unit":"sec","ann":"sublinear",
        |"rr":1,"sf":"/root/testdata/sf0.1","queries":[
        |{"name":"q1_a","sec":2.0,"ok":true},
        |{"name":"q2_b","sec":9.0,"ok":true,"suspect":true},
        |{"name":"q3_c","sec":4.0,"ok":false}]}""".stripMargin
    assert(D.seedFromFull(doc, "sf0.1", "sublinear")
      .contains(Map("q1_a" -> 2.0)))
    assert(D.seedFromFull(doc, "sf0.01", "sublinear").isEmpty) // other SF
    assert(D.seedFromFull(doc, "sf0.1", "full").isEmpty) // other ANN
    assert(D.seedFromFull("{broken", "sf0.1", "sublinear").isEmpty)
  }

  // ----------------------------------------------------------- machine line

  test("machineKey drops the q prefix and the suffix; fixture keys " +
    "keep theirs") {
    assert(D.machineKey("q151_time_travel") == "151")
    assert(D.machineKey("q09b_approx_distinct") == "09b")
    assert(D.machineKey("fx1") == "fx1")
  }

  test("fAdaptive: 0.1 s resolution at >=1 s, 0.01 s below, trailing " +
    "zeros trimmed") {
    assert(D.fAdaptive(12.34) == "12.3")
    assert(D.fAdaptive(0.25) == "0.25")
    assert(D.fAdaptive(0.20) == "0.2")
    assert(D.fAdaptive(1.0) == "1")
    assert(D.fAdaptive(0.0) == "0")
  }

  private def parse(line: String) =
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)

  test("machine line at the ACTUAL sweep key set under worst-case " +
    "values + failed + rr + sus keeps per-query entries inside the " +
    "1900-char budget (VERDICT r16 #7) — fails when query growth " +
    "outruns the window, which is the moment to re-budget") {
    // the real keys the driver will see this round: every SparkEntry
    // query plus every fixture group. Values at the worst width the
    // integer-seconds rung prints (2 chars, "88") — the envelope the
    // window must hold with EVERY key present; r16's real sweep already
    // ran at the 0.1 s rung with only ~57 chars of headroom, which is
    // exactly why the integer rung exists.
    val fxNames = (graft.queries.VersionedQueries.fixtureGroups ++
      graft.queries.VectorQueries.fixtureGroups).map(_._1)
    val names = SparkEntry.queries.keys.toSeq ++ fxNames
    val qs = names.map(_ -> 88.8).toMap
    val ml = D.machineLine(qs, failed = Seq("q999_gone"),
      rrCount = 12, susCount = 29, sfBase = "sf0.1")
    assert(ml.line.length <= 1900,
      s"machine line ${ml.line.length} chars would clip the tail window")
    assert(ml.degraded <= 2,
      "per-query entries must survive at the current key count — " +
        s"${names.size} keys no longer fit even at integer resolution")
    val n = parse(ml.line)
    assert(n.path("queries").size == names.size)
    assert(n.path("failed").get(0).asText == "999")
    assert(n.path("rr").asInt == 12)
    assert(n.path("sus").asInt == 29)
    assert(n.path("sf").asText == "sf0.1")
    // fixture keys sort LAST: a future overflow clips the header, never
    // the fx choreography numbers
    val keys = n.path("queries").fieldNames()
    var last = ""
    while (keys.hasNext) last = keys.next()
    assert(last.startsWith("fx"))
  }

  test("machine line degrades adaptive -> coarse -> integer -> " +
    "total-only, and the emitted line NEVER exceeds the budget") {
    // enough sub-second keys that adaptive (2-decimal) precision
    // overflows a shrunk budget but coarse (1-decimal) fits
    val qs = (1 to 60).map(i => f"q${i + 100}_n" -> 0.55).toMap
    val adaptiveLen = D.machineLine(qs, Nil, 0, 0, "sf0.1",
      limit = 100000).line.length
    val coarse = D.machineLine(qs, Nil, 0, 0, "sf0.1",
      limit = adaptiveLen - 1)
    assert(coarse.degraded == 1 && coarse.line.length < adaptiveLen)
    assert(parse(coarse.line).path("queries").size == 60)
    // shrink past coarse: integer seconds still keeps every key
    val ints = (1 to 60).map(i => f"q${i + 100}_n" -> 5.5).toMap
    val intLen0 = D.machineLine(ints, Nil, 0, 0, "sf0.1",
      limit = 100000).line.length
    val integer = D.machineLine(ints, Nil, 0, 0, "sf0.1",
      limit = intLen0 - 1)
    assert(integer.degraded == 2)
    val in = parse(integer.line)
    assert(in.path("queries").size == 60)
    assert(in.path("queries").path("101").asInt == 6) // %.0f rounds 5.5
    // values rounding to a multiple of 10 keep their significant zeros
    // at the integer rung — the decimal-tail trim must never touch a
    // pointless %.0f string (10.2 → "1" would 10x-under-report)
    assert(D.fInt(10.2) == "10")
    assert(D.fInt(100.0) == "100")
    assert(D.fInt(0.4) == "0")
    // even integers can't fit 10k keys in 1900 chars -> total-only
    val huge = (1 to 10000).map(i => f"q${i + 10000}_n" -> 5.0).toMap
    val to = D.machineLine(huge, Seq("q1_x"), 3, 2, "sf0.1")
    assert(to.degraded == 3 && to.line.length <= 1900)
    val n = parse(to.line)
    assert(n.path("queries").size == 0)
    assert(n.path("value").asDouble == 50000.0)
    assert(n.path("failed").get(0).asText == "1")
  }

  test("sus field is ALWAYS present, zero included (r17 #7: omitting it " +
    "at zero made 'no suspects' indistinguishable from 'field not " +
    "emitted by this version' in the driver's trend view)") {
    val ml = D.machineLine(Map("q1_a" -> 1.0), Nil, 0, 0, "sf0.1")
    assert(parse(ml.line).path("sus").asInt == 0)
    assert(parse(ml.line).path("rr").asInt == 0)
    val ml2 = D.machineLine(Map("q1_a" -> 1.0), Nil, 1, 3, "sf0.1")
    assert(parse(ml2.line).path("sus").asInt == 3)
  }

  // ---------------------------------------------------------- tail emission

  test("tailEmission: machine line LAST, notices strictly before the " +
    "breakdown, ann line immediately before the machine line — the " +
    "order that makes head-clipping harmless (r17's parsed:null was a " +
    "stderr notice interleaving AFTER the stdout machine line)") {
    val notices = Seq("[bench] cap hit", "[bench] degraded to 0.1 s")
    val breakdown = Seq("bench q1_a 1.234", "bench q2_b 2.345")
    val machine = """{"metric":"total","value":3.6}"""
    val out = D.tailEmission(notices, breakdown, "bench-ann sublinear",
      machine)
    assert(out.last == machine, "machine line must be the final element")
    assert(out(out.size - 2) == "bench-ann sublinear")
    assert(out.take(2) == notices)
    assert(out.slice(2, 4) == breakdown)
    assert(out.size == notices.size + breakdown.size + 2)
  }

  test("tailEmission with no notices still ends on the machine line and " +
    "keeps every breakdown line") {
    val out = D.tailEmission(Nil, Seq("bench q1_a 1.0"), "bench-ann full",
      "{}")
    assert(out == Seq("bench q1_a 1.0", "bench-ann full", "{}"))
  }
}
