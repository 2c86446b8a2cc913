#!/usr/bin/env python3
"""Selftest for tools/accept_regression.py (VERDICT r17 #3).

accept_regression.py is the one tool whose job is to REWRITE the artifact
of record (bench_history.jsonl) — the same silent-corruption risk class
that motivated extracting BenchDefense into a specced module. A bug in its
(sf, ann) line matching or value rewrite silently corrupts the median pool
it exists to maintain. Each case below runs the real script in a scratch
dir via subprocess and asserts on exit code, stdout, and the exact bytes
of the rewritten history.

Run: python3 tools/test_accept_regression.py   (exit 0 iff all green)
"""
import json
import os
import subprocess
import sys
import tempfile

TOOL = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "accept_regression.py")


def run(cwd, *args):
    return subprocess.run([sys.executable, TOOL, *args], cwd=cwd,
                          capture_output=True, text=True)


def full_doc(entries, sf="/root/testdata/sf0.1", ann="sublinear"):
    return json.dumps({"metric": "total", "value": 1.0, "unit": "sec",
                       "ann": ann, "rr": 0, "sf": sf, "queries": entries})


def hist_line(queries, sf="sf0.1", ann="sublinear"):
    return json.dumps({"sf": sf, "ann": ann, "queries": queries},
                      separators=(",", ":"))


def scratch(full, hist_lines):
    d = tempfile.mkdtemp(prefix="accept_reg_test_")
    with open(os.path.join(d, "bench_full.json"), "w") as f:
        f.write(full + "\n")
    with open(os.path.join(d, "bench_history.jsonl"), "w") as f:
        f.write("\n".join(hist_lines) + "\n")
    return d


def read_hist(d):
    with open(os.path.join(d, "bench_history.jsonl")) as f:
        return f.read()


failures = []


def check(name, cond, detail=""):
    status = "ok" if cond else "FAIL"
    print(f"{name:58s} {status} {detail if not cond else ''}")
    if not cond:
        failures.append(name)


# --- unknown query: exits nonzero, history untouched -----------------------
d = scratch(full_doc([{"name": "q1_a", "sec": 2.0, "ok": True}]),
            [hist_line({"q1_a": 2.0})])
before = read_hist(d)
r = run(d, "q99_ghost")
check("unknown query exits nonzero", r.returncode != 0)
check("unknown query leaves history byte-identical", read_hist(d) == before)

# --- failed entry: refused --------------------------------------------------
d = scratch(full_doc([{"name": "q1_a", "sec": 2.0, "ok": False}]),
            [hist_line({"q1_a": 2.0})])
before = read_hist(d)
r = run(d, "q1_a")
check("failed sweep entry refused (nonzero exit)", r.returncode != 0)
check("failed entry leaves history byte-identical", read_hist(d) == before)

# --- only matching-(sf, ann) lines rewritten; others byte-identical ---------
other_sf = hist_line({"q1_a": 1.0}, sf="sf0.01")
other_ann = hist_line({"q1_a": 1.0}, ann="full")
no_key = hist_line({"q2_b": 3.0})
match1 = hist_line({"q1_a": 1.0, "q2_b": 3.0})
match2 = hist_line({"q1_a": 1.1}, sf="/abs/path/sf0.1")  # basename match
d = scratch(
    full_doc([{"name": "q1_a", "sec": 9.5, "ok": True, "suspect": True}]),
    [other_sf, other_ann, no_key, match1, match2])
r = run(d, "q1_a")
lines = read_hist(d).splitlines()
check("accept run exits zero", r.returncode == 0, r.stdout + r.stderr)
check("non-matching sf line byte-identical", lines[0] == other_sf)
check("non-matching ann line byte-identical", lines[1] == other_ann)
check("matching line without the key byte-identical", lines[2] == no_key)
check("matching line rewritten to accepted value",
      json.loads(lines[3])["queries"]["q1_a"] == 9.5)
check("rewrite preserves sibling keys in the same line",
      json.loads(lines[3])["queries"]["q2_b"] == 3.0)
check("sf matched on BASENAME (abs-path line rewritten too)",
      json.loads(lines[4])["queries"]["q1_a"] == 9.5)
check("reports rewritten-line count",
      "rewrote 2 history line(s)" in r.stdout, r.stdout)

# --- idempotent on re-run ----------------------------------------------------
after_first = read_hist(d)
r2 = run(d, "q1_a")
check("re-run exits zero", r2.returncode == 0)
check("re-run is idempotent (history byte-identical)",
      read_hist(d) == after_first)

# --- non-suspect entry: accepted with an explicit note -----------------------
d = scratch(full_doc([{"name": "q1_a", "sec": 4.0, "ok": True}]),
            [hist_line({"q1_a": 2.0})])
r = run(d, "q1_a")
check("non-suspect entry accepted (exit zero)", r.returncode == 0)
check("non-suspect acceptance prints the 'not flagged suspect' note",
      "not flagged suspect" in r.stdout, r.stdout)
check("non-suspect value rewritten",
      json.loads(read_hist(d))["queries"]["q1_a"] == 4.0)

# --- malformed history line: passed through untouched, still rewrites -------
bad = "{not json"
d = scratch(full_doc([{"name": "q1_a", "sec": 5.0, "ok": True,
                       "suspect": True}]),
            [bad, hist_line({"q1_a": 2.0})])
r = run(d, "q1_a")
lines = read_hist(d).splitlines()
check("malformed line passes through byte-identical", lines[0] == bad)
check("malformed line does not block the rewrite",
      r.returncode == 0 and json.loads(lines[1])["queries"]["q1_a"] == 5.0)
check("malformed passthrough is reported",
      "malformed history line(s) passed through" in r.stdout, r.stdout)

# --- no matching history lines: refused --------------------------------------
d = scratch(full_doc([{"name": "q1_a", "sec": 5.0, "ok": True}]),
            [hist_line({"q1_a": 2.0}, sf="sf0.01")])
before = read_hist(d)
r = run(d, "q1_a")
check("no matching (sf, ann) lines exits nonzero", r.returncode != 0)
check("no-match run leaves history byte-identical", read_hist(d) == before)

# --- missing artifacts: refused ----------------------------------------------
d = tempfile.mkdtemp(prefix="accept_reg_test_")
r = run(d, "q1_a")
check("missing bench_full.json exits nonzero", r.returncode != 0)
with open(os.path.join(d, "bench_full.json"), "w") as f:
    f.write(full_doc([{"name": "q1_a", "sec": 5.0, "ok": True}]))
r = run(d, "q1_a")
check("missing bench_history.jsonl exits nonzero", r.returncode != 0)

# --- trailing median mirrors the FLAG-TIME window (ADVICE r17 + r18) --------
# The flagging sweep computes its medians from the last 5 matching lines
# and THEN appends its own line; by the time this tool runs, that append
# is the final matching line. The reported median must therefore window
# matched_old[:-1][-5:]: exclude the post-flag append, take the last 5
# matching LINES (not the last 5 key-bearing values), then the key's
# values from those lines.
#
# Shape that distinguishes all three candidate semantics —
# lines (old->new): {q:9}, {no key}, {q:1}, {q:1}, {q:1}, {q:1}, append {q:5}
#   flag-time window  = lines[1:6]      -> values {1,1,1,1}      -> 1.000
#   naive last-5-lines = lines[2:7]     -> values {1,1,1,5}      -> 1.000
#   last-5 key-bearing values           -> {1,1,1,1,5}           -> 1.000
# (medians are robust; most shapes agree) — so assert the boundary cases
# instead, where the semantics differ observably:
# (a) append-exclusion: ONE matching line total (the append itself) ->
#     flag-time window is empty -> "median-less", even though the line
#     carries the key;
append_only = hist_line({"q1_a": 5.0})
d = scratch(full_doc([{"name": "q1_a", "sec": 5.0, "ok": True,
                       "suspect": True}]), [append_only])
r = run(d, "q1_a")
check("single matching line (the flagged sweep's own append) -> "
      "median-less (the append is excluded from the flag-time window)",
      r.returncode == 0 and "median-less" in r.stdout, r.stdout)
# (b) line-window semantics: ALL of the 5 pre-append matching lines lack
#     the key (older lines have it) -> median-less, never a median
#     scavenged from older key-bearing lines
old_keyed = hist_line({"q1_a": 7.7})
recent = [hist_line({"q2_b": 1.0}) for _ in range(5)]
append = hist_line({"q1_a": 5.0})
d = scratch(full_doc([{"name": "q1_a", "sec": 5.0, "ok": True,
                       "suspect": True}]),
            [old_keyed] + recent + [append])
r = run(d, "q1_a")
check("median window is the last-5 MATCHING LINES before the append "
      "(key aged out -> reported median-less, value still accepted)",
      r.returncode == 0 and "median-less" in r.stdout
      and "7.7" not in r.stdout, r.stdout)
check("aged-out case still rewrites the old keyed line",
      json.loads(read_hist(d).splitlines()[0])["queries"]["q1_a"] == 5.0)
# (c) the normal flow: 5 keyed pre-append lines + the append -> median of
#     the five pre-append values, NOT influenced by the append's value
pre = [hist_line({"q1_a": v}) for v in (2.0, 2.2, 2.4, 2.6, 2.8)]
d = scratch(full_doc([{"name": "q1_a", "sec": 9.0, "ok": True,
                       "suspect": True}]),
            pre + [hist_line({"q1_a": 9.0})])
r = run(d, "q1_a")
check("normal flow reports the pre-append lower-middle median (2.400)",
      "2.400" in r.stdout, r.stdout)

print()
if failures:
    print(f"FAILING ({len(failures)}): " + ", ".join(failures))
    sys.exit(1)
print("ALL OK")
