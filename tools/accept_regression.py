#!/usr/bin/env python3
"""Own a flagged bench regression: rebaseline one query's trailing-median
history at its latest measured value.

The contamination defense median-carries a suspect's history forever, so a
persistent regression is re-flagged every sweep "until a code diff owns
it" (SCALING.md, r16) — by design, the defense itself can never decide
that a slowdown is legitimate. This is the owning step: once the
regression is attributed to an accepted code change (worktree A/B, diff
scope), run

    python3 tools/accept_regression.py <query_name>

It takes the query's measured value from bench_full.json (the true
measurement the suspect flag preserved) and sets it in every
matching-(sf, ann) line of bench_history.jsonl, so the trailing median
moves to the accepted level immediately and the suspect flag clears on
the next sweep. Commit the rewritten history: the git diff IS the audit
trail of the owning decision — never run this to make a host-noise flag
go away (that is exactly the lie the defense exists to prevent; noise
clears itself on the next quiet sweep).
"""
import argparse
import json
import os
import sys

ap = argparse.ArgumentParser(
    description="rebaseline one query's bench history at its latest "
                "measured value (the manual 'owning' step for a real, "
                "accepted regression)")
ap.add_argument("query", help="full query name, e.g. q94_pagerank")
ap.add_argument("--full", default="bench_full.json",
                help="sweep artifact holding the measured value")
ap.add_argument("--history", default="bench_history.jsonl",
                help="trailing-median history to rewrite")
a = ap.parse_args()

try:
    full = json.load(open(a.full))
except FileNotFoundError:
    sys.exit(f"{a.full}: not found — run a bench sweep first")
except json.JSONDecodeError as e:
    sys.exit(f"{a.full}: unparseable ({e})")
entry = next((e for e in full["queries"] if e["name"] == a.query), None)
if entry is None:
    sys.exit(f"{a.query}: not in {a.full}")
if not entry.get("ok", False):
    sys.exit(f"{a.query}: failed in the recorded sweep — nothing to accept")
if not entry.get("suspect", False):
    print(f"note: {a.query} is not flagged suspect in {a.full} "
          "(the defense already settled it); accepting its value anyway")

val = round(entry["sec"], 3)
sf_base = os.path.basename(full.get("sf", "") or "")
ann = full.get("ann", "")

try:
    lines = [l for l in open(a.history).read().splitlines() if l.strip()]
except FileNotFoundError:
    sys.exit(f"{a.history}: not found — nothing to rebaseline")
out, touched, skipped = [], 0, 0
# per matching-(sf, ann) line: the query's OLD value, or None when the
# line lacks the key — the defense's trailing median windows the last 5
# MATCHING LINES first and then extracts the key (BenchDefense.historyPool
# + median), so the informational baseline below must do the same
# (ADVICE r17: olds[-5:] over key-bearing lines misstates the baseline
# when a recent matching line lacks the key)
matched_old = []
for l in lines:
    # per-line tolerance, mirroring BenchDefense.historyPool: a corrupt
    # line is skipped by the bench, so it can persist in the committed
    # file indefinitely — the owning tool must pass it through untouched
    # rather than crash on it
    try:
        n = json.loads(l)
    except json.JSONDecodeError:
        skipped += 1
        out.append(l)
        continue
    same = (os.path.basename(n.get("sf", "")) == sf_base
            and n.get("ann", "") == ann)
    if same:
        matched_old.append(n.get("queries", {}).get(a.query))
    if same and a.query in n.get("queries", {}):
        n["queries"][a.query] = val
        touched += 1
        out.append(json.dumps(n, separators=(",", ":")))
    else:
        out.append(l)
if touched == 0:
    sys.exit(f"{a.query}: no matching (sf={sf_base}, ann={ann}) history "
             f"lines in {a.history} — nothing to rebaseline")

with open(a.history, "w") as f:
    f.write("\n".join(out) + "\n")
if skipped:
    print(f"note: {skipped} malformed history line(s) passed through "
          "untouched (the bench skips them too)")
# report the median the defense was actually using AT FLAG TIME: the
# flagging sweep computed its medians BEFORE appending its own history
# line, so the window is the last 5 matching lines EXCLUDING the final
# one (the flagged sweep's own append — present whenever this tool runs
# in its intended place, right after the sweep that flagged). Then the
# query's values from those lines, lower middle — the same semantics as
# BenchDefense.historyPool + median (not the all-time median, nor a
# window over key-bearing lines only, nor a window that counts the
# post-flag append; each misstates the baseline the flag was computed
# against)
window = [v for v in matched_old[:-1][-5:] if v is not None]
if window:
    med = sorted(window)[(len(window) - 1) // 2]
    base = f"defense trailing median was {med:.3f}s"
else:
    base = ("the query had no value in the defense's last-5 line window "
            "— it was median-less, so never flagged")
print(f"{a.query}: accepted {val:.3f}s ({base}); rewrote {touched} "
      f"history line(s). Commit {a.history} to record the owning "
      "decision.")
