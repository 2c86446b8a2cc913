#!/usr/bin/env bash
# Dual-SF oracle cross-check (VERDICT r16 #3): run the full Verify dump at
# BOTH sf0.001 and sf0.01 and compare every query against the DuckDB
# oracle at each scale. One command reproduces the sweep that caught the
# q09b 1-sigma statistics bug in r16 — a gate that only holds at one SF is
# tuned to a dataset, not to semantics.
#
# Usage: tools/dual_sf_check.sh [outBase]
#   outBase: scratch dir for the dumps (default /tmp/graft-dualsf).
# sfDir is passed EXPLICITLY to the checker at every call — selfcheck.py
# takes it positionally, and check_oracle.py's sf0.01 default has already
# caused one silent wrong-scale comparison (memory: check_oracle sfDir
# default trap).
#
# Exit 0 iff every query is green (ok or rows-only) at BOTH scales.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT_BASE="${1:-/tmp/graft-dualsf}"
SFS=("/root/testdata/sf0.001" "/root/testdata/sf0.01")

# one sbt invocation per SF (runMain compiles on the first call and reuses
# classes on the second). Verify CATCHES per-query exceptions (stderr line,
# exit 0, no dump dir) — so a "[verify] ... failed" line must fail THIS
# gate loudly (review catch, r17; selfcheck.py additionally flags any
# oracle key with no dump as MISSING-OUTPUT).
FAIL=0
for SF in "${SFS[@]}"; do
  SF_NAME="$(basename "$SF")"
  OUT="$OUT_BASE/$SF_NAME"
  rm -rf "$OUT" "${OUT}_inputs"
  mkdir -p "$OUT"
  echo "=== Verify dump @ $SF_NAME -> $OUT"
  LOG="$OUT_BASE/verify_$SF_NAME.log"
  sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | tee "$LOG"
  if grep -E "\[verify\] .* failed" "$LOG"; then
    echo "!!! Verify reported per-query failures at $SF_NAME (above)"
    FAIL=1
  fi
done

for SF in "${SFS[@]}"; do
  SF_NAME="$(basename "$SF")"
  OUT="$OUT_BASE/$SF_NAME"
  echo "=== DuckDB oracle compare @ $SF_NAME (sfDir passed explicitly)"
  if ! python3 tools/selfcheck.py "$SF" "$OUT"; then
    echo "!!! oracle compare FAILED at $SF_NAME"
    FAIL=1
  fi
done

if [ "$FAIL" -eq 0 ]; then
  echo "DUAL-SF CHECK: all queries green at both scales"
else
  echo "DUAL-SF CHECK: FAILURES above"
fi
exit "$FAIL"
