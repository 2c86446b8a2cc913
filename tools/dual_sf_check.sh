#!/usr/bin/env bash
# Dual-SF, dual-ARBITER oracle cross-check (VERDICT r16 #3, r17 #4): run
# the full Verify dump at BOTH sf0.001 and sf0.01, under BOTH commit
# arbiters (POSIX hard links and the object-store conditional-put
# arbiter), and compare every query against the DuckDB oracle at each
# scale. One command reproduces the sweep that caught the q09b 1-sigma
# statistics bug in r16, and re-proves per run that no code path silently
# assumes POSIX commit arbitration (the r17 arbiter-wide sweep, scripted
# so it can't decay into a one-time claim).
#
# Usage: tools/dual_sf_check.sh [outBase]
#   outBase: scratch dir for the dumps (default /tmp/graft-dualsf).
#   GRAFT_ARBITERS="posix" (env) restricts to one arbiter for a quick leg.
# sfDir is passed EXPLICITLY to the checker at every call — selfcheck.py
# takes it positionally, and check_oracle.py's sf0.01 default has already
# caused one silent wrong-scale comparison (memory: check_oracle sfDir
# default trap).
#
# Exit 0 iff every query is green (ok or rows-only) at BOTH scales under
# EVERY requested arbiter, and the tooling selftests pass.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT_BASE="${1:-/tmp/graft-dualsf}"
SFS=("/root/testdata/sf0.001" "/root/testdata/sf0.01")
ARBITERS=(${GRAFT_ARBITERS:-posix objectstore})
# fail loudly on a typo'd arbiter name: an unknown value would otherwise
# run a plain posix leg while every log line and the final green claim
# carried the bogus name — a false coverage statement
for ARB in "${ARBITERS[@]}"; do
  case "$ARB" in
    posix|objectstore|fileobjectstore) ;;
    *) echo "!!! unknown arbiter '$ARB' (valid: posix objectstore fileobjectstore)"; exit 2 ;;
  esac
done

FAIL=0

# cheap pre-step: the history-rewriting tool's selftest (VERDICT r17 #3) —
# a bug there corrupts the bench median pool as silently as a Verify bug
# corrupts the correctness gate, so the one-command reproduce covers both
echo "=== tools selftest: accept_regression.py"
if ! python3 tools/test_accept_regression.py; then
  echo "!!! accept_regression selftest FAILED"
  FAIL=1
fi

# one sbt invocation per (arbiter, SF) leg (runMain compiles on the first
# call and reuses classes after). Verify CATCHES per-query exceptions
# (stderr line, exit 0, no dump dir) — so a "[verify] ... failed" line must
# fail THIS gate loudly (review catch, r17; selfcheck.py additionally flags
# any oracle key with no dump as MISSING-OUTPUT).
for ARB in "${ARBITERS[@]}"; do
  for SF in "${SFS[@]}"; do
    SF_NAME="$(basename "$SF")"
    OUT="$OUT_BASE/${ARB}_$SF_NAME"
    rm -rf "$OUT" "${OUT}_inputs"
    mkdir -p "$OUT"
    echo "=== Verify dump @ $SF_NAME arbiter=$ARB -> $OUT"
    LOG="$OUT_BASE/verify_${ARB}_$SF_NAME.log"
    if [ "$ARB" = "posix" ]; then
      sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | tee "$LOG"
    else
      GRAFT_ARBITER="$ARB" sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | tee "$LOG"
      if ! grep -q "ObjectStoreArbiter.*installed" "$LOG"; then
        echo "!!! $ARB leg did not install the arbiter (env lost?)"
        FAIL=1
      fi
    fi
    if grep -E "\[verify\] .* failed" "$LOG"; then
      echo "!!! Verify reported per-query failures at $SF_NAME/$ARB (above)"
      FAIL=1
    fi
  done
done

for ARB in "${ARBITERS[@]}"; do
  for SF in "${SFS[@]}"; do
    SF_NAME="$(basename "$SF")"
    OUT="$OUT_BASE/${ARB}_$SF_NAME"
    echo "=== DuckDB oracle compare @ $SF_NAME arbiter=$ARB (sfDir explicit)"
    if ! python3 tools/selfcheck.py "$SF" "$OUT"; then
      echo "!!! oracle compare FAILED at $SF_NAME/$ARB"
      FAIL=1
    fi
  done
done

if [ "$FAIL" -eq 0 ]; then
  echo "DUAL-SF CHECK: all queries green at both scales under ${ARBITERS[*]}"
else
  echo "DUAL-SF CHECK: FAILURES above"
fi
exit "$FAIL"
