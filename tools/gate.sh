#!/usr/bin/env bash
# Local replica of the driver's correctness gate — run BEFORE any commit
# that touches Queries/Oracles/etl (docs/NOTES.md "mechanical loop").
#
# Usage: tools/gate.sh [query_name ...]   # no args = the full suite
#   SF=/root/testdata/sf0.01 OUT=/tmp/graft_gate tools/gate.sh q26_eduflow_student360
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${SF:-/root/testdata/sf0.01}
OUT=${OUT:-/tmp/graft_gate}
# sbt's exit code must abort the gate (a compile error + stale $OUT would
# otherwise compare old parquet and report PASS); grep exiting 1 on "no
# failure lines" must not. Capture first, filter after.
log=$(mktemp)
if ! sbt -batch "runMain graft.Verify $SF $OUT $*" >"$log" 2>&1; then
  tail -30 "$log"; rm -f "$log"
  echo "gate: sbt/Verify FAILED — aborting before the oracle compare" >&2
  exit 1
fi
grep '\[verify\]' "$log" || true
rm -f "$log"
# check.py exits 2 on a clean-but-reduced-coverage run (oracle timeouts,
# ADVICE r12): distinguish it from a real failure (1) so the hash-surface
# lint still runs either way, then propagate the worst code at the end
check_rc=0
python3 tools/check.py "$SF" "$OUT" "$@" || check_rc=$?
if [ "$check_rc" -eq 2 ]; then
  echo "gate: oracle timeouts shrank coverage (check.py exit 2) — lint still runs" >&2
elif [ "$check_rc" -ne 0 ]; then
  exit "$check_rc"
fi
# hash-surface lint rides every gate run (scoped to the same queries):
# values beyond 2^53 in an output column are a latent driver-comparator
# red even when check.py is green (the q332/q243 class). The limit is
# magnitude-dependent — sums scale ~linearly with corpus size — so
# smaller-SF gates tighten it by the scale-up to sf0.1 (plus ~1.6x
# slack) to catch what the driver's sf0.1 run would see.
case "$SF" in
  *sf0.001*) MARGIN=160 ;;
  *sf0.01*)  MARGIN=16 ;;
  *)         MARGIN=1 ;;
esac
python3 tools/lint_hash_surface.py --margin "$MARGIN" "$OUT" "$@"
exit "$check_rc"
