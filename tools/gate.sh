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
sbt -batch "runMain graft.Verify $SF $OUT $*" 2>&1 | grep '\[verify\]' || true
python3 tools/check.py "$SF" "$OUT" "$@"
