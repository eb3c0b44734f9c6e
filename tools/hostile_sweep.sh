#!/bin/bash
# Hostile-fixture oracle sweep (round-12 gate): regenerate the null/empty/
# degenerate staging of the sf0.001 testdata, run EVERY declared query
# against it through graft.Verify, and diff each result against its DuckDB
# oracle. Any divergence is a real cross-engine bug of the x39/x54 class
# (null-ordering drift, null-key join drops, ANSI-vs-silent failure modes)
# — caught here instead of at the driver's correctness gate.
#
# usage: tools/hostile_sweep.sh [srcSf] [workDir]
#   exit 0 = every query hash-matches on the hostile corpus.
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
SRC="${1:-/root/testdata/sf0.001}"
WORK="${2:-/tmp/hostile_sweep}"
cd "$REPO"
sbt -batch "runMain graft.HostileData $SRC $WORK/data" >/dev/null
sbt -batch "runMain graft.Verify $WORK/data $WORK/out" 2>&1 \
  | grep -E '\[verify\].*failed' && { echo "hostile sweep: Spark-side failures"; exit 1; }
python3 tools/oracle_check.py "$WORK/data" "$WORK/out"
