#!/bin/bash
# Produce a MATCHED engine/DuckDB bench pair in one load window — the
# r12 failure mode (bench on a degraded box ratio'd against a basis from
# a different window) is structurally impossible when both sides run
# back-to-back here: time_duckdb.py stamps duckdb_times.json with
# generated_utc, and graft.Bench refuses (pm=0, no ratios) any basis
# older than SPARK_GRAFT_PAIR_MAX_AGE_SEC (default 3 h).
#
# Each leg starts from the SAME settled baseline: whichever side runs
# first leaves a 1-min loadavg shadow (a 32-thread DuckDB pass pushes
# load to ~9 for a minute after it exits), and timing the second leg
# inside that shadow biases the pair by whichever order was chosen.
# settle() waits (bounded) for the 1-min loadavg to drop below
# PAIR_SETTLE_LOAD before each leg — symmetric conditions, still one
# window (settle is ≤5 min, far inside the 3 h pair guard).
#
# Usage: tools/bench_pair.sh [sf_dir] [verify_out_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/verify_out}
SETTLE_LOAD=${PAIR_SETTLE_LOAD:-1.5}
SETTLE_MAX=${PAIR_SETTLE_MAX_SEC:-300}
if [ ! -f "$OUT/oracle_sql.json" ]; then
  echo "need $OUT/oracle_sql.json — run: sbt \"runMain graft.Verify <sf> $OUT\"" >&2
  exit 1
fi
settle() {
  local waited=0
  while :; do
    local l1; l1=$(cut -d' ' -f1 /proc/loadavg)
    if awk -v l="$l1" -v t="$SETTLE_LOAD" 'BEGIN{exit !(l<t)}'; then break; fi
    if [ "$waited" -ge "$SETTLE_MAX" ]; then
      echo "settle: gave up at load $l1 after ${waited}s" >&2; break
    fi
    sleep 15; waited=$((waited+15))
  done
  echo "settled in ${waited}s: $(cat /proc/loadavg)"
}
settle
python3 tools/time_duckdb.py "$OUT" "$SF" 32 --json duckdb_times.json | tail -3
settle
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"'
echo "loadavg after: $(cat /proc/loadavg)"
