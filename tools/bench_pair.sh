#!/bin/bash
# Produce a MATCHED engine/DuckDB bench pair in one load window — the
# r12 failure mode (bench on a degraded box ratio'd against a basis from
# a different window) is structurally impossible when both sides run
# back-to-back here: time_duckdb.py stamps duckdb_times.json with
# generated_utc, and graft.Bench refuses (pm=0, no ratios) any basis
# older than SPARK_GRAFT_PAIR_MAX_AGE_SEC (default 3 h).
#
# Usage: tools/bench_pair.sh [sf_dir] [verify_out_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/verify_out}
if [ ! -f "$OUT/oracle_sql.json" ]; then
  echo "need $OUT/oracle_sql.json — run: sbt \"runMain graft.Verify <sf> $OUT\"" >&2
  exit 1
fi
echo "loadavg before: $(cat /proc/loadavg)"
python3 tools/time_duckdb.py "$OUT" "$SF" 32 --json duckdb_times.json | tail -3
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"'
echo "loadavg after: $(cat /proc/loadavg)"
