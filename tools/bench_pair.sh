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
# PAIR_SETTLE_LOAD before each leg.
#
# r18 (VERDICT r17 task 5): the gate is now SELF-ENFORCING. The r17
# variance band (1.32-1.39x symmetric, one 1.64x asymmetric reading)
# showed a pair is only meaningful when BOTH legs start quiet — so a leg
# that cannot settle inside PAIR_SETTLE_MAX_SEC now REFUSES (exit 2)
# instead of producing a silently skewed pair. PAIR_FORCE=1 overrides
# for diagnostics; the output then carries gate=forced so the snapshot
# can never be mistaken for a settled pair. Each pair also records THIS
# box's scheduling floor (QBench __floor: per-job + per-stage ms,
# measured in the same window) in pair_meta.json — the denominator every
# floor decomposition in BENCH_NOTES multiplies, now stamped per-pair
# instead of assumed from an older calibration.
#
# Usage: tools/bench_pair.sh [sf_dir] [verify_out_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/verify_out}
SETTLE_LOAD=${PAIR_SETTLE_LOAD:-1.5}
SETTLE_MAX=${PAIR_SETTLE_MAX_SEC:-300}
FORCE=${PAIR_FORCE:-0}
GATE="settled"
if [ ! -f "$OUT/oracle_sql.json" ]; then
  echo "need $OUT/oracle_sql.json — run: sbt \"runMain graft.Verify <sf> $OUT\"" >&2
  exit 1
fi
LOADS=()
settle() {
  local waited=0
  while :; do
    local l1; l1=$(cut -d' ' -f1 /proc/loadavg)
    if awk -v l="$l1" -v t="$SETTLE_LOAD" 'BEGIN{exit !(l<t)}'; then break; fi
    if [ "$waited" -ge "$SETTLE_MAX" ]; then
      if [ "$FORCE" = "1" ]; then
        echo "settle: load $l1 after ${waited}s — PAIR_FORCE=1, proceeding UNGATED" >&2
        GATE="forced"
        break
      fi
      echo "settle: REFUSING pair — load $l1 still >= $SETTLE_LOAD after ${waited}s" >&2
      echo "        (a skewed pair is worse than no pair; re-run when quiet," >&2
      echo "         or PAIR_FORCE=1 to record a diagnostics-only snapshot)" >&2
      exit 2
    fi
    sleep 15; waited=$((waited+15))
  done
  LOADS+=("$(cut -d' ' -f1 /proc/loadavg)")
  echo "settled in ${waited}s: $(cat /proc/loadavg)"
}
# Floor calibration in the SAME window, before the legs so its own load
# shadow cannot sit between them.
settle
QFLOOR=$(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_CPUS=32 \
  tools/java_run.sh graft.QBench __floor 1 2>/dev/null | grep '^QFLOOR' || true)
echo "${QFLOOR:-QFLOOR unavailable}"
settle
python3 tools/time_duckdb.py "$OUT" "$SF" 32 --json duckdb_times.json | tail -3
settle
# pair_meta.json is written BEFORE the bench leg: graft.Bench reads this
# window's floor from it to stamp per-entry floor-adjusted ratios (fadj)
# into bench_queries.json — writing it after would hand Bench the
# PREVIOUS pair's floor.
python3 - "$GATE" "$QFLOOR" "${LOADS[@]}" <<'EOF'
import json, sys, datetime
gate, qfloor, loads = sys.argv[1], sys.argv[2], sys.argv[3:]
json.dump({
    "generated_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(),
    "gate": gate, "settle_loads": [float(x) for x in loads],
    "qfloor": qfloor,
}, open("pair_meta.json", "w"), indent=1)
EOF
# committed snapshot for the regression diff, captured before the bench
# leg overwrites the working-tree side file
git show HEAD:bench_queries.json > /tmp/bench_committed_pair.json 2>/dev/null || \
  echo '{}' > /tmp/bench_committed_pair.json
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"'
echo "loadavg after: $(cat /proc/loadavg)"
# Per-entry regression adjudication (r18 VERDICT task 3: tpch_q5 moved
# +0.27 s above the round's own +0.15 s threshold and went unrecorded
# because the round-close diff was by hand). Every >threshold mover in
# either direction lands in pair_meta.json; BENCH_NOTES' round-close
# section adjudicates FROM this list, so no mover can land unrecorded.
python3 - <<'EOF'
import json
THRESH = 0.15
new = json.load(open("bench_queries.json"))["queries"]
try:
    old = json.load(open("/tmp/bench_committed_pair.json"))["queries"]
except Exception:
    old = {}
movers = sorted(
    ({"query": q, "old": old[q], "new": t, "delta": round(t - old[q], 3)}
     for q, t in new.items()
     if q in old and old[q] >= 0 and t >= 0 and abs(t - old[q]) > THRESH),
    key=lambda m: -abs(m["delta"]))
meta = json.load(open("pair_meta.json"))
meta["regression_threshold_sec"] = THRESH
meta["regressions"] = [m for m in movers if m["delta"] > 0]
meta["improvements"] = [m for m in movers if m["delta"] < 0]
json.dump(meta, open("pair_meta.json", "w"), indent=1)
if meta["regressions"]:
    print(f"REGRESSIONS vs committed snapshot (>{THRESH}s):")
    for m in meta["regressions"]:
        print(f"  {m['query']}: {m['old']:.3f} -> {m['new']:.3f} (+{m['delta']:.3f})")
else:
    print(f"no regressions > {THRESH}s vs committed snapshot")
print(f"improvements > {THRESH}s: {len(meta['improvements'])}")
EOF
echo "pair_meta.json written (gate=$GATE)"
