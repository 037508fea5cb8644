#!/bin/bash
# Dedup-tier exponent campaign under ScaleGen's bounded-replica-family
# mode (SCALE_r16 §4b): same protocol as tools/scale_exponents.sh (QBench
# power regime, min of reps, fixed box), but the documents table comes
# from family-mode generation (W = 10: duplication rate fixed, families
# more numerous), so the pair-output contracts scale with corpus size
# instead of with the generator's family width. sf0.1 is the shared
# anchor (the base corpus has no replicas either way). NOTE on anchor
# comparability: family mode rewrites EVERY tile including k=0 (the
# family-0 salt keeps family 0 internally coherent), so no family-mode
# leg contains a pristine copy of the anchor's document texts — anchor
# comparisons are shape-level (row counts, cost curves), not
# content-level, unlike legacy mode's when(k=0) passthrough.
# Usage: tools/family_exponents.sh [outfile]
set -u
OUT=${1:-target/scale/out/family_exponents_r16.log}
QS=dedup_exact,dedup_minhash_lsh,dedup_simhash,dedup_connected_components,dedup_apply
mkdir -p "$(dirname "$OUT")"
: > "$OUT"
run_leg() {
  local sfdir=$1 tag=$2 reps=$3 relayout=$4
  echo "== leg $tag ($sfdir) reps=$reps load=$(cut -d' ' -f1 /proc/loadavg)" | tee -a "$OUT"
  SPARK_GRAFT_SF_DIR=$sfdir SPARK_GRAFT_RELAYOUT=$relayout \
    sbt -batch "runMain graft.QBench $QS $reps" 2>&1 \
    | grep QBENCH | sed "s/^/[$tag] /" | tee -a "$OUT"
}
run_leg /root/testdata/sf0.1    sf0.1  3 1
run_leg target/scale/sf1f       sf1f   3 0
run_leg target/scale/sf10f      sf10f  2 0
run_leg target/scale/sf100f     sf100f 1 0
echo "done $(date -u +%H:%M:%S)" | tee -a "$OUT"
