#!/bin/bash
# Bench-time-vs-SF exponent campaign (SCALE_r15 §5): the r11 data-bound
# query set re-measured under ONE protocol — QBench (Bench power-run
# regime: local[32], AQE off, suite-sized codegen cache, noop sink,
# cache cleared between reps), min of $REPS after one warm-up rep —
# at sf0.1 / sf1 / sf10 / sf100. ScaleGen dirs are already multi-file
# (10/100/1000 parts), so relayout is skipped there; sf0.1 keeps the
# same single-file->multi-file relayout Bench itself applies.
# Usage: tools/scale_exponents.sh [outfile]
set -u
OUT=${1:-target/scale/out/exponents_r15.log}
QS=agg_pricing_summary,dedup_apply,dedup_connected_components,dedup_exact,dedup_minhash_lsh,dedup_simhash,events_funnel_ordered,events_retention_cohorts,join_salted_skew,pipe_hash_split,pipe_pack_sequences,sim_ann_lsh_bucketed,sort_global_ranged,stream_sessionize,text_cms_counts,text_tfidf_topk,text_token_stats,tpch_q18_large_orders,tpch_q3_shipping_priority,tpch_q5_local_supplier,window_topk_per_group
mkdir -p "$(dirname "$OUT")"
: > "$OUT"
run_leg() {
  local sfdir=$1 tag=$2 reps=$3 relayout=$4
  echo "== leg $tag ($sfdir) reps=$reps load=$(cut -d' ' -f1 /proc/loadavg)" | tee -a "$OUT"
  SPARK_GRAFT_SF_DIR=$sfdir SPARK_GRAFT_RELAYOUT=$relayout \
    sbt -batch "runMain graft.QBench $QS $reps" 2>&1 \
    | grep QBENCH | sed "s/^/[$tag] /" | tee -a "$OUT"
}
run_leg /root/testdata/sf0.1 sf0.1 3 1
run_leg target/scale/sf1    sf1   3 0
run_leg target/scale/sf10   sf10  2 0
run_leg target/scale/sf100  sf100 1 0
echo "done $(date -u +%H:%M:%S)" | tee -a "$OUT"
