#!/bin/bash
# Round-15 settled-window measurement session (BENCH_NOTES r14/15 section):
# one sbt-forked QBench leg per arm, all at sf0.1 under the Bench power
# regime. Run on a quiet box (1-min load < 2) with nothing else running.
# Usage: tools/ab_r15.sh [outfile]
set -u
OUT=${1:-target/scale/out/ab_r15.log}
mkdir -p "$(dirname "$OUT")"
: > "$OUT"
leg() { # leg <tag> <queries> <reps> [env overrides...]
  local tag=$1 qs=$2 reps=$3; shift 3
  echo "== $tag load=$(cut -d' ' -f1 /proc/loadavg) $(date -u +%H:%M:%S)" | tee -a "$OUT"
  env "$@" SPARK_GRAFT_SF_DIR=${AB_SF_DIR:-/root/testdata/sf0.1} \
    sbt -batch "runMain graft.QBench $qs $reps" 2>&1 \
    | grep QBENCH | sed "s/^/[$tag] /" | tee -a "$OUT"
}
# 0) this box's scheduling floors (per-job, per-stage-wave)
leg floor __floor 1
# 1) exact-cosine tier: TopKPerGroup heap node (current) vs window-sort control
leg cosine_heap   sim_cosine_topk,sim_mips_topk 3
leg cosine_window sim_cosine_topk,sim_mips_topk 3 SPARK_GRAFT_AB_COSINE=window
# 2) ADC top-k: factored (current) vs score-join control
leg adc_factored sim_ann_pq_adc,sim_ann_recall_eval 3
leg adc_join     sim_ann_pq_adc,sim_ann_recall_eval 3 SPARK_GRAFT_AB_ADC=join
# 3) graph-index memo control table (r13 task 5)
GQ=graph_pagerank_bipartite,graph_label_propagation,graph_triangle_count,graph_modularity,graph_assortativity
leg graph_memo   $GQ 3
leg graph_nomemo $GQ 3 SPARK_GRAFT_GRAPH_MEMO=off
# 4) bucketed join under the memoized-layout protocol + r15 re-planned tiers
leg replanned join_bucketed_colocated,agg_approx_quantiles,agg_percentiles,graph_kcore_peel,graph_bfs_distances 3
echo "done $(date -u +%H:%M:%S)" | tee -a "$OUT"
