#!/bin/bash
# Partition-scaling control for the exponent table (VERDICT r15 task 3).
#
# SCALE_r15 §5 attributes the sort/join tier's 15–24×/decade factors to
# FIXED 8-way shuffle parallelism (8 partitions × 10× rows/partition →
# n log n + spill), and claims a cluster — where partition count scales
# with the input — collapses them toward data-linear. This control tests
# that attribution ON THIS BOX: the worst exponent queries re-run at
# sf10/sf100 with spark.sql.shuffle.partitions scaled with SF
# (8 → 80 → 800) instead of pinned at 8. If the factor collapses, the
# super-linear residue was the partition count (a deployment knob); if
# it does not, the plan itself is the problem and becomes a task.
#
# Protocol mirrors tools/scale_exponents.sh exactly (QBench power
# regime) except SPARK_GRAFT_SHUFFLE. sf0.1/sf1 are not re-run: the
# baseline legs at 8 partitions are not saturated there (the exponent
# table shows ≤ ~11×/decade into sf10 for these queries' relational
# cores), so the control targets the decades where the tax shows.
# Usage: tools/partition_scaling_ab.sh [outfile]
set -u
OUT=${1:-target/scale/out/partition_scaling_r16.log}
# Query set = the sort/join-tier entries the §5 attribution is actually
# about (15–18×/decade: ranged sort + the TPC-H join chains + the TF-IDF
# rank pipeline). The dedup-tier entries that shared the worst-factor
# list are excluded deliberately: r16's minhash cap fix changed their
# legacy-SF cost regime (completeness they previously lacked), so their
# factors are re-measured under the bounded-family generator instead
# (family_exponents.sh) where the workload is apples-to-apples.
QS=sort_global_ranged,tpch_q5_local_supplier,tpch_q3_shipping_priority,tpch_q18_large_orders,text_tfidf_topk
mkdir -p "$(dirname "$OUT")"
: > "$OUT"
run_leg() {
  local sfdir=$1 tag=$2 reps=$3 shuffle=$4
  echo "== leg $tag ($sfdir) shuffle=$shuffle reps=$reps load=$(cut -d' ' -f1 /proc/loadavg)" | tee -a "$OUT"
  # java_run.sh = the sbt runMain runtime without the project lock, so
  # the campaign can run while interactive sbt work continues
  SPARK_GRAFT_SF_DIR=$sfdir SPARK_GRAFT_RELAYOUT=0 SPARK_GRAFT_SHUFFLE=$shuffle \
    tools/java_run.sh graft.QBench "$QS" "$reps" 2>&1 \
    | grep QBENCH | sed "s/^/[$tag shuf=$shuffle] /" | tee -a "$OUT"
}
# baseline (8, the exponent-table protocol) + scaled legs, same session count
run_leg target/scale/sf10  sf10  2 8
run_leg target/scale/sf10  sf10  2 80
run_leg target/scale/sf100 sf100 1 8
run_leg target/scale/sf100 sf100 1 800
echo "done $(date -u +%H:%M:%S)" | tee -a "$OUT"
