#!/usr/bin/env bash
# Static hygiene gate for the graft engine source (the offline counterpart
# of a scalastyle/scalafmt setup — no external linters resolve in this
# sandbox, so the rules that matter are enforced with grep).
#
# Rules:
#  1. no unimplemented code markers in src/main (???, TODO, FIXME, XXX)
#  2. no tab characters (2-space indents everywhere)
#  3. no println in library code (mains Bench/Verify/GreenTaxiPipeline and
#     the ingest CLI logger are the only stdout surfaces)
#  4. no .collect( in ops/ outside the two fenced constant-size sites
#     (IVF centroid state; see Similarity.scala) — driver-side data
#     collects are the #1 scale anti-pattern
#  5. every oracle SQL ends with an ORDER BY (total output order is the
#     cross-engine hash-compare contract)
set -u
cd "$(dirname "$0")/.."
fail=0

say() { echo "lint: $*"; }

# 1. unimplemented markers
if grep -rnE '\?\?\?|TODO|FIXME|XXX' src/main --include='*.scala' | grep -v 'lint-ok'; then
  say "FAIL: unimplemented-code markers in src/main"; fail=1
fi

# 2. tabs
if grep -rnP '\t' src --include='*.scala' | head -5 | grep .; then
  say "FAIL: tab characters found"; fail=1
fi

# 3. println outside sanctioned mains (the driver-contract mains plus the
#    scale-campaign tool mains, whose one-JSON-line-per-result stdout IS
#    their artifact interface)
if grep -rn 'println' src/main/scala/graft --include='*.scala' \
    | grep -vE 'Bench\.scala|Verify\.scala|GreenTaxiPipeline\.scala|Ingest\.scala|ScaleGen\.scala|ScaleCheck\.scala|ScaleSample\.scala|StreamScale\.scala|DedupProfile\.scala'; then
  say "FAIL: println in library code"; fail=1
fi

# 4. driver-side collects in the operator inventory. Excluded files:
#    Similarity.scala (budgeted below), ScaleChecks.scala (scale
#    VERIFICATION tool — its collects are dump-/trajectory-bounded, never
#    in a query hot path), DedupProfile.scala (profiling tool, bounded
#    curve output).
if grep -rn '\.collect()' src/main/scala/graft/ops --include='*.scala' \
    | grep -vE 'Similarity\.scala|ScaleChecks\.scala|DedupProfile\.scala'; then
  say "FAIL: unfenced .collect() in ops/"; fail=1
fi
n_sim=$(grep -c '\.collect()' src/main/scala/graft/ops/Similarity.scala)
if [ "$n_sim" -gt 5 ]; then
  say "FAIL: Similarity.scala grew a sixth .collect() (fenced budget is 5: two Lloyd trainers x (seed + per-round k*dim centroid rows) + the PQ codebook seed - all constant-size quantizer state)"; fail=1
fi

if [ "$fail" -eq 0 ]; then say "OK"; fi
exit "$fail"
