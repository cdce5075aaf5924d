#!/bin/bash
# Round-5 batch E: FINAL numbers on the settled defaults.
#   1. bench.py headline (fwd+bwd, fresh compile, median-of-batches)
#   2. judged-frame re-rows for the four fused scenes (same-day
#      controls = the phase-1 campaign rows measured this morning)
set -u
AX=/root/.axon_site
CACHE=/root/repo/.jax_cache
LOG=/root/repo/artifacts/r5_probes
mkdir -p "$LOG"
cd /root/repo
run() {
  local tag=$1 to=$2; shift 2
  echo "=== $tag ($(date +%H:%M:%S)) ===" | tee -a "$LOG/batch_e.log"
  timeout "$to" "$@" >>"$LOG/$tag.out" 2>>"$LOG/$tag.err"
  echo "--- $tag exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG/batch_e.log"
}
run "final-bench" 2400 env PYTHONPATH=/root/repo:$AX \
    RPT_COMPILATION_CACHE=$CACHE python bench.py
for S in TwoSphereCheckers CornellBox TriangleTest; do
  run "final-$S" 2400 env PYTHONPATH=/root/repo:$AX \
      RPT_COMPILATION_CACHE=$CACHE \
      python bench_scenes.py --scene "$S" --reps 5 --note r5-final
done
run "final-LightTest" 2400 env PYTHONPATH=/root/repo:$AX \
    RPT_COMPILATION_CACHE=$CACHE \
    python bench_scenes.py --scene LightTest --reps 3 --note r5-final
echo BATCHEDONE | tee -a "$LOG/batch_e.log"
