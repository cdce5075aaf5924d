#!/bin/bash
set -u
AX=/root/.axon_site
CACHE=/root/repo/.jax_cache
LOG=/root/repo/artifacts/r5_probes
cd /root/repo
run() {
  local tag=$1 to=$2; shift 2
  echo "=== $tag ($(date +%H:%M:%S)) ===" | tee -a "$LOG/batch_g.log"
  timeout "$to" "$@" >>"$LOG/$tag.out" 2>>"$LOG/$tag.err"
  echo "--- $tag exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG/batch_g.log"
}
run "final-ModelTest" 3600 env PYTHONPATH=/root/repo:$AX \
    RPT_COMPILATION_CACHE=$CACHE \
    python bench_scenes.py --scene ModelTest --reps 3 --note r5-final
run "final-SphereField" 3600 env PYTHONPATH=/root/repo:$AX \
    RPT_COMPILATION_CACHE=$CACHE \
    python bench_scenes.py --scene SphereField --reps 3 --note r5-final
run "mtdecomp" 2400 env PYTHONPATH=/root/repo:$AX \
    RPT_COMPILATION_CACHE=$CACHE \
    python tools/tpu_mtdecomp.py
echo BATCHGDONE | tee -a "$LOG/batch_g.log"
