#!/bin/bash
# v4 resident kernel ray-block-size A/B (RPT_RES_ROWS; default 8 was
# measured this morning: ModelTest 651.9 ms, SphereField 29.35 ms at
# 2^20 camera rays — when0-* rows in this directory).
set -u
AX=/root/.axon_site
CACHE=/root/repo/.jax_cache
LOG=/root/repo/artifacts/r5_probes
cd /root/repo
run() {
  local tag=$1 to=$2; shift 2
  echo "=== $tag ($(date +%H:%M:%S)) ===" | tee -a "$LOG/batch_f.log"
  timeout "$to" "$@" >>"$LOG/$tag.out" 2>>"$LOG/$tag.err"
  echo "--- $tag exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG/batch_f.log"
}
for S in ModelTest SphereField; do
  for RW in 4 16; do
    run "resrows$RW-$S" 1800 env PYTHONPATH=/root/repo:$AX \
        RPT_COMPILATION_CACHE=$CACHE RPT_RES_ROWS=$RW \
        python tools/tpu_v4probe.py "$S" 20
  done
done
echo BATCHFDONE | tee -a "$LOG/batch_f.log"
