#!/bin/bash
set -u
AX=/root/.axon_site
CACHE=/root/repo/.jax_cache
LOG=/root/repo/artifacts/r5_probes
mkdir -p "$LOG"
cd /root/repo
run() {
  local tag=$1 to=$2; shift 2
  echo "=== $tag ($(date +%H:%M:%S)) ===" | tee -a "$LOG/batch_d.log"
  timeout "$to" "$@" >>"$LOG/$tag.out" 2>>"$LOG/$tag.err"
  echo "--- $tag exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG/batch_d.log"
}
for C in fb64 fb128 fb32_bf16 fb32_u4 fb32_nondiff; do
  run "fbdD-$C" 2400 env PYTHONPATH=/root/repo:$AX \
      RPT_COMPILATION_CACHE=$CACHE \
      python tools/tpu_fbdecomp.py "$C"
done
echo BATCHDDONE | tee -a "$LOG/batch_d.log"
