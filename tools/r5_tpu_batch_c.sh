#!/bin/bash
# Round-5 TPU batch C: bwd-kernel block-size + fwd block-size A/B.
# base (new default bwd rows=64) vs bwd8 (batch-B behavior) etc.
set -u
AX=/root/.axon_site
CACHE=/root/repo/.jax_cache
LOG=/root/repo/artifacts/r5_probes
mkdir -p "$LOG"
cd /root/repo
run() {
  local tag=$1 to=$2; shift 2
  echo "=== $tag ($(date +%H:%M:%S)) ===" | tee -a "$LOG/batch_c.log"
  timeout "$to" "$@" >>"$LOG/$tag.out" 2>>"$LOG/$tag.err"
  echo "--- $tag exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG/batch_c.log"
}
for C in base bwd128 fb16 fb32 probe_notex; do
  run "fbdC-$C" 2400 env PYTHONPATH=/root/repo:$AX \
      RPT_COMPILATION_CACHE=$CACHE \
      python tools/tpu_fbdecomp.py "$C"
done
echo BATCHCDONE | tee -a "$LOG/batch_c.log"
