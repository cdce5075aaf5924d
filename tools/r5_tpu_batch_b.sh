#!/bin/bash
# Round-5 TPU batch B: whole-scan VJP A/B on the headline step.
# Run AFTER the animation (idle host).  base = RPT_FBD_SCAN=vjp (new
# default); scan_jax = the round-4 path (same-day control).
set -u
AX=/root/.axon_site
CACHE=/root/repo/.jax_cache
LOG=/root/repo/artifacts/r5_probes
mkdir -p "$LOG"
cd /root/repo

run() {
  local tag=$1 to=$2; shift 2
  echo "=== $tag ($(date +%H:%M:%S)) ===" | tee -a "$LOG/batch_b.log"
  timeout "$to" "$@" >>"$LOG/$tag.out" 2>>"$LOG/$tag.err"
  echo "--- $tag exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG/batch_b.log"
}

for C in base scan_jax res_bf16 probe_zero unroll4; do
  run "fbdB-$C" 2400 env PYTHONPATH=/root/repo:$AX \
      RPT_COMPILATION_CACHE=$CACHE \
      python tools/tpu_fbdecomp.py "$C"
done
echo BATCHBDONE | tee -a "$LOG/batch_b.log"
