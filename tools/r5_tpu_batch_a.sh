#!/bin/bash
# Round-5 TPU batch A: headline fwd+bwd decomposition (one config per
# process) + v4 when-skip kernel probes.  Run AFTER the scene campaign
# (idle host).  Logs to artifacts/r5_probes/.
set -u
AX=/root/.axon_site
CACHE=/root/repo/.jax_cache
LOG=/root/repo/artifacts/r5_probes
mkdir -p "$LOG"
cd /root/repo

run() {
  local tag=$1 to=$2; shift 2
  echo "=== $tag ($(date +%H:%M:%S)) ===" | tee -a "$LOG/batch_a.log"
  timeout "$to" "$@" >>"$LOG/$tag.out" 2>>"$LOG/$tag.err"
  echo "--- $tag exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG/batch_a.log"
}

for C in base fwdonly nondiff probe_zero probe_notex bwd_xla \
         unroll1 unroll4 split_t res_bf16; do
  run "fbd-$C" 2400 env PYTHONPATH=/root/repo:$AX \
      RPT_COMPILATION_CACHE=$CACHE \
      python tools/tpu_fbdecomp.py "$C"
done

# v4 resident kernel when-skip A/B (camera rays, raw kernel timing)
for S in ModelTest SphereField; do
  for W in 0 1; do
    run "when$W-$S" 1800 env PYTHONPATH=/root/repo:$AX \
        RPT_COMPILATION_CACHE=$CACHE RPT_RES_WHEN=$W \
        python tools/tpu_v4probe.py "$S" 20
  done
done
echo BATCHADONE | tee -a "$LOG/batch_a.log"
