#!/bin/bash
# Round-4 fused-diff measurement batch: one config per process
# (remote-compile hygiene), idle host required.  Output: one JSON
# line per config via tools/tpu_rngxs.py.
set -u
cd /root/repo
P=PYTHONPATH=/root/repo:/root/.axon_site
run() {
  echo "=== $* ==="
  env "$@" PYTHONPATH=/root/repo:/root/.axon_site \
      timeout 2400 python tools/tpu_rngxs.py --what "$WHAT"
}

# (a) default diff path (XLA bwd, xs=0) — post-refactor control
WHAT=fwdbwd run DUMMY=1
# (b) fused-diff with the Pallas transposed-shading backward
WHAT=fwdbwd run RPT_FUSED_BOUNCE_DIFF=1
# (c) nondiff forward with the uniforms-only hoist (was 43.9 ms with
#     the full-draw hoist)
WHAT=nondiff run DUMMY=1
# (d) fused-diff pallas bwd + xs hoist in the diff scan
WHAT=fwdbwd run RPT_FUSED_BOUNCE_DIFF=1 RPT_RNG_XS=1
# (e) einsum-cost probe (WRONG GRADS, perf only) — last: has wedged
#     the compile service before
WHAT=fwdbwd run RPT_FUSED_BOUNCE_DIFF=1 RPT_FBD_PROBE=notex
echo ALLDONE
