#!/bin/bash
# Round-5 SphereField 300-frame animation rerun (VERDICT item 4):
# proves the multi-pose auto schedule (render.derive_cascade_schedule
# _multi, cli.py) kills the round-3 frame-109 mid-run re-derive.
# Same config as the round-3 run (854x480 @ 250 spp, RR@4, per-frame
# BVH rebuild, per-frame checkpoints batched every 32 chunks).
set -u
AX=/root/.axon_site
cd /root/repo
mkdir -p /tmp/sf_frames_r5 artifacts/sf_anim_r5
: > artifacts/sf_anim_r5/timing.jsonl
env PYTHONPATH=/root/repo:$AX RPT_COMPILATION_CACHE=/root/repo/.jax_cache \
  timeout 10800 python -m rust_pathtracer_tpu.cli \
  --scene SphereField --cascade auto --russian-roulette 4 --rebuild-bvh \
  --checkpoint /tmp/sf_frames_r5/ckpt.npz --checkpoint-every 32 \
  --timing-log artifacts/sf_anim_r5/timing.jsonl \
  --output-dir /tmp/sf_frames_r5 --quiet
echo "cli exit=$?"
env PYTHONPATH=/root/repo:$AX python tools/anim_report.py \
  /tmp/sf_frames_r5 artifacts/sf_anim_r5/timing.jsonl artifacts/sf_anim_r5
echo ANIMDONE
