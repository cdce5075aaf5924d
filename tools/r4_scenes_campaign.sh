#!/bin/bash
# BENCH_SCENES_r4 measurement campaign with SAME-DAY controls
# (VERDICT r3 item 2).  One scene per process.  Phase 1: current code
# via bench_scenes.py.  Phase 2: round-3-code controls from the
# .wt_r3 worktree (same host, same day) via tools/tpu_scene_frame.py.
# Phase 3: round-2 TwoSphereCheckers control (the +71% investigation).
set -u
cd /root/repo
AX=/root/.axon_site
CACHE=/root/repo/.jax_cache

echo "##### phase 1: r4 code #####"
for S in TwoSphereCheckers CornellBox TriangleTest; do
  echo "=== r4 $S ==="
  env PYTHONPATH=/root/repo:$AX timeout 2400 \
      python bench_scenes.py --scene "$S" --reps 5 --note r4
done
echo "=== r4 LightTest ==="
env PYTHONPATH=/root/repo:$AX timeout 2400 \
    python bench_scenes.py --scene LightTest --reps 3 --note r4
echo "=== r4 ModelTest ==="
env PYTHONPATH=/root/repo:$AX timeout 3600 \
    python bench_scenes.py --scene ModelTest --reps 3 --note r4
echo "=== r4 SphereField ==="
env PYTHONPATH=/root/repo:$AX timeout 3600 \
    python bench_scenes.py --scene SphereField --reps 3 --note r4

echo "##### phase 2: round-3 code controls (same day) #####"
for S in TwoSphereCheckers CornellBox TriangleTest LightTest; do
  echo "=== r3-control $S ==="
  env PYTHONPATH=/root/repo/.wt_r3:$AX RPT_COMPILATION_CACHE=$CACHE \
      timeout 2400 python tools/tpu_scene_frame.py --scene "$S" \
      --reps 3 --note r3-control
done
echo "=== r3-control ModelTest ==="
env PYTHONPATH=/root/repo/.wt_r3:$AX RPT_COMPILATION_CACHE=$CACHE \
    timeout 3600 python tools/tpu_scene_frame.py --scene ModelTest \
    --reps 3 --note r3-control
echo "=== r3-control SphereField ==="
env PYTHONPATH=/root/repo/.wt_r3:$AX RPT_COMPILATION_CACHE=$CACHE \
    timeout 3600 python tools/tpu_scene_frame.py --scene SphereField \
    --reps 3 --note r3-control

echo "##### phase 3: round-2 TwoSphereCheckers control #####"
env PYTHONPATH=/root/repo/.wt_r2:$AX RPT_COMPILATION_CACHE=$CACHE \
    timeout 2400 python tools/tpu_scene_frame.py \
    --scene TwoSphereCheckers --reps 7 --note r2-control
echo CAMPAIGNDONE
