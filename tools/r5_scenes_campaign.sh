#!/bin/bash
# BENCH_SCENES_r5 measurement campaign with SAME-DAY controls
# (VERDICT r4 item 1 — two rounds overdue).  One scene per process.
#   Phase 1: current code (frozen .wt_r4 snapshot = round-4 end state)
#            via its own bench_scenes.py — all six judged scenes +
#            TriangleTest (first-ever number for that row).
#   Phase 2: round-3-code controls from the .wt_r3 worktree (same
#            host, same day) via tools/tpu_scene_frame.py.
#   Phase 3: round-2 TwoSphereCheckers control (+71% investigation).
# All phases share one persistent compile cache.
set -u
AX=/root/.axon_site
CACHE=/root/repo/.jax_cache
W4=/root/repo/.wt_r4
LOG=/root/repo/artifacts/r5_campaign
mkdir -p "$LOG"
cd /tmp

run() { # run <tag> <timeout> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== $tag ($(date +%H:%M:%S)) ===" | tee -a "$LOG/campaign.log"
  timeout "$to" "$@" >>"$LOG/$tag.out" 2>>"$LOG/$tag.err"
  echo "--- $tag exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG/campaign.log"
}

echo "##### phase 1: r4-end code (.wt_r4) #####" | tee -a "$LOG/campaign.log"
for S in TwoSphereCheckers CornellBox TriangleTest; do
  run "r5-$S" 2400 env PYTHONPATH=$W4:$AX RPT_COMPILATION_CACHE=$CACHE \
      python "$W4/bench_scenes.py" --scene "$S" --reps 5 --note r5
done
run "r5-LightTest" 2400 env PYTHONPATH=$W4:$AX RPT_COMPILATION_CACHE=$CACHE \
    python "$W4/bench_scenes.py" --scene LightTest --reps 3 --note r5
run "r5-ModelTest" 3600 env PYTHONPATH=$W4:$AX RPT_COMPILATION_CACHE=$CACHE \
    python "$W4/bench_scenes.py" --scene ModelTest --reps 3 --note r5
run "r5-SphereField" 3600 env PYTHONPATH=$W4:$AX RPT_COMPILATION_CACHE=$CACHE \
    python "$W4/bench_scenes.py" --scene SphereField --reps 3 --note r5

echo "##### phase 2: round-3 code controls (same day) #####" | tee -a "$LOG/campaign.log"
# tpu_scene_frame.py is checkout-agnostic: run the CURRENT repo's copy
# with PYTHONPATH pointing at the control worktree's package.
SF=/root/repo/tools/tpu_scene_frame.py
for S in TwoSphereCheckers CornellBox TriangleTest LightTest; do
  run "r3ctl-$S" 2400 env PYTHONPATH=/root/repo/.wt_r3:$AX \
      RPT_COMPILATION_CACHE=$CACHE \
      python "$SF" --scene "$S" --reps 3 --note r3-control
done
run "r3ctl-ModelTest" 3600 env PYTHONPATH=/root/repo/.wt_r3:$AX \
    RPT_COMPILATION_CACHE=$CACHE \
    python "$SF" --scene ModelTest --reps 3 --note r3-control
run "r3ctl-SphereField" 3600 env PYTHONPATH=/root/repo/.wt_r3:$AX \
    RPT_COMPILATION_CACHE=$CACHE \
    python "$SF" --scene SphereField --reps 3 --note r3-control

echo "##### phase 3: round-2 TwoSphereCheckers control #####" | tee -a "$LOG/campaign.log"
run "r2ctl-TwoSphereCheckers" 2400 env PYTHONPATH=/root/repo/.wt_r2:$AX \
    RPT_COMPILATION_CACHE=$CACHE \
    python "$SF" --scene TwoSphereCheckers --reps 7 --note r2-control
echo CAMPAIGNDONE | tee -a "$LOG/campaign.log"
