"""ModelTest static-cascade schedule A/B on the real chip.

    python tools/tpu_mt_sched.py "2:4,4:32,8:256" [spp]

Renders 512x512 at ``spp`` (default 8 -> two 4-spp chunks, enough to
time the steady-state 1M-lane chunk) with the given schedule + RR@4,
asserts the occupancy[-1] overflow guard is zero (estimator-exact),
and reports s/chunk.  One schedule per process (wedge-prone remote
compile service); timings end in a device->host fetch.

Measured context (v5e, round 2): chunked reorder+v4 = 0.865 s/chunk,
cascade "2:4,4:32,8:256" = 0.689 s/chunk; occupancy collapses to 8.6%
by bounce 2, so tighter/earlier boundaries are the next lever — the
overflow assert rejects any schedule the scene cannot honor.
"""
import json
import os
import sys
import tempfile
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

import jax

from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.render import RenderSettings, render_radiance
from rust_pathtracer_tpu.scene.obj_loader import write_benchmark_obj

sched = sys.argv[1]
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 8

objp = os.path.join(tempfile.mkdtemp(), "model.obj")
write_benchmark_obj(objp)
sd = get_scene("ModelTest", obj_path=objp)
scene = sd.build()
cam = sd.camera_at(0.0)
settings = RenderSettings(
    512, 512, spp, 20, sd.output.image.background,
    russian_roulette_start=4, cascade=True, cascade_schedule=sched,
)
chunk = settings.resolve_chunk()
print(f"backend={jax.default_backend()} sched={sched} spp={spp} "
      f"chunk_spp={chunk}", flush=True)

t0 = time.perf_counter()
img, stats = render_radiance(scene, cam, settings, jax.random.PRNGKey(0))
m = float(img.mean())
print(f"warm {time.perf_counter() - t0:.1f}s mean={m:.6f}", flush=True)

# 3 timed reps: remote-tunnel run-to-run noise swamps small deltas
reps = []
for _ in range(3):
    t0 = time.perf_counter()
    img, stats = render_radiance(scene, cam, settings, jax.random.PRNGKey(0))
    m = float(img.mean())
    reps.append(time.perf_counter() - t0)
dt = min(reps)
overflow = float(stats.occupancy[-1])
assert overflow == 0.0, f"overflow {overflow} lanes fell past a slice"
nchunks = max(1, spp // chunk)
print(json.dumps({
    "scene": "ModelTest", "sched": sched, "spp": spp,
    "total_s": round(dt, 3), "reps_s": [round(r, 3) for r in reps],
    "s_per_chunk": round(dt / nchunks, 4),
    "frame256_est_s": round(dt / nchunks * 256 / chunk, 1),
    "mean": round(m, 6), "overflow": overflow,
    "Mrays_s": round(float(stats.segments) / dt / 1e6, 1),
}), flush=True)
