"""SphereField static-cascade schedule A/B on the real chip.

    python tools/tpu_sf_sched.py "5:8,9:64" [spp]

Renders 1280x720 at ``spp`` (default 8 -> 8 identical 1-spp chunks,
enough to time the steady-state chunk) with the given schedule + RR@4,
asserts the occupancy[-1] overflow guard is zero (estimator-exact),
and reports s/chunk.  One schedule per process (wedge-prone remote
compile service); timings end in a device->host fetch.
"""
import json
import sys
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

import jax

from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.render import RenderSettings, render_radiance

sched = sys.argv[1]
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 8

sd = get_scene("SphereField")
scene = sd.build()
cam = sd.camera_at(0.0)
settings = RenderSettings(
    1280, 720, spp, 20, sd.output.image.background,
    russian_roulette_start=4, cascade=True, cascade_schedule=sched,
)
print(f"backend={jax.default_backend()} sched={sched} spp={spp}", flush=True)

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
print(json.dumps({
    "scene": "SphereField", "sched": sched, "spp": spp,
    "total_s": round(dt, 3), "reps_s": [round(r, 3) for r in reps],
    "s_per_chunk": round(dt / spp, 4),
    "frame512_est_s": round(dt / spp * 512, 1),
    "mean": round(m, 6), "overflow": overflow,
    "Mrays_s": round(float(stats.segments) / dt / 1e6, 1),
}), flush=True)
