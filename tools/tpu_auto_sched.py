"""Auto-derived cascade schedule A/B at the judging configs.

    python tools/tpu_auto_sched.py ModelTest   [spp]
    python tools/tpu_auto_sched.py SphereField [spp]

Derives the schedule with render.derive_cascade_schedule (the
strided-pixel probe behind cascade_schedule="auto"), prints it, then
renders with it and reports s/chunk — run the hand-tuned string
through tools/tpu_mt_sched.py / tpu_sf_sched.py in a SEPARATE process
for the comparison (one compiled cascade per process; the remote
compile service is wedge-prone).  Timings end in a device->host fetch.

Hand-tuned round-2 anchors (v5e): ModelTest "1:1,2:8,3:16,4:32,5:256"
= 0.212 s/chunk; SphereField "2:2,3:3,4:5,5:10,9:80" = 0.106 s/chunk.
The VERDICT target: auto within 105% of hand-tuned.
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
from rust_pathtracer_tpu.render import (
    RenderSettings,
    derive_cascade_schedule,
    render_radiance,
)

name = sys.argv[1]
spp_arg = int(sys.argv[2]) if len(sys.argv) > 2 else None

if name == "ModelTest":
    from rust_pathtracer_tpu.scene.obj_loader import write_benchmark_obj

    objp = os.path.join(tempfile.mkdtemp(), "model.obj")
    write_benchmark_obj(objp)
    sd = get_scene("ModelTest", obj_path=objp)
    w, h, spp = 512, 512, spp_arg or 8
elif name == "SphereField":
    sd = get_scene("SphereField")
    w, h, spp = 1280, 720, spp_arg or 2
else:
    raise SystemExit(f"unknown scene {name}")

scene = sd.build()
cam = sd.camera_at(0.0)
settings = RenderSettings(
    w, h, spp, 20, sd.output.image.background, russian_roulette_start=4,
)
chunk = settings.resolve_chunk()
key = jax.random.PRNGKey(0)

t0 = time.perf_counter()
sched = derive_cascade_schedule(scene, cam, settings, key)
t_derive = time.perf_counter() - t0
print(f"backend={jax.default_backend()} derived={sched!r} "
      f"(probe+derive {t_derive:.1f}s incl. compile)", flush=True)

import dataclasses

settings = dataclasses.replace(
    settings, cascade=sched is not None, cascade_schedule=sched
)

t0 = time.perf_counter()
img, stats = render_radiance(scene, cam, settings, key)
m = float(img.mean())
print(f"warm {time.perf_counter() - t0:.1f}s mean={m:.6f}", flush=True)

reps = []
for _ in range(3):
    t0 = time.perf_counter()
    img, stats = render_radiance(scene, cam, settings, key)
    m = float(img.mean())
    reps.append(time.perf_counter() - t0)
dt = min(reps)
overflow = float(stats.occupancy[-1])
nchunks = max(1, spp // chunk)
print(json.dumps({
    "scene": name, "sched": sched, "spp": spp,
    "derive_s": round(t_derive, 1),
    "total_s": round(dt, 3), "reps_s": [round(r, 3) for r in reps],
    "s_per_chunk": round(dt / nchunks, 4),
    "mean": round(m, 6), "overflow": overflow,
    "Mrays_s": round(float(stats.segments) / dt / 1e6, 1),
}), flush=True)
